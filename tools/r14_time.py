"""r14 targeted timing: noop-sink time the named registry queries at
$SPARK_GRAFT_SF_DIR (default sf0.1), bench.py-style (sf0.001 warm-up
pass, then N interleaved reps, report min/median/max per query).

Usage: python tools/r14_time.py q069_winnowing_dup_pairs [...names] [--reps=3]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from warcraider_spark.registry import all_specs
from warcraider_spark.session import get_spark


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    spark = get_spark(app_name="r14_time")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    for name in names:
        specs[name].builder(spark, warm_dir).write.format("noop").mode("overwrite").save()
    raw = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            specs[name].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            raw[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for name in names:
        r = sorted(raw[name])
        print(f"{name:45s} min={r[0]:.3f} med={r[len(r)//2]:.3f} max={r[-1]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
