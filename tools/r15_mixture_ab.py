"""r15 matched A/B for q187 (VERDICT r14 #7): does a mid-pipeline cut of
the gated pool pay, or does AQE exchange/stage reuse already deduplicate
the repeated g subtree at runtime? cut_gated True vs False, interleaved
reps in one JVM, noop sink, sf0.001 warm-up; output equality asserted at
sf0.01 first.

Usage: python tools/r15_mixture_ab.py [--reps=7]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from warcraider_spark.operators.curation import mixture_pipeline_plan  # noqa: E402
from warcraider_spark.session import get_spark  # noqa: E402
from warcraider_spark.tables import load_table  # noqa: E402


def build(spark, sf_dir, cut):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return mixture_pipeline_plan(docs, cut_gated=cut)


def main():
    reps = 7
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    eq_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    spark = get_spark(app_name="r15_mixture_ab")
    spark.sparkContext.setLogLevel("ERROR")
    rows = {c: [tuple(r) for r in build(spark, eq_dir, c).collect()] for c in (True, False)}
    assert rows[True] == rows[False], "cut_gated changes output!"
    print(f"equality OK: {len(rows[True])} rows at sf0.01")
    for cut in (True, False):
        build(spark, warm_dir, cut).write.format("noop").mode("overwrite").save()
    raw = {True: [], False: []}
    for _ in range(reps):
        for cut in (True, False):
            spark.sparkContext.setJobDescription(f"mixture cut_gated={cut}")
            t0 = time.perf_counter()
            build(spark, sf_dir, cut).write.format("noop").mode("overwrite").save()
            raw[cut].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for cut in (True, False):
        r = sorted(raw[cut])
        print(f"cut_gated={cut!s:5} min={r[0]:.3f} med={r[len(r)//2]:.3f} max={r[-1]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
