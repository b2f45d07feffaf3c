"""r15 matched A/B for the excision-family optimizations: the q088
share_selector cut + arrow span merge, and the q197 accounting kernel.

First asserts EXACT output equality (ordered collect compare at sf0.01)
between the old (share_selector=False, arrow_spans=False) and new paths,
then runs interleaved noop-sink reps at $SPARK_GRAFT_SF_DIR (sf0.1)
bench.py-style (sf0.001 warm-up, per-variant interleaved reps, same JVM).

Usage: python tools/r15_excision_ab.py [--reps=5] [--query=q088|q197|both]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from warcraider_spark.operators.dedup import (  # noqa: E402
    exact_substring_excision,
    winnowing_family,
)
from warcraider_spark.session import get_spark  # noqa: E402
from warcraider_spark.tables import load_table  # noqa: E402


def variants(which):
    if which == "q088":
        def b(spark, sf_dir, **kw):
            docs = load_table(spark, sf_dir, "documents")
            return exact_substring_excision(
                docs, spread_partitions=spark.sparkContext.defaultParallelism, **kw
            )
        return {
            "old(shareF,arrowF)": lambda s, d: b(s, d, share_selector=False, arrow_spans=False),
            "share_only(T,F)": lambda s, d: b(s, d, share_selector=True, arrow_spans=False),
            "arrow_only(F,T)": lambda s, d: b(s, d, share_selector=False, arrow_spans=True),
            "new(T,T)": lambda s, d: b(s, d, share_selector=True, arrow_spans=True),
        }
    def b2(spark, sf_dir, **kw):
        docs = load_table(spark, sf_dir, "documents")
        return winnowing_family(
            docs, spread_partitions=spark.sparkContext.defaultParallelism, **kw
        )
    return {
        "old(arrowF)": lambda s, d: b2(s, d, arrow_spans=False),
        "new(arrowT)": lambda s, d: b2(s, d, arrow_spans=True),
    }


def main():
    reps = 5
    which = "both"
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
        if a.startswith("--query"):
            which = a.split("=", 1)[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    eq_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    spark = get_spark(app_name="r15_excision_ab")
    spark.sparkContext.setLogLevel("ERROR")

    for q in (["q088", "q197"] if which == "both" else [which]):
        vs = variants(q)
        # exact-equality gate at sf0.01 (ordered rows)
        base_rows = None
        for name, build in vs.items():
            rows = [tuple(r) for r in build(spark, eq_dir).collect()]
            if base_rows is None:
                base_rows = rows
                print(f"{q} {name}: {len(rows)} rows (reference)")
            else:
                diff = sum(1 for a, b in zip(base_rows, rows) if a != b)
                diff += abs(len(base_rows) - len(rows))
                print(f"{q} {name}: {len(rows)} rows diff={diff}")
                assert diff == 0, f"{q} {name} OUTPUT DIFFERS"
        # warm-up + interleaved timing
        for name, build in vs.items():
            build(spark, warm_dir).write.format("noop").mode("overwrite").save()
        raw = {n: [] for n in vs}
        for _ in range(reps):
            for name, build in vs.items():
                spark.sparkContext.setJobDescription(f"{q}:{name}")
                t0 = time.perf_counter()
                build(spark, sf_dir).write.format("noop").mode("overwrite").save()
                raw[name].append(time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(None)
        for name in vs:
            r = sorted(raw[name])
            print(f"{q} {name:22s} min={r[0]:.3f} med={r[len(r)//2]:.3f} max={r[-1]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
