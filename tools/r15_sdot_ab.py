"""r15 matched A/B for the q023 Arrow run-length kernel (VERDICT r14 #4):
arrow_tf True vs False, interleaved reps in one JVM, noop sink, sf0.001
warm-up. Asserts output equality at sf0.01 first (ordered collect).

Usage: python tools/r15_sdot_ab.py [--reps=7]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from warcraider_spark.operators.text import sparse_dot_topk_plan  # noqa: E402
from warcraider_spark.session import get_spark  # noqa: E402
from warcraider_spark.tables import load_table, table_row_count  # noqa: E402


def build(spark, sf_dir, arrow):
    docs = load_table(spark, sf_dir, "documents")
    return sparse_dot_topk_plan(docs, table_row_count(sf_dir, "documents"), arrow_tf=arrow)


def main():
    reps = 7
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    eq_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    spark = get_spark(app_name="r15_sdot_ab")
    spark.sparkContext.setLogLevel("ERROR")
    rows = {a: [tuple(r) for r in build(spark, eq_dir, a).collect()] for a in (True, False)}
    assert rows[True] == rows[False], "arrow_tf changes output!"
    print(f"equality OK: {len(rows[True])} rows at sf0.01")
    for arrow in (True, False):
        build(spark, warm_dir, arrow).write.format("noop").mode("overwrite").save()
    raw = {True: [], False: []}
    for _ in range(reps):
        for arrow in (True, False):
            spark.sparkContext.setJobDescription(f"sdot arrow_tf={arrow}")
            t0 = time.perf_counter()
            build(spark, sf_dir, arrow).write.format("noop").mode("overwrite").save()
            raw[arrow].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for arrow in (True, False):
        r = sorted(raw[arrow])
        print(f"arrow_tf={arrow!s:5} min={r[0]:.3f} med={r[len(r)//2]:.3f} max={r[-1]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
