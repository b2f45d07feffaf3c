"""r15 matched A/B for the q039 narrow-sketch cut (VERDICT r14 #5):
cut_sketch True vs False, interleaved reps in one JVM, noop sink,
sf0.001 warm-up. Asserts output equality at sf0.01 first.

Usage: python tools/r15_simhash_ab.py [--reps=7]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from warcraider_spark.operators.dedup import (  # noqa: E402
    dup_corpus,
    simhash_radius_plan,
)
from warcraider_spark.session import get_spark  # noqa: E402
from warcraider_spark.tables import table_row_count  # noqa: E402


def build(spark, sf_dir, cut):
    corpus = dup_corpus(spark, sf_dir)
    n_docs = table_row_count(sf_dir, "documents")
    corpus_n = n_docs + min(60, n_docs) + max(0, min(120, n_docs) - 60)
    return simhash_radius_plan(corpus, corpus_n, cut_sketch=cut)


def main():
    reps = 7
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    eq_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    spark = get_spark(app_name="r15_simhash_ab")
    spark.sparkContext.setLogLevel("ERROR")
    rows = {c: [tuple(r) for r in build(spark, eq_dir, c).collect()] for c in (True, False)}
    assert rows[True] == rows[False], "cut_sketch changes output!"
    print(f"equality OK: {len(rows[True])} rows at sf0.01")
    for cut in (True, False):
        build(spark, warm_dir, cut).write.format("noop").mode("overwrite").save()
    raw = {True: [], False: []}
    for _ in range(reps):
        for cut in (True, False):
            spark.sparkContext.setJobDescription(f"simhash cut_sketch={cut}")
            t0 = time.perf_counter()
            build(spark, sf_dir, cut).write.format("noop").mode("overwrite").save()
            raw[cut].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for cut in (True, False):
        r = sorted(raw[cut])
        print(f"cut_sketch={cut!s:5} min={r[0]:.3f} med={r[len(r)//2]:.3f} max={r[-1]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
