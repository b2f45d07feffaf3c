"""r15 quiet-protocol A/B for the q043 rake occurrence-stream cut
(VERDICT r14 #3): cut vs no-cut, interleaved reps in one JVM, noop sink,
sf0.001 warm-up — the full q043 registry plan both ways.

Usage: python tools/r15_rake_ab.py [--reps=7]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from warcraider_spark.functions.rake import rake_native  # noqa: E402
from warcraider_spark.session import get_spark  # noqa: E402
from warcraider_spark.tables import load_table  # noqa: E402


def build(spark, sf_dir, cut):
    # q043's exact declared plan (see operators/text.py q043_rake_keywords)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    return (
        rake_native(docs, cut_occurrences=cut)
        .select("doc_id", "keyword", F.round("score", 4).alias("score"))
        .orderBy("doc_id", "keyword")
    )


def main():
    reps = 7
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    spark = get_spark(app_name="r15_rake_ab")
    spark.sparkContext.setLogLevel("ERROR")
    for cut in (True, False):
        build(spark, warm_dir, cut).write.format("noop").mode("overwrite").save()
    raw = {True: [], False: []}
    for _ in range(reps):
        for cut in (True, False):
            spark.sparkContext.setJobDescription(f"rake cut={cut}")
            t0 = time.perf_counter()
            build(spark, sf_dir, cut).write.format("noop").mode("overwrite").save()
            raw[cut].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for cut in (True, False):
        r = sorted(raw[cut])
        print(f"cut={cut!s:5} min={r[0]:.3f} med={r[len(r)//2]:.3f} max={r[-1]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
