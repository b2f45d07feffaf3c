"""A/B the winnowing selector expression alone at sf0.1: old nested-transform
form (W substrings per window) vs new grams-then-slice form (one substring
per position). Both exploded to the folded fingerprint stream and noop-sunk.
Interleaved reps."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from warcraider_spark.session import get_spark

K, W = 20, 8

OLD_SEL = (
    f"array_distinct(transform(sequence(1, length(text)-{K + W - 2}), "
    f"j -> array_min(transform(sequence(0, {W - 1}), "
    f"d -> substring(text, j+d, {K})))))"
)
NEW_GRAMS = f"transform(sequence(1, length(text)-{K - 1}), i -> substring(text, i, {K}))"
NEW_MINS = (
    f"array_distinct(transform(sequence(1, size(grams)-{W - 1}), "
    f"j -> array_min(slice(grams, j, {W}))))"
)


def main():
    spark = get_spark(app_name="r14_selector_ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .filter(F.length("text") >= K + W - 1)
        .repartition(32)
    )

    def old_fp():
        sel = f"array_distinct(transform({OLD_SEL}, s -> xxhash64(s)))"
        return docs.select("doc_id", F.explode(F.expr(sel)).alias("f"))

    def new_fp():
        sel = f"array_distinct(transform({NEW_MINS}, s -> xxhash64(s)))"
        return docs.select("doc_id", F.expr(NEW_GRAMS).alias("grams")).select(
            "doc_id", F.explode(F.expr(sel)).alias("f")
        )

    variants = {"old": old_fp, "new": new_fp}
    # warm both
    for fn in variants.values():
        fn().write.format("noop").mode("overwrite").save()
    raw = {k: [] for k in variants}
    for _ in range(7):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            raw[k].append(time.perf_counter() - t0)
    for k, r in raw.items():
        r = sorted(r)
        print(f"{k}: min={r[0]:.3f} med={r[len(r)//2]:.3f} max={r[-1]:.3f} all={[round(x,2) for x in r]}")
    spark.stop()


if __name__ == "__main__":
    main()
