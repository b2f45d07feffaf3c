"""A/B the POSITION-annotated winnowing selector (q088/q197's wins stage)
at sf0.1: old double-slice argmin (array_min(slice) + array_position(slice)
— two slice materializations and up to 2W-1 string compares per window,
then an element_at re-lookup to fetch the gram) vs new struct argmin (one
slice of struct(gram, pos), one array_min — struct ordering compares gram
first then pos, so the min IS the first occurrence of the window minimum,
byte-identical selection). Both exploded to the folded (doc_id, f, p)
stream and noop-sunk; equality asserted at sf0.01 first.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from warcraider_spark.session import get_spark

K, W = 20, 8

GRAMS = f"transform(sequence(1, length(text)-{K - 1}), i -> substring(text, i, {K}))"
OLD_WINS = (
    f"array_distinct(transform(sequence(1, size(grams)-{W - 1}), "
    f"j -> cast(j + array_position(slice(grams, j, {W}), "
    f"array_min(slice(grams, j, {W}))) - 1 as int)))"
)
# struct(gram, pos): min = (min gram, earliest pos) = first occurrence.
GP = (
    f"transform(sequence(1, length(text)-{K - 1}), "
    f"i -> struct(substring(text, i, {K}) AS f, cast(i AS int) AS p))"
)
NEW_FPOS = (
    f"array_distinct(transform(sequence(1, size(gp)-{W - 1}), "
    f"j -> array_min(slice(gp, j, {W}))))"
)


def main():
    spark = get_spark(app_name="r14_wins_ab")
    spark.sparkContext.setLogLevel("ERROR")

    def docs(sf):
        return (
            spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
            .filter(F.length("text") >= K + W - 1)
            .repartition(32)
        )

    def old_fpos(d):
        return (
            d.withColumn("grams", F.expr(GRAMS))
            .withColumn("wins", F.expr(OLD_WINS))
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "array_distinct(transform(wins, "
                        "p -> struct(xxhash64(element_at(grams, p)) AS f, p AS p)))"
                    )
                ).alias("fp"),
            )
            .select("doc_id", F.col("fp.f").alias("f"), F.col("fp.p").alias("p"))
        )

    def new_fpos(d):
        return (
            d.select("doc_id", F.expr(GP).alias("gp"))
            .select("doc_id", F.explode(F.expr(NEW_FPOS)).alias("fp"))
            .select(
                "doc_id", F.xxhash64(F.col("fp.f")).alias("f"), F.col("fp.p").alias("p")
            )
        )

    # equality check at sf0.01 (exact rows)
    a = old_fpos(docs("sf0.01"))
    b = new_fpos(docs("sf0.01"))
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"sf0.01 equality: diff_rows={diff} (a={a.count()}, b={b.count()})")
    assert diff == 0

    variants = {"old": old_fpos, "new": new_fpos}
    d1 = docs("sf0.1")
    for fn in variants.values():
        fn(d1).write.format("noop").mode("overwrite").save()
    raw = {k: [] for k in variants}
    for _ in range(7):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"wins_ab:{k}")
            t0 = time.perf_counter()
            fn(d1).write.format("noop").mode("overwrite").save()
            raw[k].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for k, r in raw.items():
        r = sorted(r)
        print(
            f"{k}: min={r[0]:.3f} med={r[len(r) // 2]:.3f} max={r[-1]:.3f} "
            f"all={[round(x, 2) for x in r]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
