"""Python UDTF operator (Spark 4): table-valued document expansion.

The reference's WARC reader is UDTF-shaped (1 file → N records, SURVEY
§2.9 #1); this exposes the same shape through the first-class
``@udtf`` API on a text operator: one document → one row per token
bigram with positions — the n-gram expansion under shingle/minhash
sketching, as a lateral table function instead of explode expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warcraider_spark.registry import query
from warcraider_spark.tables import load_table


def bigram_udtf_class():
    """Factory for the UDTF class (self-contained eval: no module-level
    references, so workers need no package import)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, w1: string, w2: string")
    class BigramUDTF:
        def eval(self, doc_id: int, text: str):  # noqa: D401
            # ASCII \s split + drop empties — the house tokenizer
            # convention (q139 kernel, textfn.tokens). str.split() is
            # Unicode-whitespace and split MORE on U+3000/U+2028 docs
            # than every oracle's ASCII \s (r9 Unicode sweep, doc 1/11).
            import re

            toks = [w for w in re.split(r"\s+", text or "", flags=re.ASCII) if w]
            for i in range(len(toks) - 1):
                yield i, toks[i], toks[i + 1]

    return BigramUDTF


@query(
    "q048_bigram_udtf",
    # list_filter mirrors the UDTF's filtered split: NO empty tokens —
    # the bare regex split keeps a leading '' on whitespace-only docs
    # and would emit a phantom ('','') bigram the UDTF never yields (r8
    # short-doc adversarial sweep). The UDTF splits on ASCII \s (not
    # str.split's Unicode whitespace) so U+3000-spaced CJK docs agree
    # with this oracle (r9 Unicode sweep).
    oracle="""
WITH t AS (SELECT doc_id,
                  list_filter(string_split_regex(trim(text, ' '), '[\\s\\v]+'), x -> x <> '') AS toks
           FROM documents WHERE doc_id < 40)
SELECT doc_id, pos, w1, w2
FROM (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> {'pos': i - 1, 'w1': toks[i], 'w2': toks[i + 1]}), recursive := true)
  FROM t
)
ORDER BY doc_id, pos
""",
    tags=("udtf", "text"),
)
def q048_bigram_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral Python UDTF: documents → bigram rows, hash-checked against
    the pure-SQL expansion."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    Bigrams = bigram_udtf_class()
    spark.udtf.register("wr_bigrams", Bigrams)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.w1, b.w2
        FROM _udtf_docs d, LATERAL wr_bigrams(d.doc_id, d.text) b
        ORDER BY d.doc_id, b.pos
        """
    )
