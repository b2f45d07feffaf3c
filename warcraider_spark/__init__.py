"""warcraider_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``govau/warcraider`` (a Rust WARC→Avro→BigQuery ETL), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, Arrow-batched pandas
UDFs only where built-ins genuinely cannot express the semantics
(HTML parse, RAKE, URL absolutization, WARC record splitting).

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, UTC, LAST_WIN map dedup)
- ``tables``     synthetic-table loaders (TPC-H-ish star + events/documents/embeddings)
- ``schema``     the 18-field ``url_resource`` output contract
- ``registry``   QuerySpec registry powering __spark_entry__, tests and bench
- ``functions``  column-expression builders + the four pandas UDFs
- ``operators``  declared query surface: relational, dedup, similarity, text
- ``sources``    WARC reader (binaryFile + mapInPandas splitter)
- ``plans``      end-to-end WARC → url_resource pipeline assembly
- ``streaming``  Structured Streaming variants (watermark/window/session)
"""

__version__ = "0.1.0"
