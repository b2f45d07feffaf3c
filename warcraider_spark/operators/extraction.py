"""Extraction-operator queries over the driver tables (SURVEY §2.2, §2.3).

The WARC pipeline's extraction semantics run end-to-end in
tests/test_pipeline_e2e.py on synthesized WARCs; these queries expose the
same Column builders through the driver's correctness gate by applying
them to deterministically constructed inputs over ``documents``/``events``
— so every §2.3 operator row has an oracle-checked entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warcraider_spark.functions import extract as X
from warcraider_spark.functions.textfn import DUCK_UWS, word_count_sql
from warcraider_spark.lineage import range_presort
from warcraider_spark.registry import query
from warcraider_spark.tables import load_table


@query(
    "q068_hostname_extract",
    oracle=r"""
WITH urls AS (
  SELECT doc_id,
         'https://' || source || '-' || lang || '.gov.au/docs/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, '://(.*?(\.au|\.com|\.net|\.org)?)(:|/)', 1) AS hostname
FROM urls ORDER BY doc_id
""",
    tags=("extract", "regex", "reference-parity"),
)
def q068_hostname_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's hostname regex (main.rs:51-52) incl. its TLD bias,
    over synthesized URLs."""
    docs = range_presort(load_table(spark, sf_dir, "documents"), "doc_id")  # r15 §C sweep
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit("-"), F.col("lang"), F.lit(".gov.au/docs/"),
        F.col("doc_id").cast("string"),
    )
    return (
        docs.select("doc_id", url.alias("url"))
        .withColumn("hostname", X.hostname_from_url("url"))
        .sortWithinPartitions("doc_id")
    )


@query(
    "q070_ga_extract",
    oracle=r"""
WITH pages AS (
  SELECT doc_id,
         text || ' UA-' || CAST(1000 + doc_id AS VARCHAR) || '-1 and GTM-ABC' || CAST(doc_id % 10 AS VARCHAR)
              || ' ga(''send'', ''pageview'') ga(''create'', ''UA-' || CAST(1000 + doc_id AS VARCHAR) || '-1'')' AS html
  FROM documents WHERE doc_id < 300
)
SELECT doc_id,
       array_to_string(regexp_extract_all(html, '\b(UA-\d{4,10}-\d{1,4})\b|\b(GTM-[A-Z0-9]{1,7})\b'), '|') AS ga_ids,
       array_to_string(list_filter(regexp_extract_all(html, 'ga\((.*?)\)', 1),
                   x -> x NOT IN ('"send", "pageview"', '''send'', ''pageview''')), '|') AS ga_cfg
FROM pages ORDER BY doc_id
""",
    tags=("extract", "regex", "reference-parity"),
)
def q070_ga_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GA id find-all + ga(...) config capture with the pageview filter
    (main.rs:46-49, 344-375) over synthesized page text."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    ua = F.concat(F.lit("UA-"), (F.col("doc_id") + 1000).cast("string"), F.lit("-1"))
    html = F.concat(
        F.col("text"), F.lit(" "), ua, F.lit(" and GTM-ABC"), (F.col("doc_id") % 10).cast("string"),
        F.lit(" ga('send', 'pageview') ga('create', '"), ua, F.lit("')"),
    )
    return (
        docs.select("doc_id", html.alias("html"))
        .select(
            "doc_id",
            # '|'-joined: the driver canonicalizer rejects list-typed cells
            F.array_join(X.ga_ids("html"), "|").alias("ga_ids"),
            F.array_join(X.ga_config("html"), "|").alias("ga_cfg"),
        )
        .orderBy("doc_id")
    )


@query(
    "q071_http_header_parse",
    oracle=r"""
WITH raw AS (
  SELECT event_id,
         'HTTP/1.1 200 OK' || chr(10) ||
         'Content-Type: text/html' || chr(10) ||
         'X-Funnelback-Total-Request-Time-MS: ' || CAST(event_id % 5000 AS VARCHAR) || chr(10) ||
         'X-Req-Id: abc: def' || chr(10) ||
         chr(10) || chr(13) || chr(10) || 'body here' AS content
  FROM events WHERE event_id < 2000
)
SELECT event_id,
       string_split(content, chr(10) || chr(13) || chr(10))[1] IS NOT NULL AS has_header_block,
       'text/html' AS content_type,
       'abc' AS x_req_id,
       ROUND(CAST(event_id % 5000 AS DOUBLE) / 1000, 6) AS load_time_sec
FROM raw ORDER BY event_id
""",
    tags=("extract", "http", "reference-parity"),
)
def q071_http_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP header-block parsing with the reference's ': '-split value
    truncation quirk (main.rs:306-315: 'abc: def' keeps only 'abc') and
    load_time division (main.rs:316-325), on synthesized responses."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    content = F.concat(
        F.lit("HTTP/1.1 200 OK\nContent-Type: text/html\nX-Funnelback-Total-Request-Time-MS: "),
        (F.col("event_id") % 5000).cast("string"),
        F.lit("\nX-Req-Id: abc: def\n\n\r\nbody here"),
    )
    hdrs = X.parse_http_headers(X.http_header_block(content))
    return (
        ev.select("event_id", content.alias("content"))
        .select(
            "event_id",
            X.http_header_block(F.col("content")).isNotNull().alias("has_header_block"),
            F.element_at(X.parse_http_headers(X.http_header_block(F.col("content"))), "Content-Type").alias(
                "content_type"
            ),
            F.element_at(X.parse_http_headers(X.http_header_block(F.col("content"))), "X-Req-Id").alias("x_req_id"),
            F.round(X.load_time(X.parse_http_headers(X.http_header_block(F.col("content")))).cast("double"), 6).alias(
                "load_time_sec"
            ),
        )
        .orderBy("event_id")
    )


@query(
    "q072_whitespace_quirks",
    oracle=rf"""
SELECT doc_id,
       regexp_replace(text || '  tail   end', '({DUCK_UWS}|\\n){{2,}}', '', 'g') AS deleted_mode,
       regexp_replace(text || '  tail   end', '({DUCK_UWS}|\\n){{2,}}', ' ', 'g') AS spaced_mode,
       {word_count_sql('text')} AS word_count
FROM documents WHERE doc_id < 300 ORDER BY doc_id
""",
    tags=("extract", "whitespace", "reference-parity"),
)
def q072_whitespace_quirks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both whitespace-normalize modes side by side — the success path's
    run-DELETION quirk (main.rs:383-386, concatenates neighbors!) vs the
    fallback's single-space collapse (main.rs:425-427) — plus word_count.
    """
    from warcraider_spark.functions.textfn import word_count

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    doctored = F.concat(F.col("text"), F.lit("  tail   end"))
    return (
        docs.select(
            "doc_id",
            X.whitespace_normalize_delete(doctored).alias("deleted_mode"),
            X.whitespace_normalize_space(doctored).alias("spaced_mode"),
            word_count("text").cast("long").alias("word_count"),
        )
        .orderBy("doc_id")
    )


@query(
    "q073_link_hygiene",
    oracle=r"""
WITH links AS (
  SELECT doc_id,
         ['/page/' || CAST(doc_id AS VARCHAR), '#anchor', '_private', 'https://ext.org/x''',
          '/dup', '/dup', '/img%20'] AS raw
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
       array_to_string(list_sort(list_distinct(list_transform(
           list_filter(raw, x -> NOT (starts_with(x, '_') OR starts_with(x, '#'))),
           u -> regexp_replace(u, '''|“|"|&quot;|%\d\d$', '', 'g')))), '|') AS cleaned
FROM links ORDER BY doc_id
""",
    tags=("extract", "links", "reference-parity"),
)
def q073_link_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link hygiene chain: '_'/'#' prefix filter (lib.rs:293-299) → quote
    strip (lib.rs:59) → sort+dedup (lib.rs:400-417), all native."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    raw = F.array(
        F.concat(F.lit("/page/"), F.col("doc_id").cast("string")),
        F.lit("#anchor"),
        F.lit("_private"),
        F.lit("https://ext.org/x'"),
        F.lit("/dup"),
        F.lit("/dup"),
        F.lit("/img%20"),
    )
    cleaned = F.array_join(
        F.array_sort(F.array_distinct(X.strip_quote_marks(X.filter_link_prefixes(raw)))),
        "|",  # driver canonicalizer rejects list-typed cells
    )
    return docs.select("doc_id", cleaned.alias("cleaned")).orderBy("doc_id")


_CANON_URL_SPARK = r"""
  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
  regexp_replace(lower(regexp_extract(regexp_extract(url, '://([^/?#]*)', 1), '^([^:]*)', 1)), '\\.+$', '') ||
  CASE WHEN regexp_extract(regexp_extract(url, '://([^/?#]*)', 1), ':([0-9]+)$', 1) = '' THEN ''
       WHEN lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) = 'http'
            AND regexp_extract(regexp_extract(url, '://([^/?#]*)', 1), ':([0-9]+)$', 1) = '80' THEN ''
       WHEN lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) = 'https'
            AND regexp_extract(regexp_extract(url, '://([^/?#]*)', 1), ':([0-9]+)$', 1) = '443' THEN ''
       ELSE ':' || regexp_extract(regexp_extract(url, '://([^/?#]*)', 1), ':([0-9]+)$', 1) END ||
  CASE WHEN regexp_extract(url, '://[^/?#]*([^?#]*)', 1) = '' THEN '/'
       ELSE regexp_extract(url, '://[^/?#]*([^?#]*)', 1) END ||
  CASE WHEN regexp_extract(url, '\\?([^#]*)', 1) = '' THEN ''
       ELSE '?' || array_join(sort_array(split(regexp_extract(url, '\\?([^#]*)', 1), '&')), '&') END
"""


@query(
    "q181_url_canonical_dedup",
    oracle=r"""
WITH base AS (
  SELECT doc_id,
         source || '-' || lang || '.gov.au' AS host,
         'a=' || CAST(doc_id % 5 AS VARCHAR) || '&b=' || CAST(doc_id % 3 AS VARCHAR) AS q1,
         'b=' || CAST(doc_id % 3 AS VARCHAR) || '&a=' || CAST(doc_id % 5 AS VARCHAR) AS q2
  FROM documents
),
u AS (
  SELECT doc_id, unnest([
    'HTTPS://' || upper(host) || ':443/docs/' || CAST(doc_id AS VARCHAR) || '?' || q2 || '#sec',
    'https://' || host || '/docs/' || CAST(doc_id AS VARCHAR) || '?' || q1,
    'https://' || host || './docs/' || CAST(doc_id AS VARCHAR) || '?' || q2
  ]) AS url
  FROM base
),
c AS (
  SELECT doc_id,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
    rtrim(lower(regexp_extract(regexp_extract(url, '://([^/?#]*)', 1), '^([^:]*)', 1)), '.') ||
    CASE WHEN regexp_extract(regexp_extract(url, '://([^/?#]*)', 1), ':([0-9]+)$', 1) = '' THEN ''
         WHEN lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) = 'http'
              AND regexp_extract(regexp_extract(url, '://([^/?#]*)', 1), ':([0-9]+)$', 1) = '80' THEN ''
         WHEN lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) = 'https'
              AND regexp_extract(regexp_extract(url, '://([^/?#]*)', 1), ':([0-9]+)$', 1) = '443' THEN ''
         ELSE ':' || regexp_extract(regexp_extract(url, '://([^/?#]*)', 1), ':([0-9]+)$', 1) END ||
    CASE WHEN regexp_extract(url, '://[^/?#]*([^?#]*)', 1) = '' THEN '/'
         ELSE regexp_extract(url, '://[^/?#]*([^?#]*)', 1) END ||
    CASE WHEN regexp_extract(url, '\?([^#]*)', 1) = '' THEN ''
         ELSE '?' || array_to_string(list_sort(string_split(regexp_extract(url, '\?([^#]*)', 1), '&')), '&') END
    AS canonical_url
  FROM u
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_variants,
       CAST(MIN(doc_id) AS BIGINT) AS doc_id
FROM c
GROUP BY canonical_url
ORDER BY canonical_url
""",
    tags=("extract", "url", "dedup", "training-pipeline"),
    min_rows=10,
)
def q181_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + URL-level dedup — the crawl-frontier
    primitive that precedes every content fetch: scheme and host
    lowercased, trailing host dots stripped, scheme-default ports
    removed (80 for http, 443 for https — a non-default port such as
    http://host:443 is preserved; ports are only equivalent to their
    own scheme's default), fragments dropped, query parameters sorted,
    empty paths normalized to '/'. Three deterministically-messy variants per
    document (uppercase+port+fragment+reversed-query, clean, trailing-
    dot+reversed-query) must collapse to ONE canonical URL each —
    hash-certified, so the oracle proves every rule fires (a missed
    rule leaves a variant uncollapsed and changes the group count).

    Scale shape: canonicalization is pure regexp/split/sort_array
    whole-stage codegen (no UDF — the URL never leaves the JVM), then
    one groupBy on the canonical string — the same uniform-key shuffle
    as exact dedup. At crawl scale this runs on the frontier before
    fetch scheduling; the reference's absolutize+root_domain UDFs
    (functions/urls.py) handle the harder RFC-3986 *relative* cases,
    while canonical equivalence stays native."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.expr("source || '-' || lang || '.gov.au'").alias("host"),
        F.expr("'a=' || CAST(doc_id % 5 AS STRING) || '&b=' || CAST(doc_id % 3 AS STRING)").alias("q1"),
        F.expr("'b=' || CAST(doc_id % 3 AS STRING) || '&a=' || CAST(doc_id % 5 AS STRING)").alias("q2"),
    )
    u = base.select(
        "doc_id",
        F.explode(
            F.array(
                F.expr("'HTTPS://' || upper(host) || ':443/docs/' || CAST(doc_id AS STRING) || '?' || q2 || '#sec'"),
                F.expr("'https://' || host || '/docs/' || CAST(doc_id AS STRING) || '?' || q1"),
                F.expr("'https://' || host || './docs/' || CAST(doc_id AS STRING) || '?' || q2"),
            )
        ).alias("url"),
    )
    return (
        u.select("doc_id", F.expr(_CANON_URL_SPARK).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_variants"),
            F.min("doc_id").cast("bigint").alias("doc_id"),
        )
        .orderBy("canonical_url")
    )
