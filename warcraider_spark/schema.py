"""The url_resource output contract (SURVEY §1.3) — 18 fields, all
non-nullable, absent values encoded as ''/' '/0/empty (reference Avro
schema at /root/reference/src/main.rs:69-99; FIXTURES B2)."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["URL_RESOURCE_SCHEMA", "URL_RESOURCE_AVRO_JSON", "URL_RESOURCE_FIELDS"]

URL_RESOURCE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("hostname", StringType(), False),
        StructField("domain_name", StringType(), False),
        StructField("size_bytes", IntegerType(), False),
        StructField("load_time", FloatType(), False),
        StructField("title", StringType(), False),
        StructField("text_content", StringType(), False),
        StructField("headings_text", StringType(), False),
        StructField("word_count", IntegerType(), False),
        StructField("links", ArrayType(StringType(), False), False),
        StructField("resource_urls", ArrayType(StringType(), False), False),
        StructField("keywords", MapType(StringType(), FloatType(), False), False),
        StructField("meta_tags", MapType(StringType(), StringType(), False), False),
        StructField("headers", MapType(StringType(), StringType(), False), False),
        StructField("google_analytics", ArrayType(StringType(), False), False),
        StructField("google_analytics_config", ArrayType(StringType(), False), False),
        StructField("html_errors", StringType(), False),
        StructField("source", StringType(), False),
    ]
)

URL_RESOURCE_FIELDS = tuple(f.name for f in URL_RESOURCE_SCHEMA.fields)

# Avro twin (for df.write.format("avro").option("avroSchema", ...) when the
# spark-avro package is on the classpath; the sink falls back to parquet
# otherwise — see plans.pipeline.write_url_resource)
URL_RESOURCE_AVRO_JSON = json.dumps(
    {
        "type": "record",
        "name": "url_resource",
        "fields": [
            {"name": "url", "type": "string"},
            {"name": "hostname", "type": "string"},
            {"name": "domain_name", "type": "string"},
            {"name": "size_bytes", "type": "int"},
            {"name": "load_time", "type": "float"},
            {"name": "title", "type": "string"},
            {"name": "text_content", "type": "string"},
            {"name": "headings_text", "type": "string"},
            {"name": "word_count", "type": "int"},
            {"name": "links", "type": {"type": "array", "items": "string"}},
            {"name": "resource_urls", "type": {"type": "array", "items": "string"}},
            {"name": "keywords", "type": {"type": "map", "values": "float"}},
            {"name": "meta_tags", "type": {"type": "map", "values": "string"}},
            {"name": "headers", "type": {"type": "map", "values": "string"}},
            {"name": "google_analytics", "type": {"type": "array", "items": "string"}},
            {"name": "google_analytics_config", "type": {"type": "array", "items": "string"}},
            {"name": "html_errors", "type": "string"},
            {"name": "source", "type": "string"},
        ],
    }
)
