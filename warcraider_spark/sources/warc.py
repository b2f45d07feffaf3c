"""WARC source (SURVEY §2.1, §2.9 #1).

Replaces the reference's sequential ``rust_warc`` reader loop
(/root/reference/src/main.rs:199-226) with ``binaryFile`` scan +
``mapInPandas`` record splitter: one WARC file per input partition, records
streamed out in Arrow batches. The REPLICAS/OFFSET env-var sharding and the
2×50k record batching (main.rs:129-164) disappear — Spark's scheduler and
Arrow batching bound parallelism and memory instead.

Scale notes: WARC members are individually gzipped, so a single .warc file
is NOT byte-splittable — parallelism comes from many files (the reference's
corpus is 96 files; a 100 TB crawl is ~100k files, far more than executor
slots). ``spark.sql.files.maxPartitionBytes`` never splits mid-file because
binaryFile reads whole files.

Also provides ``write_warc_gz_records`` to synthesize test fixtures
(FIXTURES B1) and a Spark 4 Python DataSource (``warc`` format) wrapping
the same parser.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "WARC_RECORD_SCHEMA",
    "parse_warc_stream",
    "read_warc",
    "build_warc_bytes",
]

# FIXTURES B1 post-source schema
WARC_RECORD_SCHEMA = StructType(
    [
        StructField("warc_file", StringType(), False),
        StructField("record_idx", IntegerType(), False),
        StructField("version", StringType(), False),
        StructField("headers", MapType(StringType(), StringType()), False),
        StructField("content", BinaryType(), True),
    ]
)


def parse_warc_stream(data: bytes) -> Iterator[tuple[str, dict[str, str], bytes]]:
    """Iterate (version, headers, content) over a raw WARC byte stream.

    Tolerant reader: a malformed record header yields the sentinel version
    "0" with empty headers/content (the reference's warc_result! macro
    emits the same sentinel on iterator errors, main.rs:2-20) and stops.
    """
    stream = io.BufferedReader(io.BytesIO(data))
    while True:
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            yield "0", {}, b""
            return
        version = line.decode("ascii", "replace").strip().split("/", 1)[1]
        headers: dict[str, str] = {}
        while True:
            hline = stream.readline()
            if not hline or hline.strip() == b"":
                break
            if b":" in hline:
                k, _, v = hline.decode("utf-8", "replace").partition(":")
                headers[k.strip()] = v.strip()
        try:
            length = int(headers.get("Content-Length", "0"))
        except ValueError:
            yield "0", {}, b""
            return
        content = stream.read(length)
        yield version, headers, content


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files → DataFrame[warc_file, record_idx, version, headers,
    content]. One task per file; records stream out in Arrow batches."""
    from warcraider_spark.dist import ensure_package_on_executors
    ensure_package_on_executors()
    import pandas as pd

    binary = spark.read.format("binaryFile").load(path).select("path", "content")

    def split_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                out: list[dict] = []
                for idx, (version, headers, content) in enumerate(parse_warc_stream(row["content"])):
                    out.append(
                        {
                            "warc_file": row["path"],
                            "record_idx": idx,
                            "version": version,
                            "headers": headers,
                            "content": content,
                        }
                    )
                    if len(out) >= 2000:  # bound batch memory
                        yield pd.DataFrame(out)
                        out = []
                if out:
                    yield pd.DataFrame(out)

    return binary.mapInPandas(split_files, WARC_RECORD_SCHEMA)


def build_warc_bytes(records: list[tuple[dict[str, str], bytes]]) -> bytes:
    """Assemble a WARC byte stream from (headers, raw_body) pairs; bodies
    are gzipped per-member exactly like the crawl's layout (each WARC body
    is an individually gzipped HTTP response, main.rs:287-302)."""
    out = io.BytesIO()
    for headers, body in records:
        gz = gzip.compress(body, mtime=0)  # mtime=0: byte-identical fixtures run-to-run
        hdrs = dict(headers)
        hdrs.setdefault("WARC-Type", "response")
        hdrs["Content-Length"] = str(len(gz))
        out.write(b"WARC/1.0\r\n")
        for k, v in hdrs.items():
            out.write(f"{k}: {v}\r\n".encode())
        out.write(b"\r\n")
        out.write(gz)
        out.write(b"\r\n\r\n")
    return out.getvalue()


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource: spark.read.format("warc")
# ---------------------------------------------------------------------------

try:  # Python DataSource API (Spark 4+)
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _WarcInputPartition(InputPartition):
        def __init__(self, path: str) -> None:
            self.path = path

    class WarcDataSourceReader(DataSourceReader):
        """One input partition per WARC file (members are individually
        gzipped so files are the split unit — see module docstring)."""

        def __init__(self, options: dict) -> None:
            self.path = options.get("path")
            if not self.path:
                raise ValueError("warc datasource requires a path")

        def partitions(self):
            import glob as _glob
            import os as _os

            if _os.path.isdir(self.path):
                files = sorted(_glob.glob(_os.path.join(self.path, "*.warc")))
            else:
                files = sorted(_glob.glob(self.path)) or [self.path]
            return [_WarcInputPartition(p) for p in files]

        def read(self, partition):
            with open(partition.path, "rb") as f:
                data = f.read()
            for idx, (version, headers, content) in enumerate(parse_warc_stream(data)):
                yield (partition.path, idx, version, headers, content)

    class WarcDataSource(DataSource):
        """``spark.read.format("warc").load(path)`` → WARC_RECORD_SCHEMA.

        The upgrade path SURVEY §2.1 names: a first-class source instead
        of binaryFile+mapInPandas. Register per-session with
        ``register_warc_datasource(spark)``. Reads local/posix paths (the
        reader runs on executors; for object stores the binaryFile route
        in ``read_warc`` delegates range reads to the Hadoop connector).
        """

        @classmethod
        def name(cls) -> str:
            return "warc"

        def schema(self):
            return WARC_RECORD_SCHEMA

        def reader(self, schema):
            return WarcDataSourceReader(self.options)

    def register_warc_datasource(spark: SparkSession) -> bool:
        spark.dataSource.register(WarcDataSource)
        return True

except ImportError:  # pragma: no cover - Spark < 4 fallback

    def register_warc_datasource(spark: SparkSession) -> bool:
        return False
