"""Streaming-vs-batch WARC pipeline bench (VERDICT r8 #7).

stream_warc_pipeline was correctness-tested on tiny inputs only; this
measures the file-source stream against the batch path on a replicated
synthetic WARC corpus, and isolates PER-MICRO-BATCH overhead by driving
the same corpus through availableNow with maxFilesPerTrigger=1 (one
micro-batch per file) vs unbounded (one micro-batch total).

Usage:
    python tools/stream_warc_bench.py [n_files] [records_per_file]

Prints one JSON line:
    {"files": F, "records": R, "batch_sec": ..., "stream_1batch_sec": ...,
     "stream_per_file_sec": ..., "per_batch_overhead_sec": ...}

per_batch_overhead_sec = (stream_per_file - stream_1batch) / (F - 1):
the marginal cost of each extra micro-batch (offset-log commit, source
listing, sink file commit) once the parse work itself is held constant.
Record the resulting curve in SCALE.md §8.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcraider_spark.session import get_spark  # noqa: E402


def synth_corpus(d: str, n_files: int, per_file: int) -> int:
    """Deterministic multi-page WARC corpus: every page exercises the
    HTML parse (title/links/GA/meta), sizes ~4 KB."""
    from warcraider_spark.sources.warc import build_warc_bytes

    total = 0
    for f in range(n_files):
        records = []
        for r in range(per_file):
            i = f * per_file + r
            body = (
                f"<html><head><title>Page {i}</title>"
                f"<meta name='k' content='v{i}'></head><body>"
                + "".join(
                    f"<p>alpha beta gamma delta {i} {j} words here</p>"
                    f"<a href='/rel/{j}'>link {j}</a>"
                    for j in range(20)
                )
                + f"<script>ga('create', 'UA-{i % 97}-1', 'auto');</script>"
                "</body></html>"
            ).encode()
            page = b"HTTP/1.1 200 OK\nContent-Type: text/html\n"
            page += f"X-Funnelback-Total-Request-Time-MS: {100 + i % 900}\n".encode()
            page += b"\n\r\n" + body
            records.append(
                (
                    {
                        "WARC-Type": "response",
                        "WARC-Target-URI": f"https://host{i % 37}.example.gov.au/p/{i}",
                        "Uncompressed-Content-Length": str(len(page)),
                    },
                    page,
                )
            )
            total += 1
        with open(os.path.join(d, f"crawl-{f:03d}.warc"), "wb") as fh:
            fh.write(build_warc_bytes(records))
    return total


def run_batch(spark, warc_dir: str, out: str) -> float:
    from warcraider_spark.plans.pipeline import url_resource_from_warc_records
    from warcraider_spark.sources.warc import read_warc_auto

    t0 = time.perf_counter()
    res = url_resource_from_warc_records(read_warc_auto(spark, warc_dir))
    res.write.mode("overwrite").parquet(out)
    return time.perf_counter() - t0


def run_stream(spark, warc_dir: str, out: str, ckpt: str, mfpt: int | None) -> float:
    from warcraider_spark.streaming.windows import stream_warc_pipeline

    t0 = time.perf_counter()
    q = stream_warc_pipeline(
        spark, warc_dir, out, ckpt, max_files_per_trigger=mfpt
    )
    q.awaitTermination()
    return time.perf_counter() - t0


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    spark = get_spark(app_name="stream_warc_bench")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="swb_")
    warc_dir = os.path.join(root, "warc")
    os.makedirs(warc_dir)
    n_rec = synth_corpus(warc_dir, n_files, per_file)

    # warm the UDF/codegen path once on a single file
    warm = os.path.join(root, "warm")
    os.makedirs(warm)
    shutil.copy(
        os.path.join(warc_dir, "crawl-000.warc"), os.path.join(warm, "w.warc")
    )
    run_batch(spark, warm, os.path.join(root, "warm_out"))

    batch_sec = run_batch(spark, warc_dir, os.path.join(root, "out_batch"))
    one_sec = run_stream(
        spark, warc_dir, os.path.join(root, "out_s1"), os.path.join(root, "ck1"), None
    )
    per_file_sec = run_stream(
        spark, warc_dir, os.path.join(root, "out_sf"), os.path.join(root, "ckf"), 1
    )

    # row-count parity across all three paths
    nb = spark.read.parquet(os.path.join(root, "out_batch")).count()
    n1 = spark.read.parquet(os.path.join(root, "out_s1")).count()
    nf = spark.read.parquet(os.path.join(root, "out_sf")).count()
    assert nb == n1 == nf, (nb, n1, nf)

    overhead = (per_file_sec - one_sec) / max(n_files - 1, 1)
    print(
        json.dumps(
            {
                "files": n_files,
                "records": n_rec,
                "rows_out": nb,
                "batch_sec": round(batch_sec, 3),
                "stream_1batch_sec": round(one_sec, 3),
                "stream_per_file_sec": round(per_file_sec, 3),
                "per_batch_overhead_sec": round(overhead, 3),
            }
        ),
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
