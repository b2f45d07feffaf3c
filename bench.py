#!/usr/bin/env python
"""Headline benchmark: runs the bench-tagged registry queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count() forces the full plan; results
are not collected to the driver so the measurement is engine time, not
driver serialization)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from warcraider_spark.registry import all_specs  # noqa: E402
from warcraider_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="warcraider_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = {name: s for name, s in all_specs().items() if s.bench}

    # warm the JVM + parquet footers with one cheap action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name in sorted(specs):
        t0 = time.perf_counter()
        specs[name].builder(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
