#!/usr/bin/env python
"""Headline benchmark: runs the bench-tagged registry queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion with a noop datasource write: unlike
count(), which lets Catalyst prune top-level sorts/projections, the noop
sink consumes every row of the FULL physical plan while writing nothing, so
the measurement is engine time without driver serialization."""

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

    # Warm-up pass (JMH-style): run every bench plan once at the smallest
    # scale factor before timing. The generated whole-stage-codegen classes
    # are keyed by plan structure, not data path, so this compiles/JITs the
    # exact code the timed run executes — timings then measure steady-state
    # engine throughput (the number that extrapolates to a long-running
    # cluster job) instead of one-time classload/JIT cost, which was ~2-3s
    # of whichever query happened to run first.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in sorted(specs):
        specs[name].builder(spark, warm_dir).write.format("noop").mode("overwrite").save()

    # Median of 3 timed reps per query: single-shot wall times on a shared
    # machine show multi-second outliers (GC pause, CPU contention); the
    # median is the standard robust estimator and still counts real engine
    # work, never a cache of it (noop re-executes the full plan each rep).
    # r8: 3 → 5. An ambient-contention audit (three back-to-back full runs
    # on identical code: 39.3 / 30.5 / 24.7 s) showed bursty multi-second
    # noise that a 3-rep median still passes through; 5 reps keeps the
    # median inside the SCALE.md §11 bands under the same conditions.
    REPS = 5
    timings: dict[str, float] = {}
    # r9: the recorded artifact also carries each query's [min, max] rep
    # band — the driver's BENCH file is a shared-machine point sample,
    # and matched-pair deltas are judged against noise bands (SCALE.md
    # §11); embedding the band per round makes the artifact
    # self-interpreting instead of requiring a separate audit session.
    spread: dict[str, list[float]] = {}
    for name in sorted(specs):
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            specs[name].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        reps.sort()
        timings[name] = round(reps[len(reps) // 2], 3)
        spread[name] = [round(reps[0], 3), round(reps[-1], 3)]

    total = round(sum(timings.values()), 3)
    # Stable round-over-round comparator: the round-1 10-query subset.
    # The headline total grows as the bench set widens, so cross-round
    # drift is only meaningful on this frozen subset (VERDICT r3 #3).
    comparable = [
        "q049_exact_dedup_groups",
        "q048_minhash_lsh_pairs",
        "q047_training_data_pipeline",
        "q103_cosine_topk_bruteforce",
        "q119_tumbling_window",
        "q156_rake_keywords",
        "q075_pricing_summary",
        "q081_star_join_revenue",
        "q185_topk_per_group",
        "q004_token_stats",
    ]
    comparable_total = round(sum(timings[q] for q in comparable if q in timings), 3)
    print(
        json.dumps(
            {
                "metric": "bench_headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "comparable_subset": comparable_total,
                "sf": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
