#!/usr/bin/env python
"""r14 (VERDICT r13 #6): extend the 64x saturation protocol from q069
(winnowing pairs, the r12 study) to the rest of the winnowing family —
keep (q062), soft-dedup weights (q063), excision (q088), and the NEW
composed manifest (q197). Same harness as tools/scale_bench.py
(replica-salted disjoint corpora, codegen warmed, interleaved
median-of-3, noop sink) but focused on the four family operators so the
64x factor is affordable; in addition to walls it records the
output-linearity invariants per factor (clusters / weight mass /
spans / chars must grow exactly xK under disjoint replication).

Memory sizing (learned the hard way — first run crashed): the study
replicates what would be 64 executors' worth of data into ONE local
JVM, and the composed q197 additionally materializes its shared
selector checkpoint (~1 GB at 64x) PER REP while Python-GC lag defers
block cleanup across reps — at the default 8g driver heap a runtime
broadcast build then OOMs mid-study. The runner therefore defaults
SPARK_GRAFT_DRIVER_MEM to 32g (box has 128 GiB) and gc.collect()s
between reps so the ContextCleaner can reclaim dead checkpoint blocks
promptly. Neither matters on a real cluster: one pipeline run holds
ONE fpos checkpoint, spread across executors at ~1/K of the local
footprint.

Usage: python tools/winnowing_64x.py [base_sf_dir] [factors..., default 1 8 32 64]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from warcraider_spark.session import get_spark  # noqa: E402
from tools.scale_bench import (  # noqa: E402
    _excision_variant,
    _family_variant,
    _winnowing_keep_variant,
    _winnowing_weights_variant,
    build_scaled,
)

BUILDERS = {
    "q062_winnowing_dedup_keep[disjoint-replicas]": _winnowing_keep_variant,
    "q063_winnowing_soft_dedup_weights[disjoint-replicas]": _winnowing_weights_variant,
    "q088_exact_substring_excision[disjoint-replicas]": _excision_variant,
    "q197_winnowing_family_manifest[disjoint-replicas]": _family_variant,
}


def _audit(name: str, df):
    """Output-linearity signature per operator (everything must be xK)."""
    if "dedup_keep" in name:
        row = df.agg(
            F.count(F.lit(1)).alias("clusters"),
            F.sum("n_members").alias("members"),
            F.sum("chars_removed").alias("chars_removed"),
        ).collect()[0]
    elif "soft_dedup_weights" in name:
        row = df.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("cluster_size") > 1).cast("int")).alias("clustered_docs"),
            F.round(F.sum("weight"), 6).alias("weight_mass"),
        ).collect()[0]
    elif "excision" in name:
        row = df.agg(
            F.count(F.lit(1)).alias("excised_docs"),
            F.sum("n_spans").alias("spans"),
            F.sum("chars_removed").alias("chars_removed"),
        ).collect()[0]
    else:  # family manifest
        row = df.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("cluster_size") > 1).cast("int")).alias("clustered_docs"),
            F.round(F.sum("weight"), 6).alias("weight_mass"),
            F.sum((~F.col("is_canonical")).cast("int")).alias("removed_docs"),
            F.sum("n_spans").alias("spans"),
            F.sum("chars_removed").alias("chars_removed"),
        ).collect()[0]
    return {k: (float(v) if isinstance(v, float) else int(v)) for k, v in row.asDict().items()}


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 8, 32, 64]
    root = "/tmp/scalebench"
    dirs = {k: build_scaled(base, k, root) for k in factors}

    spark = get_spark(app_name="winnowing_64x")
    spark.sparkContext.setLogLevel("ERROR")
    warm = os.path.join(os.path.dirname(base.rstrip("/")), "sf0.001")
    warm = warm if os.path.isdir(warm) else base
    for b in BUILDERS.values():
        b(spark, warm).write.format("noop").mode("overwrite").save()

    ordered = sorted(BUILDERS)
    REPS = 3
    walls: dict[str, dict[int, float]] = {q: {} for q in ordered}
    audits: dict[str, dict[int, dict]] = {q: {} for q in ordered}
    for k in factors:
        raw: dict[str, list[float]] = {q: [] for q in ordered}
        for rep in range(REPS):
            offset = (rep * max(1, len(ordered) // REPS)) % max(1, len(ordered))
            for q in ordered[offset:] + ordered[:offset]:
                t0 = time.perf_counter()
                BUILDERS[q](spark, dirs[k]).write.format("noop").mode("overwrite").save()
                raw[q].append(time.perf_counter() - t0)
                # drop py4j refs NOW so the ContextCleaner can reclaim the
                # rep's checkpoint blocks before the next one allocates
                gc.collect()
            print(f"PROGRESS x{k} rep{rep} done", file=sys.stderr, flush=True)
        for q in ordered:
            reps = sorted(raw[q])
            walls[q][k] = round(reps[len(reps) // 2], 2)
            walls[q + "|reps"] = walls.get(q + "|reps", {})
            walls[q + "|reps"][k] = [round(x, 2) for x in raw[q]]  # type: ignore[assignment]
            audits[q][k] = _audit(q, BUILDERS[q](spark, dirs[k]))
            gc.collect()

    print(json.dumps({"walls": walls, "audits": audits, "factors": factors}))


if __name__ == "__main__":
    main()
