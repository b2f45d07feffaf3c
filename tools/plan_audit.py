#!/usr/bin/env python
"""Automated physical-plan audit across the whole query registry.

For every registered query, builds the DataFrame at sf0.01 and reads its
`.explain("formatted")` output the way a scale reviewer would, counting:

- Exchange (shuffles) and BroadcastExchange (broadcasts)
- join strategies (BHJ / SMJ / SHJ / BNLJ / CartesianProduct)
- unpartitioned window specs (single-reducer risk)
- parquet scans with non-empty PushedFilters

and writes PLAN_AUDIT.md: a per-query table plus a flagged section for
the shapes that need justification at 100 TB (cartesians, nested-loop
joins, unpartitioned windows over non-shrunk inputs). tests/
test_plan_shape.py pins the load-bearing cases one by one; this report
is the fleet-wide sweep that catches a NEW query regressing a shape
nobody wrote a dedicated assertion for.

Usage: python tools/plan_audit.py [sf_dir] (writes PLAN_AUDIT.md in cwd)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcraider_spark.registry import all_specs  # noqa: E402
from warcraider_spark.session import get_spark  # noqa: E402

# Queries whose "suspicious" shapes are deliberate and documented; the
# audit still counts them but doesn't flag. Justifications live in the
# query docstrings (1-row broadcast attaches, shrunken-input windows).
KNOWN_OK = {
    # 1-row/bounded broadcast attach → BNLJ over a single row is free
    "q005_ngram_jaccard_pairs",
    "q011_cosine_topk_bruteforce",
    "q031_http_header_parse",
    "q038_shipmode_priority",
    "q044_sequence_packing",
    "q047_bigram_udtf",
    "q049_duplicate_spans",
    "q050_two_stage_rerank",
    "q104_sketch_theta_setops",
    "q112_benchmark_contamination",
    "q117_lm_score",
    "q127_token_budget_select",
    "q128_triangle_count",
    "q131_span_excision",
    "q135_source_cap",
    "q147_heavy_hitters",
    "q154_quantified_subqueries",
    "q157_perceptron_train",
    # window over a shrunken input (bucket summary / local-skyline
    # survivors / merge frontier), documented in the docstring
    "q124_rollup_layers",
    "q127_token_budget_select",
    "q148_skyline_docs",
    "q150_concat_chunk_blocks",
    "q037_bpe_merge_train",
    "q132_bpe_encode",
    "q139_scd2_intervals",
    "q118_gapfill_locf",
    "q120_recursive_reachability",
    "q108_stream_stream_join",
    # more 1-row/bounded attaches, audited 2026-08-13: q017/q133/q134/q138
    # attach a 1-row aggregate (reciprocal count / global bounds / totals /
    # corpus stats); q074 is a scalar subquery; q006 joins a bounded id
    # block (the verify stage); q014/q016 cross-join broadcast centroids
    # (plan-CI asserts the broadcast)
    "q006_embedding_neardup",
    "q014_ivf_assign",
    "q016_ivf_topk_search",
    "q017_link_degrees",
    "q074_having_avg_subquery",
    "q133_zorder_layout",
    "q134_key_skew_profile",
    "q138_inverted_index",
    # q100: global NTILE is a deliberate single-partition summary; its
    # docstring names q087/q076 as the 100 TB forms
    "q100_decile_distribution",
    # q161: TPC-H Q22 scalar cutoff — a 1-row broadcast attach
    "q161_dormant_rich_customers",
}


def _unpartitioned_windows(plan: str) -> int:
    n = 0
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        args = m.group(1)
        head = args.split(",")[0].strip()
        # partition columns precede ordering expressions; an ordering-first
        # spec (`col ASC NULLS FIRST, ...`) means there is NO partition spec
        if " ASC" in head or " DESC" in head:
            n += 1
    return n


def analyze_plan(name: str, plan: str) -> dict:
    """Count the scale-relevant shapes in one formatted explain string."""
    return {
        "query": name,
        # formatted mode puts the partitioning in a detail line:
        # "(n) Exchange\nArguments: hashpartitioning(...)"
        "exchange": len(re.findall(r"Arguments: hashpartitioning", plan))
        + len(re.findall(r"Arguments: rangepartitioning", plan)),
        "bcast": plan.count("BroadcastExchange"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "unpart_win": _unpartitioned_windows(plan),
        "pushed": int(bool(re.search(r"PushedFilters: \[[^\]]", plan))),
    }


def flags_for(row: dict) -> list[str]:
    """Scale-risk flags for one analyzed plan (empty for known-OK names)."""
    if "error" in row:
        return ["plan error"]
    if row["query"] in KNOWN_OK:
        return []
    out = []
    if row["cartesian"]:
        out.append("CartesianProduct")
    if row["bnlj"]:
        out.append("BroadcastNestedLoopJoin")
    if row["unpart_win"]:
        out.append("unpartitioned window")
    return out


def audit(sf_dir: str, spark=None) -> list[dict]:
    own_session = spark is None
    if own_session:
        spark = get_spark(app_name="plan_audit")
        spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, spec in sorted(all_specs().items()):
        try:
            df = spec.builder(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # plan-time failure is itself a finding
            rows.append({"query": name, "error": str(exc)[:120]})
            continue
        rows.append(analyze_plan(name, plan))
    if own_session:
        spark.stop()
    return rows


def render(rows: list[dict], sf_dir: str) -> str:
    out = [
        "# PLAN_AUDIT — fleet-wide physical-plan sweep",
        "",
        f"Generated by tools/plan_audit.py over {len(rows)} registry queries "
        f"at `{sf_dir}`. Columns: shuffle Exchanges, BroadcastExchanges, join",
        "strategies, unpartitioned window specs, and whether any parquet scan",
        "carries pushed filters. Flags call out shapes that are scale risks",
        "UNLESS the query's docstring documents why the input is bounded",
        "(1-row totals, bucket summaries, local-skyline survivors …) — the",
        "known-OK list in the tool mirrors those docstrings.",
        "",
        "| query | xchg | bcast | BHJ | SMJ | SHJ | BNLJ | cart | unpart-win | pushed |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    flagged = []
    for r in rows:
        if "error" in r:
            out.append(f"| {r['query']} | PLAN ERROR: {r['error']} |" + " |" * 8)
        else:
            out.append(
                "| {query} | {exchange} | {bcast} | {bhj} | {smj} | {shj} | {bnlj} "
                "| {cartesian} | {unpart_win} | {pushed} |".format(**r)
            )
        flagged.extend((r["query"], why) for why in flags_for(r))
    out.append("")
    if flagged:
        out.append("## Flagged (needs justification or a fix)")
        out.extend(f"- **{q}** — {why}" for q, why in flagged)
    else:
        out.append(
            "## Flagged\n\nNone — every cartesian/nested-loop/unpartitioned-"
            "window occurrence is on the documented known-OK list (bounded "
            "inputs)."
        )
    out.append("")
    return "\n".join(out)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows = audit(sf_dir)
    md = render(rows, sf_dir)
    with open("PLAN_AUDIT.md", "w") as fh:
        fh.write(md)
    n_flag = md.count("\n- **")
    print(f"PLAN_AUDIT.md written: {len(rows)} queries, {n_flag} flagged")


if __name__ == "__main__":
    main()
