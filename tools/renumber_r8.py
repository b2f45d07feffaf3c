"""Round-8 window rotation (VERDICT r7 directive #1: finish the
certification sweep): ALL FIFTY window slots q001-q050 trade outward —
every outgoing query holds a fresh r7 hash row — and the window fills
with the LAST 16 never-driver-certified queries (the sketch/ML-variant
rows-only tail q076/q105/q106/q107 — three of which r8 upgraded to full
hash checks via in-plan error-bound verdicts — plus the media cousins
q113/q121/q174, family cousins q115/q124/q125/q155, the layout/profiling
diagnostics q133/q134/q135, q150 and q111), 32 of the r1-stale
relational core (aggregates q051-q054, joins q055-q059, top-k/set-ops
q060-q063, the scalar families q064-q072, subqueries q073/q074, grouping
sets q077, and the TPC-H/as-of tail q096-q102 — the BigQuery-delegated
surface whose last hard rows predate three renumberings), and
q159/q171 so the r7-vectorized CDC chunker finally holds its own hard
row (VERDICT r7 "What's wrong" #1).

After this rotation the never-certified count is 0; the r1-stale
leftovers are 9 (q075, q078-q084, q085 — queued for r9 with the
r3-extraction tail per directive #2).

Mechanics identical to renumber_r7.py (proven 7x): one simultaneous
longest-first regex pass over full names and bare qNNN references across
code + docs; historical round artifacts are NOT rewritten. After running:
regenerate the COVERAGE.md ledger, then PLAN_AUDIT.md LAST, then pytest +
driver_sim.
"""

from __future__ import annotations

import re
from pathlib import Path

SWAPS = [
    ("q001_stats_aggregates", "q051_pricing_summary"),
    ("q002_percentiles", "q052_agg_distinct"),
    ("q003_pivot", "q053_rollup"),
    ("q004_string_family2", "q054_cube"),
    ("q005_argminmax", "q055_star_join_revenue"),
    ("q006_conditional_aggs", "q056_left_join_agg"),
    ("q007_hash_sampling", "q057_semi_anti"),
    ("q008_null_semantics", "q058_full_outer"),
    ("q009_date_family2", "q059_range_join"),
    ("q010_posexplode", "q060_topk_per_group"),
    ("q011_to_json", "q061_window_analytics"),
    ("q012_sketch_theta_setops", "q062_global_topk"),
    ("q013_stream_stream_join", "q063_set_ops"),
    ("q014_variant_nested_paths", "q064_string_funcs"),
    ("q015_bpe_pretokenize", "q065_regexp_funcs"),
    ("q016_benchmark_contamination", "q066_date_funcs"),
    ("q017_embedding_dim_profile", "q067_datepart_funcs"),
    ("q018_lm_score", "q068_math_funcs"),
    ("q019_gapfill_locf", "q069_array_funcs"),
    ("q020_unpivot_measures", "q070_json_funcs"),
    ("q021_range_frame", "q071_map_funcs"),
    ("q022_first_last_value", "q072_conditional_funcs"),
    ("q023_token_budget_select", "q073_exists_subquery"),
    ("q024_incremental_dedup", "q074_having_avg_subquery"),
    ("q025_interval_bin_join", "q076_approx_distinct"),
    ("q026_span_excision", "q077_grouping_sets"),
    ("q027_bpe_encode", "q096_promo_revenue"),
    ("q028_pq_encode", "q097_min_cost_supplier"),
    ("q029_dim_covariance", "q098_volume_shipping"),
    ("q030_inverted_index", "q099_top_customers_quarter"),
    ("q031_scd2_intervals", "q100_decile_distribution"),
    ("q032_semantic_dedup", "q101_asof_join"),
    ("q033_lateral_topk", "q102_rank_distribution"),
    ("q034_stratified_sample", "q105_sketch_kll_quantiles"),
    ("q035_winsorize", "q106_ml_lsh_variants"),
    ("q036_corpus_shard", "q107_approx_quantiles"),
    ("q037_nullsafe_join", "q111_weighted_mixture"),
    ("q038_skyline_docs", "q113_media_codec_roundtrip"),
    ("q039_line_dedup", "q115_setops_all"),
    ("q040_quantified_subqueries", "q121_image_content_dedup"),
    ("q041_crosstab", "q124_rollup_layers"),
    ("q042_perceptron_train", "q125_array_agg"),
    ("q043_order_priority_exists", "q133_zorder_layout"),
    ("q044_disjunctive_part_join", "q134_key_skew_profile"),
    ("q045_waiting_suppliers", "q135_source_cap"),
    ("q046_dormant_rich_customers", "q150_concat_chunk_blocks"),
    ("q047_try_functions", "q155_explode_outer"),
    ("q048_collated_grouping", "q159_cdc_chunk_dedup"),
    ("q049_set_containment_join", "q171_cdc_excision"),
    ("q050_url_canonical_dedup", "q174_parallel_jpeg_decode"),
]


def build_mapping() -> dict[str, str]:
    m: dict[str, str] = {}
    for a, b in SWAPS:
        na, sa = a.split("_", 1)
        nb, sb = b.split("_", 1)
        m[a] = f"{nb}_{sa}"
        m[b] = f"{na}_{sb}"
        m[na] = nb
        m[nb] = na
    return m


def main() -> None:
    root = Path(__file__).resolve().parent.parent
    mapping = build_mapping()
    pat = re.compile(
        r"\b(" + "|".join(re.escape(k) for k in sorted(mapping, key=len, reverse=True)) + r")\b"
    )
    targets: list[Path] = []
    for d in ("warcraider_spark", "tests"):
        targets += sorted((root / d).rglob("*.py"))
    targets += [
        root / "bench.py",
        root / "__spark_entry__.py",
        root / "COVERAGE.md",
        root / "SCALE.md",
        root / "PLAN_AUDIT.md",
        root / "FIXTURES.md",
        root / "tools" / "scale_bench.py",
        root / "tools" / "plan_audit.py",
        root / "tools" / "coverage_ledger.py",
        Path("/tmp/driver_sim.py"),
    ]
    total = 0
    for p in targets:
        if not p.exists():
            continue
        src = p.read_text()
        out, n = pat.subn(lambda mo: mapping[mo.group(1)], src)
        if n:
            p.write_text(out)
            total += n
            print(f"{p}: {n} replacements")
    print(f"total {total}")


if __name__ == "__main__":
    main()
