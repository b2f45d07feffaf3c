"""Round-11 window rotation (VERDICT r10 directive #2: freshness — after
r10 certified the current window, the stale tail is the 43 r7-certified
rows plus the r8 pool; r11 takes all 43 r7 rows + the 6 lowest-numbered
r8 rows + the brand-new q192_mixture_pipeline_e2e (directive #6: the
composed quality-gate -> water-fill -> DSIR-apply -> packing plan,
oracle-verified at sf0.001/sf0.01/sf0.1 before this rotation). All 50
outgoing window rows hold fresh r10 hash rows, and the r10 judge
independently re-ran the whole 43-query r7 tail (43/43 hash-match), so
this is freshness bookkeeping, not risk. The r11 whitespace-class fix
(VERDICT r10 #1) churned NO certified hash — all three SF corpora are
whitespace-ASCII — and the 13 touched queries were re-verified at all
three SFs this round before rotating (see COVERAGE.md §2.3).

After this rotation the post-r11 ledger is: 0 never-certified, no row
older than r8.

Mechanics identical to renumber_r10.py (proven 10x): one simultaneous
longest-first regex pass over full names and bare qNNN references across
code + docs; historical round artifacts are NOT rewritten. After running:
regenerate the COVERAGE.md ledger, then PLAN_AUDIT.md LAST, then pytest +
driver_sim.
"""

from __future__ import annotations

import re
from pathlib import Path

SWAPS = [
    ("q001_stats_aggregates", "q062_sketch_theta_setops"),
    ("q002_percentiles", "q063_stream_stream_join"),
    ("q003_pivot", "q064_variant_nested_paths"),
    ("q004_string_family2", "q065_bpe_pretokenize"),
    ("q005_argminmax", "q066_benchmark_contamination"),
    ("q006_conditional_aggs", "q067_embedding_dim_profile"),
    ("q007_hash_sampling", "q068_lm_score"),
    ("q008_mixture_apply_select", "q069_gapfill_locf"),
    ("q009_domain_mixture_weights", "q070_unpivot_measures"),
    ("q010_dsir_select", "q071_range_frame"),
    ("q011_domain_quality_select", "q072_first_last_value"),
    ("q012_sql_text_interface", "q073_token_budget_select"),
    ("q013_png_codec_roundtrip", "q074_incremental_dedup"),
    ("q014_triangle_count", "q076_interval_bin_join"),
    ("q015_entity_resolution", "q077_span_excision"),
    ("q016_heavy_hitters", "q078_agg_distinct"),
    ("q017_recursive_reachability", "q080_cube"),
    ("q018_pii_redaction", "q082_left_join_agg"),
    ("q019_cosine_topk_bruteforce", "q083_semi_anti"),
    ("q020_audio_dominant_freq", "q086_cdc_excision"),
    ("q021_video_frame_sample", "q088_cdc_chunk_dedup"),
    ("q022_ivf_assign", "q096_bpe_encode"),
    ("q023_sparse_dot_topk", "q097_pq_encode"),
    ("q024_ivf_topk_search", "q098_dim_covariance"),
    ("q025_link_degrees", "q099_inverted_index"),
    ("q026_group_spectral_stats", "q100_scd2_intervals"),
    ("q027_tumbling_window", "q101_semantic_dedup"),
    ("q028_corpus_snapshot_diff", "q102_lateral_topk"),
    ("q029_session_window", "q105_stratified_sample"),
    ("q030_watermark_semantics", "q106_winsorize"),
    ("q031_longest_prefix_route", "q107_corpus_shard"),
    ("q032_progressive_jpeg", "q111_nullsafe_join"),
    ("q033_media_features", "q113_skyline_docs"),
    ("q034_jpeg_codec_roundtrip", "q115_line_dedup"),
    ("q035_mp4_demux_decode", "q121_quantified_subqueries"),
    ("q036_decontaminate", "q124_crosstab"),
    ("q037_bloom_dedup_probe", "q125_perceptron_train"),
    ("q038_split_leakage", "q133_order_priority_exists"),
    ("q039_simhash_radius", "q134_disjunctive_part_join"),
    ("q040_bpe_merge_train", "q135_waiting_suppliers"),
    ("q041_ngram_novelty", "q150_dormant_rich_customers"),
    ("q042_time_range_frame", "q155_try_functions"),
    ("q043_rake_keywords", "q159_collated_grouping"),
    ("q044_image_pyramid_resize", "q171_set_containment_join"),
    ("q045_merge_upsert", "q174_url_canonical_dedup"),
    ("q046_kmeans_codebook", "q188_date_family2"),
    ("q047_salted_skew_join", "q189_posexplode"),
    ("q048_bigram_udtf", "q190_to_json"),
    ("q049_sketch_distinct_rollup", "q191_null_semantics"),
    ("q050_two_stage_rerank", "q192_mixture_pipeline_e2e"),
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
        root / "tools" / "bench_bands.json",
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
