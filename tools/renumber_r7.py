"""Round-7 window rotation (VERDICT r6 directive #1: "triple the rotation
rate"): ALL FIFTY window slots q001-q050 trade with never-driver-certified
queries, giving the §2.11 relational/warehouse backlog (q086-q163: stats,
percentiles, pivot/unpivot, null semantics, VARIANT, subqueries, TPC-H
shapes, SCD2, gap-fill...), the streaming tail (q108 stream-stream join,
directive #6), the training-pipeline cousins (BPE encode, inverted index,
semantic dedup, line dedup, shard/sample/winsorize...) and q184 URL
canonicalization their FIRST hard driver rows. Every outgoing query holds
a fresh r6 row, and the rename-stable ledger (tools/coverage_ledger.py)
keeps their certification history attached to the suffix.

Deferred to r8 (16 of 66 never-certified, lowest marginal value): the four
rows-only sketches/ML variants (q076/q105/q106/q107 — the driver records
only a weaker rows-only check for them), three media cousins of eight
hard-certified codec queries (q113/q121/q174), four family cousins whose
sibling is already in this window (q115 set-ops-all, q124 rollup-layers,
q125 array-agg, q155 explode-outer), three layout/profiling diagnostics
(q133/q134/q135), q150 concat-chunk-blocks and q111 weighted-mixture.

Mechanics identical to renumber_r6.py (proven 6x): one simultaneous
longest-first regex pass over full names and bare qNNN references across
code + docs; historical round artifacts are NOT rewritten. After running:
regenerate PLAN_AUDIT.md and the COVERAGE.md ledger, then pytest +
driver_sim.
"""

from __future__ import annotations

import re
from pathlib import Path

SWAPS = [
    ("q001_exact_dedup_groups", "q086_stats_aggregates"),
    ("q002_sql_text_interface", "q087_percentiles"),
    ("q003_minhash_lsh_pairs", "q088_pivot"),
    ("q004_png_codec_roundtrip", "q089_string_family2"),
    ("q005_triangle_count", "q090_argminmax"),
    ("q006_entity_resolution", "q091_conditional_aggs"),
    ("q007_training_data_pipeline", "q092_hash_sampling"),
    ("q008_heavy_hitters", "q093_null_semantics"),
    ("q009_recursive_reachability", "q094_date_family2"),
    ("q010_pii_redaction", "q095_posexplode"),
    ("q011_cosine_topk_bruteforce", "q103_to_json"),
    ("q012_audio_dominant_freq", "q104_sketch_theta_setops"),
    ("q013_video_frame_sample", "q108_stream_stream_join"),
    ("q014_ivf_assign", "q109_variant_nested_paths"),
    ("q015_sparse_dot_topk", "q110_bpe_pretokenize"),
    ("q016_ivf_topk_search", "q112_benchmark_contamination"),
    ("q017_link_degrees", "q116_embedding_dim_profile"),
    ("q018_pagerank", "q117_lm_score"),
    ("q019_group_spectral_stats", "q118_gapfill_locf"),
    ("q020_tumbling_window", "q119_unpivot_measures"),
    ("q021_corpus_snapshot_diff", "q123_range_frame"),
    ("q022_session_window", "q126_first_last_value"),
    ("q023_watermark_semantics", "q127_token_budget_select"),
    ("q024_longest_prefix_route", "q129_incremental_dedup"),
    ("q025_connected_components", "q130_interval_bin_join"),
    ("q026_progressive_jpeg", "q131_span_excision"),
    ("q027_media_features", "q132_bpe_encode"),
    ("q028_tfidf", "q136_pq_encode"),
    ("q029_jpeg_codec_roundtrip", "q137_dim_covariance"),
    ("q030_mp4_demux_decode", "q138_inverted_index"),
    ("q031_decontaminate", "q139_scd2_intervals"),
    ("q032_bloom_dedup_probe", "q140_semantic_dedup"),
    ("q033_warc_range_scan", "q141_lateral_topk"),
    ("q034_warc_pipeline_e2e", "q143_stratified_sample"),
    ("q035_split_leakage", "q144_winsorize"),
    ("q036_simhash_radius", "q145_corpus_shard"),
    ("q037_bpe_merge_train", "q146_nullsafe_join"),
    ("q038_pmi_collocations", "q148_skyline_docs"),
    ("q039_ngram_novelty", "q149_line_dedup"),
    ("q040_time_range_frame", "q154_quantified_subqueries"),
    ("q041_rake_keywords", "q156_crosstab"),
    ("q042_image_pyramid_resize", "q157_perceptron_train"),
    ("q043_merge_upsert", "q158_order_priority_exists"),
    ("q044_cdc_chunk_dedup", "q159_disjunctive_part_join"),
    ("q045_kmeans_codebook", "q160_waiting_suppliers"),
    ("q046_salted_skew_join", "q161_dormant_rich_customers"),
    ("q047_bigram_udtf", "q162_try_functions"),
    ("q048_sketch_distinct_rollup", "q163_collated_grouping"),
    ("q049_cdc_excision", "q171_set_containment_join"),
    ("q050_two_stage_rerank", "q184_url_canonical_dedup"),
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
