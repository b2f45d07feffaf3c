"""Round-9 window rotation (VERDICT r8 directive #1: freshness — no
query's hard driver row should be older than 3 rounds): 48 of the 50
window slots trade outward (every outgoing query holds a fresh r8 hash
row); q031_decile_distribution and q034_sketch_kll_quantiles KEEP their
slots because both changed THIS round (the prefix-sum rewrite and the
non-vacuous p95 bound) and must re-certify on the new plans.

Incoming (48): the full stale tail — 12 r1 rows (q075/q078/q079/
q080-q085/q185-q187), 11 r3 rows (q164-q170/q173/q175/q177/q178),
16 r5 rows (q114/q120/q122/q128/q142/q147/q151/q152/q153/q172/q176/
q179/q180/q181/q182/q183) — plus 9 risk-ranked r6 rows: queries whose
CODE changed after their last cert (q130 CC rebuilt r8, q148 PMI guard
two-sided r8, q143/q141 warc skip + tidy catalog r8, q117 persist
lifecycle r8) and the sweep-touched dedup/text families (q092 e2e,
q088 MinHash, q086 exact dedup, q136 TF-IDF).

After this rotation the post-r9 ledger is: 0 never-certified, 0 rows
older than r6, and every query touched since its last cert re-certified.

Mechanics identical to renumber_r8.py (proven 8x): one simultaneous
longest-first regex pass over full names and bare qNNN references across
code + docs; historical round artifacts are NOT rewritten. After running:
regenerate the COVERAGE.md ledger, then PLAN_AUDIT.md LAST, then pytest +
driver_sim.
"""

from __future__ import annotations

import re
from pathlib import Path

SWAPS = [
    ("q001_pricing_summary", "q075_distinct_dropdups"),
    ("q002_agg_distinct", "q078_union_all_types"),
    ("q003_rollup", "q079_self_join_graph"),
    ("q004_cube", "q080_token_stats"),
    ("q005_star_join_revenue", "q081_lang_id"),
    ("q006_left_join_agg", "q082_quality_score"),
    ("q007_semi_anti", "q083_fingerprint"),
    ("q008_full_outer", "q084_shingle_fingerprint"),
    ("q009_range_join", "q085_word_count_ref"),
    ("q010_topk_per_group", "q185_datepart_funcs"),
    ("q011_window_analytics", "q186_math_funcs"),
    ("q012_global_topk", "q187_date_funcs"),
    ("q013_set_ops", "q164_hostname_extract"),
    ("q014_string_funcs", "q165_ga_extract"),
    ("q015_regexp_funcs", "q166_http_header_parse"),
    ("q016_gopher_repetition", "q167_whitespace_quirks"),
    ("q017_gopher_rules", "q168_link_hygiene"),
    ("q018_containment_dedup", "q169_array_set_funcs"),
    ("q019_array_funcs", "q170_retention_cohorts"),
    ("q020_json_funcs", "q173_funnel_conversion"),
    ("q021_map_funcs", "q175_record_range_scan"),
    ("q022_conditional_funcs", "q177_shipmode_priority"),
    ("q023_exists_subquery", "q178_variant_json"),
    ("q024_having_avg_subquery", "q114_dedup_keep_canonical"),
    ("q025_approx_distinct", "q120_embedding_quantize"),
    ("q026_grouping_sets", "q122_embedding_neardup"),
    ("q027_promo_revenue", "q128_ngram_jaccard_pairs"),
    ("q028_min_cost_supplier", "q142_dedup_clusters"),
    ("q029_volume_shipping", "q147_document_chunking"),
    ("q030_top_customers_quarter", "q151_simhash_dupes"),
    ("q032_asof_join", "q152_ann_sign_lsh"),
    ("q033_rank_distribution", "q153_label_centroids"),
    ("q035_ml_lsh_variants", "q172_repetition_ratio"),
    ("q036_approx_quantiles", "q176_sliding_window"),
    ("q037_weighted_mixture", "q179_stream_static_enrich"),
    ("q038_media_codec_roundtrip", "q180_media_stats"),
    ("q039_setops_all", "q181_countmin_freq"),
    ("q040_image_content_dedup", "q182_sequence_packing"),
    ("q041_rollup_layers", "q183_duplicate_spans"),
    ("q042_array_agg", "q130_connected_components"),
    ("q043_zorder_layout", "q148_pmi_collocations"),
    ("q044_key_skew_profile", "q143_warc_pipeline_e2e"),
    ("q045_source_cap", "q141_warc_range_scan"),
    ("q046_concat_chunk_blocks", "q117_pagerank"),
    ("q047_explode_outer", "q092_training_data_pipeline"),
    ("q048_cdc_chunk_dedup", "q088_minhash_lsh_pairs"),
    ("q049_cdc_excision", "q086_exact_dedup_groups"),
    ("q050_parallel_jpeg_decode", "q136_tfidf"),
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
