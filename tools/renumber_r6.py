"""Round-6 window swap (same mechanics as tools/renumber_r4b.py, which
see): VERDICT r5 directive #1 — the driver window q001–q050 was byte-
identical for three rounds, so nine never-driver-certified flagships
trade slots with nine already-multiply-certified window queries whose
operator content keeps in-window anchors:

    q002_dedup_keep_canonical <-> q114_sql_text_interface
        (dedup family: q001 exact groups, q043 clusters stay in-window;
         the SQL-text front door is the §2.11 relational representative)
    q004_simhash_dupes        <-> q151_png_codec_roundtrip
        (simhash: q036 radius search stays; PNG codec never certified)
    q012_ann_sign_lsh         <-> q152_audio_dominant_freq
        (ANN: q011 brute / q014 IVF-assign / q016 IVF-topk stay)
    q013_label_centroids      <-> q153_video_frame_sample
        (centroids: q045 k-means stays; PPM-video codec never certified)
    q015_repetition_ratio     <-> q172_sparse_dot_topk
        (text: q010/q037/q044 stay; sparse-dot is a bench headliner)
    q021_sliding_window       <-> q176_corpus_snapshot_diff
        (streaming windows: q020 tumbling / q022 session / q023 watermark stay)
    q024_stream_static_enrich <-> q179_longest_prefix_route
        (streaming: q020/q022/q023 stay; prefix routing never certified)
    q028_media_stats          <-> q180_tfidf
        (media: q026/q027/q029/q030 + incoming codecs cover the family)
    q033_countmin_freq        <-> q181_warc_range_scan
        (sketches: q032 bloom / q048 theta rollup stay; the r5 ranged-WARC
         flagship gets a hard driver row)

Mechanics identical to renumber_r4b.py: one simultaneous longest-first
regex pass over full names and bare qNNN doc references; historical
round artifacts are NOT rewritten.
"""

from __future__ import annotations

import re
from pathlib import Path

SWAPS = [
    ("q002_dedup_keep_canonical", "q114_sql_text_interface"),
    ("q004_simhash_dupes", "q151_png_codec_roundtrip"),
    ("q012_ann_sign_lsh", "q152_audio_dominant_freq"),
    ("q013_label_centroids", "q153_video_frame_sample"),
    ("q015_repetition_ratio", "q172_sparse_dot_topk"),
    ("q021_sliding_window", "q176_corpus_snapshot_diff"),
    ("q024_stream_static_enrich", "q179_longest_prefix_route"),
    ("q028_media_stats", "q180_tfidf"),
    ("q033_countmin_freq", "q181_warc_range_scan"),
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
