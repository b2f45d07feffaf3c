"""Round-4 window swap (VERDICT r3 directive #1).

The driver's correctness gate certifies the first 50 sorted names, so the
six round-3 flagships (real JPEG + MP4 codecs, decontamination, Bloom
probe, count-min sketch, SimHash radius search) — each oracle-paired and
locally green at 3 SFs — had no driver evidence. They trade slots with six
already-thrice-certified low-information window queries whose operator
content is also pinned by q034's byte-deterministic golden + pytest
(single-regex extracts) or by sibling in-registry families (array funcs:
q069/q125):

    q029_hostname_extract   <-> q164_jpeg_codec_roundtrip
    q030_ga_extract         <-> q165_mp4_demux_decode
    q031_http_header_parse  <-> q166_decontaminate
    q032_whitespace_quirks  <-> q167_bloom_dedup_probe
    q033_link_hygiene       <-> q168_countmin_freq
    q036_array_set_funcs    <-> q169_simhash_radius

Single-pass regex alternation (longest-first) over full names AND bare
qNNN doc references; a simultaneous pass makes bidirectional swaps safe
(no chained rewrites). Historical round artifacts (VERDICT/ADVICE/
BENCH_r*/CORRECTNESS_r*/PROGRESS) are deliberately NOT rewritten.
"""

from __future__ import annotations

import re
from pathlib import Path

SWAPS = [
    ("q029_hostname_extract", "q164_jpeg_codec_roundtrip"),
    ("q030_ga_extract", "q165_mp4_demux_decode"),
    ("q031_http_header_parse", "q166_decontaminate"),
    ("q032_whitespace_quirks", "q167_bloom_dedup_probe"),
    ("q033_link_hygiene", "q168_countmin_freq"),
    ("q036_array_set_funcs", "q169_simhash_radius"),
]


def build_mapping() -> dict[str, str]:
    m: dict[str, str] = {}
    for a, b in SWAPS:
        na, sa = a.split("_", 1)
        nb, sb = b.split("_", 1)
        # each suffix keeps its content and takes the other slot's number
        m[a] = f"{nb}_{sa}"
        m[b] = f"{na}_{sb}"
        m[na] = nb  # bare doc references swap too
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
        root / "tools" / "driver_sim.py",
        root / "tools" / "plan_audit.py",
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
            print(f"{p.relative_to(root)}: {n} replacements")
    print(f"total {total}")


if __name__ == "__main__":
    main()
