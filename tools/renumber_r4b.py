"""Second round-4 window swap (same rationale as tools/renumber_r4.py,
which see): the driver's correctness gate certifies the first 50 sorted
names, so six round-4 flagships — connected components, progressive
JPEG, train/test split-leakage audit, PMI collocations, n-gram novelty,
and the box-filter image pyramid — trade slots with six already-thrice-
certified low-information window queries whose operator content remains
covered by in-window siblings and pytest (retention/funnel: the q020-
q024 event/window family; record-range: trivial skip/limit pinned in
pytest; shipmode: the q055/q056 join+agg family; variant: q109 nested
paths stays registered; tfidf: the q010/q015/q037/q044 text family):

    q025_retention_cohorts  <-> q170_connected_components
    q026_funnel_conversion  <-> q173_progressive_jpeg
    q035_record_range_scan  <-> q175_split_leakage
    q038_shipmode_priority  <-> q177_pmi_collocations
    q039_variant_json       <-> q178_ngram_novelty
    q042_tfidf              <-> q180_image_pyramid_resize

Mechanics identical to renumber_r4.py: one simultaneous longest-first
regex pass over full names and bare qNNN doc references; historical
round artifacts are NOT rewritten.
"""

from __future__ import annotations

import re
from pathlib import Path

SWAPS = [
    ("q025_retention_cohorts", "q170_connected_components"),
    ("q026_funnel_conversion", "q173_progressive_jpeg"),
    ("q035_record_range_scan", "q175_split_leakage"),
    ("q038_shipmode_priority", "q177_pmi_collocations"),
    ("q039_variant_json", "q178_ngram_novelty"),
    ("q042_tfidf", "q180_image_pyramid_resize"),
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
