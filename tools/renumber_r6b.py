"""Second round-6 window swap (mechanics identical to tools/renumber_r6.py,
which see): the two NEW r6 flagships — CDC chunk dedup and CDC-based
boilerplate excision — trade slots with two multiply-certified window
queries whose operator content keeps in-window anchors, so the round's
own centerpiece operators get hard driver rows this round instead of
waiting out a rotation cycle (the r5 verdict's core complaint):

    q044_sequence_packing <-> q182_cdc_chunk_dedup
        (text family: q010 PII / q037 BPE / q041 RAKE stay in-window;
         packing stays local-green + pytest edge cases)
    q049_duplicate_spans  <-> q183_cdc_excision
        (span-dedup content: the CDC excision IS the modern span pass;
         gram-span discovery q049 and excision q131 stay local-green)

One simultaneous longest-first regex pass over full names and bare qNNN
doc references; historical round artifacts are NOT rewritten.
"""

from __future__ import annotations

import re
from pathlib import Path

SWAPS = [
    ("q044_sequence_packing", "q182_cdc_chunk_dedup"),
    ("q049_duplicate_spans", "q183_cdc_excision"),
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
        root / "README.md",
        root / "tools" / "scale_bench.py",
        root / "tools" / "plan_audit.py",
        root / "tools" / "coverage_ledger.py",
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
