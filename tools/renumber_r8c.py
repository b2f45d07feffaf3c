"""Round-8 window swap #3: the Gopher repetition-signal suite written
this session (q187_gopher_repetition) trades into the driver window so it
is certified in the round it ships, evicting the r1-stale scalar family
q016_date_funcs — whose date-function surface is re-covered by the
r7-hash-certified date_family2 query. Never-certified stays 0; r1-stale
leftovers go 11 -> 12 (exactly the <=12 target).

Mechanics identical to renumber_r8.py (proven 8x); historical round
artifacts are NOT rewritten. After running: regenerate the COVERAGE.md
ledger, then PLAN_AUDIT.md LAST, then pytest + driver_sim.
"""

from __future__ import annotations

import re
from pathlib import Path

SWAPS = [
    ("q016_date_funcs", "q187_gopher_repetition"),
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
