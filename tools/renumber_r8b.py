"""Round-8 follow-up window swap: the two operators ADDED this round
after the main rotation (q185_gopher_rules, q186_containment_dedup)
trade into the driver window so they earn hard rows in the same round
they were written — avoiding a q159/q171-style "shipped code never held
a driver row" staleness gap. The evicted slots are the two
lowest-marginal-value r1-stale refreshes in the window: the pure scalar
families datepart_funcs / math_funcs (deterministic expression-only
queries, locally green in every full-registry driver_sim since r1).

After this swap the never-certified count is 0; r1-stale leftovers go
9 -> 11 (still within the <=12 target; queued for r9 with the
r3-extraction tail).

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
    ("q017_datepart_funcs", "q185_gopher_rules"),
    ("q018_math_funcs", "q186_containment_dedup"),
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
