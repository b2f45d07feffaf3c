"""Round-10 wave B: free window slots q009/q010/q011 for the three NEW
curation operators (domain mixture water-filling, DSIR importance
selection, per-domain quality percentile selection) by moving the three
r7-certified residents to fresh backlog numbers q188-q190. Their r7
certifications travel with their rename-stable suffixes; post-r10 the
ledger still has nothing older than r7 and never-certified count 0 (the
new operators certify with this round's window).

Same mechanics as renumber_r10.py, but one-directional renames (the
target numbers are brand new), so the mapping carries no bare-number
swaps — qNNN tokens for 059/060/061 would be ambiguous mid-wave and no
doc references the bare numbers alone.
"""

from __future__ import annotations

import re
from pathlib import Path

RENAMES = {
    "q009_date_family2": "q188_date_family2",
    "q010_posexplode": "q189_posexplode",
    "q011_to_json": "q190_to_json",
    # wave B2: one more slot for the water-fill's consumer operator
    "q008_null_semantics": "q191_null_semantics",
}


def main() -> None:
    root = Path(__file__).resolve().parent.parent
    pat = re.compile(
        r"\b(" + "|".join(re.escape(k) for k in sorted(RENAMES, key=len, reverse=True)) + r")\b"
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
        out, n = pat.subn(lambda mo: RENAMES[mo.group(1)], src)
        if n:
            p.write_text(out)
            total += n
            print(f"{p}: {n} replacements")
    print(f"total {total}")


if __name__ == "__main__":
    main()
