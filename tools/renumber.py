"""Window-rotation renumbering — ONE parameterized tool (VERDICT r11 #8).

Replaces the per-round renumber_r*.py copies (r2–r11), whose drift was a
risk to the suffix-stability rules the cross-round certification ledger
depends on. Usage:

    python tools/renumber.py tools/renumber_maps/r12.json [--dry-run]

The mapping file is the per-round documentation AND the executable input:

    {
      "round": "r12",
      "note": "why this slate (verdict directive, freshness state)",
      "mode": "swap",                  # or "rename" (one-way, r2-style)
      "pairs": [["q001_suffix_a", "q075_suffix_b"], ...]
    }

Semantics (identical to the proven renumber_r4..r11 mechanics):

- mode "swap": each pair exchanges NUMBERS while keeping suffixes —
  q001_suffix_a ↔ becomes q075_suffix_a, q075_suffix_b → q001_suffix_b —
  and the bare numbers (q001/q075) swap wherever they appear alone in
  docs. Suffixes never change, so the ledger's rename-stable suffix keys
  stay valid across rounds.
- mode "rename": each [new_full_name, old_full_name] pair is a one-way
  rename (full names and bare numbers), used only by the historical r2
  restructure.

One simultaneous longest-first regex pass over full names and bare qNNN
references across code + docs, so chained rewrites cannot occur.
Historical round artifacts (CORRECTNESS_r*.json, BENCH_r*.json,
VERDICT/ADVICE) are never rewritten. After running: regenerate the
COVERAGE.md ledger (tools/coverage_ledger.py), then PLAN_AUDIT.md LAST,
then pytest + driver_sim.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# Files the query names appear in. Directories are rglobbed for *.py.
TARGET_DIRS = ("warcraider_spark", "tests")
TARGET_FILES = (
    "bench.py",
    "__spark_entry__.py",
    "COVERAGE.md",
    "SCALE.md",
    "PLAN_AUDIT.md",
    "FIXTURES.md",
    "tools/scale_bench.py",
    "tools/plan_audit.py",
    "tools/coverage_ledger.py",
    "tools/multi_sf_check.py",
    "tools/driver_sim.py",
    "tools/bench_bands.json",
)


def build_mapping(
    mode: str, pairs: list[list[str]], bare_numbers: bool = True
) -> dict[str, str]:
    m: dict[str, str] = {}
    for a, b in pairs:
        na, sa = a.split("_", 1)
        nb, sb = b.split("_", 1)
        if mode == "swap":
            m[a] = f"{nb}_{sa}"
            m[b] = f"{na}_{sb}"
            if bare_numbers:
                m[na] = nb
                m[nb] = na
        elif mode == "rename":
            # one-way: pair is [new_full_name, old_full_name].
            # bare_numbers=false (r10b-style) skips bare qNNN rewrites —
            # needed when targets are brand-new numbers and bare tokens
            # would be ambiguous mid-wave.
            m[b] = a
            if bare_numbers:
                m[nb] = na
        else:
            raise SystemExit(f"unknown mode {mode!r}")
    return m


def run(map_path: Path, dry_run: bool = False) -> int:
    spec = json.loads(map_path.read_text())
    mapping = build_mapping(
        spec.get("mode", "swap"), spec["pairs"], spec.get("bare_numbers", True)
    )
    pat = re.compile(
        r"\b("
        + "|".join(re.escape(k) for k in sorted(mapping, key=len, reverse=True))
        + r")\b"
    )
    targets: list[Path] = []
    for d in TARGET_DIRS:
        targets += sorted((ROOT / d).rglob("*.py"))
    for f in TARGET_FILES:
        targets.append(Path(f) if f.startswith("/") else ROOT / f)
    total = 0
    for p in targets:
        if not p.exists():
            continue
        src = p.read_text()
        out, n = pat.subn(lambda mo: mapping[mo.group(1)], src)
        if n:
            if not dry_run:
                p.write_text(out)
            total += n
            print(f"{p}: {n} replacements")
    print(f"total {total}{' (dry run)' if dry_run else ''}")
    return total


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--dry-run"]
    if len(args) != 1:
        raise SystemExit(__doc__.split("\n\n")[1])
    run(Path(args[0]), dry_run="--dry-run" in sys.argv)
