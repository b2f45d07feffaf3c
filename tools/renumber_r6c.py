"""Third round-6 window swap (mechanics identical to tools/renumber_r6.py,
which see): five more never-driver-certified flagships trade slots with
five 4×-certified window queries whose families keep in-window anchors —
continuing the r5 verdict's top directive of shrinking the
never-certified backlog:

    q005_ngram_jaccard_pairs <-> q128_triangle_count
        (banded-candidate dedup: q003 MinHash + q036 SimHash radius +
         q044 CDC stay in-window; graph gets its third hard row)
    q006_embedding_neardup   <-> q122_entity_resolution
        (embedding family: q011 brute / q014 IVF-assign / q016 IVF-topk
         stay; q-gram blocking + edit-distance verify gets a hard row)
    q008_document_chunking   <-> q147_heavy_hitters
        (chunking: q044 CDC + q050's late-materialization stay; exact
         heavy hitters is a §10-curved bench query with no hard row)
    q009_embedding_quantize  <-> q120_recursive_reachability
        (quantization content rides q016/q050's int8 path; Spark 4
         recursive CTE gets a hard row)
    q043_dedup_clusters      <-> q142_merge_upsert
        (cluster content: q025 connected components IS the general form,
         in-window; MERGE upsert is the curation front door)

One simultaneous longest-first regex pass over full names and bare qNNN
doc references; historical round artifacts are NOT rewritten.
"""

from __future__ import annotations

import re
from pathlib import Path

SWAPS = [
    ("q005_ngram_jaccard_pairs", "q128_triangle_count"),
    ("q006_embedding_neardup", "q122_entity_resolution"),
    ("q008_document_chunking", "q147_heavy_hitters"),
    ("q009_embedding_quantize", "q120_recursive_reachability"),
    ("q043_dedup_clusters", "q142_merge_upsert"),
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
