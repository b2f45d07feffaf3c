"""Full-registry oracle verification at arbitrary scale factors.

The driver certifies at sf0.01 only; this tool closes the small-SF
data-luck exposure (memory: q082 once passed sf0.01 and failed sf0.1) by
running EVERY registry query against its DuckDB oracle at the given SF
dirs — the r8 run verified all 187 queries at sf0.001 AND sf0.1
(561 comparisons including the driver's own SF, all hash-match; recorded
in COVERAGE.md).

Usage:
    python tools/multi_sf_check.py [sf_dir ...]      # default: sf0.001 sf0.1
    python tools/multi_sf_check.py --window          # first 50 sorted only

Prints one line per (sf, query) and a final ``MULTI-SF-RESULT: ALL-OK``
(exit 0) or ``MULTI-SF-RESULT: N FAILURES`` (exit 1). Stdout merges with
Spark stage \\r lines — redirect to a file and grep, as with driver_sim.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcraider_spark.oracle import run_oracle  # noqa: E402
from warcraider_spark.registry import all_specs  # noqa: E402
from warcraider_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    window_only = "--window" in sys.argv
    sf_dirs = args or ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]

    spark = get_spark(app_name="multi_sf_check")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    names = sorted(specs)[:50] if window_only else sorted(specs)

    fails = 0
    for sf in sf_dirs:
        tag = os.path.basename(sf.rstrip("/"))
        for q in names:
            try:
                r = run_oracle(spark, specs[q], sf)
                st = "OK" if r.ok else "FAIL"
                print(
                    f"{tag} {q}: {st} {r.spark_rows}/{r.oracle_rows} {r.detail[:100]}",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 — report and keep sweeping
                st = "ERR"
                print(f"{tag} {q}: ERR {type(e).__name__} {str(e)[:200]}", flush=True)
            if st != "OK":
                fails += 1
    print(
        "MULTI-SF-RESULT:", "ALL-OK" if fails == 0 else f"{fails} FAILURES", flush=True
    )
    spark.stop()
    return 0 if fails == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
