"""r14 targeted oracle check: run the named registry queries at the given
SFs against their DuckDB oracles (same canon/hash as driver_sim) and time
each Spark side with the noop sink first.

Usage: python tools/r14_check.py q069_winnowing_dup_pairs [...names] [--sf sf0.001,sf0.01]
"""
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from warcraider_spark.registry import all_specs
from warcraider_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "null"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def rhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfs = ["sf0.001", "sf0.01"]
    for a in sys.argv[1:]:
        if a.startswith("--sf"):
            sfs = a.split("=", 1)[1].split(",") if "=" in a else sfs
    spark = get_spark(app_name="r14_check")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        for name in args:
            s = specs[name]
            t0 = time.time()
            df = s.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t_noop = time.time() - t0
            df = s.builder(spark, sf_dir)
            srows = [tuple(r) for r in df.collect()]
            sh = rhash(df.columns, srows)
            if s.oracle is None:
                print(f"{sf} {name}: rows-only {len(srows)} rows noop={t_noop:.2f}s")
                continue
            cur = con.execute(s.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            oh = rhash(ocols, orows)
            ok = sh == oh and len(srows) == len(orows)
            bad += 0 if ok else 1
            print(
                f"{sf} {name}: {'OK' if ok else 'MISMATCH'} rows={len(srows)}/{len(orows)} "
                f"hash={sh}/{oh} noop={t_noop:.2f}s"
            )
    print("RESULT:", "ALL-OK" if bad == 0 else f"{bad} FAIL")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
