"""Simulate the driver: import __spark_entry__ fresh, smoke entry(), run
every queries()[name] at sf0.01 vs oracle_sql()[name] through DuckDB."""
import hashlib, math, os, sys, time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E

import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# --- smoke: entry() ---
t0 = time.time()
df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}, {time.time()-t0:.1f}s")
assert len(rows) > 0

# --- correctness: queries() vs oracle_sql() ---
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(v):
    if v is None: return "null"
    if isinstance(v, bool): return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)): return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict): return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)

def rhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]

qs, osql = E.queries(), E.oracle_sql()
print(f"{len(qs)} queries, {len(osql)} with oracle")
fails = []
for name in sorted(qs):
    t0 = time.time()
    sdf = qs[name](spark, SF)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    el = time.time() - t0
    if name not in osql:
        print(f"  {name}: rows-only, {len(srows)} rows, {el:.1f}s")
        continue
    cur = con.execute(osql[name])
    ocols = [d[0] for d in cur.description]
    orows = [tuple(r) for r in cur.fetchall()]
    ok_schema = sorted(scols) == sorted(ocols)
    ok_count = len(srows) == len(orows)
    ok_hash = ok_schema and ok_count and rhash(scols, srows) == rhash(ocols, orows)
    status = "OK" if (ok_schema and ok_count and ok_hash) else "FAIL"
    if status == "FAIL":
        fails.append(name)
    print(f"  {name}: {status} schema={ok_schema} count={ok_count}({len(srows)}/{len(orows)}) hash={ok_hash} {el:.1f}s")

print("RESULT:", "ALL-OK" if not fails else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)
