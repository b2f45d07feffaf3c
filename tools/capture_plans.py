"""Capture .explain('formatted') for bench-tagged queries into plans/$PLANS_ROUND/ (default r15).

Usage: python tools/capture_plans.py before|after [query-suffix ...]
With no suffixes, captures every bench-tagged query."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcraider_spark.registry import all_specs
from warcraider_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    wanted = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {n: s for n, s in all_specs().items() if s.bench}
    for name in sorted(specs):
        suffix = name.split("_", 1)[1]
        if wanted and suffix not in wanted and name not in wanted:
            continue
        df = specs[name].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{suffix}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
