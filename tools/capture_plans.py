"""Capture `.explain("formatted")` output for named queries into
plans/<round>/<name>_<tag>.txt — the before/after plan evidence an
optimization round commits alongside its bench numbers.

Usage: python tools/capture_plans.py <round_dir> <tag> [name1,name2,...]
  round_dir  e.g. r13 (written under plans/<round_dir>/)
  tag        e.g. before | after
  names      comma list; default = the headline (bench) queries

The plan captured is the STATIC formatted plan (exactly what
`df.explain("formatted")` prints) — compile-time shape: Exchange
placement, join strategy, PushedFilters/ReadSchema, codegen spans,
Python-eval nodes. AQE-final shapes are asserted separately in
tests/test_plans.py via plans.explain.final_plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_data_mining_spark.plans.explain import formatted_plan
from data_warehouse_data_mining_spark.registry import all_queries, headline_queries
from data_warehouse_data_mining_spark.session import get_session

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    round_dir, tag = sys.argv[1], sys.argv[2]
    if len(sys.argv) > 3:
        names = sys.argv[3].split(",")
        reg = all_queries()
        qs = {n: reg[n] for n in names}
    else:
        qs = headline_queries()
    out_dir = os.path.join(REPO, "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, q in qs.items():
        df = q.builder(spark, SF)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
