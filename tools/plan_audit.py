"""Generate SCALING.md: a physical-plan audit of every registered query.

For each query (at sf0.01, executed so AQE's FINAL plan is inspected)
we extract the scale-relevant plan facts: number of parquet scans,
shuffle exchanges, broadcast joins/exchanges, sort-merge joins,
whether filters were pushed to the scan, and how many operators run
inside whole-stage codegen. ML queries are skipped (MLlib-internal
plans).

Usage: python tools/plan_audit.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_data_mining_spark.plans.explain import formatted_plan
from data_warehouse_data_mining_spark.registry import all_queries
from data_warehouse_data_mining_spark.session import get_session

SF = "/root/testdata/sf0.01"
SKIP_PREFIXES = ("ml_",)
SKIP = {"smote_rebalance_counts", "ann_lsh_mllib", "class_weights_profile"}

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TABLE_HEADER = "| query | scans | xchg | bcast | smj | push | wsc |"


def prose_header() -> str:
    """Everything above the generated plan table in the CURRENT
    SCALING.md is hand-maintained prose (probe results, pinning rules,
    measured scale-ups). Preserve it verbatim on regeneration so
    re-running the audit never wipes round-over-round evidence."""
    text = open(os.path.join(_REPO, "SCALING.md")).read()
    cut = text.find(_TABLE_HEADER)
    if cut == -1:
        return text.rstrip() + "\n"
    return text[:cut].rstrip() + "\n"



def audit(name: str, q, spark) -> dict:
    df = q.builder(spark, SF)
    df.collect()
    plan = formatted_plan(df)
    return {
        "name": name,
        # unique scan operators (details section lists each node once)
        "scans": len(set(re.findall(r"^\((\d+)\) Scan parquet", plan, re.MULTILINE))),
        "exchanges": len(re.findall(r"\bExchange\b", plan.split("== Initial Plan ==")[0])),
        "broadcasts": len(
            re.findall(r"BroadcastExchange|BroadcastHashJoin|BroadcastNestedLoopJoin",
                       plan.split("== Initial Plan ==")[0])
        ),
        "smj": len(re.findall(r"SortMergeJoin", plan.split("== Initial Plan ==")[0])),
        "pushed": "yes" if ("PushedFilters: [" in plan and
                            re.search(r"PushedFilters: \[[^\]]", plan)) else "—",
        "codegen": len(re.findall(r"^\s*(?:[+:]-\s*)?\* \w", plan, flags=re.MULTILINE)),
    }


def main() -> None:
    spark = get_session(app_name="plan_audit", master="local[16]",
                        shuffle_partitions=16, driver_memory="12g")
    rows = []
    for name, q in sorted(all_queries().items()):
        if name.startswith(SKIP_PREFIXES) or name in SKIP:
            continue
        try:
            rows.append(audit(name, q, spark))
        except Exception as e:  # pragma: no cover
            rows.append({"name": name, "error": str(e).splitlines()[0][:80]})

    lines = [prose_header()]
    lines.append(_TABLE_HEADER)
    lines.append("|---|---|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            lines.append(f"| {r['name']} | ERROR: {r['error']} | | | | | |")
            continue
        lines.append(
            f"| {r['name']} | {r['scans']} | {r['exchanges']} | {r['broadcasts']} | "
            f"{r['smj']} | {r['pushed']} | {r['codegen']} |"
        )
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"audited {len(rows)} queries -> SCALING.md")
    spark.stop()


if __name__ == "__main__":
    main()
