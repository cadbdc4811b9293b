"""Measure actual scale-up of a registered query beyond the bench SF.

Stages an N-fold key-shifted replication of the sf0.1 fact tables
(lineitem/orders share an orderkey shift so join selectivity is
preserved; events shifts user_id+event_id so per-user density — and
therefore interval-join fanout — stays constant) into a temp sf dir,
dimensions copied unchanged, then times the query at 1x vs Nx
(median of 3 runs each, count() as the action).

Usage: python tools/scale_probe.py <query_name> [replicas=8]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import TABLE_NAMES
from data_warehouse_data_mining_spark.registry import all_queries
from data_warehouse_data_mining_spark.session import get_session

BASE = "/root/testdata/sf0.1"
KEY_SHIFTS = {
    # table -> columns shifted per replica (r * OFFSET added)
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
OFFSET = 100_000_000


def stage(spark, replicas: int) -> str:
    out = f"/tmp/scale_probe_x{replicas}"
    if os.path.exists(os.path.join(out, "_STAGED")):
        return out
    os.makedirs(out, exist_ok=True)
    for name in TABLE_NAMES:
        src = spark.read.parquet(f"{BASE}/{name}.parquet")
        if name in KEY_SHIFTS:
            parts = []
            for r in range(replicas):
                rep = src
                for col in KEY_SHIFTS[name]:
                    rep = rep.withColumn(col, F.col(col) + F.lit(r * OFFSET))
                if name == "documents" and r > 0:
                    # suffix every token per replica so shingle spaces are
                    # DISJOINT across replicas: duplicate density per
                    # replica stays what it was at 1x (otherwise each doc
                    # gains r near-identical clones and candidate pairs
                    # grow r^2, measuring pair blow-up instead of scan
                    # scale-up)
                    rep = rep.withColumn(
                        "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1x{r}")
                    )
                parts.append(rep)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        else:
            df = src
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    open(os.path.join(out, "_STAGED"), "w").write("ok")
    return out


def median_time(fn, runs: int = 3) -> float:
    ts = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    return statistics.median(ts)


def main() -> int:
    names = sys.argv[1].split(",")
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_session(app_name=f"scale_probe_{names[0]}")
    qs = all_queries()
    scaled_dir = stage(spark, replicas)
    base_rows = spark.read.parquet(f"{BASE}/lineitem.parquet").count()
    for name in names:
        try:
            q = qs[name]
            t1 = median_time(lambda: q.builder(spark, BASE).count())
            tn = median_time(lambda: q.builder(spark, scaled_dir).count())
        except Exception as exc:  # noqa: BLE001 — a probe OOM/failure is a finding
            print(f"{name}: PROBE FAILED at {replicas}x — {type(exc).__name__}: {exc}", flush=True)
            continue
        print(
            f"{name}: sf0.1 ({base_rows} lineitem rows) {t1:.2f}s | "
            f"{replicas}x {tn:.2f}s | time ratio {tn / t1:.2f}x for {replicas}x data",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
