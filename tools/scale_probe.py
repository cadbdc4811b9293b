"""Measure actual scale-up of a registered query beyond the bench SF.

Stages an N-fold key-shifted replication of the sf0.1 fact tables
(lineitem/orders share an orderkey shift so join selectivity is
preserved; events shifts user_id+event_id so per-user density — and
therefore interval-join fanout — stays constant; documents get a
per-replica seeded alphabet+digit permutation and embeddings a
per-replica seeded rotation, so replicated text/vector workloads keep
their intra-replica structure exactly while cross-replica near-dup /
near-neighbor artifacts are scrambled away) into a temp sf dir,
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
                    # Per-replica seeded alphabet PERMUTATION (r12;
                    # replaces the old per-token "x{r}" suffix): every
                    # replica's text goes through its own letter
                    # substitution, so BOTH the word-shingle space and
                    # the character-q-gram space are disjoint across
                    # replicas while lengths, word boundaries, token/
                    # gram DIVERSITY, and duplicate density stay exactly
                    # what they were at 1x. The suffix achieved word
                    # disjointness but collapsed per-replica char-gram
                    # diversity (every token ended in the same 2 chars:
                    # 978 -> 192 distinct 4-grams), handing char-level
                    # operators a manufactured worst case — measuring
                    # text degeneracy, not scan scale-up.
                    import random

                    alpha = "abcdefghijklmnopqrstuvwxyz"
                    perm = list(alpha)
                    random.Random(1000 + r).shuffle(perm)
                    perm = "".join(perm)
                    # digits get their own seeded permutation (ADVICE
                    # r13): letters-only remapping left numeric tokens
                    # and their char q-grams colliding across replicas,
                    # re-introducing cross-replica candidate pairs on
                    # numeric-heavy text
                    digits = "0123456789"
                    dperm = list(digits)
                    random.Random(2000 + r).shuffle(dperm)
                    dperm = "".join(dperm)
                    rep = rep.withColumn(
                        "text",
                        F.translate(
                            F.col("text"),
                            alpha + alpha.upper() + digits,
                            perm + perm.upper() + dperm,
                        ),
                    )
                if name == "embeddings" and r > 0:
                    # Per-replica seeded ROTATION (r13, the vector-space
                    # analog of the text alphabet permutation): vec_id
                    # shifting alone leaves the VECTORS identical across
                    # replicas, so every vector gains (replicas-1) exact
                    # clones and any distance/cosine-threshold self-join's
                    # true pair set grows quadratically in replicas — the
                    # probe would measure that staging artifact, not scan
                    # scale-up. An orthogonal transform preserves every
                    # intra-replica L2 distance and cosine EXACTLY (the
                    # 1x workload is replicated verbatim, just re-oriented)
                    # while cross-replica geometry becomes pseudo-random.
                    import numpy as np
                    import pandas as pd

                    g = np.random.RandomState(3000 + r).randn(64, 64)
                    q_rot, rr = np.linalg.qr(g)
                    # fix the QR sign ambiguity so the rotation is a
                    # deterministic function of the seed
                    rot = (q_rot * np.sign(np.diag(rr))).astype(np.float64)

                    def _rotate(batches, _rot=rot):
                        for pdf in batches:
                            m = np.array(list(pdf["embedding"]), dtype=np.float64)
                            out = m @ _rot.T
                            pdf["embedding"] = pd.Series(
                                [row.astype(np.float32) for row in out],
                                index=pdf.index,
                            )
                            yield pdf

                    rep = rep.mapInPandas(_rotate, schema=rep.schema)
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
