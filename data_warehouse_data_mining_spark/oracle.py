"""Oracle verification harness — the library form of the external
driver's t2 correctness gate.

Runs every registered query against its DuckDB oracle on the same
parquet tables and compares column names, row counts, and canonicalized
values exactly. Usable programmatically (tests) and as a CLI:

    python -m data_warehouse_data_mining_spark.oracle [sf_dir]
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field
from datetime import date, datetime
from decimal import Decimal

from pyspark.sql import SparkSession

from data_warehouse_data_mining_spark.catalog import TABLE_NAMES
from data_warehouse_data_mining_spark.registry import all_queries


def canon(v):
    """Canonicalize a cell for cross-engine comparison.

    Floats and ints canonicalize to DISTINCT strings (repr(44036.0) !=
    str(44036)): the external driver hashes stringified values, so a
    Spark LONG against a DuckDB DOUBLE must fail here too, not be
    masked by Python's 44036 == 44036.0.

    Decimals likewise canonicalize scale-preserving (str), NOT via
    float: the driver stringifies, so Spark DECIMAL(27,6)
    '1290671.940000' vs DuckDB DOUBLE '1290671.94' must fail here too
    (the r4 rfm_segmentation red row was exactly this class, masked by
    the old Decimal->float collapse)."""
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(0.0 if v == 0.0 else v)  # -0.0 == 0.0
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, list):
        return "[" + ",".join(str(canon(x)) for x in v) + "]"
    return str(v)


def _canon_rows(rows, columns, order):
    idx = [columns.index(c) for c in order]
    out = [tuple(canon(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@dataclass
class SweepResult:
    exact: list[str] = field(default_factory=list)
    rows_only: list[str] = field(default_factory=list)
    failed: dict[str, str] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return not self.failed


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare_query(
    name: str, spark: SparkSession, con, sf_dir: str, sdf=None
) -> str | None:
    """Return None on exact match, else a short mismatch description.

    ``sdf``: optionally a pre-bound DataFrame for this query at
    ``sf_dir`` — the test suite passes the session-shared bound
    registry (conftest.bound_registry_dfs) so the ~5-minute bind pass
    over 400+ builders is paid ONCE, not once per consumer (VERDICT
    r10 #4)."""
    q = all_queries()[name]
    if sdf is None:
        sdf = q.builder(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = con.execute(q.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    if sorted(scols) != sorted(dcols):
        return f"columns differ: spark={scols} duck={dcols}"
    if len(srows) != len(drows):
        return f"row count differs: spark={len(srows)} duck={len(drows)}"
    order = sorted(scols)
    s = _canon_rows(srows, scols, order)
    d = _canon_rows(drows, dcols, order)
    bad = [(x, y) for x, y in zip(s, d) if x != y]
    if bad:
        return f"{len(bad)} row mismatches; first: {bad[0]} (columns={order})"
    return None


def sweep(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> SweepResult:
    """Run all (or the given) queries through the oracle comparison."""
    con = duckdb_connection(sf_dir)
    result = SweepResult()
    queries = all_queries()
    for name in sorted(names or queries):
        q = queries[name]
        if q.oracle is None:
            q.builder(spark, sf_dir).count()  # rows-only: must run
            result.rows_only.append(name)
            continue
        err = compare_query(name, spark, con, sf_dir)
        if err is None:
            result.exact.append(name)
        else:
            result.failed[name] = err
    return result


def main() -> int:
    from data_warehouse_data_mining_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="oracle_sweep")
    result = sweep(spark, sf_dir)
    print(
        f"sweep {sf_dir}: {len(result.exact)} exact, "
        f"{len(result.failed)} failed, {len(result.rows_only)} rows-only"
    )
    for name, err in result.failed.items():
        print(f"  FAIL {name}: {err}")
    return 0 if result.ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
