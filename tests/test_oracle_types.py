"""Type-level oracle lint: the r2 red rows were NOT value bugs — DuckDB
promotes sum(BIGINT) to HUGEINT, the local canonicalizer stringifies it
the same as BIGINT, but the external driver's does not, so the
value-hash diverged while every local check stayed green. The local
parity mirror therefore CANNOT catch this class; binding each oracle
and asserting no unportable output types is the guard that can.
DESCRIBE only binds (no execution), so this covers all oracles in
seconds."""

from __future__ import annotations

import pytest

from data_warehouse_data_mining_spark import oracle, registry

from .conftest import SF_SMALL

# Types whose text rendering is engine/canonicalizer-sensitive. HUGEINT
# is the proven offender; UHUGEINT is its unsigned sibling. (DECIMAL is
# fine — oracles cast through DECIMAL deliberately and back to
# BIGINT/DOUBLE at the output edge, which this test enforces.)
_FORBIDDEN = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def duck():
    con = oracle.duckdb_connection(SF_SMALL)
    yield con
    con.close()


def test_no_hugeint_typed_columns_in_any_oracle(duck):
    bad = {}
    for name, sql in registry.oracle_sqls().items():
        cols = duck.execute(f"DESCRIBE {sql}").fetchall()
        hits = [
            (c[0], c[1])
            for c in cols
            if any(t in c[1].upper() for t in _FORBIDDEN)
        ]
        if hits:
            bad[name] = hits
    assert not bad, (
        "oracles emit driver-canonicalizer-unsafe column types "
        "(wrap the offending sums in CAST(... AS BIGINT)): " + repr(bad)
    )


def test_oracle_output_types_are_portable(duck):
    """Every oracle output column must land in the small portable set
    the driver's comparator canonicalizes identically to Spark —
    anything novel (intervals, nested lists, enums, uuid, blob) needs
    an explicit decision, not an accidental pass-through."""
    allowed_prefixes = (
        "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER",
        "DOUBLE", "FLOAT", "DECIMAL", "VARCHAR", "BOOLEAN", "DATE",
        "TIMESTAMP",
    )
    bad = {}
    for name, sql in registry.oracle_sqls().items():
        cols = duck.execute(f"DESCRIBE {sql}").fetchall()
        hits = [
            (c[0], c[1])
            for c in cols
            if not c[1].upper().startswith(allowed_prefixes)
        ]
        if hits:
            bad[name] = hits
    assert not bad, f"oracle columns outside the portable type set: {bad!r}"
