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
# is the proven offender (r2); DECIMAL is the second proven offender
# (r4: rfm_segmentation — Spark DECIMAL(27,6) stringifies
# '1290671.940000' vs DuckDB DOUBLE '1290671.94'). Oracles may cast
# THROUGH decimal internally, but the output edge must be
# BIGINT/DOUBLE/etc.
_FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


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
        "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE",
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


def test_canon_distinguishes_decimal_from_double():
    """The harness blind spot that let r4's red row pass locally for
    two rounds: canon() collapsed Decimal->float, so Spark
    DECIMAL(27,6) vs DuckDB DOUBLE hashed identically here while the
    external driver (which stringifies) flagged them. canon() must
    preserve decimal scale so the divergence fails LOCALLY."""
    from decimal import Decimal

    from data_warehouse_data_mining_spark.oracle import canon

    assert canon(Decimal("1290671.940000")) != canon(1290671.94)
    assert canon(Decimal("1290671.94")) == "1290671.94"
    # same-scale decimal on both sides still agrees
    assert canon(Decimal("3.471")) == canon(3.471)


@pytest.fixture(scope="module")
def spark_query_schemas(bound_registry_dfs):
    """Schemas off the session-shared bound-DataFrame cache (r10: the
    binding pass is now paid ONCE per session across test files — see
    conftest.bound_registry_dfs). Values are either a bound StructType
    or an error string."""
    out = {}
    for name, df in bound_registry_dfs.items():
        out[name] = df if isinstance(df, str) else df.schema
    return out


def test_no_decimal_typed_columns_in_any_spark_query(spark_query_schemas):
    """Spark-side twin of the DuckDB DESCRIBE lint: bind every
    registered query's builder at sf0.001 and assert no DecimalType
    output column (the r4 rfm_segmentation class — a bare SQL literal
    like `/ 100.0` inside F.expr silently makes the column
    DECIMAL(27,6))."""
    from pyspark.sql.types import DecimalType

    bad = {}
    for name, schema in spark_query_schemas.items():
        if isinstance(schema, str):
            bad[name] = schema
            continue
        hits = [
            (f.name, f.dataType.simpleString())
            for f in schema.fields
            if isinstance(f.dataType, DecimalType)
        ]
        if hits:
            bad[name] = hits
    assert not bad, (
        "Spark query outputs contain DECIMAL columns (append "
        ".cast('double') / .cast('long') at the output edge): "
        + repr(bad)
    )


def test_no_container_typed_columns_in_any_spark_query(spark_query_schemas):
    """r7's only red row: `inverted_index_postings` emitted a raw
    ARRAY<BIGINT> column. The external driver canonicalizes via pandas
    sort_values, which raises `unhashable type: 'list'` on container
    cells — but OUR canon stringifies lists, so the query was green
    locally and red externally. Registered outputs must be scalar-only;
    arrays become `array_join`ed strings, structs/maps become digests.
    tools/driver_sweep.py enforces the same rule at run time."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "driver_sweep",
        os.path.join(os.path.dirname(__file__), "..", "tools", "driver_sweep.py"),
    )
    sweep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep)

    bad = {}
    for name, schema in spark_query_schemas.items():
        if isinstance(schema, str):
            bad[name] = schema
            continue
        hits = sweep.nonscalar_columns(schema)
        if hits:
            bad[name] = hits
    assert not bad, (
        "Spark query outputs contain container columns that crash the "
        "external pandas canonicalizer (array_join / digest them at "
        "the output edge): " + repr(bad)
    )
