"""Driver-style correctness gate, run locally: every query in the
catalog executes on Spark AND its DuckDB oracle on the same sf0.01
parquet, and results must match exactly (row count, column names,
order-insensitive values). This is a strict superset of the driver's
hash compare — floats are compared bit-exactly because the whole
catalog is built on engine-portable arithmetic.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF01_DIR

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF01_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "quantize"):  # Decimal
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _sort_key(row):
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def _spark_rows(df, cols):
    return sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()),
        key=_sort_key,
    )


def _duck_rows(con, sql, cols):
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in cols]
    return sorted(
        (tuple(_norm(row[i]) for i in idx) for row in res.fetchall()),
        key=_sort_key,
    )


QUERY_NAMES = sorted(entrymod.queries().keys())


# The driver's value hash is type-tagged, so a DuckDB HUGEINT (e.g. bare
# sum() over BIGINT) hash-mismatches a Spark BIGINT even when values are
# equal. Enforce dtype equivalence locally for scalar types; container /
# decimal types fall back to the value compare only.
_DUCK_EQUIV = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "binary": {"BLOB"},
}


def _assert_dtype_parity(name, df, duck, sql):
    duck_types = {
        r[0]: r[1]
        for r in duck.execute(f"DESCRIBE {sql}").fetchall()
    }
    spark_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    bad = []
    for col, stype in spark_types.items():
        allowed = _DUCK_EQUIV.get(stype)
        if allowed is None:
            continue  # array/struct/map/decimal: value compare covers it
        if duck_types.get(col) not in allowed:
            bad.append((col, stype, duck_types.get(col)))
    assert not bad, (
        f"{name}: oracle dtype drift (col, spark, duck): {bad} — "
        f"cast the oracle expression (driver hash is type-tagged)"
    )


# sketch-based aggregates have no cross-engine bit-exact oracle by
# nature; they get tolerance tests instead (test_approx_tolerance.py)
NO_ORACLE_ALLOWED = {"approx_distinct_stats"}


def _assert_atomic_schema(name, df):
    """The driver canonicalizes results with pandas sort_values, which
    raises TypeError on list/dict cells — so a query emitting an
    array/map/struct column can NEVER be graded (pq_codes, r05's one
    red row). Every catalog output column must be an atomic type;
    flatten containers with array_join or per-slot columns."""
    from pyspark.sql import types as T

    bad = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name}: non-atomic output columns {bad} — the driver "
        f"canonicalizer crashes on container cells; flatten them"
    )


def test_parity_covers_full_catalog():
    """The driver window rotation (queries/__init__._ROTATED_OUT) is
    only legitimate while every rotated-out query keeps an enforced
    bit-exact gate HERE: this suite parametrizes over the whole
    catalog, and this test pins that the rotation lists cannot drift
    outside it."""
    from pyspark_data_processing_challenge_spark import queries as qmod

    names = set(entrymod.queries().keys())
    assert set(QUERY_NAMES) == names
    assert set(qmod._ROTATED_OUT) <= names
    assert set(qmod._VERDICT_PRIORITY) <= names
    # the graded window must lead with every query lacking a verdict
    assert len(qmod._VERDICT_PRIORITY) == 50


def test_every_query_has_oracle():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o.keys()) <= set(q.keys())
    missing = set(q.keys()) - set(o.keys())
    assert missing <= NO_ORACLE_ALLOWED, f"queries without oracle: {missing}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    qfn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        if name in NO_ORACLE_ALLOWED:
            pytest.skip(f"{name}: sketch-based, tolerance-tested instead")
        raise AssertionError(f"{name} has no oracle")
    df = qfn(spark, SF01_DIR)
    _assert_atomic_schema(name, df)
    cols = sorted(df.columns)
    duck_names = [d[0] for d in duck.execute(sql).description]
    assert sorted(duck_names) == cols, (
        f"{name}: column mismatch spark={cols} duck={sorted(duck_names)}"
    )
    _assert_dtype_parity(name, df, duck, sql)
    s_rows = _spark_rows(df, cols)
    d_rows = _duck_rows(duck, sql, cols)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(NO_ORACLE_ALLOWED))
def test_no_oracle_queries_atomic_schema(spark, name):
    """Queries exempt from the oracle gate still face the driver's
    rows-only canonicalizer — same atomic-schema requirement."""
    df = entrymod.queries()[name](spark, SF01_DIR)
    _assert_atomic_schema(name, df)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
