"""Local replica of the driver's correctness gate: every catalog query runs
on Spark AND its oracle SQL runs on DuckDB over the same parquet tables;
row count, sorted column names, and order-insensitive values must match
exactly (the driver hashes values — exact match is the bar, which is why
order-dependent float aggregates are rounded inside the queries)."""

from __future__ import annotations

import math

import duckdb
import pytest

from helium_arango_etl_lite_spark.plans.queries import QUERIES
from helium_arango_etl_lite_spark.plans.registry import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows, columns):
    """Sort columns by name (driver behavior), render values canonically."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def render(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(v)
        if isinstance(v, bool):
            return str(bool(v))
        if v is None:
            return "NULL"
        return str(v)

    return sorted(tuple(render(r[i]) for i in order) for r in rows)


ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.spark_fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_con(sf_dir)
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = normalize(spark_rows, spark_cols), normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


def test_every_query_runs_at_all(spark, sf_dir):
    for name, spec in QUERIES.items():
        df = spec.spark_fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_outputs_are_scalar_only(spark, sf_dir):
    """The driver's pandas canonicalisation crashes on array/map/struct
    output columns (unhashable in sort_values) and the crash aborts every
    query registered after the offender — the round-2 failure class. Pin
    the whole catalog to scalar output columns."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, spec in QUERIES.items():
        df = spec.spark_fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, f"non-scalar output columns: {offenders}"
