"""functions/detln.py: the shared deterministic-ln pipeline must be
(a) bit-identical between Spark and DuckDB — that is its entire reason
to exist (ADVICE r10: libm vs Math.log ulp divergence near the .5
fixed-point boundary) — and (b) numerically a real ln (agrees with
Python's math.log to well under a micro-unit)."""

import math

import duckdb
import pytest

from helium_arango_etl_lite_spark.functions.detln import (
    ln_u6_select_items,
    ln_u6_stages,
    with_ln_u6,
)

# dense small ranks/counts (the actual domain: top-K ranks, grouped
# frequencies) + sparse huge values up to ~2^62 to cover every CASE arm
XS = (
    list(range(1, 5001))
    + [(1 << k) - 1 for k in range(2, 63)]
    + [1 << k for k in range(1, 63)]
    + [(1 << k) + 1 for k in range(1, 62)]
    + [(x * 9973) * 479001599 + x for x in range(1, 500)]
)


def test_spark_duckdb_bit_identical(spark):
    df = spark.createDataFrame([(x,) for x in XS], "x long")
    sp = {r["x"]: r["y6"] for r in with_ln_u6(df, "x", "y6").collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE xs AS SELECT unnest(?) AS x", [XS])
    du = dict(
        con.execute(
            "SELECT x, y6 FROM (SELECT x, "
            + ln_u6_select_items("x", "y6")
            + " FROM xs) t"
        ).fetchall()
    )
    diff = [x for x in XS if sp[x] != du[x]]
    assert not diff, f"cross-engine divergence at {diff[:5]}"


def test_matches_python_log(spark):
    # floor-equality with math.log can in principle differ by 1 at a
    # boundary value (math.log is itself not correctly rounded); require
    # the double to be within 1e-9 of math.log and the floors to agree
    # everywhere on this domain (empirically they do).
    con = duckdb.connect()
    con.execute("CREATE TABLE xs AS SELECT unnest(?) AS x", [XS])
    rows = con.execute(
        "SELECT x, y6 FROM (SELECT x, "
        + ln_u6_select_items("x", "y6")
        + " FROM xs) t"
    ).fetchall()
    for x, y6 in rows:
        assert y6 == math.floor(math.log(x) * 1e6 + 0.5), x
        assert abs(y6 / 1e6 - math.log(x)) <= 0.5e-6 + 1e-9


def test_stage_names_and_final(spark):
    stages = ln_u6_stages("f", "y6")
    assert stages[-1][0] == "y6"
    assert all(n.startswith("__y6_") for n, _ in stages[:-1])
    # literals must be DOUBLE-typed (exponent form), never bare decimals
    # that would parse as DECIMAL and change the arithmetic
    for _, expr in stages:
        for frag in expr.replace("(", " ").replace(")", " ").split():
            if frag.replace(".", "").replace("-", "").isdigit() and "." in frag:
                pytest.fail(f"bare decimal literal {frag!r} in {expr[:60]}")


def _py_ln_u6(x: int) -> int:
    """Pure-Python replication of the generated pipeline — Python floats
    are IEEE binary64 with correctly-rounded + - * /, so this is a THIRD
    independent evaluation of the same expression tree; it must agree
    bit-for-bit with DuckDB (and with Spark via the cross-engine test)."""
    k = x.bit_length() - 1
    kln2 = float(k) * math.log(2.0) if k > 0 else 0.0
    # NB: the generated CASE stores k*log(2) as a literal computed
    # exactly this way (float(k) * math.log(2.0) IS k * math.log(2.0))
    p2 = float(1 << k) if k > 0 else 1.0
    m = float(x) / p2
    z = (m - 1.0) / (m + 1.0)
    u = z * z
    poly = 1.0 / 33.0
    for j in range(15, -1, -1):
        poly = poly * u + 1.0 / (2 * j + 1)
    lnx = kln2 + (2.0 * z) * poly
    return math.floor(lnx * 1000000.0 + 0.5)


def test_python_replica_matches_duckdb_on_fixed_domain():
    con = duckdb.connect()
    con.execute("CREATE TABLE xs AS SELECT unnest(?) AS x", [XS])
    rows = con.execute(
        "SELECT x, y6 FROM (SELECT x, "
        + ln_u6_select_items("x", "y6")
        + " FROM xs) t"
    ).fetchall()
    for x, y6 in rows:
        assert y6 == _py_ln_u6(x), x


def test_random_fuzz_python_replica_matches_duckdb():
    """5000 seeded-random draws across the full domain, ONE batched
    query (DuckDB pays ~1 s just PLANNING the staged CASEs, so
    per-example statements — the hypothesis shape — are off the table;
    a fixed seed keeps the fuzz deterministic)."""
    import random

    rng = random.Random(0xD157)
    xs = [rng.randint(1, (1 << 62) - 1) for _ in range(4000)] + [
        rng.randint(1, 1 << (1 + rng.randint(0, 60))) for _ in range(1000)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE fz AS SELECT unnest(?) AS x", [xs])
    rows = con.execute(
        "SELECT x, y6 FROM (SELECT x, "
        + ln_u6_select_items("x", "y6")
        + " FROM fz) t"
    ).fetchall()
    assert len(rows) == len(xs)
    for x, y6 in rows:
        assert y6 == _py_ln_u6(x), x
