"""Property-based tests for the round-5 operators: each Spark result is
compared against an independent pure-Python reference implementation on
hypothesis-generated inputs (example counts kept small — every example
is a Spark job)."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from helium_arango_etl_lite_spark.operators.aggregates import HLL_M, HLL_NUMERATOR, hll_distinct
from helium_arango_etl_lite_spark.operators.llm import dedup, similarity

words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
)
texts = st.lists(words, min_size=1, max_size=30).map(" ".join)


def _round_half_up(x: float, dp: int) -> float:
    """Round half AWAY from zero, mirroring Spark's ``F.round`` on
    doubles (``BigDecimal.valueOf(d).setScale(dp, HALF_UP)`` — shortest
    round-trip decimal repr first, then half-up; Python's builtin
    ``round`` is banker's and disagrees on exact .5 ties like
    0.15125 -> 0.1512 vs Spark/DuckDB's 0.1513)."""
    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _py_windows(text: str, window: int, stride: int) -> set[str]:
    if len(text) < window:
        return set()
    return {
        hashlib.md5(text[i : i + window].encode()).hexdigest()
        for i in range(0, len(text) - window + 1, stride)
    }


@settings(max_examples=6, deadline=None)
@given(st.lists(texts, min_size=2, max_size=8))
def test_window_dup_stats_matches_python_reference(spark, docs):
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_windows, r.n_shared_windows)
        for r in dedup.window_dup_stats(df, window=16, stride=4).collect()
    }
    wins = {i: _py_windows(t, 16, 4) for i, t in rows}
    shared_hashes = {
        h
        for i, ws in wins.items()
        for h in ws
        if any(h in wins[j] for j in wins if j != i)
    }
    for i, ws in wins.items():
        n_shared = len(ws & shared_hashes)
        assert got[i] == (len(ws), n_shared), (i, got[i], (len(ws), n_shared))


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-4, max_value=4, allow_nan=False, width=32),
            min_size=8, max_size=8,
        ),
        min_size=4, max_size=12,
    )
)
def test_pq_quantize_matches_numpy_argmin(spark, vecs):
    import numpy as np

    n_codes, n_blocks, sub = 4, 2, 4
    rows = [(i, [float(np.float32(x)) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: (r.code_0, r.code_1, r.mse)
        for r in similarity.pq_quantize(
            df, n_blocks=n_blocks, n_codes=n_codes
        ).collect()
    }
    cb = [rows[i][1] for i in range(n_codes)]  # first n_codes by id
    for i, v in rows:
        mins = []
        codes = []
        for b in range(n_blocks):
            dists = [
                _round_half_up(
                    sum(
                        (v[b * sub + j] - cb[c][b * sub + j])
                        * (v[b * sub + j] - cb[c][b * sub + j])
                        for j in range(sub)
                    ),
                    6,
                )
                for c in range(n_codes)
            ]
            m = min(dists)
            codes.append(dists.index(m) + 1)
            mins.append(m)
        assert got[i][:2] == tuple(codes), (i, got[i], codes)
        assert math.isclose(
            got[i][2], _round_half_up(sum(mins) / 8, 4), abs_tol=1e-9
        )


def _py_hll(values: list[str]) -> float:
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        b = h % HLL_M
        w = h // HLL_M
        rho = 55 if w == 0 else 55 - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    zp = sum(1 << (55 - r) for r in regs.values())
    v_empty = HLL_M - len(regs)
    z_total = zp + v_empty * (1 << 55)
    e = HLL_NUMERATOR / float(z_total)
    if e <= 2.5 * HLL_M and v_empty > 0:
        e = float(HLL_M) * math.log(float(HLL_M) / v_empty)
    return e


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60))
def test_hll_matches_python_reference(spark, ids):
    rows = [("g", i) for i in ids]
    df = spark.createDataFrame(rows, "grp string, uid long")
    out = hll_distinct(df, group="grp", value="uid").collect()
    assert len(out) == 1
    r = out[0]
    ref = _py_hll([str(i) for i in ids])
    assert r.n_exact == len(set(ids))
    assert math.isclose(
        r.n_hll, _round_half_up(ref, 4), abs_tol=1e-6
    ), (r.n_hll, ref)
