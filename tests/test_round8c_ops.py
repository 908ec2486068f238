"""Tests for the round-8 session-2 operators (plans/catalog_round8c.py):
SCD2 build, distributed skyline, trailing EWMA, ACF, PSI drift.

Each operator gets (a) a naive independent re-derivation in
pandas/numpy — NOT the DuckDB oracle, so the logic is pinned by a third
implementation — and (b) a physical-plan assertion for the property
that makes it scale (single shuffle, no cartesian, partitioned window).
"""
from __future__ import annotations

import io
import math
from contextlib import redirect_stdout

import duckdb
import numpy as np
import pandas as pd

from helium_arango_etl_lite_spark.plans.registry import QUERIES
from helium_arango_etl_lite_spark.plans import catalog_round8c as r8c


def _plan(spark, sf_dir, name):
    df = QUERIES[name].spark_fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _events_pdf(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type, value "
        f"FROM '{sf_dir}/events.parquet' ORDER BY user_id, ts, event_id"
    ).df()


# ---------------------------------------------------------------------------
# scd2_build
# ---------------------------------------------------------------------------

def test_scd2_matches_naive_run_compression(spark, sf_dir):
    out = (
        QUERIES["scd2_build"].spark_fn(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )
    pdf = _events_pdf(sf_dir)
    rows = []
    for uid, g in pdf.groupby("user_id", sort=True):
        g = g.sort_values(["ts", "event_id"])
        prev, version = None, 0
        hist = []
        for _, r in g.iterrows():
            if prev is None or r["event_type"] != prev:
                version += 1
                hist.append([uid, r["event_type"], r["ts"], None, version])
            prev = r["event_type"]
        for i in range(len(hist) - 1):
            hist[i][3] = hist[i + 1][2]
        rows.extend(hist)
    naive = pd.DataFrame(
        rows, columns=["user_id", "attr", "valid_from", "valid_to", "version"]
    )
    assert len(out) == len(naive)
    merged = out.merge(
        naive, on=["user_id", "version"], suffixes=("", "_n")
    )
    assert (merged["attr"] == merged["attr_n"]).all()
    assert (merged["valid_from"] == merged["valid_from_n"]).all()
    both_null = merged["valid_to"].isna() & merged["valid_to_n"].isna()
    assert (both_null | (merged["valid_to"] == merged["valid_to_n"])).all()
    # is_current <=> open interval, exactly one per user
    assert (out["is_current"] == out["valid_to"].isna()).all()
    assert (out.groupby("user_id")["is_current"].sum() == 1).all()


def test_scd2_intervals_tile_without_overlap(spark, sf_dir):
    out = QUERIES["scd2_build"].spark_fn(spark, sf_dir).toPandas()
    for _, g in out.groupby("user_id"):
        g = g.sort_values("version")
        # consecutive versions chain: valid_to[i] == valid_from[i+1]
        assert (
            g["valid_to"].iloc[:-1].values == g["valid_from"].iloc[1:].values
        ).all()


def _tree_exchanges(plan: str) -> int:
    # tree occurrences only (details section repeats each operator);
    # load_table's local-mode round-robin scan spread is not a shuffle
    # the operator asked for, so it is excluded.
    return (
        plan.count("+- Exchange")
        + plan.count(":- Exchange")
        - plan.count("RoundRobinPartitioning")
    )


def test_scd2_plan_single_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "scd2_build")
    # lag, change-filter, lead/row_number all ride ONE user_id shuffle
    assert _tree_exchanges(plan) == 1, plan


# ---------------------------------------------------------------------------
# pareto_frontier
# ---------------------------------------------------------------------------

def test_pareto_matches_naive_dominance(spark, sf_dir):
    out = QUERIES["pareto_frontier"].spark_fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    orders = con.execute(
        f"SELECT o_orderkey, o_totalprice, o_orderdate "
        f"FROM '{sf_dir}/orders.parquet'"
    ).df()
    p = orders["o_totalprice"].values
    d = orders["o_orderdate"].values
    keep = []
    for i in range(len(orders)):
        dominated = (
            (p <= p[i]) & (d >= d[i]) & ((p < p[i]) | (d > d[i]))
        ).any()
        if not dominated:
            keep.append(orders["o_orderkey"].iloc[i])
    assert sorted(out["o_orderkey"]) == sorted(keep)


def test_pareto_frontier_is_mutually_nondominating(spark, sf_dir):
    out = QUERIES["pareto_frontier"].spark_fn(spark, sf_dir).toPandas()
    pts = out[["o_totalprice", "o_orderdate"]].values
    for i in range(len(pts)):
        for j in range(len(pts)):
            if i == j:
                continue
            pi, di = pts[i]
            pj, dj = pts[j]
            assert not (
                pj <= pi and dj >= di and (pj < pi or dj > di)
            ), (pts[i], pts[j])


def test_pareto_plan_no_cartesian_no_sortmerge(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pareto_frontier")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # frontier + prefix joins broadcast
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# events_ewma
# ---------------------------------------------------------------------------

def test_ewma_matches_naive_trailing_dot_product(spark, sf_dir):
    out = (
        QUERIES["events_ewma"].spark_fn(spark, sf_dir)
        .toPandas()
        .set_index("event_id")
    )
    pdf = _events_pdf(sf_dir)
    w = np.array(r8c._EWMA_W)
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        xc = np.round(g["value"].values * 100).astype(np.int64)
        for i in range(len(g)):
            k = min(i + 1, r8c._EWMA_K)
            window = xc[i - k + 1: i + 1][::-1]  # most recent first
            expect = float(
                np.dot(window, w[:k]) / w[:k].sum()
            )
            got = out.loc[g["event_id"].iloc[i], "ewma_c"]
            assert math.isclose(got, round(expect, 6), abs_tol=2e-6), (
                g["event_id"].iloc[i], got, expect
            )


def test_ewma_all_lags_fuse_into_one_window(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_ewma")
    assert plan.count("+- Window") + plan.count(":- Window") == 1, plan
    assert _tree_exchanges(plan) == 1, plan


# ---------------------------------------------------------------------------
# events_acf
# ---------------------------------------------------------------------------

def test_acf_matches_naive_pearson(spark, sf_dir):
    out = (
        QUERIES["events_acf"].spark_fn(spark, sf_dir)
        .toPandas()
        .set_index("lag")
        .sort_index()
    )
    pdf = _events_pdf(sf_dir)
    hours = (
        pdf["ts"].dt.floor("h").astype("datetime64[ns]").astype("int64")
        // 10**9
    )
    counts = hours.value_counts().sort_index()
    hs = counts.index.values
    c = counts.values.astype(np.int64)
    idx = {h: i for i, h in enumerate(hs)}
    for lag in range(1, r8c._ACF_MAX_LAG + 1):
        xs, ys = [], []
        for i, h in enumerate(hs):
            j = idx.get(h + 3600 * lag)
            if j is not None:
                xs.append(c[i])
                ys.append(c[j])
        xs, ys = np.array(xs, dtype=float), np.array(ys, dtype=float)
        assert out.loc[lag, "n_pairs"] == len(xs)
        if len(xs) > 1 and xs.std() > 0 and ys.std() > 0:
            expect = np.corrcoef(xs, ys)[0, 1]
            assert math.isclose(
                out.loc[lag, "r"], round(expect, 6), abs_tol=2e-6
            )


def test_acf_series_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_acf")
    # the fact table is reduced to the hourly series before any join;
    # the lag self-join must be broadcast, never a shuffle join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# dq_psi_drift
# ---------------------------------------------------------------------------

def _naive_psi(pdf: pd.DataFrame) -> dict[str, int]:
    B = r8c._PSI_BINS
    bins = np.minimum(pdf["n_chars"].values // 100, B - 1)
    total = len(pdf)
    base = np.array([(bins == b).sum() for b in range(B)])
    out = {}
    for src, g in pdf.groupby("source"):
        gb = np.minimum(g["n_chars"].values // 100, B - 1)
        n = len(g)
        psi6 = 0
        for b in range(B):
            p = ((gb == b).sum() + 0.5) / (n + 0.5 * B)
            q = (base[b] + 0.5) / (total + 0.5 * B)
            psi6 += int(math.floor((p - q) * math.log(p / q) * 1e6 + 0.5))
        out[src] = psi6
    return out


def test_psi_matches_naive(spark, sf_dir):
    out = (
        QUERIES["dq_psi_drift"].spark_fn(spark, sf_dir)
        .toPandas()
        .set_index("source")
    )
    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT source, n_chars FROM '{sf_dir}/documents.parquet'"
    ).df()
    naive = _naive_psi(pdf)
    assert set(out.index) == set(naive)
    for src, psi6 in naive.items():
        assert out.loc[src, "psi6"] == psi6
        assert psi6 >= 0  # PSI terms are individually non-negative


def test_psi_identical_distribution_is_near_zero(spark):
    # a source that IS the corpus must score ~0 (only smoothing noise)
    pdf = pd.DataFrame(
        {
            "source": ["a"] * 100 + ["b"] * 100,
            "n_chars": list(range(0, 600, 6)) * 2,
        }
    )
    naive = _naive_psi(pdf)
    assert naive["a"] == naive["b"]
    assert naive["a"] <= 1000  # < 0.001 PSI


def test_psi_sum_is_order_free_integer(spark, sf_dir):
    # fixed-point terms make the per-source sum independent of
    # aggregation order: recompute from a shuffled frame
    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT source, n_chars FROM '{sf_dir}/documents.parquet'"
    ).df()
    a = _naive_psi(pdf)
    b = _naive_psi(pdf.sample(frac=1.0, random_state=7))
    assert a == b
