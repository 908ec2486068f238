"""Tests for the round-8 session-2 part-3 operators
(plans/catalog_round8e.py): Gini by group, Benford profile, n-gram
novelty, trailing trend slope. Naive re-derivations in pure
Python/numpy, plus plan assertions for the scale properties."""
from __future__ import annotations

import io
import math
from contextlib import redirect_stdout

import duckdb
import numpy as np

from helium_arango_etl_lite_spark.plans.registry import QUERIES
from helium_arango_etl_lite_spark.plans import catalog_round8e as r8e


def _plan(spark, sf_dir, name):
    df = QUERIES[name].spark_fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _events(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type, value "
        f"FROM '{sf_dir}/events.parquet'"
    ).df()


def _tree_exchanges(plan: str) -> int:
    return (
        plan.count("+- Exchange")
        + plan.count(":- Exchange")
        - plan.count("RoundRobinPartitioning")
    )


# ---------------------------------------------------------------------------
# agg_gini_by_group
# ---------------------------------------------------------------------------

def test_gini_matches_naive(spark, sf_dir):
    out = (
        QUERIES["agg_gini_by_group"].spark_fn(spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    pdf = _events(sf_dir)
    pdf["xc"] = np.round(pdf["value"].values * 100).astype(np.int64)
    for et, g in pdf.groupby("event_type"):
        x = np.sort(g["xc"].values)
        n = len(x)
        gini = 2.0 * np.sum((np.arange(1, n + 1)) * x) / (
            n * x.sum()
        ) - (n + 1.0) / n
        assert out.loc[et, "n"] == n
        assert math.isclose(
            out.loc[et, "gini"], round(gini, 6), abs_tol=2e-6
        )


def test_gini_bounds_and_known_values(spark):
    # equal values -> 0; one holder -> (n-1)/n
    x_eq = np.array([5, 5, 5, 5], dtype=np.int64)
    x_one = np.array([0, 0, 0, 100], dtype=np.int64)

    def gini(x):
        x = np.sort(x)
        n = len(x)
        return 2.0 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum()) - (
            n + 1.0
        ) / n

    assert abs(gini(x_eq)) < 1e-12
    assert abs(gini(x_one) - 0.75) < 1e-12


def test_gini_never_sorts_the_corpus(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_gini_by_group")
    # the spec's per-row rank is collapsed to the distinct-value table:
    # one (type,value) hash shuffle + one tiny window repartition — and
    # no row_number anywhere (the sort that capped parallelism at
    # #event_types is gone)
    assert "row_number" not in plan
    assert _tree_exchanges(plan) <= 2, plan


# ---------------------------------------------------------------------------
# dq_benford
# ---------------------------------------------------------------------------

def test_benford_matches_naive(spark, sf_dir):
    out = QUERIES["dq_benford"].spark_fn(spark, sf_dir).toPandas()
    pdf = _events(sf_dir)
    cents = np.round(pdf["value"].values * 100).astype(np.int64)
    pdf = pdf[cents > 0].copy()
    pdf["digit"] = [int(str(c)[0]) for c in cents[cents > 0]]
    for et, g in pdf.groupby("event_type"):
        n = len(g)
        for d in range(1, 10):
            obs = int((g["digit"] == d).sum())
            p = math.log10(1 + 1 / d)
            chi = (obs - n * p) ** 2 / (n * p)
            row = out[(out["event_type"] == et) & (out["digit"] == d)]
            assert len(row) == 1  # densified: all 9 digits present
            assert row["obs"].iloc[0] == obs
            assert row["expected_p6"].iloc[0] == math.floor(
                p * 1e6 + 0.5
            )
            assert row["chi2_term6"].iloc[0] == math.floor(
                chi * 1e6 + 0.5
            )


def test_benford_digit_extraction_avoids_log(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dq_benford")
    # digit comes from substring of the cents integer, not LOG10 per row
    assert "LOG10" not in plan.upper().replace("LOG10(1", "")


# ---------------------------------------------------------------------------
# llm_ngram_novelty
# ---------------------------------------------------------------------------

def test_novelty_matches_naive(spark, sf_dir):
    out = (
        QUERIES["llm_ngram_novelty"].spark_fn(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        f"ORDER BY doc_id"
    ).df()
    first = {}
    per_doc = {}
    for _, r in docs.iterrows():
        toks = r["text"].split(" ")
        grams = {
            " ".join(toks[i: i + 3]) for i in range(len(toks) - 2)
        }
        per_doc[r["doc_id"]] = grams
        for gm in grams:
            if gm not in first or r["doc_id"] < first[gm]:
                first[gm] = r["doc_id"]
    for doc_id, grams in per_doc.items():
        if not grams:
            assert doc_id not in out.index
            continue
        novel = sum(1 for gm in grams if first[gm] == doc_id)
        assert out.loc[doc_id, "n_grams"] == len(grams)
        assert out.loc[doc_id, "n_novel"] == novel


def test_novelty_never_joins_the_exploded_corpus(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_ngram_novelty")
    # the exploded gram table appears exactly twice (two map-only
    # re-derivations feeding the two partial aggs); the join runs on
    # n_docs-sized aggregates only — the x100 soak measured the
    # join-back form 35x super-linear before this shape
    assert (
        plan.count("+- Generate") + plan.count(":- Generate") == 2
    ), plan


def test_novelty_first_doc_is_fully_novel(spark, sf_dir):
    out = QUERIES["llm_ngram_novelty"].spark_fn(spark, sf_dir).toPandas()
    first_doc = out["doc_id"].min()
    row = out[out["doc_id"] == first_doc].iloc[0]
    assert row["novel_frac"] == 1.0


# ---------------------------------------------------------------------------
# events_trend_slope
# ---------------------------------------------------------------------------

def test_trend_slope_matches_naive_lstsq(spark, sf_dir):
    out = (
        QUERIES["events_trend_slope"].spark_fn(spark, sf_dir)
        .toPandas()
        .set_index("event_id")
    )
    pdf = _events(sf_dir)
    pdf["xc"] = np.round(pdf["value"].values * 100).astype(np.int64)
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        xc = g["xc"].values
        for i in range(len(g)):
            k = min(i + 1, r8e._TS_K)
            got = out.loc[g["event_id"].iloc[i], "slope_c"]
            if k < 2:
                assert got is None or (
                    isinstance(got, float) and math.isnan(got)
                )
                continue
            # position 0 = current, increasing into the past; the
            # reported slope flips the sign so positive = rising
            pos = np.arange(k, dtype=float)
            vals = xc[i - k + 1: i + 1][::-1].astype(float)
            slope = np.polyfit(pos, vals, 1)[0]
            assert math.isclose(
                got, round(-slope, 6), abs_tol=3e-6
            ), (g["event_id"].iloc[i], got, -slope)


def test_trend_slope_single_window_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_trend_slope")
    assert plan.count("+- Window") + plan.count(":- Window") == 1, plan
    assert _tree_exchanges(plan) == 1, plan


def test_trend_slope_sign_convention(spark):
    # strictly increasing values toward now => positive slope of +step
    pos = np.arange(4, dtype=float)          # 0 = now ... 3 = oldest
    vals = np.array([40.0, 30.0, 20.0, 10.0])  # now=40, oldest=10
    slope = np.polyfit(pos, vals, 1)[0]
    assert math.isclose(-slope, 10.0)
