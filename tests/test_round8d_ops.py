"""Tests for the round-8 session-2 part-2 operators
(plans/catalog_round8d.py): weighted sampling, naive Bayes train/score,
PMI collocations, seasonal profile.

Naive re-derivations are pure Python/numpy — a third implementation
independent of both Spark and the DuckDB oracle.
"""
from __future__ import annotations

import hashlib
import io
import math
from collections import Counter, defaultdict
from contextlib import redirect_stdout

import duckdb
import numpy as np

from helium_arango_etl_lite_spark.plans.registry import QUERIES
from helium_arango_etl_lite_spark.plans import catalog_round8d as r8d


def _plan(spark, sf_dir, name):
    df = QUERIES[name].spark_fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM '{sf_dir}/documents.parquet'"
    ).df()


def _hash32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# llm_weighted_sample
# ---------------------------------------------------------------------------

def test_weighted_sample_is_k_smallest_exponential_keys(spark, sf_dir):
    out = QUERIES["llm_weighted_sample"].spark_fn(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    keys = []
    for _, r in docs.iterrows():
        u = ((_hash32(str(r["doc_id"]) + ":ws") % r8d._WS_RES) + 1) / float(
            r8d._WS_RES
        )
        key = -math.log(u) / r["n_chars"]
        # selection happens on the fixed-point micro-key (integer-
        # deterministic across engines), not the raw double
        keys.append((math.floor(key * 1_000_000 + 0.5), r["doc_id"]))
    expect = sorted(keys)[: r8d._WS_K]
    assert sorted(out["doc_id"]) == sorted(d for _, d in expect)
    got = out.set_index("doc_id")["key6"]
    for k, d in expect:
        assert int(got[d]) == k


def test_weighted_sample_favors_heavy_docs(spark, sf_dir):
    # E[key] = 1/w: the sample's mean weight must exceed the corpus mean
    out = QUERIES["llm_weighted_sample"].spark_fn(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    assert out["n_chars"].mean() > docs["n_chars"].mean()


def test_weighted_sample_plan_is_topk_not_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan  # no global sort exchange


# ---------------------------------------------------------------------------
# naive Bayes train / score
# ---------------------------------------------------------------------------

def _nb_counts(docs):
    cnt = defaultdict(Counter)
    for _, r in docs.iterrows():
        cnt[r["lang"]].update(r["text"].split(" "))
    vocab = {t for c in cnt.values() for t in c}
    totals = {lang: sum(c.values()) for lang, c in cnt.items()}
    return cnt, totals, len(vocab)


def test_naive_bayes_train_matches_naive(spark, sf_dir):
    out = QUERIES["llm_naive_bayes_train"].spark_fn(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    cnt, totals, V = _nb_counts(docs)
    a = r8d._NB_ALPHA
    for lang, c in cnt.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[
            : r8d._NB_TOPK
        ]
        sub = out[out["lang"] == lang].set_index("token")
        assert set(sub.index) == {t for t, _ in top}
        for t, n in top:
            assert sub.loc[t, "c"] == n
            expect = math.log((n + a) / (totals[lang] + a * V))
            assert math.isclose(
                sub.loc[t, "logp"], round(expect, 6), abs_tol=2e-6
            )


def test_naive_bayes_score_integer_exact_vs_naive(spark, sf_dir):
    out = (
        QUERIES["llm_naive_bayes_score"].spark_fn(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    docs = _docs(sf_dir)
    cnt, totals, V = _nb_counts(docs)
    a = r8d._NB_ALPHA
    n_total = len(docs)
    n_lang = docs["lang"].value_counts().to_dict()

    def fp6(x):
        return math.floor(x * 1_000_000 + 0.5)

    logp6 = {
        lang: {
            t: fp6(math.log((n + a) / (totals[lang] + a * V)))
            for t, n in c.items()
        }
        for lang, c in cnt.items()
    }
    oov6 = {
        lang: fp6(math.log(a / (totals[lang] + a * V)))
        for lang in cnt
    }
    prior6 = {
        lang: fp6(math.log(n_lang[lang] / n_total)) for lang in cnt
    }
    n_correct = 0
    for _, r in docs.iterrows():
        toks = Counter(r["text"].split(" "))
        scores = {}
        for lang in cnt:
            s = prior6[lang]
            for t, k in toks.items():
                s += k * logp6[lang].get(t, oov6[lang])
            scores[lang] = s
        pred = min(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        row = out.loc[r["doc_id"]]
        assert row["pred_lang"] == pred
        assert row["score6"] == scores[pred]
        assert bool(row["correct"]) == (pred == r["lang"])
        n_correct += pred == r["lang"]
    # sanity: the classifier must beat the majority-class baseline ...
    # unless the corpus is genuinely language-agnostic (synthetic docs
    # share one vocabulary), in which case priors dominate — just pin
    # that the evaluation column agrees with the naive count.
    assert out["correct"].sum() == n_correct


def test_naive_bayes_score_model_join_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_naive_bayes_score")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# llm_pmi_collocations
# ---------------------------------------------------------------------------

def test_pmi_matches_naive(spark, sf_dir):
    out = QUERIES["llm_pmi_collocations"].spark_fn(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    bc = Counter()
    for _, r in docs.iterrows():
        toks = r["text"].split(" ")
        bc.update(zip(toks, toks[1:]))
    N = sum(bc.values())
    cx = Counter()
    cy = Counter()
    for (w1, w2), c in bc.items():
        cx[w1] += c
        cy[w2] += c
    expect = {}
    for (w1, w2), c in bc.items():
        if c >= r8d._PMI_MIN:
            pmi = (
                math.log(c) + math.log(N) - math.log(cx[w1]) - math.log(cy[w2])
            )
            expect[(w1, w2)] = (c, math.floor(pmi * 1_000_000 + 0.5))
    got = {
        (r["w1"], r["w2"]): (r["cb"], r["pmi6"])
        for _, r in out.iterrows()
    }
    assert got == expect


def test_pmi_marginal_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_pmi_collocations")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# events_seasonal_profile
# ---------------------------------------------------------------------------

def test_seasonal_profile_matches_naive(spark, sf_dir):
    out = QUERIES["events_seasonal_profile"].spark_fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT event_type, ts::TIMESTAMP AS ts, value "
        f"FROM '{sf_dir}/events.parquet'"
    ).df()
    pdf["hod"] = pdf["ts"].dt.hour
    pdf["xc"] = np.round(pdf["value"].values * 100).astype(np.int64)
    for (et, hod), g in pdf.groupby(["event_type", "hod"]):
        row = out[(out["event_type"] == et) & (out["hod"] == hod)]
        assert len(row) == 1
        assert row["n"].iloc[0] == len(g)
        expect = g["xc"].sum() / (len(g) * 100.0)
        assert math.isclose(
            row["mean_value"].iloc[0], round(expect, 6), abs_tol=2e-6
        )
    # shares sum to ~1 within each event type
    sums = out.groupby("event_type")["share"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()
