"""Round-8 session-2 catalog, part 3: inequality, forensic DQ, corpus
novelty, and trend shapes.

* ``agg_gini_by_group`` — Gini coefficient of payment value per event
  type via the rank formulation G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n:
  the concentration report ("do 1% of users carry 80% of volume?")
  every abuse/economics dashboard starts from. The rank window is
  PARTITIONED by event type — parallel — and every accumulator is a
  BIGINT over integer cents, so the only float op is the final ratio.
* ``dq_benford`` — first-significant-digit profile vs Benford's law
  with a fixed-point chi-square statistic: the classic fabricated-data
  forensic. One digit-extraction map + one (type, digit) partial agg;
  everything after runs on 9 rows per type.
* ``llm_ngram_novelty`` — per-document fraction of 3-gram shingles not
  seen in any EARLIER document (doc_id order): the marginal-novelty
  curve that tells a curation pipeline when a source stops adding
  information (the per-doc dual of llm_vocab_growth's corpus curve).
  One shingle-keyed shuffle computes each gram's first-seer; a second
  groupBy folds novelty back per doc. No iteration, no window over the
  corpus.
* ``events_trend_slope`` — exact least-squares slope over each user's
  trailing 8 events (the Holt-style local trend detector): like
  events_ewma, the sequential smoother is replaced by a bounded
  trailing window whose sufficient statistics are exact integers; the
  slope is ONE float division per row, so the cross-engine hash is
  safe by construction.

Reference parity note: the reference ETL (helium-arango-etl-lite) has
none of these; they extend the analytics / DQ / LLM-curation families
(SURVEY.md section 2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.llm.dedup import word_shingles
from .registry import EVENTS_NORM, load_events, load_table, register

# ---------------------------------------------------------------------------
# Gini coefficient per group (rank formulation, integer-exact sums)
# ---------------------------------------------------------------------------

_GINI_SQL = f"""
WITH {EVENTS_NORM},
e AS (SELECT event_type, round(value * 100)::BIGINT AS xc,
             event_id
      FROM events_norm),
r AS (SELECT event_type, xc,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY xc, event_id) AS rk
      FROM e),
s AS (SELECT event_type,
             count(*)::BIGINT AS n,
             sum(xc)::BIGINT AS sx,
             sum(rk * xc)::BIGINT AS srx
      FROM r GROUP BY 1)
SELECT event_type, n,
       round(2.0 * srx / (n * sx) - (n + 1.0) / n, 6) AS gini
FROM s"""


@register(
    "agg_gini_by_group",
    _GINI_SQL,
    doc="Gini concentration coefficient of event value per event type, "
        "rank formulation G = 2*sum(rank*x)/(n*sum(x)) - (n+1)/n over "
        "values sorted ascending (deterministic (value, event_id) "
        "tie-break). 0 = perfectly equal, ->1 = one key carries all "
        "volume — the inequality summary behind whale/abuse detection. "
        "PLAN: the oracle SPEC ranks every row, but the engine never "
        "does — ties at a value occupy consecutive ranks whose rank*x "
        "total is xc*(k*r0 + k(k-1)/2) however the ties are ordered, so "
        "sum(rank*x) collapses to one (type, value) partial-agg shuffle "
        "plus a prefix-count window over the DISTINCT-VALUE table "
        "(bounded by the cents domain, not the corpus — the sort that "
        "capped parallelism at #types in the first version is gone; "
        "x100 soak 13.2 s -> 6.6 s, SCALE_SOAK round-8s2). EXACTNESS: "
        "every accumulator is BIGINT (products < 2^63 to ~10^14 "
        "rows/group); the one float expression is the final ratio, "
        "rounded 6 dp on both engines.",
    tags=("agg", "analytics", "window"),
)
def agg_gini_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The oracle SPEC ranks every row (row_number over (xc, event_id)),
    # which as a physical plan caps parallelism at #event_types — one
    # task sorts an entire type's rows. This computes the IDENTICAL
    # sum(rank*x) without any per-row window: ties at value xc occupy
    # consecutive ranks r0..r0+k-1, and their rank*x total is
    # xc*(k*r0 + k*(k-1)/2) regardless of which tied row got which rank
    # — so one (type, value) partial-agg shuffle + a prefix-count window
    # over the DISTINCT-VALUE table (bounded by the value domain, ~50k
    # cents rows per type at ANY corpus size) replaces the full-corpus
    # sort. Cross-engine hash agreement certifies the identity.
    ev = load_events(spark, sf_dir)
    e = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("xc"),
    )
    pv = e.groupBy("event_type", "xc").agg(
        F.count(F.lit(1)).alias("k")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("xc")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pv = pv.withColumn(
        "r0", F.coalesce(F.sum("k").over(w), F.lit(0)) + 1
    )
    # k*(k-1) is always even: DIV keeps the whole term in BIGINT
    srx_term = F.col("xc") * (
        F.col("k") * F.col("r0")
        + F.expr("k * (k - 1) DIV 2")
    )
    s = pv.groupBy("event_type").agg(
        F.sum("k").alias("n"),
        F.sum(F.col("k") * F.col("xc")).alias("sx"),
        F.sum(srx_term).cast("long").alias("srx"),
    )
    gini = (
        2.0 * F.col("srx") / (F.col("n") * F.col("sx"))
        - (F.col("n") + 1.0) / F.col("n")
    )
    return s.select(
        "event_type", "n", F.round(gini, 6).alias("gini")
    )


# ---------------------------------------------------------------------------
# Benford first-digit forensic profile
# ---------------------------------------------------------------------------

# expected Benford shares log10(1 + 1/d), d = 1..9, as exact literals the
# oracle embeds verbatim (both engines consume the SAME doubles).
_BENFORD_P = [0.0] + [__import__("math").log10(1 + 1 / d) for d in range(1, 10)]

# ::DOUBLE on every literal: DuckDB parses a bare 0.301... literal as
# DECIMAL, which silently changes the arithmetic type (and overflows
# DECIMAL(18) in the fixed-point multiply); Spark's F.lit(float) is a
# double, so the oracle must be too.
_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {_BENFORD_P[d]!r}::DOUBLE" for d in range(1, 10)
)

_BENFORD_SQL = f"""
WITH {EVENTS_NORM},
e AS (SELECT event_type,
             substr((round(value * 100)::BIGINT)::VARCHAR, 1, 1)::BIGINT
               AS digit
      FROM events_norm
      WHERE round(value * 100)::BIGINT > 0),
c AS (SELECT event_type, digit, count(*)::BIGINT AS obs
      FROM e GROUP BY 1, 2),
grid AS (SELECT t.event_type, d.digit, t.n
         FROM (SELECT event_type, sum(obs)::BIGINT AS n
               FROM c GROUP BY 1) t,
              (SELECT unnest(generate_series(1, 9)) AS digit) d),
j AS (SELECT grid.event_type, grid.digit, grid.n,
             coalesce(c.obs, 0)::BIGINT AS obs,
             CASE grid.digit {_BENFORD_CASE} END AS p
      FROM grid LEFT JOIN c USING (event_type, digit))
SELECT event_type, digit, obs,
       floor(p * 1000000 + 0.5)::BIGINT AS expected_p6,
       floor((obs - n * p) * (obs - n * p) / (n * p) * 1000000
             + 0.5)::BIGINT AS chi2_term6
FROM j"""


@register(
    "dq_benford",
    _BENFORD_SQL,
    doc="Benford's-law forensic profile: first significant digit of the "
        "integer-cent value vs the log10(1+1/d) expectation, with the "
        "per-digit chi-square contribution (obs - n*p)^2 / (n*p) — "
        "fabricated or unit-mangled feeds light up digits 1/9 long "
        "before means move. DENSIFIED over all 9 digits per type so a "
        "never-occurring digit contributes its full penalty. One "
        "digit-extraction map (substring of the cents integer — no "
        "float log10 per row) + one (type, digit) partial agg; the "
        "grid, expectation, and chi-square run on 9 rows per type. "
        "Fixed-point terms (floor(x*1e6+0.5), identical both engines); "
        "the consumer sums chi2_term6 per type and compares to the "
        "chi-square(8) critical value.",
    tags=("dq", "agg", "profile"),
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    e = ev.select(
        "event_type",
        F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit"),
    ).filter(cents > 0)
    c = e.groupBy("event_type", "digit").agg(
        F.count(F.lit(1)).alias("obs")
    )
    c = c.localCheckpoint(eager=False)  # feeds totals + the digit grid
    tot = c.groupBy("event_type").agg(F.sum("obs").alias("n"))
    digits = spark.range(1, 10).select(F.col("id").alias("digit"))
    grid = tot.crossJoin(F.broadcast(digits))
    p = F.element_at(
        F.array(*[F.lit(_BENFORD_P[d]) for d in range(1, 10)]),
        F.col("digit").cast("int"),
    )
    j = (
        grid.join(c, ["event_type", "digit"], "left")
        .select(
            "event_type",
            "digit",
            "n",
            F.coalesce("obs", F.lit(0)).alias("obs"),
            p.alias("p"),
        )
    )
    dev = F.col("obs") - F.col("n") * F.col("p")
    return j.select(
        "event_type",
        "digit",
        "obs",
        F.floor(F.col("p") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("expected_p6"),
        F.floor(dev * dev / (F.col("n") * F.col("p")) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("chi2_term6"),
    )


# ---------------------------------------------------------------------------
# per-document n-gram novelty (marginal information curve)
# ---------------------------------------------------------------------------

_NOV_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
g AS (SELECT doc_id,
             unnest(list_distinct(CASE WHEN len(a) >= 3
                 THEN list_transform(generate_series(1, len(a) - 2),
                      i -> a[i] || ' ' || a[i + 1] || ' ' || a[i + 2])
                 ELSE []::VARCHAR[] END)) AS gram
      FROM tok),
first_seen AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1)
SELECT g.doc_id,
       count(*)::BIGINT AS n_grams,
       sum(CASE WHEN first_seen.first_doc = g.doc_id
                THEN 1 ELSE 0 END)::BIGINT AS n_novel,
       round(sum(CASE WHEN first_seen.first_doc = g.doc_id
                      THEN 1 ELSE 0 END) / count(*)::DOUBLE, 6)
         AS novel_frac
FROM g JOIN first_seen USING (gram)
GROUP BY 1"""


@register(
    "llm_ngram_novelty",
    _NOV_SQL,
    doc="Per-document marginal novelty: the fraction of a doc's distinct "
        "3-gram shingles whose FIRST corpus occurrence (min doc_id) is "
        "this doc — the per-doc dual of llm_vocab_growth's Heaps curve, "
        "and the signal for 'this source stopped adding information' / "
        "ingest-order curation. DATAFLOW: one shingle-keyed partial-agg "
        "shuffle assigns each gram its first-seer; per-doc novel counts "
        "then come from folding the FIRST_SEEN table by its first_doc "
        "column (never joining the exploded corpus back — see the "
        "in-function comment for the measured 35x super-linear trap "
        "that join is), and per-doc gram totals from a doc-keyed "
        "partial agg. The final join touches two n_docs-sized tables. "
        "Docs with < 3 tokens have no shingles and drop out (same "
        "contract as the shingle dedup family).",
    tags=("llm", "text", "analytics"),
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The oracle SPEC joins the exploded gram table back to first_seen;
    # the engine never does — that join re-shuffles the full exploded
    # corpus on a now-skewed gram key (every duplicated gram's rows land
    # in one reducer) and measured 35x super-linear at the x100 soak
    # (185.1 s). Instead: n_novel(doc) = how many grams name doc as
    # their first-seer = ONE tiny groupBy of the first_seen table
    # itself; n_grams(doc) is a doc-keyed partial agg of the re-derived
    # (map-only) explode. The only corpus-sized shuffle left is the
    # gram min — the join now touches two n_docs-sized aggregates.
    # x100: 185.1 s -> 45.1 s, identical hashes (SCALE_SOAK round-8s2).
    d = load_table(spark, sf_dir, "documents")
    g = d.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("gram")
    )
    first_seen = g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel = first_seen.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    per = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        per.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        )
        .withColumn(
            "novel_frac",
            F.round(
                F.col("n_novel") / F.col("n_grams").cast("double"), 6
            ),
        )
    )


# ---------------------------------------------------------------------------
# trailing least-squares trend slope (Holt-style local trend)
# ---------------------------------------------------------------------------

_TS_K = 8  # trailing points per slope


def _trend_oracle() -> str:
    lag_cols = ",\n        ".join(
        f"lag(xc, {k}) OVER w AS x{k}" for k in range(1, _TS_K)
    )
    # position i counts BACK from the current row: current = 0, oldest
    # available = n-1. Slope is over (position, value) pairs with the
    # sign flipped so positive slope = value rising toward now.
    exists = ["1"] + [
        f"CASE WHEN x{k} IS NOT NULL THEN 1 ELSE 0 END"
        for k in range(1, _TS_K)
    ]
    xs = ["xc"] + [f"coalesce(x{k}, 0)" for k in range(1, _TS_K)]
    n = " + ".join(exists)
    sx = " + ".join(
        f"({e}) * {k}" for k, e in enumerate(exists)
    )
    sxx = " + ".join(
        f"({e}) * {k * k}" for k, e in enumerate(exists)
    )
    sy = " + ".join(xs)
    sxy = " + ".join(f"({x}) * {k}" for k, x in enumerate(xs))
    return f"""
WITH {EVENTS_NORM},
e AS (SELECT event_id, user_id, ts,
             round(value * 100)::BIGINT AS xc FROM events_norm),
l AS (SELECT event_id, user_id, ts, xc,
        {lag_cols}
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT event_id, user_id, ts, xc,
             ({n})::BIGINT AS n, ({sx})::BIGINT AS sx,
             ({sxx})::BIGINT AS sxx, ({sy})::BIGINT AS sy,
             ({sxy})::BIGINT AS sxy
      FROM l)
SELECT event_id, user_id, ts, xc,
       CASE WHEN n >= 2
            THEN round(-(n * sxy - sx * sy)
                       / (n * sxx - sx * sx)::DOUBLE, 6)
            ELSE NULL END AS slope_c
FROM s"""


@register(
    "events_trend_slope",
    _trend_oracle(),
    doc=f"Exact least-squares slope over each user's trailing {_TS_K} "
        "events (cents per step, positive = rising toward now): the "
        "local trend detector a Holt-style smoother maintains "
        "sequentially, recast as a bounded trailing window — the "
        "events_ewma treatment applied to the TREND term. EXACTNESS: "
        "all five sufficient statistics (n, Sx, Sxx, Sy, Sxy over the "
        "existing lags) are BIGINT sums of integer products; the slope "
        "is ONE float division per row (variance of 0..7 positions is "
        "never zero for n >= 2), so no float accumulation exists "
        "anywhere. PLAN: all lags and sums ride a single Window on one "
        "user_id shuffle (plan test); rows with n=1 (a user's first "
        "event) emit NULL on both engines.",
    tags=("temporal", "window"),
)
def events_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("xc"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.col("xc")] + [
        F.lag("xc", k).over(w) for k in range(1, _TS_K)
    ]
    exists = [
        F.lit(1) if k == 0 else
        F.when(lags[k].isNotNull(), 1).otherwise(0)
        for k in range(_TS_K)
    ]
    xs = [
        lags[0] if k == 0 else F.coalesce(lags[k], F.lit(0))
        for k in range(_TS_K)
    ]
    n = sum(exists[1:], exists[0])
    sx = sum(
        (exists[k] * F.lit(k) for k in range(1, _TS_K)),
        exists[0] * F.lit(0),
    )
    sxx = sum(
        (exists[k] * F.lit(k * k) for k in range(1, _TS_K)),
        exists[0] * F.lit(0),
    )
    sy = sum(xs[1:], xs[0])
    sxy = sum(
        (xs[k] * F.lit(k) for k in range(1, _TS_K)),
        xs[0] * F.lit(0),
    )
    out = ev.select(
        "event_id", "user_id", "ts", "xc",
        n.cast("long").alias("n"),
        sx.cast("long").alias("sx"),
        sxx.cast("long").alias("sxx"),
        sy.cast("long").alias("sy"),
        sxy.cast("long").alias("sxy"),
    )
    slope = F.when(
        F.col("n") >= 2,
        F.round(
            -(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .cast("double"),
            6,
        ),
    )
    return out.select(
        "event_id", "user_id", "ts", "xc", slope.alias("slope_c")
    )
