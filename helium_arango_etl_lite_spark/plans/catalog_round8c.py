"""Round-8 session-2 catalog: warehouse/time-series/data-quality shapes.

* ``scd2_build`` — slowly-changing-dimension type-2 construction from an
  event stream: compress each user's attribute history to change points
  and emit versioned validity intervals (valid_from / valid_to /
  is_current). The ETL primitive the reference's replace-mode upsert
  (follower.py update path) cannot express: history is KEPT, not
  overwritten.
* ``pareto_frontier`` — 2-D skyline (minimize price, maximize recency)
  via a genuinely distributed two-level prefix scan: per-price collapse,
  fixed-width price buckets, tiny cross-bucket prefix-max table
  broadcast back, intra-bucket running max — no global single-partition
  window anywhere. The DuckDB oracle states the NAIVE dominance
  anti-join spec; cross-engine agreement certifies the scan algorithm.
* ``events_ewma`` — trailing-16 exponentially weighted moving average
  per user. The recursive EWMA is a sequential scan; the trailing-K
  form is its bounded-memory, embarrassingly parallel surrogate (weight
  beyond k=15 is 0.7^16 < 0.4% here) and is computed EXACTLY the same
  way on both engines: one fixed-order 16-term dot product per row.
* ``events_acf`` — autocorrelation function of the hourly event-count
  series at lags 1..6: one time-bucket shuffle over the fact table,
  then all lag math runs on the ~#hours-row series (matched-pairs
  Pearson, integer sufficient statistics, one float op at the end).
* ``dq_psi_drift`` — population stability index of each source's
  doc-length distribution against the corpus baseline (the standard
  "did this slice drift?" monitor). Laplace-smoothed over a FIXED bin
  grid; per-bin terms are carried as fixed-point integers so the
  per-source sum is order-free and the cross-engine hash exact.

Reference parity note: the reference ETL (helium-arango-etl-lite) has
none of these; they extend the analytics / training-data families
(SURVEY.md section 2.8). scd2_build cites the reference's
follower.py:130 replace-mode upsert as the history-destroying
counterpart it complements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import EVENTS_NORM, load_events, load_table, register

# ---------------------------------------------------------------------------
# SCD type-2 build from the event stream
# ---------------------------------------------------------------------------

_SCD2_SQL = f"""
WITH {EVENTS_NORM},
o AS (SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events_norm),
c AS (SELECT user_id, ts, event_id, event_type FROM o
      WHERE prev IS NULL OR prev <> event_type)
SELECT user_id,
       event_type AS attr,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       row_number() OVER w AS version,
       (lead(ts) OVER w IS NULL) AS is_current
FROM c
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""


@register(
    "scd2_build",
    _SCD2_SQL,
    doc="Slowly-changing-dimension type-2 build: treat each user's "
        "event_type sequence as an attribute history, keep only change "
        "points (lag != current), and emit versioned validity intervals "
        "— valid_from = change ts, valid_to = next change ts (NULL = "
        "open), version = change ordinal, is_current flag. This is the "
        "history-preserving dual of the reference's replace-mode upsert "
        "(reference follower.py:130 overwrites the row; SCD2 appends a "
        "version). PLAN: lag, lead, and row_number all ride ONE "
        "user_id-hash shuffle — the change-point filter between them "
        "preserves partitioning, so the physical plan has exactly one "
        "Exchange (plan test). Deterministic tie-break (ts, event_id) "
        "makes the compressed history reproducible under reordered "
        "input — the idempotence a dimension build needs.",
    tags=("etl", "window", "temporal"),
)
def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = ev.withColumn("prev", F.lag("event_type").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    return chg.select(
        "user_id",
        F.col("event_type").alias("attr"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())


# ---------------------------------------------------------------------------
# 2-D pareto frontier (skyline) via a distributed two-level prefix scan
# ---------------------------------------------------------------------------

_PARETO_BUCKET_W = 20_000.0  # fixed price-bucket width: ~25 buckets over
# the TPC-H o_totalprice range; the cross-bucket table is O(#buckets)
# regardless of row count, so the width is a constant, not a dial.

_PARETO_SQL = """
SELECT a.o_orderkey, a.o_totalprice, a.o_orderdate
FROM orders a
WHERE NOT EXISTS (
    SELECT 1 FROM orders b
    WHERE b.o_totalprice <= a.o_totalprice
      AND b.o_orderdate >= a.o_orderdate
      AND (b.o_totalprice < a.o_totalprice
           OR b.o_orderdate > a.o_orderdate))"""


@register(
    "pareto_frontier",
    _PARETO_SQL,
    doc="2-D skyline: orders not dominated in (minimize o_totalprice, "
        "maximize o_orderdate) — 'no cheaper-or-equal order is as "
        "recent-or-newer, with one strict'. The oracle states the NAIVE "
        "quadratic dominance anti-join; Spark runs a distributed "
        "two-level prefix scan instead, and the cross-engine hash "
        "certifies the algorithm: (1) collapse to one row per price "
        "(max date — same-price lower dates are dominated), (2) bucket "
        "prices by FIXED width (no global sort to assign buckets), "
        "(3) per-bucket max-date, then a prefix-max over the "
        "O(#buckets) table gives each bucket the best date at any "
        "strictly cheaper bucket — broadcast back, (4) an intra-bucket "
        "running max (window PARTITIONED by bucket — parallel, never "
        "single-partition) completes the strict-prefix max; a price "
        "point survives iff its date beats that max. (5) broadcast the "
        "tiny frontier back onto the scan to emit the order rows. "
        "Shuffles: one groupBy(price) + one parallel bucket window; "
        "everything cross-bucket is O(#buckets). The classic "
        "sweep-line skyline turned into a scan/prefix-combine pair — "
        "the same shape a 1000-executor cluster wants.",
    tags=("analytics", "window", "scale"),
)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    pp = o.groupBy("o_totalprice").agg(F.max("o_orderdate").alias("dmax"))
    pp = pp.withColumn(
        "bucket", F.floor(F.col("o_totalprice") / F.lit(_PARETO_BUCKET_W))
    )
    # cross-bucket prefix max: O(#buckets) rows, so the unpartitioned
    # ordered window is a non-issue at any input scale.
    bm = pp.groupBy("bucket").agg(F.max("dmax").alias("bmax"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    pref = bm.select(
        "bucket", F.max("bmax").over(wb).alias("prefix_dmax")
    )
    # intra-bucket strict-prefix max (one row per price inside a bucket,
    # so ROWS ... 1 PRECEDING is exactly 'strictly cheaper prices').
    wp = (
        Window.partitionBy("bucket")
        .orderBy("o_totalprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = (
        pp.join(F.broadcast(pref), "bucket")
        .withColumn("intra_dmax", F.max("dmax").over(wp))
        .withColumn("run_prev", F.greatest("intra_dmax", "prefix_dmax"))
    )
    frontier = cand.filter(
        F.col("run_prev").isNull() | (F.col("dmax") > F.col("run_prev"))
    ).select("o_totalprice", F.col("dmax").alias("o_orderdate"))
    return o.join(
        F.broadcast(frontier), ["o_totalprice", "o_orderdate"]
    ).select("o_orderkey", "o_totalprice", "o_orderdate")


# ---------------------------------------------------------------------------
# trailing-K EWMA: bounded-memory, order-exact on both engines
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.3
_EWMA_K = 16
_EWMA_W = [(1.0 - _EWMA_ALPHA) ** k for k in range(_EWMA_K)]


def _ewma_oracle() -> str:
    lag_cols = ",\n        ".join(
        f"lag(xc, {k}) OVER w AS x{k}" for k in range(1, _EWMA_K)
    )
    # fixed left-to-right term order — identical to the Spark expression,
    # so the float sum is bit-reproducible across engines.
    num = " + ".join(
        (f"xc * {_EWMA_W[0]!r}" if k == 0 else
         f"CASE WHEN x{k} IS NOT NULL THEN x{k} * {_EWMA_W[k]!r} "
         f"ELSE 0.0 END")
        for k in range(_EWMA_K)
    )
    den = " + ".join(
        (f"{_EWMA_W[0]!r}" if k == 0 else
         f"CASE WHEN x{k} IS NOT NULL THEN {_EWMA_W[k]!r} ELSE 0.0 END")
        for k in range(_EWMA_K)
    )
    return f"""
WITH {EVENTS_NORM},
e AS (SELECT event_id, user_id, ts,
             round(value * 100)::BIGINT AS xc FROM events_norm),
l AS (SELECT event_id, user_id, ts, xc,
        {lag_cols}
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id, ts, xc,
       round(({num}) / ({den}), 6) AS ewma_c
FROM l"""


@register(
    "events_ewma",
    _ewma_oracle(),
    doc=f"Trailing-{_EWMA_K} exponentially weighted moving average of "
        "per-user event values (cents), alpha=0.3. The textbook EWMA "
        "recurrence is a sequential scan — useless on a cluster; the "
        "trailing-K form truncates weights below 0.7^16 (<0.4% of mass) "
        "and becomes ONE window with K lag expressions: bounded memory, "
        "partition-parallel, and EXACT cross-engine because both "
        "engines evaluate the same 16-term dot product in the same "
        "left-to-right order over the same integer cents (IEEE doubles "
        "agree bit-for-bit when the operand order agrees). Weights are "
        "renormalized over the lags that exist, so the series head is "
        "an unbiased shorter average, not damped toward zero. One "
        "user_id shuffle; all 16 lags ride a single Window operator "
        "(plan test).",
    tags=("temporal", "window"),
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("xc"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for k in range(_EWMA_K):
        xk = F.col("xc") if k == 0 else F.lag("xc", k).over(w)
        wk = F.lit(_EWMA_W[k])
        t = xk * wk if k == 0 else (
            F.when(xk.isNotNull(), xk * wk).otherwise(F.lit(0.0))
        )
        d = wk if k == 0 else (
            F.when(xk.isNotNull(), wk).otherwise(F.lit(0.0))
        )
        num = t if num is None else num + t
        den = d if den is None else den + d
    return ev.select(
        "event_id", "user_id", "ts", "xc",
        F.round(num / den, 6).alias("ewma_c"),
    )


# ---------------------------------------------------------------------------
# autocorrelation of the hourly event-count series, lags 1..6
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 6

_ACF_SQL = f"""
WITH {EVENTS_NORM},
h AS (SELECT epoch(date_trunc('hour', ts))::BIGINT AS hs,
             count(*)::BIGINT AS c
      FROM events_norm GROUP BY 1),
lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
p AS (SELECT g.lag, a.c AS x, b.c AS y
      FROM lags g
      JOIN h a ON true
      JOIN h b ON b.hs = a.hs + g.lag * 3600),
s AS (SELECT lag, count(*)::BIGINT AS n,
             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * y)::BIGINT AS sxy,
             sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
      FROM p GROUP BY 1)
SELECT lag, n AS n_pairs,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN round((n * sxy - sx * sy)
                       / (sqrt((n * sxx - sx * sx)::DOUBLE)
                          * sqrt((n * syy - sy * sy)::DOUBLE)), 6)
            ELSE NULL END AS r
FROM s"""


@register(
    "events_acf",
    _ACF_SQL,
    doc=f"Autocorrelation function of the hourly event-count series at "
        f"lags 1..{_ACF_MAX_LAG} (matched-pairs Pearson on an irregular "
        "grid: a pair exists only when both hours have events — no "
        "imputation). The seasonality probe a forecasting pipeline runs "
        "first. DATAFLOW: the fact table contributes exactly ONE "
        "time-bucket partial-agg shuffle; the series is O(#hours) rows "
        "from then on, so the lag self-join and per-lag reduction are "
        "broadcast-sized at any corpus scale. EXACTNESS: sufficient "
        "statistics (n, Sx, Sy, Sxy, Sxx, Syy) are BIGINT — the only "
        "float math is one Pearson expression per lag row, guarded "
        "against zero variance on both engines. (At per-hour counts "
        "beyond ~1e9 the BIGINT squares need DECIMAL(38) — noted, not "
        "hit, here.)",
    tags=("temporal", "agg", "analytics"),
)
def events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    h = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.unix_timestamp("hr").alias("hs"), "c")
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a = h.alias("a").crossJoin(F.broadcast(lags))
    b = h.select(
        F.col("hs").alias("bhs"), F.col("c").alias("y")
    )
    p = a.join(
        F.broadcast(b),
        F.col("bhs") == F.col("hs") + F.col("lag") * F.lit(3600),
    ).select("lag", F.col("c").alias("x"), "y")
    s = p.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    r = F.when(
        (vx > 0) & (vy > 0),
        F.round(
            cov / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
            6,
        ),
    )
    return s.select("lag", F.col("n").alias("n_pairs"), r.alias("r"))


# ---------------------------------------------------------------------------
# PSI drift monitor: per-source doc-length distribution vs corpus baseline
# ---------------------------------------------------------------------------

_PSI_BINS = 6  # fixed edges [0,100), [100,200), ... [500,inf)

_PSI_SQL = f"""
WITH d AS (SELECT source,
                  least((n_chars // 100)::BIGINT, {_PSI_BINS - 1}) AS bin
           FROM documents),
grid AS (SELECT s.source, b.bin
         FROM (SELECT DISTINCT source FROM d) s,
              (SELECT unnest(generate_series(0, {_PSI_BINS - 1})) AS bin) b),
sb AS (SELECT source, bin, count(*)::BIGINT AS cnt FROM d GROUP BY 1, 2),
g AS (SELECT grid.source, grid.bin, coalesce(sb.cnt, 0) AS cnt
      FROM grid LEFT JOIN sb USING (source, bin)),
tot AS (SELECT source, sum(cnt)::BIGINT AS n_src FROM g GROUP BY 1),
base AS (SELECT bin, sum(cnt)::BIGINT AS bcnt FROM g GROUP BY 1),
n AS (SELECT sum(cnt)::BIGINT AS total FROM g),
t AS (SELECT g.source, g.bin,
             (g.cnt + 0.5) / (tot.n_src + {0.5 * _PSI_BINS}) AS p,
             (base.bcnt + 0.5) / (n.total + {0.5 * _PSI_BINS}) AS q
      FROM g JOIN tot USING (source) JOIN base USING (bin), n)
SELECT source,
       min(n_src)::BIGINT AS n_docs,
       sum(floor((p - q) * ln(p / q) * 1000000 + 0.5)::BIGINT)::BIGINT
         AS psi6
FROM t JOIN tot USING (source)
GROUP BY source"""


@register(
    "dq_psi_drift",
    _PSI_SQL,
    doc="Population stability index of each source's doc-length "
        "distribution against the whole-corpus baseline — the standard "
        "drift monitor (PSI < 0.1 stable, > 0.25 drifted) a data-quality "
        "gate runs per ingest slice. Fixed 100-char bin grid (top bin "
        "open), Laplace 0.5 smoothing on a DENSIFIED source x bin grid "
        "so empty bins contribute their penalty instead of vanishing "
        "from the group-by. EXACTNESS: each (source,bin) term "
        "(p-q)*ln(p/q) >= 0 is computed once from integer counts and "
        "immediately fixed-pointed to micro-units (floor(x*1e6+0.5) — "
        "identical semantics both engines); the per-source result is a "
        "BIGINT sum, so aggregation ORDER cannot move the hash (the "
        "float-sum-order trap that breaks naive cross-engine PSI). "
        "DATAFLOW: one (source,bin) partial-agg shuffle over the "
        "corpus; the grid densify, baseline, and PSI all run on the "
        "O(#sources x bins) table via broadcast joins.",
    tags=("dq", "llm", "profile"),
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.least(
            F.floor(F.col("n_chars") / 100), F.lit(_PSI_BINS - 1).cast("long")
        ).alias("bin"),
    )
    sb = d.groupBy("source", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    sb = sb.localCheckpoint(eager=False)  # feeds grid + totals + baseline
    bins = spark.range(_PSI_BINS).select(F.col("id").alias("bin"))
    grid = sb.select("source").distinct().crossJoin(F.broadcast(bins))
    g = grid.join(sb, ["source", "bin"], "left").select(
        "source", "bin", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    tot = g.groupBy("source").agg(F.sum("cnt").alias("n_src"))
    base = g.groupBy("bin").agg(F.sum("cnt").alias("bcnt"))
    n = g.agg(F.sum("cnt").alias("total"))
    sm = F.lit(0.5 * _PSI_BINS)
    t = (
        g.join(F.broadcast(tot), "source")
        .join(F.broadcast(base), "bin")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "n_src",
            ((F.col("cnt") + 0.5) / (F.col("n_src") + sm)).alias("p"),
            ((F.col("bcnt") + 0.5) / (F.col("total") + sm)).alias("q"),
        )
    )
    term6 = F.floor(
        (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    return t.groupBy("source").agg(
        F.min("n_src").cast("long").alias("n_docs"),
        F.sum(term6).cast("long").alias("psi6"),
    )
