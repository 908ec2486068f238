"""Round-8 session-2 catalog, part 2: sampling, classification, and
collocation shapes for the training-data pipeline.

* ``llm_weighted_sample`` — weighted sampling WITHOUT replacement via
  the Efraimidis–Spirakis exponential-key trick: key = -ln(u)/w with u
  a deterministic hash-uniform per doc; the K smallest keys are a
  correct weighted sample, and "global top-K by key" is a
  TakeOrderedAndProject — no global sort, no sequential pass, no
  rejection loop. The distributed form of the most common curation ask:
  "sample 10M docs proportional to quality weight, reproducibly".
* ``llm_naive_bayes_train`` — multinomial naive-Bayes trainer over
  (lang, token) counts: the supervised counterpart to the n-gram LM
  entries; ONE corpus-sized (lang, token) shuffle trains the whole
  model, everything after runs on the vocabulary-sized table.
* ``llm_naive_bayes_score`` — applies the trained model back to every
  document and emits the argmax class. Log-probabilities are
  fixed-pointed to micro-nats BEFORE the per-doc sum, so the score is a
  BIGINT dot product — aggregation order cannot move the hash, and the
  argmax tie-break is total. The model is top-M-capped per class (the
  same broadcast-model discipline as the trigram LM) with a principled
  OOV bucket.
* ``llm_pmi_collocations`` — pointwise mutual information over adjacent
  word pairs (collocation mining): reuses the zip_with shingle kernel
  for bigrams; marginals come from the BIGRAM table itself (group by
  first/second slot), so the corpus is scanned once. PMI is computed as
  ln(c)+ln(N)-ln(cx)-ln(cy) — no BIGINT product overflow at any scale —
  and fixed-pointed per row (no cross-row float sums at all).
* ``events_seasonal_profile`` — hour-of-day seasonal profile per event
  type (mean value + traffic share): the one-shuffle seasonal baseline
  that events_acf's correlogram motivates and anomaly monitors
  (events_anomaly_zscore / events_cusum_alarm) subtract.

Reference parity note: the reference ETL (helium-arango-etl-lite) has
none of these; they extend the north-star LLM-curation families
(SURVEY.md section 2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash32, hash32_oracle_sql
from ..operators.llm.dedup import word_shingles_all
from .registry import EVENTS_NORM, load_events, load_table, register

# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis A-Res keys)
# ---------------------------------------------------------------------------

_WS_K = 50
_WS_RES = 1_000_000  # hash-uniform resolution; u in (0, 1]

_WS_SQL = f"""
WITH k AS (
  SELECT doc_id, source, n_chars,
         -ln((({hash32_oracle_sql("doc_id::VARCHAR || ':ws'")} % {_WS_RES})
              + 1) / {_WS_RES}.0) / n_chars AS key
  FROM documents),
i AS (SELECT doc_id, source, n_chars,
             floor(key * 1000000 + 0.5)::BIGINT AS key6
      FROM k)
SELECT doc_id, source, n_chars, key6
FROM i ORDER BY key6, doc_id LIMIT {_WS_K}"""


@register(
    "llm_weighted_sample",
    _WS_SQL,
    doc=f"Weighted sampling without replacement, k={_WS_K}, weight = "
        "n_chars: Efraimidis–Spirakis exponential keys — draw "
        "key_i = -ln(u_i)/w_i and keep the k SMALLEST; the result is "
        "distributed exactly as sequential weighted draws without "
        "replacement. u_i is the doc-key hash mapped to (0, 1] "
        "(llm_sample_hash's engine-portable uniform, never 0 so ln is "
        "finite), so the sample is reproducible across runs, engines, "
        "and cluster sizes. PLAN: map-only key computation + global "
        "top-k = TakeOrderedAndProject (plan test) — each partition "
        "keeps k candidates and the driver merges, the same shape as "
        "topk_accounts; nothing here is sequential, which is the whole "
        "point vs the textbook one-pass reservoir. The selection key is "
        "FIXED-POINTED to micro-units BEFORE the order-by/limit so the "
        "rank-k boundary compares integers, not doubles. Caveat kept "
        "honest: key6 still quantizes a double computed via log(), so "
        "a 1-ulp JVM-vs-libm difference landing EXACTLY on a .5 "
        "quantization boundary could in principle still flip key6 by "
        "one — boundary flips are made vanishingly unlikely (~1e-10 "
        "per row), not impossible; a fully engine-proof key would use "
        "pure integer hash arithmetic at the cost of the E-S "
        "exponential-key distribution.",
    tags=("llm", "sampling", "scale"),
)
def llm_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = (
        (hash32(F.concat(F.col("doc_id").cast("string"), F.lit(":ws")))
         % _WS_RES) + 1
    ) / F.lit(float(_WS_RES))
    key = -F.log(u) / F.col("n_chars")
    key6 = F.floor(key * 1_000_000 + F.lit(0.5)).cast("long")
    return (
        d.select("doc_id", "source", "n_chars", key6.alias("key6"))
        .orderBy("key6", "doc_id")
        .limit(_WS_K)
    )


# ---------------------------------------------------------------------------
# multinomial naive Bayes: train on (lang, token) counts
# ---------------------------------------------------------------------------

_NB_ALPHA = 0.5   # Laplace smoothing
_NB_TOPK = 20     # rows reported per class by the train entry
_NB_TOPM = 10_000  # model vocabulary cap per class for the scorer (the
# broadcast-model dial: not binding on the test corpus, bounds the
# broadcast at 100 TB exactly like the trigram LM's top-M table)

# shared training CTEs: per-(lang,token) counts, per-lang totals, vocab
_NB_BASE = f"""
tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token
        FROM documents),
cnt AS (SELECT lang, token, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
ct AS (SELECT lang, sum(c)::BIGINT AS total FROM cnt GROUP BY 1),
v AS (SELECT count(DISTINCT token)::BIGINT AS vocab FROM cnt)"""

_NB_TRAIN_SQL = f"""
WITH {_NB_BASE},
r AS (SELECT cnt.lang, cnt.token, cnt.c,
             ln((cnt.c + {_NB_ALPHA})
                / (ct.total + {_NB_ALPHA} * v.vocab)) AS logp,
             row_number() OVER (PARTITION BY cnt.lang
                                ORDER BY cnt.c DESC, cnt.token) AS rk
      FROM cnt JOIN ct USING (lang), v)
SELECT lang, token, c, round(logp, 6) AS logp
FROM r WHERE rk <= {_NB_TOPK}"""


@register(
    "llm_naive_bayes_train",
    _NB_TRAIN_SQL,
    doc=f"Multinomial naive-Bayes trainer (classes = lang, features = "
        f"tokens, Laplace alpha={_NB_ALPHA}): emits each class's top-"
        f"{_NB_TOPK} tokens with smoothed log P(token|class). The "
        "supervised sibling of llm_ngram_lm_score. DATAFLOW: the corpus "
        "contributes exactly ONE (lang, token) partial-agg shuffle "
        "(map-side combine collapses repeats); class totals, the vocab "
        "size, and the per-class rank window all run on the vocabulary-"
        "sized count table — the window partitions by lang, never a "
        "single global sort. All smoothing inputs are integers; the one "
        "float op (ln) happens per surviving row and is rounded 6 dp.",
    tags=("llm", "text", "train"),
)
def llm_naive_bayes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("token"))
    cnt = tok.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    cnt = cnt.localCheckpoint(eager=False)  # feeds totals + vocab + rank
    ct = cnt.groupBy("lang").agg(F.sum("c").alias("total"))
    v = cnt.agg(F.countDistinct("token").alias("vocab"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("token"))
    r = (
        cnt.join(F.broadcast(ct), "lang")
        .crossJoin(F.broadcast(v))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _NB_TOPK)
    )
    logp = F.log(
        (F.col("c") + _NB_ALPHA)
        / (F.col("total") + _NB_ALPHA * F.col("vocab"))
    )
    return r.select(
        "lang", "token", "c", F.round(logp, 6).alias("logp")
    )


# ---------------------------------------------------------------------------
# naive Bayes scorer: argmax class per document, integer-exact
# ---------------------------------------------------------------------------

# fixed-point micro-nats: floor(x*1e6 + 0.5) — identical on both engines,
# and the per-doc score becomes a BIGINT dot product (order-free).
_FP6 = "floor({x} * 1000000 + 0.5)::BIGINT"

# Everything up to the per-(doc, class) ranked score table — shared by
# the argmax scorer below and round-10h's margin-uncertainty sampler.
_NB_FINAL_CTES = f"""
WITH {_NB_BASE},
model AS (SELECT lang, token,
                 {_FP6.format(x=f"ln((c + {_NB_ALPHA}) / (total + {_NB_ALPHA} * vocab))")}
                   AS logp6
          FROM (SELECT cnt.*, ct.total, v.vocab,
                       row_number() OVER (PARTITION BY cnt.lang
                           ORDER BY cnt.c DESC, cnt.token) AS rk
                FROM cnt JOIN ct USING (lang), v)
          WHERE rk <= {_NB_TOPM}),
oov AS (SELECT ct.lang,
               {_FP6.format(x=f"ln({_NB_ALPHA} / (ct.total + {_NB_ALPHA} * v.vocab))")}
                 AS oov6
        FROM ct, v),
prior AS (SELECT lang,
                 {_FP6.format(x="ln(count(*) / (SELECT count(*)::DOUBLE FROM documents))")}
                   AS prior6
          FROM documents GROUP BY 1),
dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
       FROM documents),
dtc AS (SELECT doc_id, token, count(*)::BIGINT AS k FROM dt GROUP BY 1, 2),
scored AS (SELECT dtc.doc_id, oov.lang,
                  sum(dtc.k * coalesce(model.logp6, oov.oov6))::BIGINT AS like6
           FROM dtc
           CROSS JOIN oov
           LEFT JOIN model ON model.lang = oov.lang
                          AND model.token = dtc.token
           GROUP BY 1, 2),
final AS (SELECT scored.doc_id, scored.lang,
                 (scored.like6 + prior.prior6)::BIGINT AS score6,
                 row_number() OVER (PARTITION BY scored.doc_id
                     ORDER BY (scored.like6 + prior.prior6) DESC,
                              scored.lang) AS rk
          FROM scored JOIN prior USING (lang))"""

_NB_SCORE_SQL = f"""{_NB_FINAL_CTES}
SELECT f.doc_id, f.lang AS pred_lang, f.score6,
       d.lang AS true_lang,
       (f.lang = d.lang) AS correct
FROM final f JOIN documents d USING (doc_id)
WHERE f.rk = 1"""


@register(
    "llm_naive_bayes_score",
    _NB_SCORE_SQL,
    doc="Applies the naive-Bayes model back to every document: per-doc "
        "argmax over classes of prior + sum(count * logP(token|class)), "
        "reporting predicted vs true lang. EXACTNESS: every log-prob is "
        "fixed-pointed to micro-nat BIGINTs at the model table, so the "
        "per-(doc,class) likelihood is an INTEGER dot product — no "
        "float-summation-order hazard — and the argmax tie-breaks on "
        "class name. SCALE: the model is top-M-capped per class "
        f"(M={_NB_TOPM}, the trigram-LM broadcast discipline) with a "
        "single OOV bucket per class for everything the cap drops, so "
        "the scoring join is a BROADCAST hash join against a bounded "
        "table; the corpus is EXPLODED ONCE — the per-doc token counts "
        "feed the scorer directly and re-aggregate into the per-class "
        "model (summing doc-level counts == counting occurrences), so "
        "the only corpus-sized shuffle is the (doc,token) collapse — "
        "and the x|classes| expansion happens AFTER it. The composed "
        "train->predict->evaluate loop in one plan.",
    tags=("llm", "text", "train", "scale"),
)
def llm_naive_bayes_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    final = _nb_class_scores(spark, sf_dir).filter(F.col("rk") == 1)
    return final.join(
        d.select("doc_id", F.col("lang").alias("true_lang")), "doc_id"
    ).select(
        "doc_id",
        F.col("lang").alias("pred_lang"),
        "score6",
        "true_lang",
        (F.col("lang") == F.col("true_lang")).alias("correct"),
    )


def _nb_class_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, class) fixed-point NB scores ranked per doc (rk 1 =
    argmax) — the shared core of the argmax scorer above and the
    margin-uncertainty sampler (catalog_round10h)."""
    d = load_table(spark, sf_dir, "documents")
    # ONE corpus explode feeds BOTH sides: the per-doc token counts the
    # scorer consumes AND (re-aggregated — summing doc-level counts is
    # the same as counting occurrences) the per-class model counts. The
    # first version exploded the corpus twice (lang-keyed and
    # doc-keyed); at 100 TB that is a second full tokenize pass for a
    # table derivable from the first.
    dtc = (
        d.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
        )
        .groupBy("doc_id", "lang", "token")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    dtc = dtc.localCheckpoint(eager=False)  # feeds model + scoring
    cnt = dtc.groupBy("lang", "token").agg(F.sum("k").alias("c"))
    cnt = cnt.localCheckpoint(eager=False)
    ct = cnt.groupBy("lang").agg(F.sum("c").alias("total"))
    ct = ct.localCheckpoint(eager=False)  # feeds model + OOV table
    v = cnt.agg(F.countDistinct("token").alias("vocab"))
    v = v.localCheckpoint(eager=False)

    def fp6(x):
        return F.floor(x * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")

    wm = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("token"))
    model = (
        cnt.join(F.broadcast(ct), "lang")
        .crossJoin(F.broadcast(v))
        .withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") <= _NB_TOPM)
        .select(
            "lang",
            "token",
            fp6(
                F.log(
                    (F.col("c") + _NB_ALPHA)
                    / (F.col("total") + _NB_ALPHA * F.col("vocab"))
                )
            ).alias("logp6"),
        )
    )
    oov = ct.crossJoin(F.broadcast(v)).select(
        "lang",
        fp6(
            F.log(
                F.lit(_NB_ALPHA)
                / (F.col("total") + _NB_ALPHA * F.col("vocab"))
            )
        ).alias("oov6"),
    )
    ndocs = d.agg(F.count(F.lit(1)).alias("n_total"))
    prior = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "lang",
            fp6(
                F.log(F.col("n_docs") / F.col("n_total").cast("double"))
            ).alias("prior6"),
        )
    )
    scored = (
        dtc.drop("lang")
        .crossJoin(F.broadcast(oov))
        .join(F.broadcast(model), ["lang", "token"], "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.col("k") * F.coalesce(F.col("logp6"), F.col("oov6"))
            ).alias("like6")
        )
    )
    wd = Window.partitionBy("doc_id").orderBy(
        F.desc("score6"), F.asc("lang")
    )
    return (
        scored.join(F.broadcast(prior), "lang")
        .withColumn(
            "score6", (F.col("like6") + F.col("prior6")).cast("long")
        )
        .withColumn("rk", F.row_number().over(wd))
    )


# ---------------------------------------------------------------------------
# PMI collocations over adjacent word pairs
# ---------------------------------------------------------------------------

_PMI_MIN = 5  # minimum pair count — the O(V^2) output bound

_PMI_SQL = f"""
WITH tok AS (SELECT string_split(text, ' ') AS a FROM documents),
bg AS (SELECT unnest(CASE WHEN len(a) >= 2
              THEN list_transform(generate_series(1, len(a) - 1),
                                  i -> a[i] || ' ' || a[i + 1])
              ELSE []::VARCHAR[] END) AS b
       FROM tok),
bc AS (SELECT b, count(*)::BIGINT AS cb FROM bg GROUP BY 1),
n AS (SELECT sum(cb)::BIGINT AS total FROM bc),
lx AS (SELECT string_split(b, ' ')[1] AS w1, sum(cb)::BIGINT AS cx
       FROM bc GROUP BY 1),
ry AS (SELECT string_split(b, ' ')[2] AS w2, sum(cb)::BIGINT AS cy
       FROM bc GROUP BY 1)
SELECT string_split(bc.b, ' ')[1] AS w1,
       string_split(bc.b, ' ')[2] AS w2,
       bc.cb,
       floor((ln(bc.cb::DOUBLE) + ln(n.total::DOUBLE)
              - ln(lx.cx::DOUBLE) - ln(ry.cy::DOUBLE)) * 1000000
             + 0.5)::BIGINT AS pmi6
FROM bc
JOIN lx ON string_split(bc.b, ' ')[1] = lx.w1
JOIN ry ON string_split(bc.b, ' ')[2] = ry.w2, n
WHERE bc.cb >= {_PMI_MIN}"""


@register(
    "llm_pmi_collocations",
    _PMI_SQL,
    doc=f"Collocation mining: pointwise mutual information of adjacent "
        "word pairs, PMI = ln(P(xy)/(P(x)P(y))) over the bigram "
        "distribution, reported for every pair seen >= "
        f"{_PMI_MIN} times (the min-count filter is the O(V^2) output "
        "bound). The phrase detector tokenizer pipelines run before "
        "merging multi-word units. DATAFLOW: bigrams come from the "
        "27x zip_with shingle kernel; marginals are GROUP-BYs of the "
        "BIGRAM COUNT table on its first/second slot — the corpus is "
        "scanned and shuffled exactly once, and both marginal tables "
        "are vocabulary-sized broadcasts. EXACTNESS: PMI is computed "
        "as ln(c)+ln(N)-ln(cx)-ln(cy) (no cb*N BIGINT overflow at any "
        "corpus size) from integer counts, fixed-pointed per row — "
        "there is no cross-row float aggregation anywhere.",
    tags=("llm", "text", "analytics"),
)
def llm_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bg = d.select(
        F.explode(word_shingles_all(F.col("text"), 2)).alias("b")
    )
    bc = bg.groupBy("b").agg(F.count(F.lit(1)).alias("cb"))
    bc = bc.withColumn("w1", F.split("b", " ")[0]).withColumn(
        "w2", F.split("b", " ")[1]
    )
    bc = bc.localCheckpoint(eager=False)  # feeds N + both marginals
    n = bc.agg(F.sum("cb").alias("total"))
    lx = bc.groupBy("w1").agg(F.sum("cb").alias("cx"))
    ry = bc.groupBy("w2").agg(F.sum("cb").alias("cy"))
    pmi = (
        F.log(F.col("cb").cast("double"))
        + F.log(F.col("total").cast("double"))
        - F.log(F.col("cx").cast("double"))
        - F.log(F.col("cy").cast("double"))
    )
    return (
        bc.filter(F.col("cb") >= _PMI_MIN)
        .join(F.broadcast(lx), "w1")
        .join(F.broadcast(ry), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "cb",
            F.floor(pmi * F.lit(1_000_000.0) + F.lit(0.5))
            .cast("long")
            .alias("pmi6"),
        )
    )


# ---------------------------------------------------------------------------
# hour-of-day seasonal profile per event type
# ---------------------------------------------------------------------------

_SEASON_SQL = f"""
WITH {EVENTS_NORM},
e AS (SELECT event_type, extract(hour FROM ts)::BIGINT AS hod,
             round(value * 100)::BIGINT AS xc
      FROM events_norm),
a AS (SELECT event_type, hod, count(*)::BIGINT AS n,
             sum(xc)::BIGINT AS sum_c
      FROM e GROUP BY 1, 2)
SELECT event_type, hod, n,
       round(sum_c / (n * 100.0), 6) AS mean_value,
       round(n / sum(n) OVER (PARTITION BY event_type)::DOUBLE, 6)
         AS share
FROM a"""


@register(
    "events_seasonal_profile",
    _SEASON_SQL,
    doc="Hour-of-day seasonal profile per event type: mean value and "
        "traffic share for each (type, hour) cell — the baseline table "
        "a seasonality-aware monitor subtracts before flagging "
        "anomalies (events_anomaly_zscore flags against a FLAT mean; "
        "at 3am that misfires on any diurnal metric), and the direct "
        "consumer of the correlation structure events_acf measures. "
        "ONE (type, hour) partial-agg shuffle over the fact table; the "
        "share window runs over the 5x24-row aggregate, partitioned by "
        "type. Mean is BIGINT cents / BIGINT count — one float "
        "division, rounded 6 dp, no float accumulation.",
    tags=("temporal", "agg", "profile"),
)
def events_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    e = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("hod"),
        F.round(F.col("value") * 100).cast("long").alias("xc"),
    )
    a = e.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n"), F.sum("xc").alias("sum_c")
    )
    w = Window.partitionBy("event_type")
    return a.select(
        "event_type",
        "hod",
        "n",
        F.round(F.col("sum_c") / (F.col("n") * 100.0), 6).alias(
            "mean_value"
        ),
        F.round(
            F.col("n") / F.sum("n").over(w).cast("double"), 6
        ).alias("share"),
    )
