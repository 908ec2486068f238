"""Round-7 catalog: real multimodal decode and top-2 spectral directions.

* ``llm_multimodal_decode_ppm`` / ``llm_multimodal_decode_wav`` — the
  multimodal decode interior made REAL (verdict round-6 task 4): a pure
  binary PPM (P6) image parser and a RIFF/WAVE PCM audio parser run
  inside the existing ``mapInPandas`` plumbing, over container files
  built deterministically from the documents table, with integer-exact
  stats the DuckDB oracle reproduces byte-for-byte from the text.
* ``llm_power_iteration_2`` — top TWO principal directions via power
  iteration + one rank-1 deflation (verdict round-6 stretch task 8):
  drift monitoring sees a plane, not a line; same O(dim) driver-state
  contract as ``llm_power_iteration``.

Reference parity note: the reference ETL (helium-arango-etl-lite) has no
multimodal or spectral analytics — north-star training-data operators,
same family as plans/catalog_llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.llm import multimodal as mm
from .catalog_round6 import _round_half_up
from .registry import EVENTS_NORM, load_events, load_table, register

# ---------------------------------------------------------------------------
# real PPM decode
# ---------------------------------------------------------------------------

_PPM_SQL = f"""
WITH d AS (SELECT doc_id, text,
                  least({mm.PPM_MAX_H}, length(text) // {3 * mm.PPM_WIDTH}) AS h
           FROM documents WHERE length(text) >= {3 * mm.PPM_WIDTH}),
b AS (SELECT doc_id, h, i, ord(substr(text, i, 1)) AS v
      FROM (SELECT doc_id, text, h,
                   unnest(generate_series(1, {3 * mm.PPM_WIDTH} * h)) AS i
            FROM d))
SELECT doc_id AS media_id,
       {mm.PPM_WIDTH}::BIGINT AS width,
       h::BIGINT AS height,
       255::BIGINT AS maxval,
       ({mm.PPM_WIDTH} * h)::BIGINT AS n_pixels,
       sum(CASE WHEN (i - 1) % 3 = 0 THEN v END)::BIGINT AS sum_r,
       sum(CASE WHEN (i - 1) % 3 = 1 THEN v END)::BIGINT AS sum_g,
       sum(CASE WHEN (i - 1) % 3 = 2 THEN v END)::BIGINT AS sum_b,
       min(v)::BIGINT AS min_byte,
       max(v)::BIGINT AS max_byte
FROM b GROUP BY doc_id, h"""


@register(
    "llm_multimodal_decode_ppm",
    _PPM_SQL,
    doc="REAL image decode inside the multimodal plumbing (no codec "
        "library): each document's text bytes become a genuine binary "
        "PPM P6 file (ASCII header + raw RGB raster, built JVM-side), "
        "and parse_ppm inside mapInPandas parses the actual container — "
        "magic, whitespace/comment-tolerant header, raster offset — then "
        "reduces the pixel array to integer-exact per-channel sums. The "
        "oracle reproduces every stat from the text with ord(), so a "
        "parser that misreads the header by one byte mismatches "
        "immediately. Scale shape: map-only Arrow batches, no shuffle; "
        "at real image sizes the per-image numpy reduction dominates "
        "the per-row header parse, the same cost profile as a production "
        "decode stage (operators/llm/multimodal.py; compressed codecs "
        "still raise NotImplementedError honestly).",
    tags=("llm", "multimodal"),
)
def llm_multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.decode_ppm(mm.encode_ppm_from_text(docs))


# ---------------------------------------------------------------------------
# real WAV decode
# ---------------------------------------------------------------------------

_WAV_SQL = f"""
WITH d AS (SELECT doc_id, text,
                  least({mm.WAV_MAX_SAMPLES}, length(text)) AS n
           FROM documents),
s AS (SELECT doc_id, n, ord(substr(text, i, 1)) AS v
      FROM (SELECT doc_id, text, n, unnest(generate_series(1, n)) AS i
            FROM d))
SELECT doc_id AS media_id,
       {mm.WAV_RATE}::BIGINT AS sample_rate,
       1::BIGINT AS n_channels,
       8::BIGINT AS bits,
       n::BIGINT AS n_samples,
       sum(v)::BIGINT AS sum_amp,
       max(v)::BIGINT AS peak_amp,
       min(v)::BIGINT AS min_amp
FROM s GROUP BY doc_id, n"""


@register(
    "llm_multimodal_decode_wav",
    _WAV_SQL,
    doc="REAL audio decode inside the multimodal plumbing: each "
        "document's text bytes become a genuine RIFF/WAVE 8-bit-PCM "
        "file (44-byte header built JVM-side), and parse_wav inside "
        "mapInPandas walks the actual chunk list — RIFF magic, "
        "word-aligned fmt/data chunks, little-endian fields — then "
        "reduces the PCM samples to integer-exact amplitude stats. "
        "sample_rate/channels/bits come from the PARSED header while "
        "the oracle pins them as literals, so any offset error in the "
        "chunk walk mismatches. Map-only Arrow batches, no shuffle "
        "(operators/llm/multimodal.py:parse_wav).",
    tags=("llm", "multimodal"),
)
def llm_multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.decode_wav(mm.encode_wav_from_text(docs))


# ---------------------------------------------------------------------------
# top-2 spectral directions: power iteration + rank-1 deflation
# ---------------------------------------------------------------------------

_PI_DP = 6

_POWER2_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
comp AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS dim,
                unnest(v) AS x
         FROM e),
s1 AS (SELECT vec_id, round(sum(x), {_PI_DP}) AS s FROM comp GROUP BY 1),
u1 AS (SELECT dim, round(sum(s1.s * comp.x), {_PI_DP}) AS u
       FROM comp JOIN s1 USING (vec_id) GROUP BY dim),
n1 AS (SELECT sqrt(sum(u * u)) AS nrm FROM u1),
v1 AS (SELECT dim, round(u / nrm, {_PI_DP}) AS vd FROM u1, n1),
s2 AS (SELECT vec_id, round(sum(comp.x * v1.vd), {_PI_DP}) AS s
       FROM comp JOIN v1 USING (dim) GROUP BY vec_id),
u2 AS (SELECT dim, round(sum(s2.s * comp.x), {_PI_DP}) AS u
       FROM comp JOIN s2 USING (vec_id) GROUP BY dim),
n2 AS (SELECT sqrt(sum(u * u)) AS nrm FROM u2),
vf AS (SELECT dim, round(u / nrm, {_PI_DP}) AS vd FROM u2, n2),
proj AS (SELECT vec_id, round(sum(comp.x * vf.vd), {_PI_DP}) AS p
         FROM comp JOIN vf USING (dim) GROUP BY vec_id),
comp2 AS (SELECT comp.vec_id, comp.dim,
                 round(comp.x - proj.p * vf.vd, {_PI_DP}) AS x
          FROM comp JOIN proj USING (vec_id) JOIN vf USING (dim)),
s1b AS (SELECT vec_id, round(sum(x), {_PI_DP}) AS s FROM comp2 GROUP BY 1),
u1b AS (SELECT dim, round(sum(s1b.s * comp2.x), {_PI_DP}) AS u
        FROM comp2 JOIN s1b USING (vec_id) GROUP BY dim),
n1b AS (SELECT sqrt(sum(u * u)) AS nrm FROM u1b),
v1b AS (SELECT dim, round(u / nrm, {_PI_DP}) AS vd FROM u1b, n1b),
s2b AS (SELECT vec_id, round(sum(comp2.x * v1b.vd), {_PI_DP}) AS s
        FROM comp2 JOIN v1b USING (dim) GROUP BY vec_id),
u2b AS (SELECT dim, round(sum(s2b.s * comp2.x), {_PI_DP}) AS u
        FROM comp2 JOIN s2b USING (vec_id) GROUP BY dim),
n2b AS (SELECT sqrt(sum(u * u)) AS nrm FROM u2b)
SELECT 1::BIGINT AS component, dim::BIGINT AS dim,
       round(u / nrm, {_PI_DP}) AS loading
FROM u2, n2
UNION ALL
SELECT 2::BIGINT, dim::BIGINT, round(u / nrm, {_PI_DP})
FROM u2b, n2b"""


def _pi_two_steps(comp: DataFrame) -> list[tuple[int, float]]:
    """Two distributed power-iteration steps over (vec_id, dim, x) rows
    starting from the all-ones vector; returns the normalised direction
    as [(dim, loading)]. Every data-sized stage is a partial-agg'd
    shuffle rounded at 6dp (cross-engine determinism); driver state is
    O(dim) and summed in sorted-dim order."""
    spark = comp.sparkSession
    s = comp.groupBy("vec_id").agg(F.round(F.sum("x"), _PI_DP).alias("s"))
    u = (
        comp.join(s, "vec_id")
        .groupBy("dim")
        .agg(F.round(F.sum(F.col("s") * F.col("x")), _PI_DP).alias("u"))
    )
    rows = sorted(u.collect(), key=lambda r: r["dim"])
    nrm = float(sum(r["u"] * r["u"] for r in rows)) ** 0.5
    vd = [(int(r["dim"]), _round_half_up(r["u"] / nrm, _PI_DP)) for r in rows]
    v_df = spark.createDataFrame(vd, "dim long, vd double")
    s = (
        comp.join(F.broadcast(v_df), "dim")
        .groupBy("vec_id")
        .agg(F.round(F.sum(F.col("x") * F.col("vd")), _PI_DP).alias("s"))
    )
    u = (
        comp.join(s, "vec_id")
        .groupBy("dim")
        .agg(F.round(F.sum(F.col("s") * F.col("x")), _PI_DP).alias("u"))
    )
    rows = sorted(u.collect(), key=lambda r: r["dim"])
    nrm = float(sum(r["u"] * r["u"] for r in rows)) ** 0.5
    return [(int(r["dim"]), _round_half_up(r["u"] / nrm, _PI_DP)) for r in rows]


@register(
    "llm_power_iteration_2",
    _POWER2_SQL,
    doc="Top TWO principal directions of the embedding cloud: the same "
        "2-step distributed power iteration as llm_power_iteration, "
        "then ONE rank-1 deflation (x' = x - <x, v1> v1 — a vec-keyed "
        "projection shuffle plus a broadcast of the O(dim) direction) "
        "and a second 2-step iteration on the deflated components. "
        "Drift monitoring over a PLANE catches rotations within the "
        "dominant subspace that the single-direction entry is blind "
        "to. Same scale contract: A^T A never materialises, driver "
        "state is 2 x dim doubles (sorted-dim deterministic sums), "
        "every data-sized stage is a linear partial-agg'd scan, and "
        "all intermediates round at 6dp on both engines (same residual "
        "tie caveat as llm_power_iteration).",
    tags=("llm", "similarity", "iterative"),
)
def llm_power_iteration_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.llm.similarity import _as_double

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    comp = e.select(
        "vec_id", F.posexplode("v").alias("pos", "x")
    ).select("vec_id", (F.col("pos") + 1).cast("long").alias("dim"), "x")
    comp = comp.localCheckpoint(eager=False)  # consumed by both components

    l1 = _pi_two_steps(comp)
    v1_df = spark.createDataFrame(l1, "dim long, vd double")
    proj = (
        comp.join(F.broadcast(v1_df), "dim")
        .groupBy("vec_id")
        .agg(F.round(F.sum(F.col("x") * F.col("vd")), _PI_DP).alias("p"))
    )
    comp2 = (
        comp.join(proj, "vec_id")
        .join(F.broadcast(v1_df), "dim")
        .select(
            "vec_id", "dim",
            F.round(F.col("x") - F.col("p") * F.col("vd"), _PI_DP).alias("x"),
        )
        .localCheckpoint(eager=False)  # consumed twice per iteration
    )
    l2 = _pi_two_steps(comp2)
    out = [(1, d, v) for d, v in l1] + [(2, d, v) for d, v in l2]
    return spark.createDataFrame(out, "component long, dim long, loading double")


# ---------------------------------------------------------------------------
# rendezvous (highest-random-weight) sharding
# ---------------------------------------------------------------------------

N_SHARDS = 8

from ..functions.hashing import hash32, hash32_oracle_sql  # noqa: E402

_SHARD_HS = (
    "["
    + ", ".join(
        hash32_oracle_sql(f"'shard{s}:' || doc_id::VARCHAR")
        for s in range(N_SHARDS)
    )
    + "]"
)

_SHARD_SQL = f"""
WITH h AS (SELECT doc_id, {_SHARD_HS} AS hs FROM documents)
SELECT doc_id,
       (list_position(hs, list_max(hs)) - 1)::BIGINT AS shard,
       (list_position(hs[1:{N_SHARDS - 1}],
                      list_max(hs[1:{N_SHARDS - 1}])) - 1)::BIGINT
           AS shard_after_drop,
       (list_position(hs, list_max(hs)) - 1) = {N_SHARDS - 1} AS moved
FROM h"""


@register(
    "llm_shard_assign",
    _SHARD_SQL,
    doc=f"Rendezvous (highest-random-weight) sharding of documents onto "
        f"{N_SHARDS} workers: shard = argmax over per-shard seeded "
        "hash32(shard:doc_id). Unlike mod-hashing, removing a shard "
        "reassigns ONLY that shard's documents (every other doc's argmax "
        "is unchanged — the minimal-churn property that makes worker "
        "loss cheap in a 1000-executor ingest); the entry computes the "
        "assignment both with the full shard set and with the last "
        "shard dropped, and the oracle value-hashes that moved == "
        "(shard == dropped) row by row. Map-only JVM expressions, zero "
        "shuffle, stable under corpus append (a doc's weights never "
        "change) — the same determinism contract as llm_sample_hash.",
    tags=("llm", "sampling", "scale"),
)
def llm_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hs = F.array(
        *[
            hash32(
                F.concat(F.lit(f"shard{s}:"), F.col("doc_id").cast("string"))
            )
            for s in range(N_SHARDS)
        ]
    )
    d = docs.select("doc_id", hs.alias("hs"))
    shard = (F.array_position("hs", F.array_max("hs")) - 1).cast("long")
    kept = F.slice("hs", 1, N_SHARDS - 1)
    shard2 = (F.array_position(kept, F.array_max(kept)) - 1).cast("long")
    # moved is DERIVED from the actual reassignment here while the oracle
    # defines it as (shard == dropped) — so the cross-engine hash genuinely
    # pins the rendezvous minimal-churn property (only the dropped shard's
    # docs move) instead of restating the definition on both sides
    # (round-8 ADVICE fix).
    return d.select(
        "doc_id",
        shard.alias("shard"),
        shard2.alias("shard_after_drop"),
        (shard != shard2).alias("moved"),
    )


# ---------------------------------------------------------------------------
# vocabulary growth curve (Heaps' law readout)
# ---------------------------------------------------------------------------

_VG_BUCKETS = 10
_VG_N = 3  # word n-gram unit: the driver corpus has a ~31-word token
# vocabulary that saturates inside the first decile (a 1-row curve);
# 3-gram vocabulary is ~16k at sf0.01 and spreads across all deciles

_VOCAB_GROWTH_SQL = f"""
WITH nd AS (SELECT count(*) AS n_docs FROM documents),
d AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
tok AS (SELECT doc_id, a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS t
        FROM (SELECT doc_id, a,
                     unnest(generate_series(1, len(a) - {_VG_N - 1})) AS i
              FROM d WHERE len(a) >= {_VG_N})),
firsts AS (SELECT t, min(doc_id) AS first_doc FROM tok GROUP BY t),
b AS (SELECT (first_doc * {_VG_BUCKETS}) // n_docs AS bucket
      FROM firsts, nd),
c AS (SELECT bucket::BIGINT AS bucket, count(*)::BIGINT AS new_tokens
      FROM b GROUP BY bucket)
SELECT bucket, new_tokens,
       (sum(new_tokens) OVER (ORDER BY bucket))::BIGINT AS cum_vocab
FROM c"""


@register(
    "llm_vocab_growth",
    _VOCAB_GROWTH_SQL,
    doc=f"Vocabulary growth curve (the Heaps'-law readout corpus reports "
        f"ship), over word {_VG_N}-gram shingles: the corpus splits into "
        f"{_VG_BUCKETS} doc-id deciles and each distinct shingle "
        "attributes to the decile of its FIRST occurrence; new_tokens "
        "per decile plus the running cum_vocab show how fast the n-gram "
        "vocabulary saturates as the corpus grows. One shingle-keyed "
        "partial-agg shuffle (min doc_id per distinct shingle — the "
        "same shape as the inverted-index build) then a 10-row result; "
        "the cumulative window runs over those 10 rows, never the data. "
        "Decile boundaries use exact integer division on both engines "
        "so bucket edges cannot float-diverge.",
    tags=("llm", "text", "scale"),
)
def llm_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.llm.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tok = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), _VG_N)).alias("t")
    )
    firsts = tok.groupBy("t").agg(F.min("doc_id").alias("first_doc"))
    b = firsts.crossJoin(F.broadcast(nd)).select(
        F.expr(f"(first_doc * {_VG_BUCKETS}) div n_docs").alias("bucket")
    )
    c = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("new_tokens"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return c.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("new_tokens").cast("long").alias("new_tokens"),
        F.sum("new_tokens").over(w).cast("long").alias("cum_vocab"),
    )


# ---------------------------------------------------------------------------
# train/val/test split leakage guard
# ---------------------------------------------------------------------------

from .catalog_llm import _BASE_HASH_CTE, _sig_exprs  # noqa: E402

_LEAK_SIG_KEY = " || ':' || ".join(f"sig_{i}" for i in range(6))

_LEAKAGE_SQL = (
    "WITH " + _BASE_HASH_CTE
    + ", sig AS (SELECT doc_id, " + ", ".join(_sig_exprs()) + " FROM hs),"
    + f"""
b AS (SELECT doc_id, {_LEAK_SIG_KEY} AS fp,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100
                 AS bucket
      FROM sig),
s AS (SELECT doc_id, fp,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM b),
g AS (SELECT fp,
             array_to_string(list_sort(list_distinct(list(split))), ',')
                 AS splits_key,
             count(DISTINCT split) AS ns,
             count(*) AS n_docs
      FROM s GROUP BY fp)
SELECT splits_key, count(*)::BIGINT AS n_groups,
       sum(n_docs)::BIGINT AS n_docs_leaked
FROM g WHERE ns > 1 GROUP BY splits_key"""
)


@register(
    "llm_split_leakage_check",
    _LEAKAGE_SQL,
    doc="Train/val/test contamination guard: after the hash-bucket split "
        "(same 80/10/10 rule as llm_dataset_split), any MinHash-"
        "signature-identical duplicate group whose members straddle "
        "splits is leaked evaluation data — the signature key catches "
        "near-verbatim duplicates that an md5-exact key misses (on this "
        "corpus md5-level leakage is zero at sf<=0.01 while signature-"
        "level leakage exists at every sf, which is the point of "
        "checking). Reports, per combination of splits touched, the "
        "leaked group and document counts; remediation is to re-home "
        "whole groups (split by the GROUP's min-id hash, not the "
        "doc's). Scale shape: the signature is the per-row zero-shuffle "
        "map stage shared with the dedup entries, then ONE fp-keyed "
        "partial-agg shuffle and a <= 4-row readout — a linear guard "
        "cheap enough to run on every corpus build.",
    tags=("llm", "sampling", "dedup"),
)
def llm_split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import hash32 as _h32
    from ..operators.llm.dedup import minhash_signature_df
    from .catalog_llm import NUM_HASHES, SEED

    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signature_df(docs, num_hashes=NUM_HASHES, seed=SEED)
    fp = F.concat_ws(":", *[F.col(f"sig_{i}") for i in range(6)])
    bucket = _h32(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    s = sig.select(fp.alias("fp"), split.alias("split"))
    g = s.groupBy("fp").agg(
        F.collect_set("split").alias("cs"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return (
        g.filter(F.size("cs") > 1)
        .groupBy(F.array_join(F.array_sort("cs"), ",").alias("splits_key"))
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n_docs").alias("n_docs_leaked"),
        )
    )


# ---------------------------------------------------------------------------
# word-trigram language-model quality score (CCNet-style perplexity proxy)
# ---------------------------------------------------------------------------

_LM_ALPHA = 0.5     # add-alpha smoothing
_LM_TOP_TRI = 8192  # model cap: top trigrams by (count DESC, gram ASC) —
# ACTIVE at sf0.01 (~16k distinct trigrams), so the deterministic
# truncation path is exercised by the driver, not just argued
_LM_TOP_CTX = 4096  # context cap (~31-word vocab => <=961 contexts; the
# cap is the 100 TB contract, inactive at test scale)

_LM_SQL = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
tri AS (SELECT doc_id,
               a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS t,
               a[i] || ' ' || a[i + 1] AS ctx
        FROM (SELECT doc_id, a,
                     unnest(generate_series(1, len(a) - 2)) AS i
              FROM d WHERE len(a) >= 3)),
mtf AS (SELECT t, count(*) AS ct FROM tri GROUP BY t),
mt AS (SELECT t, ct FROM mtf ORDER BY ct DESC, t LIMIT {_LM_TOP_TRI}),
mc AS (SELECT split_part(t, ' ', 1) || ' ' || split_part(t, ' ', 2)
              AS ctx,
              sum(ct)::BIGINT AS cb
       FROM mtf GROUP BY 1
       ORDER BY cb DESC, ctx LIMIT {_LM_TOP_CTX}),
v AS (SELECT count(DISTINCT u)::DOUBLE AS vocab
      FROM (SELECT unnest(a) AS u FROM d))
SELECT tri.doc_id,
       count(*)::BIGINT AS n_trigrams,
       round(avg(ln((coalesce(mt.ct, 0) + {_LM_ALPHA})
                    / (coalesce(mc.cb, 0) + {_LM_ALPHA} * v.vocab))), 6)
           AS avg_logprob
FROM tri
LEFT JOIN mt USING (t)
LEFT JOIN mc ON tri.ctx = mc.ctx
CROSS JOIN v
GROUP BY tri.doc_id"""


@register(
    "llm_trigram_lm_score",
    _LM_SQL,
    doc="Word-trigram language-model quality score (the CCNet-style "
        "perplexity proxy used to bucket training corpora; the round-3 "
        "llm_ngram_lm_score is the add-one BIGRAM form — this one adds a "
        "context model and a bounded-cap contract): train "
        "add-alpha-smoothed trigram/context counts on the corpus itself, "
        "then score every document by its mean trigram log-probability — "
        "low scores flag boilerplate-free gibberish, high scores flag "
        "templated repetition, and CCNet-style pipelines keep the "
        "middle. Training is ONE corpus-sized partial-agg shuffle "
        "(trigram counts over the shared zip_with shingle kernel); the "
        "context model aggregates that distinct-gram table by prefix — "
        "cb(w1 w2) = sum ct over the prefix's grams — so it never "
        "re-explodes the corpus. The "
        f"model is CAPPED at the top {_LM_TOP_TRI} trigrams / "
        f"{_LM_TOP_CTX} contexts by (count DESC, gram ASC) — a "
        "deterministic total order both engines reproduce — so the "
        "broadcast stays bounded by the cap, not the corpus, at any "
        "scale (the trigram cap truncates ~half the sf0.01 model, so "
        "the driver exercises the unseen->0 smoothing path). Scoring is "
        "a map-side broadcast join plus one doc_id-keyed partial agg. "
        "Per-doc mean rounded to 6 dp (order-dependent double sum, same "
        "contract as llm_char_entropy); ln() is libm 1-ulp on both "
        "engines, invisible at 6 dp off rounding ties.",
    tags=("llm", "text", "quality"),
)
def llm_trigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.llm.dedup import word_shingles_all

    docs = load_table(spark, sf_dir, "documents")
    tri = docs.select(
        "doc_id",
        F.explode(word_shingles_all(F.col("text"), 3)).alias("t"),
    ).withColumn("ctx", F.substring_index("t", " ", 2))
    # ONE corpus-sized gram shuffle trains both models: the context
    # count cb(w1 w2) is exactly sum(ct) over grams sharing the prefix,
    # so model_c aggregates the (distinct-gram-sized) count table
    # instead of re-exploding the corpus. localCheckpoint so the two
    # consumers don't each recompute the explode+agg (the gram table is
    # the bounded intermediate — distinct grams, not occurrences).
    gram_counts = (
        tri.groupBy("t").agg(F.count(F.lit(1)).alias("ct"))
        .localCheckpoint(eager=False)
    )
    model_t = gram_counts.orderBy(F.desc("ct"), F.asc("t")).limit(_LM_TOP_TRI)
    model_c = (
        gram_counts.groupBy(F.substring_index("t", " ", 2).alias("ctx"))
        .agg(F.sum("ct").cast("long").alias("cb"))
        .orderBy(F.desc("cb"), F.asc("ctx")).limit(_LM_TOP_CTX)
    )
    vocab = docs.select(
        F.explode(F.split("text", " ")).alias("u")
    ).agg(F.count_distinct("u").cast("double").alias("vocab"))
    logp = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(_LM_ALPHA))
        / (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(_LM_ALPHA) * F.col("vocab"))
    )
    return (
        tri.join(F.broadcast(model_t), "t", "left")
        .join(F.broadcast(model_c), "ctx", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# incremental corpus dedup: new batch vs history through a broadcast Bloom
# ---------------------------------------------------------------------------

_IBF_HASHES = 3
# filter size ADAPTS to history cardinality: bits = max(1024,
# 2^bitlength(2*n_keys - 1)) where n_keys counts DISTINCT history keys —
# the Bloom inserts distinct keys, so sizing on rows would oversize the
# filter whenever history carries internal duplicates (the x100 soak
# fixture showed exactly that: 400k rows but 5k distinct keys made a
# row-sized filter 200x too big and fp_rate degenerate-zero).
# ~2-4 bits per key is deliberately tight so
# the measured fp_rate stays non-trivial (~0.3) at EVERY scale while the
# packed word table stays ~n_hist/16 longs; production turns the same
# dial the other way (10 bits/key -> fp ~1%). The formula is exact
# integer arithmetic both engines reproduce: Python bit_length() ==
# DuckDB length(bin(x)) for x >= 1.
_IBF_BITS_SQL = "(SELECT greatest(1024, 1 << length(bin(greatest(2 * count(DISTINCT fp) - 1, 1)))) FROM hist)"


def _ibf_bits_py(n_hist: int) -> int:
    return max(1024, 1 << max(2 * n_hist - 1, 1).bit_length())


def _ibf_hash_sql(expr: str, i: int) -> str:
    from ..functions.hashing import hash32_oracle_sql

    salted = expr + " || ':ibf" + str(i) + "'"
    return f"({hash32_oracle_sql(salted)} % {_IBF_BITS_SQL})"


def _ibloom_sql() -> str:
    from .catalog_llm import _BASE_HASH_CTE, _sig_exprs

    build_hashes = ", ".join(
        _ibf_hash_sql("fp", i) for i in range(_IBF_HASHES)
    )
    probe_hashes = ", ".join(
        f"{_ibf_hash_sql('n.fp', i)} AS h{i}" for i in range(_IBF_HASHES)
    )
    word_joins = " ".join(
        f"LEFT JOIN words w{i} ON w{i}.widx = pr.h{i} // 32"
        for i in range(_IBF_HASHES)
    )
    probe_pass = " AND ".join(
        f"(coalesce(w{i}.wv, 0) & (1::BIGINT << (pr.h{i} % 32))) <> 0"
        for i in range(_IBF_HASHES)
    )
    return (
        "WITH " + _BASE_HASH_CTE
        + ", sig AS (SELECT doc_id, " + ", ".join(_sig_exprs()) + " FROM hs),"
        + f"""
keyed AS (SELECT doc_id, {_LEAK_SIG_KEY} AS fp FROM sig),
hist AS (SELECT fp FROM keyed WHERE doc_id % 5 <> 0),
newb AS (SELECT doc_id, fp FROM keyed WHERE doc_id % 5 = 0),
bits_t AS (SELECT DISTINCT unnest([{build_hashes}]) AS bit FROM hist),
words AS (SELECT bit // 32 AS widx,
                 bit_or(1::BIGINT << (bit % 32)) AS wv
          FROM bits_t GROUP BY 1),
truth AS (SELECT DISTINCT fp FROM hist),
pr AS (SELECT n.doc_id, n.fp, {probe_hashes} FROM newb n),
probe AS (SELECT pr.doc_id,
                 ({probe_pass}) AS bloom_pass,
                 t.fp IS NOT NULL AS is_dup
          FROM pr
          {word_joins}
          LEFT JOIN truth t ON t.fp = pr.fp)
SELECT count(*)::BIGINT AS n_new,
       sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT AS n_true_dup,
       sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END)::BIGINT AS n_pass,
       sum(CASE WHEN NOT bloom_pass THEN 1 ELSE 0 END)::BIGINT
         AS n_definitely_new,
       sum(CASE WHEN bloom_pass AND NOT is_dup THEN 1 ELSE 0 END)::BIGINT
         AS n_false_pos,
       round(sum(CASE WHEN bloom_pass AND NOT is_dup THEN 1 ELSE 0 END)
             / greatest(1, sum(CASE WHEN NOT is_dup THEN 1 ELSE 0 END))::DOUBLE,
             6) AS fp_rate
FROM probe"""
    )


@register(
    "llm_incremental_dedup_bloom",
    _ibloom_sql(),
    doc="Incremental corpus dedup, the shape every continuously-crawled "
        "training corpus needs: dedup a NEW batch (doc_id % 5 = 0) "
        "against the HISTORY corpus (the other 80%) WITHOUT joining the "
        "new batch to all of history. History's MinHash-signature keys "
        "(near-verbatim duplicate identity — signature-level duplicates "
        "straddle any split at every sf, so the true-dup path is "
        "exercised where an md5-exact key would measure zero) build a "
        "Bloom sized to the DISTINCT history keys (bits = "
        "2^ceil(log2(2*n_keys)), one bounded count action) packed into <= bits/32 (widx, word) "
        "rows, broadcast everywhere; each new doc tests "
        f"{_IBF_HASHES} positions with O(1) word lookups. "
        "Bloom-negative docs are DEFINITELY new (no false negatives by "
        "construction — pinned by n_pass >= n_true_dup) and skip the "
        "verify join entirely in the production shape "
        "(filter(bloom_pass) before the join), which therefore "
        "processes n_true_dup + fp_rate * n_new rows instead of n_new. "
        "This REGISTERED entry instruments BOTH paths — it joins every "
        "new doc to truth so the false-positive rate is measurable; "
        "the monitoring row it reports (batch size, true dups, bloom "
        "passes, definite-news, false positives, fp_rate) is what a "
        "deployment watches to know the shear is still paying. The "
        "2-4-bits-per-key sizing is deliberately tight so the FP path "
        "stays exercised (measured 0.30 at sf0.01, 0.43 at sf0.1 and "
        "x100 — SCALE_SOAK.md); production picks ~10 bits/key for ~1%. "
        "Same "
        "packed-word kernel as join_bloom_prefilter (13.6x vs "
        "array-scan probing, SCALE_SOAK.md); hashes are md5-derived so "
        "DuckDB reproduces every bit.",
    tags=("llm", "dedup", "sketch", "streaming"),
)
def llm_incremental_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import hash32
    from ..operators.llm.dedup import minhash_signature_df
    from .catalog_llm import NUM_HASHES, SEED

    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signature_df(docs, num_hashes=NUM_HASHES, seed=SEED)
    # (doc_id, fp) is consumed by three plan branches (bloom build,
    # truth, probe) — checkpoint so the signature map stage (the entry's
    # only corpus-sized work) runs ONCE, not once per consumer
    keyed = sig.select(
        "doc_id",
        F.concat_ws(":", *[F.col(f"sig_{i}") for i in range(NUM_HASHES)]).alias("fp"),
    ).localCheckpoint(eager=False)
    hist = keyed.filter(F.col("doc_id") % 5 != 0).select("fp")
    newb = keyed.filter(F.col("doc_id") % 5 == 0)

    # bounded control plane: ONE distinct-count (a single long to the
    # driver) sizes the filter; the oracle mirrors it with a scalar
    # subquery over DISTINCT fp
    n_keys = hist.select(F.count_distinct("fp")).collect()[0][0]
    bits = _ibf_bits_py(n_keys)

    def ibf_hash(col, i: int):
        return hash32(F.concat(col, F.lit(f":ibf{i}"))) % bits

    bits_t = hist.select(
        F.explode(
            F.array(*[ibf_hash(F.col("fp"), i) for i in range(_IBF_HASHES)])
        ).alias("bit")
    ).distinct()
    words = bits_t.groupBy(F.expr("bit div 32").alias("widx")).agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))"))
        .alias("wv")
    )
    truth = hist.distinct().withColumnRenamed("fp", "t_fp")

    pr = newb.select(
        "doc_id", "fp",
        *[ibf_hash(F.col("fp"), i).alias(f"h{i}") for i in range(_IBF_HASHES)],
    )
    for i in range(_IBF_HASHES):
        wi = words.select(
            F.col("widx").alias(f"widx{i}"), F.col("wv").alias(f"wv{i}")
        )
        pr = pr.join(
            F.broadcast(wi),
            F.expr(f"h{i} div 32") == F.col(f"widx{i}"),
            "left",
        )
    pass_expr = None
    for i in range(_IBF_HASHES):
        bit_set = (
            F.coalesce(F.col(f"wv{i}"), F.lit(0)).bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(h{i} % 32 AS INT))")
            )
            != 0
        )
        pass_expr = bit_set if pass_expr is None else (pass_expr & bit_set)
    probe = pr.join(truth, F.col("fp") == F.col("t_fp"), "left").select(
        "doc_id",
        pass_expr.alias("bloom_pass"),
        F.col("t_fp").isNotNull().alias("is_dup"),
    )
    return probe.agg(
        F.count("*").cast("long").alias("n_new"),
        F.sum(F.col("is_dup").cast("long")).cast("long").alias("n_true_dup"),
        F.sum(F.col("bloom_pass").cast("long")).cast("long").alias("n_pass"),
        F.sum((~F.col("bloom_pass")).cast("long")).cast("long")
        .alias("n_definitely_new"),
        F.sum((F.col("bloom_pass") & ~F.col("is_dup")).cast("long"))
        .cast("long")
        .alias("n_false_pos"),
        F.round(
            F.sum((F.col("bloom_pass") & ~F.col("is_dup")).cast("long"))
            / F.greatest(F.lit(1), F.sum((~F.col("is_dup")).cast("long"))),
            6,
        ).alias("fp_rate"),
    )


# ---------------------------------------------------------------------------
# time-series resample + gap-fill interpolation
# ---------------------------------------------------------------------------

_RS_STEP = "6"  # hours between grid points: ~30-day span -> ~120 pts/user

_RESAMPLE_SQL = f"""
WITH {EVENTS_NORM},
pe AS (SELECT user_id, ts, max_by(value, event_id) AS v
       FROM events_norm GROUP BY 1, 2),
b AS (SELECT user_id, min(ts) AS t0, max(ts) AS t1 FROM pe GROUP BY 1),
grid AS (SELECT user_id,
                unnest(generate_series(date_trunc('day', t0), t1,
                                       INTERVAL {_RS_STEP} HOUR)) AS ts
         FROM b),
u AS (SELECT user_id, ts, v, 0 AS is_grid FROM pe
      UNION ALL
      SELECT user_id, ts, NULL::DOUBLE, 1 FROM grid),
w AS (SELECT user_id, ts, is_grid,
        last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, is_grid
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, is_grid
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
      FROM u)
SELECT user_id, ts AS grid_ts,
       CASE WHEN pv IS NULL THEN 'bfill'
            WHEN nv IS NULL THEN 'ffill'
            ELSE 'interp' END AS fill_mode,
       round(CASE WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  WHEN epoch_us(nt) = epoch_us(pt) THEN pv
                  ELSE pv + (nv - pv)
                       * ((epoch_us(ts) - epoch_us(pt))
                          / (epoch_us(nt) - epoch_us(pt))) END, 4)
         AS v_interp
FROM w WHERE is_grid = 1"""


@register(
    "events_resample_interp",
    _RESAMPLE_SQL,
    doc="Time-series resampling with gap-fill: every user's irregular "
        f"event stream becomes a regular {_RS_STEP}-hour grid with "
        "linear interpolation between the neighbouring events "
        "(backward-fill before the first event, forward-fill after the "
        "last — fill_mode reports which path produced each point). The "
        "dataflow is the as-of-join composition run BOTH directions in "
        "one pass: union the grid rows (null value) with the event "
        "rows, then prev = last-ignorenulls over (ts, event-first) and "
        "next = first-ignorenulls over the 1-FOLLOWING frame — the tie "
        "ordering makes an exactly-on-grid event its own prev (weight "
        "0, so v_interp = v exactly) and never its own next. Both "
        "windows share one user-keyed partitioning AND ordering, so "
        "Catalyst fuses all four columns into a SINGLE Window operator "
        "— one shuffle, one sort for both directions (pinned by the "
        "plan test). The per-(user,ts) pre-agg is localCheckpointed so "
        "the bounds/grid branch and the union branch share ONE events "
        "scan (round-8 fix; previously the fact table was read twice "
        "for a 3-column min/max). Output is O(span/step * "
        "users) regardless of event density — at 100 TB the grid is "
        "tiny next to the events, and the events are never joined to "
        "each other (no range-join blow-up). Interpolation arithmetic "
        "is epoch-microsecond integers divided as doubles, identical "
        "in both engines; rounded 4 dp.",
    tags=("temporal", "window", "timeseries"),
)
def events_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    pe = ev.groupBy("user_id", "ts").agg(
        F.max_by("value", "event_id").alias("v")
    )
    # both consumers below (the per-user bounds -> grid branch and the
    # union branch) reuse this pre-agg; without the checkpoint Catalyst
    # re-derives each branch from the source, scanning the fact table
    # TWICE — a whole second pass over 100 TB for a 3-column min/max
    # (round-7 verdict task 3; same pattern as the trigram LM's gram
    # table). Plan test pins the single scan (tests/test_plan_shape.py).
    pe = pe.localCheckpoint(eager=False)
    bounds = pe.groupBy("user_id").agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col("t0")),
                F.col("t1"),
                F.expr(f"INTERVAL {_RS_STEP} HOURS"),
            )
        ).alias("ts"),
    )
    u = pe.select(
        "user_id", "ts", "v", F.lit(0).alias("is_grid")
    ).unionByName(
        grid.select(
            "user_id", "ts",
            F.lit(None).cast("double").alias("v"),
            F.lit(1).alias("is_grid"),
        )
    )
    ets = F.when(F.col("is_grid") == 0, F.col("ts"))
    evv = F.when(F.col("is_grid") == 0, F.col("v"))
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    w = u.select(
        "user_id", "ts", "is_grid",
        F.last(evv, ignorenulls=True).over(wp).alias("pv"),
        F.last(ets, ignorenulls=True).over(wp).alias("pt"),
        F.first(evv, ignorenulls=True).over(wn).alias("nv"),
        F.first(ets, ignorenulls=True).over(wn).alias("nt"),
    )
    gp, tp, tn = (F.unix_micros(c) for c in (F.col("ts"), F.col("pt"), F.col("nt")))
    interp = (
        F.when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .when(tn == tp, F.col("pv"))
        .otherwise(
            F.col("pv") + (F.col("nv") - F.col("pv")) * ((gp - tp) / (tn - tp))
        )
    )
    fill_mode = (
        F.when(F.col("pv").isNull(), F.lit("bfill"))
        .when(F.col("nv").isNull(), F.lit("ffill"))
        .otherwise(F.lit("interp"))
    )
    return (
        w.filter(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.col("ts").alias("grid_ts"),
            fill_mode.alias("fill_mode"),
            F.round(interp, 4).alias("v_interp"),
        )
    )
