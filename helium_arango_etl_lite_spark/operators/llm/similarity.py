"""Similarity search over embedding columns (SURVEY.md section 2.8).

* :func:`cosine_topk` — brute-force exact top-k: the correctness baseline
  (oracle-checkable). One broadcast of the query vector, a linear scan,
  TakeOrderedAndProject for the top-k — no shuffle of the corpus.
* :func:`lsh_bucket_topk` — random-hyperplane LSH: sign-bit bucket per
  vector, candidates = query's bucket only. The 100 TB path: the bucket id
  is a partition-prunable column when materialized, so a query touches
  1/2^H of the data.
* :func:`embedding_near_dup_pairs` — all-pairs cosine >= threshold; brute
  force at oracle scale, LSH-bucketed (join on bucket) at scale.

Dot products use zip_with + aggregate over DOUBLE — built-in JVM
expressions, no UDF; embeddings are cast float -> double first so the
DuckDB oracle (which computes in double) matches to ~1e-15.
"""

from __future__ import annotations

import logging
import random
import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ...functions.hashing import hash32

_LOG = logging.getLogger(__name__)


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _id_rank_penalty(ids, round_dp: int):
    """Ascending-id tie-break folded into ONE sortable key (round 8).

    The GEMM kernels rank candidates by ``(rounded sim DESC, id ASC)``.
    Expressing that with a full-row ``np.lexsort`` costs
    O(rows * n log n) per batch AND materialises an ids matrix the size
    of the sims matrix — the dominant cost of the x100 hard-negatives
    soak. Instead, subtract a per-candidate penalty strictly smaller
    than one rounding quantum: ``rank(id) * eps`` with
    ``eps = 10^-round_dp / (n + 2)``. Distinct rounded sims differ by
    >= 10^-round_dp while the worst-case total penalty is
    ``n/(n+2) * 10^-round_dp`` — a margin of ``2/(n+2) * 10^-round_dp``
    (~2e-11 at n=10M), far above double ulp, so the composite key's
    order EQUALS the lexicographic order and ``argpartition`` +
    small-argsort selects the exact same top-k in O(n + k log k).
    Ranks (not raw ids) keep eps scale-independent: raw ids at 100 TB
    can exceed the 53-bit mantissa's room under a 1e-4 quantum.
    """
    import numpy as np

    n = len(ids)
    eps = (10.0 ** -round_dp) / (n + 2)
    rank = np.empty(n, dtype=np.float64)
    rank[np.argsort(ids, kind="stable")] = np.arange(n, dtype=np.float64)
    return rank * eps


def _topk_cols(key, kk: int):
    """Per-row top-``kk`` column indices of ``key`` (2-D), ordered
    descending — exact, via argpartition preselect + an O(kk log kk)
    argsort of only the preselected block. ``key`` must be a strict
    total order per row (see :func:`_id_rank_penalty`)."""
    import numpy as np

    if kk < key.shape[1]:
        part = np.argpartition(-key, kk - 1, axis=1)[:, :kk]
    else:
        part = np.broadcast_to(
            np.arange(key.shape[1]), key.shape
        )
    sel = np.take_along_axis(key, part, axis=1)
    return np.take_along_axis(
        part, np.argsort(-sel, axis=1, kind="stable"), axis=1
    )


def _infer_dim(e: DataFrame, vec_col: str = "v") -> int:
    """Embedding dimension from one sampled row (single-row job).

    Called only when the caller did not pass ``dim`` explicitly — a wrong
    hardcoded dim makes zip_with pad with nulls, every bucket id NULL, and
    the bucket join silently empty; inferring (or failing loudly on an
    empty frame) removes that silent-wrong-answer mode.
    """
    row = e.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None:
        raise ValueError(
            "cannot infer embedding dim from an empty DataFrame; pass dim="
        )
    return int(row["d"])


def _estimated_row_count(df: DataFrame) -> int | None:
    """Optimizer row-count estimate for ``df`` — no job, may be None.

    Reads the logical plan's statistics (exact when the source catalog
    has ANALYZE stats or the plan has a counting shape; None for a bare
    parquet scan, where only sizeInBytes is known). Used by
    :func:`knn_join` auto-routing so the route is free when stats exist
    and costs at most a bounded limit-probe when they don't.
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        opt = stats.rowCount()
        if opt.isDefined():
            return int(str(opt.get()))
    except Exception:  # pragma: no cover - JVM API drift
        return None
    return None


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product of two array<double> columns (JVM-side)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplanes(num_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Seeded random hyperplanes, rounded to 6dp so the same decimal
    literals parse to identical doubles in Spark and the SQL oracle."""
    rng = random.Random(seed)
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)] for _ in range(num_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit_j = (vec . plane_j >= 0), bucket = sum bit<<j."""
    acc = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        acc = acc + F.shiftleft((dot(vec, p) >= 0).cast("long"), j)
    return acc


def fixed_centroids(
    e: DataFrame, k: int = 32, id_col: str = "vec_id", vec_col: str = "v"
) -> DataFrame:
    """Deterministic K-row centroid subset whose size does NOT grow with
    the corpus — the scale-correct default for :func:`ivf_topk` /
    :func:`semdedup` (the ``id % mod`` form keeps O(n/mod) centroids and
    makes assignment O(n^2/mod); SCALE_SOAK.md measured it super-linear
    at 10x).

    Selection is "order by md5(id), take K": a seeded uniform shuffle
    both engines reproduce exactly (oracle mirror: ``ORDER BY
    md5(id::VARCHAR), id LIMIT K``). ``orderBy().limit(K)`` compiles to
    TakeOrderedAndProject — per-partition top-K then a K-row merge, one
    linear pass, no global sort shuffle. A production index k-means-
    refines this seed set (:data:`llm_kmeans_iter` is the M-step); the
    assignment dataflow is identical either way.
    """
    return (
        e.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    )


def _centroid_set(
    e: DataFrame,
    centroids: DataFrame | None,
    centroid_mod: int | None,
    num_centroids: int,
    id_col: str,
) -> DataFrame:
    """Resolve the centroid frame: explicit > mod fixture > fixed-K."""
    if centroids is not None:
        return centroids
    if centroid_mod is not None:
        return e.filter((F.col(id_col) % centroid_mod) == 1).select(
            F.col(id_col).alias("cid"), F.col("v").alias("cv")
        )
    return fixed_centroids(e, num_centroids, id_col=id_col, vec_col="v")


def kmeans_centroids(
    emb: DataFrame, k: int = 32, iterations: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
    assign_dp: int = 6,
) -> DataFrame:
    """Spherical-k-means-refined centroid frame for the IVF family.

    Seeds with :func:`fixed_centroids`, then alternates the E-step
    (broadcast-argmax assignment — identical dataflow to
    :func:`ivf_topk`) and the M-step (per-cell per-dimension mean — the
    posexplode + (cell, dim) partial-agg shuffle of ``llm_kmeans_iter``)
    for ``iterations`` rounds. Returns ``(cid, cv)`` ready to inject as
    ``centroids=`` into :func:`ivf_topk` / :func:`semdedup`.

    Scale shape: every iteration is O(n·K) assignment + one shuffle of
    O(n·d) components partial-aggregated to O(K·d) rows; ONLY the K·d
    means are collected to the driver (k=32, d=64 → 2048 rows) to
    rebuild the centroid arrays, so the driver never sees the corpus.
    Empty cells keep their previous centroid (a cell that captures no
    vectors must not produce a null array). The payoff measured in
    SCALE_SOAK.md: learned centroids bound the largest cell, and the
    semdedup pair stage is quadratic in exactly that largest cell.
    """
    spark = emb.sparkSession
    e = emb.select(
        F.col(id_col), _as_double(vec_col).alias("v")
    ).withColumn("nrm", norm(F.col("v")))  # invariant across iterations
    cents = fixed_centroids(e.drop("nrm"), k, id_col=id_col, vec_col="v")
    for _ in range(iterations):
        scored = e.crossJoin(
            F.broadcast(cents.withColumn("ncv", norm(F.col("cv"))))
        ).select(
            F.col(id_col),
            F.col("cid"),
            F.round(
                dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("ncv")),
                assign_dp,
            ).alias("asim"),
        )
        assigned = scored.groupBy(id_col).agg(
            F.max(F.struct("asim", "cid"))["cid"].alias("cell")
        )
        comp = (
            e.join(assigned, id_col)
            .select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
        )
        # O(K*d) rows -> driver; rebuild array centroids deterministically
        means: dict[int, dict[int, float]] = {}
        for r in comp.collect():
            means.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        prev = {r["cid"]: list(r["cv"]) for r in cents.collect()}
        rows = []
        for cid, vec in sorted(prev.items()):
            if cid in means:
                vec = [means[cid][i] for i in range(len(vec))]
            rows.append((cid, vec))
        cents = spark.createDataFrame(
            rows, "cid long, cv array<double>"
        )
    return cents


def cosine_topk(
    emb: DataFrame, query_id: int, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding", round_dp: int = 4,
) -> DataFrame:
    """Exact top-k by cosine similarity to the vector with id ``query_id``.

    Rounded to ``round_dp`` before ranking (ties broken by id) so that
    engine-specific summation order cannot flip the boundary.
    """
    e = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    # query norm hoisted into the broadcast side: per scanned row the
    # remaining work is one dot fold + one self-norm fold (was three)
    q = e.filter(F.col(id_col) == query_id).select(
        F.col("v").alias("qv"), norm(F.col("v")).alias("qn")
    )
    scored = (
        e.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(
                dot(F.col("v"), F.col("qv")) / (norm(F.col("v")) * F.col("qn")),
                round_dp,
            ).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def lsh_bucket_topk(
    emb: DataFrame, query_id: int, k: int = 5, num_planes: int = 6,
    id_col: str = "vec_id", vec_col: str = "embedding",
    seed: int = 7, dim: int | None = None, round_dp: int = 4,
) -> DataFrame:
    """ANN: candidates restricted to the query's LSH bucket, exact cosine
    within. At scale the bucket column is precomputed + partitioned-by, so
    this is a partition-pruned scan, not a full pass."""
    e0 = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    if dim is None:
        dim = _infer_dim(e0)
    planes = hyperplanes(num_planes, dim, seed)
    e = e0.withColumn("bucket", lsh_bucket(F.col("v"), planes))
    q = e.filter(F.col(id_col) == query_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket"),
        norm(F.col("v")).alias("qn"),  # hoisted out of the per-candidate scan
    )
    cands = e.filter(F.col(id_col) != query_id).crossJoin(F.broadcast(q)).filter(
        F.col("bucket") == F.col("qbucket")
    )
    scored = cands.select(
        F.col(id_col),
        F.col("bucket"),
        F.round(
            dot(F.col("v"), F.col("qv")) / (norm(F.col("v")) * F.col("qn")),
            round_dp,
        ).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def ivf_topk(
    emb: DataFrame, query_id: int, k: int = 5, centroid_mod: int | None = None,
    nprobe: int = 2, id_col: str = "vec_id", vec_col: str = "embedding",
    round_dp: int = 4, assign_dp: int = 6,
    centroids: DataFrame | None = None, num_centroids: int = 32,
) -> DataFrame:
    """IVF (inverted-file) ANN: one-pass centroid assignment, probe the
    ``nprobe`` nearest cells, exact cosine within the probed cells.

    Centroids default to :func:`fixed_centroids` — a deterministic
    ``num_centroids``-row subset whose size is independent of the corpus,
    so assignment stays O(n*K) at any scale (pass ``centroids`` to use a
    k-means-refined set instead; the dataflow is identical). Assignment
    is a broadcast cross join against the tiny centroid set followed by a
    max(struct) argmax — the shuffle carries only ``(id, cell_sim,
    cell_id)`` triples, never the vectors. At 100 TB the cell id becomes
    a partition column, so a query scans ~nprobe/K of the corpus; this is
    the standard IVF trade that LSH bucketing (``lsh_bucket_topk``) makes
    with hashes instead of learned cells.

    Similarities are rounded (``assign_dp``) with cell-id tiebreak before
    the argmax so the assignment is engine-order independent.

    ``centroid_mod`` keeps the legacy ``id % mod == 1`` subset as a TEST
    FIXTURE only: it grows the centroid set WITH the corpus, making
    assignment O(n^2/mod) — measured super-linear at 10x
    (SCALE_SOAK.md). Never use it at scale.
    """
    e = emb.select(
        F.col(id_col), _as_double(vec_col).alias("v")
    ).withColumn("nrm", norm(F.col("v")))  # once per row, not per centroid
    cents = _centroid_set(
        e.drop("nrm"), centroids, centroid_mod, num_centroids, id_col
    ).withColumn("ncv", norm(F.col("cv")))
    scored = e.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col("cid"),
        F.round(
            dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("ncv")),
            assign_dp,
        ).alias("asim"),
    )
    # argmax centroid per vector: max over (sim, cid) structs — ties go to
    # the larger cid, mirrored by the oracle's ORDER BY sim DESC, cid DESC
    assigned = scored.groupBy(id_col).agg(
        F.max(F.struct("asim", "cid"))["cid"].alias("cell")
    )
    cells = e.join(assigned, id_col)

    q = e.filter(F.col(id_col) == query_id).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cid",
            F.round(
                dot(F.col("cv"), F.col("qv")) / (F.col("ncv") * F.col("qn")),
                assign_dp,
            ).alias("qsim"),
        )
        .orderBy(F.desc("qsim"), F.desc("cid"))
        .limit(nprobe)
        .select("cid")
    )
    cands = cells.join(
        F.broadcast(probe), cells["cell"] == probe["cid"]
    ).filter(F.col(id_col) != query_id)
    out = cands.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.col("cell"),
        F.round(
            dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")),
            round_dp,
        ).alias("cos_sim"),
    )
    return out.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.45,
    id_col: str = "vec_id", vec_col: str = "embedding", round_dp: int = 4,
) -> DataFrame:
    """All pairs with cosine >= threshold. Brute-force O(n^2) — the oracle
    baseline; swap the join condition to an LSH bucket equality for scale
    (same output contract, approximate recall)."""
    # norm hoist: each vector's norm is computed ONCE pre-join instead of
    # per pair — same doubles, same cosine value (dot/(na*nb)), but the
    # per-pair interpreted fold count drops from 3 to 1 (round-7 measure:
    # the aggregate() fold is the interpreter-bound kernel of this family)
    e = emb.select(
        F.col(id_col), _as_double(vec_col).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    a = e.select(
        F.col(id_col).alias("vec_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col(id_col).alias("vec_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    scored = pairs.select(
        "vec_a", "vec_b",
        F.round(
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
            round_dp,
        ).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def embedding_near_dup_lsh(
    emb: DataFrame, threshold: float = 0.45, num_planes: int = 6,
    id_col: str = "vec_id", vec_col: str = "embedding",
    seed: int = 7, dim: int | None = None, round_dp: int = 4,
) -> DataFrame:
    """Near-dup pairs with the LSH-bucket equality join — the 100 TB shape.

    Replaces the brute-force O(n^2) cross product with an equi-join on the
    sign-bit bucket: the shuffle keys are (bucket, id), candidate pairs are
    only same-bucket, and exact cosine verifies each candidate. Approximate
    recall by construction (a true pair split across buckets is missed —
    raise recall with fewer planes or multiple plane tables); precision is
    exact because every emitted pair is cosine-verified.
    """
    e0 = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    if dim is None:
        dim = _infer_dim(e0)
    planes = hyperplanes(num_planes, dim, seed)
    e = e0.withColumn("bucket", lsh_bucket(F.col("v"), planes)).withColumn(
        "nrm", norm(F.col("v"))  # once per row, not per candidate pair
    )
    a = e.select(
        F.col(id_col).alias("vec_a"), F.col("v").alias("va"), F.col("bucket"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col(id_col).alias("vec_b"), F.col("v").alias("vb"),
        F.col("bucket").alias("bucket_b"), F.col("nrm").alias("nb"),
    )
    pairs = a.join(
        b, (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_a") < F.col("vec_b"))
    )
    scored = pairs.select(
        "vec_a", "vec_b",
        F.round(
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
            round_dp,
        ).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def knn_join(
    emb: DataFrame, k: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
    round_dp: int = 4, engine: str = "auto",
    max_broadcast_rows: int | None = None,
    broadcast_budget_bytes: int = 2 << 30,
    num_planes: int | None = None, seed: int = 7, dim: int | None = None,
) -> DataFrame:
    """All-pairs k-NN self-join: for EVERY vector, its ``k`` nearest
    neighbours by cosine — the per-document neighbourhood pass curation
    pipelines run (near-dup clustering, diversity sampling, retrieval
    eval). Brute-force exact form; the ANN entries (LSH buckets, IVF
    cells) are the candidate-pruned scale path for corpora whose matrix
    can't be broadcast.

    ``engine="auto"`` (default): route WITHOUT a full corpus scan — use
    the optimizer's row-count estimate when the catalog has one, else a
    bounded ``limit(threshold + 1)`` probe on the pruned id column
    (stops as soon as the threshold is exceeded; never pays a second
    full pass over the vectors). The threshold is a MEMORY budget, not
    a bare row count: when ``max_broadcast_rows`` is None (default) it
    is derived as ``broadcast_budget_bytes // (dim * 8 + 16)`` — dim
    float64s plus id + rank-penalty per corpus row — because the
    failure the guard prevents (a corpus matrix that doesn't fit the
    driver/executor broadcast) happens in BYTES: a 4096-dim corpus
    exhausts a 2 GiB budget at ~65k rows, a 64-dim one at ~4M (r8
    verdict item 4). dim comes from the ``dim`` param or a one-row
    probe. The routing decision and its byte math are logged; pass
    ``max_broadcast_rows`` explicitly to pin a row threshold.
    At or below the threshold run
    the exact arrow GEMM; above it route to :func:`knn_join_bucketed` —
    the LSH-candidate approximate form whose joins are all bucket
    equi-joins (no driver collect, no cross join). The exact form CANNOT
    scale past a broadcastable matrix by construction, so the engine
    degrades to documented-approximate instead of collecting 100 TB to
    the driver; the degradation is surfaced with a ``UserWarning``
    (neighbour lists may be shorter than ``k`` in the approximate form).

    ``engine="arrow"``: the corpus collects into ONE normalised numpy
    matrix broadcast to executors (rows x dim floats — fine up to ~10M
    rows), and each Arrow batch of queries scores against it with a
    single GEMM, then vectorised exact top-k — argpartition over a
    composite sim/id key (:func:`_id_rank_penalty`), O(n) per query row
    instead of a full-row lexsort. Python runs matrix-at-a-time.

    ``engine="expr"``: crossJoin + fold-based cosine + partitioned
    row_number window — all JVM, quadratic expression work.

    ``engine="bucketed"``: :func:`knn_join_bucketed` explicitly.

    Determinism: similarity rounds half-away-from-zero to ``round_dp``
    before ranking, ties break on ascending neighbour id.
    """
    from pyspark.sql import Window

    e = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    if engine == "auto":
        if max_broadcast_rows is None:
            d = dim
            if d is None:
                first = e.select(F.size("v").alias("d")).first()
                d = int(first["d"]) if first and first["d"] else 1
            # bytes per broadcast corpus row: dim float64s + int64 id
            # + float64 rank penalty
            row_bytes = d * 8 + 16
            max_broadcast_rows = max(1, broadcast_budget_bytes // row_bytes)
            budget_msg = (
                f"{max_broadcast_rows} rows = budget "
                f"{broadcast_budget_bytes} B / {row_bytes} B-per-row "
                f"(dim={d})"
            )
        else:
            budget_msg = f"{max_broadcast_rows} rows (explicit)"
        est = _estimated_row_count(e)
        if est is None:
            # bounded probe: pruned id column, stops at threshold + 1
            est = (
                e.select(id_col).limit(max_broadcast_rows + 1).count()
            )
        if est > max_broadcast_rows:
            warnings.warn(
                f"knn_join: corpus (>{est - 1} rows) exceeds the "
                f"broadcast threshold [{budget_msg}]; routing "
                "exact->approximate (LSH-bucketed): neighbour lists "
                "may be shorter than k",
                UserWarning,
                stacklevel=2,
            )
            engine = "bucketed"
        else:
            _LOG.info(
                "knn_join auto-route: exact arrow GEMM (corpus %d rows "
                "<= threshold [%s])", est, budget_msg,
            )
            engine = "arrow"
    if engine == "bucketed":
        return knn_join_bucketed(
            emb, k=k, id_col=id_col, vec_col=vec_col, round_dp=round_dp,
            num_planes=num_planes, seed=seed, dim=dim,
        )
    if engine == "expr":
        en = e.withColumn("nrm", norm(F.col("v")))  # once per row
        a = en.select(
            F.col(id_col).alias("qid"), F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        b = en.select(
            F.col(id_col).alias("nid"), F.col("v").alias("nv"),
            F.col("nrm").alias("nn"),
        )
        scored = (
            a.crossJoin(F.broadcast(b))
            .filter(F.col("qid") != F.col("nid"))
            .select(
                "qid", "nid",
                F.round(
                    dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")),
                    round_dp,
                ).alias("cos_sim"),
            )
        )
        w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StructField, StructType,
    )

    corpus = e.collect()  # the broadcastable corpus matrix (see docstring)
    ids = np.array([r[id_col] for r in corpus], dtype=np.int64)
    mat = np.array([r["v"] for r in corpus], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    # id-rank penalty computed ONCE at broadcast time (driver side), so
    # the per-batch kernel is argpartition-only (_id_rank_penalty)
    pen = _id_rank_penalty(ids, round_dp)
    bc = e.sparkSession.sparkContext.broadcast((ids, mat, pen))

    out_schema = StructType(
        [
            StructField("qid", LongType(), False),
            StructField("nid", LongType(), False),
            StructField("cos_sim", DoubleType(), False),
            StructField("rank", IntegerType(), False),
        ]
    )
    scale = 10.0 ** round_dp

    def batches(it):
        nids, nmat, npen = bc.value
        for pdf in it:
            q = np.stack(pdf["v"].to_numpy())
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ nmat.T
            # half-away-from-zero at round_dp, then rank by (-sim, nid):
            # the id tie-break rides inside one composite key so top-k
            # is argpartition O(n), not a full-row lexsort O(n log n)
            sims = np.floor(np.abs(sims) * scale + 0.5) / scale * np.sign(sims)
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            self_mask = qids[:, None] == nids[None, :]
            sims[self_mask] = -np.inf
            top = _topk_cols(sims - npen[None, :], k)
            rows = len(qids)
            yield pd.DataFrame(
                {
                    "qid": np.repeat(qids, k),
                    "nid": nids[top].ravel(),
                    "cos_sim": np.take_along_axis(sims, top, axis=1).ravel(),
                    "rank": np.tile(np.arange(1, k + 1, dtype=np.int32), rows),
                }
            )

    return e.mapInPandas(batches, out_schema)


LSH_TARGET_BUCKET_ROWS = 512  # auto plane count aims for ~this bucket size
LSH_MAX_PLANES = 20


def _auto_planes(n_rows: int) -> int:
    """Plane count that keeps the EXPECTED bucket size near
    :data:`LSH_TARGET_BUCKET_ROWS`: the candidate join's pair volume is
    ~n^2 / 2^planes, so a FIXED plane count is quadratic in disguise —
    3 planes measured 44.4 s at 20k vectors where 10 planes took 4.0 s
    (SCALE_SOAK.md). ceil(log2(n / target)), clamped to [3, 20]."""
    need = max(1, (n_rows + LSH_TARGET_BUCKET_ROWS - 1) // LSH_TARGET_BUCKET_ROWS)
    return max(3, min(LSH_MAX_PLANES, (need - 1).bit_length()))


def knn_join_bucketed(
    emb: DataFrame, k: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
    round_dp: int = 4, num_planes: int | None = None, seed: int = 7,
    dim: int | None = None,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """Approximate all-pairs k-NN via LSH-candidate generation — the
    100 TB shape of :func:`knn_join`. Same output contract (qid, nid,
    cos_sim, rank), approximate recall: each query ranks only candidates
    sharing its sign-bit bucket, so a query's neighbour list can be
    shorter than ``k`` and a true neighbour split across buckets is
    missed (raise recall with fewer planes or multiple plane tables).

    ``num_planes=None`` (default) derives the plane count from the
    corpus size via :func:`_auto_planes` (catalog-stats estimate when
    available, else one pruned-id-column count — a single cheap scan
    that configures the join it precedes): expected bucket size stays
    ~:data:`LSH_TARGET_BUCKET_ROWS`, so the candidate join's pair
    volume grows ~linearly with the corpus instead of quadratically.
    Pass an explicit ``num_planes`` to pin the bucket table (the
    oracle-checked catalog entries do, for cross-engine determinism).

    Everything is a bucket equi-join: one map pass stamps the bucket id,
    the candidate join shuffles on (bucket, id) — never a cross join,
    never a driver collect — and the per-query top-k is a row_number
    window partitioned by qid. At rest the bucket id is a partition
    column, so the candidate join is partition-local.

    ``corpus`` (optional) makes the join ASYMMETRIC: ``emb`` rows are
    the queries and ``corpus`` rows are the candidates (both bucketed
    with the SAME pinned planes, so a query meets exactly the corpus
    vectors sharing its sign-bit bucket). Used by
    :func:`append_route_graph` to link a NEW batch of vectors into an
    existing neighbour graph without recomputing old-old edges.
    """
    from pyspark.sql import Window

    e = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    c = (
        e if corpus is None
        else corpus.select(F.col(id_col), _as_double(vec_col).alias("v"))
    )
    if dim is None:
        dim = _infer_dim(e)
    if num_planes is None:
        est = _estimated_row_count(c)
        if est is None:
            est = c.select(id_col).count()
        num_planes = _auto_planes(est)
    planes = hyperplanes(num_planes, dim, seed)

    def stamp(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket", lsh_bucket(F.col("v"), planes)
        ).withColumn(
            "nrm", norm(F.col("v"))  # once per row, not per candidate pair
        )

    a = stamp(e).select(
        F.col(id_col).alias("qid"), F.col("v").alias("qv"), F.col("bucket"),
        F.col("nrm").alias("qn"),
    )
    b = stamp(c).select(
        F.col(id_col).alias("nid"), F.col("v").alias("nv"),
        F.col("bucket").alias("bucket_b"), F.col("nrm").alias("nn"),
    )
    scored = (
        a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("qid") != F.col("nid")))
        .select(
            "qid", "nid",
            F.round(
                dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")),
                round_dp,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def quantize_int8(
    df: DataFrame, vec: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column, with per-vector
    reconstruction error — the compression pass that shrinks an ANN serving
    index 4x before the similarity ops run on it.

    Pure map-side JVM array math (transform / aggregate fold): scale =
    max|x| / 127, q_i = round(x_i / scale), rmse over the sequential
    index-order fold — deterministic cross-engine, no shuffle at any
    scale. Degenerate all-zero vectors keep scale 0 and rmse 0.
    """
    v = _as_double(F.col(vec))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    q = F.transform(
        v, lambda x: F.when(scale == 0, F.lit(0.0)).otherwise(F.round(x / scale))
    )
    err2 = F.aggregate(
        F.zip_with(v, q, lambda x, qi: F.pow(x - qi * scale, F.lit(2.0))),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    dim = F.size(F.col(vec)).cast("double")
    return df.select(
        id_col,
        F.round(scale, 6).alias("scale"),
        F.round(
            F.when(amax == 0, F.lit(0.0)).otherwise(F.sqrt(err2 / dim)), 6
        ).alias("rmse"),
        F.size(F.filter(q, lambda x: F.abs(x) == 127)).alias("n_saturated"),
    )


def semdedup(
    emb: DataFrame, threshold: float = 0.5, centroid_mod: int | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding",
    round_dp: int = 4, assign_dp: int = 6,
    centroids: DataFrame | None = None, num_centroids: int = 32,
    max_cell_size: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster the corpus (here the IVF
    deterministic-centroid assignment from :func:`ivf_topk`), then mark as
    duplicate every vector that has a LOWER-id cell-mate with cosine >=
    ``threshold``. Returns one row per vector with its cell and keep flag.

    This is the scale shape of embedding near-dup: the O(n^2) pair search
    runs only WITHIN a cell (n/K rows each), so the shuffle keys are
    (cell, id) and the cross product never materialises corpus-wide. A
    production pass k-means-refines the centroids; the per-iteration
    dataflow is identical.

    Like :func:`ivf_topk`, centroids default to the fixed-K
    :func:`fixed_centroids` subset (``centroid_mod`` keeps the corpus-
    growing ``id % mod`` form as a test fixture only — SCALE_SOAK.md
    measured it super-linear at 10x). Sizing: assignment costs O(n*K),
    intra-cell pairing O(n^2 / K) *if cells are balanced* — K ~ sqrt(n)
    balances the two, but balance matters more than K: the pair stage is
    quadratic in the LARGEST cell (measured 10x swings between same-K
    random subsets), so use k-means-learned centroids and cap/salt-split
    oversized cells in a production pass.

    ``max_cell_size`` is that production cap: cells larger than it are
    salt-split into ~ceil(size/cap) sub-cells by a hash of the id, and
    pairing runs within a sub-cell only. Bounds the pair stage at
    O(n * cap) TOTAL regardless of cell skew — one mega-cell can no
    longer go quadratic — at the price of missed cross-salt pairs
    (recall, not precision: every emitted duplicate is still
    cosine-verified). The reported ``cell`` stays the original cell id,
    so downstream grouping is unaffected.
    """
    e = emb.select(
        F.col(id_col), _as_double(vec_col).alias("v")
    ).withColumn("nrm", norm(F.col("v")))  # once per row, reused by both
    # the K-centroid assignment scan and the intra-cell pair stage
    cents = _centroid_set(
        e.drop("nrm"), centroids, centroid_mod, num_centroids, id_col
    ).withColumn("ncv", norm(F.col("cv")))
    scored = e.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col("cid"),
        F.round(
            dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("ncv")),
            assign_dp,
        ).alias("asim"),
    )
    assigned = scored.groupBy(id_col).agg(
        F.max(F.struct("asim", "cid"))["cid"].alias("cell")
    )
    cells = e.join(assigned, id_col)
    if max_cell_size is not None:
        # salt-split oversized cells: the pairing key becomes (cell,
        # salt) where salt = hash(id) % ceil(cell_size / cap). The size
        # frame is O(K') rows — broadcast-joined back onto the corpus.
        sizes = cells.groupBy("cell").agg(F.count(F.lit(1)).alias("_cn"))
        cells = (
            cells.join(F.broadcast(sizes), "cell")
            .withColumn(
                "_nsplit",
                F.greatest(
                    F.lit(1).cast("long"),
                    F.ceil(F.col("_cn") / F.lit(max_cell_size)).cast("long"),
                ),
            )
            .withColumn(
                # salt = md5-derived 32-bit hash of the id (":sd" domain
                # tag) mod nsplit — oracle-expressible (hash32_oracle_sql)
                # so a DuckDB mirror reproduces the split exactly; both
                # operands are non-negative, so pmod == %
                "_salt",
                F.pmod(
                    hash32(F.concat(F.col(id_col).cast("string"), F.lit(":sd"))),
                    F.col("_nsplit"),
                ),
            )
            .drop("_cn", "_nsplit")
        )
    else:
        cells = cells.withColumn("_salt", F.lit(0).cast("long"))
    a = cells.select(
        F.col(id_col).alias("vec_a"), F.col("v").alias("va"), F.col("cell"),
        F.col("_salt"), F.col("nrm").alias("na"),
    )
    b = cells.select(
        F.col(id_col).alias("vec_b"), F.col("v").alias("vb"),
        F.col("cell").alias("cell_b"), F.col("_salt").alias("_salt_b"),
        F.col("nrm").alias("nb"),
    )
    # within-(cell, salt) pairs only; a < b keeps the earliest id in a group
    dup_b = (
        a.join(
            b,
            (F.col("cell") == F.col("cell_b"))
            & (F.col("_salt") == F.col("_salt_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .filter(
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                round_dp,
            )
            >= threshold
        )
        .select(F.col("vec_b").alias(id_col))
        .distinct()
    )
    return (
        cells.join(dup_b.withColumn("dup", F.lit(1)), id_col, "left")
        .select(
            id_col,
            "cell",
            F.when(F.col("dup").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
        )
    )


def pq_quantize(
    emb: DataFrame, n_blocks: int = 4, n_codes: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int | None = None, dist_dp: int = 6, mse_dp: int = 4,
) -> DataFrame:
    """Product quantization (the FAISS IVF-PQ memory-compression step):
    the vector is split into ``n_blocks`` contiguous sub-vectors, each
    assigned to the nearest of ``n_codes`` sub-codebook entries by L2;
    a d-dim float vector compresses to ``n_blocks`` small codes
    (64 x 4 bytes -> 4 bytes here — the difference between an ANN index
    that fits in cluster RAM at 100 TB and one that does not).

    Codebook: the first ``n_codes`` corpus vectors by id, sliced per
    block — deterministic and oracle-mirrorable (``ORDER BY id LIMIT
    n_codes``; a production index k-means-refines the codebook exactly
    like :func:`kmeans_centroids` refines IVF centroids; the assignment
    dataflow — the part that sees all 100 TB — is identical either way).

    Scale shape: the codebook collect is O(n_codes) rows (bounded,
    driver-side control like :func:`fixed_centroids`); assignment is
    per-row JVM expressions over literal arrays — map-only, zero
    shuffle. Distances round to ``dist_dp`` before the argmin so Spark
    and the SQL oracle pick identical codes; ties break to the lowest
    code (first-occurrence ``array_position``).

    Output: ``(id, code_0..code_{B-1}, mse)`` where mse is the mean
    squared reconstruction error implied by the chosen codes.
    """
    e = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    if dim is None:
        dim = _infer_dim(e)
    if dim % n_blocks != 0:
        raise ValueError(f"dim={dim} not divisible by n_blocks={n_blocks}")
    sub = dim // n_blocks
    cb_rows = e.orderBy(F.col(id_col)).limit(n_codes).collect()
    if len(cb_rows) < n_codes:
        raise ValueError(
            f"corpus has {len(cb_rows)} rows < n_codes={n_codes}"
        )
    cb = [list(r["v"]) for r in sorted(cb_rows, key=lambda r: r[id_col])]
    cols: list[Column] = [F.col(id_col)]
    min_dists: list[Column] = []
    for bi in range(n_blocks):
        sl = F.slice(F.col("v"), bi * sub + 1, sub)
        dists = []
        for c in range(n_codes):
            cvec = F.array(
                *[F.lit(float(x)) for x in cb[c][bi * sub : (bi + 1) * sub]]
            )
            d2 = F.aggregate(
                F.zip_with(sl, cvec, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            dists.append(F.round(d2, dist_dp))
        darr = F.array(*dists)
        cols.append(
            F.array_position(darr, F.array_min(darr)).alias(f"code_{bi}")
        )
        min_dists.append(F.array_min(darr))
    total = min_dists[0]
    for m in min_dists[1:]:
        total = total + m
    cols.append(F.round(total / F.lit(float(dim)), mse_dp).alias("mse"))
    return e.select(*cols)


def pq_adc_topk(
    emb: DataFrame, k: int = 10, query_id: int | None = None,
    n_blocks: int = 4, n_codes: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int | None = None, dist_dp: int = 6,
) -> DataFrame:
    """ANN search over product-quantized codes via Asymmetric Distance
    Computation (the FAISS IVF-PQ query path): the query vector stays
    full-precision; per block a ``n_codes``-entry lookup table of
    L2 distances from the query sub-vector to every codebook entry is
    precomputed once, and each corpus vector's approximate distance is
    just ``n_blocks`` table lookups summed — the scan never touches the
    original floats.

    Scale shape: the LUT build is O(n_codes * dim) driver-side work on
    the already-bounded codebook (plus one 1-row collect for the query
    vector); the scan is map-only lookups over the 4-byte codes, and
    top-k compiles to TakeOrderedAndProject (per-partition heaps, K-row
    merge — no global sort). At 100 TB this is the difference between
    scanning 4 B/vector and 256 B/vector.

    Output: ``(id, adc_dist)`` for the k nearest by approximate
    distance, ties broken on ascending id.
    """
    e = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    if dim is None:
        dim = _infer_dim(e)
    sub = dim // n_blocks
    cb_rows = e.orderBy(F.col(id_col)).limit(n_codes).collect()
    cb = [list(r["v"]) for r in sorted(cb_rows, key=lambda r: r[id_col])]
    if query_id is None:
        query_id = min(r[id_col] for r in cb_rows)
    q_rows = e.filter(F.col(id_col) == query_id).limit(1).collect()
    if not q_rows:
        raise ValueError(f"query_id={query_id} not found")
    q = list(q_rows[0]["v"])
    codes = pq_quantize(
        emb, n_blocks=n_blocks, n_codes=n_codes, id_col=id_col,
        vec_col=vec_col, dim=dim, dist_dp=dist_dp,
    )
    dist = F.lit(0.0)
    for bi in range(n_blocks):
        lut = [
            # (d*d, not d**2: libm pow is not guaranteed bit-identical to
            # multiplication, and the oracle multiplies)
            round(
                sum(
                    (q[bi * sub + i] - cb[c][bi * sub + i])
                    * (q[bi * sub + i] - cb[c][bi * sub + i])
                    for i in range(sub)
                ),
                dist_dp,
            )
            for c in range(n_codes)
        ]
        dist = dist + F.element_at(
            F.array(*[F.lit(x) for x in lut]), F.col(f"code_{bi}").cast("int")
        )
    return (
        codes.filter(F.col(id_col) != query_id)
        .select(F.col(id_col), F.round(dist, dist_dp).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def knn_join_sampled(
    emb: DataFrame, k: int = 3, sample_mod: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    round_dp: int = 4, max_sample_rows: int = 1_000_000,
) -> DataFrame:
    """EXACT k-NN for a deterministic hash-sample of query vectors against
    the FULL corpus — the evaluation shape that stays linear at 100 TB.

    :func:`knn_join`'s arrow engine broadcasts the CORPUS matrix, so it is
    bounded by corpus size. Recall evaluation doesn't need every query:
    it needs an unbiased sample scored exactly. This operator inverts the
    broadcast — the (small) query sample (``id % sample_mod == 0``)
    collects and broadcasts, each corpus partition scores its rows
    against the sample with one GEMM and keeps a per-partition top-k PER
    QUERY, and a final qid-keyed aggregation merges the bounded
    candidate set (|sample| * k * n_partitions rows, never the corpus).
    Top-k is distributive, so the result is exactly
    ``knn_join(...)`` restricted to sampled qids — pinned by test.

    Same determinism contract as knn_join: similarity rounded
    half-away-from-zero at ``round_dp`` before ranking, ties break on
    ascending neighbour id. Raises if the sample exceeds
    ``max_sample_rows`` instead of silently collecting too much.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StructField, StructType,
    )

    e = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    sample = e.filter(F.pmod(F.col(id_col), F.lit(sample_mod)) == 0)
    qrows = sample.limit(max_sample_rows + 1).collect()
    if len(qrows) > max_sample_rows:
        raise ValueError(
            f"knn_join_sampled: query sample exceeds max_sample_rows="
            f"{max_sample_rows}; raise sample_mod (or the cap) so the "
            "broadcast side stays bounded"
        )
    if not qrows:
        # no id divisible by sample_mod (or empty input): an empty result
        # with the output schema, not a numpy AxisError from norm() over
        # a (0,)-shaped array
        return emb.sparkSession.createDataFrame(
            [],
            "qid long, nid long, cos_sim double, rank int",
        )
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qmat = np.array([r["v"] for r in qrows], dtype=np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bc = e.sparkSession.sparkContext.broadcast((qids, qmat))

    cand_schema = StructType(
        [
            StructField("qid", LongType(), False),
            StructField("nid", LongType(), False),
            StructField("cos_sim", DoubleType(), False),
        ]
    )
    scale = 10.0 ** round_dp

    # Query-block tiling (round 8): the GEMM's |sample| x |batch| sims
    # matrix is the kernel's only unbounded memory — at a 50k-query
    # sample against 10k-row Arrow batches it is ~4 GB per task and 32
    # concurrent tasks thrash the box. Tiling the SAMPLE side bounds it
    # at q_block x |batch| (~160 MB) with bit-identical output: the
    # per-partition top-k per query is computed per block, and blocks
    # partition the queries, so no cross-block state exists.
    q_block = 2048

    def batches(it):
        sq, sm = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            c = np.stack(pdf["v"].to_numpy())
            c = c / np.linalg.norm(c, axis=1, keepdims=True)
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            cpen = _id_rank_penalty(cids, round_dp)  # once per batch
            for q0 in range(0, len(sq), q_block):
                bq, bm = sq[q0 : q0 + q_block], sm[q0 : q0 + q_block]
                sims = bm @ c.T  # q_block x |partition rows|
                sims = (
                    np.floor(np.abs(sims) * scale + 0.5) / scale
                    * np.sign(sims)
                )
                sims[bq[:, None] == cids[None, :]] = -np.inf  # self-match
                kk = min(k, sims.shape[1])
                top = _topk_cols(sims - cpen[None, :], kk)
                tops = np.take_along_axis(sims, top, axis=1)
                keep = np.isfinite(tops).ravel()
                yield pd.DataFrame(
                    {
                        "qid": np.repeat(bq, kk)[keep],
                        "nid": cids[top].ravel()[keep],
                        "cos_sim": tops.ravel()[keep],
                    }
                )

    cand = e.mapInPandas(batches, cand_schema)
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def graph_route_topk(
    emb: DataFrame, k: int = 5,
    hops: int = 3, beam: int = 8, n_entries: int = 4, entry_mod: int = 16,
    query_mod: int = 25, edge_k: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
    round_dp: int = 4, num_planes: int | None = None,
    seeds: tuple[int, ...] = (7, 11),
    dim: int | None = None,
) -> DataFrame:
    """Graph-ROUTED approximate nearest-neighbour search — the
    HNSW-class family member the LSH/IVF/PQ entries don't cover: a
    k-NN neighbourhood GRAPH is built once, and each query walks it
    with a bounded beam instead of scanning buckets or cells.

    Semantics (fixed and cross-engine deterministic, so a SQL oracle
    can replay the walk exactly):

    * graph edges = the UNION over ``seeds`` of each node's
      top-``edge_k`` bucketed-LSH neighbours (:func:`knn_join_bucketed`
      with pinned planes — the scale form whose oracle discipline is
      already established). Two independent plane tables matter: a
      single-table graph is bucket-CONSTRAINED, so true neighbours
      split across a bucket boundary are unreachable no matter how far
      the walk goes (measured reachability ceiling 0.52 one-table vs
      1.00 two-table on the clustered fixture) — the same diversity
      role NN-descent's random links play in real graph builds;
    * queries = nodes with ``id % query_mod == 0``;
    * COARSE ROUTING LAYER (the role of HNSW's upper layers): each
      query exactly scores the deterministic sample
      ``id % entry_mod == 0`` and keeps its ``n_entries`` best as
      per-query entry points. This layer is what makes the walk able
      to CROSS clusters — a pure kNN graph on separated clusters is
      disconnected, so global entry points strand the beam in the
      wrong cluster (measured recall 0.13 with fixed smallest-id
      entries on an 8-cluster fixture; 0.98 with all three fixes at
      the catalog dials);
    * ``hops`` rounds of beam search: take the ``beam`` best nodes seen
      so far per query (by rounded cosine desc, id asc), expand their
      out-edges, exactly-score the new candidates against the query,
      and merge into the seen set (self excluded);
    * result = per query the top-``k`` of everything seen, with rank.

    SCALE: the per-hop state is Q x beam rows (broadcast side); each
    hop is one edges-scan equi-join + one emb-scan equi-join to fetch
    candidate vectors — never a cross join, never a driver collect, and
    the number of corpus scans is fixed at 2 x hops (+1 for the coarse
    layer) regardless of corpus size. ``entry_mod`` dials the coarse
    layer exactly like an IVF centroid count — at fleet scale it grows
    with sqrt(n) so the probe stays a broadcast. Recall is measured
    against exact kNN in tests; cost is hops x beam x edge_k — the
    standard beam-search ANN trade-off dial.
    """
    edges = build_route_graph(
        emb, edge_k=edge_k, seeds=seeds, id_col=id_col, vec_col=vec_col,
        round_dp=round_dp, num_planes=num_planes, dim=dim,
    )
    return route_on_graph(
        emb, edges, k=k, hops=hops, beam=beam, n_entries=n_entries,
        entry_mod=entry_mod, query_mod=query_mod, id_col=id_col,
        vec_col=vec_col, round_dp=round_dp,
    )


def build_route_graph(
    emb: DataFrame, edge_k: int = 3, seeds: tuple[int, ...] = (7, 11),
    id_col: str = "vec_id", vec_col: str = "embedding",
    round_dp: int = 4, num_planes: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """BUILD half of the graph-routed ANN: the (src, dst) neighbour
    graph — the union over ``seeds`` of each node's top-``edge_k``
    bucketed-LSH neighbours. This is the expensive side (the r9 scale
    soak measured build ~412 s vs search ~free at 500k vectors), so it
    is exposed separately: build once, ``persist()`` / eager-checkpoint
    the result, and route MANY query batches against it with
    :func:`route_on_graph` — the second batch pays search cost only
    (the amortization the r9 verdict asked for; certified by
    llm_ann_graph_route_reuse)."""
    per_table = [
        knn_join_bucketed(
            emb, k=edge_k, id_col=id_col, vec_col=vec_col,
            round_dp=round_dp, num_planes=num_planes, seed=s, dim=dim,
        ).select(F.col("qid").alias("src"), F.col("nid").alias("dst"))
        for s in seeds
    ]
    edges = per_table[0]
    for t in per_table[1:]:
        edges = edges.unionByName(t)
    edges = edges.distinct()
    return edges.localCheckpoint(eager=False)  # scanned once per hop


def append_route_graph(
    emb: DataFrame, new_mod: int = 10,
    edge_k: int = 3, seeds: tuple[int, ...] = (7, 11),
    id_col: str = "vec_id", vec_col: str = "embedding",
    round_dp: int = 4, num_planes: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """INCREMENTAL index maintenance for the graph-routed ANN: link a
    NEW batch of vectors (``id % new_mod == 0``) into the graph built
    over the OLD corpus (the rest) WITHOUT recomputing old-old edges —
    the append path every production graph index (HNSW et al.) runs on
    ingest, vs the full rebuild :func:`build_route_graph` is.

    Deterministic contract (oracle-expressible):

    * old edges = :func:`build_route_graph` over the old subset only;
    * new out-edges = per seed, each new vector's bucketed top-
      ``edge_k`` neighbours among the FULL corpus (old + new, same
      pinned planes — a new vector may link to another new one);
    * back-links = the reverses of the new out-edges (the neighbour
      gains an edge pointing at the new vector — what keeps the new
      node REACHABLE by later walks, not just able to leave);
    * result = distinct union of the three sets.

    The appended graph intentionally differs from a full rebuild: old
    vectors keep their original top-k (a rebuild might evict an old
    neighbour for a closer new one); back-links are how the new batch
    becomes routable without touching old rankings. Cost: the append
    pays O(|new| x bucket density) — never O(|old|^2) — so continuous
    ingest amortizes exactly like build-once/route-many does for
    queries (SCALE_SOAK round 10)."""
    old = emb.filter(F.col(id_col) % new_mod != 0)
    new = emb.filter(F.col(id_col) % new_mod == 0)
    old_edges = build_route_graph(
        old, edge_k=edge_k, seeds=seeds, id_col=id_col, vec_col=vec_col,
        round_dp=round_dp, num_planes=num_planes, dim=dim,
    )
    per_seed = [
        knn_join_bucketed(
            new, k=edge_k, id_col=id_col, vec_col=vec_col,
            round_dp=round_dp, num_planes=num_planes, seed=s, dim=dim,
            corpus=emb,
        ).select(F.col("qid").alias("src"), F.col("nid").alias("dst"))
        for s in seeds
    ]
    new_out = per_seed[0]
    for t in per_seed[1:]:
        new_out = new_out.unionByName(t)
    back = new_out.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return old_edges.unionByName(new_out).unionByName(back).distinct()


#: rows of walk state one checkpoint partition holds before a second is
#: added — ~40-byte (query_id, nid, cos_sim) rows, so 100k rows ≈ 4 MB.
WALK_STATE_ROWS_PER_PARTITION = 100_000


def walk_state_partitions(
    n_rows: int, rows_per_partition: int = WALK_STATE_ROWS_PER_PARTITION,
) -> int:
    """Partition count for the beam walk's per-hop state checkpoints:
    ceil(n_rows / rows_per_partition), clamped to [1, 4096]. The state
    is queries x beam rows; at bench scale that is ~1k rows -> 1
    partition (a 32-partition layout scheduled 32 near-empty tasks per
    downstream scan, r13), while a production batch of 1e6 queries x
    beam 8 gets 80 partitions instead of funnelling through one task
    (ADVICE r13 / VERDICT r13 item 5 — the hard ``coalesce(1)`` was a
    local-mode assumption)."""
    return max(1, min(4096, -(-n_rows // rows_per_partition)))


def route_on_graph(
    emb: DataFrame, edges: DataFrame, k: int = 5,
    hops: int = 3, beam: int = 8, n_entries: int = 4, entry_mod: int = 16,
    query_mod: int = 25, query_rem: int | tuple[int, ...] = 0,
    id_col: str = "vec_id", vec_col: str = "embedding",
    round_dp: int = 4, entries: DataFrame | None = None,
) -> DataFrame:
    """SEARCH half of the graph-routed ANN: coarse entry layer + beam
    walk over a prebuilt ``edges`` graph (see :func:`build_route_graph`
    and :func:`graph_route_topk` for semantics). ``query_rem`` selects
    the query batch (``id % query_mod == query_rem``) so successive
    batches can replay over ONE build. ``entries`` optionally supplies
    the coarse routing layer as a persisted single-column (``nid``)
    table — the build-nightly/route-all-day deployment persists BOTH
    halves of the index (edges + entry sample) and this is how the
    reader hands them back (r10 verdict item 6; see
    plans/catalog_round11.py:llm_ann_graph_persist); when None the
    sample is derived from ``emb`` by ``id % entry_mod == 0`` as
    before.

    ``query_rem`` may be a TUPLE of remainders: every step of the walk
    (entry scoring, beam selection, frontier expansion, final top-k) is
    partitioned by ``query_id``, so queries never interact and routing
    N batches through one walk returns row-for-row what N separate
    calls return — while paying the per-hop job/checkpoint overhead
    once instead of N times (optimization round 13: the two-batch
    replay entry was job-count-bound, 143 jobs for ~1k tiny tasks)."""
    from pyspark.sql import Window

    rems = (query_rem,) if isinstance(query_rem, int) else tuple(query_rem)
    e = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    nodes = e.select(
        F.col(id_col).alias("nid"), F.col("v").alias("nv"),
        norm(F.col("v")).alias("nn"),
    )
    queries = e.filter((F.col(id_col) % query_mod).isin(list(rems))).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
        norm(F.col("v")).alias("qn"),
    # O(query batch) rows, broadcast into score() once per hop plus the
    # entry layer — pin it so each consumer reads one materialization
    # instead of re-running the corpus scan + filter + norm (the frame
    # is control-plane-sized at any corpus scale; the CORPUS-sized
    # `nodes` frame is deliberately NOT cached here — see route's
    # docstring, the persisted-index entries hand it in from storage)
    ).localCheckpoint(eager=False)
    sample = (
        entries.select("nid")
        if entries is not None
        else e.filter(F.col(id_col) % entry_mod == 0).select(
            F.col(id_col).alias("nid")
        )
    )

    def score(cand: DataFrame) -> DataFrame:
        """(query_id, nid) -> + rounded cosine; both joins broadcast the
        tiny candidate/query side against the node table."""
        return (
            cand.join(nodes, "nid")
            .join(F.broadcast(queries), "query_id")
            .filter(F.col("nid") != F.col("query_id"))
            .select(
                "query_id", "nid",
                F.round(
                    dot(F.col("qv"), F.col("nv"))
                    / (F.col("qn") * F.col("nn")),
                    round_dp,
                ).alias("cos_sim"),
            )
        )

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("nid")
    )
    # coarse layer: every query scores the sample, keeps its best
    # n_entries as entry points (per-query, so the walk starts in the
    # right region of a clustered corpus)
    seen = (
        score(queries.select("query_id").crossJoin(F.broadcast(sample)))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_entries)
        .drop("rk")
    )
    # expanded = nodes whose out-edges were already followed for this
    # query; excluding them from the next frontier makes each hop
    # explore NEW ground (without it the top-beam re-expands the same
    # nodes every round and the walk stalls one hop from the entries)
    expanded = seen.select("query_id", "nid").limit(0)
    # Walk-state partition count, derived from the state SIZE instead of
    # a constant (ADVICE r13 / VERDICT r13 item 5): the per-hop state is
    # <= n_queries x (n_entries + hops x beam x edge-fanout) rows of
    # ~40 bytes.  At bench scale that is ~1k rows -> 1 partition (the
    # r13 finding: a 32-partition layout scheduled 32 near-empty tasks
    # per downstream scan); at a production batch of 1e6 queries the
    # count grows linearly so no single task funnels the whole state.
    # The count() runs once per walk and doubles as the materialization
    # of the lazily-checkpointed ``queries`` frame, which every hop's
    # score() broadcast was going to force anyway.
    n_queries = queries.count()
    state_parts = walk_state_partitions(n_queries * beam)
    for _ in range(hops):
        # EAGER checkpoints: the per-hop state is queries x beam rows
        # (tiny), but its LAZY lineage is a nested window/anti-join/
        # union tree that doubles per hop — materializing each round
        # keeps the driver's planning cost linear in hops (measured
        # 61 s -> ~8 s at sf0.01 on local[8]).
        seen = seen.coalesce(state_parts).localCheckpoint(eager=True)
        frontier = (
            seen.join(expanded, ["query_id", "nid"], "left_anti")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= beam)
            .select("query_id", "nid")
            # EAGER checkpoint of the hop's frontier (VERDICT r13 item
            # 3): ``expanded`` — the union of every prior frontier — is
            # consumed by the anti-join above on EVERY later hop, and
            # ``frontier`` itself by two consumers (the union and the
            # edge join below).  Round 13 removed this materialization
            # and each hop re-executed all earlier frontier window/
            # anti-join subtrees inside one big job: route regressed in
            # BOTH the driver window (2.03x raw) and the builder's own
            # clean stamp (1.21x raw) despite halved job counts.
            # Checkpointing the per-hop frontier (queries x beam rows —
            # strictly smaller than r12's full-``expanded`` checkpoint)
            # makes ``expanded`` a union of already-materialized RDDs:
            # one extra tiny job per hop buys zero recomputation.
            .localCheckpoint(eager=True)
        )
        expanded = expanded.unionByName(frontier)
        # No ``.distinct()`` on the candidate set (VERDICT r13 item 7 —
        # fewer exchanges per hop): duplicate (query_id, nid) candidates
        # (several frontier nodes sharing an out-neighbour) score to
        # IDENTICAL rows (same rounded cosine), and the dropDuplicates
        # below already folds them — the dedup exchange per hop bought
        # nothing but a stage. Scoring the few duplicates is broadcast-
        # join work, far cheaper than the exchange it replaces.
        new = (
            F.broadcast(frontier)
            .join(edges, frontier["nid"] == edges["src"])
            .select("query_id", F.col("dst").alias("nid"))
        )
        seen = (
            seen.unionByName(score(new))
            .dropDuplicates(["query_id", "nid"])
        )
    return (
        seen.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def kcenter_coreset(
    emb: DataFrame, k: int, m: int = 1, seed_id: int = 0,
    id_col: str = "vec_id", vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """k-center coreset by (batched) farthest-point traversal
    (Gonzalez 1985). ``m=1`` is the pure greedy: each corpus scan adds
    the single point whose max cosine to the selected set is smallest
    (ties on id) — k-1 scans for a k-point coreset. ``m>1`` is the
    batched form (r10 verdict item 4): each scan adds the ``m`` most
    uncovered points judged against the selected set AS OF the scan
    start, cutting the scan count to ceil((k-1)/m) at the standard
    batched-farthest-point price — batch members are chosen blind to
    each other, so one batch can contain mutually-close points pure
    Gonzalez would have spread. Every scan is one corpus pass against
    the broadcast selected set (<= k rows) ending in a TakeOrdered(m);
    pairs are never materialized corpus-wide. Returns
    (rank, id, maxsim): rank in selection order (within a batch, by
    (maxsim, id)), maxsim = coverage at selection time — the radius
    curve. Scan count: ceil((k-1)/m) — the dial that makes k=1024
    affordable (m=32 -> 32 scans, not 1023). If ``k`` exceeds the
    corpus size the traversal stops when the corpus is exhausted and
    returns every vector (fewer than k rows) rather than spinning on
    empty scans (review r11 — the pre-refactor code crashed here)."""
    e = emb.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("v")
    )
    e = e.localCheckpoint(eager=False)  # scanned once per batch
    seed_rows = e.filter(F.col("vec_id") == seed_id).collect()
    if not seed_rows:  # empty corpus or absent seed (ADVICE r11)
        raise ValueError(
            f"kcenter_coreset: seed {id_col}={seed_id} not present in "
            "the corpus (or the corpus is empty)"
        )
    first = seed_rows[0]
    picked = [(1, int(first["vec_id"]), 1.0)]
    sel = [(int(first["vec_id"]), first["v"])]
    while len(picked) < k:
        take = min(m, k - len(picked))
        sel_df = F.broadcast(
            e.sparkSession.createDataFrame(
                sel, "sid long, sv array<double>"
            )
        )
        batch = (
            e.filter(~F.col("vec_id").isin([s[0] for s in sel]))
            .crossJoin(sel_df)
            .groupBy("vec_id")
            .agg(
                F.max(
                    F.round(cosine(F.col("v"), F.col("sv")), round_dp)
                ).alias("ms")
            )
            .orderBy("ms", "vec_id")
            .limit(take)
            .join(e, "vec_id")
            .collect()
        )
        if not batch:  # k > corpus size: nothing left to select
            break
        # the limit->join can reorder the batch; rank follows the same
        # (ms, vec_id) order the unrolled oracle's row_number uses
        for row in sorted(batch, key=lambda r: (r["ms"], r["vec_id"])):
            picked.append(
                (len(picked) + 1, int(row["vec_id"]), float(row["ms"]))
            )
            sel.append((int(row["vec_id"]), row["v"]))
    out = e.sparkSession.createDataFrame(
        picked, "rank int, vec_id long, maxsim double"
    )
    return out.select(
        "rank",
        F.col("vec_id").alias(id_col) if id_col != "vec_id" else "vec_id",
        F.round("maxsim", round_dp).alias("maxsim"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k0: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.) of N ranked lists into one:
    ``score(d) = sum over systems of 1 / (k0 + rank_s(d))`` — the standard
    way hybrid retrieval merges a lexical (BM25) and a vector (cosine)
    ranking without score calibration, and the candidate-merge step a
    training-data curation pipeline runs before dedup/selection.

    Each input must carry ``(id_col, rank)`` with rank 1-based. The
    contribution is fixed-pointed per (system, rank) as
    ``floor(1e9 / (k0 + rank))`` BEFORE summing, so the fused score is an
    exact integer — identical across engines regardless of float addition
    order. Ties break on ascending id.

    SCALE: ranked lists are top-N outputs (thousands of rows at most), so
    the outer joins are broadcast-sized by construction; the heavy work
    lives in the upstream rankers. No corpus-sized state here.
    """
    contrib = (
        F.floor(F.lit(1_000_000_000) / (F.lit(k0) + F.col("rank")))
        .cast("long")
        .alias("contrib")
    )
    parts = [r.select(F.col(id_col), contrib) for r in rankings]
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    fused = allc.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_systems"),
        F.sum("contrib").alias("rrf9"),
    )
    return fused.orderBy(F.desc("rrf9"), F.asc(id_col)).limit(k)


def precision_recall_at_k(
    ranked: DataFrame,
    positives: DataFrame,
    cutoffs: list[int],
    id_col: str = "vec_id",
) -> DataFrame:
    """Precision@K / recall@K sweep for a ranked retrieval list against a
    binary relevance table — the eval readout any retrieval/dedup ranker
    ships with. ``ranked`` carries ``(id_col, rank)`` (1-based, top-N
    only); ``positives`` carries the ids of ALL relevant items.

    tp@K is a running sum over the ranked list (a window over at most
    max(cutoffs) rows — the list is a top-N, never the corpus, so the
    single-partition window is bounded by construction); the positive
    total is one global aggregate broadcast back. Ratios are
    fixed-pointed to 1e-6 AFTER the integer counts, so both engines
    agree exactly.
    """
    from pyspark.sql import Window

    max_k = max(cutoffs)
    pos = positives.select(F.col(id_col), F.lit(1).alias("rel"))
    marked = (
        ranked.filter(F.col("rank") <= max_k)
        .join(F.broadcast(pos), id_col, "left")
        .select("rank", F.coalesce(F.col("rel"), F.lit(0)).alias("rel"))
    )
    w = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    run = marked.select(
        "rank", F.sum("rel").over(w).cast("long").alias("tp")
    )
    cuts = run.filter(
        F.col("rank").isin([int(c) for c in cutoffs])
    ).select(F.col("rank").alias("k"), "tp")
    n_pos = positives.agg(F.count(F.lit(1)).cast("long").alias("n_pos"))
    return (
        cuts.crossJoin(F.broadcast(n_pos))
        .select(
            "k",
            "tp",
            F.floor(F.col("tp") * 1_000_000.0 / F.col("k") + F.lit(0.5))
            .cast("long")
            .alias("precision6"),
            F.floor(
                F.col("tp") * 1_000_000.0 / F.col("n_pos") + F.lit(0.5)
            )
            .cast("long")
            .alias("recall6"),
        )
        .orderBy("k")
    )


def ndcg_at_k(
    ranked: DataFrame,
    labels: DataFrame,
    discounts: list[tuple[int, float]],
    cutoffs: list[int],
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """nDCG@K sweep with GRADED relevance — the ranking-quality readout
    for a retrieval/curation ranker when relevance isn't binary.

    ``ranked`` carries ``(id_col, rank)`` (1-based top-N); ``labels``
    maps every id to an integer gain; ``discounts`` is the
    ``rank -> 1/log2(rank+1)`` table PRECOMPUTED in Python and passed in
    as literals — the SQL oracle injects the same repr-round-tripped
    constants, so neither engine evaluates a transcendental and the
    JVM-vs-libm 1-ulp class is gone at the source. Per-rank
    contributions fixed-point to 1e-6 BEFORE summing (gain * discount
    is one double multiply on bit-identical operands), so DCG/IDCG are
    exact integer running sums and nDCG an integer-ratio readout.

    The ideal ranking re-ranks the LABEL table by gain descending —
    a TakeOrdered top-N like the actual ranking; all windows run over
    max(cutoffs) rows, never the corpus.
    """
    from pyspark.sql import Window

    spark = ranked.sparkSession
    max_k = max(cutoffs)
    disc = spark.createDataFrame(discounts, "rank long, disc double")
    contrib = (
        F.floor(
            F.lit(1_000_000.0) * F.col(label_col) * F.col("disc")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("c6")
    )
    actual = (
        ranked.filter(F.col("rank") <= max_k)
        .join(labels, id_col)
        .join(F.broadcast(disc), "rank")
        .select("rank", contrib)
    )
    ideal = (
        labels.filter(F.col(id_col).isNotNull())
        .orderBy(F.desc(label_col), F.asc(id_col))
        .limit(max_k)
        .select(
            F.col(label_col),
            F.row_number()
            .over(Window.orderBy(F.desc(label_col), F.asc(id_col)))
            .alias("rank"),
        )
        .join(F.broadcast(disc), "rank")
        .select("rank", contrib)
    )
    w = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    run = (
        actual.join(
            ideal.select(F.col("rank"), F.col("c6").alias("ic6")), "rank"
        )
        .select(
            "rank",
            F.sum("c6").over(w).cast("long").alias("dcg6"),
            F.sum("ic6").over(w).cast("long").alias("idcg6"),
        )
    )
    return (
        run.filter(F.col("rank").isin([int(c) for c in cutoffs]))
        .select(
            F.col("rank").alias("k"),
            "dcg6",
            "idcg6",
            F.floor(
                F.lit(1_000_000.0) * F.col("dcg6") / F.col("idcg6")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("ndcg6"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# persisted IVF-PQ index kernels (round 12 — r11 verdict item 7)
# ---------------------------------------------------------------------------


def ivf_assign_cells(
    e: DataFrame, cents: DataFrame, assign_dp: int = 6,
) -> DataFrame:
    """The shared IVF E-step: assign every ``(vec_id, v)`` vector to its
    argmax-cosine centroid cell — similarity rounded to ``assign_dp``
    BEFORE the argmax, ties to the larger cid, so every engine (and the
    SQL oracle's row_number mirror) picks identically. One O(n*K)
    broadcast pass + a per-vector partial-agg; returns
    ``(vec_id, cell)``. Used by :func:`ivf_pq_encode`,
    :func:`lloyd_refine`, and the cell-balance stats entry."""
    return (
        e.withColumn("nrm", norm(F.col("v")))
        .crossJoin(F.broadcast(cents.withColumn("ncv", norm(F.col("cv")))))
        .select(
            "vec_id",
            "cid",
            F.round(
                dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("ncv")),
                assign_dp,
            ).alias("asim"),
        )
        .groupBy("vec_id")
        .agg(F.max(F.struct("asim", "cid"))["cid"].alias("cell"))
    )


def lloyd_refine(
    e: DataFrame, cents: DataFrame, iters: int = 1,
    assign_dp: int = 6, cent_dp: int = 6,
) -> DataFrame:
    """Lloyd-refine a ``(cid, cv)`` centroid frame over ``(vec_id, v)``
    vectors — the oracle-reproducible form of :func:`kmeans_centroids`
    (r12 verdict item 3: balanced cells are what make nprobe/K scan
    economics hold on skewed corpora; the md5-ordered seed set leaves
    cell sizes uncontrolled).

    Each iteration: E-step = the broadcast-argmax cosine assignment
    every IVF kernel uses (rounded to ``assign_dp`` before the argmax,
    tie larger cid); M-step = per-(cell, dim) mean via posexplode + one
    partial-agg shuffle — O(n*d) components in, O(K*d) rows out — with
    each mean ROUNDED to ``cent_dp`` before reuse so both engines carry
    bit-identical centroids into the next assignment (the unrounded
    means of :func:`kmeans_centroids` are fine for injection but not
    for a cross-engine value hash). Empty cells keep their previous
    centroid. Fully declarative: the refined arrays are rebuilt with
    array_sort(collect_list(struct(pos, m))) — no driver collect at
    all, unlike :func:`kmeans_centroids`'s bounded O(K*d) one.
    """
    for _ in range(iters):
        assigned = ivf_assign_cells(e, cents, assign_dp=assign_dp)
        comp = (
            e.join(assigned, "vec_id")
            .select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("x"), cent_dp).alias("m"))
        )
        refined = (
            comp.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                F.col("cell").alias("cid"),
                F.transform("pm", lambda s: s["m"]).alias("rcv"),
            )
        )
        cents = cents.join(refined, "cid", "left").select(
            "cid", F.coalesce("rcv", "cv").alias("cv")
        )
    return cents


def pq_train_blocks(
    e: DataFrame, cb: DataFrame, n_blocks: int = 4,
    dim: int | None = None, dist_dp: int = 6, cent_dp: int = 6,
) -> DataFrame:
    """One k-means iteration PER BLOCK on a PQ codebook — the product-
    quantization analogue of :func:`lloyd_refine`: each code's block-
    ``bi`` codeword moves to the mean of the subvectors assigned to it
    (assignment = rounded block-L2 argmin, tie lower code — the exact
    rule :func:`ivf_pq_encode` ranks with), means rounded to
    ``cent_dp`` so the oracle carries bit-identical codewords. Blocks
    train INDEPENDENTLY (that is what makes PQ codes multiplicative:
    8 codes x 4 blocks = 4096 distinct reconstructions from 32
    codewords), so the returned frame keeps the ``(code, cv)`` shape —
    ``cv``'s block ``bi`` slice is block ``bi``'s trained codeword —
    and every downstream kernel (encode / LUT / ADC) runs unchanged on
    it. Codes that capture no vectors in a block keep their seed slice.

    Measured on the isotropic synthetic corpus (sf0.01, SCALE_SOAK
    round 13): recall@5 of the production config triples (0.02 -> 0.06
    at nprobe=2; 0.08 -> 0.14 scanning every cell) — the quantization
    loss the recall gate exposed is exactly what this trains away.

    Scale shape: one O(n*codes) broadcast scoring pass (shared with
    encode) + n_blocks posexplode partial-agg shuffles bounded at
    codes x dim/n_blocks output rows each; the codebook never leaves
    the executors.
    """
    if dim is None:
        dim = _infer_dim(e)
    sub = dim // n_blocks

    def block_d(bi: int):
        vsl = F.slice(F.col("v"), bi * sub + 1, sub)
        csl = F.slice(F.col("cv"), bi * sub + 1, sub)
        return F.round(
            F.aggregate(
                F.zip_with(vsl, csl, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda s, x: s + x,
            ),
            dist_dp,
        )

    scored = e.crossJoin(F.broadcast(cb)).select(
        "vec_id",
        "code",
        *[block_d(bi).alias(f"d_{bi}") for bi in range(n_blocks)],
    )
    codes = scored.groupBy("vec_id").agg(
        *[
            F.min(F.struct(F.col(f"d_{bi}"), F.col("code")))["code"]
            .alias(f"code_{bi}")
            for bi in range(n_blocks)
        ]
    )
    ecb = e.join(codes, "vec_id")
    out = cb
    for bi in range(n_blocks):
        blk = (
            ecb.select(
                F.col(f"code_{bi}").alias("code"),
                F.posexplode(F.slice(F.col("v"), bi * sub + 1, sub)).alias(
                    "pos", "x"
                ),
            )
            .groupBy("code", "pos")
            .agg(F.round(F.avg("x"), cent_dp).alias("m"))
            .groupBy("code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "code", F.transform("pm", lambda s: s["m"]).alias(f"blk_{bi}")
            )
        )
        out = out.join(blk, "code", "left")
    # O(codes) rows consumed by BOTH the encode pass and the ADC LUT —
    # pin the training result so each consumer doesn't re-run the
    # scoring pass + n_blocks posexplode shuffles (opt round 13: the
    # recall_trained plan carried the whole training subtree twice,
    # 132 Exchange nodes / 64 scans in one plan before this)
    return out.select(
        "code",
        F.flatten(
            F.array(
                *[
                    F.coalesce(
                        F.col(f"blk_{bi}"),
                        F.slice(F.col("cv"), bi * sub + 1, sub),
                    )
                    for bi in range(n_blocks)
                ]
            )
        ).alias("cv"),
    ).localCheckpoint(eager=False)


def ivf_pq_build(
    emb: DataFrame, num_centroids: int = 32, n_blocks: int = 4,
    n_codes: int = 8, id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int | None = None, assign_dp: int = 6, dist_dp: int = 6,
    lloyd_iters: int = 0, cent_dp: int = 6,
):
    """TRAIN + ENCODE for the persisted IVF-PQ index: returns
    ``(index, cents, cb)`` where ``index`` is the encoded corpus
    ``(vec_id, code_0..code_{B-1}, cell)`` ready for
    ``storage.write_bucketed(partition_cols=["cell"])``, ``cents`` the
    ``(cid, cv)`` IVF centroid frame (:func:`fixed_centroids` seeds;
    ``lloyd_iters`` > 0 k-means-refines the seed set via
    :func:`lloyd_refine`, which bounds the largest cell — the persisted
    production index sets 1), and ``cb`` the ``(code, cv)`` PQ codebook
    with 1-based codes matching array_position/list_position.

    Scale shape: one O(n*K) broadcast argmax pass for cells (the
    ivf_topk assignment dataflow) + the O(n*codes) map-only
    :func:`pq_quantize` encode; both round before their arg-extremum
    (ties: larger cid, lower code) so the oracle picks identically.
    Each Lloyd iteration adds one more O(n*K) assignment + one O(n*d)
    component shuffle partial-aggregated to O(K*d) rows. Shared by
    ``llm_ann_ivf_pq_persist`` and the round-12 soak.
    """
    from pyspark.sql import Window

    e = emb.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("v")
    )
    if dim is None:
        dim = _infer_dim(e)
    cents = fixed_centroids(e, num_centroids)
    if lloyd_iters > 0:
        cents = lloyd_refine(
            e, cents, iters=lloyd_iters, assign_dp=assign_dp,
            cent_dp=cent_dp,
        # consumed by the encode AND persisted/read separately: pin the
        # refinement result so each consumer doesn't re-run the E/M pass
        ).localCheckpoint(eager=False)
    cb = (
        e.orderBy("vec_id")
        .limit(n_codes)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("code"),
            F.col("v").alias("cv"),
        )
        # n_codes rows consumed by encode + ADC LUT (+ codebook training
        # in the trained-recall twin): pin so each consumer doesn't
        # re-run the corpus sort/limit (see pq_train_blocks)
        .localCheckpoint(eager=False)
    )
    index = ivf_pq_encode(
        e, cents, cb, n_blocks=n_blocks, dim=dim,
        assign_dp=assign_dp, dist_dp=dist_dp,
    )
    return index, cents, cb


def ivf_pq_encode(
    e: DataFrame, cents: DataFrame, cb: DataFrame, n_blocks: int = 4,
    dim: int | None = None, assign_dp: int = 6, dist_dp: int = 6,
) -> DataFrame:
    """Encode ``(vec_id, v)`` vectors against FROZEN index artifacts —
    the daily-ingest half of the persisted-index lifecycle: new vectors
    must be assigned/quantized with the centroids and codebook the
    index was TRAINED with (typically read back from storage), never a
    codebook re-derived from the ingest batch (which would silently
    make old and new codes incomparable). :func:`ivf_pq_build` is this
    function applied to training-time artifacts.

    Both argmax (cell, tie larger cid) and per-block argmin (code, tie
    lower code via min-struct) round before the extremum, mirroring the
    oracle's row_number/list_position. Map-only against two broadcast
    frames — zero shuffles besides the final per-vector groupBys'
    partial aggregation.
    """
    if dim is None:
        dim = _infer_dim(e)
    sub = dim // n_blocks
    assigned = ivf_assign_cells(e, cents, assign_dp=assign_dp)

    def block_d(bi: int):
        vsl = F.slice(F.col("v"), bi * sub + 1, sub)
        csl = F.slice(F.col("cv"), bi * sub + 1, sub)
        return F.round(
            F.aggregate(
                F.zip_with(vsl, csl, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda s, x: s + x,
            ),
            dist_dp,
        )

    scored = e.crossJoin(F.broadcast(cb)).select(
        "vec_id",
        "code",
        *[block_d(bi).alias(f"d_{bi}") for bi in range(n_blocks)],
    )
    codes = scored.groupBy("vec_id").agg(
        *[
            F.min(F.struct(F.col(f"d_{bi}"), F.col("code")))["code"]
            .alias(f"code_{bi}")
            for bi in range(n_blocks)
        ]
    )
    return assigned.join(codes, "vec_id").select(
        "vec_id", *[f"code_{bi}" for bi in range(n_blocks)], "cell"
    )


def ivf_pq_adc_search(
    queries: DataFrame, codes: DataFrame, cents: DataFrame, cb: DataFrame,
    dim: int, n_blocks: int = 4, nprobe: int = 2, topk: int = 5,
    assign_dp: int = 6, dist_dp: int = 6,
) -> DataFrame:
    """ADC search over a (typically read-back) IVF-PQ index.

    ``queries`` is ``(qid, qv)`` full-precision query vectors; ``codes``
    / ``cents`` / ``cb`` are the stored index artifacts (the caller
    reads them back — this function never touches the original corpus
    floats, the asymmetric-distance contract).

    Plan shape, scale-first: (1) probe — broadcast the K-row centroid
    frame against the query batch, top-``nprobe`` cells per query by
    rounded cosine (window, tie larger cid); (2) a bounded O(K) collect
    of the DISTINCT probed cells becomes a literal IN filter, so the
    index scan prunes unprobed cell PARTITIONS at plan time
    (PartitionFilters — the point of persisting partitioned by cell);
    (3) the per-query LUT (``queries x codes`` rows, each a rounded
    block-L2 against the 8-row broadcast codebook) is materialized once
    and broadcast into one join per block; (4) per-candidate distance
    is ``n_blocks`` lookups summed left-to-right, rounded, ranked per
    query by (adc_dist, vec_id) — TakeOrdered semantics via
    row_number <= topk. Returns ``(qid, vec_id, rnk, adc_dist)``.
    """
    from pyspark.sql import Window

    sub = dim // n_blocks
    qs = queries.select(
        "qid", "qv", norm(F.col("qv")).alias("qn")
    )
    probe = (
        qs.crossJoin(F.broadcast(cents.withColumn("ncv", norm(F.col("cv")))))
        .select(
            "qid",
            "cid",
            F.round(
                dot(F.col("cv"), F.col("qv")) / (F.col("ncv") * F.col("qn")),
                assign_dp,
            ).alias("qsim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.desc("qsim"), F.desc("cid")
                )
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("qid", "cid")
        .localCheckpoint(eager=True)  # consumed twice: cell list + join
    )
    probed_cells = sorted(
        r["cid"] for r in probe.select("cid").distinct().collect()
    )

    def lut_dist(bi: int):
        qsl = F.slice(F.col("qv"), bi * sub + 1, sub)
        csl = F.slice(F.col("cv"), bi * sub + 1, sub)
        return F.round(
            F.aggregate(
                F.zip_with(qsl, csl, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda s, x: s + x,
            ),
            dist_dp,
        )

    luts = (
        qs.crossJoin(F.broadcast(cb))
        .select(
            "qid",
            "code",
            *[lut_dist(bi).alias(f"ld_{bi}") for bi in range(n_blocks)],
        )
        # consumed once per block join: materialize the O(queries x
        # codes) LUT once instead of re-scanning the query batch +
        # codebook n_blocks times
        .localCheckpoint(eager=False)
    )

    cand = codes.filter(F.col("cell").isin(probed_cells)).join(
        F.broadcast(probe), codes["cell"] == probe["cid"]
    )
    for bi in range(n_blocks):
        # LUT-side key columns get block-local aliases (q{bi}/c{bi}) so
        # the join never leaves a duplicate code_{bi} in the candidate
        # frame — downstream name-based references stay unambiguous
        lb = luts.select(
            F.col("qid").alias(f"q{bi}"),
            F.col("code").alias(f"c{bi}"),
            f"ld_{bi}",
        )
        cand = cand.join(
            F.broadcast(lb),
            (F.col("qid") == F.col(f"q{bi}"))
            & (F.col(f"code_{bi}") == F.col(f"c{bi}")),
        ).drop(f"q{bi}", f"c{bi}")
    adc = F.lit(0.0)
    for bi in range(n_blocks):
        adc = adc + F.col(f"ld_{bi}")
    return (
        cand.filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(adc, dist_dp).alias("adc_dist"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.asc("adc_dist"), F.asc("vec_id")
                )
            ),
        )
        .filter(F.col("rnk") <= topk)
        .select("qid", "vec_id", "rnk", "adc_dist")
    )
