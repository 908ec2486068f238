"""Round-8 catalog: quarantine decode for malformed media.

* ``llm_multimodal_quarantine_ppm`` / ``llm_multimodal_quarantine_wav`` —
  the round-7 verdict's task 6: the real container parsers raise typed
  errors on malformed input, but until now no registered entry exercised
  those paths. These entries push a DETERMINISTICALLY corrupted media
  fixture (classes keyed on doc_id % 10, built JVM-side) through a
  quarantining decode wrapper that splits each payload into an 'ok' row
  with integer-exact stats or a 'quarantined' row with a reason code
  naming the exact guard that fired — the binary-media twin of the JSONL
  source's PERMISSIVE corrupt-record path (``quarantine_replay``). The
  DuckDB oracle re-derives the stats for clean docs from the text with
  ord() and pins the reason code per corruption class, so a parser guard
  that stops firing (or fires for the wrong reason) hash-mismatches.

Reference parity note: the reference ETL (helium-arango-etl-lite) has no
media handling; this extends the north-star multimodal family
(plans/catalog_round7.py) with the failure-isolation behaviour a 100 TB
decode stage cannot ship without — one corrupt object must never kill
the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.llm import multimodal as mm
from .registry import load_table, register

_PPM_ROW = 3 * mm.PPM_WIDTH

_PPM_QUAR_SQL = f"""
WITH d AS (SELECT doc_id, text, doc_id % 10 AS cls,
                  least({mm.PPM_MAX_H}, length(text) // {_PPM_ROW}) AS h
           FROM documents WHERE length(text) >= {_PPM_ROW}),
ok AS (SELECT doc_id, ({mm.PPM_WIDTH} * h)::BIGINT AS n_pixels,
              sum(ord(substr(text, i, 1)))::BIGINT AS sum_rgb
       FROM (SELECT doc_id, text, h,
                    unnest(generate_series(1, {_PPM_ROW} * h)) AS i
             FROM d WHERE cls NOT IN (3, 5, 7))
       GROUP BY doc_id, h)
SELECT d.doc_id AS media_id,
       CASE WHEN d.cls IN (3, 5, 7) THEN 'quarantined' ELSE 'ok' END
           AS status,
       CASE d.cls WHEN 3 THEN 'bad_magic' WHEN 5 THEN 'bad_maxval'
                  WHEN 7 THEN 'truncated' ELSE 'ok' END AS reason,
       ok.n_pixels AS n_pixels,
       ok.sum_rgb AS sum_rgb
FROM d LEFT JOIN ok ON d.doc_id = ok.doc_id"""


@register(
    "llm_multimodal_quarantine_ppm",
    _PPM_QUAR_SQL,
    doc="Quarantine split for malformed images: a deterministic fixture "
        "corrupts doc_id%10 classes JVM-side (3: wrong magic 'Q6', 5: "
        "header maxval 999 — the spec-valid 2-byte form the parser must "
        "reject rather than mis-decode as uint8, 7: raster 10 bytes "
        "short of the header's promise) and decode_ppm_quarantine maps "
        "each payload to exactly one row: 'ok' with integer-exact "
        "raster stats, or 'quarantined' with the reason code of the "
        "guard that fired. The oracle pins the reason PER CLASS, so "
        "this verifies WHICH ValueError path rejected each container, "
        "not merely that decode failed. Map-only Arrow batches, no "
        "shuffle — at 100 TB one corrupt object must never kill the "
        "decode stage (operators/llm/multimodal.py:"
        "decode_ppm_quarantine; the PERMISSIVE-mode pattern of "
        "quarantine_replay applied to binary media).",
    tags=("llm", "multimodal", "quality"),
)
def llm_multimodal_quarantine_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.decode_ppm_quarantine(mm.encode_ppm_corrupted(docs))


_WAV_QUAR_SQL = f"""
WITH d AS (SELECT doc_id, text, doc_id % 10 AS cls,
                  least({mm.WAV_MAX_SAMPLES}, length(text)) AS n
           FROM documents WHERE length(text) >= 1),
ok AS (SELECT doc_id, n::BIGINT AS n_samples,
              sum(ord(substr(text, i, 1)))::BIGINT AS sum_amp
       FROM (SELECT doc_id, text, n, unnest(generate_series(1, n)) AS i
             FROM d WHERE cls NOT IN (3, 5, 7, 9))
       GROUP BY doc_id, n)
SELECT d.doc_id AS media_id,
       CASE WHEN d.cls IN (3, 5, 7, 9) THEN 'quarantined' ELSE 'ok' END
           AS status,
       CASE d.cls WHEN 3 THEN 'not_riff' WHEN 5 THEN 'non_pcm'
                  WHEN 7 THEN 'truncated' WHEN 9 THEN 'empty_data'
                  ELSE 'ok' END AS reason,
       ok.n_samples AS n_samples,
       ok.sum_amp AS sum_amp
FROM d LEFT JOIN ok ON d.doc_id = ok.doc_id"""


@register(
    "llm_multimodal_quarantine_wav",
    _WAV_QUAR_SQL,
    doc="Quarantine split for malformed audio: corruption classes on "
        "doc_id%10 (3: 'RIFX' magic, 5: non-PCM/ADPCM format code in "
        "the fmt chunk — the honest NotImplementedError path, 7: data "
        "chunk declaring n bytes with the payload cut 10 short — the "
        "round-8 truncated-chunk guard, 9: container-VALID zero-length "
        "data chunk — the round-8 empty-data guard) flow through "
        "decode_wav_quarantine; clean docs yield integer-exact "
        "amplitude stats the oracle rebuilds from the text with ord(). "
        "Classes 7 and 9 exist precisely because the round-7 advisor "
        "showed truncation previously yielded silently-wrong sample "
        "counts and empty data an opaque numpy crash — both are now "
        "typed, classified quarantine rows. Map-only, no shuffle "
        "(operators/llm/multimodal.py:decode_wav_quarantine).",
    tags=("llm", "multimodal", "quality"),
)
def llm_multimodal_quarantine_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.decode_wav_quarantine(mm.encode_wav_corrupted(docs))
