"""Query-catalog registry shared by the core and LLM catalogs.

Each :class:`QuerySpec` pairs a Spark DataFrame program with the equivalent
ANSI SQL that DuckDB runs on the same parquet tables — the driver's
correctness gate (see ``__spark_entry__.py``). Column names/aliases MUST
match between the two; the driver sorts columns by name and hashes values.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# Tables that sit on the probe/fact side of queries. The driver's parquet
# files are single-row-group, so a raw scan is ONE task no matter the core
# count; at 100 TB a scan has thousands of splits and this is a non-issue,
# but when splits < cores we restore utilisation with one explicit
# round-robin repartition (filters/pruning still push through Repartition).
_FACT_TABLES = {"lineitem", "orders", "events", "documents", "embeddings", "customer"}
_SCAN_PARTS: dict[tuple[str, str], int] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. Plain parquet scan — filters/projections above
    it push down (verify via .explain: PushedFilters / ReadSchema)."""
    # events.parquet stores TIMESTAMP(NANOS), which Spark only reads as a
    # long (SPARK-40819); set per-session so any caller's session works.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in _FACT_TABLES:
        key = (sf_dir, name)
        if key not in _SCAN_PARTS:
            _SCAN_PARTS[key] = df.rdd.getNumPartitions()
        par = spark.sparkContext.defaultParallelism
        if _SCAN_PARTS[key] < par:
            df = df.repartition(par)
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts normalised to a microsecond TIMESTAMP regardless of
    how the parquet file stores it — the driver testdata has shipped it
    both as unix-nanos stored in an int64 (read as bigint under
    nanosAsLong) and as TIMESTAMP(MICROS) without UTC adjustment (read as
    TIMESTAMP_NTZ). Branch on the observed dtype instead of assuming one.
    Mirrored by the oracle fragment EVENTS_NORM (DuckDB's ``ts::TIMESTAMP``
    is the identity on micros and a floor on nanos; both sides floor, so
    values agree exactly)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    t = dict(ev.dtypes)["ts"]
    if t in ("bigint", "long"):  # unix-nanos as int64
        return ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if t == "timestamp_ntz":  # wall clock is already correct; cast via
        # session tz (UTC) so downstream window/session_window/lag see the
        # TimestampType the rest of the catalog was verified with
        return ev.withColumn("ts", F.col("ts").cast("timestamp"))
    if t != "timestamp":
        # An encoding we have not seen before (DATE? string nanos?) must
        # fail loudly, not silently cast to NULLs/garbage.
        raise ValueError(
            f"events.ts has unsupported dtype {t!r}; expected bigint "
            "(unix-nanos), timestamp_ntz, or timestamp — extend "
            "load_events() for the new encoding"
        )
    return ev


# Oracle-side twin of load_events: prepend to any events oracle SQL.
EVENTS_NORM = (
    "events_norm AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, "
    "event_type, value, props FROM events)"
)


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the catalog.

    Duplicate names raise at import: ``QUERIES[name] = ...`` silently
    dropped an entry once (round 7 briefly shadowed the round-3
    ``llm_ngram_lm_score`` with a new entry of the same name, removing
    the older query from the public catalog with every test still
    green) — a registration that evicts another must be impossible."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(
                f"duplicate catalog registration: {name!r} is already "
                f"registered; pick a distinct name"
            )
        QUERIES[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return wrap
