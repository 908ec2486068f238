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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. Plain parquet scan — filters/projections above
    it push down (verify via .explain: PushedFilters / ReadSchema)."""
    # events.parquet stores TIMESTAMP(NANOS), which Spark only reads as a
    # long (SPARK-40819); set per-session so any caller's session works.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts normalised from unix-nanos (long) to a microsecond
    TIMESTAMP — mirrored by the oracle fragment EVENTS_NORM (DuckDB reads
    the same column as TIMESTAMP_NS and truncates on ::TIMESTAMP; both
    sides floor, so values agree exactly)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


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
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the catalog."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return wrap
