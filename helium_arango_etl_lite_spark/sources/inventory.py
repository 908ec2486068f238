"""Gateway-inventory dimension source (SURVEY.md section 3.3).

The reference loads a gzip CSV over HTTP with pandas, adds prefix ids and a
GeoJSON point per row, drops null rows, and bulk-replaces the ``hotspots``
collection (loaders.py:19-47). Engine form: ``spark.read.csv`` with an
explicit schema (Spark reads ``.csv.gz`` natively), the same transforms as
vectorised column expressions plus one Arrow-batched UDF for the H3
conversion, and the inventory height parsed from the *file name* with
``regexp_extract`` over ``input_file_name()`` (loaders.py:45).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import geo_index_udf
from ..schemas import GATEWAY_INVENTORY_SCHEMA

_HEIGHT_RE = r"gateway_inventory_(\d+)\.csv(\.gz)?$"


def read_gateway_inventory(spark: SparkSession, path: str) -> DataFrame:
    """Read ``gateway_inventory_{height}.csv[.gz]`` file(s).

    Adds ``inventory_height`` parsed from each row's source file name — the
    engine's watermark for the dimension-staleness check (follower.py:61-62,
    loaders.py:45). Explicit schema: no inference pass.
    """
    raw = spark.read.csv(path, header=True, schema=GATEWAY_INVENTORY_SCHEMA)
    return raw.withColumn(
        "inventory_height",
        F.regexp_extract(F.input_file_name(), _HEIGHT_RE, 1).cast("long"),
    )


def enrich_inventory(inventory: DataFrame) -> DataFrame:
    """Inventory rows -> hotspot vertex documents (loaders.py:26-37).

    ``_id`` = ``hotspots/{address}`` (loaders.py:27,31), ``_key`` = address
    (:28,32), ``location_geo`` = GeoJSON point from the H3 hex (:29,33 via
    :10-16 — null/invalid hex maps to coordinates [0.0, 0.0]), then
    ``dropna()`` on the reference's columns (:35).

    The geo UDF is Arrow-batched; everything else is JVM-side expressions.
    """
    geo = geo_index_udf()
    enriched = (
        inventory.withColumn("_id", F.format_string("hotspots/%s", F.col("address")))
        .withColumn("_key", F.col("address"))
        .withColumn("location_geo", geo(F.col("location")))
    )
    # Reference dropna() sees only the CSV's own columns (loaders.py:35);
    # location_geo/_id/_key are derived after and never null.
    return enriched.na.drop("any", subset=[f.name for f in GATEWAY_INVENTORY_SCHEMA])
