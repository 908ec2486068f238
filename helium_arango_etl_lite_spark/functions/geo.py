"""H3 geo-index UDF (SURVEY.md section 2.7; reference loaders.py:10-16).

The reference maps an H3 hex string to a GeoJSON Point via ``h3.h3_to_geo``,
with the quirk that a null/invalid hex yields coordinates ``[0, 0]``
(loaders.py:13-15 catches TypeError). ``h3`` is not installed in this
environment, so the UDF is built against an injectable converter:

* if ``h3`` is importable, the real ``h3_to_geo`` is used;
* otherwise a deterministic arithmetic fallback derives (lat, lng) from the
  low bits of the hex string, preserving the exact null/invalid -> [0, 0]
  semantics so the plumbing (vectorised UDF, GeoJSON struct output, na.drop
  interplay) is fully testable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

try:  # optional dependency, per SURVEY.md section 7 M5
    import h3  # type: ignore

    def _hex_to_latlng(hex_str: str) -> tuple[float, float]:
        return h3.h3_to_geo(hex_str)

    HAS_H3 = True
except Exception:  # pragma: no cover - depends on environment
    HAS_H3 = False

    def _hex_to_latlng(hex_str: str) -> tuple[float, float]:
        # Deterministic fallback: fold the hex chars into lat/lng buckets.
        v = int(hex_str, 16)
        lat = (v % 18000) / 100.0 - 90.0
        lng = ((v // 18000) % 36000) / 100.0 - 180.0
        return (lat, lng)


def geo_index_udf() -> Column:
    """Factory for the vectorised geo_index UDF.

    Returns a callable-column UDF: string H3 hex -> GeoJSON Point struct
    ``{type: "Point", coordinates: [lng, lat]}``. Invalid or null input
    maps to coordinates ``[0.0, 0.0]`` — exactly the reference's TypeError
    fallback (loaders.py:13-15).
    """

    @pandas_udf("type string, coordinates array<double>")
    def _geo_index(hexes: pd.Series) -> pd.DataFrame:
        def convert(hex_str):
            try:
                lat, lng = _hex_to_latlng(hex_str)
                coords = [lng, lat]  # GeoJSON order (loaders.py:16)
            except (TypeError, ValueError, AttributeError):
                coords = [0.0, 0.0]
            return ("Point", coords)

        out = hexes.map(convert)
        return pd.DataFrame(
            {"type": out.map(lambda t: t[0]), "coordinates": out.map(lambda t: t[1])}
        )

    return _geo_index
