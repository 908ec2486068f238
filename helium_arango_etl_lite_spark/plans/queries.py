"""Unified query catalog: importing the catalog modules populates QUERIES.

``queries()`` / ``oracle_sql()`` in ``__spark_entry__.py`` are thin views
over this registry.
"""

from .registry import QUERIES, QuerySpec, load_table  # noqa: F401
from . import catalog_core  # noqa: F401  (registers core queries)
from . import catalog_llm  # noqa: F401  (registers LLM queries)
from . import catalog_analytics  # noqa: F401  (registers analytics queries)
from . import catalog_tpch  # noqa: F401  (registers extended TPC-H shapes)
from . import catalog_round3  # noqa: F401  (set ops, range windows, LLM passes)

__all__ = ["QUERIES", "QuerySpec", "load_table"]
