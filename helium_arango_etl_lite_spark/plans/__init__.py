from .queries import QUERIES, QuerySpec, load_table

__all__ = ["QUERIES", "QuerySpec", "load_table"]
