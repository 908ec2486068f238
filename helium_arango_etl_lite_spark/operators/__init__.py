from . import graph, relational, aggregates

__all__ = ["graph", "relational", "aggregates"]
