"""PySpark-native analytics engine with the query and data-processing
capabilities of ``evandiewald/helium-arango-etl-lite``.

The reference (at /root/reference) is a single-threaded incremental ETL:
blockchain JSON-RPC -> pydantic validation -> graph-document transform ->
ArangoDB bulk upsert.  This package re-expresses that surface as composable
PySpark DataFrame operators (SURVEY.md section 2), plus the LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
required for 100 TB scale.

Design rules (SURVEY.md section 7):
 * DataFrame/SQL only - no RDDs, no custom Catalyst rules.
 * Schema-first: every source has an explicit StructType.
 * Built-in functions over UDFs; Pandas UDFs when Python is unavoidable.
 * Broadcast small dimensions, partition facts by retention key,
   deterministic keys + anti-join for idempotent sinks.
"""

__version__ = "0.1.0"
