"""ArangoDB bulk-import sink (SURVEY.md section 2.1 "bulk upsert sink").

The reference loads every micro-batch with pyArango ``importBulk(docs,
onDuplicate="ignore")`` (follower.py:205-207) — three driver-side HTTP
calls per block. The engine's connector keeps the same wire contract
(ArangoDB ``/_api/import`` JSON-lines endpoint, ``onDuplicate`` dedup) but
distributes it: ``df.foreachPartition`` posts each partition's rows in
bounded batches directly from the executors, so ingest bandwidth scales
with the cluster instead of the driver. Deterministic ``_key`` columns
(functions/keys.py) + ``onDuplicate=ignore`` preserve the reference's
idempotent-replay semantics end to end.

The HTTP transport is injectable (``poster``) so the batching, rendering
and partition fan-out are testable without a server; the default transport
is stdlib urllib (no extra dependency).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, Row

#: poster(url, payload_bytes) -> None; raises on failure (Spark task retry
#: + idempotent keys make redelivery safe).
Poster = Callable[[str, bytes], None]


def _urllib_poster(url: str, payload: bytes) -> None:  # pragma: no cover - network
    import urllib.request

    req = urllib.request.Request(
        url, data=payload, headers={"Content-Type": "application/x-arango-import"}
    )
    with urllib.request.urlopen(req) as resp:
        if resp.status >= 300:
            raise IOError(f"arango import failed: HTTP {resp.status}")


def render_import_batches(
    rows: Iterable[Row | dict], batch_size: int
) -> Iterator[bytes]:
    """Rows -> JSON-lines payloads of at most ``batch_size`` documents —
    the body format of ArangoDB ``POST /_api/import?type=documents``.
    Pure function; the executor-side sink and the tests share it."""
    batch: list[str] = []
    for row in rows:
        doc = row.asDict(recursive=True) if isinstance(row, Row) else row
        batch.append(json.dumps(doc, sort_keys=True))
        if len(batch) >= batch_size:
            yield "\n".join(batch).encode("utf-8")
            batch = []
    if batch:
        yield "\n".join(batch).encode("utf-8")


def import_url(
    endpoint: str, database: str, collection: str, on_duplicate: str = "ignore"
) -> str:
    return (
        f"{endpoint.rstrip('/')}/_db/{database}/_api/import"
        f"?collection={collection}&type=documents&onDuplicate={on_duplicate}"
        "&complete=false&details=false"
    )


def arango_bulk_import(
    df: DataFrame,
    endpoint: str,
    database: str,
    collection: str,
    on_duplicate: str = "ignore",
    batch_size: int = 5_000,
    poster: Poster | None = None,
) -> None:
    """Distributed equivalent of ``collection.importBulk(docs,
    onDuplicate="ignore")``: every partition posts its own bounded batches.

    Executors stream their partition iterator — nothing is collected to
    the driver and memory stays bounded by ``batch_size``. With
    ``on_duplicate='ignore'`` and deterministic keys the sink is idempotent
    under Spark task retries (exactly the reference's replay contract).
    """
    url = import_url(endpoint, database, collection, on_duplicate)
    post = poster or _urllib_poster

    def send_partition(rows: Iterator[Row]) -> None:
        for payload in render_import_batches(rows, batch_size):
            post(url, payload)

    df.foreachPartition(send_partition)
