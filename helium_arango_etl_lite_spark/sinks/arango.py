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


# --- df.write.format("arango") — Python DataSource writer ------------------
#
# The same wire contract as arango_bulk_import, surfaced through the
# PySpark 4 DataSource writer API: per-task bounded-batch POSTs from the
# executors, a WriterCommitMessage per task carrying import accounting
# back to the driver, and no-op abort because deterministic keys +
# onDuplicate=ignore make task replays safe (the reference's replay
# contract, follower.py:205-207). mock:// endpoints skip the POST so the
# full write path is testable without a server.

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class ArangoCommit(WriterCommitMessage):
    docs: int
    batches: int


class ArangoWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.endpoint = options.get("endpoint", "mock://arango")
        self.collection = options["collection"]
        self.url = import_url(
            self.endpoint,
            options.get("database", "helium"),
            self.collection,
            options.get("on_duplicate", "ignore"),
        )
        self.batch_size = int(options.get("batch_size", 5_000))
        # optional audit trail: commit() appends one JSON line per
        # successful write job (the engine's analog of the reference's
        # per-block sync print, follower.py:72)
        self.commit_log = options.get("commit_log")

    def write(self, iterator: Iterator[Row]) -> ArangoCommit:
        post = None if self.endpoint.startswith("mock://") else _urllib_poster
        docs = batches = 0
        for payload in render_import_batches(iterator, self.batch_size):
            if post is not None:
                post(self.url, payload)
            batches += 1
            docs += payload.count(b"\n") + 1
        return ArangoCommit(docs=docs, batches=batches)

    def commit(self, messages) -> None:
        # nothing to finalize server-side: every task's import is already
        # durable and idempotent; accounting only
        if self.commit_log:
            record = {
                "collection": self.collection,
                "docs": sum(m.docs for m in messages if m is not None),
                "batches": sum(m.batches for m in messages if m is not None),
                "tasks": len(messages),
            }
            with open(self.commit_log, "a", encoding="utf-8") as fh:
                fh.write(json.dumps(record) + "\n")

    def abort(self, messages) -> None:
        # partial imports are safe to leave: the retried/replayed write
        # re-posts the same deterministic keys and the server ignores dups
        pass


class ArangoDataSource(DataSource):
    """spark.dataSource.register(ArangoDataSource);
    df.write.format("arango").option("collection", "payments")
      .option("endpoint", "http://arango:8529").mode("append").save()"""

    @classmethod
    def name(cls) -> str:
        return "arango"

    def writer(self, schema, overwrite: bool) -> ArangoWriter:
        if overwrite:
            raise ValueError(
                "arango sink is append-only (onDuplicate handles upsert); "
                "use mode('append')"
            )
        return ArangoWriter(dict(self.options))
