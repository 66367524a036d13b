"""SPARQL 1.1 Graph Store Protocol sink (distributed upload).

Reference: silk-core/.../dataset/rdf/GraphStoreTrait.scala:45-120
(postDataToGraph / deleteGraph — POST/DELETE against
``endpoint?graph=<uri>``, chunked requests bounded by
``maxRequestSize``) and silk-plugins-rdf/.../access/
GraphStoreSink.scala:27-160 (N-Triples statement serialization, the
per-request byte budget that rotates requests, dropGraphOnClear, the
optional ``<graph> rdf:type <type>`` statement, and the
stmtCount/byteCount/nrGraphStoreRequests counters).

Spark-first shape: statements are FORMATTED as one codegen projection
(N-Triples lines with full literal escaping — no Python in the row
path), then each PARTITION streams its lines into <= max_request_bytes
chunks and POSTs them through a pluggable transport. The reference
sink is a single-writer OutputStream; here every partition is an
independent writer (the protocol's POST-appends semantics make that
safe), so a 1000-executor upload saturates the store instead of one
socket. Upload lineage — requests, statements, bytes per partition —
comes back as a small DataFrame, the same per-partition-lineage
discipline as the CDC pipeline's batch manifests.

Transports: ``HttpGraphStoreTransport`` (stdlib urllib, retry with
backoff) for real endpoints, ``DirGraphStore`` for tests and local
graph dumps — executors are separate OS processes, so the local store
must live on the filesystem (atomic per-request chunk files), not in
Python memory.
"""

from __future__ import annotations

import os
import time
import urllib.error
import urllib.parse
import urllib.request
import uuid
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# GraphStoreTrait defaultTimeouts reads graphstore.default.* config;
# these mirror its shipped defaults where knowable and stay overridable
DEFAULT_MAX_REQUEST_BYTES = 16 * 1024 * 1024
DEFAULT_TIMEOUT_SEC = 60.0
NT_CONTENT_TYPE = "application/n-triples"


# ---------------------------------------------------------------------------
# N-Triples statement formatting (GraphStoreSink.writeStatement analogue)
# ---------------------------------------------------------------------------


def _escape_literal(c: Column) -> Column:
    """N-Triples ECHAR escaping for literal bodies: backslash first,
    then quote/newline/cr/tab — the inverse of rdf._unescape_literal."""
    out = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.replace(out, F.lit("\t"), F.lit("\\t"))


def nt_statement(
    subject: Column, predicate: Column, obj: Column, object_is_uri: Column | bool = True
) -> Column:
    """One N-Triples line ``<s> <p> <o|"o"> .`` as a codegen Column —
    GraphStoreSink.scala writeStatement with ValueType URI vs literal
    (backward properties are the CALLER's swap, as in
    writeEntity:49-55)."""
    is_uri = F.lit(object_is_uri) if isinstance(object_is_uri, bool) else object_is_uri
    o = F.when(is_uri, F.concat(F.lit("<"), obj, F.lit(">"))).otherwise(
        F.concat(F.lit('"'), _escape_literal(obj), F.lit('"'))
    )
    return F.concat(
        F.lit("<"), subject, F.lit("> <"), predicate, F.lit("> "), o, F.lit(" .")
    )


# ---------------------------------------------------------------------------
# transports
# ---------------------------------------------------------------------------


@dataclass
class HttpGraphStoreTransport:
    """Graph Store Protocol over stdlib HTTP: POST appends to the
    graph, DELETE drops it (GraphStoreTrait.scala:45-120). Retries
    transient failures with exponential backoff; 4xx (other than 429)
    are raised immediately — a schema/auth error will not converge by
    retrying."""

    endpoint: str
    headers: dict[str, str] = field(default_factory=dict)
    timeout_sec: float = DEFAULT_TIMEOUT_SEC
    retries: int = 3
    backoff_sec: float = 0.5

    def _url(self, graph: str) -> str:
        sep = "&" if "?" in self.endpoint else "?"
        return f"{self.endpoint}{sep}graph={urllib.parse.quote(graph, safe='')}"

    def _request(self, method: str, graph: str, data: bytes | None, content_type: str | None):
        last: Exception | None = None
        for attempt in range(self.retries + 1):
            req = urllib.request.Request(self._url(graph), data=data, method=method)
            for k, v in self.headers.items():
                req.add_header(k, v)
            if content_type:
                req.add_header("Content-Type", content_type)
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
                    return resp.status
            except urllib.error.HTTPError as e:
                if 400 <= e.code < 500 and e.code != 429:
                    raise
                last = e
            except urllib.error.URLError as e:
                last = e
            time.sleep(self.backoff_sec * (2**attempt))
        raise RuntimeError(
            f"graph store {method} to {self.endpoint} failed after "
            f"{self.retries + 1} attempts"
        ) from last

    def post(self, graph: str, data: bytes, content_type: str = NT_CONTENT_TYPE) -> None:
        self._request("POST", graph, data, content_type)

    def delete(self, graph: str) -> None:
        try:
            self._request("DELETE", graph, None, None)
        except urllib.error.HTTPError as e:
            if e.code != 404:  # deleting a missing graph is a no-op
                raise


@dataclass
class DirGraphStore:
    """Directory-backed graph store for tests and local graph dumps:
    every POST lands as its own chunk file (write-then-rename, so a
    concurrent reader never sees a torn request), DELETE removes the
    graph directory. Executors are separate OS processes — state must
    be on the filesystem."""

    root: str

    def _graph_dir(self, graph: str) -> str:
        return os.path.join(self.root, urllib.parse.quote(graph, safe=""))

    def post(self, graph: str, data: bytes, content_type: str = NT_CONTENT_TYPE) -> None:
        d = self._graph_dir(graph)
        os.makedirs(d, exist_ok=True)
        name = f"req-{uuid.uuid4().hex}.nt"
        tmp = os.path.join(d, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(data)
        os.rename(tmp, os.path.join(d, name))

    def delete(self, graph: str) -> None:
        d = self._graph_dir(graph)
        if not os.path.isdir(d):
            return
        for name in os.listdir(d):
            os.unlink(os.path.join(d, name))
        os.rmdir(d)

    def read_graph(self, spark, graph: str) -> DataFrame:
        """The accumulated graph as parsed triples (rdf.ntriples) —
        the round-trip read side for tests."""
        from silk_spark.sources.rdf import ntriples

        return ntriples(spark, os.path.join(self._graph_dir(graph), "*.nt"))


# ---------------------------------------------------------------------------
# distributed upload
# ---------------------------------------------------------------------------


def upload_graph(
    statements: DataFrame,
    transport,
    graph: str,
    line_col: str = "line",
    max_request_bytes: int = DEFAULT_MAX_REQUEST_BYTES,
    content_type: str = NT_CONTENT_TYPE,
    drop_first: bool = False,
    graph_type_uri: str | None = None,
) -> dict:
    """Upload a frame of pre-formatted statement lines (see
    ``nt_statement``) to ``graph``, one independent chunked writer per
    partition. Returns the aggregated upload report
    ``{statements, bytes, requests, partitions}`` — the reference
    sink's overallStmtCount/overallByteCount/nrGraphStoreRequests
    (GraphStoreSink.scala:35-41), plus the per-partition lineage rows
    under ``"partitions_detail"``.

    ``drop_first`` is dropGraphOnClear (one driver-side DELETE before
    any task posts — ordering matters, so it cannot ride in the
    tasks); ``graph_type_uri`` posts the single
    ``<graph> rdf:type <type>`` statement the same way
    (GraphStoreSink graphTypeUri)."""
    if drop_first:
        transport.delete(graph)
    if graph_type_uri:
        line = f"<{graph}> <{RDF_TYPE}> <{graph_type_uri}> .\n"
        transport.post(graph, line.encode("utf-8"), content_type)

    lines = statements.select(F.col(line_col).cast("string").alias("line"))
    budget = int(max_request_bytes)

    def _upload(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf: list[bytes] = []
        buf_bytes = 0
        n_stmt = 0
        n_bytes = 0
        n_req = 0

        def flush():
            nonlocal buf, buf_bytes, n_req
            if buf:
                transport.post(graph, b"".join(buf), content_type)
                n_req += 1
                buf = []
                buf_bytes = 0

        for pdf in batches:
            for line in pdf["line"]:
                if line is None:
                    continue
                data = (line + "\n").encode("utf-8")
                # rotate BEFORE exceeding the budget, like
                # GraphStoreSink.scala:124 (a single oversized
                # statement still goes out alone)
                if buf_bytes + len(data) > budget and buf:
                    flush()
                buf.append(data)
                buf_bytes += len(data)
                n_stmt += 1
                n_bytes += len(data)
        flush()
        yield pd.DataFrame(
            {
                "partition_id": [pid],
                "requests": [n_req],
                "statements": [n_stmt],
                "bytes": [n_bytes],
            }
        )

    report = lines.mapInPandas(
        _upload,
        schema="partition_id int, requests int, statements bigint, bytes bigint",
    ).collect()
    return {
        "statements": sum(r["statements"] for r in report),
        "bytes": sum(r["bytes"] for r in report),
        "requests": sum(r["requests"] for r in report) + (1 if graph_type_uri else 0),
        "partitions": len(report),
        "partitions_detail": [r.asDict() for r in report],
    }


def upload_triples(
    triples: DataFrame,
    transport,
    graph: str,
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
    object_is_uri: Column | bool = True,
    **kwargs,
) -> dict:
    """Convenience wrapper: format (s, p, o) columns as N-Triples in
    one codegen projection, then ``upload_graph``."""
    lines = triples.select(
        nt_statement(
            F.col(subject_col), F.col(predicate_col), F.col(object_col), object_is_uri
        ).alias("line")
    )
    return upload_graph(lines, transport, graph, **kwargs)
