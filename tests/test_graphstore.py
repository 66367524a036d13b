"""Graph Store Protocol sink: N-Triples formatting, chunk rotation,
distributed upload lineage, drop/clear + graph-type semantics
(GraphStoreTrait.scala:45-120, GraphStoreSink.scala:27-160), and the
HTTP transport against a localhost graph store."""

import http.server
import threading
import urllib.parse

import pytest
from pyspark.sql import functions as F

from silk_spark.sources.graphstore import (
    RDF_TYPE,
    DirGraphStore,
    HttpGraphStoreTransport,
    nt_statement,
    upload_graph,
    upload_triples,
)

GRAPH = "http://example.org/graph/main"


def _triples_df(spark, n=50, parts=4):
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.concat(F.lit("http://ex.org/s/"), F.col("id")).alias("subject"),
            F.lit("http://ex.org/p/name").alias("predicate"),
            F.concat(F.lit("http://ex.org/o/"), F.col("id")).alias("object"),
        )
    )


class TestNtStatement:
    def test_uri_and_literal_forms(self, spark):
        row = spark.range(1).select(
            nt_statement(
                F.lit("http://ex.org/s"), F.lit("http://ex.org/p"), F.lit("http://ex.org/o")
            ).alias("u"),
            nt_statement(
                F.lit("http://ex.org/s"),
                F.lit("http://ex.org/p"),
                F.lit('say "hi"\tand\nbye\\end'),
                object_is_uri=False,
            ).alias("l"),
        ).first()
        assert row["u"] == "<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> ."
        assert (
            row["l"]
            == '<http://ex.org/s> <http://ex.org/p> "say \\"hi\\"\\tand\\nbye\\\\end" .'
        )

    def test_literal_roundtrips_through_parser(self, spark, tmp_path):
        # formatting must be the exact inverse of rdf.ntriples
        texts = ['plain', 'with "quotes"', "tab\there", "line\nbreak", "back\\slash"]
        df = spark.createDataFrame([(t,) for t in texts], ["v"]).select(
            nt_statement(
                F.lit("http://ex.org/s"), F.lit("http://ex.org/p"), F.col("v"), False
            ).alias("line")
        )
        store = DirGraphStore(str(tmp_path))
        upload_graph(df, store, GRAPH)
        back = store.read_graph(spark, GRAPH)
        got = sorted(r["object"] for r in back.collect())
        assert got == sorted(texts)


class TestDirStore:
    def test_upload_roundtrip_and_lineage(self, spark, tmp_path):
        store = DirGraphStore(str(tmp_path))
        df = _triples_df(spark, n=50, parts=4)
        report = upload_triples(df, store, GRAPH)
        assert report["statements"] == 50
        assert report["partitions"] == 4
        assert report["requests"] >= 1
        assert report["bytes"] == sum(
            p["bytes"] for p in report["partitions_detail"]
        )
        back = store.read_graph(spark, GRAPH)
        assert back.count() == 50
        assert (
            back.filter(F.col("predicate") == "http://ex.org/p/name").count() == 50
        )

    def test_chunk_rotation_respects_budget(self, spark, tmp_path):
        # GraphStoreSink.scala:124 — a request never exceeds the byte
        # budget unless a single statement does
        store = DirGraphStore(str(tmp_path))
        df = _triples_df(spark, n=40, parts=2)
        report = upload_triples(df, store, GRAPH, max_request_bytes=200)
        assert report["requests"] > report["partitions"]
        gdir = tmp_path / urllib.parse.quote(GRAPH, safe="")
        sizes = [f.stat().st_size for f in gdir.iterdir()]
        line_max = max(sizes)
        assert line_max <= 200 or line_max <= 2 * 90  # oversize-single allowance
        assert len(sizes) == report["requests"]

    def test_drop_first_clears_graph(self, spark, tmp_path):
        store = DirGraphStore(str(tmp_path))
        upload_triples(_triples_df(spark, 10), store, GRAPH)
        upload_triples(
            _triples_df(spark, 5), store, GRAPH, drop_first=True
        )
        assert store.read_graph(spark, GRAPH).count() == 5
        # append (no drop) accumulates — POST semantics
        upload_triples(_triples_df(spark, 5), store, GRAPH)
        assert store.read_graph(spark, GRAPH).count() == 10

    def test_graph_type_statement(self, spark, tmp_path):
        store = DirGraphStore(str(tmp_path))
        report = upload_triples(
            _triples_df(spark, 3),
            store,
            GRAPH,
            graph_type_uri="http://ex.org/GraphClass",
        )
        back = store.read_graph(spark, GRAPH)
        typed = back.filter(
            (F.col("subject") == GRAPH)
            & (F.col("predicate") == RDF_TYPE)
            & (F.col("object") == "http://ex.org/GraphClass")
        )
        assert typed.count() == 1
        assert report["requests"] >= 2  # type statement posts separately

    def test_delete_missing_graph_is_noop(self, tmp_path):
        DirGraphStore(str(tmp_path)).delete("http://ex.org/nope")


class _GraphStoreHandler(http.server.BaseHTTPRequestHandler):
    graphs: dict[str, list[bytes]] = {}
    fail_next: list[int] = []  # status codes to emit before succeeding

    def _graph(self):
        q = urllib.parse.urlparse(self.path).query
        return urllib.parse.parse_qs(q)["graph"][0]

    def do_POST(self):
        if self.fail_next:
            code = self.fail_next.pop(0)
            self.send_response(code)
            self.end_headers()
            return
        n = int(self.headers["Content-Length"])
        self.graphs.setdefault(self._graph(), []).append(self.rfile.read(n))
        self.send_response(204)
        self.end_headers()

    def do_DELETE(self):
        if self._graph() in self.graphs:
            del self.graphs[self._graph()]
            self.send_response(204)
        else:
            self.send_response(404)
        self.end_headers()

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def http_store():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _GraphStoreHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _GraphStoreHandler.graphs = {}
    _GraphStoreHandler.fail_next = []
    yield f"http://127.0.0.1:{srv.server_port}/store"
    srv.shutdown()


class TestHttpTransport:
    def test_post_delete_cycle(self, http_store):
        t = HttpGraphStoreTransport(http_store, retries=0)
        t.post(GRAPH, b"<a> <b> <c> .\n")
        t.post(GRAPH, b"<d> <e> <f> .\n")
        assert len(_GraphStoreHandler.graphs[GRAPH]) == 2
        t.delete(GRAPH)
        assert GRAPH not in _GraphStoreHandler.graphs
        t.delete(GRAPH)  # 404 is a no-op

    def test_retry_transient_then_succeed(self, http_store):
        _GraphStoreHandler.fail_next = [503, 503]
        t = HttpGraphStoreTransport(http_store, retries=3, backoff_sec=0.01)
        t.post(GRAPH, b"<a> <b> <c> .\n")
        assert len(_GraphStoreHandler.graphs[GRAPH]) == 1

    def test_client_error_raises_immediately(self, http_store):
        import urllib.error

        _GraphStoreHandler.fail_next = [400]
        t = HttpGraphStoreTransport(http_store, retries=3, backoff_sec=0.01)
        with pytest.raises(urllib.error.HTTPError):
            t.post(GRAPH, b"bad")
        assert not _GraphStoreHandler.fail_next  # consumed exactly one

    def test_distributed_upload_over_http(self, spark, http_store):
        # executors (separate processes) POST to the same local server
        t = HttpGraphStoreTransport(http_store, retries=1, backoff_sec=0.05)
        report = upload_triples(_triples_df(spark, 30, parts=3), t, GRAPH)
        assert report["statements"] == 30
        body = b"".join(_GraphStoreHandler.graphs[GRAPH])
        assert body.count(b" .\n") == 30
