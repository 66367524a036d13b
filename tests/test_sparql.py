"""SPARQL endpoint source: paged + parallel retrieval protocol.

Covers sources/sparql.py against the reference semantics of
SimpleEntityRetriever.scala:29-117, ParallelEntityRetriever.scala:32-283
and PagingSparqlTraversable.scala:44-131 — query shapes, strided paging
with short-page termination, retry/pause policy, the subject-merge
entity assembly, and the real HTTP transport against a localhost
SPARQL-protocol server (sandbox-local, no external network).
"""

from __future__ import annotations

import http.server
import json
import threading
import urllib.parse

import pytest

from silk_spark.sources.sparql import (
    HttpSparqlTransport,
    LocalGraphEndpoint,
    PathSpec,
    SparqlParams,
    build_entity_query,
    build_entity_uris_query,
    build_path_query,
    paged_select,
    parse_sparql_json,
    retrieve_entities,
    retrieve_entities_simple,
    type_restriction,
)

TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
PERSON = "http://example.org/Person"
NAME = "http://example.org/name"
KNOWS = "http://example.org/knows"
MEMBER = "http://example.org/member"


def person(i: int) -> str:
    return f"http://example.org/p{i:03d}"


def graph(n: int = 25) -> list[tuple[str, str, str]]:
    """n persons; each has 1-2 names, p_{i+1} knows p_i (so `\\knows`
    from p_i yields p_{i+1}), every 5th person is in group g."""
    t = []
    for i in range(n):
        t.append((person(i), TYPE, PERSON))
        t.append((person(i), NAME, f"name-{i}"))
        if i % 3 == 0:
            t.append((person(i), NAME, f"alias-{i}"))
        if i + 1 < n:
            t.append((person(i + 1), KNOWS, person(i)))
        if i % 5 == 0:
            t.append(("http://example.org/g", MEMBER, person(i)))
    # a typed person with NO properties at all beyond the type
    t.append((person(n), TYPE, PERSON))
    return t


PATHS = [
    PathSpec(NAME),
    PathSpec(KNOWS, backward=True, name="known_by"),
]


def expected_entities(n: int = 25) -> dict[str, tuple[list, list]]:
    out = {}
    for i in range(n):
        names = sorted({f"name-{i}"} | ({f"alias-{i}"} if i % 3 == 0 else set()))
        known_by = [person(i + 1)] if i + 1 < n else []
        out[person(i)] = (names, known_by)
    out[person(n)] = ([], [])
    return out


class TestQueryBuilders:
    """String-level parity with SimpleEntityRetriever.buildSparqlQuery
    :65-96 and ParallelEntityRetriever.pathQuery:244-282."""

    def test_entity_query_shape(self):
        q = build_entity_query(PATHS, type_restriction(PERSON))
        assert q.startswith("SELECT DISTINCT ?s ?v0 ?v1\n")
        assert f"?s <{TYPE}> <{PERSON}> ." in q
        assert f"OPTIONAL {{\n?s <{NAME}> ?v0 .\n}}" in q
        # backward path: value var is the SUBJECT of the pattern
        assert f"OPTIONAL {{\n?v1 <{KNOWS}> ?s .\n}}" in q
        assert q.endswith("ORDER BY ?s")

    def test_empty_restriction_binds_subject(self):
        # SimpleEntityRetriever.addRestrictions:103-109
        q = build_entity_query([PathSpec(NAME)], "")
        assert "?s ?v_p ?v_o ." in q

    def test_graph_becomes_from(self):
        q = build_entity_query([PathSpec(NAME)], "", graph="http://g")
        assert "FROM <http://g>\n" in q

    def test_path_query_shape(self):
        q = build_path_query(PathSpec(NAME), type_restriction(PERSON))
        assert q.startswith("SELECT DISTINCT ?s ?v0\n")
        assert f"OPTIONAL {{\n?s <{NAME}> ?v0 .\n}}" in q

    def test_entity_uris_query(self):
        q = build_entity_uris_query(type_restriction(PERSON))
        assert q.startswith("SELECT DISTINCT ?s")
        assert "OPTIONAL" not in q


class TestLocalGraphEndpoint:
    def test_cross_product_and_distinct(self):
        # multi-valued OPTIONALs multiply rows (SPARQL semantics) —
        # p0 has 2 names × 1 known_by = 2 rows
        ep = LocalGraphEndpoint(graph())
        q = build_entity_query(PATHS, type_restriction(PERSON))
        rows = [r for r in ep.select(q) if r["s"] == person(0)]
        assert len(rows) == 2
        assert {r["v0"] for r in rows} == {"name-0", "alias-0"}
        assert {r["v1"] for r in rows} == {person(1)}

    def test_order_offset_limit(self):
        ep = LocalGraphEndpoint(graph())
        q = build_entity_uris_query(type_restriction(PERSON))
        all_rows = ep.select(q)
        assert [r["s"] for r in all_rows] == sorted(r["s"] for r in all_rows)
        page = ep.select(q + " OFFSET 5 LIMIT 3")
        assert page == all_rows[5:8]

    def test_unbound_optional_omits_var(self):
        # the last person has a type but no name: ?v0 unbound
        ep = LocalGraphEndpoint(graph())
        q = build_entity_query([PathSpec(NAME)], type_restriction(PERSON))
        rows = [r for r in ep.select(q) if r["s"] == person(25)]
        assert rows == [{"s": person(25)}]


class FlakyTransport:
    """Fails the first `n_failures` select() calls (per transport),
    then delegates — exercises PagingSparqlTraversable.scala:108-128."""

    def __init__(self, inner, n_failures: int):
        self.inner = inner
        self.n_failures = n_failures
        self.calls = 0

    def select(self, query: str):
        self.calls += 1
        if self.calls <= self.n_failures:
            raise IOError("transient endpoint failure")
        return self.inner.select(query)


class TestPagedSelect:
    def setup_method(self):
        self.ep = LocalGraphEndpoint(graph())
        self.q = build_entity_uris_query(type_restriction(PERSON))

    def test_short_page_terminates(self):
        # 26 persons, page 10 -> pages of 10/10/6, exactly 3 queries
        rows = list(paged_select(self.ep, self.q, SparqlParams(page_size=10)))
        assert len(rows) == 26
        assert len(self.ep.queries) == 3
        assert "OFFSET 20" in self.ep.queries[-1]

    def test_exact_multiple_needs_probe_page(self):
        # 26 rows, page 13: two full pages then one empty probe
        rows = list(paged_select(self.ep, self.q, SparqlParams(page_size=13)))
        assert len(rows) == 26
        assert len(self.ep.queries) == 3

    def test_limit_caps_total(self):
        # PagingSparqlTraversable:61-70 — final page truncated to limit
        rows = list(
            paged_select(self.ep, self.q, SparqlParams(page_size=10), limit=15)
        )
        assert len(rows) == 15
        assert "LIMIT 5" in self.ep.queries[-1]

    def test_pre_paged_query_disables_paging(self):
        # :53-59 — a query carrying LIMIT runs once, verbatim
        rows = list(
            paged_select(self.ep, self.q + " LIMIT 4", SparqlParams(page_size=2))
        )
        assert len(rows) == 4
        assert len(self.ep.queries) == 1

    def test_strides_partition_the_result_set(self):
        # 3 cooperating strided streams = disjoint cover of the result
        params = SparqlParams(page_size=4)
        chunks = [
            list(paged_select(self.ep, self.q, params, first_page=k, page_stride=3))
            for k in range(3)
        ]
        got = [r["s"] for c in chunks for r in c]
        assert sorted(got) == sorted({t[0] for t in graph() if t[1] == TYPE})
        assert len(got) == len(set(got))

    def test_retry_then_succeed(self):
        flaky = FlakyTransport(self.ep, n_failures=2)
        params = SparqlParams(page_size=50, retry_count=3, retry_pause_sec=0.0)
        rows = list(paged_select(flaky, self.q, params))
        assert len(rows) == 26
        assert flaky.calls == 3

    def test_retry_exhaustion_raises(self):
        flaky = FlakyTransport(self.ep, n_failures=99)
        params = SparqlParams(page_size=50, retry_count=2, retry_pause_sec=0.0)
        with pytest.raises(IOError):
            list(paged_select(flaky, self.q, params))
        assert flaky.calls == 3  # 1 + retry_count


def frame_to_dict(df):
    return {
        r["_uri"]: (list(r["name"]), list(r["known_by"]))
        for r in df.collect()
    }


class TestRetrieveEntities:
    def test_simple_retriever(self, spark):
        ep = LocalGraphEndpoint(graph())
        df = retrieve_entities_simple(
            spark, ep, PATHS, type_restriction(PERSON), SparqlParams(page_size=7)
        )
        assert df.columns == ["_uri", "name", "known_by"]
        assert frame_to_dict(df) == expected_entities()

    def test_simple_entity_limit(self, spark):
        # limit counts ENTITIES, not binding rows (reference :187-191)
        ep = LocalGraphEndpoint(graph())
        df = retrieve_entities_simple(
            spark, ep, PATHS, type_restriction(PERSON),
            SparqlParams(page_size=7), limit=5,
        )
        got = frame_to_dict(df)
        assert len(got) == 5
        assert set(got) == {person(i) for i in range(5)}  # ordered prefix

    def test_parallel_matches_simple(self, spark):
        ep = LocalGraphEndpoint(graph())
        df = retrieve_entities(
            spark, ep, PATHS, type_restriction(PERSON),
            SparqlParams(page_size=6), n_strides=3,
        )
        assert frame_to_dict(df) == expected_entities()

    def test_parallel_without_subject_scan_keeps_bare_entities(self, spark):
        # include_subjects=False mirrors ParallelEntityRetriever: no
        # dedicated entity-URIs scan. OPTIONAL path queries still bind
        # ?s alone for value-less subjects and the fetch task emits a
        # subject marker for those rows (parseResults:198-214 emits an
        # empty PathValues per subject run) — so even the
        # property-less person(25) survives the merge.
        ep = LocalGraphEndpoint(graph())
        df = retrieve_entities(
            spark, ep, PATHS, type_restriction(PERSON),
            SparqlParams(page_size=9), n_strides=2, include_subjects=False,
        )
        assert len(frame_to_dict(df)) == 26

    def test_unrestricted_retrieval(self, spark):
        # empty restriction: every subject in the graph is an entity
        ep = LocalGraphEndpoint(graph(6))
        df = retrieve_entities(spark, ep, [PathSpec(NAME)], "", n_strides=2)
        uris = {r["_uri"] for r in df.collect()}
        assert uris == {t[0] for t in graph(6)}


# ---------------------------------------------------------------------------
# real HTTP transport against a sandbox-local SPARQL-protocol server
# ---------------------------------------------------------------------------


class _SparqlHandler(http.server.BaseHTTPRequestHandler):
    endpoint: LocalGraphEndpoint = None
    fail_first = 0
    failures_left = 0

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        cls = type(self)
        if cls.failures_left > 0:
            cls.failures_left -= 1
            self.send_response(503)
            self.end_headers()
            return
        qs = urllib.parse.urlparse(self.path).query
        query = urllib.parse.parse_qs(qs)["query"][0]
        rows = cls.endpoint.select(query)
        body = json.dumps(
            {
                "head": {"vars": sorted({k for r in rows for k in r})},
                "results": {
                    "bindings": [
                        {
                            k: {
                                "type": "uri" if v.startswith("http") else "literal",
                                "value": v,
                            }
                            for k, v in r.items()
                        }
                        for r in rows
                    ]
                },
            }
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/sparql-results+json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def http_endpoint():
    _SparqlHandler.endpoint = LocalGraphEndpoint(graph())
    _SparqlHandler.failures_left = 0
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _SparqlHandler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    finally:
        srv.shutdown()


class TestHttpTransport:
    def test_parse_sparql_json(self):
        doc = {
            "head": {"vars": ["s", "v0"]},
            "results": {
                "bindings": [
                    {
                        "s": {"type": "uri", "value": "http://x/a"},
                        "v0": {"type": "literal", "value": "hi", "xml:lang": "en"},
                    },
                    {"s": {"type": "uri", "value": "http://x/b"}},
                ]
            },
        }
        rows = parse_sparql_json(json.dumps(doc))
        assert rows == [{"s": "http://x/a", "v0": "hi"}, {"s": "http://x/b"}]

    def test_http_roundtrip(self, http_endpoint):
        t = HttpSparqlTransport(http_endpoint)
        q = build_entity_uris_query(type_restriction(PERSON))
        rows = list(paged_select(t, q, SparqlParams(page_size=10)))
        assert len(rows) == 26

    def test_http_retry_on_503(self, http_endpoint):
        _SparqlHandler.failures_left = 2
        t = HttpSparqlTransport(http_endpoint)
        q = build_entity_uris_query(type_restriction(PERSON))
        params = SparqlParams(page_size=50, retry_count=3, retry_pause_sec=0.01)
        assert len(list(paged_select(t, q, params))) == 26

    def test_distributed_retrieval_over_http(self, spark, http_endpoint):
        # the full stack: executor tasks paging a real HTTP endpoint
        t = HttpSparqlTransport(http_endpoint)
        df = retrieve_entities(
            spark, t, PATHS, type_restriction(PERSON),
            SparqlParams(page_size=8), n_strides=2,
        )
        assert frame_to_dict(df) == expected_entities()


# ---------------------------------------------------------------------------
# paging-protocol properties (hypothesis; pure protocol, no Spark)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def paging_case(draw):
    n = draw(st.integers(min_value=0, max_value=120))
    page = draw(st.integers(min_value=1, max_value=40))
    strides = draw(st.integers(min_value=1, max_value=6))
    return n, page, strides


class TestPagingProperties:
    """PagingSparqlTraversable invariants for ARBITRARY result sizes,
    page sizes and stride counts — page-seam bugs (off-by-one at the
    short page, double-fetch at exact multiples, stride gaps) are
    exactly the class hand-picked sizes miss."""

    @settings(max_examples=60, deadline=None)
    @given(paging_case())
    def test_strided_streams_partition_the_results(self, case):
        n, page, strides = case
        ep = LocalGraphEndpoint(
            [(person(i), TYPE, PERSON) for i in range(n)]
        )
        q = build_entity_uris_query(type_restriction(PERSON))
        params = SparqlParams(page_size=page)
        got = [
            r["s"]
            for k in range(strides)
            for r in paged_select(
                ep, q, params, first_page=k, page_stride=strides
            )
        ]
        assert sorted(got) == sorted(person(i) for i in range(n))
        assert len(got) == len(set(got))  # disjoint: no seam double-fetch

    @settings(max_examples=60, deadline=None)
    @given(paging_case(), st.integers(min_value=0, max_value=150))
    def test_limit_yields_ordered_prefix(self, case, limit):
        n, page, _ = case
        ep = LocalGraphEndpoint(
            [(person(i), TYPE, PERSON) for i in range(n)]
        )
        q = build_entity_uris_query(type_restriction(PERSON))
        rows = [
            r["s"]
            for r in paged_select(ep, q, SparqlParams(page_size=page), limit=limit)
        ]
        assert rows == [person(i) for i in range(min(n, limit))]

    @settings(max_examples=60, deadline=None)
    @given(paging_case())
    def test_query_count_is_minimal(self, case):
        # pages + at most ONE empty probe (only when n is an exact
        # page multiple, PagingSparqlTraversable.scala:75)
        n, page, _ = case
        ep = LocalGraphEndpoint(
            [(person(i), TYPE, PERSON) for i in range(n)]
        )
        q = build_entity_uris_query(type_restriction(PERSON))
        list(paged_select(ep, q, SparqlParams(page_size=page)))
        # n%page!=0: ceil(n/page) pages, the short last one terminates;
        # n%page==0: n/page full pages + one empty probe — both forms
        # reduce to n//page + 1
        assert len(ep.queries) == n // page + 1
