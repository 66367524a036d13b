"""RDF source/sink: N-Triples parse, rdf:type restriction pushdown,
entity pivot, path navigation over RDF entities, links.nt sink.

Reference semantics: silk-plugins-rdf SimpleEntityRetriever.scala:29
(entities = per-path values of restricted subjects) and the links.nt
LinkSink output format."""

import os

import pytest

from silk_spark.plans.paths import navigate
from silk_spark.sources.rdf import (
    OWL_SAME_AS,
    RDF_TYPE,
    entity_table,
    local_name,
    ntriples,
    restricted_subjects,
    write_links_ntriples,
)

NT = """\
# a comment line
<urn:p:1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <urn:T:Person> .
<urn:p:1> <http://xmlns.com/foaf/0.1/name> "Alice \\"Al\\" Smith" .
<urn:p:1> <http://xmlns.com/foaf/0.1/knows> <urn:p:2> .
<urn:p:1> <http://xmlns.com/foaf/0.1/knows> <urn:p:3> .

<urn:p:2> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <urn:T:Person> .
<urn:p:2> <http://xmlns.com/foaf/0.1/name> "Bob"@en .
<urn:p:3> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <urn:T:Robot> .
<urn:p:3> <http://xmlns.com/foaf/0.1/name> "C3\\\\PO"^^<http://www.w3.org/2001/XMLSchema#string> .
_:blank <http://xmlns.com/foaf/0.1/name> "anon" .
this line is malformed and must be dropped
"""


@pytest.fixture(scope="module")
def nt_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("rdf")
    p = os.path.join(str(d), "g.nt")
    with open(p, "w") as f:
        f.write(NT)
    return p


@pytest.fixture(scope="module")
def triples(spark, nt_path):
    return ntriples(spark, nt_path)


class TestParse:
    def test_counts_and_malformed_dropped(self, triples):
        # 9 well-formed triples; comment/blank/malformed lines dropped
        assert triples.count() == 9

    def test_uri_literal_lang_datatype(self, triples):
        rows = {(r.subject, r.predicate): r for r in triples.collect()}
        name1 = rows[("urn:p:1", "http://xmlns.com/foaf/0.1/name")]
        assert name1.object == 'Alice "Al" Smith'  # \" unescaped
        assert name1.is_literal and name1.lang is None
        name2 = rows[("urn:p:2", "http://xmlns.com/foaf/0.1/name")]
        assert name2.lang == "en"
        name3 = rows[("urn:p:3", "http://xmlns.com/foaf/0.1/name")]
        assert name3.object == "C3\\PO"  # \\ unescapes to one backslash
        assert name3.datatype == "http://www.w3.org/2001/XMLSchema#string"
        knows = rows[("urn:p:1", "http://xmlns.com/foaf/0.1/knows")]
        assert not knows.is_literal
        anon = rows[("_:blank", "http://xmlns.com/foaf/0.1/name")]
        assert anon.object == "anon"

    def test_local_name(self):
        assert local_name("http://xmlns.com/foaf/0.1/name") == "name"
        assert local_name(RDF_TYPE) == "type"
        assert local_name("urn:p:knows") == "knows"


class TestEntityTable:
    def test_restriction_pushdown(self, triples):
        subs = {r.subject for r in restricted_subjects(triples, "urn:T:Person").collect()}
        assert subs == {"urn:p:1", "urn:p:2"}

    def test_pivot_multivalued_cells(self, triples):
        ent = entity_table(triples, type_uri="urn:T:Person")
        rows = {r["_uri"]: r for r in ent.collect()}
        assert set(rows) == {"urn:p:1", "urn:p:2"}
        assert rows["urn:p:1"]["knows"] == ["urn:p:2", "urn:p:3"]  # Seq[String] cell
        assert rows["urn:p:1"]["name"] == ['Alice "Al" Smith']
        # absent property -> EMPTY cell (Silk's Seq[String] is empty,
        # never null — Entity.scala:36-41)
        assert rows["urn:p:2"]["knows"] == []

    def test_navigate_forward_path_over_rdf(self, spark, triples):
        """The path language runs unchanged on the pivoted frame."""
        ent = entity_table(triples, type_uri="urn:T:Person")
        out = navigate(ent, "/name")
        got = {tuple(r["_value"]) for r in out.filter("_value is not null").collect()}
        assert ('Alice "Al" Smith',) in got and ("Bob",) in got

    def test_navigate_backward_over_rdf(self, spark, triples):
        """\\knows from p:2: who knows p:2?"""
        ent = entity_table(triples)
        p2 = ent.filter("_uri = 'urn:p:2'")
        out = navigate(p2, "\\knows", graph=ent)
        assert {r["_uri"] for r in out.collect()} == {"urn:p:1"}


class TestLinkSink:
    def test_round_trip(self, spark, tmp_path):
        links = spark.createDataFrame(
            [("urn:p:1", "urn:q:9"), ("urn:p:2", "urn:q:8")],
            "left_uri string, right_uri string",
        )
        out = str(tmp_path / "links_nt")
        write_links_ntriples(links, out)
        back = ntriples(spark, out)
        got = {(r.subject, r.predicate, r.object) for r in back.collect()}
        assert got == {
            ("urn:p:1", OWL_SAME_AS, "urn:q:9"),
            ("urn:p:2", OWL_SAME_AS, "urn:q:8"),
        }


class TestUcharAndMalformed:
    def test_uchar_unicode_escapes(self, spark, tmp_path):
        """Spec UCHAR escapes (\\uXXXX and \\UXXXXXXXX incl.
        supplementary planes) must decode to characters; an ESCAPED
        backslash before u must stay verbatim; a non-hex \\u sequence
        passes through rather than corrupting the literal."""
        lines = [
            '<urn:u:1> <urn:v:t> "Caf\\u00E9" .',
            '<urn:u:2> <urn:v:t> "\\U0001F600 grin" .',
            '<urn:u:3> <urn:v:t> "lit \\\\u0041 kept" .',
            '<urn:u:4> <urn:v:t> "bad \\uZZZZ kept" .',
            '<urn:u:5> <urn:v:t> "\\u0041\\u0042\\u0043" .',
        ]
        p = str(tmp_path / "uchar.nt")
        with open(p, "w") as f:
            f.write("\n".join(lines) + "\n")
        got = {r.subject: r.object for r in ntriples(spark, p).collect()}
        assert got["urn:u:1"] == "Café"
        assert got["urn:u:2"] == "\U0001F600 grin"
        assert got["urn:u:3"] == "lit \\u0041 kept"
        assert got["urn:u:4"] == "bad \\uZZZZ kept"
        assert got["urn:u:5"] == "ABC"

    def test_strict_mode_raises_on_malformed(self, spark, nt_path):
        with pytest.raises(Exception, match="malformed N-Triples line"):
            ntriples(spark, nt_path, strict=True).count()

    def test_nonstrict_counts_dropped_lines_in_plan(self, spark, nt_path):
        """Default mode attaches an observe() metric so dropped lines
        are accounted, not silently lost."""
        t = ntriples(spark, nt_path)
        plan = t._jdf.queryExecution().analyzed().toString()
        assert "silk.ntriples" in plan, plan
        assert t.count() == 9  # parse result unchanged by the metric


class TestPredicateCap:
    def test_entity_table_caps_adversarial_vocabulary(self, spark):
        from silk_spark.sources.rdf import entity_map_table

        rows = [(f"urn:s:{i % 7}", f"urn:pred:{i}", f"v{i}", False, None, None)
                for i in range(50)]
        t = spark.createDataFrame(
            rows,
            "subject string, predicate string, object string, "
            "is_literal boolean, lang string, datatype string",
        )
        with pytest.raises(ValueError, match="distinct predicates"):
            entity_table(t, max_predicates=10)
        # the schema-free map variant handles the same graph fine
        m = {r["_uri"]: r["props"] for r in entity_map_table(t).collect()}
        assert len(m) == 7
        assert m["urn:s:0"]["urn:pred:0"] == ["v0"]
        assert m["urn:s:0"]["urn:pred:49"] == ["v49"]


class TestEscapeRoundTrip:
    def test_random_literals_round_trip(self, spark, tmp_path):
        """Serialize random literals with the standard N-Triples escape
        map, parse them back, and require exact value equality —
        covers quotes, backslashes, tabs, newlines, and their
        adversarial combinations (e.g. backslash-then-n as two chars)."""
        import random as _random

        rng = _random.Random(11)
        alphabet = list("abc XYZ 019 .,:;!?") + ['"', "\\", "\n", "\t", "\r"]
        originals = {}
        lines = []
        for i in range(200):
            s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
            originals[f"urn:d:{i}"] = s
            esc = (
                s.replace("\\", "\\\\")
                .replace('"', '\\"')
                .replace("\n", "\\n")
                .replace("\r", "\\r")
                .replace("\t", "\\t")
            )
            lines.append(f'<urn:d:{i}> <urn:v:text> "{esc}" .')
        # adversarial fixed case: literal backslash followed by letter n
        originals["urn:d:adv"] = "a\\nb"  # 4 chars: a, backslash, n, b
        lines.append('<urn:d:adv> <urn:v:text> "a\\\\nb" .')
        p = str(tmp_path / "esc.nt")
        with open(p, "w") as f:
            f.write("\n".join(lines) + "\n")
        got = {
            r.subject: r.object
            for r in ntriples(spark, p).collect()
        }
        # newline-bearing literals span lines in the FILE and are
        # legitimately unparseable in line-oriented N-Triples — the
        # writer above still emits them escaped on one line, so they
        # must round-trip; nothing else may be dropped
        assert got == originals
