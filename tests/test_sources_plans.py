"""File sources, Silk path translator, workflow DAG."""

import json
import os

import pytest
from pyspark.sql import functions as F

from silk_spark.plans.paths import evaluate, parse_path
from silk_spark.plans.workflow import Workflow
from silk_spark.sources.files import (
    bulk_source,
    csv_source,
    json_source,
    peek_source,
    profile_source,
    sample_source,
    text_source,
    with_row_uri,
)


@pytest.fixture(scope="module")
def datadir(tmp_path_factory):
    d = tmp_path_factory.mktemp("srcs")
    (d / "a.csv").write_text("id,name,tags\n1,alice,x;y\n2,bob,z\n")
    (d / "b.csv").write_text("id,name,tags\n3,carol,\n")
    (d / "doc.json").write_text(json.dumps(
        {"items": [
            {"id": 1, "labels": [{"value": "Haus", "lang": "de"}, {"value": "house", "lang": "en"}],
             "price": 5, "name": "haus"},
            {"id": 2, "labels": [{"value": "chat", "lang": "fr"}], "price": 50, "name": "chat"},
        ]}
    ))
    (d / "t.txt").write_text("hello whole file")
    return str(d)


class TestFileSources:
    def test_csv_with_arrays_and_uri(self, spark, datadir):
        df = csv_source(spark, os.path.join(datadir, "a.csv"), array_separator=";", uri_prefix="urn:r:")
        rows = {r.id: r for r in df.collect()}
        assert rows[1].tags == ["x", "y"] and rows[2].tags == ["z"]
        assert rows[1]._uri.startswith("urn:r:")
        # content-hash URIs: stable across re-reads
        again = {r.id: r._uri for r in csv_source(spark, os.path.join(datadir, "a.csv"), array_separator=";", uri_prefix="urn:r:").collect()}
        assert again[1] == rows[1]._uri

    def test_bulk_union(self, spark, datadir):
        df = bulk_source(spark, "csv", os.path.join(datadir, "a.csv"), os.path.join(datadir, "b.csv"), header=True)
        assert df.count() == 3

    def test_json_base_path(self, spark, datadir):
        df = json_source(spark, os.path.join(datadir, "doc.json"), base_path="items")
        assert df.count() == 2 and "labels" in df.columns

    def test_xml_row_tag_and_base_path(self, spark, datadir):
        from silk_spark.sources.files import parse_xml_column, xml_source

        xml = (
            "<catalog>"
            "<book id=\"1\"><title>Dune</title><price>9.99</price>"
            "<tags><tag>scifi</tag><tag>classic</tag></tags></book>"
            "<book id=\"2\"><title>Emma</title><price>5.00</price>"
            "<tags><tag>romance</tag></tags></book>"
            "</catalog>"
        )
        path = os.path.join(datadir, "books.xml")
        with open(path, "w") as f:
            f.write(xml)
        df = xml_source(spark, path, row_tag="book")
        rows = {r["_id"]: r for r in df.collect()}
        assert rows[1]["title"] == "Dune" and float(rows[2]["price"]) == 5.0
        # base-path navigation below the row element
        tags = xml_source(spark, path, row_tag="book", base_path="tags")
        flat = sorted(x for r in tags.collect() for x in r["tag"])
        assert flat == ["classic", "romance", "scifi"]
        # from_xml string-column face
        sdf = spark.createDataFrame(
            [("<r><a>1</a><b>x</b></r>",)], "xml string"
        ).select(parse_xml_column(F.col("xml"), "a INT, b STRING").alias("s"))
        r = sdf.select("s.a", "s.b").first()
        assert r["a"] == 1 and r["b"] == "x"

    def test_text_whole_file(self, spark, datadir):
        df = text_source(spark, os.path.join(datadir, "t.txt"))
        assert df.count() == 1 and df.first().text == "hello whole file"

    def test_sample_and_peek(self, spark, datadir):
        df = bulk_source(spark, "csv", os.path.join(datadir, "a.csv"), header=True)
        assert peek_source(df, 1).count() == 1
        assert sample_source(df, 1, seed=7).count() <= 1

    def test_profile(self, spark, datadir):
        df = csv_source(spark, os.path.join(datadir, "a.csv"))
        prof = {r.column: r for r in profile_source(df).collect()}
        assert prof["id"].nonnull == 2 and prof["id"].rows == 2


class TestPlaceholderSourcesAndSinks:
    def test_empty_and_variable(self, spark):
        from silk_spark.sources.files import empty_source, variable_source

        e = empty_source(spark, "a int, b string")
        assert e.count() == 0 and [f.name for f in e.schema.fields] == ["a", "b"]
        v = variable_source(spark, [(1, "x")], "a int, b string")
        assert v.first()["b"] == "x"
        assert variable_source(spark, [], "a int, b string").count() == 0

    def test_write_sinks_roundtrip(self, spark, datadir):
        from silk_spark.sources.files import write_links, write_sink

        df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
        out = os.path.join(datadir, "sink_csv")
        write_sink(df, "csv", out)
        back = spark.read.option("header", True).csv(out)
        assert back.count() == 2 and set(back.columns) == {"id", "v"}
        links = spark.createDataFrame(
            [("urn:a", "urn:b", 0.9)], "source string, target string, confidence double"
        )
        lout = os.path.join(datadir, "sink_links")
        write_links(links, lout, fmt="json", inverse=True)
        row = spark.read.json(lout).first()
        assert row["source"] == "urn:b" and row["target"] == "urn:a"
        assert row["link_type"] == "owl:sameAs" and row["confidence"] == 0.9


class TestObjectMapping:
    def test_nested_struct_with_child_validation(self, spark):
        """ObjectMapping (TransformRule.scala:376-431): child rules
        render as struct fields; child validation failures tag parent
        _errors as 'obj.field'."""
        from silk_spark.operators.transform_spec import TransformSpec

        df = spark.createDataFrame(
            [(1, "alice", 30), (2, "bob", -5)], "id int, name string, age int"
        )
        child = (
            TransformSpec()
            .uri(["id"], prefix="urn:person:")
            .direct("name", "name")
            .complex("age", lambda d: F.col("age"), validate=lambda c: c >= 0)
        )
        spec = TransformSpec().direct("id", "id").obj("person", child)
        out, _ = spec.execute(df)
        rows = {r["id"]: r for r in out.collect()}
        assert rows[1]["person"]["_uri"] == "urn:person:1"
        assert rows[1]["person"]["name"] == "alice" and rows[1]["person"]["age"] == 30
        assert rows[1]["_errors"] == []
        assert rows[2]["person"]["age"] is None
        assert rows[2]["_errors"] == ["person.age"]

    def test_obj_nests_recursively(self, spark):
        """The reference nests ObjectMapping arbitrarily: a child spec
        containing its own obj() must compile into nested structs in
        the one projection, with dotted error tags at every depth."""
        from silk_spark.operators.transform_spec import TransformSpec

        df = spark.createDataFrame(
            [(1, "alice", 30, "NYC"), (2, "bob", -5, "x")],
            "id int, name string, age int, city string",
        )
        address = TransformSpec().complex(
            "city", lambda d: F.col("city"), validate=lambda c: F.length(c) >= 2
        )
        person = (
            TransformSpec()
            .direct("name", "name")
            .complex("age", lambda d: F.col("age"), validate=lambda c: c >= 0)
            .obj("address", address)
        )
        spec = TransformSpec().direct("id", "id").obj("person", person)
        out, _ = spec.execute(df)
        rows = {r["id"]: r for r in out.collect()}
        assert rows[1]["person"]["address"]["city"] == "NYC"
        assert rows[1]["_errors"] == []
        assert rows[2]["person"]["age"] is None
        assert rows[2]["person"]["address"]["city"] is None
        assert sorted(rows[2]["_errors"]) == ["person.address.city", "person.age"]


class TestPathLanguage:
    def test_parse_forms(self):
        from silk_spark.plans.paths import Backward

        assert len(parse_path("/a/b")) == 2
        assert len(parse_path("a")) == 1
        assert len(parse_path("?x/a[b = 'c']")) == 2
        steps = parse_path("\\inverse")
        assert isinstance(steps[0], Backward) and steps[0].prop == "inverse"

    def test_backward_requires_navigate(self, spark):
        df = spark.createDataFrame([(1,)], "a int")
        with pytest.raises(ValueError, match="backward"):
            evaluate(df, "\\inverse")

    def test_backward_navigation_across_frames(self, spark):
        """\\maker from companies lands on the products pointing at
        them (PathOperator.scala:71-114 BackwardOperator as a reversed
        join), composing with a forward run after the join."""
        from silk_spark.plans.paths import navigate

        companies = spark.createDataFrame(
            [("urn:c:acme", "Acme"), ("urn:c:duff", "Duff")], "_uri string, name string"
        )
        products = spark.createDataFrame(
            [
                ("urn:p:anvil", "urn:c:acme", "Anvil"),
                ("urn:p:rocket", "urn:c:acme", "Rocket"),
                ("urn:p:beer", "urn:c:duff", "Beer"),
            ],
            "_uri string, maker string, label string",
        )
        out = navigate(companies, "\\maker/label", graph=products)
        got = sorted((r["_from_uri"], r["_value"]) for r in out.collect())
        assert got == [
            ("urn:c:acme", "Anvil"),
            ("urn:c:acme", "Rocket"),
            ("urn:c:duff", "Beer"),
        ]

    def test_forward_and_lang_filter(self, spark, datadir):
        df = json_source(spark, os.path.join(datadir, "doc.json"), base_path="items")
        vals = df.select(evaluate(df, "/labels[@lang = 'de']").alias("v")).collect()
        flat = [x for r in vals for x in r.v]
        assert flat == ["Haus"]

    def test_property_filter_scalar(self, spark, datadir):
        df = json_source(spark, os.path.join(datadir, "doc.json"), base_path="items")
        out = df.select(evaluate(df, "/name[price > 10]").alias("v")).collect()
        assert sorted([r.v for r in out], key=str) == [None, "chat"]


class TestWorkflow:
    def test_dag_execution_and_report(self, spark):
        df = spark.range(100).select(F.col("id"), (F.col("id") % 3).alias("k"))
        wf = (
            Workflow()
            .dataset("src", df)
            .add("filtered", lambda ins: ins["src"].filter(F.col("id") >= 10), ["src"])
            .add(
                "agg",
                lambda ins: ins["filtered"].groupBy("k").agg(F.count("*").alias("n")),
                ["filtered"],
            )
        )
        res = wf.execute()
        rows = {r.k: r.n for r in res.outputs["agg"].collect()}
        assert sum(rows.values()) == 90
        rep = res.report()
        assert rep["agg"].get("rows") == 3
        assert rep["filtered"].get("rows") == 90

    def test_cycle_detection(self, spark):
        wf = Workflow()
        wf.add("a", lambda ins: None, ["b"])
        wf.add("b", lambda ins: None, ["a"])
        with pytest.raises(ValueError, match="cycle"):
            wf.topo_order()

    def test_unknown_input(self, spark):
        wf = Workflow().add("a", lambda ins: None, ["nope"])
        with pytest.raises(ValueError, match="unknown input"):
            wf.topo_order()
