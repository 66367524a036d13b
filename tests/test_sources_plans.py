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


class TestPathLanguage:
    def test_parse_forms(self):
        assert len(parse_path("/a/b")) == 2
        assert len(parse_path("a")) == 1
        assert len(parse_path("?x/a[b = 'c']")) == 2
        with pytest.raises(ValueError):
            parse_path("\\inverse")

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
