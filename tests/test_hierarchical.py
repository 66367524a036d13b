"""Hierarchical sink: nested-document assembly.

Reference semantics under test: HierarchicalSink.scala:18-160 (root +
URI-referenced nested entities, depth guard, dangling-URI validation)
and JsonEntityWriter.scala:13-105 (array vs attribute fields, typed
values, single-root mode)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from silk_spark.sources.hierarchical import (
    DanglingReferenceError,
    HierarchyError,
    HierTable,
    MaxDepthExceededError,
    Prop,
    assemble_entities,
    read_json_sink,
    write_json_sink,
)


def _person_fixture(spark):
    """The hierarchicalPerson shape from the reference test projects:
    persons with nested addresses."""
    persons = spark.createDataFrame(
        [
            ("p1", ["John Doe"], ["a1", "a2"]),
            ("p2", ["Max Noe"], ["a2"]),
            ("p3", ["No Address"], []),
        ],
        "uri string, name array<string>, address array<string>",
    )
    addresses = spark.createDataFrame(
        [
            ("a1", ["Main St 1"], ["Springfield"]),
            ("a2", ["Elm St 9"], ["Shelbyville"]),
        ],
        "uri string, street array<string>, city array<string>",
    )
    root = HierTable(
        persons,
        [
            Prop("name", attribute=True),
            Prop("address", value_type="uri"),
        ],
    )
    nested = [
        HierTable(
            addresses,
            [Prop("street", attribute=True), Prop("city")],
        )
    ]
    return root, nested


def test_nested_assembly_shape(spark):
    root, nested = _person_fixture(spark)
    out = {r["uri"]: r["json"] for r in assemble_entities(root, nested).collect()}
    assert json.loads(out["p1"]) == {
        "name": "John Doe",
        "address": [
            {"street": "Main St 1", "city": ["Springfield"]},
            {"street": "Elm St 9", "city": ["Shelbyville"]},
        ],
    }
    assert json.loads(out["p3"]) == {"name": "No Address", "address": []}
    # multi-valued ref order follows the cell order
    assert json.loads(out["p2"])["address"][0]["street"] == "Elm St 9"


def test_ref_order_preserved(spark):
    root = HierTable(
        spark.createDataFrame(
            [("p", ["c3", "c1", "c2"])], "uri string, kids array<string>"
        ),
        [Prop("kids", value_type="uri")],
    )
    kids = HierTable(
        spark.createDataFrame(
            [("c1", ["x"]), ("c2", ["y"]), ("c3", ["z"])],
            "uri string, v array<string>",
        ),
        [Prop("v")],
    )
    row = assemble_entities(root, [kids]).collect()[0]
    got = [k["v"][0] for k in json.loads(row["json"])["kids"]]
    assert got == ["z", "x", "y"]


def test_typed_values(spark):
    root = HierTable(
        spark.createDataFrame(
            [("e", ["42"], ["3.5"], ["true"], ["plain"])],
            "uri string, n array<string>, d array<string>, "
            "b array<string>, s array<string>",
        ),
        [
            Prop("n", value_type="long"),
            Prop("d", value_type="double"),
            Prop("b", value_type="boolean"),
            Prop("s"),
        ],
    )
    doc = json.loads(assemble_entities(root).collect()[0]["json"])
    assert doc == {"n": [42], "d": [3.5], "b": [True], "s": ["plain"]}


def test_string_escaping(spark):
    root = HierTable(
        spark.createDataFrame(
            [("e", ['he said "hi"\nline2\\end'])], "uri string, s array<string>"
        ),
        [Prop("s", attribute=True)],
    )
    doc = json.loads(assemble_entities(root).collect()[0]["json"])
    assert doc["s"] == 'he said "hi"\nline2\\end'


def test_attribute_multi_value_rejected(spark):
    root = HierTable(
        spark.createDataFrame(
            [("e", ["a", "b"])], "uri string, s array<string>"
        ),
        [Prop("s", attribute=True)],
    )
    with pytest.raises(HierarchyError, match="only allowed to have one"):
        assemble_entities(root)


def test_dangling_reference_raises(spark):
    root = HierTable(
        spark.createDataFrame(
            [("p", ["missing"])], "uri string, kid array<string>"
        ),
        [Prop("kid", value_type="uri")],
    )
    kids = HierTable(
        spark.createDataFrame([("k", ["v"])], "uri string, v array<string>"),
        [Prop("v")],
    )
    with pytest.raises(DanglingReferenceError, match="missing"):
        assemble_entities(root, [kids]).collect()


def test_cycle_raises_max_depth(spark):
    # a <-> b reference cycle inside one nested table: never resolvable
    root = HierTable(
        spark.createDataFrame([("p", ["a"])], "uri string, kid array<string>"),
        [Prop("kid", value_type="uri")],
    )
    cyc = HierTable(
        spark.createDataFrame(
            [("a", ["b"]), ("b", ["a"])], "uri string, kid array<string>"
        ),
        [Prop("kid", value_type="uri")],
    )
    with pytest.raises(MaxDepthExceededError):
        assemble_entities(root, [cyc], max_depth=6).collect()


def test_same_table_chain_within_depth(spark):
    # recursive same-table references resolve over successive rounds
    # as long as the chain fits min(max_depth, tables)
    root = HierTable(
        spark.createDataFrame([("p", ["a"])], "uri string, kid array<string>"),
        [Prop("kid", value_type="uri")],
    )
    chain = HierTable(
        spark.createDataFrame(
            [("a", ["b"], ["A"]), ("b", [], ["B"])],
            "uri string, kid array<string>, v array<string>",
        ),
        [Prop("kid", value_type="uri"), Prop("v")],
    )
    # needs 2 nested rounds: pad the table list so
    # min(max_depth, len(tables)) - 1 >= 2
    pad = HierTable(
        spark.createDataFrame([], "uri string, v array<string>"), [Prop("v")]
    )
    doc = json.loads(
        assemble_entities(root, [chain, pad]).collect()[0]["json"]
    )
    assert doc["kid"][0]["v"] == ["A"]
    assert doc["kid"][0]["kid"][0]["v"] == ["B"]


def test_sink_roundtrip(tmp_path, spark):
    root, nested = _person_fixture(spark)
    out = assemble_entities(root, nested)
    path = os.path.join(str(tmp_path), "sink")
    write_json_sink(out, path)
    back = read_json_sink(spark, path)
    assert back.count() == 3
    docs = [json.loads(r["value"]) for r in back.collect()]
    assert {d["name"] for d in docs} == {"John Doe", "Max Noe", "No Address"}


def test_single_root_mode(tmp_path, spark):
    root, nested = _person_fixture(spark)
    one = HierTable(root.df.filter("uri = 'p1'"), root.props)
    out = assemble_entities(one, nested)
    path = os.path.join(str(tmp_path), "single")
    write_json_sink(out, path, single_root=True, template=("{\"data\":", "}"))
    text = "\n".join(
        r["value"] for r in spark.read.text(path).collect()
    )
    doc = json.loads(text)
    assert doc["data"]["name"] == "John Doe"

    multi = assemble_entities(root, nested)
    with pytest.raises(HierarchyError, match="multiple entities"):
        write_json_sink(multi, os.path.join(str(tmp_path), "x"), single_root=True)


def test_assembly_plan_is_pure_jvm(spark):
    root, nested = _person_fixture(spark)
    plan = assemble_entities(root, nested)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
