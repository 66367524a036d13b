"""Hierarchical sink: nested-document assembly (JSON) from flat
entity tables whose URI-valued cells reference child entities.

Reference: HierarchicalSink (/root/reference/silk-plugins/
silk-persistent-caching/.../hierarchical/HierarchicalSink.scala:18-160
— root entities + a shared nested-entity cache keyed by URI;
URI-typed, non-rdf:type property values expand recursively into the
referenced entity; depth > min(maxDepth, tables.length) raises
MaxDepthExceededException; a URI absent from the cache raises
ValidationException), JsonEntityWriter (silk-plugins-json/
.../json/JsonEntityWriter.scala:13-105 — non-attribute properties
become JSON arrays, attributes become scalar fields and reject
multiple values, INT/LONG/FLOAT/DOUBLE/DECIMAL/BOOLEAN values are
written as JSON numbers/booleans, everything else as strings) and
JsonSink/JsonTemplate (.../json/JsonSink.scala:10-16 — prefix/suffix
template, single-root-object mode errors on a second root).

Spark-first: the reference buffers nested entities in an LMDB-backed
persistent sorted KV store (PersistentSortedKeyValueStore.scala) so a
single-node writer can do random URI lookups during output. On Spark
that spill cache is unnecessary — URI lookup IS an equi-join. Assembly
runs as a bottom-up topological fixpoint: round k resolves every
entity whose referenced URIs were resolved in rounds < k (leaves in
round 1), by exploding ref cells, joining the accumulated
(uri -> json) frame, and regrouping in cell order. Each round is a
bounded shuffle over the not-yet-resolved remainder; `resolved` is
localCheckpointed per round so plans stay flat. Rows with no ref
values resolve as pure projections (no join). Nothing is collected:
a 10^9-entity hierarchy assembles with min(max_depth, tables) join
rounds, each AQE-sized. JSON text is produced by Column expressions
(`to_json` for escaping) so the whole build stays in codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_MAX_DEPTH = 15  # HierarchicalSink.DEFAULT_MAX_SIZE

_NUMERIC = {"int", "integer", "long", "float", "double", "decimal"}
_CAST = {
    "int": "int",
    "integer": "decimal(38,0)",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "decimal": "decimal(38,18)",
    "boolean": "boolean",
}


class HierarchyError(ValueError):
    """Base for assembly validation failures."""


class DanglingReferenceError(HierarchyError):
    """A URI-valued cell references an entity no table provides
    (ValidationException 'Could not find entity with URI' in
    HierarchicalSink.scala:133)."""


class MaxDepthExceededError(HierarchyError):
    """Reference chain deeper than min(max_depth, table count) — a
    recursive structure (MaxDepthExceededException,
    HierarchicalSink.scala:141-145)."""


@dataclass(frozen=True)
class Prop:
    """One output property. `name` is both the source column (typed
    array<string>, Silk's multi-valued cell) and the JSON field name.
    `value_type='uri'` marks a reference property (expands into the
    child entity); `attribute=True` writes a scalar field and rejects
    multiple values (JsonEntityWriter.startProperty)."""

    name: str
    value_type: str = "string"
    attribute: bool = False

    @property
    def is_ref(self) -> bool:
        return self.value_type == "uri"


@dataclass
class HierTable:
    """One flat entity table: `df` must carry `uri_col` plus one
    array<string> column per Prop (TableSpec.scala analogue)."""

    df: DataFrame
    props: list[Prop] = field(default_factory=list)
    uri_col: str = "uri"


def _scalar_json(col):
    """JSON-encode one scalar Column with full escaping: to_json only
    accepts containers, so wrap in a 1-array and strip the brackets."""
    j = F.to_json(F.array(col))
    return j.substr(F.lit(2), F.length(j) - 2)


def _typed(col, value_type: str):
    """Cast a string value per JsonEntityWriter.writeValue — numbers
    and booleans become JSON literals, everything else a string."""
    vt = value_type.lower()
    if vt in _CAST:
        return col.cast(_CAST[vt])
    return col


def _value_fragment(p: Prop, json_col_name: str | None):
    """The `"name":<...>` fragment for one property.

    Non-ref props encode their cell directly. Ref props splice the
    pre-resolved child JSON objects (column `json_col_name`, an
    array<string> of raw JSON aligned with the cell order) without
    re-escaping.
    """
    if p.is_ref:
        body = F.concat(
            F.lit("["),
            F.array_join(F.col(json_col_name), ","),
            F.lit("]"),
        )
        return F.concat(F.lit(f'"{p.name}":'), body)
    cell = F.coalesce(F.col(p.name), F.array())
    if p.attribute:
        # scalar field; >1 value is a ValidationException in the
        # reference — enforced by _check_attributes before assembly.
        # An EMPTY cell writes no field at all (JsonEntityWriter.
        # startProperty with numberOfValues == 0): return NULL here so
        # concat_ws drops the fragment. F.get (0-indexed) stays
        # null-safe under ANSI mode, unlike element_at.
        one = _typed(F.get(cell, 0), p.value_type)
        return F.when(
            F.size(cell) > 0,
            F.concat(F.lit(f'"{p.name}":'), _scalar_json(one)),
        )
    if p.value_type.lower() in _NUMERIC or p.value_type.lower() == "boolean":
        cell = F.transform(cell, lambda x: _typed(x, p.value_type))
    return F.concat(F.lit(f'"{p.name}":'), F.to_json(cell))


def _entity_json(props: list[Prop]) -> "F.Column":
    frags = [
        _value_fragment(p, f"_resolved_{p.name}" if p.is_ref else None)
        for p in props
    ]
    return F.concat(F.lit("{"), F.concat_ws(",", *frags), F.lit("}"))


def _check_attributes(t: HierTable, where: str) -> None:
    multi = [
        F.max(F.size(F.coalesce(F.col(p.name), F.array()))).alias(p.name)
        for p in t.props
        if p.attribute
    ]
    if not multi:
        return
    row = t.df.select(multi).first()
    for name, mx in row.asDict().items():
        if mx is not None and mx > 1:
            raise HierarchyError(
                f"Property {name} ({where}) is only allowed to have one "
                f"value, but got multiple values"
            )


def _ref_props(t: HierTable) -> list[Prop]:
    return [p for p in t.props if p.is_ref]


def _resolve_round(
    t: HierTable, resolved: DataFrame, uri: str
) -> DataFrame:
    """Try to resolve every row of `t` against the current
    (uri, json) frame. Returns (uri, json, _ok) — _ok true iff every
    referenced URI matched this round."""
    refs = _ref_props(t)
    df = t.df
    if not refs:
        return df.select(
            F.col(uri).alias("uri"),
            _entity_json(t.props).alias("json"),
            F.lit(True).alias("_ok"),
        )
    # one row per (entity, ref prop, position, child uri); empty/null
    # cells contribute no rows and regroup to empty arrays.
    exploded = None
    for p in refs:
        part = df.select(
            F.col(uri).alias("_puri"),
            F.lit(p.name).alias("_prop"),
            F.posexplode_outer(F.coalesce(F.col(p.name), F.array())).alias(
                "_pos", "_curi"
            ),
        ).filter(F.col("_curi").isNotNull())
        exploded = part if exploded is None else exploded.unionByName(part)
    child = resolved.select(
        F.col("uri").alias("_curi"), F.col("json").alias("_cjson")
    )
    joined = exploded.join(child, "_curi", "left")
    per_prop = joined.groupBy("_puri", "_prop").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("_pos"), F.col("_cjson")))
            ),
            lambda s: s.getField("_cjson"),
        ).alias("_kids"),
        F.max(F.col("_cjson").isNull().cast("int")).alias("_miss"),
    )
    pivot = per_prop.groupBy("_puri").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_prop"), F.col("_kids")))
        ).alias("_kmap"),
        F.max("_miss").alias("_anymiss"),
    )
    out = df.join(pivot, df[uri] == pivot["_puri"], "left")
    for p in refs:
        out = out.withColumn(
            f"_resolved_{p.name}",
            F.coalesce(
                F.col("_kmap").getItem(p.name), F.array().cast("array<string>")
            ),
        )
    return out.select(
        F.col(uri).alias("uri"),
        _entity_json(t.props).alias("json"),
        (F.coalesce(F.col("_anymiss"), F.lit(0)) == 0).alias("_ok"),
    )


def assemble_entities(
    root: HierTable,
    nested: list[HierTable] | None = None,
    max_depth: int = DEFAULT_MAX_DEPTH,
    validate: bool = True,
) -> DataFrame:
    """Assemble one JSON document per root entity. Returns
    (uri, json); `json` is the nested object with properties in Prop
    order, ref cells expanded depth-first exactly as
    HierarchicalSink.outputEntity does.

    `validate=True` reproduces the reference's two error classes with
    one action: DanglingReferenceError when a referenced URI exists in
    no nested table, MaxDepthExceededError when a chain outlives
    min(max_depth, table count) rounds (cycles land here).

    Precondition: URIs are unique within each table. The reference's
    KV cache silently keeps the LAST put for a duplicate URI — an
    order that has no deterministic meaning over a distributed frame,
    so duplicates here would duplicate the parent rows instead;
    dedupe upstream (e.g. cdc latest-by-key) before assembling.
    """
    nested = list(nested or [])
    tables = [root, *nested]
    if validate:
        for i, t in enumerate(tables):
            _check_attributes(t, f"table {i}")
    rounds = max(min(int(max_depth), len(tables)) - 1, 0)

    # universe of provided URIs (dangling = referenced, never provided)
    provided = None
    for t in nested:
        u = t.df.select(F.col(t.uri_col).alias("uri"))
        provided = u if provided is None else provided.unionByName(u)

    resolved: DataFrame | None = None
    pending = list(nested)
    for _ in range(rounds):
        if not pending:
            break
        still = []
        for t in pending:
            empty = t.df.sparkSession.createDataFrame([], "uri string, json string")
            attempt = _resolve_round(
                t, resolved if resolved is not None else empty, t.uri_col
            )
            done = attempt.filter("_ok").drop("_ok")
            resolved = done if resolved is None else resolved.unionByName(done)
            if _ref_props(t):
                # rows that missed a child this round retry next round
                remaining = t.df.join(
                    attempt.filter("_ok").select(F.col("uri").alias(t.uri_col)),
                    t.uri_col,
                    "left_anti",
                )
                still.append(HierTable(remaining, t.props, t.uri_col))
        pending = still
        if resolved is not None:
            # flat lineage per round (same pattern as dedup clusters)
            resolved = resolved.localCheckpoint(eager=False)

    empty = root.df.sparkSession.createDataFrame([], "uri string, json string")
    final = _resolve_round(
        root, resolved if resolved is not None else empty, root.uri_col
    )
    if validate:
        bad = final.filter(~F.col("_ok")).select("uri").limit(5)
        bad_uris = [r["uri"] for r in bad.collect()]
        if bad_uris:
            # classify: any referenced-but-never-provided URI => dangling
            ref_uris = None
            for t in tables:
                for p in _ref_props(t):
                    u = t.df.select(
                        F.explode(F.coalesce(F.col(p.name), F.array())).alias("uri")
                    )
                    ref_uris = u if ref_uris is None else ref_uris.unionByName(u)
            dangling = []
            if ref_uris is not None:
                universe = provided if provided is not None else empty.select("uri")
                dangling = [
                    r["uri"]
                    for r in ref_uris.join(universe, "uri", "left_anti")
                    .limit(5)
                    .collect()
                ]
            if dangling:
                raise DanglingReferenceError(
                    f"Could not find entity with URI: {dangling[0]} "
                    f"(and {max(len(dangling) - 1, 0)} more sampled)"
                )
            raise MaxDepthExceededError(
                "Exceeded maximum depth for writing entities. This might "
                "happen if a recursive structure is written; increase "
                f"max_depth (roots stuck: {bad_uris})"
            )
    return final.drop("_ok")


def write_json_sink(
    assembled: DataFrame,
    path: str,
    single_root: bool = False,
    template: tuple[str, str] = ("", ""),
    mode: str = "overwrite",
) -> None:
    """JsonSink.close analogue. Default (array mode) writes the
    entities as JSON-lines part files — the distributed idiom for "an
    array of root objects" (readable back with spark.read.json; a
    100 TB hierarchy never funnels through one stream). Single-root
    mode mirrors the reference exactly: exactly one root object,
    wrapped in the JsonTemplate prefix/suffix, one output file; a
    second root raises (JsonEntityWriter.startEntity)."""
    prefix, suffix = template
    if not single_root:
        assembled.select("json").write.mode(mode).text(path)
        return
    two = [r["json"] for r in assembled.limit(2).collect()]
    if len(two) > 1:
        raise HierarchyError(
            "Writing multiple entities is not possible if the root "
            "mapping is configured to output a single entity."
        )
    doc = prefix + (two[0] if two else "") + suffix
    assembled.sparkSession.createDataFrame(
        [(doc,)], "value string"
    ).coalesce(1).write.mode(mode).text(path)


def read_json_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read back a JSON-lines sink as text rows (one json doc each)."""
    return spark.read.text(path)
