"""Silk path-language → Column translator.

Reference grammar (/root/reference/silk-core/src/main/scala/org/
silkframework/entity/paths/PathParser.scala:28-123; operators at
PathOperator.scala:71-114):

    path     := "?"var? (op)*
    op       := "/" prop          (ForwardOperator)
              | "\\" prop         (BackwardOperator — needs a reversed
                                   join; rejected here, use an explicit
                                   join in the DAG instead)
              | "[" filter "]"
    filter   := "@lang" cmp 'lit' (LanguageFilter)
              | prop cmp lit      (PropertyFilter; cmp in = != < <= > >=)

Spark mapping: forward steps navigate struct fields; a step into an
``array<struct>`` filters/projects with higher-order functions so
multi-valued paths stay multi-valued (Silk cells are Seq[String],
Entity.scala:36-41). The result of `evaluate` is the path's value
column (array when any step was multi-valued).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<fwd>/\s*(?P<fprop>[\w:-]+)) |
        (?P<bwd>\\\s*(?P<bprop>[\w:-]+)) |
        (?P<filt>\[\s*(?P<fexpr>[^\]]+)\s*\])
    )""",
    re.VERBOSE,
)

_FILTER = re.compile(
    r"""^\s*(?P<prop>@?[\w:-]+)\s*(?P<op>!=|>=|<=|=|<|>)\s*
        (?:'(?P<sq>[^']*)'|"(?P<dq>[^"]*)"|(?P<bare>\S+))\s*$""",
    re.VERBOSE,
)

_CMP = {
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
}


@dataclass
class Forward:
    prop: str


@dataclass
class Backward:
    prop: str


@dataclass
class Filter:
    prop: str  # "@lang" or a sibling property name
    op: str
    value: str


def parse_path(path: str) -> list:
    """Parse a Silk path string into operator steps (Forward /
    Backward / Filter). Backward steps lower to a reversed join
    (`backward_join`), not a column expression."""
    s = path.strip()
    if s.startswith("?"):  # leading variable: "?a/prop" — variable is implicit here
        s = s[s.index("/"):] if "/" in s else ""
    if s and not s.startswith(("/", "\\", "[")):
        s = "/" + s  # bare "prop" == "/prop" (PathParser simplified syntax)
    ops: list = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            raise ValueError(f"cannot parse path {path!r} at {s[pos:]!r}")
        if m.group("fwd"):
            ops.append(Forward(m.group("fprop")))
        elif m.group("bwd"):
            ops.append(Backward(m.group("bprop")))
        else:
            fm = _FILTER.match(m.group("fexpr"))
            if not fm:
                raise ValueError(f"cannot parse filter {m.group('fexpr')!r}")
            value = fm.group("sq") or fm.group("dq") or fm.group("bare")
            ops.append(Filter(fm.group("prop"), fm.group("op"), value))
        pos = m.end()
    return ops


def backward_join(
    entities: DataFrame,
    graph: DataFrame,
    prop: str,
    uri_col: str = "_uri",
) -> DataFrame:
    """`\\prop` lowering (PathOperator.scala:71-114 BackwardOperator):
    navigate AGAINST the edge — from each entity to the `graph` rows
    whose `prop` points at it. A reversed equi-join: the engine picks
    broadcast vs shuffle from the side sizes; multi-valued (array)
    `prop` columns are exploded so any referencing value matches.

    Returns the matching `graph` rows with the navigated-from entity
    URI attached as `_from_uri`."""
    ref = F.col(prop)
    g = graph
    if dict(g.dtypes).get(prop, "").startswith("array"):
        g = g.withColumn("_ref", F.explode(ref))
    else:
        g = g.withColumn("_ref", ref)
    e = entities.select(F.col(uri_col).alias("_from_uri"))
    return (
        g.join(e, g["_ref"] == e["_from_uri"])
        .drop("_ref")
    )


def navigate(
    df: DataFrame,
    path: str,
    graph: DataFrame | None = None,
    uri_col: str = "_uri",
) -> DataFrame:
    """Evaluate a mixed forward/backward path across frames: forward
    and filter runs compile to one Column per run (`evaluate`), each
    Backward step becomes one reversed join against `graph`. Returns
    a frame with the path value in `_value` plus `_from_uri` lineage
    for joined steps (the workflow-layer face of the path language)."""
    ops = parse_path(path)
    cur = df
    run: list = []

    def flush(frame: DataFrame, steps: list) -> DataFrame:
        if not steps:
            return frame
        col = _compile_steps(frame, steps, f"column run in {path!r}")
        return frame.withColumn("_value", col)

    for op in ops:
        if isinstance(op, Backward):
            cur = flush(cur, run)
            run = []
            if graph is None:
                raise ValueError(f"backward step \\{op.prop} needs `graph`")
            cur = backward_join(cur, graph, op.prop, uri_col)
        else:
            run.append(op)
    return flush(cur, run)


def evaluate(df: DataFrame, path: str) -> Column:
    """Compile a Silk path to a Column over `df`'s schema.

    Semantics per step:
      * Forward into scalar/struct → `getField`
      * Forward into array<struct> → `transform(arr, x -> x.prop)`
      * Filter right after a multi-valued step → `filter(arr, pred)`;
        a LanguageFilter expects struct elements {value, lang} and
        yields their values (LanguageValueType encoding)

    Backward steps are not column-expressible — use `navigate`.
    """
    ops = parse_path(path)
    if any(isinstance(op, Backward) for op in ops):
        raise ValueError(
            f"path {path!r} has a backward step; use navigate(df, path, graph)"
        )
    return _compile_steps(df, ops, path)


def _compile_steps(df: DataFrame, ops: list, path: str) -> Column:
    col: Column | None = None
    multi = False  # current column is an array
    dtype = df.schema  # track static type while we can (top levels)

    for op in ops:
        if isinstance(op, Forward):
            if col is None:
                col = F.col(op.prop)
                f = dtype[op.prop] if op.prop in dtype.fieldNames() else None
                t = f.dataType if f else None
            else:
                if multi:
                    col = F.transform(col, lambda x, p=op.prop: x.getField(p))
                    t = None
                else:
                    col = col.getField(op.prop)
                    t = None
            if t is not None and t.typeName() == "array":
                multi = True
        else:  # Filter
            if col is None:
                raise ValueError(f"path {path!r} starts with a filter")
            if op.prop == "@lang":
                pred = lambda x: _CMP[op.op](x.getField("lang"), F.lit(op.value))  # noqa: E731
                if not multi:
                    raise ValueError("@lang filter requires a multi-valued language step")
                col = F.transform(F.filter(col, pred), lambda x: x.getField("value"))
            else:
                if multi:
                    col = F.filter(
                        col,
                        lambda x, o=op: _CMP[o.op](x.getField(o.prop), F.lit(o.value)),
                    )
                else:
                    # property filter on a scalar step: keep value iff
                    # the sibling property satisfies the predicate
                    col = F.when(_CMP[op.op](F.col(op.prop), F.lit(op.value)), col)
    if col is None:
        raise ValueError(f"empty path {path!r}")
    return col
