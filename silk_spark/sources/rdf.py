"""RDF sources and sinks: N-Triples file → triples frame → entity
table, plus the owl:sameAs link sink.

Re-expresses the reference's RDF bread-and-butter input path
(/root/reference/silk-plugins/silk-plugins-rdf/src/main/scala/org/
silkframework/plugins/dataset/rdf/sparql/SimpleEntityRetriever.scala:29
and ParallelEntityRetriever.scala:32-55: retrieve entities = per-path
values of subjects matching a restriction) over a FILE-based graph:

  * `ntriples`       — line format parse with built-in regexps (one
                       JVM projection, no Python): (subject, predicate,
                       object, is_literal, lang, datatype).
  * `entity_table`   — subjects → one row per entity, one
                       array<string> column per predicate (Silk cells
                       are Seq[String], silk-core Entity.scala:36-41);
                       exactly the graph-frame shape plans/paths.py
                       navigates over, so `/prop`, `\\prop` and
                       filters work unchanged on RDF data.
  * `restricted_subjects` — rdf:type restriction applied BEFORE the
                       pivot (the SPARQL-restriction pushdown analogue:
                       prune subjects at the triple scan, never
                       materialize unrestricted entities).
  * `write_links_ntriples` — the LinkSink NT output (Silk's
                       links.nt: `<s> <owl:sameAs> <t> .` per link,
                       silk-rules LinkWriter semantics).

SPARQL *endpoints* stay out of scope (network service); the file path
covers the dump-based workflow, which is also the only one that scales
to a 100 TB graph — a SPARQL endpoint cannot stream that, a
partitioned dump can. At scale the .nt text scan splits by line like
any text source, the parse is whole-stage codegen, and the entity
pivot is ONE shuffle with map-side partial aggregation on subject.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
OWL_SAME_AS = "http://www.w3.org/2002/07/owl#sameAs"

# one triple line: subject (uri | blank), predicate (uri), object
# (uri | blank | literal with optional @lang / ^^datatype), dot.
_NT_LINE = (
    r'^\s*(<[^>]*>|_:\S+)'  # 1 subject
    r'\s+(<[^>]*>)'  # 2 predicate
    r'\s+(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)'  # 3 object
    r"\s*\.\s*$"
)


def _strip_uri(c: Column) -> Column:
    return F.regexp_replace(c, r"^<|>$", "")


def _unescape_literal(c: Column) -> Column:
    """N-Triples string unescape for the common escapes (\\" \\\\ \\n
    \\r \\t). Order matters: backslash pairs are resolved last via a
    placeholder so `\\\\n` round-trips to `\\n` (backslash + n), not a
    newline."""
    x = F.regexp_replace(c, r"\\\\", "\x00")
    x = F.regexp_replace(x, r'\\"', '"')
    x = F.regexp_replace(x, r"\\n", "\n")
    x = F.regexp_replace(x, r"\\r", "\r")
    x = F.regexp_replace(x, r"\\t", "\t")
    return F.regexp_replace(x, "\x00", r"\\")


def ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Parse an N-Triples file (or directory / glob of them) into a
    triples frame: (subject, predicate, object, is_literal, lang,
    datatype). Comment and blank lines are dropped; malformed lines
    are dropped too (N-Triples is line-delimited, so one bad line
    never poisons a split). Entirely built-in regexp expressions —
    one codegen projection over the text scan."""
    raw = spark.read.text(path)
    line = F.col("value")
    parsed = raw.select(
        F.regexp_extract(line, _NT_LINE, 1).alias("_s"),
        F.regexp_extract(line, _NT_LINE, 2).alias("_p"),
        F.regexp_extract(line, _NT_LINE, 3).alias("_o"),
    ).filter((F.col("_s") != "") & (F.col("_p") != "") & (F.col("_o") != ""))
    is_lit = F.col("_o").startswith('"')
    lit_value = _unescape_literal(
        F.regexp_extract(F.col("_o"), r'^"((?:[^"\\]|\\.)*)"', 1)
    )
    lang = F.regexp_extract(F.col("_o"), r'"@([A-Za-z0-9-]+)$', 1)
    dtype = F.regexp_extract(F.col("_o"), r"\^\^<([^>]*)>$", 1)
    return parsed.select(
        F.when(F.col("_s").startswith("<"), _strip_uri(F.col("_s")))
        .otherwise(F.col("_s"))
        .alias("subject"),
        _strip_uri(F.col("_p")).alias("predicate"),
        F.when(is_lit, lit_value)
        .when(F.col("_o").startswith("<"), _strip_uri(F.col("_o")))
        .otherwise(F.col("_o"))
        .alias("object"),
        is_lit.alias("is_literal"),
        F.when(lang != "", lang).alias("lang"),
        F.when(dtype != "", dtype).alias("datatype"),
    )


def local_name(uri: str) -> str:
    """Column name for a predicate URI: the fragment / last path
    segment (how Silk's simplified paths name properties)."""
    for sep in ("#", "/", ":"):
        if sep in uri:
            uri = uri.rsplit(sep, 1)[1] or uri
            break
    return uri


def restricted_subjects(triples: DataFrame, type_uri: str) -> DataFrame:
    """Subjects with `rdf:type <type_uri>` — the restriction applied
    at the TRIPLE scan (SPARQL-pushdown analogue: SimpleEntityRetriever
    builds `?s rdf:type <T>` into the retrieval query instead of
    filtering client-side)."""
    return (
        triples.filter(
            (F.col("predicate") == RDF_TYPE) & (F.col("object") == type_uri)
        )
        .select("subject")
        .distinct()
    )


def entity_table(
    triples: DataFrame,
    predicates: list[str] | None = None,
    type_uri: str | None = None,
    uri_col: str = "_uri",
) -> DataFrame:
    """Pivot triples to one row per subject with an array<string>
    column per predicate (multi-valued, Silk Seq[String] cells),
    named by the predicate's local name. `predicates` bounds the
    schema explicitly (recommended — Silk's EntitySchema always
    enumerates its typed paths); when omitted, the distinct predicate
    set is collected (one small aggregate; RDF vocabularies are tiny
    relative to the data). `type_uri` restricts subjects first, so
    the pivot shuffle carries only the restricted entities' triples —
    a broadcast semi-join when the restricted set is small (AQE)."""
    t = triples
    if type_uri is not None:
        # LEFT SEMI against the (broadcast) type triples: no distinct
        # needed — semi-join semantics dedup for free, so the
        # restriction costs zero exchanges (restricted_subjects'
        # distinct() would shuffle before the broadcast)
        matching = triples.filter(
            (F.col("predicate") == RDF_TYPE) & (F.col("object") == type_uri)
        ).select("subject")
        t = t.join(F.broadcast(matching), "subject", "left_semi")
    if predicates is None:
        predicates = sorted(
            r["predicate"]
            for r in t.select("predicate").distinct().collect()
            if r["predicate"] != RDF_TYPE
        )
    names = {}
    for p in predicates:
        n = local_name(p)
        if n in names:  # local-name clash: fall back to the full URI
            n = p
        names[n] = p
    pivoted = (
        t.filter(F.col("predicate").isin(list(names.values())))
        .groupBy(F.col("subject").alias(uri_col))
        .pivot("predicate", list(names.values()))
        .agg(F.array_sort(F.collect_list("object")))
    )
    renamed = pivoted.select(
        uri_col, *[F.col(f"`{p}`").alias(n) for n, p in names.items()]
    )
    return renamed


def write_links_ntriples(
    links: DataFrame,
    path: str,
    source_col: str = "left_uri",
    target_col: str = "right_uri",
    predicate: str = OWL_SAME_AS,
) -> None:
    """LinkSink: serialize links as N-Triples (`<s> <p> <t> .` — the
    reference's links.nt output format). One projection + text write;
    escaping is not needed for URI-only lines."""
    (
        links.select(
            F.concat(
                F.lit("<"), F.col(source_col), F.lit("> <"),
                F.lit(predicate), F.lit("> <"), F.col(target_col), F.lit("> ."),
            ).alias("value")
        ).write.mode("overwrite").text(path)
    )
