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

SPARQL *endpoint* retrieval (the paged + parallel protocol of
SimpleEntityRetriever/ParallelEntityRetriever) lives in the sibling
module `sources/sparql.py`; this file covers the dump-based workflow,
which is the one that scales to a 100 TB graph — a SPARQL endpoint
cannot stream that, a partitioned dump can. At scale the .nt text
scan splits by line like any text source, the parse is whole-stage
codegen, and the entity pivot is ONE shuffle with map-side partial
aggregation on subject.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
OWL_SAME_AS = "http://www.w3.org/2002/07/owl#sameAs"

_OBS_SEQ = 0  # per-call suffix for observe() metric names (unique per query)

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


def _expand_uchar(x: Column) -> Column:
    """Expand N-Triples UCHAR escapes (\\uXXXX, \\UXXXXXXXX) to their
    characters — pure JVM expressions: split on a lookahead so each
    escape heads its own segment, then per segment unhex the code
    units through decode(…,'UTF-16BE'). Supplementary code points
    (\\U…) are converted to a surrogate pair with integer arithmetic.
    Segments that don't match a full escape pass through verbatim
    (the caller already resolved \\\\, so no false positives). Must
    run AFTER the backslash-pair placeholder pass."""
    segs = F.split(x, r"(?=\\[uU])")

    def fix(seg: Column) -> Column:
        rest_u4 = F.substring(seg, F.lit(7), F.length(seg))
        rest_u8 = F.substring(seg, F.lit(11), F.length(seg))
        bmp_char = F.decode(F.unhex(F.substring(seg, 3, 4)), "UTF-16BE")
        cp = F.conv(F.substring(seg, 3, 8), 16, 10).cast("bigint")
        high = F.lit(0xD800) + F.shiftright(cp - F.lit(0x10000), 10)
        low = F.lit(0xDC00) + (cp - F.lit(0x10000)).bitwiseAND(F.lit(0x3FF))
        sup_char = F.decode(
            F.unhex(
                F.concat(F.lpad(F.hex(high), 4, "0"), F.lpad(F.hex(low), 4, "0"))
            ),
            "UTF-16BE",
        )
        u8_char = F.when(
            cp < 0x10000, F.decode(F.unhex(F.lpad(F.hex(cp), 4, "0")), "UTF-16BE")
        ).otherwise(sup_char)
        return (
            F.when(seg.rlike(r"^\\u[0-9A-Fa-f]{4}"), F.concat(bmp_char, rest_u4))
            .when(seg.rlike(r"^\\U[0-9A-Fa-f]{8}"), F.concat(u8_char, rest_u8))
            .otherwise(seg)
        )

    return F.array_join(F.transform(segs, fix), "")


def _unescape_literal(c: Column) -> Column:
    """N-Triples string unescape: ECHAR (\\" \\\\ \\n \\r \\t) plus the
    spec's UCHAR unicode escapes (\\uXXXX / \\UXXXXXXXX). Order
    matters: backslash pairs are resolved FIRST via a placeholder so
    `\\\\n` round-trips to `\\n` (backslash + n), not a newline, and
    `\\\\u0041` stays a literal `\\u0041`."""
    x = F.regexp_replace(c, r"\\\\", "\x00")
    x = F.regexp_replace(x, r'\\"', '"')
    x = F.regexp_replace(x, r"\\n", "\n")
    x = F.regexp_replace(x, r"\\r", "\r")
    x = F.regexp_replace(x, r"\\t", "\t")
    x = _expand_uchar(x)
    return F.regexp_replace(x, "\x00", r"\\")


def ntriples(spark: SparkSession, path: str, strict: bool = False) -> DataFrame:
    """Parse an N-Triples file (or directory / glob of them) into a
    triples frame: (subject, predicate, object, is_literal, lang,
    datatype). Comment and blank lines are dropped. Malformed lines
    (non-blank, non-comment, not matching the triple grammar) are
    NOT silently lost: with strict=True any such line fails the job
    with the offending text in the error; with the default
    strict=False they are dropped but COUNTED — the count rides the
    plan as an `observe` metric named "silk.ntriples.<n>" (suffix
    unique per call: Spark requires metric names unique per query)
    with fields malformed_lines / parsed_lines, readable from any
    QueryExecutionListener, so escaping/grammar gaps surface as a
    metric instead of silent data loss. Entirely built-in regexp
    expressions — one codegen projection over the text scan."""
    raw = spark.read.text(path)
    line = F.col("value")
    content = ~line.rlike(r"^\s*(#.*)?$")  # non-blank, non-comment
    matched = (
        (F.regexp_extract(line, _NT_LINE, 1) != "")
        & (F.regexp_extract(line, _NT_LINE, 2) != "")
        & (F.regexp_extract(line, _NT_LINE, 3) != "")
    )
    if strict:
        raw = raw.withColumn(
            "value",
            F.when(
                content & ~matched,
                F.raise_error(F.concat(F.lit("malformed N-Triples line: "), line)),
            ).otherwise(line),
        )
    else:
        global _OBS_SEQ
        _OBS_SEQ += 1
        raw = raw.observe(
            f"silk.ntriples.{_OBS_SEQ}",
            F.sum((content & ~matched).cast("long")).alias("malformed_lines"),
            F.sum(matched.cast("long")).alias("parsed_lines"),
        )
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
    max_predicates: int = 1000,
) -> DataFrame:
    """Pivot triples to one row per subject with an array<string>
    column per predicate (multi-valued, Silk Seq[String] cells),
    named by the predicate's local name. `predicates` bounds the
    schema explicitly (recommended — Silk's EntitySchema always
    enumerates its typed paths); when omitted, the distinct predicate
    set is collected (one small aggregate; real RDF vocabularies are
    tiny relative to the data) — but CAPPED at `max_predicates`: an
    adversarial graph with millions of distinct predicates would
    otherwise OOM the driver and explode the schema, so exceeding the
    cap raises a clear error pointing at an explicit `predicates`
    list or `entity_map_table` (schema-free). `type_uri` restricts
    subjects first, so the pivot shuffle carries only the restricted
    entities' triples — a broadcast semi-join when the restricted set
    is small (AQE)."""
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
        # limit(cap+1) bounds what can ever reach the driver — the
        # failure mode for a huge vocabulary is this error, not an OOM
        rows = (
            t.filter(F.col("predicate") != RDF_TYPE)
            .select("predicate")
            .distinct()
            .limit(max_predicates + 1)
            .collect()
        )
        if len(rows) > max_predicates:
            raise ValueError(
                f"entity_table: > {max_predicates} distinct predicates — one "
                "column per predicate would explode the schema. Pass an "
                "explicit `predicates` list, raise `max_predicates`, or use "
                "entity_map_table() (map<string,array<string>>, schema-free)."
            )
        predicates = sorted(r["predicate"] for r in rows)
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


def entity_map_table(
    triples: DataFrame,
    type_uri: str | None = None,
    uri_col: str = "_uri",
) -> DataFrame:
    """Schema-free sibling of entity_table for unbounded vocabularies:
    one row per subject with a `props: map<string, array<string>>`
    column keyed by FULL predicate URI. No driver-side vocabulary
    collection, no per-predicate columns — the safe shape when the
    distinct-predicate set is unknown or adversarial. Same single
    shuffle: groupBy(subject, predicate) partial-aggregates map-side,
    then one groupBy(subject) assembles the map."""
    t = triples
    if type_uri is not None:
        matching = t.filter(
            (F.col("predicate") == RDF_TYPE) & (F.col("object") == type_uri)
        ).select("subject")
        t = t.join(F.broadcast(matching), "subject", "left_semi")
    per_pred = (
        t.filter(F.col("predicate") != RDF_TYPE)
        .groupBy("subject", "predicate")
        .agg(F.array_sort(F.collect_list("object")).alias("_vals"))
    )
    return (
        per_pred.groupBy(F.col("subject").alias(uri_col))
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("predicate", "_vals")))
            ).alias("props")
        )
    )


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
