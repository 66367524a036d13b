"""File-format sources: the CSV / JSON / XML-ish / text scan surface.

Reference: CsvSource (/root/reference/silk-plugins/silk-plugins-csv/
.../csv/CsvSource.scala:24-418 — separator detection, header
handling, array-value splitting, per-row URI generation),
TextFileDataset (.../text/TextFileDataset.scala), JsonDataset
(silk-plugins-json/.../JsonDataset.scala) and BulkDataSource
(silk-core/.../dataset/bulk/BulkDataSource.scala).

Spark-first: `spark.read.*` does scanning/schema inference; this layer
adds only Silk's semantic extras — stable row URIs, multi-value cell
splitting, sampling/peek, and glob-union bulk reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_row_uri(df: DataFrame, prefix: str = "urn:row:", id_col: str = "_uri") -> DataFrame:
    """Stable per-row URI (CsvSource's row-number URIs). Content-hashed
    rather than positional: positional ids are partitioning-dependent,
    content hashes survive any re-read order."""
    h = F.md5(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
    return df.withColumn(id_col, F.concat(F.lit(prefix), h))


def csv_source(
    spark: SparkSession,
    path: str,
    header: bool = True,
    sep: str = ",",
    array_separator: str | None = None,
    infer_schema: bool = True,
    uri_prefix: str | None = None,
) -> DataFrame:
    """CSV scan; `array_separator` splits every string cell into
    array<string> (Silk's multi-valued cells, Entity.scala:38)."""
    df = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("inferSchema", infer_schema)
        .csv(path)
    )
    if array_separator is not None:
        for f in df.schema.fields:
            if f.dataType.simpleString() == "string":
                df = df.withColumn(f.name, F.split(F.col(f.name), array_separator))
    if uri_prefix is not None:
        df = with_row_uri(df, uri_prefix)
    return df


def _navigate_base_path(df: DataFrame, base_path: str) -> DataFrame:
    """Silk-style base-path navigation (JsonTraverser / XML base path):
    each path step selects into nested records, exploding arrays and
    flattening structs along the way."""
    for step in base_path.strip("/").split("/"):
        if df.schema[step].dataType.typeName() == "array":
            df = df.select(F.explode(step).alias(step))
        if df.schema[step].dataType.typeName() == "struct":
            df = df.select(f"{step}.*")
        else:
            df = df.select(step)
    return df


def json_source(
    spark: SparkSession,
    path: str,
    base_path: str | None = None,
    multiline: bool = True,
) -> DataFrame:
    """JSON scan with Silk-style base-path navigation (JsonTraverser):
    `base_path` like "a/b" selects-and-explodes into nested records."""
    df = spark.read.option("multiLine", multiline).json(path)
    if base_path:
        df = _navigate_base_path(df, base_path)
    return df


def xml_source(
    spark: SparkSession,
    path: str,
    row_tag: str,
    base_path: str | None = None,
    **options,
) -> DataFrame:
    """XML scan (reference XmlDataset/XmlSourceStreaming,
    silk-plugins/silk-plugins-xml/.../XmlDataset.scala) on Spark 4's
    native XML reader: `row_tag` is the element treated as one row
    (the streaming source's entity element), `base_path` navigates
    below it like the JSON source. Attributes surface as `_attr`
    columns per Spark's XML convention."""
    reader = spark.read.option("rowTag", row_tag)
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.xml(path)
    if base_path:
        df = _navigate_base_path(df, base_path)
    return df


def parse_xml_column(c, schema: str, **options):
    """from_xml on an XML-string column (the in-memory XmlDataset
    face): parse into a typed struct with an explicit DDL schema."""
    return F.from_xml(c, schema, options or None)


def text_source(spark: SparkSession, path: str, whole_file: bool = True) -> DataFrame:
    """Whole-file-as-entity (TextFileDataset) or line-per-row."""
    return spark.read.option("wholetext", whole_file).text(path).withColumnRenamed("value", "text")


def bulk_source(spark: SparkSession, fmt: str, *paths: str, **options) -> DataFrame:
    """Glob/multi-path union read (BulkDataSource's zip-of-files,
    reborn as Spark's native multi-path scan — partition-parallel,
    no driver-side iteration)."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return getattr(reader, fmt)(list(paths))


def empty_source(spark: SparkSession, schema_ddl: str) -> DataFrame:
    """EmptyDataset/EmptySource (silk-core/.../dataset/EmptyDataset.scala):
    a typed zero-row frame — workflow placeholder input."""
    return spark.createDataFrame([], schema_ddl)


def variable_source(spark: SparkSession, rows: list, schema_ddl: str) -> DataFrame:
    """VariableDataset (silk-core/.../dataset/VariableDataset.scala):
    parameterized in-memory input bound at workflow execution time."""
    if not rows:
        return empty_source(spark, schema_ddl)
    return spark.createDataFrame(rows, schema_ddl)


def write_sink(df: DataFrame, fmt: str, path: str, mode: str = "overwrite", **options) -> None:
    """Format sinks (CsvSink/JsonSink/XmlSink, TextSink — reference
    silk-plugins/.../CsvSink.scala etc.): thin wrapper over Spark's
    writers so every sink id has one call surface. XML uses Spark 4's
    native writer (rootTag/rowTag options)."""
    writer = df.write.mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    if fmt == "csv" and "header" not in options:
        writer = writer.option("header", True)
    getattr(writer, fmt)(path)


def write_links(
    links: DataFrame,
    path: str,
    fmt: str = "csv",
    link_type: str = "owl:sameAs",
    inverse: bool = False,
    **options,
) -> None:
    """LinkSink / FilteredLinkSink (silk-core/.../dataset/LinkSink.scala,
    TableLinkSink.scala): write (source, target[, confidence]) pairs
    with the link-type property attached; `inverse` swaps the pair
    orientation (the inverse-property writer)."""
    cols = list(links.columns)
    src, tgt = cols[0], cols[1]
    if inverse:
        src, tgt = tgt, src
    out = links.select(
        F.col(src).alias("source"),
        F.lit(link_type).alias("link_type"),
        F.col(tgt).alias("target"),
        *[F.col(c) for c in cols[2:]],
    )
    write_sink(out, fmt, path, **options)


def sample_source(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """SamplingDataSource: bounded random sample (without replacement),
    deterministic under the seed."""
    frac = min(1.0, n / max(df.count(), 1) * 1.3)
    return df.sample(fraction=frac, seed=seed).limit(n)


def peek_source(df: DataFrame, n: int = 20) -> DataFrame:
    """PeakDataSource: cheap preview — limit pushes into the scan."""
    return df.limit(n)


def profile_source(df: DataFrame) -> DataFrame:
    """SchemaExtractionSource / SampleValueAnalyzer: per-column type,
    null coverage and distinct estimate in ONE aggregate pass."""
    aggs = []
    for f in df.schema.fields:
        c = f.name
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nonnull"),
            F.approx_count_distinct(F.col(c)).alias(f"{c}__distinct"),
        ]
    total = df.count()
    row = df.agg(*aggs).first()
    out = [
        (f.name, f.dataType.simpleString(), total,
         int(row[f"{f.name}__nonnull"]), int(row[f"{f.name}__distinct"]))
        for f in df.schema.fields
    ]
    return df.sparkSession.createDataFrame(
        out, "column string, dtype string, rows bigint, nonnull bigint, approx_distinct bigint"
    )
