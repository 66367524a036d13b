"""Transformer catalog as Column builders.

Re-expression of the reference's Transformer plugin catalog
(/root/reference/silk-rules/src/main/scala/org/silkframework/rule/
plugins/transformer/**; interface rule/input/Transformer.scala:1-41)
as ``Column -> Column`` functions. Silk transformers map
``Seq[Seq[String]] -> Seq[String]``; here scalar columns stay scalar
and multi-valued cells are ``array<string>`` with higher-order
functions — everything JVM-side except the Porter stemmer / metaphone
family, which are deliberately omitted (no library in-image; soundex
IS built in).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- normalize (plugins/transformer/normalize/*.scala) ---------------------


def lower_case(c: Column) -> Column:
    return F.lower(c)


def upper_case(c: Column) -> Column:
    return F.upper(c)


def capitalize(c: Column) -> Column:
    return F.initcap(c)


def trim(c: Column) -> Column:
    return F.trim(c)


def remove_blanks(c: Column) -> Column:
    return F.replace(c, F.lit(" "), F.lit(""))


def remove_special_chars(c: Column) -> Column:
    return F.regexp_replace(c, r"[^\w\s]", "")


def alpha_reduce(c: Column) -> Column:
    """AlphaReduceTransformer.scala:23 — keep letters only."""
    return F.regexp_replace(c, "[^a-zA-Z]", "")


def remove_parentheses(c: Column) -> Column:
    return F.regexp_replace(c, r"\([^)]*\)", "")


def remove_duplicates(c: Column) -> Column:
    """array<string> cell → distinct values."""
    return F.array_distinct(c)


def url_encode(c: Column) -> Column:
    return F.url_encode(c)


# --- linguistic ------------------------------------------------------------


def soundex(c: Column) -> Column:
    """SoundexTransformer.scala:8 — Spark builtin."""
    return F.soundex(c)


# --- tokenization ----------------------------------------------------------


def tokenize(c: Column, pattern: str = r"\s+") -> Column:
    """Tokenizer.scala:22 — regex split; empty tokens dropped."""
    return F.filter(F.split(c, pattern), lambda x: x != "")


def camel_case_tokenize(c: Column) -> Column:
    return F.filter(F.split(c, "(?<=[a-z])(?=[A-Z])"), lambda x: x != "")


# --- substring -------------------------------------------------------------


def strip_prefix(c: Column, prefix: str) -> Column:
    p = prefix.replace("\\", "\\\\")
    return F.regexp_replace(c, "^" + _re_escape(prefix), "")


def strip_postfix(c: Column, postfix: str) -> Column:
    return F.regexp_replace(c, _re_escape(postfix) + "$", "")


def substring(c: Column, start: int = 0, length: int | None = None) -> Column:
    if length is None:
        return F.substring(c, start + 1, 1 << 30)
    return F.substring(c, start + 1, length)


def until_character(c: Column, ch: str) -> Column:
    return F.substring_index(c, ch, 1)


def _re_escape(s: str) -> str:
    out = []
    for ch in s:
        out.append("\\" + ch if ch in r"\.^$|?*+()[]{}" else ch)
    return "".join(out)


# --- replace / extraction --------------------------------------------------


def replace(c: Column, search: str, replacement: str) -> Column:
    return F.replace(c, F.lit(search), F.lit(replacement))


def regex_replace(c: Column, regex: str, replacement: str) -> Column:
    return F.regexp_replace(c, regex, replacement)


def map_values(c: Column, mapping: dict[str, str], default: str | None = None) -> Column:
    """MapTransformer.scala:21 — dictionary lookup via a map literal
    (broadcast join territory only for huge dictionaries)."""
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    got = m.getItem(c)
    return F.coalesce(got, F.lit(default)) if default is not None else got


def regex_extract(c: Column, regex: str, group: int = 1) -> Column:
    return F.regexp_extract(c, regex, group)


# --- combine ---------------------------------------------------------------


def concat(*cols: Column, glue: str = "") -> Column:
    """ConcatTransformer.scala:21."""
    return F.concat_ws(glue, *cols)


def concat_multi_values(c: Column, glue: str = " ", sort: bool = False) -> Column:
    arr = F.sort_array(c) if sort else c
    return F.array_join(arr, glue)


def merge(a: Column, b: Column) -> Column:
    """MergeTransformer.scala:21 — concat two array cells."""
    return F.concat(a, b)


# --- conditional -----------------------------------------------------------


def if_exists(cond: Column, then: Column, els: Column) -> Column:
    return F.when(cond.isNotNull(), then).otherwise(els)


def if_contains(c: Column, search: str, then: Column, els: Column) -> Column:
    return F.when(c.contains(search), then).otherwise(els)


def if_matches_regex(c: Column, regex: str, then: Column, els: Column) -> Column:
    return F.when(c.rlike(regex), then).otherwise(els)


def contains_all_of(c: Column, values: list[str]) -> Column:
    """array cell contains all of `values`."""
    needle = F.array(*[F.lit(v) for v in values])
    return F.size(F.array_except(needle, c)) == 0


def contains_any_of(c: Column, values: list[str]) -> Column:
    return F.arrays_overlap(c, F.array(*[F.lit(v) for v in values]))


def negate_bool(c: Column) -> Column:
    return ~c


# --- value-level filters ---------------------------------------------------


def remove_empty_values(c: Column) -> Column:
    return F.filter(c, lambda x: x != "")


def remove_values(c: Column, blacklist: list[str]) -> Column:
    return F.array_except(c, F.array(*[F.lit(v) for v in blacklist]))


def filter_by_length(c: Column, min_len: int = 0, max_len: int = 1 << 30) -> Column:
    return F.filter(c, lambda x: (F.length(x) >= min_len) & (F.length(x) <= max_len))


def filter_by_regex(c: Column, regex: str, negate: bool = False) -> Column:
    if negate:
        return F.filter(c, lambda x: ~x.rlike(regex))
    return F.filter(c, lambda x: x.rlike(regex))


def remove_stopwords(c: Column, stopwords: list[str]) -> Column:
    """removeRemoteStopwords reborn with a local/broadcast word set."""
    return F.array_except(c, F.array(*[F.lit(w) for w in stopwords]))


# --- numeric ---------------------------------------------------------------


def num_operation(a: Column, b: Column, op: str = "+") -> Column:
    a, b = a.cast("double"), b.cast("double")
    return {"+": a + b, "-": a - b, "*": a * b, "/": a / b}[op]


def aggregate_numbers(c: Column, op: str = "sum") -> Column:
    """AggregateNumbersTransformer.scala:27 — within-cell aggregate of
    an array<numeric> via higher-order functions."""
    d = F.transform(c, lambda x: x.cast("double"))
    if op == "sum":
        return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)
    if op == "min":
        return F.array_min(d)
    if op == "max":
        return F.array_max(d)
    if op == "average":
        return F.when(
            F.size(d) > 0,
            F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x) / F.size(d),
        )
    raise ValueError(op)


def count_values(c: Column) -> Column:
    return F.size(c)


def format_number(c: Column, decimals: int = 2) -> Column:
    return F.format_number(c.cast("double"), decimals)


def num_reduce(c: Column) -> Column:
    """NumReduceTransformer — digits only."""
    return F.regexp_replace(c, "[^0-9]", "")


def log_transform(c: Column, base: float = 10.0) -> Column:
    return F.log(float(base), c.cast("double"))


# --- date ------------------------------------------------------------------


def parse_date(c: Column, fmt: str = "yyyy-MM-dd") -> Column:
    return F.to_date(c, fmt)


def date_to_timestamp(c: Column) -> Column:
    return F.unix_timestamp(c.cast("timestamp"))


def time_to_date(c: Column) -> Column:
    return F.from_unixtime(c.cast("long")).cast("date")


def compare_dates(a: Column, b: Column, op: str = "<") -> Column:
    a, b = a.cast("date"), b.cast("date")
    return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b, "=": a == b}[op]


def duration_in_days(a: Column, b: Column) -> Column:
    return F.datediff(b.cast("date"), a.cast("date"))


def duration_in_seconds(a: Column, b: Column) -> Column:
    return b.cast("timestamp").cast("long") - a.cast("timestamp").cast("long")


# --- conversion / selection / value ---------------------------------------


def convert_charset(c: Column, from_cs: str = "UTF-8", to_cs: str = "UTF-8") -> Column:
    return F.decode(F.encode(c, from_cs), to_cs)


def coalesce_values(*cols: Column) -> Column:
    return F.coalesce(*cols)


def get_value_by_index(c: Column, idx: int) -> Column:
    """GetValueByIndexTransformer.scala:11 — 0-based; null past end
    (try_element_at: ANSI-safe)."""
    return F.try_element_at(c, F.lit(idx + 1))


def constant_value(value: str) -> Column:
    return F.lit(value)


def default_value(c: Column, default: str) -> Column:
    return F.coalesce(c, F.lit(default))


def deterministic_uuid(c: Column) -> Column:
    """GenerateUUID reborn deterministic: name-based ids from content
    (replay-stable, unlike uuid())."""
    return F.md5(c.cast("string"))


# --- validation ------------------------------------------------------------


def validate_regex(c: Column, regex: str) -> Column:
    """Null out non-matching values (quarantine-split style; the
    reference throws — see ValidationTransformers, validation/*.scala)."""
    return F.when(c.rlike(regex), c)


def validate_numeric_range(c: Column, lo: float, hi: float) -> Column:
    v = c.cast("double")
    return F.when((v >= lo) & (v <= hi), c)


def validate_date_range(c: Column, min_date: str, max_date: str) -> Column:
    """Null out dates outside [min_date, max_date] (validation/
    ValidateDateRange.scala; quarantine-split instead of throwing)."""
    d = c.cast("date")
    return F.when((d >= F.lit(min_date).cast("date")) & (d <= F.lit(max_date).cast("date")), c)


def validate_date_after(a: Column, b: Column, allow_equal: bool = False) -> Column:
    """Keep `a` iff it is after `b` (validation/ValidateDateAfter.scala;
    allowEqual admits equality)."""
    da, db = a.cast("date"), b.cast("date")
    ok = (da >= db) if allow_equal else (da > db)
    return F.when(ok, a)


def validate_number_of_values(c: Column, min_n: int = 0, max_n: int = 1) -> Column:
    """Keep the array iff its size is within [min_n, max_n]
    (validation/ValidateNumberOValues.scala)."""
    n = F.size(c)
    return F.when((n >= min_n) & (n <= max_n), c)


def regex_select(output: Column, regexes: list[str], value: Column, one_only: bool = False) -> Column:
    """selection/RegexSelectTransformer.scala: one slot per regex; the
    slot holds `output` where its regex matches `value` (only the first
    match when one_only), '' elsewhere."""
    slots = []
    earlier_matched = F.lit(False)
    for rx in regexes:
        hit = value.rlike(rx)
        take = hit & ~earlier_matched if one_only else hit
        slots.append(F.when(take, output).otherwise(F.lit("")))
        earlier_matched = earlier_matched | hit
    return F.array(*slots)


def to_sequence_index(c: Column) -> Column:
    """sequence/ValuesToIndexesTransformer.scala: values → their
    0-based indexes (as strings)."""
    return F.transform(c, lambda x, i: i.cast("string"))


def number_to_duration(c: Column, unit: str = "day") -> Column:
    """date/NumberToDurationTransformer.scala: number → xsd:duration
    lexical form. ms/seconds/day normalize through milliseconds into
    P[nD][T[nH][nM][n(.nnn)S]]; month/year → P{n}M / P{n}Y."""
    if unit in ("month", "year"):
        letter = "M" if unit == "month" else "Y"
        return F.concat(F.lit("P"), c.cast("double").cast("int").cast("string"), F.lit(letter))
    factor = {"milliseconds": 1, "seconds": 1000, "day": 86400000}[unit]
    ms = (c.cast("double") * factor).cast("bigint")
    days = (ms / 86400000).cast("bigint")
    hours = ((ms % 86400000) / 3600000).cast("bigint")
    mins = ((ms % 3600000) / 60000).cast("bigint")
    secs = (ms % 60000).cast("double") / 1000.0
    day_part = F.when(days > 0, F.concat(days.cast("string"), F.lit("D"))).otherwise(F.lit(""))
    h_part = F.when(hours > 0, F.concat(hours.cast("string"), F.lit("H"))).otherwise(F.lit(""))
    m_part = F.when(mins > 0, F.concat(mins.cast("string"), F.lit("M"))).otherwise(F.lit(""))
    sec_str = F.when(
        secs % 1.0 == 0.0, secs.cast("bigint").cast("string")
    ).otherwise(F.format_number(secs, 3))
    s_part = F.when(secs > 0, F.concat(sec_str, F.lit("S"))).otherwise(F.lit(""))
    time_str = F.concat(h_part, m_part, s_part)
    body = F.concat(
        day_part, F.when(time_str != "", F.concat(F.lit("T"), time_str)).otherwise(F.lit(""))
    )
    return F.when(body == "", F.lit("PT0S")).otherwise(F.concat(F.lit("P"), body))


_UNIT_PREFIXES = [
    ("da", 10.0), ("p", 1e-12), ("n", 1e-9), ("μ", 1e-6), ("U", 1e-6), ("u", 1e-6),
    ("m", 1e-3), ("c", 1e-2), ("d", 1e-1), ("h", 100.0), ("k", 1000.0),
    ("K", 1000.0), ("M", 1e6), ("G", 1e9),
]


def extract_physical_quantity(
    c: Column, symbol: str, filter_regex: str = "", index: int = 0
) -> Column:
    """numeric/PhysicalQuantityExtractor.scala: pull
    '{Number}{UnitPrefix}{Symbol}' out of free text and convert to the
    base unit ('10km' with symbol='m' → 10000.0). `index` selects among
    multiple matches; `filter_regex` gates extraction."""
    prefixes = "|".join(p for p, _ in _UNIT_PREFIXES)
    rx = rf"(-?\d+(?:\.\d+)?)\s*({prefixes})?{re.escape(symbol)}\b"
    matches = F.regexp_extract_all(c, F.lit(rx), 0)
    m = F.try_element_at(matches, F.lit(index + 1))
    num = F.regexp_extract(m, r"(-?\d+(?:\.\d+)?)", 1).cast("double")
    pref = F.regexp_extract(m, rf"\d(?:\.\d+)?\s*({prefixes})?{re.escape(symbol)}", 1)
    factor = F.lit(1.0)
    for p, f_val in _UNIT_PREFIXES:
        factor = F.when(pref == p, F.lit(f_val)).otherwise(factor)
    out = F.when(m.isNotNull() & (m != ""), num * factor)
    if filter_regex:
        out = F.when(c.rlike(f"(?i){filter_regex}"), out)
    return out


TRANSFORMERS = {
    "lowerCase": lower_case,
    "upperCase": upper_case,
    "capitalize": capitalize,
    "trim": trim,
    "removeBlanks": remove_blanks,
    "removeSpecialChars": remove_special_chars,
    "alphaReduce": alpha_reduce,
    "removeParentheses": remove_parentheses,
    "removeDuplicates": remove_duplicates,
    "urlEncode": url_encode,
    "soundex": soundex,
    "tokenize": tokenize,
    "camelCaseTokenize": camel_case_tokenize,
    "stripPrefix": strip_prefix,
    "stripPostfix": strip_postfix,
    "substring": substring,
    "untilCharacter": until_character,
    "replace": replace,
    "regexReplace": regex_replace,
    "map": map_values,
    "regexExtract": regex_extract,
    "concat": concat,
    "concatMultiValues": concat_multi_values,
    "merge": merge,
    "ifExists": if_exists,
    "ifContains": if_contains,
    "ifMatchesRegex": if_matches_regex,
    "containsAllOf": contains_all_of,
    "containsAnyOf": contains_any_of,
    "negate": negate_bool,
    "removeEmptyValues": remove_empty_values,
    "removeValues": remove_values,
    "filterByLength": filter_by_length,
    "filterByRegex": filter_by_regex,
    "removeStopwords": remove_stopwords,
    "numOperation": num_operation,
    "aggregateNumbers": aggregate_numbers,
    "count": count_values,
    "formatNumber": format_number,
    "numReduce": num_reduce,
    "log": log_transform,
    "parseDate": parse_date,
    "dateToTimestamp": date_to_timestamp,
    "timeToDate": time_to_date,
    "compareDates": compare_dates,
    "durationInDays": duration_in_days,
    "durationInSeconds": duration_in_seconds,
    "convertCharset": convert_charset,
    "coalesce": coalesce_values,
    "getValueByIndex": get_value_by_index,
    "constant": constant_value,
    "defaultValue": default_value,
    "uuid": deterministic_uuid,
    "validateRegex": validate_regex,
    "validateNumericRange": validate_numeric_range,
    "validateDateRange": validate_date_range,
    "validateDateAfter": validate_date_after,
    "validateNumberOfValues": validate_number_of_values,
    "regexSelect": regex_select,
    "toSequenceIndex": to_sequence_index,
    "numberToDuration": number_to_duration,
    "extractPhysicalQuantity": extract_physical_quantity,
}

# linguistic family (pandas-UDF kernels live in phonetic.py)
from silk_spark.functions.phonetic import (  # noqa: E402
    metaphone,
    normalize_chars,
    nysiis,
    stem,
)

TRANSFORMERS.update(
    {
        "metaphone": metaphone,
        "NYSIIS": nysiis,
        "stem": stem,
        "normalizeChars": normalize_chars,
    }
)


from silk_spark.functions.spatial import SPATIAL_TRANSFORMERS  # noqa: E402

TRANSFORMERS.update(SPATIAL_TRANSFORMERS)


def transform(name: str, *cols, **params) -> Column:
    """Registry dispatch (PluginFactory analogue, reference
    silk-core/.../runtime/plugin/)."""
    return TRANSFORMERS[name](*cols, **params)
