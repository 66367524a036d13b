"""Text analysis operators for training-data pipelines.

Language ID (stopword-profile heuristic), quality scoring, token
counting, and rolling-hash document fingerprinting — all pure Column
expressions (whole-stage codegen; no Python in the hot path), over a
``documents``-shaped table. These generalize the reference's
transformer/linguistic plugins (/root/reference/silk-rules/.../plugins/
transformer/linguistic/, filter/) to corpus-level curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# minimal high-frequency stopword profiles (public knowledge)
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"],
    "zh": ["的", "了", "在", "是", "我", "有", "和", "就", "不", "人"],
}


def _tokens(c: Column) -> Column:
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != "")


def lang_id_score(c: Column, lang: str) -> Column:
    """Fraction of tokens that are stopwords of `lang`."""
    toks = _tokens(c)
    profile = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(profile, t)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def lang_id(c: Column, default: str = "und") -> Column:
    """argmax over language profiles; deterministic tie-break by
    language code order; 'und' when no profile word hits."""
    langs = sorted(LANG_PROFILES)
    # struct(score, negrank) max ≡ argmax with lexicographic tiebreak
    best = F.greatest(
        *[
            F.struct(
                lang_id_score(c, l).alias("s"),
                F.lit(-i).alias("r"),
                F.lit(l).alias("lang"),
            )
            for i, l in enumerate(langs)
        ]
    )
    return F.when(best.getField("s") > 0, best.getField("lang")).otherwise(F.lit(default))


def token_count(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(_tokens(c))


def bpe_ish_token_count(c: Column) -> Column:
    """Sub-word-ish count: words + digit runs + punctuation marks each
    count once, long words count ceil(len/6) (BPE-piece proxy; a regex
    stand-in for a real tokenizer, deliberately deterministic)."""
    words = _tokens(c)
    word_pieces = F.aggregate(
        words,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.ceil(F.length(w) / 6.0).cast("bigint"),
    )
    # positive-class count (== length after stripping everything else):
    # a NEGATED class compiles to per-char predicate lambdas on JDK 17,
    # measured ~60x slower — see dedup_suite.normalize_text
    punct = F.size(F.regexp_extract_all(c, F.lit(r"[.,;:!?()\[\]{}\"']"), 0))
    return word_pieces + punct.cast("bigint")


def quality_score(c: Column) -> Column:
    """Heuristic document quality in [0,1]: blend of length band,
    mean-word-length band, alpha ratio and stopword presence —
    the usual pre-training corpus filters, one codegen'd expression."""
    n_chars = F.length(c)
    toks = _tokens(c)
    n_toks = F.size(toks)
    mean_w = F.when(n_toks > 0, n_chars.cast("double") / n_toks).otherwise(F.lit(0.0))
    # letter count as the sum of \p{L}+ run lengths — value-identical
    # to length(strip non-letters) without the negated-class regex
    # cliff (see dedup_suite.normalize_text); the fold's lambda only
    # touches the extracted runs, never re-running the regex
    n_alpha = F.aggregate(
        F.regexp_extract_all(c, F.lit(r"\p{L}+"), 0),
        F.lit(0).cast("bigint"),
        lambda acc, run: acc + F.length(run).cast("bigint"),
    )
    alpha_ratio = F.when(
        n_chars > 0, n_alpha.cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    len_ok = F.when((n_toks >= 10) & (n_toks <= 10000), 1.0).otherwise(0.3)
    word_ok = F.when((mean_w >= 2.5) & (mean_w <= 12.0), 1.0).otherwise(0.4)
    stop_hit = F.greatest(
        *[lang_id_score(c, l) for l in sorted(LANG_PROFILES)]
    )
    stop_ok = F.when(stop_hit >= 0.05, 1.0).otherwise(0.5)
    return F.round(
        0.3 * len_ok + 0.25 * word_ok + 0.25 * alpha_ratio + 0.2 * stop_ok, 6
    )


# PII redaction patterns — ordered (a credit card must not be eaten
# by the looser phone pattern), positive character classes only (the
# JDK-17 negated-class predicate cliff measured in BASELINE.md), and
# restricted to constructs Java regex and RE2 agree on (no
# lookaround, no prefix-ambiguous alternation) so the DuckDB oracle
# twin redacts byte-identically.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "<CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[ -]\d{3}[ -]\d{3,4}", "<PHONE>"),
]


def redact_pii(c: Column) -> Column:
    """Mask emails / credit cards / SSNs / IPv4s / international
    phone numbers with typed placeholders — the standard pre-training
    PII scrub as one chain of codegen ``regexp_replace`` calls (zero
    shuffle, no Python). Pattern order is load-bearing: see
    PII_PATTERNS."""
    out = c
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(c: Column) -> Column:
    """struct<email,card,ssn,ip,phone int> of match counts on the
    UNredacted text (counts must precede masking — a redacted email
    no longer matches). Audit/reporting companion to redact_pii."""
    return F.struct(
        *[
            F.size(F.regexp_extract_all(c, F.lit(pat), 0)).alias(name)
            for name, pat, _ in PII_PATTERNS
        ]
    )


def doc_fingerprint(c: Column, shingle_n: int = 5) -> Column:
    """Order-independent document fingerprint: md5 of the min-hashed
    shingle (the 'winnowing' survivor) + md5 of full normalized text,
    concatenated. Portable across engines (md5 everywhere)."""
    norm = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.md5(norm)


def rolling_shingle_fingerprints(c: Column, shingle_n: int = 5, keep: int = 4) -> Column:
    """Winnowing-style selection: md5 each word shingle, keep the
    `keep` smallest digests as the document sketch (array<string>).
    Two documents sharing any sketch element are near-dup candidates."""
    toks = _tokens(c)
    k = F.size(toks) - (shingle_n - 1)
    # zip_with fold over shifted slices, not transform(sequence, i ->
    # slice(toks, i, n)): a HOF lambda body re-evaluates per element,
    # so referencing the tokenization inside it would redo the
    # regex+split once per shingle (see dedup_suite.word_shingles)
    grams = F.slice(toks, 1, F.greatest(k, F.lit(1)))
    for j in range(1, shingle_n):
        grams = F.zip_with(
            grams,
            F.slice(toks, 1 + j, F.greatest(k, F.lit(1))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    hashed = F.when(F.size(toks) >= 1, F.transform(grams, lambda g: F.md5(g))).otherwise(
        F.array(F.md5(F.lit("")))  # empty doc: one empty-string shingle, as before
    )
    return F.slice(F.array_sort(F.array_distinct(hashed)), 1, keep)


def profile_documents(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document profile: language, token counts, quality,
    fingerprint — a single projection, no shuffle."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        lang_id(c).alias("lang_pred"),
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_pieces"),
        quality_score(c).alias("quality"),
        doc_fingerprint(c).alias("fingerprint"),
    )


def _dup_frac(arr: Column) -> Column:
    """1 - distinct/total over an array; 0 for empty arrays."""
    return F.when(
        F.size(arr) > 0,
        F.round(
            1.0 - F.size(F.array_distinct(arr)).cast("double") / F.size(arr), 6
        ),
    ).otherwise(F.lit(0.0))


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style in-document repetition filters (Rae et al. 2021,
    "Scaling Language Models", App. A1.1: documents dominated by
    repeated words/n-grams are boilerplate or degenerate generations
    and get filtered before training): per document, the fraction of
    duplicate words, duplicate 2-grams and duplicate 3-grams
    (1 - distinct/total; 0 when the doc is shorter than the window).
    A single projection — the n-gram arrays come from the same
    zip_with window fold the dedup suite uses — so the operator is
    zero-shuffle at any corpus size."""
    from silk_spark.operators.dedup_suite import _window_fold

    # tokens materialized in their own codegen'd projection: the window
    # folds below are interpreted HOFs, and an inline token expression
    # would re-run the split once per fold reference (see
    # dedup_suite.shingles_from_tokens for the measured mechanics)
    toksed = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    return toksed.select(
        F.col(id_col),
        _dup_frac(toks).alias("dup_word_frac"),
        _dup_frac(_window_fold(toks, 2)).alias("dup_2gram_frac"),
        _dup_frac(_window_fold(toks, 3)).alias("dup_3gram_frac"),
    )
