"""Text-analysis expression library (north_star tier).

All JVM-side `pyspark.sql.functions` compositions — tokenization,
shingling, quality signals, language-ID scoring, fingerprints. Each
has an exact DuckDB-SQL twin in plans/llm_queries.py; keep the two in
sync (same regexes, same stopword lists, same arithmetic order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish pre-tokenizer: letter runs | digit runs | single symbol.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Function-word lists for the language-ID heuristic. Deliberately
#: tiny — language ID at 100 TB must be a cheap per-row expression;
#: swap in real profiles without changing the plan shape.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("a", "the", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "los", "una"),
    "de": ("der", "die", "und", "das", "ein", "nicht"),
    "fr": ("le", "la", "et", "les", "des", "une", "est"),
    "zh": ("de5", "shi4", "le5", "bu4", "wo3", "you3"),
}

#: order used for the deterministic arg-max tie-break
LANG_ORDER: tuple[str, ...] = ("en", "es", "de", "fr", "zh")


#: PII patterns — RE2-compatible (no lookaround) so the Java-regex
#: Spark side and the RE2 DuckDB oracle match byte-for-byte.
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_PATTERN = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def redact_pii(text: Column) -> Column:
    """Replace email addresses and phone numbers with typed
    placeholders — the FineWeb/Dolma PII-removal step. Pure
    regexp_replace, so it rides whole-stage codegen; extending the
    pattern set is adding lines here and in the DuckDB twin."""
    out = F.regexp_replace(text, PII_EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(out, PII_PHONE_PATTERN, "<PHONE>")


def words(text: Column) -> Column:
    """Whitespace tokens (the documents table is space-separated)."""
    return F.split(text, " ")


def array_shingles(w: Column, n: int = 3) -> Column:
    """n-word shingles from an already-tokenized array column. Pass a
    MATERIALIZED array attribute (a prior ``select`` alias) when the
    result feeds an explode — the expression references ``w`` n+1
    times, and inlining a split() there re-tokenizes per reference
    (the projection-collapse gotcha; see chunk_documents)."""
    m = F.greatest(F.size(w) - (n - 1), F.lit(0))
    zipped = F.slice(w, 1, m)
    for k in range(1, n):
        zipped = F.zip_with(
            zipped, F.slice(w, k + 1, m), lambda x, y: F.concat_ws(" ", x, y)
        )
    return zipped


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles as strings (same values as the DuckDB twin's
    1-based range/concat_ws construction).

    Built by zipping n shifted slices of the words array rather than
    element_at inside a transform lambda: Spark skips common-subexpr
    elimination inside higher-order-function bodies, so the lambda form
    re-evaluates split() per element (O(words²) per row — measured 4 s
    for 5 000 rows); the slice form evaluates it O(n) times."""
    return array_shingles(words(text), n)


def bpe_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [A-Za-z0-9 ]."""
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9 ]", ""))
    return punct / F.length(text)


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of (non-distinct) tokens that are function words."""
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(words(text), lambda w: F.array_contains(stop, w)))


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]:
    0.5·length-saturation + 0.3·(1 − punct ratio) + 0.2·stopword
    saturation. Pure double arithmetic — deterministic across engines."""
    n_words = F.size(words(text)).cast("double")
    length_part = F.least(n_words / F.lit(50.0), F.lit(1.0))
    punct_part = F.lit(1.0) - punct_ratio(text)
    stop_ratio = stopword_hits(text, "en").cast("double") / n_words
    stop_part = F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
    return (
        length_part * F.lit(0.5) + punct_part * F.lit(0.3) + stop_part * F.lit(0.2)
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Distinct-token hit count against each language's list."""
    distinct_words = F.array_distinct(words(text))
    return {
        lang: F.size(
            F.array_intersect(
                distinct_words, F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
            )
        )
        for lang in LANG_ORDER
    }


def lang_predict(text: Column) -> Column:
    """Arg-max over lang_scores with LANG_ORDER tie-break; 'und'
    (undetermined) when every score is zero."""
    scores = lang_scores(text)
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best <= 0, F.lit("und")).otherwise(expr)


def content_fingerprint(text: Column) -> Column:
    """Content-defined fingerprint: md5 of case-folded,
    whitespace-collapsed text. Engine-portable (md5 is md5)."""
    normalized = F.lower(F.regexp_replace(text, r"\s+", " "))
    return F.md5(normalized)
