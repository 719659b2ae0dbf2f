"""Text-analysis column functions (SURVEY.md §2.7 N3) — all pure Catalyst
expressions (JVM-side, codegen'd); no Python in the hot path.

The documents testdata is single-space-joined word text, so tokenization is
`split(text, ' ')`, which matches DuckDB's `string_split(text, ' ')` exactly
(the oracle contract). A regex tokenizer is provided for messier input.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker-word sets for the n-gram/stopword language-ID
# heuristic. Deterministic and cheap: one array_intersect per language.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "fr": ["le", "la", "et", "de", "est"],
    "es": ["el", "la", "y", "de", "es"],
    "de": ["der", "die", "und", "von", "ist"],
}

STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (single-space semantics, oracle-aligned)."""
    return F.split(_c(col), " ")


def tokens_regex(col: Column | str) -> Column:
    """BPE-ish robust tokenizer: word pieces, numbers, or single punctuation
    marks — for raw text that isn't single-space-clean."""
    return F.expr(
        f"regexp_extract_all({_sql_name(col)}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)"
    )


def _sql_name(col: Column | str) -> str:
    if isinstance(col, str):
        return col
    raise TypeError("tokens_regex needs a column name string")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def stopword_ratio(col: Column | str) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return hits / F.size(toks)


def avg_token_length(col: Column | str) -> Column:
    toks = tokens(col)
    # total chars minus the single-space separators, over token count
    return (F.length(_c(col)) - (F.size(toks) - 1)) / F.size(toks)


def distinct_token_ratio(col: Column | str) -> Column:
    toks = tokens(col)
    return F.size(F.array_distinct(toks)) / F.size(toks)


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0, ~1]: rewards lexical diversity and
    sane token lengths, penalizes stopword stuffing. Deterministic algebra
    only — reproducible in ANSI SQL for the oracle."""
    return (
        F.lit(0.5) * distinct_token_ratio(col)
        + F.lit(0.3) * F.least(avg_token_length(col) / F.lit(8.0), F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - stopword_ratio(col))
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts (the n-gram-profile heuristic reduced
    to marker words — adequate and deterministic)."""
    toks = tokens(col)
    return {
        lang: F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column | str) -> Column:
    """argmax over lang_scores; ties broken toward the lexicographically
    greatest language code (documented contract, mirrored in the oracle
    SQL); 'und' if no marker hits at all."""
    scores = lang_scores(col)
    pairs = F.array(
        *[
            F.struct(score.alias("score"), F.lit(lang).alias("lang"))
            for lang, score in sorted(scores.items())
        ]
    )
    # struct ordering is field-by-field: score desc, then lang desc.
    best = F.sort_array(pairs, asc=False)[0]
    return F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"])


def bigrams(col: Column | str) -> Column:
    """ALL word bigrams in order (duplicates kept — unlike shingles, which
    dedupe): the repetition-signal denominator. Pure Catalyst."""
    toks = tokens(col)
    count = F.size(toks) - 1
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))


def top_element_count(arr: Column) -> Column:
    """Occurrence count of the most frequent element of an array. Pure HOF
    (O(distinct × n) per row, map-only — no explode/groupBy shuffle), so
    repetition scoring stays a single scan-bound pass at 100 TB."""
    return F.array_max(
        F.transform(
            F.array_distinct(arr),
            lambda w: F.size(F.filter(arr, lambda t: t == w)),
        )
    )


def fingerprint_md5(col: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase text
    (the exact-dedup key). md5 exists in DuckDB too → oracle-able."""
    normalized = F.regexp_replace(F.trim(F.lower(_c(col))), r"\s+", " ")
    return F.md5(normalized)


def winnow_fingerprints(col: Column | str, k: int = 3, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's MOSS
    scheme): hash every k-gram in order, slide a window of w hashes, keep
    each window's minimum, dedupe. Guarantees any shared token run of
    length >= w+k-1 between two documents yields a shared fingerprint —
    the rolling-hash fingerprint the pipeline north-star asks for.

    Pure Catalyst (transform/slice/array_min over md5 hex strings — string
    order is hash order, portable to the oracle): no Python in the path,
    so 100 TB of documents fingerprint at scan speed, map-side only."""
    toks = tokens(col)
    n_grams = F.size(toks) - (k - 1)
    empty = F.expr("CAST(array() AS ARRAY<STRING>)")
    hashes = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.md5(F.array_join(F.slice(toks, i, k), " ")),
        ),
    ).otherwise(empty)
    n_wins = F.size(hashes) - (w - 1)
    wins = (
        F.when(F.size(hashes) == 0, empty)
        .when(
            n_wins >= 1,
            F.transform(
                F.sequence(F.lit(1), n_wins),
                lambda i: F.array_min(F.slice(hashes, i, w)),
            ),
        )
        .otherwise(F.array(F.array_min(hashes)))  # doc shorter than window
    )
    return F.array_distinct(wins)
