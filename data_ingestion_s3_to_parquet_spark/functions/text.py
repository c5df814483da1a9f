"""Text-analysis column expressions: tokens, shingles, quality, language.

Everything here is a Catalyst expression builder (JVM-side) except the
character-n-gram language scorer, which is a pandas UDF (Arrow-batched)
because per-language profile lookups don't decompose into built-ins.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Small fixed stopword list shared verbatim with oracle SQL (keep sorted).
STOPWORDS: tuple[str, ...] = ("a", "an", "and", "in", "is", "of", "the", "to")


def tokens(text: Column) -> Column:
    """Whitespace tokens. SQL mirror: ``string_split(text, ' ')``."""
    return F.split(text, " ")


def shingles_from_tokens(t: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a *token-array column*.

    Built as: for i in 1..len-(n-1): join(t[i:i+n], ' ') — via
    ``transform`` over a ``sequence`` of start indices (1-based, matching
    DuckDB list indexing so oracle SQL can mirror with a list
    comprehension: ``[t[i]||' '||t[i+1]||... for i in generate_series(...)]``).

    IMPORTANT: ``t`` must be a resolved column, not an inline
    ``split(...)`` expression — Catalyst does not CSE subexpressions
    through lambda bindings, so an inline split would re-tokenize the
    text for every ``element_at`` call (O(len²) per row; measured 9s vs
    <1s on 5k docs). Use :func:`with_shingles` for the two-step projection.
    """
    # sequence(1, 0) would count DOWN; short texts get an empty index set
    idx = F.when(
        F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, (i + k).cast("int")) for k in range(n)]
        ),
    )
    return F.array_distinct(gram)


def with_shingles(df, text_col: str = "text", out: str = "sh", n: int = 3):
    """Two-projection shingling: tokenize once into a column, then build
    n-grams from the bound token array (see shingles_from_tokens note)."""
    return df.withColumn("_toks", tokens(F.col(text_col))).withColumn(
        out, shingles_from_tokens(F.col("_toks"), n)
    ).drop("_toks")


def hashed_shingles_from_tokens(t: Column, n: int = 3) -> Column:
    """Distinct 64-bit shingle hashes straight from the token array.

    When downstream only ever compares shingles for equality (Jaccard
    joins, sketches), materializing the n-gram *strings* is pure
    overhead: ``xxhash64`` over the n-token tuple inside the transform
    lambda skips the per-shingle concat allocation and runs
    ``array_distinct`` over fixed-width longs instead of strings —
    measured 5.9s → 0.4s on the sf0.1 documents table. Tokens cannot
    contain the split delimiter, so the positional multi-arg hash is
    injective over token tuples exactly like the joined string (modulo
    64-bit collisions, odds ~n_shingles²/2⁶⁵ — negligible).
    """
    idx = F.when(
        F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = F.transform(
        idx,
        lambda i: F.xxhash64(
            *[F.element_at(t, (i + k).cast("int")) for k in range(n)]
        ),
    )
    return F.array_distinct(gram)


def with_hashed_shingles(df, text_col: str = "text", out: str = "sh", n: int = 3):
    """Like :func:`with_shingles` but emits ``array<bigint>`` hashes."""
    return df.withColumn("_toks", tokens(F.col(text_col))).withColumn(
        out, hashed_shingles_from_tokens(F.col("_toks"), n)
    ).drop("_toks")


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords (double)."""
    t = tokens(text)
    hits = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    return hits.cast("double") / F.size(t)


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are a-z (double)."""
    return F.length(F.regexp_replace(text, "[^a-z]", "")).cast("double") / F.length(text)


# ---------------------------------------------------------------------------
# Language identification
# ---------------------------------------------------------------------------

# Marker-word chain (SQL-expressible subset; oracle-checkable). Real
# corpora would never be this clean — see `ngram_lang_scores` below for
# the profile-based scorer used by the rows-only query.
LANG_MARKERS: tuple[tuple[str, str], ...] = (
    ("en", " the "),
    ("es", " el "),
    ("fr", " le "),
    ("de", " der "),
    ("zh", "的"),
)


def lang_by_markers(text: Column, fallback: str = "und") -> Column:
    """First-match marker-word language ID (CASE WHEN chain)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    expr: Column | None = None
    for lang, marker in LANG_MARKERS:
        cond = padded.contains(marker)
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise(fallback)


# Tiny deterministic char-trigram profiles (top trigrams of each
# language's common function words). Public-knowledge approach: Cavnar &
# Trenkle 1994 n-gram ranking, shrunk to a constant table.
_SEED_TEXT = {
    "en": "the and of to in is that it was for on are as with his they at be",
    "es": "el la de que y en los se del las por un para con una su al es",
    "fr": "le de la et les des en un du une que est pour qui dans par sur",
    "de": "der die und in den von zu das mit sich des auf ist im nicht ein",
}


def _profile(text: str, k: int = 40) -> tuple[str, ...]:
    grams: Counter[str] = Counter()
    s = f" {text} "
    for i in range(len(s) - 2):
        grams[s[i : i + 3]] += 1
    return tuple(g for g, _ in grams.most_common(k))


LANG_PROFILES: dict[str, tuple[str, ...]] = {
    lang: _profile(seed) for lang, seed in _SEED_TEXT.items()
}


def _score_batch(texts: Iterable[str]) -> list[str]:
    out = []
    profiles = {lang: set(p) for lang, p in LANG_PROFILES.items()}
    for text in texts:
        s = f" {(text or '')} "
        grams = {s[i : i + 3] for i in range(len(s) - 2)}
        # deterministic tie-break: score desc, then language code asc
        best = max(
            sorted(profiles),
            key=lambda lang: (len(grams & profiles[lang]), ),
        )
        score = len(grams & profiles[best])
        out.append(best if score >= 3 else "und")
    return out


@pandas_udf(StringType())
def lang_by_ngrams(texts: pd.Series) -> pd.Series:
    """Char-trigram-profile language ID (Arrow-batched pandas UDF)."""
    return pd.Series(_score_batch(texts.tolist()), index=texts.index)
