"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

Every function is pure built-in ``pyspark.sql.functions`` column algebra —
JVM-side, whole-stage-codegen'd, and bit-for-bit reproducible in a DuckDB
oracle (the formulas below are deliberately engine-portable: regexp token
splits, md5 fingerprints, stopword-hit counts).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker words per language (deterministic n-gram-free heuristic; a real
# deployment swaps in a fastText-style model via pandas UDF — same stage shape)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with", "this"],
    "de": ["der", "die", "und", "ist", "mit", "das"],
    "fr": ["le", "la", "et", "est", "avec", "les"],
    "es": ["el", "la", "y", "es", "con", "los"],
}

STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "were", "it", "this", "that", "with", "for", "on", "at", "by",
]


def tokens(col) -> Column:
    """Whitespace+punct tokenization as a column expr (portable)."""
    t = F.split(F.lower(F.regexp_replace(col, r"[^\w\s]", " ")), r"\s+")
    return F.filter(t, lambda x: x != "")


def token_count(col) -> Column:
    return F.size(tokens(col))


def _hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_scores(col) -> list[Column]:
    toks = tokens(col)
    return [
        (_hits(toks, ws) / F.greatest(F.size(toks), F.lit(1))).alias(f"score_{lang}")
        for lang, ws in LANG_MARKERS.items()
    ]


# explicit tie-break priority, highest wins ties; mirrors the DuckDB oracle's
# CASE order (es > fr > en > de) exactly — ADVICE.md round 1 ('la' is in both
# the fr and es marker lists, so score ties are reachable)
_LANG_PRIORITY = {"es": 3, "fr": 2, "en": 1, "de": 0}


def lang_id(col) -> Column:
    """argmax language with an explicit deterministic tie-break priority."""
    toks = tokens(col)
    pairs = [
        F.struct(
            (_hits(toks, ws) / F.greatest(F.size(toks), F.lit(1))).alias("s"),
            F.lit(_LANG_PRIORITY[lang]).alias("p"),
            F.lit(lang).alias("l"),
        )
        for lang, ws in LANG_MARKERS.items()
    ]
    best = F.array_max(F.array(*pairs))
    return F.when(best.getField("s") > 0, best.getField("l")).otherwise(F.lit("und"))


def quality_score(col) -> Column:
    """[0,1] quality: length band + punct ratio + stopword ratio + mean word
    length band (the classic C4/Gopher-style heuristic mix, made portable)."""
    toks = tokens(col)
    n = F.size(toks)
    n_chars = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[\w\s]", ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = _hits(toks, STOPWORDS_EN) / F.greatest(n, F.lit(1))
    mean_wlen = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / F.greatest(n, F.lit(1))
    len_ok = F.when((n >= 10) & (n <= 10000), 1.0).otherwise(0.3)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.5)
    wlen_ok = F.when((mean_wlen >= 2.5) & (mean_wlen <= 10.0), 1.0).otherwise(0.5)
    stop_part = F.least(stop_ratio * 4.0, F.lit(1.0))
    return F.round((len_ok + punct_ok + wlen_ok + stop_part) / 4.0, 6)


def fingerprint(col) -> Column:
    """Whole-doc content fingerprint (md5 of normalized text)."""
    return F.md5(F.concat_ws(" ", tokens(col)))


def rolling_fingerprints(col, window: int = 16) -> Column:
    """Winnowing-style window fingerprints: md5 of each ``window``-token
    slice at stride window/2 — the dedup-fragment / attribution primitive."""
    toks = tokens(col)
    n = F.size(toks)
    stride = max(window // 2, 1)
    idx = F.sequence(F.lit(0), F.greatest((n - window) / stride, F.lit(0)).cast("int"))
    return F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i * stride + 1, window)))
    )
