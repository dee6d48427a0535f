"""Text analysis operators: language-ID, quality scoring, token counts,
document fingerprints.

Everything is built-in Spark SQL expressions (codegen, pushdown-friendly,
no Python).  Each operator has an exact DuckDB-SQL twin in the driver
contract, so the semantics are pinned cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import rnd

ROUND = 5

# tiny per-language marker lexicons for the n-gram/stopword heuristic —
# frozen, shared verbatim with the oracle SQL
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "est", "et"),
    "es": ("el", "los", "es", "una", "y"),
}

FP_MOD = (1 << 31) - 1  # Mersenne prime 2^31−1 for the rolling hash


def _toks(col="text"):
    return F.filter(F.split(F.lower(F.trim(F.col(col))), r"\s+"), lambda x: x != F.lit(""))


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len)."""
    t = _toks()
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.length(F.col("text")).alias("n_chars"),
        rnd(
            F.when(
                F.size(t) > 0,
                F.aggregate(
                    F.transform(t, lambda x: F.length(x).cast("double")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / F.size(t),
            ).otherwise(F.lit(0.0)),
            ROUND,
        ).alias("avg_token_len"),
    )


def quality_scores(docs: DataFrame, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> DataFrame:
    """Heuristic quality features per doc (length/punct/stopword ratios).

    quality = clamp01(0.4·len_score + 0.3·stop_ratio·3 + 0.3·(1−punct_ratio))
    with len_score = min(n_tokens/100, 1).  Deterministic, cross-engine.
    """
    t = _toks()
    n_tok = F.size(t)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*stopwords)))
    n_punct = F.length(F.regexp_replace("text", r"[^\.,;:!\?]", ""))
    len_score = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.length("text") > 0, n_punct.cast("double") / F.length("text")
    ).otherwise(F.lit(0.0))
    quality = F.least(
        F.greatest(
            F.lit(0.4) * len_score
            + F.lit(0.3) * F.least(stop_ratio * 3.0, F.lit(1.0))
            + F.lit(0.3) * (F.lit(1.0) - punct_ratio),
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        rnd(stop_ratio, ROUND).alias("stop_ratio"),
        rnd(punct_ratio, ROUND).alias("punct_ratio"),
        rnd(quality, ROUND).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language heuristic: argmax of per-language hit counts.

    Ties and zero-hit docs → 'und'.  Deterministic argmax order: higher
    count wins, then language code ascending.
    """
    t = _toks()
    counts = {
        lang: F.size(F.filter(t, lambda x: x.isin(*words)))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when((counts[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return docs.select("doc_id", pred.alias("pred_lang"))


def fingerprints(docs: DataFrame) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint.

    fp = fold over tokens: (acc·31 + len(tok)·17 + ascii(tok[0])) mod 2^31−1.
    Detects reordered near-duplicates that bag-of-words hashing misses.
    """
    t = _toks()
    fp = F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, x: (
            acc * F.lit(31) + F.length(x).cast("long") * F.lit(17) + F.ascii(x).cast("long")
        )
        % F.lit(FP_MOD),
    )
    return docs.select("doc_id", fp.alias("fingerprint"))
