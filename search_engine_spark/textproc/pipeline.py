"""The shared analysis pipeline: tokenize → stopwords → Porter stem.

Single source of truth used by BOTH the pure-Python oracle
(:mod:`search_engine_spark.oracle`) and the Arrow-batched pandas UDFs
(:mod:`search_engine_spark.functions.udfs`) — SURVEY.md §7.3 requires one
implementation so token streams are byte-identical between oracle and
engine.

Two distinct stopword lists exist in the reference (easy to conflate):

* index side: 668 words, ``searchengine/src/main/resources/stopWords.txt``
  (applied in ``PreIndexer.removeStopWords``, PreIndexer.java:41-46)
* query side: 173 words, ``searchengine/StopWords.txt`` plus the hardcoded
  ``importantTerms`` allowlist {vs, war, israel, gaza, iran, us, uk, un, eu}
  (QueryService.java:403-405, 1270-1289)

Query analysis follows QueryService.processRegularWords
(QueryService.java:395-439): lowercase, split on whitespace, keep a term if
it is allowlisted OR (not a query-stopword AND != "and"), then Porter stem.
"""

from __future__ import annotations

from functools import lru_cache
from importlib import resources

from .porter import porter_stem
from .tokenizer import remove_stopwords, tokenize


def _load_stopwords(name: str) -> frozenset[str]:
    text = resources.files("search_engine_spark.textproc").joinpath("data", name).read_text()
    return frozenset(w for w in (line.strip() for line in text.splitlines()) if w)


@lru_cache(maxsize=None)
def index_stopwords() -> frozenset[str]:
    return _load_stopwords("stopwords_index.txt")


@lru_cache(maxsize=None)
def query_stopwords() -> frozenset[str]:
    return _load_stopwords("stopwords_query.txt")


# QueryService.java:403-405 — terms kept even though they are stopwords.
IMPORTANT_TERMS = frozenset({"vs", "war", "israel", "gaza", "iran", "us", "uk", "un", "eu"})


def analyze_text(text: str, _stem_cache: dict[str, str] | None = None) -> list[str]:
    """Index-side pipeline P2→P3→P4: tokenize, index-stopwords, Porter stem.

    ``_stem_cache`` lets batch callers (pandas UDFs) memoize stems across an
    Arrow batch without changing semantics.
    """
    toks = remove_stopwords(tokenize(text), index_stopwords())
    if _stem_cache is None:
        return [porter_stem(t) for t in toks]
    out = []
    for t in toks:
        s = _stem_cache.get(t)
        if s is None:
            s = porter_stem(t)
            _stem_cache[t] = s
        out.append(s)
    return out


def analyze_query(query: str) -> list[str]:
    """Query-side pipeline (QueryService.java:395-439).

    Lowercase, whitespace split, keep term if allowlisted OR (not in the
    query stopword list AND != "and"), Porter stem.  Duplicates and order
    are preserved (the reference iterates the kept list in order).
    """
    stop = query_stopwords()
    out: list[str] = []
    for raw in query.lower().split():
        if not raw:
            continue
        if raw in IMPORTANT_TERMS or (raw not in stop and raw != "and"):
            out.append(porter_stem(raw))
    return out
