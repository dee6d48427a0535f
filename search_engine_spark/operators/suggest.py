"""Suggested related queries — the reference's
``QueryService.generateSuggestedQueries`` (``QueryService.java:1498-1540``),
attached to every ``/api/search`` response.

Driver-side by design: the input is the ≤5 top result titles of one
query response — there is nothing to distribute.  Semantics ported
line-by-line:

* significant title terms: whitespace split, length > 3, not a (query)
  stopword (:1510-1516);
* for each term not already a substring of the query: suggest
  ``query + " " + term``, and for multi-word queries also
  ``term + " " + rest-of-query`` (first word replaced, :1527-1535);
* cap at 5 suggestions (:1538).

ONE documented divergence: the reference streams a ``HashSet`` whose
iteration order is JVM-nondeterministic, so *which* 5 suggestions
survive the cap varies run to run; here suggestions are sorted
lexicographically before the cap — deterministic and testable.
"""

from __future__ import annotations

from collections.abc import Iterable

MAX_TITLES = 5  # :1504
MAX_SUGGESTIONS = 5  # :1538
MIN_TERM_LEN = 3  # strictly greater — :1513


def suggested_queries(
    original_query: str,
    titles: Iterable[str | None],
    stopwords: frozenset[str] | None = None,
    limit: int = MAX_SUGGESTIONS,
) -> list[str]:
    """Related-query strings for a result page (sorted, ≤ ``limit``).

    ``stopwords`` defaults to the reference's query stopword list (the
    set ``QueryService.getStopWords`` loads at :1271-1283)."""
    if stopwords is None:
        from ..textproc import query_stopwords

        stopwords = query_stopwords()
    common: set[str] = set()
    for title in list(titles)[:MAX_TITLES]:
        if title is None:
            continue
        for word in title.lower().split():
            if len(word) > MIN_TERM_LEN and word not in stopwords:
                common.add(word)
    query = original_query.lower()
    suggestions: set[str] = set()
    for term in common:
        if term in query:  # :1525 — substring containment, as in Java
            continue
        suggestions.add(f"{query} {term}")
        if " " in query:
            import re

            parts = re.split(r"\s+", query, maxsplit=1)  # :1531 — split("\\s+", 2)
            if len(parts) > 1:
                suggestions.add(f"{term} {parts[1]}")
    return sorted(suggestions)[:limit]
