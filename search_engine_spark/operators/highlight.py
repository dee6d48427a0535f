"""Query-term highlighting — wrap every term occurrence in ``<em>`` tags.

The Elasticsearch ``highlight`` response block for the transcripts
engine, sharing the reference snippet generator's surface-text
semantics (QueryService.java:1102-1257 matches query terms against the
lowercased raw text with ``indexOf``; here every case-insensitive
occurrence is tagged, not just the first).

One ``regexp_replace`` per row — a single JVM expression, no UDF, fully
whole-stage-codegen — with the alternation built driver-side: terms
sorted length-desc so the longest query term wins at any position in
BOTH engines (Java regex and DuckDB's RE2 are leftmost-first on
alternation), metacharacters escaped, the matched fragment re-emitted
via a capture group so original casing is preserved.  ``n_hits`` is
derived arithmetically from the length delta, which keeps the DuckDB
twin byte-identical without a second regex pass.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

PRE, POST = "<em>", "</em>"
_TAG_LEN = len(PRE) + len(POST)


def term_pattern(terms: list[str]) -> str:
    """Shared alternation: unique lowercased terms, longest first (ties
    lexicographic) so both engines' leftmost-first alternation behaves
    as longest-match; regex metacharacters escaped."""
    uniq = sorted({t.lower() for t in terms if t}, key=lambda t: (-len(t), t))
    if not uniq:
        raise ValueError("highlight needs at least one non-empty term")
    return "(" + "|".join(re.escape(t) for t in uniq) + ")"


def highlight(
    docs: DataFrame,
    terms: list[str],
    key_cols: tuple[str, ...] = ("doc_id",),
    text_col: str = "text",
) -> DataFrame:
    """(*key_cols, n_hits, highlighted) for docs containing ≥1 term.

    ``highlighted`` is ``text_col`` with every case-insensitive
    query-term occurrence wrapped in ``<em>…</em>``; ``n_hits`` counts
    the wrapped occurrences.  Misses are dropped (the ES highlight
    block only appears on matching fields).
    """
    pat = "(?i)" + term_pattern(terms)
    marked = F.regexp_replace(F.col(text_col), pat, f"{PRE}$1{POST}")
    d = docs.select(*key_cols, F.col(text_col), marked.alias("highlighted"))
    n_hits = (
        (F.length("highlighted") - F.length(text_col)) / _TAG_LEN
    ).cast("long")
    return (
        d.select(*key_cols, n_hits.alias("n_hits"), "highlighted")
        .filter(F.col("n_hits") > 0)
    )


def highlighted_snippets(
    docs: DataFrame,
    terms: list[str],
    width: int = 60,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*key_cols, hit_pos, snippet) — the snippet window around the
    first hit (operators/snippets.py) with every in-window term
    occurrence tagged.  A tag cut by the window edge cannot occur:
    highlighting runs on the already-extracted fragment, never on the
    full text."""
    from .snippets import snippets

    snip = snippets(docs, terms, width=width, key_cols=key_cols)
    pat = "(?i)" + term_pattern(terms)
    marked = F.regexp_replace(F.col("snippet"), pat, f"{PRE}$1{POST}")
    return snip.select(*key_cols, "hit_pos", marked.alias("snippet"))


def highlight_sql(
    table: str, terms: list[str], key_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`highlight` — same driver-built alternation,
    RE2 ``gi`` flags, ``\\1`` backref, identical length-delta count."""
    pat = term_pattern(terms).replace("'", "''")
    return f"""
WITH h AS (
  SELECT {key_col}, text,
         regexp_replace(text, '{pat}', '<em>\\1</em>', 'gi') AS highlighted
  FROM {table}
)
SELECT {key_col},
       CAST((length(highlighted) - length(text)) / {_TAG_LEN} AS BIGINT) AS n_hits,
       highlighted
FROM h
WHERE length(highlighted) > length(text)
"""
