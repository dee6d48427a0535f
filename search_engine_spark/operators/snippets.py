"""Result snippets — the reference's snippet generator analog
(QueryService.java:1102-1257: find first query-term occurrence, extract a
window around it, ellipsize).

Pure built-in expressions: `locate` on the lowercased text for each query
term, `least` of the hit positions, `substring` window, conditional
ellipses.  Deterministic and cross-engine (DuckDB twin in the contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WIDTH = 60  # characters on each side of the first hit


def first_hit(terms: list[str]):
    """1-based position of the earliest query-term occurrence (0 = none)."""
    lowered = F.lower(F.col("text"))
    hits = [F.locate(t, lowered) for t in sorted(set(terms))]
    # min over non-zero positions: replace 0 (miss) with a sentinel
    big = F.lit(1 << 30)
    pos = F.least(*[F.when(h == 0, big).otherwise(h) for h in hits]) if len(hits) > 1 else (
        F.when(hits[0] == 0, big).otherwise(hits[0])
    )
    return F.when(pos == big, F.lit(0)).otherwise(pos)


def snippets(
    docs: DataFrame,
    terms: list[str],
    width: int = WIDTH,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*key_cols, hit_pos, snippet) for docs containing ≥1 query term.

    snippet = text[max(1, pos-width) : pos+width] with '...' markers when
    truncated on either side.  ``key_cols`` lets callers keyed by
    (conv_id, turn_idx) reuse the same expressions.
    """
    pos = first_hit(terms)
    d = docs.select(*key_cols, "text", pos.alias("hit_pos")).filter(
        F.col("hit_pos") > 0
    )
    start = F.greatest(F.col("hit_pos") - width, F.lit(1))
    frag = F.substring(F.col("text"), start, 2 * width)
    lead = F.when(start > 1, F.lit("...")).otherwise(F.lit(""))
    tail = F.when(
        (start + 2 * width - 1) < F.length("text"), F.lit("...")
    ).otherwise(F.lit(""))
    return d.select(
        *key_cols,
        "hit_pos",
        F.concat(lead, frag, tail).alias("snippet"),
    )


def snippets_sql(table: str, terms: list[str], width: int = WIDTH) -> str:
    """DuckDB twin of :func:`snippets` (strpos == locate, 1-based)."""
    uniq = sorted(set(terms))
    hit_exprs = ", ".join(
        f"CASE WHEN strpos(lower(text), '{t}') = 0 THEN 1073741824 "
        f"ELSE strpos(lower(text), '{t}') END" for t in uniq
    )
    least = f"least({hit_exprs})" if len(uniq) > 1 else hit_exprs
    return f"""
WITH h AS (
  SELECT doc_id, text,
         CASE WHEN {least} = 1073741824 THEN 0 ELSE {least} END AS hit_pos
  FROM {table}
)
SELECT doc_id, hit_pos,
       (CASE WHEN greatest(hit_pos - {width}, 1) > 1 THEN '...' ELSE '' END)
       || substr(text, greatest(hit_pos - {width}, 1), {2 * width})
       || (CASE WHEN greatest(hit_pos - {width}, 1) + {2 * width} - 1 < length(text)
                THEN '...' ELSE '' END) AS snippet
FROM h WHERE hit_pos > 0
"""
