"""Per-document term vectors — the Elasticsearch ``_termvectors`` API
analog: for one (conv_id, turn_idx) turn, every analyzed term with its
in-document statistics (tf, positions) and its corpus statistics
(df, idf, doc_count).

ES semantics exactly: when the index does not store term vectors (this
one doesn't — posting blocks are term-major, not doc-major), the API
**re-analyzes the document on the fly** through the same analyzer the
index used and joins corpus stats from the live index.  That is also
the scale-correct shape here: the alternative — scanning every posting
block of the doc's group for membership — reads O(group bytes) to
answer a single-doc question the raw text answers in one pushed-filter
row fetch.

Execution: one column-pruned, predicate-pushed scan of the transcripts
table fetches the single row (conv_id = x AND turn_idx = y both reach
the parquet scan); analysis of that one document is driver-side (the
same altitude as the reader's explain() assembly); corpus stats come
from the reader's bucket-pruned idf/df lookup (|terms| rows, cached).
Works on both readers — CompressedIndex and the segmented MultiIndex
expose the same df_map/idf_map/n_docs surface.

The reference has no term-vectors endpoint; its nearest analog is the
per-word DB row its indexer maintains (words + postings tables) —
this operator exposes the same statistics per document instead of per
term, reference-checked against the pure-Python oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..textproc.pipeline import analyze_text

#: output schema (positions joined as "p0,p1,..." — stable across engines)
TV_SCHEMA = (
    "term string, tf int, positions string, df long, idf double, doc_count long"
)


def doc_term_stats(text: str) -> dict[str, tuple[int, list[int]]]:
    """term → (tf, positions) from one document's analyzed token stream.
    Shared by the operator and the pure-Python oracle twin."""
    out: dict[str, tuple[int, list[int]]] = {}
    for pos, t in enumerate(analyze_text(text if isinstance(text, str) else "")):
        if t in out:
            f, ps = out[t]
            ps.append(pos)
            out[t] = (f + 1, ps)
        else:
            out[t] = (1, [pos])
    return out


def term_vectors(
    index,
    transcripts: DataFrame,
    conv_id: str,
    turn_idx: int,
) -> DataFrame:
    """→ DataFrame(term, tf, positions, df, idf, doc_count), one row per
    distinct analyzed term of the target turn, ordered by term.

    ``positions`` is the comma-joined 0-based analyzed-token positions
    (the same position space the index's phrase predicate uses).
    ``df``/``idf`` are the index's live values (bucket-pruned lookup);
    ``doc_count`` is the index's corpus size N.  A missing document
    yields an empty frame; a term the index has never seen (possible
    when the transcripts table is fresher than the index) reports the
    absent-term contract df=0 with the df=0 idf — the same convention
    the scorer uses.
    """
    spark = transcripts.sparkSession
    rows = (
        transcripts.filter(
            (F.col("conv_id") == conv_id) & (F.col("turn_idx") == int(turn_idx))
        )
        .select("text")
        .collect()
    )
    if not rows:
        return spark.createDataFrame([], TV_SCHEMA)
    stats = doc_term_stats(rows[0]["text"])
    terms = sorted(stats)
    dfm = index.df_map(terms)
    idfm = index.idf_map(terms)
    data = [
        (
            t,
            stats[t][0],
            ",".join(str(p) for p in stats[t][1]),
            dfm[t],
            float(idfm[t]),
            index.n_docs,
        )
        for t in terms
    ]
    return spark.createDataFrame(data, TV_SCHEMA)
