"""Did-you-mean — spelling correction for unmatched query terms.

The reference surfaces related queries (``QueryService.java:1498-1540``,
ported in operators/suggest.py) but has no misspelling recovery; the
Elasticsearch/Solr analog is the term suggester.  Deterministic
contract, shared with the pure-Python oracle
(:func:`search_engine_spark.oracle.choose_correction`):

* a query term that IS in the index vocabulary is left alone (matched
  terms are never "corrected" — ES ``suggest_mode: missing``);
* an unmatched term is replaced by its highest-df edit-distance-≤1
  vocabulary neighbor (term asc on df ties), found through the same
  SymSpell delete-1 machinery the fuzzy queries use — the persisted
  bucket-pruned sidecar when present, the idf-table fallback otherwise
  (``CompressedIndex._fuzzy_rows``); a term with no neighbor stays;
* the corrected query is the ANALYZED token sequence with replacements
  spliced in — executable with ``topk(..., analyzed=True)`` like every
  other expansion rewrite — or ``None`` when nothing was corrected.

Scale shape: one bucket-pruned sidecar scan sized by the query's
variant set (|terms| × ~word-length rows), candidates verified and
ranked driver-side — the identical cost class as ``expand_fuzzy``,
measured at a 1M-term vocabulary in FUZZY_SCALE_PROBE.json.  Works on
both readers; MultiIndex df merges across segments (the established
fuzzy-expansion contract: raw per-segment dfs, shadow-corrected stats
are a scoring concern, not a suggestion one).
"""

from __future__ import annotations

from ..oracle import choose_correction
from ..textproc import analyze_query


def suggest_correction(
    index, query_text: str
) -> tuple[str | None, dict[str, str]]:
    """(corrected_query | None, {unmatched_term: suggestion}).

    Oracle: ``oracle.oracle_suggest_correction``."""
    terms = analyze_query(query_text)
    uniq = sorted(set(terms))
    if not uniq:
        return None, {}
    # both readers expose _fuzzy_rows (MultiIndex merges per-segment dfs)
    cand = index._fuzzy_rows(uniq)
    sugg: dict[str, str] = {}
    for t in uniq:
        lst = cand.get(t, [])
        if any(w == t for w, _df in lst):
            continue  # in the vocabulary (its own delete-0 variant row)
        c = choose_correction(t, lst)
        if c is not None:
            sugg[t] = c
    if not sugg:
        return None, {}
    return " ".join(sugg.get(t, t) for t in terms), sugg
