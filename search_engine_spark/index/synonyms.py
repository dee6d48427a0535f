"""Query-time synonym expansion — Lucene ``SynonymGraphFilter`` analog.

The reference matches literal stemmed terms only; production search
layers a curated synonym set on top ("k8s" should find "kubernetes"
turns).  Index-time injection would change df/doclen — every synonym
edit would force a reindex and skew BM25 stats — so, per the standard
Lucene/Elasticsearch guidance, expansion happens at QUERY time: each
analyzed query term splices in its mapped synonym terms, and the
rewritten term list executes through the ordinary ``analyzed=True``
disjunctive path (scores/stats untouched; set-semantics scoring makes
the splice safe — duplicate terms contribute once).

The mapping is DIRECTIONAL (key → synonyms), stored POST-ANALYSIS:
Porter is not idempotent, so raw words analyze once at write time and
the sidecar carries index-vocabulary terms that must not be re-analyzed
(the same invariant as prefix/fuzzy expansion).  Multi-word synonym
phrases contribute all their terms (disjunctive OR-semantics).

Storage is a single parquet sidecar (``<index>/synonyms``): a synonym
set is CONFIG-sized (curated, ~10^3-10^5 rows), not vocabulary-sized —
it broadcasts trivially and needs no bucket pruning (contrast
``fuzzy.py``, whose variant table scales with the vocabulary).  For LSM
segment sets the sidecar lives on the BASE segment: synonyms are a
query-layer setting, not per-segment data.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..textproc import analyze_text

SYNONYMS_SCHEMA = "term string, syn string, rank int"


def analyze_mapping(mapping: dict[str, list[str] | str]) -> dict[str, list[str]]:
    """Raw-word mapping → analyzed-term mapping.

    Each KEY must analyze to exactly one index term (multi-token or
    stopword-only keys fail loud — a silently dropped synonym rule is a
    debugging trap); each VALUE phrase analyzes to ≥0 terms, flattened
    in order, deduped, the key itself removed.  Keys whose synonym list
    ends up empty drop out."""
    out: dict[str, list[str]] = {}
    for raw_key, raw_vals in mapping.items():
        kt = analyze_text(raw_key)
        if len(kt) != 1:
            raise ValueError(
                f"synonym key {raw_key!r} must analyze to exactly one term, "
                f"got {kt!r}"
            )
        key = kt[0]
        if isinstance(raw_vals, str):
            raw_vals = [raw_vals]
        seen: list[str] = []
        for phrase in raw_vals:
            for t in analyze_text(phrase):
                if t != key and t not in seen:
                    seen.append(t)
        if seen:
            out[key] = seen
    return out


def expand_terms(terms: list[str], syn: dict[str, list[str]]) -> list[str]:
    """Splice each term's synonyms in after it, order-preserving dedupe.

    Input and output are ANALYZED term lists (the ``analyzed=True``
    execution form).  Shared by the engine readers and mirrored
    independently by ``oracle.oracle_expand_synonyms``."""
    out: list[str] = []
    for t in terms:
        if t not in out:
            out.append(t)
        for s in syn.get(t, ()):
            if s not in out:
                out.append(s)
    return out


def write_synonyms(
    spark: SparkSession, index_root: str, mapping: dict[str, list[str] | str]
) -> str:
    """Persist the analyzed mapping as the index's synonym sidecar.

    Idempotent overwrite; one small file (config-sized table).  The
    ``rank`` column pins splice order so reads reproduce the curated
    ordering deterministically."""
    analyzed = analyze_mapping(mapping)
    rows = [
        (key, s, i)
        for key in sorted(analyzed)
        for i, s in enumerate(analyzed[key])
    ]
    out = os.path.join(index_root, "synonyms")
    (
        spark.createDataFrame(rows or [], SYNONYMS_SCHEMA)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def load_synonyms(spark: SparkSession, index_root: str) -> dict[str, list[str]]:
    """Read the sidecar back into the analyzed mapping ({} if absent)."""
    path = os.path.join(index_root, "synonyms")
    if not os.path.isdir(path):
        return {}
    rows = (
        spark.read.schema(SYNONYMS_SCHEMA)
        .parquet(path)
        .orderBy("term", "rank")
        .collect()
    )
    out: dict[str, list[str]] = {}
    for r in rows:
        out.setdefault(r["term"], []).append(r["syn"])
    return out
