"""Unified query-string search — the ES ``query_string`` / Lucene
``BooleanQuery`` execution face over one string::

    search_query_string(idx, '+kubernetes "pod evict"~1 -role:system error^2 time*')

Grammar and semantics live in :mod:`search_engine_spark.boolquery`
(SHARED with the pure-Python oracle, so both sides parse and resolve
clauses identically); this module supplies the two things the shared
resolver cannot: vocabulary expansions (one pushed idf-table scan per
marker kind — the same cap/rank contracts as the standalone expansion
modes) and the filter-context scope (field filters compile to ONE
column-pruned predicate on the corpus metadata scan, handed to the
kernels as the existing cogrouped allow set).

Physical plan: identical to every other query mode — a bucket-pruned
postings scan for the clause terms (must_not terms included: their
posting lists drive the exclusion set algebra), ONE grouped Arrow
kernel computing the bool candidate set and scoring it (kernels.
bool_candidates + exact_topk), broadcast label join, global top-k cut.
No new shuffle anywhere; at 10^12 turns the cost profile is the
conjunctive/phrase class (bounded by the rarest must clause), never
O(corpus).

Works identically over a single ``CompressedIndex`` and a segmented
``MultiIndex`` (expansion runs over the union vocabulary; shadow/
tombstone exclusion composes through the common kernel tail).

No reference analog (the reference serves one mode per request —
QueryService.java:80-104 dispatches phrase/boolean/term exclusively);
the grammar follows the public Lucene/ES contracts cited in
``boolquery``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..boolquery import (
    ParsedQS,
    QSFilter,
    marker_values,
    parse_query_string,
    resolve_query_string,
)
from ..index.reader import QuerySpec
from ..oracle import FUZZY_CAP, PREFIX_CAP


def _engine_expansions(index, parsed: ParsedQS) -> dict:
    """Marker-clause expansions via the index's vocabulary scans —
    one batched, pushed idf-table job per marker kind present."""
    vals = marker_values(parsed.clauses)
    out: dict[tuple[str, str], list[str]] = {}
    for kind, meth, cap in (
        ("prefix", "_prefix_expansions", PREFIX_CAP),
        ("wildcard", "_wildcard_expansions", PREFIX_CAP),
        ("regexp", "_regexp_expansions", PREFIX_CAP),
        ("fuzzy", "_fuzzy_expansions", FUZZY_CAP),
    ):
        if vals.get(kind):
            for v, terms in getattr(index, meth)(vals[kind], cap).items():
                out[(kind, v)] = terms
    return out


def compile_query_string(
    index, query_text: str, min_should_match: int | None = None
) -> tuple[QuerySpec, tuple[QSFilter, ...]]:
    """Parse + expand one query string against ``index``'s vocabulary →
    a kernel-ready ``QuerySpec(mode="bool")`` plus its field filters.
    The spec feeds any reader entry point that takes ``spec=`` (topk,
    topk_conversations, match_count, matches)."""
    parsed = parse_query_string(query_text)
    res = resolve_query_string(
        parsed, _engine_expansions(index, parsed), min_should_match
    )
    return _spec_from(res), parsed.filters


def _spec_from(res) -> QuerySpec:
    """Resolved clauses → kernel spec, with the DEGENERATE-disjunctive
    rewrite: a query of pure should clauses at min_should=1 (the most
    common shape — every plain multi-term query) matches exactly the
    disjunctive union of its clause terms (matching ANY term matches
    its clause), so it compiles to mode="disjunctive" and gets the
    block-max pruned kernel instead of candidates+exact — the 3.7-31×
    head-term win at large groups (BASELINE.md "Block-max vs exact").
    Any must/not/phrase clause or msm>1 needs the bool set algebra
    (clause-count semantics ≠ distinct-term count) and stays "bool".
    Scores are identical either way (same weighted-idf summation);
    the cross-mode degeneracy identities in tests pin it."""
    bc = res.clauses
    degenerate = (
        not bc.must_groups and not bc.not_groups
        and not bc.must_phrases and not bc.should_phrases
        and not bc.not_phrases and bc.min_should == 1
    )
    return QuerySpec(
        "disjunctive" if degenerate else "bool",
        list(bc.positive_terms),
        weights=res.weights,
        bool_clauses=bc,
    )


def filters_condition(filters) -> "F.Column":
    """Field filters → ONE boolean Column over the corpus metadata.
    NULL contract (pinned by tests + oracle `qs_filter_keys`): a NULL
    field never satisfies a positive filter and always passes a negated
    one — ``eqNullSafe`` for equality, ``coalesce(cmp, false)`` for
    ranges (a bare ``~cmp`` would DROP null rows instead)."""
    ops = {
        ">=": lambda c, v: c >= v, "<=": lambda c, v: c <= v,
        ">": lambda c, v: c > v, "<": lambda c, v: c < v,
    }
    cond = F.lit(True)
    for f in filters:
        col = F.col(f.field)
        if f.op == "eq":
            hit = col.eqNullSafe(F.lit(f.value))
        else:
            val = (
                F.to_timestamp(F.lit(f.value.replace("T", " ")))
                if f.field == "ts"
                else F.lit(int(f.value))
            )
            hit = F.coalesce(ops[f.op](col, val), F.lit(False))
        cond = cond & (~hit if f.negated else hit)
    return cond


def _scope_for(
    meta: DataFrame | None, filters, query_text: str,
    scope: DataFrame | None = None,
):
    """Combine the query's field filters with an optional structured
    ``scope`` predicate (both filter-context).  Two scopes intersect by
    a key semi-join — declarative, so Catalyst prunes both sides."""
    if not filters:
        return scope
    if meta is None:
        raise ValueError(
            f"query string {query_text!r} has field filters "
            f"({', '.join(f.field for f in filters)}); pass meta= (the "
            "transcripts frame or any frame with conv_id/turn_idx + the "
            "filtered columns)"
        )
    out = meta.filter(filters_condition(filters))
    if scope is not None:
        out = out.join(
            scope.select("conv_id", "turn_idx"),
            ["conv_id", "turn_idx"],
            "leftsemi",
        )
    return out


def search_query_string(
    index,
    query_text: str,
    k: int = 10,
    meta: DataFrame | None = None,
    min_should_match: int | None = None,
    tombstones: list | None = None,
    search_after: tuple | None = None,
    collapse: bool = False,
    scope: DataFrame | None = None,
) -> DataFrame:
    """Top-k for a unified query string → DataFrame(conv_id, turn_idx,
    score), oracle-identical (``oracle_query_string``).

    ``meta`` (the corpus metadata; column-pruned to keys + filtered
    fields by Catalyst) is required iff the query carries
    ``field:value`` filters.  ``collapse=True`` returns one best turn
    per conversation (the field-collapsing contract).  ``tombstones``
    and ``search_after`` compose exactly as on :meth:`topk`; an
    explicit ``scope`` frame intersects with the field filters."""
    spec, filters = compile_query_string(index, query_text, min_should_match)
    scope = _scope_for(meta, filters, query_text, scope)
    if not spec.bool_clauses.all_terms:
        # every clause analyzer-dropped or expansion-emptied: no
        # postings to scan — return the typed empty frame directly
        return index.spark.createDataFrame(
            [], "conv_id string, turn_idx int, score double"
        )
    if collapse:
        if search_after is not None:
            raise ValueError(
                "collapse + search_after is not supported (see "
                "topk_conversations)"
            )
        return index.topk_conversations(
            query_text, "bool", k, tombstones=tombstones, scope=scope,
            spec=spec,
        )
    return index.topk(
        query_text, "bool", k, tombstones=tombstones, scope=scope,
        search_after=search_after, spec=spec,
    )


def count_query_string(
    index,
    query_text: str,
    meta: DataFrame | None = None,
    min_should_match: int | None = None,
    tombstones: list | None = None,
    scope: DataFrame | None = None,
) -> int:
    """Matching-document count (totalResults) for a unified query
    string — sizes the exact candidate set :func:`search_query_string`
    ranks (oracle: ``oracle_query_string_count``)."""
    spec, filters = compile_query_string(index, query_text, min_should_match)
    scope = _scope_for(meta, filters, query_text, scope)
    if not spec.bool_clauses.all_terms:
        return 0
    return index.match_count(
        query_text, "bool", tombstones=tombstones, scope=scope, spec=spec
    )


def compile_query_strings(
    index, texts: list[str], min_should_match: int | None = None
) -> list[QuerySpec]:
    """Compile MANY query strings with the vocabulary work batched:
    marker expansions for the whole batch run as one pushed idf-table
    job per marker kind (not per query).  Field filters are rejected —
    the batch path applies one SHARED scope to every query (pass
    ``scope=`` to the batch entry point instead)."""
    parsed = [parse_query_string(t) for t in texts]
    for p, t in zip(parsed, texts):
        if p.filters:
            raise ValueError(
                f"batched query string {t!r} has field filters; the batch "
                "path applies ONE shared scope — filter with scope= instead"
            )
    exp = _engine_expansions(
        index, ParsedQS(tuple(c for p in parsed for c in p.clauses), ())
    )
    return [
        _spec_from(resolve_query_string(p, exp, min_should_match))
        for p in parsed
    ]


def search_query_string_batch(
    index,
    queries: list,
    k: int = 10,
    min_should_match: int | None = None,
    tombstones: list | None = None,
    scope: DataFrame | None = None,
) -> DataFrame:
    """Top-k for MANY query strings in ONE job →
    DataFrame(query_id, conv_id, turn_idx, score) — the batch execution
    contract of ``topk_batch`` (union-pruned postings scan, one decode
    per group shared across queries, per-query top-k), row-identical to
    calling :func:`search_query_string` per string (pinned by tests).

    ``queries``: list of strings or ``(string, k)`` pairs; ``query_id``
    is the list position."""
    items = [
        (q, None) if isinstance(q, str) else (q[0], int(q[1]))
        for q in queries
    ]
    specs = compile_query_strings(
        index, [t for t, _ in items], min_should_match
    )
    batch = [
        (s, kk if kk is not None else k)
        for s, (_t, kk) in zip(specs, items)
    ]
    return index.topk_batch(batch, k=k, tombstones=tombstones, scope=scope)


def recency_query_string(
    index,
    transcripts: DataFrame,
    query_text: str,
    now: str,
    scale_s: float,
    k: int = 10,
    meta: DataFrame | None = None,
    min_should_match: int | None = None,
    tombstones: list | None = None,
    **decay,
) -> DataFrame:
    """Freshness-decayed bool-query top-k (operators/recency.py over the
    compiled spec): decay reorders the EXACT bool match set, filters
    compose as scope."""
    from .recency import recency_topk

    spec, filters = compile_query_string(index, query_text, min_should_match)
    scope = _scope_for(meta, filters, query_text)
    return recency_topk(
        index, transcripts, query_text, now, scale_s, "bool", k,
        tombstones=tombstones, scope=scope, spec=spec, **decay,
    )


def hybrid_query_string(
    index,
    embeddings: DataFrame,
    query_text: str,
    k: int = 10,
    meta: DataFrame | None = None,
    min_should_match: int | None = None,
    **hy,
) -> DataFrame:
    """Hybrid (BM25 ∪ embedding-cosine) retrieval driven by a unified
    query string: the LEXICAL leg executes the compiled bool spec, the
    SEMANTIC leg embeds only the positive literal text
    (``boolquery.positive_text`` — must_not text and wildcard patterns
    never reach the encoder), and field filters scope BOTH legs."""
    from ..boolquery import positive_text
    from ..pipeline.hybrid import hybrid_topk

    parsed = parse_query_string(query_text)
    res = resolve_query_string(
        parsed, _engine_expansions(index, parsed), min_should_match
    )
    spec = _spec_from(res)
    scope = _scope_for(meta, parsed.filters, query_text, hy.pop("scope", None))
    sem_text = positive_text(parsed)
    return hybrid_topk(
        index, embeddings, sem_text, k, mode="bool", scope=scope, spec=spec,
        **hy,
    )
