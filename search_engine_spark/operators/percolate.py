"""Percolation — reverse search over the transcript firehose.

The forward engine indexes documents and answers ad-hoc queries; a
percolator inverts that: queries are REGISTERED once and every new
document is checked against all of them in one pass — the primitive
behind saved-search alerting ("tell me when a turn matching X
arrives").  This is the Elasticsearch percolator analog; the reference
engine has no equivalent (its crawler/indexer loop re-runs forward
queries), so this operator is an extension in the same spirit as the
streaming ingest stack.

Spark-first design (the 100-TB story):

- **Saved queries are config-sized** (like the synonyms sidecar): parsed
  once driver-side through the reader's own :func:`parse_query` — so a
  registered query means exactly what the same string means to ``topk``
  on every mode (disjunctive with min_match/boosts, conjunctive, exact
  and sloppy phrase, quoted boolean) — and broadcast to executors.
- **ONE Arrow ``mapInPandas`` pass over the incoming documents**: each
  text is tokenized exactly once (the index build's analyzer, with the
  same per-batch stem memo) and verified against candidate queries.
  No shuffle, no index, no driver loop: cost is O(docs·tokens +
  matches) and embarrassingly parallel — the operator composes with a
  streaming micro-batch or a 100-TB backfill scan equally.
- **Candidate pruning**: an inverted trigger-term → queries map, built
  once per executor from the broadcast, makes per-doc work proportional
  to the queries that SHARE a term with the doc, not to registry size
  (the classic percolator optimization).  Conjunctive/phrase/boolean
  queries register only a single representative term per required
  phrase — any match must contain it — while disjunctive queries
  register every term.
- **Optional BM25 scoring** of each (doc, query) match against a
  reference index's global statistics (broadcast idf/avgdl — the ES
  percolator's ``track_scores``).  tf and dl are recomputed from the
  incoming text with the build analyzer, so for a document that is
  already indexed the percolate score equals the forward ``topk`` score
  bit-for-bit (pinned by tests/test_percolate.py).
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame

from ..config import BM25_B, BM25_K1
from ..index.reader import QuerySpec, parse_query
from ..textproc import analyze_text

MATCH_SCHEMA = "conv_id string, turn_idx int, query_id string"
SCORED_SCHEMA = MATCH_SCHEMA + ", score double"


@dataclass(frozen=True)
class SavedQuery:
    """One registered query: its id plus the parsed spec (the spec is
    what ``topk`` would execute for the same string — shared parser)."""

    query_id: str
    spec: QuerySpec
    #: mode="qs" only: filter-context field clauses, evaluated against
    #: the incoming document's OWN metadata columns (role/tool/conv_id)
    #: — percolation is the one place a "filter" checks the doc in
    #: hand, not a corpus scan
    filters: tuple = ()


@dataclass(frozen=True)
class ScoringStats:
    """Frozen global BM25 statistics for match scoring: per-term idf
    (absent terms already defaulted — see ``scoring_stats``) + avgdl."""

    idf: dict
    avgdl: float


def register(queries) -> list[SavedQuery]:
    """Parse a registry of saved queries driver-side.

    ``queries``: iterable of dicts (``query_id``, ``query_text``,
    optional ``mode`` / ``min_match``) or tuples
    ``(query_id, query_text[, mode[, min_match]])``.  Queries that
    analyze to nothing (stopword-only) match no document and are
    dropped, mirroring ``topk`` returning empty for them.
    """
    out: list[SavedQuery] = []
    seen: set[str] = set()
    for q in queries:
        if isinstance(q, dict):
            qid = str(q["query_id"])
            qt = q["query_text"]
            mode = q.get("mode", "disjunctive")
            mm = q.get("min_match")
        else:
            qid = str(q[0])
            qt = q[1]
            mode = q[2] if len(q) > 2 else "disjunctive"
            mm = int(q[3]) if len(q) > 3 else None
        if qid in seen:
            raise ValueError(f"duplicate query_id {qid!r}")
        seen.add(qid)
        if mode == "qs":
            # unified query strings percolate too: occurrence groups,
            # phrases, boosts, msm, and FIELD FILTERS (matched against
            # the doc's own metadata).  Expansion markers are rejected —
            # a frozen registry has no live vocabulary to expand
            # against (same rationale as phrase-prefix below).
            from ..boolquery import parse_query_string, resolve_query_string

            parsed = parse_query_string(qt)
            bad = [c.value for c in parsed.clauses if c.marker]
            if bad:
                raise ValueError(
                    f"saved query {qid!r}: expansion markers "
                    f"({', '.join(bad)}) are not percolatable (no "
                    "vocabulary to expand against)"
                )
            res = resolve_query_string(parsed, {}, min_should_match=mm)
            bc = res.clauses
            if not bc.positive_terms:
                continue  # every positive clause analyzer-dropped
            out.append(
                SavedQuery(
                    qid,
                    QuerySpec(
                        "bool",
                        list(bc.positive_terms),
                        weights=res.weights,
                        bool_clauses=bc,
                    ),
                    parsed.filters,
                )
            )
            continue
        # `mm is not None`, not truthiness: an explicit min_match=0 must
        # flow into parse_query and fail its >= 1 check loudly, not be
        # silently coerced to 1 (which would change saved-query
        # semantics behind the registrant's back).
        spec = parse_query(qt, mode, min_match=int(mm) if mm is not None else 1)
        if spec is not None:
            if spec.phrase_prefix is not None:
                # match_phrase_prefix expands against a LIVE vocabulary;
                # a registry of frozen saved queries has none to expand
                # against, so reject at registration — not silently
                # matching only the fixed part at stream time.
                raise ValueError(
                    f"saved query {qid!r}: phrase-prefix queries are not "
                    "percolatable (no vocabulary to expand against)"
                )
            out.append(SavedQuery(qid, spec))
    return out


def scoring_stats(index, saved: list[SavedQuery]) -> ScoringStats:
    """Collect the reference index's global stats for every term any
    saved query scores — ONE bucket-pruned idf lookup (the registry is
    config-sized, so this is a tiny driver-side job), frozen for
    broadcast.  ``index`` is a CompressedIndex or MultiIndex."""
    terms: set[str] = set()
    for sq in saved:
        terms |= set(sq.spec.score_terms)
    return ScoringStats(index.idf_map(sorted(terms)), float(index.avgdl))


def _trigger_map(saved: list[SavedQuery]) -> dict:
    """term → tuple of saved-query indexes that the term can trigger.

    Disjunctive: any query term may be the only one present → all terms
    trigger.  Conjunctive: every term must be present → one
    representative suffices.  Phrase: all phrase terms required → one
    representative.  Boolean: each side is a required phrase for the
    ways it can match — AND triggers on a left representative (both
    sides needed), OR on one representative per side, NOT on a left
    representative (the right side only excludes).
    """
    trig: dict[str, list[int]] = {}

    def add(term: str, i: int) -> None:
        trig.setdefault(term, []).append(i)

    for i, sq in enumerate(saved):
        s = sq.spec
        if s.mode == "disjunctive":
            for t in s.score_terms:
                add(t, i)
        elif s.mode == "conjunctive":
            add(s.score_terms[0], i)
        elif s.mode == "phrase":
            add((s.phrase_a or [""])[0], i)
        elif s.mode == "near":
            # all distinct terms required → one representative suffices
            add(s.score_terms[0], i)
        elif s.mode == "bool":
            bc = s.bool_clauses
            # a match contains >=1 term of EVERY must group -> the
            # smallest group's alternatives cover all matches; a must
            # phrase needs all its terms -> one representative; with
            # neither, min_should>=1 guarantees >=1 matched should
            # clause -> all group alternatives + one rep per phrase
            nonempty_musts = [g for g in bc.must_groups if g]
            if nonempty_musts:
                for t in min(nonempty_musts, key=len):
                    add(t, i)
            elif bc.must_phrases:
                add(bc.must_phrases[0][0][0], i)
            else:
                for g in bc.should_groups:
                    for t in g:
                        add(t, i)
                for terms, _slop in bc.should_phrases:
                    add(terms[0], i)
        else:  # boolean — sides are exact phrases
            add((s.phrase_a or [""])[0], i)
            if s.bool_op == "OR":
                add((s.phrase_b or [""])[0], i)
    return {t: tuple(v) for t, v in trig.items()}


def _phrase_in_doc(pos: dict, terms: list, slop: int) -> bool:
    """Ordered occurrence of ``terms`` within ``slop`` extra gaps in one
    document's position lists — the same greedy earliest-successor
    existence argument as the index kernel and the pure-Python oracle,
    implemented independently over the doc's own token stream."""
    if not terms:  # a side that analyzed to nothing matches no document
        return False
    lists = [pos.get(t) for t in terms]
    if any(x is None for x in lists):
        return False
    if len(terms) == 1:
        return True
    if slop == 0:
        rest = [set(x) for x in lists[1:]]
        return any(
            all((p + j + 1) in r for j, r in enumerate(rest)) for p in lists[0]
        )
    n1 = len(terms) - 1
    for p in lists[0]:
        cur = p
        for arr in lists[1:]:
            j = bisect.bisect_right(arr, cur)
            if j == len(arr):
                cur = None
                break
            cur = arr[j]
        if cur is not None and (cur - p - n1) <= slop:
            return True
    return False


def _matches(pos: dict, spec: QuerySpec) -> bool:
    """Does one document (term → ascending positions) satisfy ``spec``?
    Semantics mirror the forward kernels mode-for-mode
    (index/kernels.py msm/conjunctive/phrase candidates; boolean set
    ops at index/reader.py)."""
    if spec.mode == "conjunctive":
        return all(t in pos for t in spec.score_terms)
    if spec.mode == "phrase":
        return _phrase_in_doc(pos, spec.phrase_a or [], spec.slop)
    if spec.mode == "near":
        lists = [pos.get(t) for t in spec.score_terms]
        if any(x is None for x in lists):
            return False
        if len(lists) == 1:
            return True
        w = spec.slop + len(lists) - 1
        anchors = sorted(set().union(*[set(x) for x in lists]))
        return any(
            all(any(a <= p <= a + w for p in lst) for lst in lists)
            for a in anchors
        )
    if spec.mode == "bool":
        bc = spec.bool_clauses
        for g in bc.must_groups:
            if not any(t in pos for t in g):
                return False
        for terms, slop in bc.must_phrases:
            if not _phrase_in_doc(pos, list(terms), slop):
                return False
        if bc.min_should >= 1:
            n = sum(
                1 for g in bc.should_groups if any(t in pos for t in g)
            ) + sum(
                1
                for terms, slop in bc.should_phrases
                if _phrase_in_doc(pos, list(terms), slop)
            )
            if n < bc.min_should:
                return False
        for g in bc.not_groups:
            if any(t in pos for t in g):
                return False
        for terms, slop in bc.not_phrases:
            if _phrase_in_doc(pos, list(terms), slop):
                return False
        return True
    if spec.mode == "boolean":
        left = _phrase_in_doc(pos, spec.phrase_a or [], 0)
        if spec.bool_op == "AND":
            return left and _phrase_in_doc(pos, spec.phrase_b or [], 0)
        if spec.bool_op == "OR":
            return left or _phrase_in_doc(pos, spec.phrase_b or [], 0)
        return left and not _phrase_in_doc(pos, spec.phrase_b or [], 0)
    n = sum(1 for t in spec.score_terms if t in pos)
    return n >= spec.min_match


def _score(pos: dict, spec: QuerySpec, dl: int, stats: ScoringStats) -> float:
    """BM25 of the doc for the spec's score terms under the reference
    index's global stats — the same formula as kernels._partial
    (IndexerService.java:1069-1070), with per-term boosts applied the
    way the reader pre-scales idf."""
    w = spec.weights or {}
    score = 0.0
    for t in spec.score_terms:
        plist = pos.get(t)
        if plist is None:
            continue
        tf = float(len(plist))
        partial = (
            tf
            * (BM25_K1 + 1.0)
            / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / stats.avgdl))
        )
        score += w.get(t, 1.0) * stats.idf.get(t, 0.0) * partial
    return score


def _passes_filters(fields: dict, filters) -> bool:
    """Field filters against ONE document's own metadata — the same
    NULL contract as the forward engine's scope condition (a NULL field
    never satisfies a positive filter, always passes a negated one).
    Equality on the keyword fields; range comparators on ts (pandas
    Timestamp) and turn_idx (int)."""
    import operator as _op

    ops = {">=": _op.ge, "<=": _op.le, ">": _op.gt, "<": _op.lt}
    for f in filters:
        v = fields.get(f.field)
        if v is not None and not isinstance(v, str) and v != v:
            v = None  # pandas NaN/NaT
        if getattr(f, "op", "eq") == "eq":
            hit = v is not None and str(v) == f.value
        elif v is None:
            hit = False
        elif f.field == "ts":
            hit = bool(ops[f.op](pd.Timestamp(v), pd.Timestamp(f.value)))
        else:
            hit = bool(ops[f.op](int(v), int(f.value)))
        if hit if f.negated else not hit:
            return False
    return True


def percolate(
    docs: DataFrame,
    saved: list[SavedQuery],
    stats: ScoringStats | None = None,
) -> DataFrame:
    """Match every incoming document against the saved-query registry.

    Returns ``(conv_id, turn_idx, query_id)`` rows — one per (document,
    matching query) pair — plus ``score`` when ``stats`` is given.
    One column-pruned scan, one Arrow kernel, no shuffle; candidate
    queries per doc come from the trigger map, so registry size beyond
    the shared-term set costs nothing per document.
    """
    if not saved:
        schema = SCORED_SCHEMA if stats is not None else MATCH_SCHEMA
        return docs.sparkSession.createDataFrame([], schema)
    payload = docs.sparkSession.sparkContext.broadcast((tuple(saved), stats))
    scored = stats is not None
    schema = SCORED_SCHEMA if scored else MATCH_SCHEMA
    cols = ["conv_id", "turn_idx", "query_id"] + (["score"] if scored else [])
    # qs filter fields ride the same column-pruned scan (conv_id is a
    # key column already; role/tool add only when some query filters
    # on them — the text column still dominates scan bytes)
    extra = sorted(
        {f.field for sq in saved for f in sq.filters} - {"conv_id", "turn_idx"}
    )

    def kernel(batches):
        saved_l, st = payload.value
        trig = _trigger_map(list(saved_l))
        stem_cache: dict = {}
        for pdf in batches:
            out: list[tuple] = []
            extras = [pdf[c] for c in extra]
            for conv, turn, text, *fvals in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"], *extras
            ):
                toks = analyze_text(
                    text if isinstance(text, str) else "", _stem_cache=stem_cache
                )
                if not toks:
                    continue
                fields = dict(zip(extra, fvals))
                fields["conv_id"] = conv
                fields["turn_idx"] = int(turn)
                pos: dict = {}
                for i, t in enumerate(toks):
                    pos.setdefault(t, []).append(i)
                cand: set = set()
                for t in pos:
                    cand.update(trig.get(t, ()))
                for qi in sorted(cand):
                    sq = saved_l[qi]
                    if sq.filters and not _passes_filters(fields, sq.filters):
                        continue
                    if _matches(pos, sq.spec):
                        row = (conv, int(turn), sq.query_id)
                        if st is not None:
                            row += (_score(pos, sq.spec, len(toks), st),)
                        out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return docs.select("conv_id", "turn_idx", "text", *extra).mapInPandas(
        kernel, schema=schema
    )
