"""Pure-Python reference oracle (no Spark).

Independently computes the index contents and BM25 top-k that the Spark
engine must reproduce rank-identically (SURVEY.md §4.3, §5.2).  It shares
only :mod:`search_engine_spark.textproc` with the engine — everything else
(indexing, scoring, top-k) is a simple single-node implementation.

Scoring contract (SURVEY.md §4.3, from the reference's precomputed-metrics
path):

    idf(t)       = ln((1 + N) / (1 + df(t))) + 1        # IndexerService.java:966
    tf_bm25(t,d) = f * (k1+1) / (f + k1 * (1 - b + b * |d|/avgdl))
                                                        # IndexerService.java:1069-1070
    score(q,d)   = Σ over UNIQUE query terms t (sorted lexicographically,
                   fixed summation order) with f(t,d) > 0
    k1 = 1.2, b = 0.75                                  # IndexerService.java:1029-1030

* ``N`` = total turns (all turns, including empty ones), ``avgdl`` = mean
  stemmed-token count over all turns.
* Duplicate query terms contribute ONCE (set semantics).
* Ties break by ascending ``(conv_id, turn_idx)``.
* Phrase queries match consecutive positions in the post-stopword,
  post-stem token stream of a turn; scored as BM25 over the phrase terms
  restricted to matching turns.
* Boolean queries (both operands quoted, exactly one of AND/OR/NOT —
  QueryService.java:80-104) combine the two phrase match sets and score
  over the union of the operand terms (left terms only for NOT).
"""

from __future__ import annotations

import bisect
import math
import re
from dataclasses import dataclass, field

import pandas as pd

from .config import BM25_B, BM25_K1
from .textproc import analyze_query, analyze_text

DocKey = tuple[str, int]

# QueryService.java:50-51
PHRASE_PATTERN = re.compile(r'"([^"]*)"')
OPERATOR_PATTERN = re.compile(r"\s+(AND|OR|NOT)\s+")

#: Sloppy-phrase suffix: `"a b"~2` = terms in order within 2 extra
#: position gaps (Lucene ordered SpanNearQuery / Indri #N semantics —
#: an extension over the reference, whose phrase match is exact-adjacent
#: only).  Phrase mode only; boolean sub-phrases stay exact.
SLOP_PATTERN = re.compile(r'"\s*~(\d+)')


def parse_slop(query_text: str) -> int:
    """Slop window from an inline `"..."~N` suffix (0 when absent)."""
    m = SLOP_PATTERN.search(query_text)
    return int(m.group(1)) if m else 0

#: Lucene boost suffix: ``tok^2.5`` multiplies every index term the
#: token analyzes to by 2.5 in the BM25 sum (score = Σ w·idf·tf_bm25) —
#: query-time relevance tuning, term modes only (a quoted phrase/boolean
#: operand never carries a boost).
_WEIGHT_TOKEN = re.compile(r"^(.+?)\^(\d+(?:\.\d+)?)$")


def split_weight_tokens(query_text: str) -> tuple[str, list[tuple[str, float]]]:
    """query text → (text with ``^w`` suffixes stripped, [(raw_token, w)]).

    A token carries a boost iff it ends in ``^`` + a decimal number.
    Non-positive boosts are rejected loudly — a clause that cannot
    contribute is a query error, not a silent drop (and a zero weight
    would also invalidate the kernels' block upper bounds)."""
    toks: list[str] = []
    pairs: list[tuple[str, float]] = []
    for tok in query_text.split():
        m = _WEIGHT_TOKEN.match(tok)
        if m:
            w = float(m.group(2))
            if w <= 0.0:
                raise ValueError(f"non-positive boost in query token {tok!r}")
            toks.append(m.group(1))
            pairs.append((m.group(1), w))
        else:
            toks.append(tok)
    return " ".join(toks), pairs


def resolve_term_weights(
    pairs: list[tuple[str, float]], analyzed: bool = False
) -> dict[str, float]:
    """Raw ``(token, w)`` boosts → index-term weight map: each boosted
    token runs through the query analyzer (identity when ``analyzed``)
    and its boost applies to every term it yields; when several boosts
    land on the same index term the LARGEST wins (deterministic and
    order-insensitive — the rule both engine and oracle pin)."""
    out: dict[str, float] = {}
    for raw, w in pairs:
        terms = raw.split() if analyzed else analyze_query(raw)
        for t in terms:
            out[t] = max(out.get(t, 0.0), w)
    return out


def parse_query_weights(
    query_text: str, mode: str, analyzed: bool = False
) -> tuple[str, dict[str, float] | None]:
    """One-call weight pre-pass shared by engine and oracle: for term
    modes with a ``^`` present, strip boosts and resolve the term-weight
    map; all other queries pass through untouched."""
    if mode in ("disjunctive", "conjunctive") and "^" in query_text:
        clean, pairs = split_weight_tokens(query_text)
        weights = resolve_term_weights(pairs, analyzed)
        return clean, (weights or None)
    return query_text, None


#: Lucene-style bound on multi-term (prefix) expansion — a wildcard may
#: never blow a query up into the whole vocabulary.
PREFIX_CAP = 32
_PREFIX_TOKEN = re.compile(r"^([0-9A-Za-z]+)\*$")


def split_prefix_tokens(query_text: str) -> tuple[list[str], list[str]]:
    """query text → (tokens in order, prefixes lowercased+star-marked,
    the distinct prefixes).  A token expands iff it is word chars plus
    ONE trailing ``*``; anything else passes through to the analyzer
    untouched (which strips stray ``*``).  Shared by the engine reader
    and the oracle so both rewrite queries identically."""
    toks: list[str] = []
    prefixes: list[str] = []
    for tok in query_text.split():
        m = _PREFIX_TOKEN.match(tok)
        if m:
            p = m.group(1).lower()
            toks.append(p + "*")
            if p not in prefixes:
                prefixes.append(p)
        else:
            toks.append(tok)
    return toks, prefixes


def rewrite_with_expansions(
    toks: list[str], expansions: dict[str, list[str]]
) -> str:
    """Splice each prefix's expansion terms back into token order; an
    unmatched prefix drops out (it can match nothing)."""
    out: list[str] = []
    for tok in toks:
        m = _PREFIX_TOKEN.match(tok)
        if m:
            out.extend(expansions.get(m.group(1), []))
        else:
            out.append(tok)
    return " ".join(out)


@dataclass
class OracleIndex:
    n_docs: int
    avgdl: float
    doclen: dict[DocKey, int]
    # term -> list of (doc_key, tf, positions) in ascending doc_key order
    postings: dict[str, list[tuple[DocKey, int, list[int]]]]
    tokens: dict[DocKey, list[str]] = field(repr=False, default_factory=dict)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def idf(self, term: str) -> float:
        return math.log((1.0 + self.n_docs) / (1.0 + self.df(term))) + 1.0

    def tf_bm25(self, f: int, dl: int) -> float:
        return (
            f * (BM25_K1 + 1.0) / (f + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / self.avgdl))
        )


def build_oracle_index(transcripts: pd.DataFrame) -> OracleIndex:
    """Index a transcripts DataFrame under stable (conv_id, turn_idx) order."""
    df = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    doclen: dict[DocKey, int] = {}
    postings: dict[str, list[tuple[DocKey, int, list[int]]]] = {}
    tokens: dict[DocKey, list[str]] = {}
    for conv_id, turn_idx, text in zip(df["conv_id"], df["turn_idx"], df["text"]):
        key = (str(conv_id), int(turn_idx))
        toks = analyze_text(text if isinstance(text, str) else "")
        tokens[key] = toks
        doclen[key] = len(toks)
        per_term: dict[str, tuple[int, list[int]]] = {}
        for pos, t in enumerate(toks):
            if t in per_term:
                f, ps = per_term[t]
                ps.append(pos)
                per_term[t] = (f + 1, ps)
            else:
                per_term[t] = (1, [pos])
        for t, (f, ps) in per_term.items():
            postings.setdefault(t, []).append((key, f, ps))
    n = len(doclen)
    avgdl = (sum(doclen.values()) / n) if n else 0.0
    return OracleIndex(n_docs=n, avgdl=avgdl, doclen=doclen, postings=postings, tokens=tokens)


def _score_candidates(
    index: OracleIndex,
    terms: list[str],
    candidates: set[DocKey] | None,
    weights: dict[str, float] | None = None,
) -> dict[DocKey, float]:
    """BM25 over unique sorted terms; restrict to candidates if given.
    ``weights`` multiplies a term's idf (query boosts: ``tok^2.5``)."""
    scores: dict[DocKey, float] = {}
    for t in sorted(set(terms)):
        plist = index.postings.get(t)
        if not plist:
            continue
        idf = index.idf(t)
        if weights:
            idf = idf * weights.get(t, 1.0)
        for key, f, _pos in plist:
            if candidates is not None and key not in candidates:
                continue
            scores[key] = scores.get(key, 0.0) + index.tf_bm25(f, index.doclen[key]) * idf
    return scores


def _msm_docs(index: OracleIndex, terms: list[str], m: int) -> set[DocKey]:
    """Docs containing at least ``m`` DISTINCT query terms — the
    ``minimum_should_match`` candidate set (ES optional-clause
    semantics: a term absent from the index can never match)."""
    counts: dict[DocKey, int] = {}
    for t in sorted(set(terms)):
        for key, _f, _p in index.postings.get(t, ()):
            counts[key] = counts.get(key, 0) + 1
    return {key for key, n in counts.items() if n >= m}


def _finish(
    scores: dict[DocKey, float], k: int, after: tuple | None
) -> list[tuple[DocKey, float]]:
    """Final cut shared by every oracle_topk branch: plain top-k, or —
    with an ``after`` cursor (score, conv_id, turn_idx) — the k entries
    strictly AFTER the cursor in (score desc, conv_id, turn_idx) order
    (the search_after deep-pagination contract)."""
    if after is None:
        return _topk(scores, k)
    cs, cc, ct = float(after[0]), str(after[1]), int(after[2])
    ranked = _topk(scores, len(scores))
    out = [
        (key, s)
        for key, s in ranked
        if s < cs or (s == cs and key > (cc, ct))
    ]
    return out[:k]


def _topk(scores: dict[DocKey, float], k: int) -> list[tuple[DocKey, float]]:
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:k]


_PHRASE_PREFIX_LAST = re.compile(r"^([0-9A-Za-z]+)\*$")


def split_phrase_prefix(text: str) -> tuple[str, str | None]:
    """Phrase text → (fixed part, trailing prefix or None): the LAST
    whitespace token may carry one trailing ``*`` — the ES
    ``match_phrase_prefix`` contract.  Like standalone prefix tokens,
    the marker skips analysis and matches the POST-STEM vocabulary
    (lowercased); everything before it analyzes normally.  Shared by
    the engine parser and the oracle."""
    toks = text.split()
    if toks:
        m = _PHRASE_PREFIX_LAST.match(toks[-1])
        if m:
            return " ".join(toks[:-1]), m.group(1).lower()
    return text, None


def _phrase_match_docs(
    index: OracleIndex, phrase_terms: list[str], slop: int = 0
) -> set[DocKey]:
    """Turns where phrase_terms occur in order within a ``slop`` window.

    ``slop=0``: consecutive positions in the post-stem stream.
    ``slop>0``: ordered sloppy phrase — positions p1 < ... < pn, one per
    term in phrase order, with ``(pn - p1) - (n-1) <= slop``; checked by
    the greedy earliest-successor chain per start (minimal end for a
    given start, so existence is exact)."""
    if not phrase_terms:
        return set()
    first = index.postings.get(phrase_terms[0], [])
    if len(phrase_terms) == 1:
        return {key for key, _f, _p in first}
    if slop > 0:
        rest_pos = [
            {key: pos for key, _f, pos in index.postings.get(t, [])}
            for t in phrase_terms[1:]
        ]
        out: set[DocKey] = set()
        for key, _f, pos0 in first:
            if any(key not in r for r in rest_pos):
                continue
            for p in pos0:
                cur = p
                for r in rest_pos:
                    arr = r[key]  # ascending
                    i = bisect.bisect_right(arr, cur)
                    if i == len(arr):
                        cur = None
                        break
                    cur = arr[i]
                if cur is not None and (cur - p - len(rest_pos)) <= slop:
                    out.add(key)
                    break
        return out
    rest = [
        {key: set(pos) for key, _f, pos in index.postings.get(t, [])}
        for t in phrase_terms[1:]
    ]
    out = set()
    for key, _f, pos0 in first:
        for p in pos0:
            if all(key in r and (p + i + 1) in r[key] for i, r in enumerate(rest)):
                out.add(key)
                break
    return out


def _near_match_docs(
    index: OracleIndex, terms: list[str], slop: int = 0
) -> set[DocKey]:
    """Docs where all DISTINCT terms occur within an unordered window:
    positions p_t (one per term) with ``(max - min) - (n-1) <= slop``
    — the engine's ``near_candidates`` contract (Lucene unordered
    SpanNearQuery / Indri ``#uwN``).  Brute-force anchor check: the
    window minimum is some occurrence, so testing every occurrence as
    the anchor is exhaustive."""
    uniq = sorted(set(terms))
    if not uniq:
        return set()
    per_term = []
    for t in uniq:
        plist = index.postings.get(t)
        if not plist:
            return set()
        per_term.append({key: pos for key, _f, pos in plist})
    docs = set(per_term[0])
    for dp in per_term[1:]:
        docs &= set(dp)
    if len(uniq) == 1:
        return docs
    w = slop + len(uniq) - 1
    out: set[DocKey] = set()
    for d in docs:
        anchors = sorted(set().union(*[set(dp[d]) for dp in per_term]))
        for a in anchors:
            if all(any(a <= p <= a + w for p in dp[d]) for dp in per_term):
                out.add(d)
                break
    return out


def _oracle_phrase_spec(
    index: OracleIndex, query_text: str, limit: int = PREFIX_CAP
) -> tuple[list[str], list[str] | None, list[str]]:
    """Phrase-mode query → (ordered fixed terms, prefix variants or
    None, score terms), resolving a trailing-``*`` last token against
    the vocabulary (df desc / term asc, capped — the repo's one
    multi-term ordering contract; ES/Lucene use term-dict order, a
    documented divergence).  Scoring covers the fixed terms plus every
    expanded variant the doc contains — the MultiPhraseQuery-flavored
    union, consistent with the repo's phrase contract (BM25 over the
    query's terms, candidates from phrase position)."""
    phrase = PHRASE_PATTERN.search(query_text)
    text = phrase.group(1) if phrase else query_text
    text, pp = split_phrase_prefix(text)
    terms = analyze_text(text)
    if pp is None:
        return terms, None, sorted(set(terms))
    variants = _oracle_prefix_expansions(index, [pp], limit).get(pp, [])
    return terms, variants, sorted(set(terms + variants))


def _phrase_prefix_docs(
    index: OracleIndex,
    fixed: list[str],
    variants: list[str],
    slop: int = 0,
) -> set[DocKey]:
    """Docs where the phrase ``fixed + [v]`` occurs for ANY expansion
    variant ``v`` (empty expansion → no matches, the ES
    ``zero_terms_query: none`` behavior)."""
    out: set[DocKey] = set()
    for v in variants:
        out |= _phrase_match_docs(index, fixed + [v], slop)
    return out


def oracle_topk(
    index: OracleIndex,
    query_text: str,
    mode: str = "disjunctive",
    k: int = 10,
    scope: set[DocKey] | None = None,
    analyzed: bool = False,
    min_match: int = 1,
    after: tuple | None = None,
) -> list[tuple[DocKey, float]]:
    """Golden top-k for one query: list of ((conv_id, turn_idx), score).

    ``scope`` restricts the RESULT set to the given doc keys (a metadata
    filter); scores keep the corpus-global stats — the filter-context
    semantics of the engine's scoped search.  ``analyzed=True`` treats
    ``query_text`` as whitespace-joined post-analysis terms (the
    expansion execution mode; term modes only).  ``min_match`` keeps
    only docs matching ≥ m distinct query terms (disjunctive only —
    the ES ``minimum_should_match`` contract).  ``after`` is a
    (score, conv_id, turn_idx) cursor: return the k results strictly
    AFTER it in rank order (``search_after`` deep pagination).  Term
    tokens may carry ``^w`` boosts (``tok^2.5``) multiplying their
    idf contribution."""
    if min_match > 1 and mode != "disjunctive":
        raise ValueError(f"min_match needs disjunctive mode, not {mode!r}")
    query_text, weights = parse_query_weights(query_text, mode, analyzed)
    if analyzed:
        if mode not in ("disjunctive", "conjunctive"):
            raise ValueError(
                f"analyzed=True supports disjunctive/conjunctive, not {mode!r}"
            )
        terms = query_text.split()
        if not terms:
            return []
        if mode == "conjunctive":
            sets = [
                {key for key, _f, _p in index.postings.get(t, [])}
                for t in set(terms)
            ]
            candidates = set.intersection(*sets) if sets else set()
            if scope is not None:
                candidates &= scope
            if not candidates:
                return []
            return _finish(
                _score_candidates(index, terms, candidates, weights), k, after
            )
        candidates = scope
        if min_match > 1:
            candidates = _msm_docs(index, terms, min_match)
            if scope is not None:
                candidates &= scope
        return _finish(
            _score_candidates(index, terms, candidates, weights), k, after
        )
    if mode == "boolean":
        return _boolean_topk(index, query_text, k, scope, after=after)
    if mode == "near":
        phrase = PHRASE_PATTERN.search(query_text)
        terms = analyze_text(phrase.group(1) if phrase else query_text)
        docs = _near_match_docs(index, terms, parse_slop(query_text))
        if scope is not None:
            docs &= scope
        return _finish(_score_candidates(index, terms, docs), k, after)
    if mode == "phrase":
        terms, variants, score_terms = _oracle_phrase_spec(index, query_text)
        if variants is None:
            docs = _phrase_match_docs(index, terms, parse_slop(query_text))
        else:
            docs = _phrase_prefix_docs(
                index, terms, variants, parse_slop(query_text)
            )
        if scope is not None:
            docs &= scope
        return _finish(_score_candidates(index, score_terms, docs), k, after)

    terms = analyze_query(query_text)
    if not terms:
        return []
    if mode == "conjunctive":
        # QueryService.java:595-615 — docs containing ALL unique terms
        sets = []
        for t in set(terms):
            sets.append({key for key, _f, _p in index.postings.get(t, [])})
        candidates = set.intersection(*sets) if sets else set()
        if scope is not None:
            candidates &= scope
        if not candidates:
            return []
        return _finish(
            _score_candidates(index, terms, candidates, weights), k, after
        )
    candidates = scope
    if min_match > 1:
        candidates = _msm_docs(index, terms, min_match)
        if scope is not None:
            candidates &= scope
    return _finish(_score_candidates(index, terms, candidates, weights), k, after)


def _boolean_topk(
    index: OracleIndex,
    query_text: str,
    k: int,
    scope: set[DocKey] | None = None,
    after: tuple | None = None,
) -> list[tuple[DocKey, float]]:
    """Both operands quoted, exactly one AND/OR/NOT (QueryService.java:80-104)."""
    op_match = OPERATOR_PATTERN.search(query_text)
    phrases = PHRASE_PATTERN.findall(query_text)
    if not op_match or len(phrases) != 2:
        raise ValueError(f"invalid boolean query: {query_text!r}")
    op = op_match.group(1)
    lterms = analyze_text(phrases[0])
    rterms = analyze_text(phrases[1])
    ldocs = _phrase_match_docs(index, lterms)
    rdocs = _phrase_match_docs(index, rterms)
    if op == "AND":
        docs, terms = ldocs & rdocs, lterms + rterms
    elif op == "OR":
        docs, terms = ldocs | rdocs, lterms + rterms
    else:  # NOT
        docs, terms = ldocs - rdocs, lterms
    if scope is not None:
        docs &= scope
    return _finish(_score_candidates(index, terms, docs), k, after)


def oracle_matches(
    index: OracleIndex,
    query_text: str,
    mode: str = "disjunctive",
    scope: set[DocKey] | None = None,
    analyzed: bool = False,
    min_match: int = 1,
) -> set[DocKey]:
    """The full matching-document set for one query — the candidate set
    the ranked page is drawn from — optionally restricted to ``scope``.
    ``min_match`` keeps docs matching ≥ m distinct terms (disjunctive)."""
    if min_match > 1 and mode != "disjunctive":
        raise ValueError(f"min_match needs disjunctive mode, not {mode!r}")
    query_text, _w = parse_query_weights(query_text, mode, analyzed)
    if analyzed:
        if mode not in ("disjunctive", "conjunctive"):
            raise ValueError(
                f"analyzed=True supports disjunctive/conjunctive, not {mode!r}"
            )
        terms = query_text.split()
        if not terms:
            return set()
        if mode == "conjunctive":
            sets = [
                {key for key, _f, _p in index.postings.get(t, [])}
                for t in set(terms)
            ]
            docs = set.intersection(*sets) if sets else set()
        elif min_match > 1:
            docs = _msm_docs(index, terms, min_match)
        else:
            docs = set(_score_candidates(index, terms, None))
        if scope is not None:
            docs &= scope
        return docs
    if mode == "boolean":
        op_match = OPERATOR_PATTERN.search(query_text)
        phrases = PHRASE_PATTERN.findall(query_text)
        if not op_match or len(phrases) != 2:
            raise ValueError(f"invalid boolean query: {query_text!r}")
        op = op_match.group(1)
        ldocs = _phrase_match_docs(index, analyze_text(phrases[0]))
        rdocs = _phrase_match_docs(index, analyze_text(phrases[1]))
        docs = ldocs & rdocs if op == "AND" else ldocs | rdocs if op == "OR" else ldocs - rdocs
    elif mode == "near":
        phrase = PHRASE_PATTERN.search(query_text)
        terms = analyze_text(phrase.group(1) if phrase else query_text)
        docs = _near_match_docs(index, terms, parse_slop(query_text))
    elif mode == "phrase":
        terms, variants, _st = _oracle_phrase_spec(index, query_text)
        if variants is None:
            docs = _phrase_match_docs(index, terms, parse_slop(query_text))
        else:
            docs = _phrase_prefix_docs(
                index, terms, variants, parse_slop(query_text)
            )
    else:
        terms = analyze_query(query_text)
        if not terms:
            return set()
        if mode == "conjunctive":
            sets = [
                {key for key, _f, _p in index.postings.get(t, [])} for t in set(terms)
            ]
            docs = set.intersection(*sets) if sets else set()
        elif min_match > 1:
            docs = _msm_docs(index, terms, min_match)
        else:
            docs = set(_score_candidates(index, terms, None))
    if scope is not None:
        docs &= scope
    return docs


def oracle_topk_conversations(
    index: OracleIndex,
    query_text: str,
    mode: str = "disjunctive",
    k: int = 10,
    scope: set[DocKey] | None = None,
    analyzed: bool = False,
) -> list[tuple[DocKey, float]]:
    """Golden conversation-collapsed top-k: one row per conversation
    (its best turn — highest score, lowest turn on ties), conversations
    ranked by that best score (conv_id asc ties), top-k."""
    rows = oracle_topk(index, query_text, mode, 1 << 62, scope, analyzed)
    best: dict[str, tuple[DocKey, float]] = {}
    for (conv, turn), score in rows:  # (score desc, conv asc, turn asc)
        if conv not in best:
            best[conv] = ((conv, turn), score)
    return sorted(best.values(), key=lambda kv: (-kv[1], kv[0][0]))[:k]


def oracle_match_count(
    index: OracleIndex,
    query_text: str,
    mode: str = "disjunctive",
    scope: set[DocKey] | None = None,
) -> int:
    """Total matching documents for one query — the candidate set the
    ranked page is drawn from (the reference's totalResults /
    totalPages field, QueryService.java pagination)."""
    return len(oracle_matches(index, query_text, mode, scope))


def oracle_explain(
    index: OracleIndex,
    query_text: str,
    conv_id: str,
    turn_idx: int,
    mode: str = "disjunctive",
    analyzed: bool = False,
    min_match: int = 1,
) -> list[tuple[str, int, float, float, int, int, float, float]]:
    """Per-term score breakdown of ONE document for one query — the
    Elasticsearch ``_explain`` analog (an extension; the reference
    exposes no scoring introspection).  Rows, term-ascending::

        (term, df, idf, weight, tf, dl, partial, contribution)

    with ``contribution = (idf * weight) * partial`` and
    ``sum(contributions) == oracle_topk score`` of the doc, bit-for-bit
    (the oracle sums in the same lexicographic term order).  Empty when
    the doc is NOT in the query's match set (conjunctive missing a term,
    phrase not present, NOT excluded) — matching the engine, where a
    non-candidate contributes no result row, and ES, which reports
    ``matched: false`` with no score details.  Only terms with tf > 0
    in the doc produce rows (a zero-tf term contributes zero)."""
    key: DocKey = (str(conv_id), int(turn_idx))
    if key not in oracle_matches(
        index, query_text, mode, analyzed=analyzed, min_match=min_match
    ):
        return []
    clean, weights = parse_query_weights(query_text, mode, analyzed)
    if mode == "boolean":
        op_match = OPERATOR_PATTERN.search(clean)
        phrases = PHRASE_PATTERN.findall(clean)
        op = op_match.group(1)
        terms = analyze_text(phrases[0])
        if op != "NOT":
            terms = terms + analyze_text(phrases[1])
    elif mode == "phrase":
        phrase = PHRASE_PATTERN.search(clean)
        terms = analyze_text(phrase.group(1) if phrase else clean)
    else:
        terms = clean.split() if analyzed else analyze_query(clean)
    dl = index.doclen[key]
    out = []
    for t in sorted(set(terms)):
        tf = next((f for k2, f, _p in index.postings.get(t, ()) if k2 == key), 0)
        if tf == 0:
            continue
        w = weights.get(t, 1.0) if weights else 1.0
        idf = index.idf(t)
        partial = index.tf_bm25(tf, dl)
        out.append((t, index.df(t), idf, w, tf, dl, partial, (idf * w) * partial))
    return out


#: More-like-this: max source-doc terms kept for the derived query
#: (Elasticsearch `more_like_this.max_query_terms` default).
MLT_MAX_TERMS = 25


def mlt_select_terms(
    tokens: list[str],
    idf_by_term: dict[str, float],
    max_terms: int = MLT_MAX_TERMS,
) -> list[str]:
    """The MLT query terms of ONE document: its distinct analyzed terms
    ranked by tf*idf descending (term ascending on ties), top
    ``max_terms``.  SHARED by the engine operator (operators/mlt.py) and
    :func:`oracle_more_like_this`; the ranking key rounds to 9 decimals
    so a last-ulp idf divergence between the engine's stored idf (JVM
    log) and the oracle's ``math.log`` cannot flip the order at the
    ``max_terms`` cut boundary — the same cross-runtime float defense
    the score oracles apply (5-decimal rounding)."""
    tf: dict[str, int] = {}
    for t in tokens:
        tf[t] = tf.get(t, 0) + 1
    ranked = sorted(tf, key=lambda t: (-round(tf[t] * idf_by_term[t], 9), t))
    return ranked[:max_terms]


def oracle_more_like_this(
    index: OracleIndex,
    conv_id: str,
    turn_idx: int,
    k: int = 10,
    max_terms: int = MLT_MAX_TERMS,
) -> list[tuple[DocKey, float]]:
    """Golden more-like-this: BM25 top-k of the disjunctive query built
    from the source turn's top tf*idf terms, the source turn itself
    excluded (Elasticsearch more_like_this semantics — an extension over
    the reference, which has no similar-document query)."""
    key = (conv_id, turn_idx)
    toks = index.tokens.get(key, [])
    if not toks:
        return []
    idfs = {t: index.idf(t) for t in set(toks)}
    terms = mlt_select_terms(toks, idfs, max_terms)
    scores = _score_candidates(index, terms, None)
    scores.pop(key, None)
    return _topk(scores, k)


def oracle_recency_topk(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    now: str,
    scale_s: float,
    mode: str = "disjunctive",
    k: int = 10,
    offset_s: float = 0.0,
    decay_rate: float = 0.5,
    scope: set[DocKey] | None = None,
    analyzed: bool = False,
) -> list[tuple[DocKey, float, float]]:
    """Golden freshness-decayed top-k (operators/recency.py): EVERY
    matching doc's BM25 score multiplied by exp(ln(decay)/scale *
    max(0, now - ts - offset)), re-ranked, cut to k.  Returns
    ``[((conv_id, turn_idx), bm25, decayed), ...]`` ordered by
    (decayed desc, conv_id, turn_idx).  ``lam`` is computed by the
    identical Python expression as the engine operator, and ages are
    exact whole-second differences, so the two sides' float sequences
    match to the final libm ``exp`` call (absorbed by the contract's
    round-5 nudge)."""
    lam = math.log(decay_rate) / float(scale_s)
    now_ts = pd.Timestamp(now)
    ts_map = {
        (c, int(t)): ts
        for c, t, ts in zip(
            transcripts["conv_id"], transcripts["turn_idx"], transcripts["ts"]
        )
    }
    out = []
    for key, score in oracle_topk(index, query_text, mode, 1 << 62, scope, analyzed):
        age = max(
            0.0, (now_ts - ts_map[key]).total_seconds() - float(offset_s)
        )
        out.append((key, score, score * math.exp(lam * age)))
    out.sort(key=lambda r: (-r[2], r[0][0], r[0][1]))
    return out[:k]


#: Lucene-style bound on fuzzy (edit-distance-1) expansion.
FUZZY_CAP = 16
_FUZZY_TOKEN = re.compile(r"^([0-9A-Za-z]+)~$")


def split_fuzzy_tokens(query_text: str) -> tuple[list[str], list[str]]:
    """Like :func:`split_prefix_tokens` for trailing-``~`` fuzzy tokens."""
    toks: list[str] = []
    terms: list[str] = []
    for tok in query_text.split():
        m = _FUZZY_TOKEN.match(tok)
        if m:
            t = m.group(1).lower()
            toks.append(t + "~")
            if t not in terms:
                terms.append(t)
        else:
            toks.append(tok)
    return toks, terms


def rewrite_fuzzy(toks: list[str], expansions: dict[str, list[str]]) -> str:
    out: list[str] = []
    for tok in toks:
        m = _FUZZY_TOKEN.match(tok)
        if m:
            out.extend(expansions.get(m.group(1), []))
        else:
            out.append(tok)
    return " ".join(out)


def deletions1(word: str) -> list[str]:
    """All single-character deletions — the SymSpell d=1 variant set."""
    return [word[:i] + word[i + 1:] for i in range(len(word))]


def within_edit1(a: str, b: str) -> bool:
    """Levenshtein(a, b) ≤ 1, O(len) — the exact verifier candidates
    from the delete-1 collision join must pass (collisions admit some
    distance-2 pairs, e.g. substitution+shift)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def rank_fuzzy_candidates(
    term: str, cands: list[tuple[str, int]], limit: int
) -> list[str]:
    """Shared ordering contract for a fuzzy expansion: verified ed≤1
    matches, exact term first, then df desc, term asc, capped."""
    hits = sorted(
        ((0 if w == term else 1, -df, w) for w, df in cands if within_edit1(term, w)),
        key=lambda x: x,
    )
    return [w for _d, _ndf, w in hits[:limit]]


def oracle_significant_terms(
    index: OracleIndex,
    query_text: str,
    mode: str = "disjunctive",
    n: int = 10,
    min_fg: int = 2,
    include_query_terms: bool = False,
) -> list[tuple[str, int, int, float]]:
    """Golden significant-terms: per term of the matched turns,
    (term, fg, bg, jlh) with jlh = (fg_pct - bg_pct) * (fg_pct / bg_pct),
    fg_pct > bg_pct, ranked score desc / term asc, top n — the ES
    significant_terms JLH contract the engine reproduces
    (pipeline/significant.py)."""
    docs = oracle_matches(index, query_text, mode)
    fg_total = len(docs)
    if not fg_total:
        return []
    fg: dict[str, int] = {}
    for d in docs:
        for t in set(index.tokens.get(d, ())):
            fg[t] = fg.get(t, 0) + 1
    qterms: set[str] = set()
    if not include_query_terms:
        if mode == "phrase":
            m = PHRASE_PATTERN.search(query_text)
            qterms = set(analyze_text(m.group(1) if m else query_text))
        elif mode == "boolean":
            qterms = {
                t for p in PHRASE_PATTERN.findall(query_text) for t in analyze_text(p)
            }
        else:
            qterms = set(analyze_query(query_text))
    rows = []
    for t, f in fg.items():
        if f < min_fg or t in qterms:
            continue
        bg = index.df(t)
        fg_pct, bg_pct = f / fg_total, bg / index.n_docs
        score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
        if score > 0.0:
            rows.append((t, f, bg, score))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:n]


def oracle_date_histogram(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    mode: str = "disjunctive",
    interval: str = "hour",
) -> list[tuple[pd.Timestamp, int]]:
    """Golden date-histogram: the match set bucketed by the calendar
    interval of ``ts``, one (bucket, count) row per non-empty bucket,
    ascending — the ES date_histogram/min_doc_count=1 contract the
    engine reproduces (pipeline/histogram.py)."""
    docs = oracle_matches(index, query_text, mode)
    if not docs:
        return []
    df = transcripts[["conv_id", "turn_idx", "ts"]]
    keys = set(docs)
    mask = [
        (str(c), int(t)) in keys for c, t in zip(df["conv_id"], df["turn_idx"])
    ]
    hit = df[pd.Series(mask, index=df.index)]
    # pandas floor freq strings: minute='min', hour='h', day='D'; weeks/
    # months are calendar units floor() does not take — use to_period.
    if interval in ("week", "month", "year"):
        per = hit["ts"].dt.to_period(
            {"week": "W", "month": "M", "year": "Y"}[interval]
        )
        buckets = per.dt.start_time
    elif interval == "minute":
        buckets = hit["ts"].dt.floor("min")
    elif interval == "hour":
        buckets = hit["ts"].dt.floor("h")
    else:  # day
        buckets = hit["ts"].dt.floor("D")
    counts = buckets.value_counts().sort_index()  # dropna: NaT handled below
    out = [(b, int(n)) for b, n in counts.items()]
    # a NULL ts groups into a NULL bucket on the engine side
    # (date_trunc(NULL)=NULL), ordered FIRST (Spark nulls-first asc)
    n_null = int(buckets.isna().sum())
    if n_null:
        out.insert(0, (None, n_null))
    return out


def oracle_date_histogram_pipeline(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    mode: str = "disjunctive",
    interval: str = "hour",
    window: int = 3,
    min_doc_count: int = 1,
) -> list[tuple[pd.Timestamp, int, int, int | None, float]]:
    """Golden ES pipeline aggregations over the date histogram:
    (bucket, n, cumulative_sum, derivative, moving_avg·5dp) per bucket,
    ascending — cumulative running total, adjacent-bucket difference
    (None for the first bucket), unweighted trailing-``window`` mean
    including the current bucket (partial leading windows average what
    they have).  ``min_doc_count=0`` gap-fills the calendar grid between
    the first and last bucket with zero-count rows; NULL-ts turns are
    excluded (ES ignores documents missing the field).  Matches
    ``pipeline.histogram.date_histogram_pipeline``."""
    rows = [
        (b, n)
        for b, n in oracle_date_histogram(index, transcripts, query_text, mode, interval)
        if b is not None
    ]
    if min_doc_count == 0 and rows:
        freq = {
            "minute": "min", "hour": "h", "day": "D",
            "week": "W-MON", "month": "MS", "year": "YS",
        }[interval]
        grid = pd.date_range(rows[0][0], rows[-1][0], freq=freq)
        have = dict(rows)
        rows = [(b, int(have.get(b, 0))) for b in grid]
    out = []
    cum = 0
    for i, (b, n) in enumerate(rows):
        cum += n
        deriv = None if i == 0 else n - rows[i - 1][1]
        wvals = [x[1] for x in rows[max(0, i - window + 1) : i + 1]]
        out.append((b, n, cum, deriv, _round5(sum(wvals) / len(wvals))))
    return out


def oracle_percentile_ranks(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    values: tuple,
    mode: str = "disjunctive",
    field: str = "chars",
) -> dict:
    """Golden ES ``percentile_ranks``: exact empirical CDF percent
    ``100 · count(v <= x) / n`` per probe value — the quantity the ES
    t-digest approximates.  Keys are the engine's column names (r100,
    r2_5, …); empty match set → None (the ES null response).  The
    float sequence (count/n, then ·100, then round) is the Spark
    ``avg(indicator)·100`` arithmetic exactly."""

    def _name(x) -> str:
        s = f"{float(x):g}".replace(".", "_").replace("-", "m")
        return f"r{s}"

    hit = _matched_rows(index, transcripts, query_text, mode)
    vals = [
        int(v) for v in (hit["text"].str.len() if field == "chars" else hit[field])
    ]
    out: dict = {}
    for x in values:
        if not vals:
            out[_name(x)] = None
            continue
        c = sum(1.0 for v in vals if v <= float(x))
        out[_name(x)] = _round5((c / len(vals)) * 100.0)
    return out


def oracle_topk_by_field(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    sort_col: str = "ts",
    ascending: bool = False,
    k: int = 10,
    mode: str = "disjunctive",
    min_match: int = 1,
) -> list[tuple[str, int]]:
    """Golden ES field-sort retrieval ("latest matches"): the match
    set's top k by ``sort_col`` (missing values LAST in either
    direction — the ES ``missing: _last`` default), ties broken by
    (conv_id, turn_idx) ascending.  Matches
    ``operators.fieldsort.topk_by_field``."""
    keys = oracle_matches(index, query_text, mode, min_match=min_match)
    hit = transcripts[
        pd.Series(
            [
                (str(c), int(t)) in keys
                for c, t in zip(transcripts["conv_id"], transcripts["turn_idx"])
            ],
            index=transcripts.index,
        )
    ]
    present, absent = [], []
    for c, t, v in zip(hit["conv_id"], hit["turn_idx"], hit[sort_col]):
        key = (str(c), int(t))
        if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
            absent.append(key)
        else:
            present.append((v, key))
    # two stable passes: tie-break key ascending, then value; missing
    # values LAST in either direction (the ES `missing: _last` default)
    present.sort(key=lambda r: r[1])
    present.sort(key=lambda r: r[0], reverse=not ascending)
    return ([key for _v, key in present] + sorted(absent))[:k]


def oracle_top_hits_by(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    by: str,
    mode: str = "disjunctive",
    k: int = 3,
) -> list[tuple[object, int, str, int, float]]:
    """Golden top-hits-per-bucket: (<by>, rank, conv_id, turn_idx,
    score), hits ranked (score desc, conv asc, turn asc) within each
    bucket, buckets ascending — the ES terms+top_hits contract the
    engine reproduces (pipeline/tophits.py)."""
    rows = oracle_topk(index, query_text, mode, 1 << 62)
    byval = {
        (str(c), int(t)): (None if pd.isna(v) else v)
        for c, t, v in zip(transcripts["conv_id"], transcripts["turn_idx"], transcripts[by])
    }
    groups: dict[object, list[tuple[DocKey, float]]] = {}
    for key, score in rows:  # already (score desc, conv asc, turn asc)
        b = byval[key]
        g = groups.setdefault(b, [])
        if len(g) < k:
            g.append((key, score))
    out = []
    # None (NULL bucket) first — Spark's nulls-first ascending default
    for b in sorted(groups, key=lambda v: (v is not None, v)):
        for rank, (key, score) in enumerate(groups[b], start=1):
            out.append((b, rank, key[0], key[1], score))
    return out


def choose_correction(term: str, cands: list[tuple[str, int]]) -> str | None:
    """Best spelling correction for an UNMATCHED query term: its
    verified edit-distance-≤1 vocabulary neighbors ranked df desc, term
    asc; ``None`` when no neighbor exists.  SHARED by the engine
    operator (operators/didyoumean.py) and
    :func:`oracle_suggest_correction` so both sides pick identically."""
    hits = sorted((-df, w) for w, df in cands if within_edit1(term, w))
    return hits[0][1] if hits else None


def oracle_suggest_correction(
    index: OracleIndex, query_text: str
) -> tuple[str | None, dict[str, str]]:
    """Golden did-you-mean: per unmatched analyzed term, the highest-df
    edit-distance-≤1 vocabulary neighbor; the corrected query replaces
    each corrected term in the ANALYZED token sequence (executable with
    ``analyzed=True``).  ``(None, {})`` when every term matches or no
    term has a neighbor."""
    terms = analyze_query(query_text)
    sugg: dict[str, str] = {}
    for t in sorted(set(terms)):
        if index.postings.get(t):
            continue  # matched: nothing to correct
        cands = [(w, len(p)) for w, p in index.postings.items() if within_edit1(t, w)]
        c = choose_correction(t, cands)
        if c is not None:
            sugg[t] = c
    if not sugg:
        return None, {}
    return " ".join(sugg.get(t, t) for t in terms), sugg


def _oracle_fuzzy_expansions(
    index: OracleIndex, terms: list[str], limit: int
) -> dict[str, list[str]]:
    expansions: dict[str, list[str]] = {}
    for t in terms:
        tv = set(deletions1(t)) | {t}
        cands = [
            (w, len(plist))
            for w, plist in index.postings.items()
            if tv & (set(deletions1(w)) | {w})
        ]
        exp = rank_fuzzy_candidates(t, cands, limit)
        if exp:
            expansions[t] = exp
    return expansions


def oracle_expand_fuzzy(
    index: OracleIndex, query_text: str, limit: int = FUZZY_CAP
) -> str:
    """Reference rewrite for fuzzy (trailing-``~``) queries: each term
    expands to its edit-distance-≤1 vocabulary neighbors (exact term
    first, then df desc / term asc, capped) — the contract the engine's
    ``expand_fuzzy`` must reproduce.  Candidates come from the same
    delete-1 collision rule the engine's sidecar join implements, then
    the exact verifier.  Non-marker tokens pass through VERBATIM — use
    :func:`oracle_expand_query` for an executable (fully analyzed)
    rewrite."""
    toks, terms = split_fuzzy_tokens(query_text)
    if not terms:
        return query_text
    return rewrite_fuzzy(toks, _oracle_fuzzy_expansions(index, terms, limit))


def _oracle_prefix_expansions(
    index: OracleIndex, prefixes: list[str], limit: int
) -> dict[str, list[str]]:
    expansions: dict[str, list[str]] = {}
    for p in prefixes:
        hits = sorted(
            ((len(plist), t) for t, plist in index.postings.items()
             if t.startswith(p)),
            key=lambda x: (-x[0], x[1]),
        )
        if hits:
            expansions[p] = [t for _df, t in hits[:limit]]
    return expansions


def oracle_expand_prefixes(
    index: OracleIndex, query_text: str, limit: int = PREFIX_CAP
) -> str:
    """Reference rewrite for prefix (trailing-``*``) queries: each
    prefix expands to at most ``limit`` index-vocabulary terms, highest
    df first (term asc ties) — the contract the engine's
    ``expand_prefixes`` must reproduce.  Non-marker tokens pass through
    VERBATIM — use :func:`oracle_expand_query` for an executable
    (fully analyzed) rewrite."""
    toks, prefixes = split_prefix_tokens(query_text)
    if not prefixes:
        return query_text
    return rewrite_with_expansions(
        toks, _oracle_prefix_expansions(index, prefixes, limit)
    )


#: General wildcard token (Lucene WildcardQuery): word chars plus ``*``
#: (any run) / ``?`` (one char) anywhere, at least one of each of
#: wildcard and literal — the pure trailing-``*`` form is claimed by
#: the prefix machinery FIRST (its StartsWith pushes to the vocabulary
#: parquet scan; a general pattern cannot).
_WILDCARD_TOKEN = re.compile(
    r"^(?=[0-9A-Za-z*?]*[*?])(?=[*?]*[0-9A-Za-z])[0-9A-Za-z*?]+$"
)
#: Regexp term token (Lucene RegexpQuery, ES ``regexp``): ``/pattern/``
#: matched FULLY against each vocabulary term.  The engine evaluates it
#: JVM-side (`rlike`, Java regex) and the oracle with Python ``re`` —
#: the supported contract is the portable common subset (literals,
#: character classes, alternation, ``.``/``*``/``+``/``?``/``{m,n}``).
_REGEXP_TOKEN = re.compile(r"^/(.+)/$")


def wildcard_fullmatch(pattern: str, term: str) -> bool:
    """Pure-Python wildcard matcher (``*`` = any run, ``?`` = one char)
    — the oracle twin of the engine's LIKE evaluation."""
    rx = "".join(
        ".*" if c == "*" else "." if c == "?" else re.escape(c)
        for c in pattern
    )
    return re.fullmatch(rx, term) is not None


def wildcard_to_like(pattern: str) -> str:
    """Wildcard pattern → SQL LIKE pattern (vocabulary terms and
    patterns are word chars only, so no ``%``/``_`` escaping arises)."""
    return pattern.replace("*", "%").replace("?", "_")


def wildcard_literal_prefix(pattern: str) -> str:
    """Longest leading literal run — pushed as an extra StartsWith so a
    pattern like ``kuber*s`` still prunes the vocabulary scan; a
    leading-wildcard pattern yields '' (full scan, the Lucene cost)."""
    for i, c in enumerate(pattern):
        if c in "*?":
            return pattern[:i]
    return pattern


def classify_expansion_tokens(query_text: str) -> list[tuple[str, str]]:
    """Whitespace tokens → [(kind, value)]: ``prefix`` (trailing *),
    ``fuzzy`` (trailing ~), ``wildcard`` (``*``/``?`` anywhere),
    ``regexp`` (``/pattern/``), or ``plain``.  Shared by the engine and
    oracle so both classify queries identically.  Order matters: the
    pure trailing-``*`` form is a prefix (pushdown-friendly), never a
    wildcard."""
    out: list[tuple[str, str]] = []
    for tok in query_text.split():
        mp = _PREFIX_TOKEN.match(tok)
        mf = _FUZZY_TOKEN.match(tok)
        mr = _REGEXP_TOKEN.match(tok)
        if mp:
            out.append(("prefix", mp.group(1).lower()))
        elif mf:
            out.append(("fuzzy", mf.group(1).lower()))
        elif _WILDCARD_TOKEN.match(tok):
            out.append(("wildcard", tok.lower()))
        elif mr:
            out.append(("regexp", mr.group(1)))
        else:
            out.append(("plain", tok))
    return out


def has_expansion_tokens(query_text: str) -> bool:
    return any(k != "plain" for k, _ in classify_expansion_tokens(query_text))


def assemble_expanded(
    classified: list[tuple[str, str]],
    prefix_exp: dict[str, list[str]],
    fuzzy_exp: dict[str, list[str]],
    wildcard_exp: dict[str, list[str]] | None = None,
    regexp_exp: dict[str, list[str]] | None = None,
) -> str:
    """Build the EXECUTABLE rewrite: marker tokens splice in their
    vocabulary expansions (already analysis-fixed index terms), plain
    tokens run through the ordinary query analyzer ONCE.  The result is
    a fully analyzed term string — execute with ``analyzed=True`` so no
    second Porter pass can corrupt vocabulary terms (Porter is not
    idempotent: ``university → univers → univ``)."""
    out: list[str] = []
    for kind, val in classified:
        if kind == "prefix":
            out.extend(prefix_exp.get(val, []))
        elif kind == "fuzzy":
            out.extend(fuzzy_exp.get(val, []))
        elif kind == "wildcard":
            out.extend((wildcard_exp or {}).get(val, []))
        elif kind == "regexp":
            out.extend((regexp_exp or {}).get(val, []))
        else:
            out.extend(analyze_query(val))
    return " ".join(out)


def oracle_expand_synonyms(
    mapping: dict[str, list[str] | str], query_text: str
) -> str:
    """Golden synonym rewrite (engine mirror: ``CompressedIndex.
    expand_synonyms`` over ``index/synonyms.py``): analyze the mapping
    (single-term keys, flattened multi-word values, key removed), then
    splice each analyzed query term's synonyms in after it with an
    order-preserving dedupe.  Returns the analyzed term string —
    execute with ``analyzed=True``."""
    syn: dict[str, list[str]] = {}
    for raw_key, raw_vals in mapping.items():
        kt = analyze_text(raw_key)
        if len(kt) != 1:
            raise ValueError(
                f"synonym key {raw_key!r} must analyze to exactly one term"
            )
        if isinstance(raw_vals, str):
            raw_vals = [raw_vals]
        vals: list[str] = []
        for phrase in raw_vals:
            for t in analyze_text(phrase):
                if t != kt[0] and t not in vals:
                    vals.append(t)
        if vals:
            syn[kt[0]] = vals
    out: list[str] = []
    for t in analyze_query(query_text):
        if t not in out:
            out.append(t)
        for s in syn.get(t, ()):
            if s not in out:
                out.append(s)
    return " ".join(out)


def _rank_vocab_hits(
    hits: list[tuple[int, str]], limit: int
) -> list[str]:
    """(df, term) hits → capped expansion list, df desc / term asc —
    the one multi-term ordering contract (prefix/wildcard/regexp)."""
    return [t for _df, t in sorted(hits, key=lambda x: (-x[0], x[1]))[:limit]]


def _oracle_wildcard_expansions(
    index: OracleIndex, patterns: list[str], limit: int
) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for p in patterns:
        hits = [
            (len(plist), t)
            for t, plist in index.postings.items()
            if wildcard_fullmatch(p, t)
        ]
        if hits:
            out[p] = _rank_vocab_hits(hits, limit)
    return out


def _oracle_regexp_expansions(
    index: OracleIndex, patterns: list[str], limit: int
) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for p in patterns:
        rx = re.compile(p)
        hits = [
            (len(plist), t)
            for t, plist in index.postings.items()
            if rx.fullmatch(t)
        ]
        if hits:
            out[p] = _rank_vocab_hits(hits, limit)
    return out


def oracle_expand_query(
    index: OracleIndex,
    query_text: str,
    prefix_limit: int = PREFIX_CAP,
    fuzzy_limit: int = FUZZY_CAP,
) -> str | None:
    """One-pass executable rewrite of a query containing ``*``/``?``/
    ``~``/``/…/`` markers (None when it has none): vocabulary
    expansions + analyzed plain tokens — feed to
    ``oracle_topk(..., analyzed=True)``."""
    cls = classify_expansion_tokens(query_text)
    prefixes = sorted({v for k, v in cls if k == "prefix"})
    fuzzies = sorted({v for k, v in cls if k == "fuzzy"})
    wilds = sorted({v for k, v in cls if k == "wildcard"})
    rexps = sorted({v for k, v in cls if k == "regexp"})
    if not prefixes and not fuzzies and not wilds and not rexps:
        return None
    return assemble_expanded(
        cls,
        _oracle_prefix_expansions(index, prefixes, prefix_limit),
        _oracle_fuzzy_expansions(index, fuzzies, fuzzy_limit),
        _oracle_wildcard_expansions(index, wilds, prefix_limit),
        _oracle_regexp_expansions(index, rexps, prefix_limit),
    )


def oracle_facet_counts(
    index: OracleIndex,
    query_text: str,
    mode: str,
    facet: dict[DocKey, object],
    scope: set[DocKey] | None = None,
) -> dict:
    """Matching-doc counts grouped by a per-doc facet value (role, tool,
    day, …).  Docs absent from ``facet`` are dropped — the engine-side
    analog is an inner join to the metadata table."""
    out: dict = {}
    for key in oracle_matches(index, query_text, mode, scope):
        if key in facet:
            v = facet[key]
            out[v] = out.get(v, 0) + 1
    return out


def _matched_rows(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    mode: str,
) -> pd.DataFrame:
    """Transcripts rows whose (conv_id, turn_idx) is in the match set."""
    keys = oracle_matches(index, query_text, mode)
    mask = [
        (str(c), int(t)) in keys
        for c, t in zip(transcripts["conv_id"], transcripts["turn_idx"])
    ]
    return transcripts[pd.Series(mask, index=transcripts.index)]


def oracle_cardinality(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    mode: str = "disjunctive",
    col: str = "conv_id",
) -> int:
    """Golden cardinality: distinct ``col`` values among the matching
    turns — the ES cardinality-aggregation contract the engine
    reproduces exactly (pipeline/aggs.py, approx=False)."""
    hit = _matched_rows(index, transcripts, query_text, mode)
    return int(hit[col].nunique())


def oracle_match_stats(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    mode: str = "disjunctive",
    field: str = "chars",
) -> dict:
    """Golden ES ``stats`` aggregation over the match set: count, min,
    max, avg (5 dp), sum of ``chars = len(text)`` (or a numeric column)
    per matched turn (pipeline/aggs.py)."""
    hit = _matched_rows(index, transcripts, query_text, mode)
    vals = hit["text"].str.len() if field == "chars" else hit[field]
    if len(vals) == 0:
        return {"count": 0, "min": None, "max": None, "avg": None, "sum": None}
    return {
        "count": int(len(vals)),
        "min": int(vals.min()),
        "max": int(vals.max()),
        "avg": round(float(vals.mean()), 5),
        "sum": int(vals.sum()),
    }


def _round5(x: float) -> float:
    """The cross-engine rounding contract (functions.rnd): nudge by the
    shared epsilon, then round at 5 dp — identical arithmetic to the
    Spark side, so oracle and engine agree bit-for-bit."""
    return round(float(x) + 1e-9, 5)


def oracle_extended_stats(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    mode: str = "disjunctive",
    field: str = "chars",
) -> dict:
    """Golden ES ``extended_stats``: ``oracle_match_stats`` plus sum_sq
    and POPULATION variance / std deviation, derived from the exact
    integer sums exactly as pipeline/aggs.extended_stats does
    (``sum_sq/n - (sum/n)^2`` in IEEE doubles), so the float is
    reproducible across engines."""
    s = oracle_match_stats(index, transcripts, query_text, mode, field)
    hit = _matched_rows(index, transcripts, query_text, mode)
    vals = hit["text"].str.len() if field == "chars" else hit[field]
    ints = [int(v) for v in vals]
    if not ints:
        return {**s, "sum_sq": 0, "variance": None, "std_dev": None}
    sum_sq = sum(v * v for v in ints)
    n = float(len(ints))
    var = sum_sq / n - (sum(ints) / n) * (sum(ints) / n)
    return {
        **s,
        "sum_sq": sum_sq,
        "variance": _round5(var),
        "std_dev": _round5(math.sqrt(var)),
    }


def oracle_percentiles(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    mode: str = "disjunctive",
    field: str = "chars",
    percents: tuple = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0),
) -> dict:
    """Golden ES ``percentiles``: exact linear interpolation at rank
    ``p·(n-1)`` over the sorted matched values — the formula is written
    out (``(hi-pos)·v[lo] + (pos-lo)·v[hi]``, Spark SQL ``percentile``'s
    exact arithmetic) rather than delegated to numpy so both engines
    produce the identical IEEE double.  Keys are the engine's column
    names (p50, p99_9, …)."""

    def _name(p) -> str:
        s = f"{float(p):g}".replace(".", "_").replace("-", "m")
        return f"p{s}"

    hit = _matched_rows(index, transcripts, query_text, mode)
    vals = sorted(
        int(v) for v in (hit["text"].str.len() if field == "chars" else hit[field])
    )
    out: dict = {}
    for p in percents:
        if not vals:
            out[_name(p)] = None
            continue
        pos = (float(p) / 100.0) * (len(vals) - 1)
        lo, hi = math.floor(pos), math.ceil(pos)
        if lo == hi:
            q = float(vals[lo])
        else:
            q = (hi - pos) * vals[lo] + (pos - lo) * vals[hi]
        out[_name(p)] = _round5(q)
    return out


def oracle_stats_by(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    mode: str = "disjunctive",
    bucket_col: str = "role",
    field: str = "chars",
) -> list[dict]:
    """Golden ES ``terms`` + ``stats`` sub-aggregation: per-bucket
    count/min/max/avg/sum of ``field`` across the match set, buckets
    sorted, min_doc_count=1 (pipeline/aggs.stats_by)."""
    hit = _matched_rows(index, transcripts, query_text, mode)
    vals = hit["text"].str.len() if field == "chars" else hit[field]
    rows = []
    frame = pd.DataFrame({"bucket": hit[bucket_col].values, "v": vals.values})
    for bucket, grp in sorted(frame.groupby("bucket"), key=lambda kv: str(kv[0])):
        ints = [int(v) for v in grp["v"]]
        rows.append(
            {
                "bucket": str(bucket),
                "count": len(ints),
                "min": min(ints),
                "max": max(ints),
                "avg": _round5(sum(ints) / len(ints)),
                "sum": sum(ints),
            }
        )
    return rows


def _field_ints(hit: pd.DataFrame, field: str) -> list[int]:
    """Matched rows' numeric field as exact ints (pipeline/aggs._FIELDS)."""
    vals = hit["text"].str.len() if field == "chars" else hit[field]
    return [int(v) for v in vals]


def oracle_value_histogram(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    mode: str = "disjunctive",
    field: str = "chars",
    interval: int = 100,
    min_doc_count: int = 0,
) -> list[dict]:
    """Golden ES numeric ``histogram``: fixed-interval buckets of the
    matched values, gap-filled between the observed extremes when
    ``min_doc_count=0`` (pipeline/aggs.value_histogram).  Bucket key is
    the exact integer ``v - (v mod interval)`` with a nonnegative mod —
    the same floor multiple for any sign."""
    hit = _matched_rows(index, transcripts, query_text, mode)
    counts: dict[int, int] = {}
    for v in _field_ints(hit, field):
        key = v - (v % interval)  # Python % is nonnegative for interval>0
        counts[key] = counts.get(key, 0) + 1
    if not counts:
        return []
    if min_doc_count == 1:
        keys = sorted(counts)
    else:
        keys = list(range(min(counts), max(counts) + 1, interval))
    return [{"bucket": k, "n": counts.get(k, 0)} for k in keys]


def oracle_range_agg(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    ranges: list,
    mode: str = "disjunctive",
    field: str = "chars",
) -> list[dict]:
    """Golden ES ``range`` aggregation: one row per requested range in
    request order — ``from`` inclusive, ``to`` exclusive, open ends,
    overlaps counted in every containing range, empty buckets kept
    (pipeline/aggs.range_agg)."""
    hit = _matched_rows(index, transcripts, query_text, mode)
    vals = _field_ints(hit, field)
    rows = []
    for i, (lo, hi) in enumerate(ranges):
        fmt = lambda v: "*" if v is None else f"{v:g}"  # noqa: E731
        n = sum(
            1
            for v in vals
            if (lo is None or v >= lo) and (hi is None or v < hi)
        )
        rows.append({"idx": i, "key": f"{fmt(lo)}-{fmt(hi)}", "n": n})
    return rows


def oracle_composite_agg(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    sources: tuple = ("role",),
    size: int = 10,
    after: tuple | None = None,
    mode: str = "disjunctive",
) -> list[dict]:
    """Golden ES ``composite`` aggregation: ascending-key buckets over
    the match set, strictly after the exclusive ``after`` tuple, first
    ``size`` rows; null source values drop the row (missing_bucket
    false) — pipeline/aggs.composite_agg."""
    hit = _matched_rows(index, transcripts, query_text, mode)
    counts: dict[tuple, int] = {}
    for _, row in hit.iterrows():
        key = tuple(row[c] for c in sources)
        if any(pd.isna(v) for v in key):
            continue
        key = tuple(str(v) if isinstance(v, str) else v for v in key)
        counts[key] = counts.get(key, 0) + 1
    keys = sorted(counts)
    if after is not None:
        keys = [k for k in keys if k > tuple(after)]
    return [
        {**{c: k[i] for i, c in enumerate(sources)}, "n": counts[k]}
        for k in keys[:size]
    ]



def oracle_rank_eval(
    index: OracleIndex,
    queries: list[tuple[str, str]],
    judgment_rows: list[tuple[int, str, int, int]],
    k: int = 10,
) -> list[dict]:
    """Golden ES ``_rank_eval``: precision@k / recall@k / MRR / NDCG@k
    per query, computed over the pure-Python scorer's rankings with the
    exponential-gain DCG and unjudged-hits-count-as-0 semantics of
    pipeline/rankeval.rank_eval.  ``judgment_rows`` is
    (query_id, conv_id, turn_idx, rating)."""
    out = []
    for qid, (qt, mode) in enumerate(queries):
        ranked = [key for key, _ in oracle_topk(index, qt, mode, k)]
        judged = {
            (c, t): r for (q, c, t, r) in judgment_rows if q == qid
        }
        rel_retrieved = sum(1 for d in ranked if judged.get(d, 0) > 0)
        n_relevant = sum(1 for r in judged.values() if r > 0)
        mrr = 0.0
        for i, d in enumerate(ranked):
            if judged.get(d, 0) > 0:
                mrr = 1.0 / (i + 1)
                break
        dcg = sum(
            (2 ** judged.get(d, 0) - 1) / math.log2(i + 2)
            for i, d in enumerate(ranked)
        )
        ideal = sorted((r for r in judged.values() if r > 0), reverse=True)[:k]
        idcg = sum((2**r - 1) / math.log2(i + 2) for i, r in enumerate(ideal))
        out.append(
            {
                "query_id": qid,
                "precision_at_k": rel_retrieved / len(ranked) if ranked else 0.0,
                "recall_at_k": rel_retrieved / n_relevant if n_relevant else 0.0,
                "mrr": mrr,
                "ndcg": dcg / idcg if idcg > 0 else 0.0,
                "n_retrieved": len(ranked),
                "n_relevant": n_relevant,
            }
        )
    return out


def _fold_dot(a: list[float], b: list[float]) -> float:
    """Left-fold dot product — mirrors the engine's F.aggregate
    summation order exactly so near-tie cosine ranks cannot diverge
    by floating-point association."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def oracle_semantic_topk(
    index: OracleIndex,
    query_vec: list[float],
    depth: int,
    dim: int = 64,
    scope: set[DocKey] | None = None,
    candidates: set[DocKey] | None = None,
) -> list[tuple[DocKey, float]]:
    """Golden cosine top-`depth` over the hashing-trick embeddings of
    every doc (pipeline/hybrid.embed_tokens — the SAME shared kernel
    the engine's hash_embed uses, so the vectors are bit-identical).
    Zero-norm docs are excluded, ties break by doc key ascending.
    ``scope`` restricts candidates BEFORE ranking (filtered-kNN);
    ``candidates`` restricts to an explicit key set (the ANN-probe
    twin: pass :func:`oracle_ann_candidates`)."""
    from .pipeline.hybrid import embed_tokens

    scored = []
    for key, toks in index.tokens.items():
        if scope is not None and key not in scope:
            continue
        if candidates is not None and key not in candidates:
            continue
        v = embed_tokens(toks, dim)
        n = math.sqrt(_fold_dot(v, v))
        if n > 0.0:
            scored.append((key, _fold_dot(v, query_vec) / n))
    scored.sort(key=lambda kv: (-kv[1], kv[0]))
    return scored[:depth]


def oracle_hybrid_conversations(
    index: OracleIndex,
    query_text: str,
    k: int = 10,
    depth: int = 50,
    rrf_k: int = 60,
    w_lex: float = 1.0,
    w_sem: float = 1.0,
    mode: str = "disjunctive",
    dim: int = 64,
) -> list[tuple[str, float]]:
    """Golden conversation-level hybrid: the collapsed BM25 list
    (oracle_topk_conversations) RRF-fused with cosine over mean-pooled
    conversation embeddings (the SAME shared pool_vectors over the
    SAME shared embed_tokens, turn-ordered)."""
    from .pipeline.hybrid import embed_query, embed_tokens, pool_vectors

    qv = embed_query(query_text, dim)
    lists: list[list[tuple[str, float]]] = [
        [(key[0], s) for key, s in
         oracle_topk_conversations(index, query_text, mode, depth)]
    ]
    weights = [w_lex]
    if any(v != 0.0 for v in qv):
        by_conv: dict[str, list[tuple[int, list[float]]]] = {}
        for (conv, turn), toks in index.tokens.items():
            by_conv.setdefault(conv, []).append((turn, embed_tokens(toks, dim)))
        scored = []
        for conv, items in by_conv.items():
            v = pool_vectors([vec for _t, vec in sorted(items)])
            n = math.sqrt(_fold_dot(v, v))
            if n > 0.0:
                scored.append((conv, _fold_dot(v, qv) / n))
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        lists.append(scored[:depth])
        weights.append(w_sem)
    fused: dict[str, float] = {}
    for ranked, w in zip(lists, weights):
        for i, (conv, _s) in enumerate(ranked):
            fused[conv] = fused.get(conv, 0.0) + w / (rrf_k + (i + 1))
    return sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def oracle_quantized_semantic_topk(
    index: OracleIndex,
    query_vec: list[float],
    depth: int,
    dim: int = 64,
    oversample: int = 3,
) -> list[tuple[DocKey, float]]:
    """Golden int8-quantized semantic top-k with exact rerank: the
    integer-dot approximate ranking (same expression shape as the
    engine's JVM math: idot/(qnorm·qqnorm)) picks oversample·depth
    candidates, then the exact cosine (oracle_semantic_topk over the
    candidate set) ranks the final depth."""
    from .pipeline.hybrid import embed_tokens, quantize_vec

    qq, _ = quantize_vec(query_vec)
    qq_norm = math.sqrt(sum(x * x for x in qq)) or 1.0
    approx = []
    for key, toks in index.tokens.items():
        q, _s = quantize_vec(embed_tokens(toks, dim))
        qnorm = math.sqrt(float(sum(x * x for x in q)))
        if qnorm > 0.0:
            idot = float(sum(a * b for a, b in zip(q, qq)))
            approx.append((key, idot / (qnorm * qq_norm)))
    approx.sort(key=lambda kv: (-kv[1], kv[0]))
    cands = {key for key, _ in approx[: depth * oversample]}
    return oracle_semantic_topk(index, query_vec, depth, dim, candidates=cands)


def oracle_ann_candidates(
    index: OracleIndex,
    query_vec: list[float],
    dim: int = 64,
    bits: int = 4,
    tables: int = 8,
    seed: int = 42,
) -> set[DocKey]:
    """The doc keys an LSH ANN probe would consider: per table, the
    docs whose sign-bit bucket equals the query's.  Uses the SAME
    hyperplane generator and embedder as the engine (structural
    parity); the per-doc math is plain np.dot, independent of the
    kernel's batched matmul."""
    import numpy as np

    from .pipeline.hybrid import embed_tokens
    from .pipeline.similarity import hyperplanes

    planes = [hyperplanes(dim, bits, seed + t) for t in range(tables)]
    qb = [
        sum(2**i for i, row in enumerate(p) if float(np.dot(row, query_vec)) >= 0.0)
        for p in planes
    ]
    out: set[DocKey] = set()
    for key, toks in index.tokens.items():
        v = embed_tokens(toks, dim)
        if not any(x != 0.0 for x in v):
            continue
        for t, p in enumerate(planes):
            b = sum(2**i for i, row in enumerate(p) if float(np.dot(row, v)) >= 0.0)
            if b == qb[t]:
                out.add(key)
                break
    return out


def oracle_hybrid_topk(
    index: OracleIndex,
    query_text: str,
    k: int = 10,
    depth: int = 50,
    method: str = "rrf",
    rrf_k: int = 60,
    w_lex: float = 1.0,
    w_sem: float = 1.0,
    mode: str = "disjunctive",
    dim: int = 64,
    scope: set[DocKey] | None = None,
    ann_candidates: set[DocKey] | None = None,
) -> list[tuple[DocKey, float]]:
    """Golden hybrid retrieval: BM25 (oracle_topk, rank-identical to
    the engine) ∪ hashing-trick cosine (oracle_semantic_topk), fused by
    RRF (Σ w/(rrf_k + rank)) or min-max linear (Σ w·norm / Σ w,
    missing-from-list = 0, constant list → 1.0) — the exact semantics
    of pipeline/hybrid.hybrid_topk.  ``scope`` filters both legs;
    ``ann_candidates`` (from :func:`oracle_ann_candidates`) restricts
    the semantic leg to the ANN probe's key set."""
    from .pipeline.hybrid import embed_query

    qv = embed_query(query_text, dim)
    lists: list[list[tuple[DocKey, float]]] = []
    weights: list[float] = []
    lists.append(oracle_topk(index, query_text, mode, depth, scope=scope))
    weights.append(w_lex)
    if any(v != 0.0 for v in qv):
        lists.append(
            oracle_semantic_topk(
                index, qv, depth, dim, scope=scope, candidates=ann_candidates
            )
        )
        weights.append(w_sem)
    fused: dict[DocKey, float] = {}
    if method == "rrf":
        for ranked, w in zip(lists, weights):
            for i, (key, _s) in enumerate(ranked):
                fused[key] = fused.get(key, 0.0) + w / (rrf_k + (i + 1))
    elif method == "linear":
        total_w = sum(weights)
        for ranked, w in zip(lists, weights):
            if not ranked:
                continue
            scores = [s for _k2, s in ranked]
            lo, hi = min(scores), max(scores)
            for key, s in ranked:
                norm = (s - lo) / (hi - lo) if hi > lo else 1.0
                fused[key] = fused.get(key, 0.0) + w * norm
        fused = {key: s / total_w for key, s in fused.items()}
    else:
        raise ValueError(f"unknown fusion method {method!r}")
    out = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
    return out[:k]


def oracle_term_vectors(
    index: OracleIndex, conv_id: str, turn_idx: int
) -> list[tuple]:
    """Golden ES ``_termvectors``: (term, tf, positions_csv, df, idf,
    doc_count) per distinct analyzed term of one doc, term-ordered.
    tf/positions come from the oracle's OWN posting lists (built by its
    own indexing loop, independent of the operator's re-analysis path);
    df/idf/doc_count are its corpus stats."""
    key = (str(conv_id), int(turn_idx))
    out = []
    for t in sorted(set(index.tokens.get(key, []))):
        plist = index.postings.get(t, [])
        f, ps = next((f, ps) for (k, f, ps) in plist if k == key)
        out.append(
            (t, f, ",".join(str(p) for p in ps), len(plist), index.idf(t), index.n_docs)
        )
    return out


def golden_stats(index: OracleIndex) -> dict:
    return {
        "n_docs": index.n_docs,
        "avgdl": index.avgdl,
        "n_terms": len(index.postings),
        "n_postings": sum(len(v) for v in index.postings.values()),
    }


# -- unified query strings (ES query_string / Lucene bool query) ------

def _oracle_qs_expansions(index: OracleIndex, parsed) -> dict:
    """Marker-clause expansions for one parsed query string, keyed
    (kind, value) — the oracle face of the engine's per-kind vocabulary
    scans (same rank/cap contracts as the standalone expansion modes)."""
    from .boolquery import marker_values

    vals = marker_values(parsed.clauses)
    out: dict[tuple[str, str], list[str]] = {}
    for kind, fn, cap in (
        ("prefix", _oracle_prefix_expansions, PREFIX_CAP),
        ("wildcard", _oracle_wildcard_expansions, PREFIX_CAP),
        ("regexp", _oracle_regexp_expansions, PREFIX_CAP),
        ("fuzzy", _oracle_fuzzy_expansions, FUZZY_CAP),
    ):
        for v, terms in fn(index, vals.get(kind, []), cap).items():
            out[(kind, v)] = terms
    return out


def _oracle_group_docs(index: OracleIndex, group) -> set:
    docs: set[DocKey] = set()
    for t in group:
        docs.update(key for key, _f, _p in index.postings.get(t, ()))
    return docs


def _oracle_bool_docs(index: OracleIndex, bc) -> set:
    """Candidate set of a resolved bool query — set algebra over the
    same per-clause match sets the engine's kernel computes with numpy
    (must ∩ … ∩ should≥m − must_not…)."""
    must_sets = [_oracle_group_docs(index, g) for g in bc.must_groups]
    must_sets += [
        _phrase_match_docs(index, list(terms), slop)
        for terms, slop in bc.must_phrases
    ]
    cand: set[DocKey] | None = None
    for s in must_sets:
        cand = s if cand is None else cand & s
    if bc.min_should >= 1:
        counts: dict[DocKey, int] = {}
        should_sets = [_oracle_group_docs(index, g) for g in bc.should_groups]
        should_sets += [
            _phrase_match_docs(index, list(terms), slop)
            for terms, slop in bc.should_phrases
        ]
        for s in should_sets:
            for key in s:
                counts[key] = counts.get(key, 0) + 1
        sh = {key for key, n in counts.items() if n >= bc.min_should}
        cand = sh if cand is None else cand & sh
    assert cand is not None  # resolver guarantees must or min_should>=1
    for g in bc.not_groups:
        cand -= _oracle_group_docs(index, g)
    for terms, slop in bc.not_phrases:
        cand -= _phrase_match_docs(index, list(terms), slop)
    return cand


def qs_filter_keys(transcripts: pd.DataFrame, filters) -> set:
    """Field filters → matching (conv_id, turn_idx) keys, with the
    missing-value contract both sides pin: a NULL field never equals a
    positive filter value and always passes a negated one (the engine's
    ``eqNullSafe`` mirror)."""
    import operator as _op

    ops = {
        ">=": _op.ge, "<=": _op.le, ">": _op.gt, "<": _op.lt,
    }
    mask = pd.Series(True, index=transcripts.index)
    for f in filters:
        col = transcripts[f.field]
        if getattr(f, "op", "eq") == "eq":
            hit = (col == f.value).fillna(False)
        else:
            val = (
                pd.Timestamp(f.value) if f.field == "ts" else int(f.value)
            )
            hit = ops[f.op](col, val).fillna(False)
        mask &= ~hit if f.negated else hit
    sub = transcripts[mask]
    return {
        (str(c), int(t))
        for c, t in zip(sub["conv_id"], sub["turn_idx"])
    }


def oracle_query_string(
    index: OracleIndex,
    query_text: str,
    k: int = 10,
    transcripts: pd.DataFrame | None = None,
    min_should_match: int | None = None,
    scope: set | None = None,
    after: tuple | None = None,
) -> list[tuple[DocKey, float]]:
    """Golden top-k for a unified query string (``boolquery`` grammar:
    +must / -must_not / should, phrases with slop, field filters,
    expansion markers, ^boosts).  ``transcripts`` is required when the
    query carries ``field:value`` filters (they resolve against the
    corpus metadata); an explicit ``scope`` intersects on top."""
    from .boolquery import parse_query_string, resolve_query_string

    parsed = parse_query_string(query_text)
    if parsed.filters and transcripts is None:
        raise ValueError(
            f"query string {query_text!r} has field filters; "
            "pass the transcripts frame to resolve them"
        )
    res = resolve_query_string(
        parsed, _oracle_qs_expansions(index, parsed), min_should_match
    )
    docs = _oracle_bool_docs(index, res.clauses)
    if parsed.filters:
        docs &= qs_filter_keys(transcripts, parsed.filters)
    if scope is not None:
        docs &= scope
    scores = _score_candidates(
        index, list(res.clauses.positive_terms), docs, res.weights
    )
    return _finish(scores, k, after)


def oracle_query_string_count(
    index: OracleIndex,
    query_text: str,
    transcripts: pd.DataFrame | None = None,
    min_should_match: int | None = None,
    scope: set | None = None,
) -> int:
    """Matching-doc count (totalResults) for a unified query string —
    the candidate set top-k draws from, BEFORE the score>0 cut (a
    candidate all of whose scoring terms were dropped still counts,
    matching the engine's match_count contract)."""
    from .boolquery import parse_query_string, resolve_query_string

    parsed = parse_query_string(query_text)
    if parsed.filters and transcripts is None:
        raise ValueError(
            f"query string {query_text!r} has field filters; "
            "pass the transcripts frame to resolve them"
        )
    res = resolve_query_string(
        parsed, _oracle_qs_expansions(index, parsed), min_should_match
    )
    docs = _oracle_bool_docs(index, res.clauses)
    if parsed.filters:
        docs &= qs_filter_keys(transcripts, parsed.filters)
    if scope is not None:
        docs &= scope
    return len(docs)


def oracle_multi_terms(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    fields: tuple = ("role", "tool"),
    n: int = 10,
    mode: str = "disjunctive",
) -> list[tuple]:
    """Golden ES multi_terms: composite-key counts over the match set,
    rows skipped when ANY key field is missing, ranked (n desc, key
    asc), top n — matches ``pipeline.aggs.multi_terms``."""
    docs = oracle_matches(index, query_text, mode)
    counts: dict[tuple, int] = {}
    cols = [transcripts[c] for c in fields]
    for c, t, *vals in zip(
        transcripts["conv_id"], transcripts["turn_idx"], *cols
    ):
        if (str(c), int(t)) not in docs:
            continue
        if any(v is None or pd.isna(v) for v in vals):
            continue
        key = tuple(str(v) for v in vals)
        counts[key] = counts.get(key, 0) + 1
    rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:n]
    return [(*k, v) for k, v in rows]


def oracle_top_metrics_by(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    bucket_col: str = "role",
    sort_field: str = "ts",
    metric_field: str = "turn_idx",
    mode: str = "disjunctive",
) -> list[tuple]:
    """Golden ES top_metrics-per-bucket: per ``bucket_col`` value of the
    match set, (top_sort, top_metric) = the max (sort, metric) TUPLE
    (ties on sort break by metric — the engine's struct-max contract),
    rows with a missing bucket or sort skipped, ordered by bucket —
    matches ``pipeline.aggs.top_metrics_by``."""
    docs = oracle_matches(index, query_text, mode)
    best: dict[str, tuple] = {}
    for c, t, b, s, m in zip(
        transcripts["conv_id"],
        transcripts["turn_idx"],
        transcripts[bucket_col],
        transcripts[sort_field],
        transcripts[metric_field],
    ):
        if (str(c), int(t)) not in docs:
            continue
        if b is None or pd.isna(b) or s is None or pd.isna(s):
            continue
        cand = (s, m)
        cur = best.get(str(b))
        if cur is None or cand > cur:
            best[str(b)] = cand
    return [(b, *best[b]) for b in sorted(best)]


def oracle_date_histogram_buckets(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    mode: str = "disjunctive",
    interval: str = "hour",
    lag: int = 1,
    min_n: int | None = None,
    sort: str = "bucket",
    descending: bool = False,
    limit: int | None = None,
    min_doc_count: int = 1,
) -> list[tuple]:
    """Golden serial_diff + bucket_selector + bucket_sort over the date
    histogram: (bucket, n, serial_diff·None-for-first-lag) computed on
    the full ascending sequence, THEN filtered by ``n >= min_n``, THEN
    sorted by ``sort`` (NULLs last, ties by bucket asc) and truncated —
    matches ``pipeline.histogram.date_histogram_buckets``."""
    rows = [
        (b, n)
        for b, n in oracle_date_histogram(index, transcripts, query_text, mode, interval)
        if b is not None
    ]
    if min_doc_count == 0 and rows:
        freq = {
            "minute": "min", "hour": "h", "day": "D",
            "week": "W-MON", "month": "MS", "year": "YS",
        }[interval]
        grid = pd.date_range(rows[0][0], rows[-1][0], freq=freq)
        have = dict(rows)
        rows = [(b, int(have.get(b, 0))) for b in grid]
    out = [
        (b, n, None if i < lag else n - rows[i - lag][1])
        for i, (b, n) in enumerate(rows)
    ]
    if min_n is not None:
        out = [r for r in out if r[1] >= min_n]
    idx = {"bucket": 0, "n": 1, "serial_diff": 2}[sort]
    out.sort(
        key=lambda r: (
            r[idx] is None,
            (-1 if descending else 1)
            * (r[idx].value if isinstance(r[idx], pd.Timestamp) else (r[idx] or 0)),
            r[0],
        )
    )
    return out[:limit] if limit is not None else out


def oracle_rare_terms(
    index: OracleIndex,
    query_text: str,
    mode: str = "disjunctive",
    max_doc_count: int = 1,
    include_query_terms: bool = False,
    limit: int | None = None,
) -> list[tuple[str, int]]:
    """Golden ES rare_terms over the match set: (term, fg) for every
    term in at most ``max_doc_count`` matched turns, query terms
    excluded by default, ordered (fg asc, term asc) — matches
    ``pipeline.significant.rare_terms``."""
    docs = oracle_matches(index, query_text, mode)
    fg: dict[str, int] = {}
    for d in docs:
        for t in set(index.tokens.get(d, ())):
            fg[t] = fg.get(t, 0) + 1
    qterms: set[str] = set()
    if not include_query_terms:
        if mode == "phrase":
            m = PHRASE_PATTERN.search(query_text)
            qterms = set(analyze_text(m.group(1) if m else query_text))
        elif mode == "boolean":
            qterms = {
                t for p in PHRASE_PATTERN.findall(query_text) for t in analyze_text(p)
            }
        else:
            qterms = set(analyze_query(query_text))
    rows = [
        (t, f)
        for t, f in fg.items()
        if f <= max_doc_count and t not in qterms
    ]
    rows.sort(key=lambda r: (r[1], r[0]))
    return rows[:limit] if limit is not None else rows


def _fs_modifier(v: float, modifier: str) -> float:
    if modifier == "none":
        return v
    if modifier == "log1p":
        return math.log10(1.0 + v)
    if modifier == "ln1p":
        return math.log1p(v)
    if modifier == "sqrt":
        return math.sqrt(v)
    if modifier == "square":
        return v * v
    if modifier == "reciprocal":
        # IEEE 1/0 = +Infinity (the engine's when-guard equivalent)
        return math.inf if v == 0.0 else 1.0 / v
    raise ValueError(f"unknown modifier {modifier!r}")


def oracle_function_score_topk(
    index: OracleIndex,
    transcripts: pd.DataFrame,
    query_text: str,
    functions: list[dict],
    mode: str = "disjunctive",
    k: int = 10,
    score_mode: str = "multiply",
    boost_mode: str = "multiply",
) -> list[tuple[DocKey, float, float]]:
    """Golden function_score: EVERY match's BM25 score shaped by the
    identical function expressions (field_value_factor / weight /
    deterministic md5 random_score), combined per score_mode/boost_mode,
    re-ranked, cut to k — matches
    ``operators.function_score.function_score_topk``.  The md5 uniform
    is float(int(md5(conv:turn:seed)[:15], 16)) / 16**15 — float() FIRST
    so the rounding matches the engine's string→double cast."""
    import hashlib

    field_maps: dict[str, dict] = {}
    for fn in functions:
        if fn.get("kind") == "field_value_factor":
            f = fn["field"]
            if f not in field_maps:
                field_maps[f] = {
                    (str(c), int(t)): v
                    for c, t, v in zip(
                        transcripts["conv_id"],
                        transcripts["turn_idx"],
                        transcripts[f],
                    )
                }

    def fn_val(key: DocKey, fn: dict) -> float:
        kind = fn.get("kind")
        if kind == "weight":
            return float(fn["weight"])
        if kind == "random_score":
            seed = str(fn.get("seed", "0"))
            h = hashlib.md5(
                f"{key[0]}:{key[1]}:{seed}".encode()
            ).hexdigest()[:15]
            return float(int(h, 16)) / float(16 ** 15)
        field = fn["field"]
        v = field_maps[field].get(key)
        missing = float(fn.get("missing", 1.0))
        base = (
            missing
            if v is None or pd.isna(v)
            else float(v)
        ) * float(fn.get("factor", 1.0))
        return _fs_modifier(base, fn.get("modifier", "none"))

    def combine(vals: list[float]) -> float:
        if score_mode == "multiply":
            out = 1.0
            for v in vals:
                out *= v
            return out
        if score_mode == "sum":
            return sum(vals)
        if score_mode == "max":
            return max(vals)
        if score_mode == "min":
            return min(vals)
        if score_mode == "avg":
            return sum(vals) / float(len(vals))
        raise ValueError(f"unknown score_mode {score_mode!r}")

    out = []
    for key, score in oracle_topk(index, query_text, mode, 1 << 62):
        c = combine([fn_val(key, fn) for fn in functions])
        if boost_mode == "multiply":
            final = score * c
        elif boost_mode == "sum":
            final = score + c
        elif boost_mode == "replace":
            final = c
        else:
            raise ValueError(f"unknown boost_mode {boost_mode!r}")
        out.append((key, score, final))
    out.sort(key=lambda r: (-r[2], r[0][0], r[0][1]))
    return out[:k]


def oracle_collapse_inner_hits(
    index: OracleIndex,
    query_text: str,
    mode: str = "disjunctive",
    k: int = 10,
    inner_n: int = 3,
    scope: set[DocKey] | None = None,
    analyzed: bool = False,
) -> list[tuple[str, float, int, int, float]]:
    """Golden collapse + inner_hits: the top-k collapsed conversations
    (oracle_topk_conversations ranking) each expanded to its top-
    ``inner_n`` matching turns (score desc, turn asc), 1-based
    hit_rank — (conv_id, conv_score, hit_rank, turn_idx, score) ordered
    (conv_score desc, conv_id, hit_rank).  Matches
    ``operators.innerhits.collapse_inner_hits``; row hit_rank=1 is the
    collapse representative by construction (identical tie-break)."""
    tops = oracle_topk_conversations(index, query_text, mode, k, scope, analyzed)
    by_conv: dict[str, list[tuple[int, float]]] = {}
    for (conv, turn), score in oracle_topk(
        index, query_text, mode, 1 << 62, scope, analyzed
    ):
        by_conv.setdefault(conv, []).append((turn, score))
    out = []
    for (conv, _turn), conv_score in tops:
        hits = sorted(by_conv[conv], key=lambda ts: (-ts[1], ts[0]))[:inner_n]
        for r, (turn, score) in enumerate(hits, 1):
            out.append((conv, conv_score, r, turn, score))
    return out
