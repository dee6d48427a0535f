"""Unified query-string parsing — the ES ``query_string`` / Lucene
``BooleanQuery`` surface, SHARED by the Spark engine and the pure-Python
oracle.

One string composes every query primitive the engine already serves::

    +kubernetes "pod evict"~1 -role:system error^2 time* latenc~

Grammar (whitespace-separated clauses; ``"..."`` groups a phrase):

* occurrence prefix — ``+`` MUST, ``-`` MUST_NOT, none SHOULD
  (Lucene ``BooleanClause.Occur``);
* ``field:value`` with field ∈ {role, tool, conv_id} — a FILTER-context
  clause (Lucene filter semantics: restricts results, never affects
  scores); ``-field:value`` excludes.  ES ``term`` filter on keyword
  metadata;
* ``"a b c"`` — positional phrase, optional ``~N`` ordered-slop suffix
  (the engine's existing phrase contract);
* ``(a b c)`` — alternatives group: ONE clause matching ANY of its
  terms (Lucene ``+(error failure)`` grouping; flat plain terms only —
  markers, filters, and nesting inside a group are rejected loudly);
  optional ``^w`` boost applies to every alternative;
* term markers, identical to the standalone expansion modes: trailing
  ``*`` prefix, ``*``/``?`` anywhere wildcard, ``/re/`` regexp,
  trailing ``~`` fuzzy (edit distance ≤ 1 — higher distances are
  rejected loudly, they are not implemented anywhere in the engine);
* ``^w`` boost suffix on term clauses (multiplies each resolved term's
  idf; largest wins on a term collision — the engine's standing boost
  rule).  Phrase boosts are rejected loudly rather than ignored.

Semantics (the ES ``bool`` query contract):

* a document must match EVERY must clause, NO must_not clause, and at
  least ``minimum_should_match`` should clauses — which defaults to 1
  when there are no must clauses and 0 otherwise.  (ES also lets a
  bare filter suppress the should requirement; we deliberately do NOT —
  ``role:user term1`` requiring zero term matches would make the match
  set "every user turn", an unbounded zero-score result at corpus
  scale.  Deviation documented here and pinned by tests.)
* a term clause that ANALYZES to several index terms (``object.method``)
  or EXPANDS to several vocabulary terms (``time*``) matches a doc when
  ANY of them is present (the ES default-OR within a clause; Lucene
  multi-term rewrite);
* a clause that analyzes to NOTHING (pure stopwords) drops out — the
  Lucene analyzer contract; a MARKER clause that expands to nothing
  stays as an impossible clause (``+zzz*`` matches no documents —
  Lucene ``MatchNoDocsQuery``), should/not forms of it are no-ops;
* scoring: BM25 summed over the doc's matching POSITIVE terms in
  lexicographic order (the engine's standing summation contract);
  must_not terms never score; filters never score.

Scale shape: candidate resolution is per-group vectorized set algebra
over the same posting arrays every other mode decodes — the must
intersection is bounded by the rarest must clause, and the whole query
still runs as ONE grouped kernel over a bucket-pruned postings scan
(no new shuffles vs the disjunctive path).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .textproc import analyze_query, analyze_text

FILTER_FIELDS = ("role", "tool", "conv_id")
RANGE_FIELDS = ("ts", "turn_idx")

_FIELD_TOKEN = re.compile(rf"^({'|'.join(FILTER_FIELDS)}):(\S+)$")
_RANGE_TOKEN = re.compile(rf"^({'|'.join(RANGE_FIELDS)})(>=|<=|>|<)(\S+)$")
_BOOST_SUFFIX = re.compile(r"^(.*[^^])\^(\d+(?:\.\d+)?)$")
_BAD_FUZZY = re.compile(r"^\S+~(\d+)$")
#: lexer: an optional +/- prefix, then a quoted phrase (optional ~slop),
#: a parenthesized alternatives group (optional ^boost), or a bare
#: token; anything else (an unbalanced quote/paren) fails loud.
_LEX = re.compile(
    r'([+-]?)(?:"([^"]*)"(?:~(\d+)|\^(\d+(?:\.\d+)?))?'
    r'|\(([^()"]*)\)(?:\^(\d+(?:\.\d+)?))?'
    r'|([^\s"()]+))'
)


@dataclass(frozen=True)
class QSClause:
    occur: str  # "must" | "should" | "not"
    kind: str  # "term" | "group" | "phrase"
    value: str  # raw term token (boost stripped), group body, or phrase body
    boost: float | None = None
    slop: int = 0  # phrase clauses only
    marker: str | None = None  # term clauses: prefix|wildcard|fuzzy|regexp


@dataclass(frozen=True)
class QSFilter:
    field: str
    value: str
    negated: bool
    #: "eq" (role/tool/conv_id equality) or a range comparator over the
    #: ordered fields (ts — ISO date/datetime, T-separated; turn_idx)
    op: str = "eq"


@dataclass(frozen=True)
class ParsedQS:
    clauses: tuple[QSClause, ...]
    filters: tuple[QSFilter, ...]


#: Resolved, kernel-ready form — everything is analyzed/expanded index
#: terms.  Tuples throughout: the object pickles into the Arrow-kernel
#: closure.  A "group" is one clause's term alternatives (any-of).
@dataclass(frozen=True)
class BoolClauses:
    must_groups: tuple[tuple[str, ...], ...]
    should_groups: tuple[tuple[str, ...], ...]
    not_groups: tuple[tuple[str, ...], ...]
    must_phrases: tuple[tuple[tuple[str, ...], int], ...]
    should_phrases: tuple[tuple[tuple[str, ...], int], ...]
    not_phrases: tuple[tuple[tuple[str, ...], int], ...]
    min_should: int

    @property
    def positive_terms(self) -> tuple[str, ...]:
        """Sorted unique scoring terms (must + should, terms + phrases)."""
        s: set[str] = set()
        for g in self.must_groups + self.should_groups:
            s.update(g)
        for terms, _slop in self.must_phrases + self.should_phrases:
            s.update(terms)
        return tuple(sorted(s))

    @property
    def all_terms(self) -> tuple[str, ...]:
        """Sorted unique fetch set — includes must_not terms (their
        posting lists drive the exclusion set algebra)."""
        s = set(self.positive_terms)
        for g in self.not_groups:
            s.update(g)
        for terms, _slop in self.not_phrases:
            s.update(terms)
        return tuple(sorted(s))


def parse_query_string(query_text: str) -> ParsedQS:
    """Lex + classify one query string → clauses and field filters.

    Fails loud on: unbalanced quotes, unknown filter fields
    (``date:x``), boosted phrases, boosted/negated emptiness, fuzzy
    distances > 1, and a query with no positive (must/should) clause —
    a must_not/filter-only query has no scorable match set (the engine
    never serves unbounded zero-score results)."""
    from .oracle import classify_expansion_tokens

    consumed = re.sub(
        r"\s+", "", "".join(m.group(0) for m in _LEX.finditer(query_text))
    )
    if consumed != re.sub(r"\s+", "", query_text):
        raise ValueError(
            f"unbalanced quote or parenthesis in query string: {query_text!r}"
        )
    clauses: list[QSClause] = []
    filters: list[QSFilter] = []
    for m in _LEX.finditer(query_text):
        sign, phrase, slop, pboost, group, gboost, tok = m.groups()
        occur = {"+": "must", "-": "not", "": "should"}[sign]
        if group is not None:
            # parenthesized alternatives: ONE clause matching ANY of
            # its terms (the Lucene `+(error failure)` grouping form —
            # exactly the resolver's existing group structure, so the
            # grammar is the only addition).  Flat plain terms only:
            # markers/filters/nesting inside a group fail loud.
            if not group.split():
                raise ValueError(f"empty group in query string: {query_text!r}")
            for gt in group.split():
                [(kind, _v)] = classify_expansion_tokens(gt)
                if kind != "plain" or ":" in gt:
                    raise ValueError(
                        f"only plain terms are supported inside groups: {gt!r}"
                    )
            boost = float(gboost) if gboost else None
            if boost is not None and boost <= 0.0:
                raise ValueError(f"non-positive boost in query group {m.group(0)!r}")
            clauses.append(QSClause(occur, "group", group.strip(), boost=boost))
            continue
        if phrase is not None:
            if pboost is not None or _BOOST_SUFFIX.match(phrase):
                # both placements a Lucene user might type: `"a b"^2`
                # and `"a b^2"` fail loud, never silently drop the boost
                raise ValueError(f"phrase boosts are not supported: {phrase!r}")
            clauses.append(
                QSClause(occur, "phrase", phrase, slop=int(slop or 0))
            )
            continue
        if tok.startswith('"') or tok.endswith('^'):
            raise ValueError(f"malformed token in query string: {tok!r}")
        rm = None if tok.startswith("/") else _RANGE_TOKEN.match(tok)
        if rm:
            field, op, value = rm.group(1), rm.group(2), rm.group(3)
            # fail loud at parse time, not deep in a Spark job
            if field == "ts":
                from datetime import datetime

                try:
                    datetime.fromisoformat(value)
                except ValueError:
                    raise ValueError(
                        f"bad ts range value {value!r} (ISO date or "
                        "T-separated datetime)"
                    ) from None
            else:
                try:
                    int(value)
                except ValueError:
                    raise ValueError(
                        f"bad {field} range value {value!r} (integer)"
                    ) from None
            filters.append(QSFilter(field, value, occur == "not", op))
            continue
        fm = None if tok.startswith("/") else _FIELD_TOKEN.match(tok)
        if fm:
            field, value = fm.group(1), fm.group(2)
            if not re.match(r"^[\w.-]+$", value):
                raise ValueError(
                    f"bad filter value {value!r} for field {field!r} "
                    "(word characters, dots, dashes only — boosts and "
                    "markers do not apply to filters)"
                )
            if occur == "must":
                occur = "should"  # +field:v == field:v — filters are binary
            filters.append(QSFilter(field, value, occur == "not"))
            continue
        if ":" in tok and not tok.startswith("/"):
            head = tok.split(":", 1)[0]
            if re.match(r"^[A-Za-z_]\w*$", head):
                if head.lower() in RANGE_FIELDS:
                    raise ValueError(
                        f"field {head!r} is ordered — use a range "
                        f"comparator ({head}>=value), not ':'"
                    )
                if head.lower() not in FILTER_FIELDS:
                    raise ValueError(
                        f"unknown filter field {head!r} (supported: "
                        f"{', '.join(FILTER_FIELDS)}; ranges: "
                        f"{', '.join(RANGE_FIELDS)})"
                    )
        bm = _BOOST_SUFFIX.match(tok)
        boost = None
        if bm:
            tok, boost = bm.group(1), float(bm.group(2))
            if boost <= 0.0:
                raise ValueError(f"non-positive boost in query token {m.group(0)!r}")
        if "^" in tok:
            # fail-loud contract (mirrors the trailing-'^' check above):
            # 'term^2^3' would otherwise strip only '^3' and analyze the
            # residue 'term^2' into different terms, and 'term^-2'
            # matches no boost pattern so its negative boost would be
            # silently ignored — both are malformed, not reinterpretable
            raise ValueError(f"malformed boost in query token {m.group(0)!r}")
        dm = _BAD_FUZZY.match(tok)
        if dm and dm.group(1) != "1":
            raise ValueError(
                f"fuzzy distance {dm.group(1)} not supported (max 1): {tok!r}"
            )
        if dm:
            tok = tok[: tok.rindex("~") + 1]  # `term~1` → `term~`
        [(kind, value)] = classify_expansion_tokens(tok)
        marker = None if kind == "plain" else kind
        clauses.append(QSClause(occur, "term", value, boost=boost, marker=marker))
    if not any(c.occur in ("must", "should") for c in clauses):
        raise ValueError(
            f"query string has no positive clause: {query_text!r} "
            "(a must_not/filter-only query has no scorable match set)"
        )
    return ParsedQS(tuple(clauses), tuple(filters))


@dataclass(frozen=True)
class ResolvedQS:
    clauses: BoolClauses
    weights: dict | None  # term → boost (largest wins)


def marker_values(clauses: tuple[QSClause, ...]) -> dict[str, list[str]]:
    """Distinct marker values by kind — what the caller must expand
    against its vocabulary (engine: one pushed idf-table scan per kind;
    oracle: the in-memory postings dict)."""
    out: dict[str, list[str]] = {}
    for c in clauses:
        if c.kind == "term" and c.marker:
            vals = out.setdefault(c.marker, [])
            if c.value not in vals:
                vals.append(c.value)
    return out


def resolve_query_string(
    parsed: ParsedQS,
    expansions: dict[tuple[str, str], list[str]],
    min_should_match: int | None = None,
) -> ResolvedQS:
    """Analyze/expand every clause into index-term groups (pure; the
    vocabulary work happened in ``expansions[(kind, value)]``).

    The drop-vs-impossible distinction: an ANALYZER-emptied clause
    (stopwords only) drops out entirely, while an EXPANSION-emptied
    marker clause stays as an empty group — ``+the`` matches like the
    reference's stopword handling, ``+zzz*`` matches nothing."""
    must_g: list[tuple[str, ...]] = []
    should_g: list[tuple[str, ...]] = []
    not_g: list[tuple[str, ...]] = []
    phrases: dict[str, list[tuple[tuple[str, ...], int]]] = {
        "must": [], "should": [], "not": [],
    }
    weights: dict[str, float] = {}
    for c in parsed.clauses:
        if c.kind == "phrase":
            terms = tuple(analyze_text(c.value))
            if not terms:
                continue
            phrases[c.occur].append((terms, c.slop))
            continue
        if c.marker:
            group = tuple(expansions.get((c.marker, c.value), ()))
        else:
            group = tuple(analyze_query(c.value))
            if not group:
                continue
        {"must": must_g, "should": should_g, "not": not_g}[c.occur].append(group)
        if c.boost is not None:
            for t in group:
                weights[t] = max(weights.get(t, 0.0), c.boost)
    has_must = bool(must_g or phrases["must"])
    if min_should_match is None:
        min_should = 0 if has_must else 1
    else:
        min_should = int(min_should_match)
        if min_should < 0:
            raise ValueError(f"min_should_match must be >= 0, got {min_should}")
        if min_should == 0 and not has_must:
            raise ValueError(
                "min_should_match=0 needs at least one must clause "
                "(otherwise every document matches)"
            )
    if not has_must and not (should_g or phrases["should"]):
        # every positive clause was analyzer-dropped: same contract as
        # an all-stopword query on the standing modes — no results
        min_should = 1
    bc = BoolClauses(
        tuple(must_g), tuple(should_g), tuple(not_g),
        tuple(phrases["must"]), tuple(phrases["should"]), tuple(phrases["not"]),
        min_should,
    )
    return ResolvedQS(bc, weights or None)


def positive_text(parsed: ParsedQS) -> str:
    """Literal surface text of the POSITIVE clauses — what snippet
    locators and dual-encoder query embedding should see: term/group
    values and phrase bodies; must_not text never (results must not
    match it), wildcard/regexp patterns never (no literal surface)."""
    parts = []
    for c in parsed.clauses:
        if c.occur == "not" or c.marker in ("wildcard", "regexp"):
            continue
        parts.append(c.value)
    return " ".join(parts)
