"""HTML char filter with reference-parallel semantics (P1).

Re-implements (from the published behavior, not the code) the reference's
``cleanHTML`` stage — ``searchengine/.../Indexer/Service/PreIndexer.java:
48-75`` — as ONE pure-JVM column expression: a fixed chain of
``regexp_extract_all`` / ``regexp_replace`` / ``replace`` calls, no
Python in the row path, no shuffle, fully inside whole-stage codegen.
The corpus here is plain-text transcripts, so the production pipeline
applies this filter only when a source is declared ``html=True`` — but
the semantics are pinned independently so HTML-bearing corpora rank
identically to the reference's cleaning:

1. Drop HTML comments.
2. Extract the text of code-ish elements (``code pre tt kbd samp``) and
   APPEND it after the document text — the reference deliberately
   duplicates code content (it survives once in ``doc.text()`` and once
   re-appended), doubling its term frequency; we reproduce that.
3. Remove non-content subtrees (``style script noscript svg canvas``)
   and void metadata tags (``meta link``).
4. Strip all remaining tags.
5. Decode the common named/numeric entities Jsoup would decode
   (a documented finite subset: amp/lt/gt/quot/apos/#39/nbsp).
6. Apply the reference's programming-character allowlist (everything
   outside ``[a-zA-Z0-9_+-.#$%^&*()\\[\\]{}<>=/\\|:;,!?]`` becomes a
   space) and collapse whitespace.

The reference uses a DOM parser (Jsoup); this is a regex chain, so
pathological HTML (unclosed code tags, tags inside attributes) can
differ — the contract is pinned by the shared-constant DuckDB twin
(:func:`clean_html_sql`) and the pure-Python mirror
(:func:`clean_html_py`), all three built from the SAME pattern table, so
engine/oracle parity is exact even where Jsoup parity is approximate.

Scale shape: per-row scalar expressions only — the filter adds zero
shuffles and runs at scan speed on any corpus size.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

#: Elements whose text the reference extracts and re-appends
#: (PreIndexer.java:52-56).
CODE_TAGS = ("code", "pre", "tt", "kbd", "samp")

#: Elements removed with their entire subtree (PreIndexer.java:59).
DROP_TAGS = ("style", "script", "noscript", "svg", "canvas")

#: Void metadata tags removed tag-only (they have no subtree).
VOID_TAGS = ("meta", "link")

#: Extraction pattern per code tag (group 1 = inner HTML).  No
#: backreferences — DuckDB's RE2 has none, and all three mirrors must
#: run the IDENTICAL pattern.
CODE_RE = "(?is)<{tag}\\b[^>]*>(.*?)</{tag}\\s*>"

#: Subtree-removal pattern per drop tag.
DROP_RE = "(?is)<{tag}\\b[^>]*>.*?</{tag}\\s*>"

#: Void-tag removal pattern.
VOID_RE = "(?is)<{tag}\\b[^>]*>"

#: Any remaining tag (opening, closing, or self-closing).
TAG_RE = "(?s)</?[a-zA-Z][^>]*>|<!--.*?-->|<!DOCTYPE[^>]*>"

#: HTML comments, removed first so commented-out markup never matches.
COMMENT_RE = "(?s)<!--.*?-->"

#: Entity decode table, applied in order (amp LAST, the standard rule:
#: decoding it first would double-decode ``&amp;lt;``).
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

#: The reference's allowlist (PreIndexer.java:69): every char NOT in the
#: class becomes a space.  Identical syntax in Java regex, RE2, Python.
ALLOW_RE = r"[^a-zA-Z0-9_+\-.#$%\^&*()\[\]{}<>=/\\|:;,!?]"

WS_RE = r"\s+"

#: Cost note (measured, round 5 — interleaved min-of-3 at 100k docs):
#: this final allowlist+collapse stage is ~¾ of the whole chain's cost
#: (its match density — every inter-word space — is ~20× the other
#: stages').  Two alternatives were implemented, property-tested
#: equivalent, and MEASURED SLOWER OR EQUAL on the JVM: fusing the two
#: passes into one run-replace (`[^allow]+` → " ", ~equal — the cost is
#: position scanning, not pass count) and sparse matching (rewrite only
#: runs that change, 2× SLOWER — the three-part pattern doubles
#: per-position work).  The reference-shaped two-pass form below is the
#: fastest of the three; the filter is a one-time ingest transform,
#: linear, fused into the scan projection (~20 µs/doc/core at the
#: measured rate — R5_OPS_PROBE.json).


# ---------------------------------------------------------------------------
# Spark column expression
# ---------------------------------------------------------------------------


def _strip_decode(col: Column) -> Column:
    """Tag-strip + entity-decode a fragment (matches Jsoup element.text()
    up to the documented approximations)."""
    out = F.regexp_replace(col, TAG_RE, " ")
    for src, dst in ENTITIES:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def clean_html_col(col: Column | str) -> Column:
    """``cleanHTML`` as one Spark column expression (JVM-only)."""
    raw = F.col(col) if isinstance(col, str) else col
    raw = F.regexp_replace(raw, COMMENT_RE, " ")
    # code extraction runs on the comment-free original, BEFORE subtree
    # removal (the reference selects code elements from the full DOM)
    code = F.array_join(
        F.flatten(
            F.array(
                *[
                    F.regexp_extract_all(raw, F.lit(CODE_RE.format(tag=t)), 1)
                    for t in CODE_TAGS
                ]
            )
        ),
        " ",
    )
    body = raw
    for t in DROP_TAGS:
        body = F.regexp_replace(body, DROP_RE.format(tag=t), " ")
    for t in VOID_TAGS:
        body = F.regexp_replace(body, VOID_RE.format(tag=t), " ")
    merged = F.concat_ws(" ", _strip_decode(body), _strip_decode(code))
    allowed = F.regexp_replace(merged, ALLOW_RE, " ")
    return F.trim(F.regexp_replace(allowed, WS_RE, " "))


# ---------------------------------------------------------------------------
# DuckDB SQL twin (same pattern table)
# ---------------------------------------------------------------------------


def _sq(pattern: str) -> str:
    return "'" + pattern.replace("'", "''") + "'"


def _strip_decode_sql(expr: str) -> str:
    out = f"regexp_replace({expr}, {_sq(TAG_RE)}, ' ', 'g')"
    for src, dst in ENTITIES:
        out = f"replace({out}, {_sq(src)}, {_sq(dst)})"
    return out


def clean_html_sql(expr: str) -> str:
    """The identical chain as a DuckDB scalar expression over ``expr``."""
    raw = f"regexp_replace({expr}, {_sq(COMMENT_RE)}, ' ', 'g')"
    code_arrays = ", ".join(
        f"regexp_extract_all({raw}, {_sq(CODE_RE.format(tag=t))}, 1)"
        for t in CODE_TAGS
    )
    code = f"array_to_string(flatten([{code_arrays}]), ' ')"
    body = raw
    for t in DROP_TAGS:
        body = f"regexp_replace({body}, {_sq(DROP_RE.format(tag=t))}, ' ', 'g')"
    for t in VOID_TAGS:
        body = f"regexp_replace({body}, {_sq(VOID_RE.format(tag=t))}, ' ', 'g')"
    merged = f"concat_ws(' ', {_strip_decode_sql(body)}, {_strip_decode_sql(code)})"
    allowed = f"regexp_replace({merged}, {_sq(ALLOW_RE)}, ' ', 'g')"
    return f"trim(regexp_replace({allowed}, {_sq(WS_RE)}, ' ', 'g'))"


# ---------------------------------------------------------------------------
# pure-Python mirror (oracle/tokenizer-parity tests)
# ---------------------------------------------------------------------------


def _strip_decode_py(text: str) -> str:
    out = re.sub(TAG_RE, " ", text)
    for src, dst in ENTITIES:
        out = out.replace(src, dst)
    return out


def clean_html_py(text: str) -> str:
    raw = re.sub(COMMENT_RE, " ", text)
    code_parts: list[str] = []
    for t in CODE_TAGS:
        code_parts.extend(re.findall(CODE_RE.format(tag=t), raw))
    code = " ".join(code_parts)
    body = raw
    for t in DROP_TAGS:
        body = re.sub(DROP_RE.format(tag=t), " ", body)
    for t in VOID_TAGS:
        body = re.sub(VOID_RE.format(tag=t), " ", body)
    merged = " ".join(
        p for p in (_strip_decode_py(body), _strip_decode_py(code)) if True
    )
    allowed = re.sub(ALLOW_RE, " ", merged)
    return re.sub(WS_RE, " ", allowed).strip()
