"""Tokenizer with reference-identical semantics.

Re-implements (from the published behavior, not the code) the tokenize /
stopword semantics of the reference text pipeline:

* tokenize: ``searchengine/.../Indexer/Service/PreIndexer.java:93-163``
* removeStopWords: ``PreIndexer.java:41-46``

Key semantics that MUST hold for rank-identity (SURVEY.md §7.3):

1. Lowercase the whole text first.
2. Scan with a leftmost-first alternation regex.  Because the first
   alternative ``[a-z0-9_]+(\\.[a-z0-9_]+)*`` wins at any position starting
   with a word char, the operator / bracket alternatives can never produce a
   match containing ``+-*/=[]`` — matches are only (a) dotted-word runs,
   (b) ``.ext`` extension tokens, (c) ``/path/-like`` tokens.  Java and
   Python regex alternation agree here (both leftmost-first, non-POSIX).
3. Every regex match is appended unconditionally (duplicates kept).
4. Sub-token expansion: a match containing ``.`` is split on ``.``; a match
   containing an operator char (only possible for path tokens carrying
   ``-`` or ``/``) is split on ``[+\\-*/=]``.  A sub-token is appended only
   if it is not already present anywhere in the running token list
   (order-sensitive first-occurrence dedup across the whole document).
5. Stopword removal removes EVERY occurrence of each stopword, then drops
   empty / length<=1 tokens, preserving order.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

# Verbatim port of the reference token pattern (PreIndexer.java:105-111).
TOKEN_RE = re.compile(
    r"(?:[a-z0-9_]+(?:\.[a-z0-9_]+)*)"  # words with optional dots
    r"|(?:[a-z0-9_]+(?:[+\-*/=][a-z0-9_]+)?)"  # expressions like "x+y" (dead: alt 1 shadows)
    r"|(?:[a-z0-9_]+(?:\[[a-z0-9_*]+\])?)"  # array access (dead: alt 1 shadows)
    r"|(?:\.[a-z0-9_]+)"  # file extensions like ".py"
    r"|(?:/[a-z0-9_\-./]+)"  # file paths / URL parts
)

_OP_CHARS = set("+-*/=")
_OP_SPLIT_RE = re.compile(r"[+\-*/=]")


def tokenize(text: str) -> list[str]:
    """Tokenize one document/turn; reference PreIndexer.tokenize parity."""
    text = text.lower()
    words: list[str] = []
    seen: set[str] = set()  # membership mirror of `words` (Java List.contains)

    for m in TOKEN_RE.finditer(text):
        token = m.group()
        if not token:
            continue
        words.append(token)
        seen.add(token)

        if "." in token:
            for part in token.split("."):
                if part and part not in seen:
                    words.append(part)
                    seen.add(part)

        if _OP_CHARS.intersection(token):
            for part in _OP_SPLIT_RE.split(token):
                if part and part not in seen:
                    words.append(part)
                    seen.add(part)

        # Bracket expansion (PreIndexer.java:148-159) is unreachable: no
        # alternative can emit '[' because alternative 1 consumes the leading
        # word chars first.  Kept for documentation parity only.
        if "[" in token and "]" in token:  # pragma: no cover - dead by construction
            base = token[: token.index("[")]
            idx = token[token.index("[") + 1 : token.index("]")]
            for part in (base, idx):
                if part and part not in seen:
                    words.append(part)
                    seen.add(part)

    return words


def remove_stopwords(tokens: list[str], stopwords: Iterable[str] | frozenset[str]) -> list[str]:
    """removeStopWords parity: drop ALL stopword occurrences, then len<=1."""
    if not isinstance(stopwords, (set, frozenset)):
        stopwords = frozenset(stopwords)
    return [t for t in tokens if t not in stopwords and len(t) > 1]
