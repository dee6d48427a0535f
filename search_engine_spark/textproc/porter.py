"""Classic Porter stemmer (Porter 1980, "official" variant).

A from-scratch Python implementation of the classic Porter stemming
algorithm in the form distributed by Martin Porter (the variant that ships
in OpenNLP/Lucene as ``PorterStemmer`` and is used by the reference at
``PreIndexer.java:165-178``).  Departures of the official variant from the
1980 paper that we reproduce:

* step 2 maps ``bli -> ble`` (paper: ``abli -> able``) and adds
  ``logi -> log``.
* words of length <= 2 are returned unchanged.

Non-letter characters (digits, ``_``, ``.``, ``/``, ``-``) flow through the
consonant/vowel classification as consonants, exactly like the char-array
based reference implementation — tokens such as ``3.14`` or ``/usr/bin``
are therefore stemmed deterministically rather than rejected.

This module is pure Python + stdlib so the same code runs in the pytest
oracle and inside Arrow-batched pandas UDFs (memoized per batch).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _cons(word, i - 1)
    return True


def _measure(word: str, j: int) -> int:
    """Number of VC sequences in word[0..j]."""
    n = 0
    i = 0
    # skip initial consonants
    while True:
        if i > j:
            return n
        if not _cons(word, i):
            break
        i += 1
    i += 1
    while True:
        while True:
            if i > j:
                return n
            if _cons(word, i):
                break
            i += 1
        i += 1
        n += 1
        while True:
            if i > j:
                return n
            if not _cons(word, i):
                break
            i += 1
        i += 1


def _vowel_in_stem(word: str, j: int) -> bool:
    return any(not _cons(word, i) for i in range(j + 1))


def _double_cons(word: str, j: int) -> bool:
    if j < 1:
        return False
    if word[j] != word[j - 1]:
        return False
    return _cons(word, j)


def _cvc(word: str, i: int) -> bool:
    """cons-vowel-cons ending at i, where the final cons is not w, x or y."""
    if i < 2 or not _cons(word, i) or _cons(word, i - 1) or not _cons(word, i - 2):
        return False
    return word[i] not in "wxy"


def _ends(word: str, k: int, suffix: str) -> int | None:
    """If word[:k+1] ends with suffix, return j (end of stem), else None."""
    ln = len(suffix)
    if ln > k + 1:
        return None
    if word[k + 1 - ln : k + 1] == suffix:
        return k - ln
    return None


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word

    b = word
    k = len(b) - 1

    # --- step 1a: plurals ---
    if b[k] == "s":
        if _ends(b, k, "sses") is not None:
            k -= 2
        elif _ends(b, k, "ies") is not None:
            b = b[: k - 2] + "i"
            k -= 2
        elif k >= 1 and b[k - 1] != "s":
            k -= 1

    # --- step 1b: -ed / -ing ---
    def _restore_after_strip(b: str, k: int) -> tuple[str, int]:
        if _ends(b, k, "at") is not None:
            b = b[: k + 1] + "e"
            k += 1
        elif _ends(b, k, "bl") is not None:
            b = b[: k + 1] + "e"
            k += 1
        elif _ends(b, k, "iz") is not None:
            b = b[: k + 1] + "e"
            k += 1
        elif _double_cons(b, k):
            if b[k] not in "lsz":
                k -= 1
        elif _measure(b, k) == 1 and _cvc(b, k):
            b = b[: k + 1] + "e"
            k += 1
        return b, k

    j = _ends(b, k, "eed")
    if j is not None:
        if _measure(b, j) > 0:
            k -= 1
    else:
        j = _ends(b, k, "ed")
        if j is not None and _vowel_in_stem(b, j):
            k = j
            b, k = _restore_after_strip(b, k)
        else:
            j = _ends(b, k, "ing")
            if j is not None and _vowel_in_stem(b, j):
                k = j
                b, k = _restore_after_strip(b, k)

    # --- step 1c: y -> i ---
    if b[k] == "y" and _vowel_in_stem(b, k - 1):
        b = b[:k] + "i" + b[k + 1 :]

    # --- step 2 ---
    _STEP2 = (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("bli", "ble"),  # official variant (paper: abli->able)
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
        ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
        ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
        ("logi", "log"),  # official variant addition
    )
    for suf, rep in _STEP2:
        j = _ends(b, k, suf)
        if j is not None:
            if _measure(b, j) > 0:
                b = b[: j + 1] + rep + b[k + 1 :]
                k = j + len(rep)
            break

    # --- step 3 ---
    _STEP3 = (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    )
    for suf, rep in _STEP3:
        j = _ends(b, k, suf)
        if j is not None:
            if _measure(b, j) > 0:
                b = b[: j + 1] + rep + b[k + 1 :]
                k = j + len(rep)
            break

    # --- step 4 ---
    _STEP4 = (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    )
    for suf in _STEP4:
        j = _ends(b, k, suf)
        if j is not None:
            if suf == "ion" and not (j >= 0 and b[j] in "st"):
                break
            if _measure(b, j) > 1:
                k = j
            break

    # --- step 5a/5b (official step6): final -e removal, -ll -> -l ---
    # The official code sets j = k once at entry and measures 0..j for BOTH
    # sub-steps (so the -ll check measures over the possibly-removed -e).
    j5 = k
    if b[k] == "e":
        a = _measure(b, j5)
        if a > 1 or (a == 1 and not _cvc(b, k - 1)):
            k -= 1
    if b[k] == "l" and _double_cons(b, k) and _measure(b, j5) > 1:
        k -= 1

    return b[: k + 1]
