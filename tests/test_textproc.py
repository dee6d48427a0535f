"""Unit tests: tokenizer / stopword / Porter parity (SURVEY.md §5.2 item 1)."""

from __future__ import annotations

import pytest

from search_engine_spark.textproc import (
    analyze_query,
    analyze_text,
    index_stopwords,
    query_stopwords,
    porter_stem,
    remove_stopwords,
    tokenize,
)

# Canonical Porter vectors (Porter 1980 voc/output pairs, official variant).
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    "running": "run", "generalizations": "gener", "oscillators": "oscil",
    "logic": "logic", "abilities": "abil", "ability": "abil",
}


def test_porter_vectors():
    for word, expect in PORTER_VECTORS.items():
        assert porter_stem(word) == expect, word


def test_porter_short_words_unchanged():
    for w in ["a", "is", "be", "py", "x", ""]:
        assert porter_stem(w) == w


def test_porter_nonletters_no_crash():
    for t in ["3.14", "/usr/local/bin", "a.b.c", "x_y", "42", "term0042"]:
        assert isinstance(porter_stem(t), str)


def test_tokenize_basic_and_subtokens():
    # Whole dotted token kept + sub-parts first-occurrence deduped.
    assert tokenize("object.method") == ["object.method", "object", "method"]
    # Repeated whole token re-emitted; sub-parts not re-added.
    assert tokenize("a.b a.b") == ["a.b", "a", "b", "a.b"]
    # Extension tokens split to their word part.
    assert tokenize(".py") == [".py", "py"]
    # Paths split on '/' (operator-class char) — empty parts skipped.
    assert tokenize("/usr/local/bin") == ["/usr/local/bin", "usr", "local", "bin"]


def test_tokenize_operator_exprs_split_by_regex():
    # Leftmost-first alternation: alt 1 consumes word chars, so "x+=1"
    # yields separate matches, never an operator-joined token.
    assert tokenize("x+=1") == ["x", "1"]
    assert tokenize("arr[i]") == ["arr", "i"]
    assert tokenize("a*b x=y") == ["a", "b", "x", "y"]


def test_tokenize_numbers_and_case():
    assert tokenize("42 3.14") == ["42", "3.14", "3", "14"]
    assert tokenize("PySpark HTTPServer") == ["pyspark", "httpserver"]


def test_tokenize_dedup_is_document_global():
    # "b" emitted as sub-token of "a.b"; later ".b" whole token still added,
    # but its sub-part "b" is not re-added.
    assert tokenize("a.b .b") == ["a.b", "a", "b", ".b"]


def test_stopword_semantics():
    stop = index_stopwords()
    assert "the" in stop and "of" in stop
    # every occurrence removed + len<=1 dropped, order preserved
    assert "ran" in stop  # the 668-word index list is aggressive
    assert remove_stopwords(["the", "dog", "the", "x", "spark"], stop) == ["dog", "spark"]


def test_two_stopword_lists_differ():
    # 668 lines incl. one blank -> 667 words; 174 words (no trailing newline)
    assert len(index_stopwords()) == 667
    assert len(query_stopwords()) == 174
    assert index_stopwords() != query_stopwords()


def test_analyze_text_pipeline():
    assert analyze_text("The running dogs and the caresses of ponies") == [
        "run", "dog", "caress", "poni",
    ]
    assert analyze_text("") == []


def test_analyze_query_allowlist():
    # 'us' is a stopword but allowlisted (QueryService.java:403-405)
    assert "us" in analyze_query("US war")
    # 'and' always dropped
    assert analyze_query("and") == []
    # duplicates preserved in query term list
    assert analyze_query("running run") == ["run", "run"]


def test_stem_cache_matches_uncached():
    text = "running running caresses object.method /usr/local/bin"
    assert analyze_text(text, _stem_cache={}) == analyze_text(text)
