"""Phrase-specific document scoring — the reference's
``PhraseSearching.calculateDocumentScore`` (``PhraseSearching.java:178-213``)
as a declarative column expression.

Multiplicative ladder over the phrase-candidate set:

    base 1.0
    ×3.0  phrase in title                       (:183-185)
    ×(1+ln(count))  count>1 occurrences in text (:190-196, non-overlapping)
    ×1.5  phrase in the first paragraph         (:199-203)
    ×2.0  phrase (spaces→dashes) in the url     (:206-209)

Transcript analog for "first paragraph" (the reference takes the first
HTML ``<p>``'s text, :233-238): the first ``first_para_tokens``
whitespace tokens of the document, space-joined — documented, and
mirrored exactly by the SQL oracle.  Occurrence counting is the Java
``indexOf`` loop's non-overlapping count (:218-226), computed here as
``(len(text) − len(replace(text, phrase, ''))) / len(phrase)`` — pure
JVM string ops, whole-stage codegen, one narrow projection; the
reference instead runs this per document in driver-side Java over
JPA-fetched rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import rnd

TITLE_PHRASE_BOOST = 3.0  # :185
MULTI_OCCURRENCE_LOG = True  # :195 — score *= 1 + ln(count)
FIRST_PARA_BOOST = 1.5  # :202
URL_PHRASE_BOOST = 2.0  # :208
FIRST_PARA_TOKENS = 50  # transcript analog of the first <p>
ROUND = 6


def phrase_doc_scores(
    docs: DataFrame,
    phrase: str,
    title_col: str = "title",
    url_col: str = "url",
    text_col: str = "text",
    first_para_tokens: int = FIRST_PARA_TOKENS,
) -> DataFrame:
    """(doc_id, n_occurrences, phrase_score) for every input doc.

    Callers pass the phrase-CANDIDATE set (the reference scores only
    documents its positional search already matched); scoring unmatched
    docs is meaningful but not the reference flow.
    """
    p = phrase.lower()
    dashed = p.replace(" ", "-")
    txt = F.lower(F.trim(F.col(text_col)))
    title = F.lower(F.coalesce(F.col(title_col), F.lit("")))
    url = F.lower(F.coalesce(F.col(url_col), F.lit("")))
    toks = F.filter(F.split(txt, r"\s+"), lambda x: x != F.lit(""))
    first_para = F.concat_ws(" ", F.slice(toks, 1, first_para_tokens))
    # non-overlapping occurrence count, exactly the :218-226 loop
    cnt = (
        (F.length(txt) - F.length(F.replace(txt, F.lit(p), F.lit(""))))
        / F.lit(len(p))
    ).cast("int")
    score = (
        F.when(title.contains(p), F.lit(TITLE_PHRASE_BOOST)).otherwise(F.lit(1.0))
        * F.when(cnt > 1, F.lit(1.0) + F.log(cnt.cast("double"))).otherwise(F.lit(1.0))
        * F.when(first_para.contains(p), F.lit(FIRST_PARA_BOOST)).otherwise(F.lit(1.0))
        * F.when(url.contains(dashed), F.lit(URL_PHRASE_BOOST)).otherwise(F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        cnt.alias("n_occurrences"),
        rnd(score, ROUND).alias("phrase_score"),
    )
