"""The reference's relevance-boost ladder — ``QueryService.java``
``calculateRelevanceScoreOptimized`` (:946-1088) as a declarative
DataFrame operator (an OPTIONAL rerank feature, like proximity; NOT part
of the §4.3 BM25 rank-identity contract).

Tier ladder (early returns in the reference, a ``when`` cascade here):

    doc_len < 50                          → 0.01      (:966-969)
    title contains the exact query phrase → 1000.0    (:978-980)
    >1 term and ALL terms in the url      → 500.0     (:983-997)
    ALL terms in the title                → 300.0     (:1000-1010)
    otherwise                             → tf-idf sum (:1012-1088):
        tf      = min(raw_tf / doc_len, 0.1)          (spam cap, :1047-1050)
        idf     = log10(N / docs_with_term)           (:1066-1068)
        contrib = tf·idf · (1 + 3·[term in title] + 2·[term in url])
                                                      (:1076-1086)
        found < |terms|/2  ⇒  sum ×= 0.1              (:1090-1093, int div)
        phrase in text     ⇒  sum ×= 3                (:1096-1100)
        phrase in title    ⇒  sum ×= 3                (:1103-1107)

The reference runs this per candidate with one SQL query per (term,
doc) — an N+1 pattern (SURVEY.md §4.2).  Here it is one broadcast join
of the |terms|-row stats side against a single corpus scan: raw term
frequencies and document frequencies come from the same exploded-token
aggregate, everything else is whole-stage-codegen column math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .docs_bm25 import simple_tokens

MIN_DOC_LEN = 50  # QueryService.java:966
SHORT_DOC_SCORE = 0.01
TITLE_PHRASE_SCORE = 1000.0
URL_ALL_TERMS_SCORE = 500.0
TITLE_ALL_TERMS_SCORE = 300.0
TF_SPAM_CAP = 0.1  # :1049
TITLE_TERM_BOOST = 3.0  # :1078
URL_TERM_BOOST = 2.0  # :1084
MISSING_TERMS_PENALTY = 0.1  # :1092
PHRASE_BOOST = 3.0  # :1098 / :1105


def relevance_boost_scores(
    docs: DataFrame,
    terms: list[str],
    title_col: str = "title",
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, boost_score) for every doc under the reference ladder.

    ``terms`` are the (already stemmed/lowercased) query terms; ``docs``
    must expose doc_id, the text column, and title/url columns (callers
    without real titles/urls pass derived columns — the ladder only
    needs *some* field semantics to weight).

    Duplicate query terms are NOT deduped for the reference semantics:
    the signature joins the raw stemmed words (:973), ``termsFoundInDoc``
    counts per raw occurrence against the raw ``stemmedWords.size()/2``
    threshold (:1090-1093), the >1-term gates use the raw size
    (:983, :1096), and the tf-idf loop runs once per occurrence — a
    repeated term multiplies its contribution.  Per-term WORK is still
    deduped (one tf/df row per distinct term); multiplicity enters as a
    weight on the contribution sum.
    """
    raw = [t.lower() for t in terms if t]
    uniq = list(dict.fromkeys(raw))
    if not uniq:
        return docs.select("doc_id", F.lit(0.0).alias("boost_score"))
    sig = " ".join(raw)
    from collections import Counter

    mult = Counter(raw)
    mult_map = F.create_map(
        *[x for t, m in mult.items() for x in (F.lit(t), F.lit(float(m)))]
    )

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != F.lit("")
    )
    base = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        F.lower(F.coalesce(F.col(title_col), F.lit(""))).alias("_title"),
        F.lower(F.coalesce(F.col(url_col), F.lit(""))).alias("_url"),
        F.lower(F.trim(F.col(text_col))).alias("_text"),
    )

    # one exploded-token aggregate feeds BOTH raw tf and df — the Spark
    # analog of the reference's per-(term, doc) SELECTs (:1035-1063)
    tf = (
        simple_tokens(docs.select("doc_id", F.col(text_col).alias("text")))
        .filter(F.col("token").isin(uniq))
        .groupBy("doc_id", F.col("token").alias("term"))
        .agg(F.count("*").alias("raw"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n"))

    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .join(base.select("doc_id", "dl", "_title", "_url"), "doc_id")
        .withColumn(
            "tfc",
            F.least(
                F.col("raw").cast("double") / F.greatest(F.col("dl"), F.lit(1)),
                F.lit(TF_SPAM_CAP),
            ),
        )
        .withColumn("idf", F.log10(F.col("n").cast("double") / F.col("df")))
        .withColumn("m", F.element_at(mult_map, F.col("term")))
        .withColumn(
            "c",
            F.col("tfc")
            * F.col("idf")
            * (
                F.lit(1.0)
                + F.lit(TITLE_TERM_BOOST) * F.col("_title").contains(F.col("term")).cast("double")
                + F.lit(URL_TERM_BOOST) * F.col("_url").contains(F.col("term")).cast("double")
            )
            * F.col("m"),
        )
        .groupBy("doc_id")
        .agg(F.sum("c").alias("s"), F.sum("m").cast("long").alias("found"))
    )

    j = base.join(contrib, "doc_id", "left").select(
        "doc_id", "dl", "_title", "_url", "_text",
        F.coalesce(F.col("s"), F.lit(0.0)).alias("s"),
        F.coalesce(F.col("found"), F.lit(0)).alias("found"),
    )

    s = F.col("s")
    # :1090-1093 — integer division over the RAW size in the Java source
    s = F.when(F.col("found") < len(raw) // 2, s * MISSING_TERMS_PENALTY).otherwise(s)
    if len(raw) > 1:
        s = F.when(F.col("_text").contains(sig), s * PHRASE_BOOST).otherwise(s)
        s = F.when(F.col("_title").contains(sig), s * PHRASE_BOOST).otherwise(s)

    all_in = lambda col: F.aggregate(  # noqa: E731
        F.array(*[col.contains(t).cast("boolean") for t in uniq]),
        F.lit(True),
        lambda acc, x: acc & x,
    )
    ladder = (
        F.when(F.col("dl") < MIN_DOC_LEN, F.lit(SHORT_DOC_SCORE))
        .when(F.col("_title").contains(sig), F.lit(TITLE_PHRASE_SCORE))
        .when(
            F.lit(len(raw) > 1) & all_in(F.col("_url")), F.lit(URL_ALL_TERMS_SCORE)
        )
        .when(all_in(F.col("_title")), F.lit(TITLE_ALL_TERMS_SCORE))
        .otherwise(s)
    )
    return j.select("doc_id", ladder.alias("boost_score"))


def boost_rerank(
    scored: DataFrame,
    docs: DataFrame,
    terms: list[str],
    title_col: str = "title",
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Attach the ladder score to an existing (doc_id, score) ranking and
    re-sort by it (the reference replaces, not blends — :946 returns the
    ladder value as THE relevance score)."""
    boosts = relevance_boost_scores(docs, terms, title_col, url_col, text_col)
    return (
        scored.join(boosts, "doc_id", "left")
        .select(
            "doc_id",
            "score",
            F.coalesce(F.col("boost_score"), F.lit(0.0)).alias("boost_score"),
        )
        .orderBy(F.desc("boost_score"), F.desc("score"), F.asc("doc_id"))
    )
