"""MMR diversity rerank — the reference's ``applyDiversityReranking``
(``RankerService.java:342-574``) as a Spark operator.

Reference semantics (modified Maximal Marginal Relevance):

* per-candidate term sets: title terms (``\\W+`` split, len>3, :374),
  URL components (protocol/www stripped, ``[/.-]`` split, len>3, :380),
  the first 300 content terms (len>3, :392), plus the search terms
  (:402);
* greedy selection keeps the top result (:416), then repeatedly picks
  the candidate maximizing
  ``score · (1 − d·(0.7·maxSim + 0.3·avgSim)) · (1 − domainPenalty)``
  (:469, :525) where d = 0.7, or 0.9 when maxSim > 0.7 (:473-478);
* domainPenalty = min(0.8, 0.15·freq) (:490) — ``freq`` counts the
  candidate's domain over ALL loaded top results plus each selection
  (the reference pre-counts during the load loop at :366 and increments
  again on every pick at :421/:556) — ×0.7 for programming domains
  (:497), +0.25 (capped 0.95) per selected same-domain doc whose URL
  path similarity exceeds 0.7 (:501-516);
* programming-marker queries give programming domains a ×1.15 bonus
  (:528-546);
* leftover candidates append in original order (:566).

Spark shape: term sets and the k² pairwise Jaccard matrix are computed
distributed — candidate ids broadcast-semi-join into the docs table, the
per-doc set build is a narrow projection, and the pair join is bounded
by k² (k = rerank depth, ≤25 in the reference) — then the inherently
sequential greedy selection runs executor-side in ONE cogrouped Arrow
kernel over those bounded rows (never a driver loop; in batched query
execution the groups parallelize per query).  The reference instead
issues one ``findById`` per (candidate, step) against PostgreSQL.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

#: RankerService.java:433-437 — domains whose penalty is relieved
PROGRAMMING_DOMAINS = frozenset(
    {
        "github.com",
        "stackoverflow.com",
        "developer.mozilla.org",
        "w3schools.com",
        "freecodecamp.org",
        "codecademy.com",
        "geeksforgeeks.org",
        "dev.to",
        "replit.com",
        "codesandbox.io",
        "python.org",
        "reactjs.org",
    }
)

#: RankerService.java:528-540 — substring markers of a programming query
PROGRAMMING_QUERY_MARKERS = (
    "code",
    "programming",
    "python",
    "javascript",
    "java",
    "react",
    "html",
    "ai",
    "css",
)

MAX_SIM_W = 0.7  # :468 — combinedSimilarity blend
AVG_SIM_W = 0.3
DIVERSITY_FACTOR = 0.7  # :472
DIVERSITY_FACTOR_NEAR_DUP = 0.9  # :476
NEAR_DUP_SIM = 0.7  # :475
DOMAIN_PENALTY_STEP = 0.15  # :490
DOMAIN_PENALTY_CAP = 0.8
PROG_DOMAIN_RELIEF = 0.7  # :497
PATH_PENALTY_STEP = 0.25  # :515
PATH_PENALTY_CAP = 0.95
PATH_SIM_THRESHOLD = 0.7  # :513
PROG_QUERY_BONUS = 1.15  # :545
CONTENT_TERMS_SAMPLE = 300  # :391
MIN_TERM_LEN = 3  # strictly greater — :375 etc.
#: cross-engine argmax stability: the combined score is quantized to 9
#: decimals (with the repo's +1e-9 nudge) before comparison, absorbing
#: last-ulp float divergence between the kernel and the SQL oracle
COMB_ROUND = 9


def extract_domain(url: str) -> str:
    """``extractDomain`` (RankerService.java:596-614): strip protocol,
    cut at the first '/' only if it is not index 0, strip a leading
    www. — quirks preserved."""
    if not url:
        return ""
    d = re.sub(r"^https?://", "", url)
    slash = d.find("/")
    if slash > 0:
        d = d[:slash]
    return re.sub(r"^www\.", "", d)


def path_similarity(p1: str | None, p2: str | None) -> float:
    """``calculatePathSimilarity`` (:619-651): trailing slashes then
    query string stripped, '/'-split segments compared positionally,
    matching/max ratio.  Java's split drops trailing empty segments."""
    if p1 is None or p2 is None:
        return 0.0
    p1 = re.sub(r"\?.*$", "", re.sub(r"/*$", "", p1))
    p2 = re.sub(r"\?.*$", "", re.sub(r"/*$", "", p2))
    if not p1 or not p2:
        return 0.0
    s1 = p1.split("/")
    s2 = p2.split("/")
    while s1 and s1[-1] == "":
        s1.pop()
    while s2 and s2[-1] == "":
        s2.pop()
    matching = sum(1 for a, b in zip(s1, s2) if a == b)
    max_seg = max(len(s1), len(s2))
    return matching / max_seg if max_seg else 0.0


def is_programming_query(terms: list[str]) -> bool:
    """:528-540 — substring containment over the raw search terms (the
    Java ``contains`` check: 'train' matches the 'ai' marker)."""
    return any(m in t.lower() for t in terms for m in PROGRAMMING_QUERY_MARKERS)


def candidate_term_sets(
    docs: DataFrame,
    terms: list[str],
    title_col: str = "title",
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, ts) — the per-candidate significant-term set of
    :360-405: title ``\\W+`` tokens len>3, cleaned-URL ``[/.-]``
    components len>3, first 300 content ``\\W+`` tokens len>3, plus the
    lowercased search terms.  All JVM expressions (narrow projection)."""
    lower = lambda c: F.lower(F.coalesce(F.col(c), F.lit("")))  # noqa: E731
    long_enough = lambda x: F.length(x) > MIN_TERM_LEN  # noqa: E731
    title_terms = F.filter(F.split(lower(title_col), r"\W+"), long_enough)
    # :380-384 — replaceAll is global and unanchored in the reference
    clean_url = F.regexp_replace(
        F.regexp_replace(lower(url_col), "https?://", ""), r"www\.", ""
    )
    url_terms = F.filter(F.split(clean_url, "[/.-]"), long_enough)
    content_terms = F.filter(
        F.slice(F.split(lower(text_col), r"\W+"), 1, CONTENT_TERMS_SAMPLE),
        long_enough,
    )
    query_terms = F.array(*[F.lit(t.lower()) for t in terms])
    return docs.select(
        "doc_id",
        F.array_distinct(
            F.concat(title_terms, url_terms, content_terms, query_terms)
        ).alias("ts"),
    )


def _pair_jaccard(tsets: DataFrame) -> DataFrame:
    """(a, b, jac) for every ORDERED candidate pair a≠b — k² bounded
    rows; Jaccard via JVM array_intersect/array_union sizes (:578-591,
    empty-set pairs score 0)."""
    x = tsets.select(F.col("doc_id").alias("a"), F.col("ts").alias("ta"))
    y = tsets.select(F.col("doc_id").alias("b"), F.col("ts").alias("tb"))
    union_sz = F.size(F.array_union("ta", "tb"))
    return (
        x.join(y, F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.when(union_sz == 0, F.lit(0.0))
            .otherwise(
                F.size(F.array_intersect("ta", "tb")).cast("double") / union_sz
            )
            .alias("jac"),
        )
    )


def _greedy_kernel(prog_domains: frozenset[str], prog_query: bool):
    """The sequential greedy selection (:408-567) as a cogrouped Arrow
    kernel over the bounded (k candidates, k² pairs) rows."""

    def kernel(cand_pdf, pair_pdf):
        import pandas as pd

        # original rank order = (score desc, doc_id asc) — derived here
        # over the bounded candidate rows instead of a Spark-side global
        # window (which would be a single-partition exchange pattern)
        c = cand_pdf.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        jac = {
            (int(a), int(b)): float(j)
            for a, b, j in zip(pair_pdf["a"], pair_pdf["b"], pair_pdf["jac"])
        }
        ids = [int(i) for i in c["doc_id"]]
        score = dict(zip(ids, (float(s) for s in c["score"])))
        url = dict(zip(ids, (None if u is None else str(u).lower() for u in c["url"])))
        domain = {i: extract_domain(url[i]) if url[i] is not None else "" for i in ids}
        # :488/:509 — candidatePath = url.replace(domain, "") (replace-all)
        path = {
            i: url[i].replace(domain[i], "") if url[i] is not None else None
            for i in ids
        }
        # :366-371 — domain frequency pre-counted over ALL loaded results
        pre: dict[str, int] = {}
        for i in ids:
            if url[i] is not None:
                pre[domain[i]] = pre.get(domain[i], 0) + 1
        selcnt: dict[str, int] = {}
        sel: list[int] = []
        remaining = ids[:]
        if remaining:  # :414-421 — always keep the top result
            top = remaining.pop(0)
            sel.append(top)
            if url[top] is not None:
                selcnt[domain[top]] = selcnt.get(domain[top], 0) + 1
        while remaining:
            best, best_comb = None, -1.0
            for cid in remaining:  # original rank order → Java tie-break
                sims = [jac.get((cid, s), 0.0) for s in sel]
                mx = max(sims)
                av = sum(sims) / len(sims)
                combined_sim = MAX_SIM_W * mx + AVG_SIM_W * av
                d = DIVERSITY_FACTOR_NEAR_DUP if mx > NEAR_DUP_SIM else DIVERSITY_FACTOR
                dp = 0.0
                if url[cid] is not None:
                    freq = pre.get(domain[cid], 0) + selcnt.get(domain[cid], 0)
                    if freq > 0:
                        dp = min(DOMAIN_PENALTY_CAP, freq * DOMAIN_PENALTY_STEP)
                    if domain[cid] in prog_domains:
                        dp *= PROG_DOMAIN_RELIEF
                    for s in sel:
                        if (
                            url[s] is not None
                            and domain[cid] == domain[s]
                            and path_similarity(path[cid], path[s])
                            > PATH_SIM_THRESHOLD
                        ):
                            dp = min(PATH_PENALTY_CAP, dp + PATH_PENALTY_STEP)
                comb = score[cid] * (1 - d * combined_sim) * (1 - dp)
                if prog_query and url[cid] is not None and domain[cid] in prog_domains:
                    comb *= PROG_QUERY_BONUS
                comb = round(comb + 1e-9, COMB_ROUND)
                if comb > best_comb:
                    best_comb, best = comb, cid
            remaining.remove(best)
            sel.append(best)
            if url[best] is not None:
                selcnt[domain[best]] = selcnt.get(domain[best], 0) + 1
        return pd.DataFrame(
            {
                "doc_id": pd.Series(sel, dtype="int64"),
                "score": pd.Series([score[i] for i in sel], dtype="float64"),
                "pos": pd.Series(range(1, len(sel) + 1), dtype="int32"),
            }
        )

    return kernel


def mmr_rerank(
    scored: DataFrame,
    docs: DataFrame,
    terms: list[str],
    title_col: str = "title",
    url_col: str = "url",
    text_col: str = "text",
    programming_domains: frozenset[str] = PROGRAMMING_DOMAINS,
) -> DataFrame:
    """Rerank a (doc_id, score) top list for diversity; returns
    (doc_id, score, pos) with pos = 1-based reranked position.

    ``scored`` is the already-limited top list (the reference applies
    MMR to the top ``topK`` results only and appends the rest — pass
    exactly the rows to rerank).  With ≤1 result or ≤1 search term the
    reference returns the input unchanged (:344-346); so does this.
    """
    from pyspark.sql.window import Window

    if len(terms) <= 1:
        # bounded input (the caller's top list) — the global window runs
        # over ≤topK rows, never corpus-sized data
        rn = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        return scored.select("doc_id", "score", rn.cast("int").alias("pos"))
    cand = scored.select("doc_id", "score")
    # bounded candidate ids prune the docs scan (broadcast semi-join)
    cdocs = docs.join(
        F.broadcast(cand.select("doc_id")), "doc_id", "left_semi"
    )
    tsets = candidate_term_sets(cdocs, terms, title_col, url_col, text_col)
    pairs = _pair_jaccard(tsets).withColumn("g", F.lit(1))
    attrs = (
        cand.join(
            cdocs.select("doc_id", F.col(url_col).alias("url")), "doc_id", "left"
        )
        .withColumn("g", F.lit(1))
    )
    kernel = _greedy_kernel(programming_domains, is_programming_query(terms))
    return (
        attrs.groupBy("g")
        .cogroup(pairs.groupBy("g"))
        .applyInPandas(kernel, schema="doc_id long, score double, pos int")
    )
