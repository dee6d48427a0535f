"""cleanHTML char-filter parity (P1, PreIndexer.java:48-75).

Three-way parity (Spark column expression ≡ DuckDB SQL twin ≡ pure-
Python mirror, all built from the same pattern table), the reference's
documented semantics (code-content duplication, subtree drops, entity
decode, allowlist), tokenizer composition, and the BuildConfig flag
end-to-end: an index built from HTML-wrapped transcripts with
``html_clean=True`` must rank identically to one built from pre-cleaned
text.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from search_engine_spark.textproc.htmlclean import (
    clean_html_col,
    clean_html_py,
    clean_html_sql,
)

SAMPLES = [
    '<html><head><style>h1{color:red}</style><meta charset="utf-8"></head>'
    "<body><h1>Hello &amp; welcome</h1><p>x &lt; y</p>"
    "<pre>arr[i] += 1</pre><script>alert(1)</script></body></html>",
    "plain text no markup at all",
    "<!-- comment <script>hidden</script> --><b>bold</b> <code>a.b.c</code>",
    '<CODE CLASS="x">UPPER tag</CODE><svg><circle/></svg>',
    "<p>unclosed <code>trailing",
    "entity soup &amp;lt; &quot;q&quot; &nbsp; &#39;a&#39;",
    "<noscript>fallback</noscript><link rel=x><tt>mono</tt>",
    "",
]


def test_three_way_parity(spark):
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "i int, t string"
    )
    got = {r.i: r.c for r in df.select("i", clean_html_col("t").alias("c")).collect()}
    for i, s in enumerate(SAMPLES):
        py = clean_html_py(s)
        lit = "'" + s.replace("'", "''") + "'"
        sql = con.sql(f"SELECT {clean_html_sql(lit)} AS c").fetchone()[0]
        assert got[i] == py, (i, got[i], py)
        assert sql == py, (i, sql, py)


def test_reference_semantics():
    """The rules the reference pins (PreIndexer.java:48-75)."""
    out = clean_html_py(SAMPLES[0])
    # script subtree gone, style subtree gone
    assert "alert" not in out and "color" not in out
    # code content DUPLICATED (once in body text, once re-appended)
    assert out.count("arr[i] += 1") == 2
    # entities decoded, allowlisted chars survive
    assert "Hello & welcome" in out and "x < y" in out
    # comments remove their contents entirely (even markup inside)
    assert "hidden" not in clean_html_py(SAMPLES[2])
    # tag matching is case-insensitive
    assert clean_html_py(SAMPLES[3]).count("UPPER tag") == 2
    # noscript dropped, tt extracted like code
    out7 = clean_html_py(SAMPLES[6])
    assert "fallback" not in out7 and out7.count("mono") == 2


def test_tokenizer_composition():
    """Cleaned HTML flows through the shared tokenizer exactly like the
    plain text it reduces to — the P1→P2 pipe."""
    from search_engine_spark.textproc import analyze_text

    html = "<p>running caresses</p><code>object.method</code>"
    assert analyze_text(clean_html_py(html)) == analyze_text(
        "running caresses object.method object.method"
    )


@pytest.mark.slow
def test_build_flag_end_to_end(spark, tmp_path):
    """BuildConfig(html_clean=True) over HTML-wrapped transcripts ranks
    identically to a plain build over the pre-cleaned text."""
    from search_engine_spark.config import BuildConfig
    from search_engine_spark.corpus import transcripts_spark_df
    from search_engine_spark.index.build import build_index
    from search_engine_spark.index.reader import CompressedIndex

    tr = transcripts_spark_df(spark, "xs")
    wrapped = tr.withColumn(
        "text",
        F.concat(
            F.lit("<html><body><p>"),
            F.col("text"),
            F.lit("</p><script>no()</script></body></html>"),
        ),
    )
    pre_cleaned = wrapped.withColumn("text", clean_html_col("text"))

    a = str(tmp_path / "idx_flag")
    b = str(tmp_path / "idx_pre")
    build_index(spark, wrapped, a, BuildConfig(num_groups=2, html_clean=True))
    build_index(spark, pre_cleaned, b, BuildConfig(num_groups=2))
    ia, ib = CompressedIndex(spark, a), CompressedIndex(spark, b)
    for q in ("term0001 term0002", "term0000"):
        ra = [(r.conv_id, r.turn_idx, round(r.score, 6))
              for r in ia.topk(q, "disjunctive", 10).collect()]
        rb = [(r.conv_id, r.turn_idx, round(r.score, 6))
              for r in ib.topk(q, "disjunctive", 10).collect()]
        assert ra == rb, q
    # and the filter actually did something: "script" never indexed
    assert ia.meta["n_docs"] == ib.meta["n_docs"]


def test_final_stage_variants_equivalent():
    """Documents the round-5 cost investigation: the fused single-pass
    (`[^allow]+` -> " ") and the reference's two-pass form are
    output-equivalent (the space char is itself outside the allowlist).
    The two-pass form ships because it MEASURED fastest on the JVM;
    this pins the equivalence so the fused form stays a valid swap."""
    import random
    import re
    import string

    from search_engine_spark.textproc.htmlclean import ALLOW_RE, WS_RE

    rng = random.Random(7)
    alphabet = string.printable + "\u00e9\u6f22&<>"
    for _ in range(5000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        two_pass = re.sub(WS_RE, " ", re.sub(ALLOW_RE, " ", s)).strip()
        fused = re.sub(ALLOW_RE + "+", " ", s).strip()
        assert two_pass == fused, s
