"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Generates the ``transcripts`` table with the authoritative input shape from
BASELINE.json ``input_hint``::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

No external data: everything derives from a fixed seed (42), a frozen
500-word English list checked into the repo, and ``term{k:04d}`` synthetic
stems.  Token frequencies are Zipf(s=1.1) so head terms are skewed (the
salting tests depend on this).  Pure numpy/pandas — importable without
Spark so the oracle tests stay light.
"""

from __future__ import annotations

from dataclasses import dataclass
from importlib import resources

import numpy as np
import pandas as pd

SEED = 42
ZIPF_S = 1.1
VOCAB_SYNTH = 4500
ROLES = ("user", "assistant", "tool", "system")
TOOLS = ("bash", "search", "edit")

# Frozen list of tokenizer edge cases derived from PreIndexer.java:93-163
# semantics (dotted tokens, operator exprs, array access, extensions, paths,
# stopwords from both lists, single chars, mixed case, numbers,
# Porter-sensitive words) — FIXTURES.md §1.1.
EDGE_SNIPPETS = (
    "object.method a.b.c",
    "x+=1 a*b x=y",
    "arr[i] buf[0]",
    ".py .js",
    "/usr/local/bin /etc/spark-defaults.conf",
    "the of and about above",  # index-side stopwords
    "almost alone along already although",  # query-side stopwords
    "a x 7",  # single chars (dropped by len<=1 rule)
    "PySpark HTTPServer",
    "42 3.14",
    "running caresses ponies relational conflated hopping",
    "us uk vs war",  # importantTerms allowlist members
)

PHRASE = "phrase alpha beta"

_XS = dict(n_convs=20, turns_per_conv=5)
_SM = dict(n_convs=200, turns_per_conv=25)
_MD = dict(n_convs=2000, turns_per_conv=50)
_LG = dict(n_convs=20000, turns_per_conv=50)  # 1M turns — scaling evidence
_XL = dict(n_convs=80000, turns_per_conv=50)  # 4M turns — formal scaling run
_XXL = dict(n_convs=160000, turns_per_conv=50)  # 8M turns — scaling headline
SCALES = {"xs": _XS, "sm": _SM, "md": _MD, "lg": _LG, "xl": _XL, "xxl": _XXL}


def _vocab() -> list[str]:
    english = (
        resources.files("search_engine_spark.textproc")
        .joinpath("data", "english_words.txt")
        .read_text()
        .split()
    )
    assert len(english) == 500
    return [f"term{k:04d}" for k in range(VOCAB_SYNTH)] + english


@dataclass(frozen=True)
class CorpusSpec:
    n_convs: int
    turns_per_conv: int

    @property
    def n_turns(self) -> int:
        return self.n_convs * self.turns_per_conv


def generate_transcripts(scale: str = "sm", seed: int = SEED) -> pd.DataFrame:
    """Generate the transcripts fixture at ``scale`` ∈ {xs, sm, md}."""
    spec = CorpusSpec(**SCALES[scale])
    rng = np.random.default_rng(seed)
    vocab = np.asarray(_vocab(), dtype=object)
    v = len(vocab)

    # Zipf(s=1.1) rank probabilities over the vocab.
    ranks = np.arange(1, v + 1, dtype=np.float64)
    probs = ranks ** (-ZIPF_S)
    probs /= probs.sum()

    n = spec.n_turns
    lengths = rng.integers(8, 121, size=n)
    empty_mask = rng.random(n) < 0.02
    token_ids = rng.choice(v, size=int(lengths.sum()), p=probs)

    conv_ids: list[str] = []
    turn_idxs = np.empty(n, dtype=np.int32)
    roles: list[str] = []
    tools: list[str | None] = []
    texts: list[str] = []

    pos = 0
    g = 0  # global turn number
    for ci in range(spec.n_convs):
        conv = f"conv-{ci:06d}"
        role_off = ci % len(ROLES)
        for ti in range(spec.turns_per_conv):
            ln = int(lengths[g])
            toks = token_ids[pos : pos + ln]
            pos += ln
            if empty_mask[g]:
                text = ""
            else:
                parts = [" ".join(vocab[toks])]
                if g % 50 == 0:
                    parts.append(EDGE_SNIPPETS[(g // 50) % len(EDGE_SNIPPETS)])
                if g % 97 == 0:
                    parts.append(PHRASE)
                text = " ".join(parts)
            role = ROLES[(role_off + ti) % len(ROLES)]
            conv_ids.append(conv)
            turn_idxs[g] = ti
            roles.append(role)
            tools.append(TOOLS[g % len(TOOLS)] if role == "tool" else None)
            texts.append(text)
            g += 1

    ts = pd.Timestamp("2026-01-01T00:00:00Z").tz_localize(None) + pd.to_timedelta(
        np.arange(n) * 60, unit="s"
    )
    return pd.DataFrame(
        {
            "conv_id": pd.array(conv_ids, dtype="string"),
            "turn_idx": turn_idxs,
            "role": pd.array(roles, dtype="string"),
            "text": pd.array(texts, dtype="string"),
            "tool": pd.array(tools, dtype="string"),
            "ts": ts,
        }
    )


TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def transcripts_spark_df(spark, scale: str = "xs", seed: int = SEED):
    """NULL-safe Spark DataFrame for the transcripts fixture.

    Works under ANY session — Arrow on or off.  ``generate_transcripts``
    returns pandas ``string`` extension columns holding ``pd.NA``; a
    no-Arrow session's row-inference fallback mis-infers ``pd.NA`` as an
    empty struct and crashes ``createDataFrame`` with CANNOT_MERGE_TYPE
    (the grading driver runs exactly such a session — CORRECTNESS_r04).
    Convert the nullable string columns to object dtype with real
    ``None`` and pass the explicit schema so inference never runs; the
    numeric/timestamp columns keep their numpy dtypes (converting them
    to object breaks the no-Arrow timestamp verifier instead).
    """
    pdf = generate_transcripts(scale, seed)
    safe = pdf.copy()
    for c in ("conv_id", "role", "text", "tool"):
        col = pdf[c]
        safe[c] = col.astype(object).where(col.notna(), None)
    return spark.createDataFrame(safe, schema=TRANSCRIPTS_SCHEMA)


def write_transcripts_parquet(path: str, scale: str = "sm", seed: int = SEED) -> str:
    """Materialize the fixture as a single parquet file; returns the path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = generate_transcripts(scale, seed)
    schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ]
    )
    # small row groups: Spark file splits can only parallelize across row
    # groups — a single-row-group file makes every read effectively 1 task
    pq.write_table(
        pa.Table.from_pandas(df, schema=schema, preserve_index=False),
        path,
        row_group_size=20000,
    )
    return path


# --- the frozen reference query set (FIXTURES.md §2) ---
# mode: "disjunctive" (BM25 over union — default) or "conjunctive"
# (all terms required, QueryService.java:595-615).
REFERENCE_QUERIES: list[dict] = [
    {"query_id": 0, "query_text": "term0000", "mode": "disjunctive", "k": 10},
    {"query_id": 1, "query_text": "term0001 term0002", "mode": "disjunctive", "k": 10},
    {"query_id": 2, "query_text": "term0000 term0007", "mode": "conjunctive", "k": 10},
    {"query_id": 3, "query_text": "term4499", "mode": "disjunctive", "k": 10},  # rare tail term
    {"query_id": 4, "query_text": "zzzznotacorpusword", "mode": "disjunctive", "k": 10},
    {"query_id": 5, "query_text": "the of and", "mode": "disjunctive", "k": 10},  # stopword-only
    {"query_id": 6, "query_text": "us uk", "mode": "disjunctive", "k": 10},  # allowlisted
    {"query_id": 7, "query_text": "RUNNING Ponies", "mode": "disjunctive", "k": 10},
    {"query_id": 8, "query_text": "running run", "mode": "disjunctive", "k": 10},
    {"query_id": 9, "query_text": "arr[i]", "mode": "disjunctive", "k": 10},
    {"query_id": 10, "query_text": "x+=1", "mode": "disjunctive", "k": 10},
    {"query_id": 11, "query_text": "object.method", "mode": "disjunctive", "k": 10},
    {"query_id": 12, "query_text": ".py", "mode": "disjunctive", "k": 10},
    {"query_id": 13, "query_text": '"phrase alpha beta"', "mode": "phrase", "k": 10},
    {"query_id": 14, "query_text": "about above the", "mode": "disjunctive", "k": 10},
    {"query_id": 15, "query_text": "water government people", "mode": "disjunctive", "k": 10},
    {"query_id": 16, "query_text": "school children world", "mode": "conjunctive", "k": 10},
    {"query_id": 17, "query_text": "term0003 term0015 term0042", "mode": "disjunctive", "k": 10},
    {"query_id": 18, "query_text": "relational conflated", "mode": "disjunctive", "k": 10},
    {"query_id": 19, "query_text": "caresses hopping", "mode": "disjunctive", "k": 10},
    {"query_id": 20, "query_text": "term0000 term0001 term0002 term0003", "mode": "disjunctive", "k": 10},
    {"query_id": 21, "query_text": "war israel gaza", "mode": "disjunctive", "k": 10},
    {"query_id": 22, "query_text": "PySpark HTTPServer", "mode": "disjunctive", "k": 10},
    {"query_id": 23, "query_text": "/usr/local/bin", "mode": "disjunctive", "k": 10},
    {"query_id": 24, "query_text": "42 3.14", "mode": "disjunctive", "k": 10},
    {"query_id": 25, "query_text": "term0004 term4498", "mode": "disjunctive", "k": 10},
    {"query_id": 26, "query_text": "term0005 world", "mode": "conjunctive", "k": 10},
    {"query_id": 27, "query_text": '"term0000 term0001" AND "term0002"', "mode": "boolean", "k": 10},
    {"query_id": 28, "query_text": '"phrase alpha" OR "term4497"', "mode": "boolean", "k": 10},
    {"query_id": 29, "query_text": '"term0000" NOT "term0001"', "mode": "boolean", "k": 10},
]
