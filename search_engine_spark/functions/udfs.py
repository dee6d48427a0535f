"""Arrow-batched tokenization for Spark.

The tokenizer (reference semantics, PreIndexer.java:93-178) is inherently
per-string Python, so it runs inside ``mapInPandas`` — one Python↔JVM
crossing per Arrow batch, never per row.  Stems are memoized per batch
(the Zipf vocabulary makes the hit rate very high), and the per-turn
(term, tf, positions) aggregation is fused into the same pass so no
explode/shuffle is needed afterwards (SURVEY.md A1 "one pass, no shuffle").
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from ..textproc import analyze_text

# Output schema of tokenize_turns: one row per (turn, distinct term).
TOKEN_SCHEMA = (
    "conv_id string, turn_idx int, term string, tf int, positions array<int>, dl int"
)

# Output schema of doc_stats: one row per turn (including token-less turns).
DOCSTAT_SCHEMA = "conv_id string, turn_idx int, dl int"


def _analyze_batch(texts: pd.Series, stem_cache: dict[str, str]) -> list[list[str]]:
    return [
        analyze_text(t if isinstance(t, str) else "", _stem_cache=stem_cache)
        for t in texts
    ]


def tokenize_turns_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: transcripts batches → per-(turn, term) rows."""
    stem_cache: dict[str, str] = {}
    for pdf in batches:
        conv_ids: list[str] = []
        turn_idxs: list[int] = []
        terms: list[str] = []
        tfs: list[int] = []
        positions: list[list[int]] = []
        dls: list[int] = []
        toks_per_row = _analyze_batch(pdf["text"], stem_cache)
        for conv, ti, toks in zip(pdf["conv_id"], pdf["turn_idx"], toks_per_row):
            dl = len(toks)
            per_term: dict[str, list[int]] = {}
            for pos, t in enumerate(toks):
                per_term.setdefault(t, []).append(pos)
            for t, ps in per_term.items():
                conv_ids.append(conv)
                turn_idxs.append(ti)
                terms.append(t)
                tfs.append(len(ps))
                positions.append(ps)
                dls.append(dl)
        yield pd.DataFrame(
            {
                "conv_id": conv_ids,
                "turn_idx": pd.array(turn_idxs, dtype="int32"),
                "term": terms,
                "tf": pd.array(tfs, dtype="int32"),
                "positions": positions,
                "dl": pd.array(dls, dtype="int32"),
            }
        )


def doc_stats_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one (conv_id, turn_idx, dl) row per turn."""
    stem_cache: dict[str, str] = {}
    for pdf in batches:
        toks_per_row = _analyze_batch(pdf["text"], stem_cache)
        yield pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].astype(object),
                "turn_idx": pdf["turn_idx"].astype("int32"),
                "dl": pd.array([len(t) for t in toks_per_row], dtype="int32"),
            }
        )


def tokenize_turns(transcripts):
    """transcripts DataFrame → (conv_id, turn_idx, term, tf, positions, dl)."""
    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        tokenize_turns_iter, schema=TOKEN_SCHEMA
    )


def doc_stats(transcripts):
    """transcripts DataFrame → (conv_id, turn_idx, dl) for EVERY turn."""
    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        doc_stats_iter, schema=DOCSTAT_SCHEMA
    )
