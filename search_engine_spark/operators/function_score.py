"""ES ``function_score`` — deterministic score shaping over transcripts.

Generalizes ``operators/recency.py`` (the exponential-decay special
case) to the full public function_score contract the engine can honor
deterministically:

* ``field_value_factor`` — ``modifier(factor * field)`` with the ES
  modifiers (none, log1p, ln1p, sqrt, square, reciprocal) and a
  ``missing`` default for NULL fields;
* ``weight`` — a constant multiplier clause;
* ``random_score`` — the DETERMINISTIC variant only: uniform [0, 1)
  derived from ``md5(conv_id:turn_idx:seed)`` (the ES seed+field form;
  the seedless wall-clock form is nondeterministic and deliberately
  not offered — results must be reproducible).  The hash formula is
  shared verbatim with the contract oracle.

Function values combine via ``score_mode`` (multiply | sum | max | min
| avg) and the combined value joins the BM25 score via ``boost_mode``
(multiply | sum | replace) — the ES names.

Losslessness: like recency, the shaped order is not monotone in BM25,
so the operator rescores the FULL match set (``index.matches_scored``,
one grouped kernel pass over the query terms' postings) instead of
shaping a top-N overfetch that could silently drop true winners.

Scale shape: the match set is query-bounded; the metadata join reads
ONLY the referenced fields through a column-pruned scan and
AQE-broadcasts the small side; every function is a scalar JVM
expression (no UDF); the final cut is a TakeOrderedAndProject.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

MODIFIERS = ("none", "log1p", "ln1p", "sqrt", "square", "reciprocal")
SCORE_MODES = ("multiply", "sum", "max", "min", "avg")
BOOST_MODES = ("multiply", "sum", "replace")

#: 16^15 = 2^60 — the md5-prefix uniform denominator (exactly
#: representable in a double, so the division is exact scaling).
_HASH_DEN = float(16 ** 15)


def _modifier(col: Column, modifier: str) -> Column:
    if modifier == "none":
        return col
    if modifier == "log1p":
        return F.log10(F.lit(1.0) + col)
    if modifier == "ln1p":
        return F.log1p(col)
    if modifier == "sqrt":
        return F.sqrt(col)
    if modifier == "square":
        return col * col
    if modifier == "reciprocal":
        # IEEE semantics (the ES contract runs on Java doubles): 1/0 is
        # +Infinity, not an error — guard explicitly because Spark's
        # ANSI mode turns a zero divisor into DIVIDE_BY_ZERO instead
        return F.when(col == 0.0, F.lit(float("inf"))).otherwise(
            F.lit(1.0) / col
        )
    raise ValueError(f"modifier must be one of {MODIFIERS}, got {modifier!r}")


def random_uniform_col(seed: str) -> Column:
    """Deterministic uniform [0, 1) per (conv_id, turn_idx) — the first
    15 hex digits (60 bits) of md5 over 'conv:turn:seed', scaled.  The
    oracle computes the identical expression in Python."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("conv_id"),
                    F.col("turn_idx").cast("string"),
                    F.lit(str(seed)),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("double")
    return h / F.lit(_HASH_DEN)


def _fn_col(fn: dict) -> Column:
    kind = fn.get("kind")
    if kind == "weight":
        return F.lit(float(fn["weight"]))
    if kind == "random_score":
        return random_uniform_col(fn.get("seed", "0"))
    if kind == "field_value_factor":
        field = fn["field"]
        factor = float(fn.get("factor", 1.0))
        modifier = fn.get("modifier", "none")
        missing = float(fn.get("missing", 1.0))
        base = F.coalesce(
            F.col(field).cast("double"), F.lit(missing)
        ) * F.lit(factor)
        return _modifier(base, modifier)
    raise ValueError(
        f"function kind must be field_value_factor|weight|random_score, "
        f"got {kind!r}"
    )


def _combine(cols: list[Column], score_mode: str) -> Column:
    if score_mode == "multiply":
        return reduce(lambda a, b: a * b, cols)
    if score_mode == "sum":
        return reduce(lambda a, b: a + b, cols)
    if score_mode == "max":
        return F.greatest(*cols) if len(cols) > 1 else cols[0]
    if score_mode == "min":
        return F.least(*cols) if len(cols) > 1 else cols[0]
    if score_mode == "avg":
        return reduce(lambda a, b: a + b, cols) / F.lit(float(len(cols)))
    raise ValueError(f"score_mode must be one of {SCORE_MODES}, got {score_mode!r}")


def function_score_topk(
    index,
    transcripts: DataFrame,
    query_text: str,
    functions: list[dict],
    mode: str = "disjunctive",
    k: int = 10,
    score_mode: str = "multiply",
    boost_mode: str = "multiply",
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
    spec=None,
) -> DataFrame:
    """function_score top-k → DataFrame(conv_id, turn_idx, score,
    final_score) ordered by (final_score desc, conv_id, turn_idx).
    ``score`` is the undecorated BM25 (kept for display, like recency).
    Composes with tombstones/scope/analyzed/spec like ``topk``."""
    if not functions:
        raise ValueError("functions must be non-empty")
    if boost_mode not in BOOST_MODES:
        raise ValueError(
            f"boost_mode must be one of {BOOST_MODES}, got {boost_mode!r}"
        )
    scored = index.matches_scored(
        query_text, mode, tombstones=tombstones, scope=scope, analyzed=analyzed, spec=spec
    )
    fields = sorted(
        {
            fn["field"]
            for fn in functions
            if fn.get("kind") == "field_value_factor"
        }
        - {"conv_id", "turn_idx"}
    )
    meta = transcripts.select("conv_id", "turn_idx", *fields)
    combined = _combine([_fn_col(fn) for fn in functions], score_mode)
    if boost_mode == "multiply":
        final = F.col("score") * combined
    elif boost_mode == "sum":
        final = F.col("score") + combined
    else:  # replace
        final = combined
    return (
        scored.join(meta, ["conv_id", "turn_idx"])
        .withColumn("final_score", final)
        .select("conv_id", "turn_idx", "score", "final_score")
        .orderBy(F.desc("final_score"), F.asc("conv_id"), F.asc("turn_idx"))
        .limit(k)
    )
