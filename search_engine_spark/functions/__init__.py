"""Shared expression helpers."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Nudge before rounding: Spark and DuckDB can disagree by 1 ulp on a
# value that lands exactly on a rounding boundary (HALF_UP vs the float
# representation below the boundary).  Adding 1e-9 on BOTH engines moves
# boundary-straddling values to the same side, making the rounded
# outputs comparable by exact value hash.
EPS = 1e-9


def rnd(col: Column, scale: int) -> Column:
    """Round with the cross-engine epsilon nudge (Spark side)."""
    return F.round(col + F.lit(EPS), scale)


def rnd_sql(expr: str, scale: int) -> str:
    """Round with the cross-engine epsilon nudge (DuckDB SQL side)."""
    return f"round(({expr}) + 1e-9, {scale})"
