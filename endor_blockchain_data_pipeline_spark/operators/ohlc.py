"""OHLC / argmin-argmax-by-time aggregation.

Reference parity: the custom open/close UDAFs
(``ratesaggregation/OpenRateAggregator.scala:9-38``,
``CloseRateAggregator.scala:9-38``: keep the value at the earliest/latest
timestamp, merging partial buffers by min/max ts) are exactly the built-in
``min_by``/``max_by`` since Spark 3.0 — one hash aggregate, partial+final,
no UDAF. Ties broken by a secondary id for determinism (the reference's
UDAFs were tie-unstable; tests seeded around it).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def ohlc(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    group_cols: list[str],
    tiebreak_col: str,
    day_col: str = "date",
) -> DataFrame:
    """Per (group, day) OHLC: open/close = value at min/max (ts, tiebreak).

    ``min_by(value, struct(ts, tiebreak))`` — struct ordering is
    lexicographic, so equal timestamps resolve on the tiebreak id; both
    argmin/argmax run in the same single aggregate pass as max/min/avg
    (the reference needed two UDAF instances + merge logic for this,
    ``RatesAggregator.scala:6-13``).
    """
    order = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return (
        df.groupBy(*group_cols, F.to_date(ts_col).alias(day_col))
        .agg(
            F.min_by(F.col(value_col), order).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(F.col(value_col), order).alias("close"),
            F.count("*").alias("n_obs"),
        )
    )


def double_entry_flip(
    df: DataFrame,
    from_col: str,
    to_col: str,
    value_col: str,
) -> DataFrame:
    """Emit each row twice: original + (from<->to swapped, value negated,
    flipped=true) — the reference's double-entry invariant
    (``EthereumTransactionsPipeline.scala:41-45``, ``BlockSummary.scala:22-25``).

    Implemented as explode of a two-struct array: one map-side pass, no
    union-induced double scan of the source.
    """
    other = [c for c in df.columns if c not in (from_col, to_col, value_col)]
    orig = F.struct(
        F.col(from_col).alias(from_col),
        F.col(to_col).alias(to_col),
        F.col(value_col).alias(value_col),
        F.lit(False).alias("flipped"),
    )
    flip = F.struct(
        F.col(to_col).alias(from_col),
        F.col(from_col).alias(to_col),
        (-F.col(value_col)).alias(value_col),
        F.lit(True).alias("flipped"),
    )
    return df.select(*other, F.explode(F.array(orig, flip)).alias("_e")).select(
        *other,
        F.col(f"_e.{from_col}").alias(from_col),
        F.col(f"_e.{to_col}").alias(to_col),
        F.col(f"_e.{value_col}").alias(value_col),
        F.col("_e.flipped").alias("flipped"),
    )
