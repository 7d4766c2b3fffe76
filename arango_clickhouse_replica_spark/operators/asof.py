"""Distributed as-of (temporal) join — a custom operator Spark lacks.

For every left row, attach the single most recent right row of the same
key whose timestamp is <= (backward) the left timestamp. This is the
standard event-enrichment primitive (pandas ``merge_asof``, kdb ``aj``,
Flink temporal join); the reference's pass-through SQL surface gets it
from ClickHouse ``ASOF JOIN``.

Implementation is the scalable union-then-carry-forward pattern, NOT a
pairwise join:

    union(tagged left, tagged right)
      -> window partitionBy(key) orderBy(ts, side, tiebreak)
      -> last(right_payload, ignorenulls=True) over rows unbounded..current
      -> keep left rows

Cost at 100 TB: exactly ONE hash-partition shuffle of |L| + |R| rows on
the key (same as any equi-join) and a per-key sort — never the
|L| x |R| inequality-join explosion a naive ``t_r <= t_l`` join plans.
Skewed keys are split by AQE; the carry-forward is a single pass.

Determinism: right rows sort by (ts, tiebreak) ascending and the LAST one
wins, so among equal timestamps the greatest tiebreak is chosen — a total
order both engines can reproduce (the oracle uses
``row_number() over (order by ts desc, tiebreak desc) = 1``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: latest right row with ``right_ts <= left_ts`` per key.

    ``right_cols`` are carried onto the left rows as ``{prefix}{col}``
    (null when no right row precedes). ``tiebreak`` must totally order
    right rows within (key, right_ts); its greatest value wins ties.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("__asof_payload")

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).cast("double").alias("__tb"),
        payload,
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields
          if f.name not in keys],
    )
    l_payload_t = r.schema["__asof_payload"].dataType
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("double").alias("__tb"),
        F.lit(None).cast(l_payload_t).alias("__asof_payload"),
        *[F.col(f.name) for f in left.schema.fields if f.name not in keys],
    )

    # Right rows sort before left rows at equal ts (inclusive <=); among
    # right ties the last (greatest tiebreak) is what last() picks up.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched: Column = F.last("__asof_payload", ignorenulls=True).over(w)

    out_left = [f.name for f in left.schema.fields if f.name not in keys]
    return (
        r.unionByName(l)
        .withColumn("__m", matched)
        .filter(F.col("__side") == 1)
        .select(
            *keys,
            *out_left,
            *[F.col("__m").getField(c).alias(f"{prefix}{c}") for c in right_cols],
        )
    )
