"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered query's Spark builder and its oracle SQL side by side,
then compares row count + column names + an order-insensitive canonical
value multiset (the driver hashes; we keep the values for debuggability).
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import date, datetime
from decimal import Decimal


def _canon(v):
    """Canonical, engine-independent representation of one cell."""
    if v is None:
        return "␀"
    # numpy scalars AND arrays → python (tolist handles both; never use
    # .item(), which silently collapses single-element arrays to scalars)
    if hasattr(v, "tolist") and not isinstance(v, (list, tuple, dict)):
        v = v.tolist()
    if isinstance(v, float):
        if math.isnan(v):
            return "␀"  # pandas renders SQL NULL doubles as NaN
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_canon(v[k])}" for k in sorted(v)) + "}"
    return f"s:{v}"


def canonical_rows(df_pandas) -> Counter:
    cols = sorted(df_pandas.columns)
    out: Counter = Counter()
    for row in df_pandas[cols].itertuples(index=False, name=None):
        out[tuple(_canon(v) for v in row)] += 1
    return out


def compare(spark_df, duck_rel) -> tuple[bool, str]:
    spark_pd = spark_df.toPandas()
    duck_pd = duck_rel.df()
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        return False, f"column mismatch: spark={sorted(spark_pd.columns)} duck={sorted(duck_pd.columns)}"
    if len(spark_pd) != len(duck_pd):
        return False, f"row count mismatch: spark={len(spark_pd)} duck={len(duck_pd)}"
    a, b = canonical_rows(spark_pd), canonical_rows(duck_pd)
    if a != b:
        only_spark = list((a - b).items())[:5]
        only_duck = list((b - a).items())[:5]
        return False, f"value mismatch:\n  only-spark={only_spark}\n  only-duck={only_duck}"
    return True, "ok"


def run_and_compare(spark, duck, query, sf_dir) -> tuple[bool, str]:
    spark_df = query.build(spark, sf_dir)
    duck_rel = duck.sql(query.oracle)
    return compare(spark_df, duck_rel)
