"""As-of (temporal) join: attach the most recent right-side value at or
before each left row's timestamp, per key.

The classic shapes in a crawl/analytics stack: trades×quotes, click×last
view, fetch×last robots snapshot, metric×last config change. Spark has no
native ASOF JOIN (DuckDB and Pandas do), and the naive theta-join
``l.ts >= r.ts`` + max() is a quadratic range join. The distributed
reduction below is the standard one:

1. tag both sides and UNION them into one stream
   (right rows sort before left rows at equal ts → inclusive semantics);
2. one shuffle on the join key;
3. within each key, ``last(value ignorenulls)`` over the running window
   carries the latest right value forward onto every left row.

Scale shape (10^10 events): exactly ONE Exchange on the key column; the
window partitions by the KEY (user/host — high cardinality), never a
global or low-cardinality window, so no reducer sees more than one key's
rows. Memory per task is O(1): ``rowsBetween(unboundedPreceding, 0)`` with
``last()`` is a running accumulator, not a buffered frame.

Determinism contract: the right side must be unique per (key, ts) —
pre-aggregate duplicates (the query layer uses max(value)) — because rows
equal on the full sort key have no defined order under Spark's window.
Right-side NULL values are carried as present values (the row exists), not
skipped: presence is encoded as a non-null struct wrapper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """Left as-of join → all ``left`` columns + ``out_col`` = the ``right``
    row's ``value_col`` with the greatest ``ts_col`` <= the left row's
    (inclusive; NULL when no right row precedes). ``right`` must be unique
    per (key, ts); see the module docstring for the full contract."""
    payload = F.struct(*[F.col(c) for c in left.columns])
    v_type = f"struct<v:{right.schema[value_col].dataType.simpleString()}>"
    l2 = left.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(v_type).alias("_v"),
        payload.alias("_row"),
    )
    r2 = right.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(F.col(value_col).alias("v")).alias("_v"),
        F.lit(None).cast(l2.schema["_row"].dataType).alias("_row"),
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("_asof", F.last("_v", ignorenulls=True).over(w))
        .where(F.col("_tag") == 1)
        .select("_row.*", F.col("_asof.v").alias(out_col))
    )
