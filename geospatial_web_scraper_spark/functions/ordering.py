"""Deterministic global sequence assignment — scalable total-order ranks.

A naive ``row_number() OVER (ORDER BY ...)`` with no partition key collapses
the whole DataFrame into a single reducer — fine at 10^3 rows, fatal at 10^10.
:func:`with_global_seq` instead uses the classic two-pass pattern:

1. range-repartition + sort within partitions on the order key (Spark's
   distributed sample sort — the same machinery as ``orderBy``),
2. one tiny driver-side pass over per-partition row counts to compute
   cumulative offsets, then a *partition-local* ``row_number`` plus the
   broadcast offset.

Cost: one extra count job over already-shuffled data; no single-reducer
stage. This is how the crawl trace's contiguous ``seq`` stays exact at
frontier scale (SURVEY.md §8.2 total-order contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_seq(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "seq",
    start: int = 0,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Returns (df with contiguous ``seq_col`` starting at ``start`` in
    ``order_cols`` order, total row count) — the count falls out of the
    offset pass for free."""
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    cols = [F.col(c) for c in order_cols]
    d = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = sorted(
        (r["_pid"], r["cnt"])
        for r in d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets: dict[int, int] = {}
    acc = start
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    total = acc - start
    if not offsets:
        return df.withColumn(seq_col, F.lit(0).cast("long")).limit(0), 0
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]  # k1,v1,k2,v2,...
        ),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    out = d.withColumn(
        seq_col, (F.row_number().over(w) - 1 + offset_expr).cast("long")
    ).drop("_pid")
    return out, total
