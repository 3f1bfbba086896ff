"""Lineage checkpoint that also RESETS Catalyst size statistics.

``DataFrame.localCheckpoint`` truncates the executed lineage but copies the
origin plan's statistics into the resulting ``LogicalRDD``. For iterative
operators that repeatedly SELF-JOIN their own checkpointed output (pointer
doubling in :func:`...operators.dedup.connected_components`, chain
resolution in ``redirects``), that copy compounds: every join MULTIPLIES
the two input ``sizeInBytes`` estimates, so a self-join doubles the
estimate's bit length and after ~17 nested joins the driver is doing
multi-megabit ``BigInteger`` multiplications inside the size-only stats
visitor — measured r5: a 2-row final contraction round took 43 s of pure
driver CPU (Karatsuba/Toom-Cook frames in the thread dump) with no job
running longer than 0.2 s.

:func:`checkpoint` below materializes via ``localCheckpoint`` exactly like
before, then rewraps the already-computed internal row RDD in a fresh
``LogicalRDD`` with DEFAULT statistics (``internalCreateDataFrame`` — the
same package-private constructor Spark's own streaming sinks use; it does
NOT recompute anything). Estimates reset to ``spark.sql.defaultSizeInBytes``
per step, so join-strategy choice behaves exactly as it does for any other
unknown-size leaf, and AQE still re-plans from runtime sizes. If the
private constructor ever disappears, the fallback is the plain checkpoint —
correct, just slower on deep self-join chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint()`` + statistics reset (see module docstring)."""
    ck = df.localCheckpoint()
    try:
        from pyspark.sql.classic.dataframe import (
            DataFrame as _ClassicDataFrame,
        )

        jdf = ck._jdf
        spark = ck.sparkSession
        jrdd = jdf.queryExecution().toRdd()
        njdf = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        return _ClassicDataFrame(njdf, spark)
    except Exception:  # pragma: no cover - fallback for future Spark APIs
        return ck
