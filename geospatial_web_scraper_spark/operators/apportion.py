"""Exact largest-remainder budget apportionment — "who gets how many
fetch slots this round".

The politeness scheduler (operators/politeness.py) decides WHICH of a
host's URLs dequeue under its per-host token budget; this operator
decides the budgets themselves: split a global per-round fetch budget
across hosts in proportion to an authority weight (host PageRank, OPIC
history, or any BIGINT score), exactly. That is the classic
apportionment problem, and the classic answer is Hamilton's
largest-remainder method (used for U.S. House seats 1852-1900)::

    base_i  = B * w_i div W          (W = Σ w_i, all BIGINT)
    rem_i   = (B * w_i) mod W
    leftover = B - Σ base_i          (< n by construction)
    quota_i = base_i + 1 for the `leftover` largest remainders
              (ties: remainder desc, then SMALLEST key)

Σ quota_i == B exactly — no float shares, no rounding drift, and the
deterministic tie rule makes the allocation bit-identical in any engine
(the DuckDB oracle replays it digit-for-digit). Hamilton's method is
the unique apportionment staying within ±1 of every exact quota
(it violates house/population monotonicity across DIFFERENT budgets —
irrelevant here, each round apportions once).

The reference crawler has a single global semaphore (`smTokens`,
crawler.go:16) — no per-host shares at all; this is the engine's
beyond-the-reference scheduler arithmetic, feeding
``PolitenessScheduler(budget_table=...)``-style per-host caps.

Scale shape: one scalar sum (a single BIGINT to the driver, same class
as the crawl's per-round counters), one map-side projection for
base/remainder, and the two-pass distributed rank
(functions/ordering.with_global_seq — range-repartition + broadcast
offsets) for the leftover distribution: NO single-reducer global
window at any size. ``B * max(w)`` must stay under 2^63 — pre-scale
heavier weights down first (a rank table in 1e-12 units with B ≤ 10^6
is safely inside the bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ordering import with_global_seq


def largest_remainder_quotas(
    weights: DataFrame,
    budget: int,
    *,
    key_col: str = "host_id",
    weight_col: str = "weight_fp",
) -> DataFrame:
    """Apportion integer ``budget`` over ``weights`` (one row per key,
    non-negative BIGINT weights, at least one positive) by Hamilton's
    largest-remainder method. Returns one row per key::

        (host_id, weight_fp, base_quota, extra, quota)

    all BIGINT, with ``extra`` ∈ {0, 1} and ``Σ quota == budget``
    (pinned in tests/test_apportion.py). Raises on an all-zero or empty
    weight table — an allocation over nothing is a caller bug, not a
    zero-row result."""
    if budget < 0:
        raise ValueError(f"largest_remainder_quotas: negative budget {budget}")
    w = weights.select(
        F.col(key_col).cast("long").alias("host_id"),
        F.col(weight_col).cast("long").alias("weight_fp"),
    )
    total = w.agg(F.sum("weight_fp").alias("s")).collect()[0]["s"]
    if not total or total <= 0:
        raise ValueError(
            "largest_remainder_quotas: empty or all-zero weight table"
        )
    base = w.select(
        "host_id",
        "weight_fp",
        F.expr(f"{budget}L * weight_fp div {total}L").alias("base_quota"),
        F.expr(f"({budget}L * weight_fp) % {total}L").alias("rem"),
    )
    # leftover = B - Σ base < n, so every key gets at most one extra;
    # the two-pass rank orders (rem desc, key asc) without a global window
    leftover = budget - (
        base.agg(F.sum("base_quota").alias("s")).collect()[0]["s"] or 0
    )
    ranked, _ = with_global_seq(
        base.withColumn("_negrem", -F.col("rem")),
        ["_negrem", "host_id"],
        seq_col="_rk",
    )
    return ranked.select(
        "host_id",
        "weight_fp",
        "base_quota",
        F.when(F.col("_rk") < F.lit(leftover), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("extra"),
        (
            F.col("base_quota")
            + F.when(F.col("_rk") < F.lit(leftover), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("quota"),
    )
