"""Rendezvous (highest-random-weight) shard assignment for the URL
frontier — the partitioning primitive under every sharded structure in
the engine (seen-set bitmap shards, per-host queues, snapshot layout).

A 10^10-URL frontier sharded by ``hash(url) % n`` reshuffles ~100% of
its keys whenever ``n`` changes — resizing the seen-set or adding a
fetch fleet invalidates every shard. Rendezvous hashing (Thaler &
Ravishankar 1998; the scheme behind consistent routing in Cassandra/
Riak-style rings without the ring) assigns each key to
``argmax_s hash(s, key)``: when a shard is ADDED, a key moves only if
the new shard wins its argmax — i.e. exactly an expected ``1/(n+1)``
of keys move, and every one of them moves TO the new shard (nothing
relocates between surviving shards). Removal is symmetric: only the
dead shard's keys move. Both properties are exact, not probabilistic
folklore, and are pinned by tests/test_rendezvous.py.

Engine-portability: the per-(shard, key) weight is the repo's md5-based
60-bit hash (``dedup._md5_hash64_expr``) of ``'s:key'``, so the full
assignment — including the argmax tie-break (higher hash wins; on the
2^-60 chance of a tie, the higher shard id) — reproduces digit-for-
digit in the DuckDB oracle (same doctrine as the CMS bucket hash).

Scale shape: ONE narrow projection, no shuffle, no UDF — the argmax is
a native ``array_max`` over an ``n_shards``-element struct array built
by ``transform(sequence(...))`` (struct comparison is lexicographic:
hash first, shard id second). O(n_shards) work per row, evaluated
inside whole-stage codegen; a 1000-executor scan assigns its partition
locally and nothing moves until the writer's own partitionBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_hash64_expr


def _weight_array(key: Column, n_shards: int) -> Column:
    """``ARRAY<STRUCT<h, sid>>`` of the per-shard md5 weights for key."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        lambda s: F.struct(
            _md5_hash64_expr(
                F.concat(s.cast("string"), F.lit(":"), key)
            ).alias("h"),
            s.alias("sid"),
        ),
    )


def rendezvous_shard_expr(key: Column, n_shards: int) -> Column:
    """Column: the winning shard id in ``[0, n_shards)`` for ``key``."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return F.array_max(_weight_array(key, n_shards))["sid"].cast("int")


def rendezvous_reshard_expr(key: Column, n_old: int, n_new: int) -> Column:
    """``STRUCT<old INT, new INT, moved BOOLEAN>`` — the key's shard at
    ``n_old`` AND at ``n_new`` shards from ONE weight array: the old
    assignment is the argmax restricted to ``sid < n_old``, so the
    ``n_old`` weights are hashed once instead of twice (the md5 array is
    bound via the ``transform(array(x), a -> ...)[0]`` trick — HOF input
    arguments are evaluated once, only lambda-BODY subtrees lack CSE;
    the two argmaxes inside the body scan the bound in-memory array,
    no re-hash). ``moved`` is the resize witness: by the HRW argmax
    property it implies ``new >= n_old`` (an added shard only ever
    steals keys for itself)."""
    if not 1 <= n_old < n_new:
        raise ValueError(
            f"need 1 <= n_old < n_new, got {n_old}, {n_new}"
        )
    return F.transform(
        F.array(_weight_array(key, n_new)),
        lambda a: F.struct(
            F.array_max(F.filter(a, lambda x: x["sid"] < n_old))["sid"]
            .cast("int")
            .alias("old"),
            F.array_max(a)["sid"].cast("int").alias("new"),
            (
                F.array_max(F.filter(a, lambda x: x["sid"] < n_old))["sid"]
                != F.array_max(a)["sid"]
            ).alias("moved"),
        ),
    )[0]


def rendezvous_assign(
    df: DataFrame, key_col: str, n_shards: int, out_col: str = "shard"
) -> DataFrame:
    """Append the rendezvous shard id of ``key_col`` as ``out_col``."""
    return df.withColumn(
        out_col, rendezvous_shard_expr(F.col(key_col), n_shards)
    )
