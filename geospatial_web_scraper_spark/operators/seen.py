"""Sharded Bloom URL-seen prefilter (north rule: bloom/cuckoo URL-seen).

The exact seen check is always the left-anti join in the engine (bloom false
positives fall through to it; false negatives are impossible because bits are
only ever set). The bloom's job is the steady-state fast path: in a mature
crawl most candidates are *duplicates*, and of the new ones the bloom proves
"definitely new" without touching the (huge) seen table at all, so the exact
join runs only on the bloom-positive slice.

Layout: ``n_shards`` independent bitmaps keyed by ``url_hash % n_shards``
(url_hash = xxhash64(canonical url)). Bits are set/probed with k-fold double
hashing of the two 32-bit halves of the 64-bit key. Shard bitmaps are built
*distributively* (groupBy shard → applyInPandas → tiny (shard, bitmap) rows)
and OR-merged driver-side, then broadcast for probing.

Scale note (10^10 URLs): a monolithic 1%-FPP bloom for 10^10 keys is ~12 GB —
not broadcastable. The sharded layout is the unit of scale-out: shards become
rows of a bloom *table* co-partitioned with the candidates on
``url_hash % n_shards``, probed via a zip-partition join instead of a
broadcast; the bit math below is unchanged. In this sandbox (≤10^6 URLs) the
broadcast variant is exercised end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import url_hash


class ShardedBloomSeenFilter:
    def __init__(
        self,
        spark: SparkSession,
        n_shards: int = 16,
        bits_per_shard: int = 1 << 20,  # 128 KiB/shard default
        n_hashes: int = 5,
    ):
        if n_shards & (n_shards - 1):
            # probe side uses unsigned mod, build side signed pmod; they agree
            # exactly when n_shards divides 2^64
            raise ValueError("n_shards must be a power of two")
        if bits_per_shard % 8:
            raise ValueError("bits_per_shard must be a multiple of 8")
        self.spark = spark
        self.n_shards = n_shards
        self.m_bits = bits_per_shard
        self.k = n_hashes
        self.bitmaps = np.zeros((n_shards, bits_per_shard // 8), dtype=np.uint8)
        self._bc = None

    # ------------------------------------------------------------- internals
    @staticmethod
    def _positions(hashes: np.ndarray, k: int, m_bits: int) -> np.ndarray:
        """(n,) uint64 → (k, n) bit positions via double hashing."""
        h1 = hashes >> np.uint64(32)
        h2 = hashes & np.uint64(0xFFFFFFFF)
        return np.stack(
            [(h1 + np.uint64(i) * h2) % np.uint64(m_bits) for i in range(k)]
        )

    def _broadcast(self):
        if self._bc is not None:
            self._bc.unpersist()
        self._bc = self.spark.sparkContext.broadcast(self.bitmaps)
        return self._bc

    # ------------------------------------------------------------------ API
    def split(self, df: DataFrame, url_col: str = "url") -> tuple[DataFrame, DataFrame]:
        """→ (definitely_new, maybe_seen). Zero false negatives by
        construction; maybe_seen must still pass the exact anti-join."""
        bc = self._broadcast()
        S, m_bits, k = self.n_shards, self.m_bits, self.k

        @F.pandas_udf("boolean")
        def maybe_seen(h: pd.Series) -> pd.Series:
            bitmaps = bc.value
            v = h.to_numpy(dtype=np.int64).view(np.uint64)
            if len(v) == 0:
                return pd.Series([], dtype=bool)
            shard = (v % np.uint64(S)).astype(np.int64)
            pos = ShardedBloomSeenFilter._positions(v, k, m_bits)
            res = np.ones(len(v), dtype=bool)
            for i in range(k):
                byte = (pos[i] >> np.uint64(3)).astype(np.int64)
                bit = (pos[i] & np.uint64(7)).astype(np.uint8)
                res &= ((bitmaps[shard, byte] >> bit) & 1).astype(bool)
            return pd.Series(res)

        probed = (
            df.withColumn("_h", url_hash(F.col(url_col)))
            .withColumn("_maybe", maybe_seen(F.col("_h")))
            .persist()
        )
        new = probed.filter(~F.col("_maybe")).drop("_h", "_maybe")
        maybe = probed.filter(F.col("_maybe")).drop("_h", "_maybe")
        return new, maybe

    def update(self, urls: DataFrame, url_col: str = "url") -> None:
        """Fold newly-recorded URLs into the shard bitmaps — built
        distributively, merged driver-side (S small rows, not S×rows)."""
        S, m_bits, k = self.n_shards, self.m_bits, self.k

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            local = np.zeros(m_bits // 8, dtype=np.uint8)
            v = pdf["_h"].to_numpy(dtype=np.int64).view(np.uint64)
            pos = ShardedBloomSeenFilter._positions(v, k, m_bits)
            for i in range(k):
                byte = (pos[i] >> np.uint64(3)).astype(np.int64)
                bit = (pos[i] & np.uint64(7)).astype(np.uint8)
                np.bitwise_or.at(local, byte, np.uint8(1) << bit)
            return pd.DataFrame(
                {"shard": [int(pdf["_shard"].iloc[0])], "bitmap": [local.tobytes()]}
            )

        parts = (
            urls.select(url_hash(F.col(url_col)).alias("_h"))
            .withColumn("_shard", F.pmod(F.col("_h"), F.lit(S)))
            .groupBy("_shard")
            .applyInPandas(build, "shard int, bitmap binary")
            .collect()
        )
        for row in parts:
            self.bitmaps[row["shard"]] |= np.frombuffer(row["bitmap"], dtype=np.uint8)

    # ------------------------------------------------------------- metrics
    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bitmaps).mean())

    def est_fpp(self) -> float:
        return float(self.fill_ratio() ** self.k)
