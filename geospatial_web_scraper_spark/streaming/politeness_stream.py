"""Stateful streaming politeness — the reference's fetch semaphores (R2,
``crawler.go:16-17,85-87``: a 40-slot token gate around every fetch) as a
custom stateful streaming operator.

In the round-synchronous engine the token budget is a data column
(operators.politeness). In *continuous* ingest the budget must persist
across micro-batches, which is exactly what ``applyInPandasWithState``
provides: state is keyed by host, lives in the state store (checkpointed,
exactly-once), and each micro-batch admits at most the tokens available,
carrying the remainder forward. At cluster scale the state store shards by
the groupBy key — per-host state never centralizes on the driver.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ADMIT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("tokens_left", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.LongType()),
        T.StructField("last_batch", T.LongType()),
    ]
)


def token_bucket_admit(
    candidates: DataFrame,
    tokens_per_batch: int = 4,
    bucket_cap: int = 8,
    batch_id_col: str | None = None,
) -> DataFrame:
    """Admit at most ``tokens`` fetch candidates per host per micro-batch.

    ``candidates`` is a *streaming* DataFrame with (host, url). Admission is
    up to the available tokens in url order (deterministic); the remainder
    of the bucket carries forward, capped at ``bucket_cap``. Overflow
    candidates are dropped by this operator; a production topology
    re-queues them upstream (the round engine's deferral branch does
    exactly that).

    Refill semantics — two modes:

    * default (``batch_id_col=None``): a host refills ``tokens_per_batch``
      only on batches where it HAS candidates. Hosts absent from a
      micro-batch never enter the stateful function (Spark calls it only
      for keys present in the batch), so idle periods accrue nothing.
    * **idle refill** (``batch_id_col="batch_id"``): candidates carry a
      monotonically increasing batch id (stamp it upstream, e.g. in
      foreachBatch from ``epoch_id``); state stores the last-seen id and a
      returning host is credited ``tokens_per_batch × elapsed_batches``,
      capped at ``bucket_cap`` — quiet hosts earn real burst headroom
      without Spark having to invoke state for absent keys.
    """

    def admit(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        tokens, last_batch = state.get if state.exists else (0, None)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if batch_id_col is not None:
            bid = int(pdf[batch_id_col].max())
            elapsed = 1 if last_batch is None else max(1, bid - last_batch)
        else:
            bid = (last_batch if last_batch is not None else 0) + 1
            elapsed = 1
        avail = min(bucket_cap, tokens + tokens_per_batch * elapsed)
        pdf = pdf.sort_values("url", kind="mergesort").reset_index(drop=True)
        take = min(len(pdf), avail)
        left = avail - take
        state.update((left, bid))
        out = pdf.iloc[:take][["url"]].copy()
        out.insert(0, "host", host)
        out["tokens_left"] = left
        yield out

    return candidates.groupBy("host").applyInPandasWithState(
        admit,
        ADMIT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
