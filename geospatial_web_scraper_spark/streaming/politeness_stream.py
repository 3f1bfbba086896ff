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
STATE_SCHEMA = T.StructType([T.StructField("tokens", T.LongType())])


def token_bucket_admit(
    candidates: DataFrame,
    tokens_per_batch: int = 4,
    bucket_cap: int = 8,
) -> DataFrame:
    """Admit at most ``tokens`` fetch candidates per host per micro-batch.

    ``candidates`` is a *streaming* DataFrame with (host, url). A host
    refills ``tokens_per_batch`` (capped at ``bucket_cap``) only on batches
    where it HAS candidates — hosts absent from a micro-batch never enter
    the stateful function, so idle periods accrue nothing (burst headroom
    builds only while a host's demand stays under its refill). Admission is
    up to the available tokens in url order (deterministic); the remainder
    of the bucket carries forward. Overflow candidates are dropped by this
    operator; a production topology re-queues them upstream (the round
    engine's deferral branch does exactly that). True idle refill would
    store a last-seen batch id in state and credit elapsed intervals.
    """

    def admit(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        tokens = state.get[0] if state.exists else 0
        avail = min(bucket_cap, tokens + tokens_per_batch)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("url", kind="mergesort").reset_index(drop=True)
        take = min(len(pdf), avail)
        left = avail - take
        state.update((left,))
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
