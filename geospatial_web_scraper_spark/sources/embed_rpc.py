"""S5/A4 — the real embedding-RPC source (reference ``api.go:22-49,179-247``).

``rpc_embed`` is the Arrow-batched distributed form of
``GetBatchedEmbeddings``: every partition slices its Arrow batches into
≤``batch_size``-text JSON POSTs (the reference's ``batchSize = 50`` flush
unit, ``api.go:179``) against a configurable HTTP endpoint, with the exact
wire shape of the reference — request ``{"texts": [...]}``
(``structs.go:40-42``), response ``{"embeddings": [[...]]}``
(``structs.go:44-46``), embeddings positionally 1-1 with the texts.

``embed_with_cache`` is the ``Manager.Close`` dataflow (``api.go:190-247``):
producers drop URLs already in the cache (the J4 cache-membership check →
a left-anti join), the consumer batches the remaining descriptions into
≤50-text RPC calls, and the results merge into the cache. The reference's
goroutine/channel/mutex machinery collapses into two joins and one
``mapInPandas`` — the batching that Go does with a channel consumer is what
Spark partitioning already provides.

The driver's correctness queries keep the deterministic pseudo-embedding
(no network in the sandbox); this module is the production path, exercised
in pytest against a local stub HTTP server (the reference's own test
pattern, ``crawler2_test.go:80-112``).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

EMBED_TYPE = T.ArrayType(T.DoubleType())
BATCH_SIZE = 50  # api.go:179
RETRIES = 3  # transient-failure retries per batch POST
BACKOFF_S = 0.2  # exponential base: 0.2, 0.4, 0.8


def _post_batch(
    endpoint: str,
    texts: list[str],
    timeout: float,
    retries: int = RETRIES,
    backoff_s: float = BACKOFF_S,
) -> list:
    """One ``GetBatchedEmbeddings`` call (api.go:22-49), with bounded
    exponential-backoff retry on transient failures (HTTP 5xx / URL or
    socket errors) so one flaky 500 doesn't fail the whole Spark stage.
    4xx responses are permanent and raise immediately."""
    payload = json.dumps({"texts": texts}).encode("utf-8")
    attempt = 0
    while True:
        req = urllib.request.Request(
            endpoint, data=payload,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return json.loads(resp.read().decode("utf-8"))["embeddings"]
        except urllib.error.HTTPError as e:
            if e.code < 500 or attempt >= retries:
                raise
        except (urllib.error.URLError, OSError):
            if attempt >= retries:
                raise
        time.sleep(backoff_s * (2 ** attempt))
        attempt += 1


def rpc_embed(
    df: DataFrame,
    endpoint: str,
    text_col: str = "description",
    out_col: str = "embedding",
    batch_size: int = BATCH_SIZE,
    timeout: float = 30.0,
) -> DataFrame:
    """Append ``out_col: array<double>`` by POSTing ``text_col`` to the
    embedding service in ≤``batch_size``-text batches.

    Executor-side fan-out: each partition issues its own sequence of POSTs
    (ceil(rows/batch_size) per Arrow batch), so RPC concurrency ==
    partition count — the Spark analog of the reference's single consumer
    goroutine, times the cluster. No per-row Python, no driver round-trip.

    Delivery contract: AT-LEAST-ONCE. ``_post_batch`` retries transient
    failures with bounded backoff, and a Spark TASK retry (executor loss,
    speculative run) re-POSTs the whole partition's batches — the service
    must be idempotent per text, which an embedding endpoint is (same text
    → same vector; the reference's cache makes the same assumption,
    api.go:190-247). Plan-level double-firing is separately guarded by the
    eager localCheckpoint in :func:`embed_with_cache`."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, EMBED_TYPE)]
    )

    def gen(batches):
        for pdf in batches:
            texts = [
                "" if t is None else str(t) for t in pdf[text_col].tolist()
            ]
            embs: list = []
            for s in range(0, len(texts), batch_size):
                embs.extend(_post_batch(endpoint, texts[s : s + batch_size], timeout))
            out = pdf.copy()
            out[out_col] = pd.Series(embs, index=pdf.index, dtype=object)
            yield out

    return df.mapInPandas(gen, out_schema)


def embed_with_cache(
    cache: DataFrame,
    new_nodes: DataFrame,
    endpoint: str,
    url_col: str = "url",
    text_col: str = "description",
    emb_col: str = "embedding",
    batch_size: int = BATCH_SIZE,
    timeout: float = 30.0,
) -> tuple[DataFrame, DataFrame]:
    """``Manager.Close`` (api.go:190-247): embed only cache-miss URLs, merge
    into the cache. Returns ``(updated_cache, newly_embedded)``.

    * the producers' seen-check = dropDuplicates(url) + left-anti join vs
      the cache (J4) — first occurrence wins, already-cached URLs never
      reach the RPC;
    * the consumer's ≤50 batch flush = :func:`rpc_embed`;
    * the mutex-guarded cache write = a unionByName (both sides immutable
      DataFrames — the merge is a plan, not a race)."""
    misses = (
        new_nodes.select(url_col, text_col)
        .dropDuplicates([url_col])
        .join(cache.select(url_col), url_col, "left_anti")
    )
    embedded = rpc_embed(
        misses, endpoint, text_col=text_col, out_col=emb_col,
        batch_size=batch_size, timeout=timeout,
    ).localCheckpoint(eager=True)
    # materialized eagerly: the RPC is a side-effecting source, so each miss
    # must be POSTed exactly once no matter how many consumers reuse the
    # result (cache union + caller's reads would otherwise re-fire it)
    updated = cache.select(url_col, text_col, emb_col).unionByName(
        embedded.select(url_col, text_col, emb_col)
    )
    return updated, embedded
