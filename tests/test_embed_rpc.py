"""S5/A4: the embedding-RPC source against a local stub HTTP server — the
reference's own test pattern (crawler2_test.go:80-112). Asserts the wire
shape (TextPayload/EmbeddingResponse), the ≤50-text batch boundaries
(api.go:179), and the Close cache-merge semantics (api.go:190-247)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from geospatial_web_scraper_spark.sources.embed_rpc import (
    embed_with_cache,
    rpc_embed,
)


def _emb_of(text: str) -> list:
    """Deterministic pure-function-of-text embedding the stub returns."""
    b = text.encode("utf-8")
    return [float(len(b)), float(sum(b) % 997)]


class _Handler(BaseHTTPRequestHandler):
    def do_POST(self):
        n = int(self.headers["Content-Length"])
        body = json.loads(self.rfile.read(n).decode("utf-8"))
        texts = body["texts"]  # TextPayload wire shape
        with self.server.lock:
            self.server.batch_sizes.append(len(texts))
            fail = self.server.fail_first_n > 0
            if fail:
                self.server.fail_first_n -= 1
        if fail:
            err = b'{"error": "injected"}'
            self.send_response(self.server.fail_code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(err)))
            self.end_headers()
            self.wfile.write(err)
            return
        data = json.dumps({"embeddings": [_emb_of(t) for t in texts]}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # quiet
        pass


@pytest.fixture()
def stub_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.lock = threading.Lock()
    srv.batch_sizes = []
    srv.fail_first_n = 0
    srv.fail_code = 500
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv, f"http://127.0.0.1:{srv.server_address[1]}/embed"
    finally:
        srv.shutdown()


def test_rpc_embed_batch_boundaries_and_values(spark, stub_server):
    srv, endpoint = stub_server
    df = spark.range(0, 120).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text number "), F.col("id").cast("string")).alias(
            "description"
        ),
    ).repartition(1)  # one partition → deterministic 50/50/20 slicing
    out = rpc_embed(df, endpoint).collect()
    assert len(out) == 120
    for r in out:
        assert r["embedding"] == _emb_of(r["description"]), r["doc_id"]
    assert sum(srv.batch_sizes) == 120
    assert max(srv.batch_sizes) <= 50  # api.go:179 — never exceeded
    assert sorted(srv.batch_sizes) == [20, 50, 50]  # full batches + tail flush


def test_rpc_embed_parallel_partitions(spark, stub_server):
    """Each partition posts its own batches (concurrent executors); totals
    and per-row values still exact."""
    srv, endpoint = stub_server
    df = spark.range(0, 80).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("description"),
    ).repartition(4)
    out = rpc_embed(df, endpoint, batch_size=10).collect()
    assert len(out) == 80
    assert all(r["embedding"] == _emb_of(r["description"]) for r in out)
    assert sum(srv.batch_sizes) == 80
    assert max(srv.batch_sizes) <= 10


def test_rpc_embed_retries_transient_500(spark, stub_server):
    """VERDICT r2 #5: one injected HTTP 500 must not fail the stage — the
    batch is re-POSTed with backoff and results stay exact, with exactly one
    duplicate batch observed server-side (the at-least-once contract)."""
    srv, endpoint = stub_server
    srv.fail_first_n = 1
    df = spark.range(0, 30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("r"), F.col("id").cast("string")).alias("description"),
    ).repartition(1)
    out = rpc_embed(df, endpoint, batch_size=10).collect()
    assert len(out) == 30
    assert all(r["embedding"] == _emb_of(r["description"]) for r in out)
    # 3 logical batches + exactly 1 retried duplicate of the failed one
    assert len(srv.batch_sizes) == 4
    assert sum(srv.batch_sizes) == 40


def test_post_batch_4xx_is_permanent(stub_server):
    """4xx responses raise immediately — no retry storm on a bad request."""
    import urllib.error

    from geospatial_web_scraper_spark.sources.embed_rpc import _post_batch

    srv, endpoint = stub_server
    srv.fail_first_n = 10
    srv.fail_code = 404
    with pytest.raises(urllib.error.HTTPError):
        _post_batch(endpoint, ["x"], timeout=5.0)
    assert len(srv.batch_sizes) == 1  # exactly one attempt, zero retries


def test_embed_with_cache_close_semantics(spark, stub_server):
    srv, endpoint = stub_server
    cache = spark.createDataFrame(
        [("uA", "dA", [1.0, 2.0]), ("uB", "dB", [3.0, 4.0])],
        "url string, description string, embedding array<double>",
    )
    # B already cached; C appears twice (first-wins dedup); D is new
    new_nodes = spark.createDataFrame(
        [("uB", "dB"), ("uC", "dC"), ("uC", "dC-dup"), ("uD", "dD")],
        "url string, description string",
    )
    updated, embedded = embed_with_cache(cache, new_nodes, endpoint)
    emb_rows = {r["url"]: r for r in embedded.collect()}
    assert set(emb_rows) == {"uC", "uD"}  # uB never reaches the RPC (J4)
    assert emb_rows["uD"]["embedding"] == _emb_of("dD")
    up = {r["url"]: r for r in updated.collect()}
    assert set(up) == {"uA", "uB", "uC", "uD"}
    assert up["uA"]["embedding"] == [1.0, 2.0]  # cached entries untouched
    assert sum(srv.batch_sizes) == 2  # exactly the misses, one batch
