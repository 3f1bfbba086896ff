"""Streaming corpus admission == a sequential batch fold of
incremental_dedup over the same micro-batches (admission order = epoch
order), plus epoch-replay idempotence and fresh-state queryability.
The batch operator itself is oracle-checked by the dedup_incremental
catalog row; this pins the streaming twin to it row-for-row."""

import os
import time

from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.dedup import incremental_dedup
from geospatial_web_scraper_spark.streaming.admission_stream import AdmissionState
from geospatial_web_scraper_spark.streaming.drain import await_drained


def _text(seed: str, n: int = 24, tail: str = "") -> str:
    words = [f"{seed}w{i}" for i in range(n)]
    return " ".join(words) + (" " + tail if tail else "")


def _batches(spark):
    """Two micro-batches covering every admission path: batch 1 carries
    an exact dup of batch 0 (dropped, gate 1), a near-dup of batch 0
    (one tail token changed on a 24-gram doc — Jaccard ≈ 0.88 ≥ 0.7,
    dropped, gate 3), a within-batch exact dup pair (first id wins,
    gate 2), and genuinely new docs (admitted)."""
    b0 = spark.createDataFrame(
        [
            (0, _text("a")),
            (1, _text("b")),
            (2, _text("c")),
        ],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [
            (100, _text("a")),                    # exact dup of doc 0
            (101, _text("b", tail="zz")),         # near dup of doc 1
            (102, _text("fresh")),                # new
            (103, _text("same")),                 # within-batch dup pair:
            (104, _text("same")),                 #   103 wins
        ],
        "doc_id long, text string",
    )
    return [b0, b1]


def _sequential_fold(spark, batches):
    prior = spark.createDataFrame([], "doc_id long, text string, content_hash string")
    for b in batches:
        surv = incremental_dedup(b, prior.select("doc_id", "text"))
        admitted = b.join(surv, "doc_id").select("doc_id", "text", "content_hash")
        prior = prior.unionByName(admitted)
    return prior


def test_stream_admission_equals_sequential_batch_fold(spark, tmp_path):
    batches = _batches(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = time.time()
    for idx, b in enumerate(batches):
        sub = f"{src}/b{idx}"
        b.coalesce(1).write.parquet(sub)
        # pin micro-batch ORDER explicitly (admission is order-dependent;
        # coarse-mtime filesystems must not merge or swap the batches)
        for root, _dirs, files in os.walk(sub):
            for f in files:
                p = os.path.join(root, f)
                os.utime(p, (now + 10 * idx, now + 10 * idx))

    state = AdmissionState(spark, str(tmp_path / "state"))
    stream = (
        spark.readStream.schema(batches[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        stream.writeStream.foreachBatch(state.sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q, 180)

    got = {r.doc_id: r.content_hash for r in state.admitted().collect()}
    exp = {
        r.doc_id: r.content_hash
        for r in _sequential_fold(spark, batches).collect()
    }
    assert got == exp
    # and the semantics themselves: dups dropped, first-wins, new admitted
    assert set(got) == {0, 1, 2, 102, 103}


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    batches = _batches(spark)
    state = AdmissionState(spark, str(tmp_path / "state"))
    for eid, b in enumerate(batches):
        state.sink(b, eid)
    before = sorted(
        (r.doc_id, r.content_hash) for r in state.admitted().collect()
    )
    state.sink(batches[1], 1)  # replay: must rewrite identical content
    after = sorted(
        (r.doc_id, r.content_hash) for r in state.admitted().collect()
    )
    assert after == before


def test_admitted_queryable_on_fresh_state(spark, tmp_path):
    state = AdmissionState(spark, str(tmp_path / "nostate"))
    assert state.admitted().count() == 0
    state.compact()  # no epochs on disk: a no-op, not an error
    assert state.admitted().count() == 0


def _batch2(spark):
    """A third micro-batch probing the COMPACTED state: an exact dup of
    an epoch-0 survivor, a near-dup of an epoch-1 survivor, and new
    docs — if the base lost any artifact table, one of these gates
    would mis-fire."""
    return spark.createDataFrame(
        [
            (200, _text("c")),                   # exact dup of doc 2 (e0)
            (201, _text("fresh", tail="qq")),     # near dup of 102 (e1)
            (202, _text("brand")),                # new
        ],
        "doc_id long, text string",
    )


def test_compacted_state_equals_uncompacted_fold(spark, tmp_path):
    """Mirror of test_compacted_store_resume_equivalence for the
    admission stream (VERDICT r4 #3): folding b2 against a state
    compacted after b0+b1 admits exactly what the uncompacted fold
    admits, the per-epoch dirs at/below the compaction point are gone,
    and admitted() is identical before/after compaction."""
    import os

    batches = _batches(spark) + [_batch2(spark)]

    plain = AdmissionState(spark, str(tmp_path / "plain"))
    for eid, b in enumerate(batches):
        plain.sink(b, eid)

    comp = AdmissionState(spark, str(tmp_path / "comp"))
    comp.sink(batches[0], 0)
    comp.sink(batches[1], 1)
    before = sorted(
        (r.doc_id, r.content_hash) for r in comp.admitted().collect()
    )
    comp.compact()
    assert comp.compacted_upto() == 1
    after = sorted(
        (r.doc_id, r.content_hash) for r in comp.admitted().collect()
    )
    assert after == before
    # superseded per-epoch dirs are physically gone
    for name in ("docs", "hashes", "bands", "grams"):
        root = str(tmp_path / "comp" / name)
        assert not any(
            d.startswith("epoch=") for d in os.listdir(root)
        ), (name, os.listdir(root))
    comp.sink(batches[2], 2)
    got = sorted(
        (r.doc_id, r.content_hash) for r in comp.admitted().collect()
    )
    want = sorted(
        (r.doc_id, r.content_hash) for r in plain.admitted().collect()
    )
    assert got == want
    # the gates actually fired through the base: 200/201 dropped, 202 in
    assert {d for d, _ in got} == {0, 1, 2, 102, 103, 202}


def test_stream_compact_between_triggers_matches_fold(spark, tmp_path):
    """The REAL streaming shape around compact(): an availableNow stream
    drains b0+b1, compact() runs between triggers (the documented call
    site), then a second availableNow run on the SAME checkpoint admits
    b2 — the committed corpus must equal the sequential three-batch fold,
    with the compacted base carrying all prior state."""
    import os
    import time as _time

    batches = _batches(spark) + [_batch2(spark)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = _time.time()

    def _write_batch(idx):
        sub = f"{src}/b{idx}"
        batches[idx].coalesce(1).write.parquet(sub)
        for root, _dirs, files in os.walk(sub):
            for f in files:
                p = os.path.join(root, f)
                os.utime(p, (now + 10 * idx, now + 10 * idx))

    state = AdmissionState(spark, str(tmp_path / "state"))

    def _drain():
        q = (
            spark.readStream.schema(batches[0].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
            .writeStream.foreachBatch(state.sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        await_drained(q, 180)

    _write_batch(0)
    _write_batch(1)
    _drain()
    state.compact()
    assert state.compacted_upto() >= 1
    _write_batch(2)
    _drain()

    got = {r.doc_id: r.content_hash for r in state.admitted().collect()}
    exp = {
        r.doc_id: r.content_hash
        for r in _sequential_fold(spark, batches).collect()
    }
    assert got == exp
    assert set(got) == {0, 1, 2, 102, 103, 202}


def test_replay_after_compaction_is_idempotent(spark, tmp_path):
    """Replays stay exactly-once across a compaction boundary: the TAIL
    epoch (written after compaction) replays identically, and even a
    replay of an ALREADY-COMPACTED epoch rewrites identical content —
    the base retains per-epoch fidelity, so epoch 1's replay still sees
    exactly the epochs strictly before it."""
    batches = _batches(spark) + [_batch2(spark)]
    state = AdmissionState(spark, str(tmp_path / "state"))
    for eid, b in enumerate(batches[:2]):
        state.sink(b, eid)
    state.compact()
    state.sink(batches[2], 2)
    before = sorted(
        (r.doc_id, r.content_hash) for r in state.admitted().collect()
    )
    state.sink(batches[2], 2)  # tail replay
    assert before == sorted(
        (r.doc_id, r.content_hash) for r in state.admitted().collect()
    )
    state.sink(batches[1], 1)  # replay of a compacted epoch
    assert before == sorted(
        (r.doc_id, r.content_hash) for r in state.admitted().collect()
    )
    # second compaction folds the tail + the replayed dir into a new base
    state.compact()
    assert state.compacted_upto() == 2
    assert before == sorted(
        (r.doc_id, r.content_hash) for r in state.admitted().collect()
    )
