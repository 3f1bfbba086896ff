"""WARC source: Common-Crawl-style archives → the engine's ``pages`` schema.

The reference crawls the live web (``crawler.go`` HTTP fetch); at 100 TB the
fetch layer's output is WARC (ISO 28500) — the format Common Crawl, Heritrix
and wget all emit — so this source is how the engine ingests *real* crawl
captures: ``spark.read.format("binaryFile")`` lists the archive files, one
task parses each file's records with a pure-stdlib parser, and the result
lands in the same ``(url, warc_ts, html, status, content_type, host)``
shape as ``corpus.corpus_df``.

Scale shape: Common Crawl ships ~60k gzipped WARC files of ~1 GB per
snapshot — per-FILE parallelism is the natural partitioning (one task per
archive, no shuffle at all; the downstream engine repartitions by URL hash
when it needs to). Per-task memory is bounded: the gzip members (the CC
convention puts each record in its own member) are decompressed
INCREMENTALLY and records are parsed from the decompressed stream with an
O(record) buffer, flushed to Arrow every ~1k rows — the ~4-5× decompressed
archive is never materialized (the compressed bytes are, by
``binaryFile``'s contract). True per-MEMBER task splits (several tasks per
archive) would need a custom input format and are not implemented.

Only ``WARC-Type: response`` records with an HTTP payload become pages;
request/metadata/warcinfo records are skipped, matching how CC consumers
read archives. Any ``WARC/x.y`` version line starts a record and its
Content-Length framing is ALWAYS consumed — an unknown version or
non-response type skips the record as a unit, so a payload line that
merely looks like a version marker can never fabricate a record.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.urls import url_host

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members → raw bytes, all at once. Test/fixture
    helper; the ingest path streams via :func:`_iter_gzip_members`."""
    return b"".join(_iter_gzip_members(data))


def _iter_gzip_members(data: bytes, chunk_size: int = 1 << 20) -> Iterator[bytes]:
    """Decompress concatenated gzip members (the per-record CC convention)
    INCREMENTALLY: compressed input is fed in ``chunk_size`` slices and
    decompressed output yielded as it appears, so peak memory is
    O(chunk + largest single record), never the whole decompressed archive
    (~4-5× a CC ``.warc.gz``)."""
    pos = 0
    pending = b""
    d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
    while True:
        if pending:
            feed, pending = pending, b""
        elif pos < len(data):
            feed = data[pos : pos + chunk_size]
            pos += chunk_size
        else:
            tail = d.flush()
            if tail:
                yield tail
            return
        out = d.decompress(feed)
        if out:
            yield out
        if d.eof:
            # member boundary: restart on the unconsumed remainder
            pending = d.unused_data
            if not pending and pos >= len(data):
                return
            d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)


def parse_warc_stream(chunks: Iterable[bytes]) -> Iterator[dict]:
    """Yield dicts for each ``response`` record: url, warc_ts, status,
    content_type, html — from an iterable of decompressed byte chunks.
    Pure stdlib, sequential scan driven by each record's Content-Length
    (the only framing the spec guarantees). Buffered incrementally: memory
    is O(largest record), independent of archive size.

    Framing contract (ADVICE r2 fix): ANY ``WARC/x.y`` version line (1.0,
    1.1, future) opens a record whose headers and Content-Length payload
    are consumed as a unit; filtering (non-response types, recordless
    padding) happens only at record granularity — a payload line equal to
    ``WARC/1.0`` can never be misread as a record start."""
    buf = bytearray()
    src = iter(chunks)
    eof = False

    def _fill() -> bool:
        nonlocal eof
        if eof:
            return False
        try:
            buf.extend(next(src))
            return True
        except StopIteration:
            eof = True
            return False

    def _readline() -> bytes | None:
        while True:
            i = buf.find(b"\n")
            if i >= 0:
                line = bytes(buf[: i + 1])
                del buf[: i + 1]
                return line
            if not _fill():
                if buf:
                    line = bytes(buf)
                    del buf[:]
                    return line
                return None

    def _read(n: int) -> bytes:
        while len(buf) < n and _fill():
            pass
        out = bytes(buf[:n])
        del buf[:n]
        return out

    while True:
        line = _readline()
        if line is None:
            return
        if not line.strip().startswith(b"WARC/"):
            continue  # inter-record padding
        headers: dict[str, str] = {}
        while True:
            h = _readline()
            if h is None or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        # ALWAYS consume the payload — framing is per-record, filters below
        block = _read(length)
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        ts = None
        if "warc-date" in headers:
            try:
                ts = datetime.strptime(
                    headers["warc-date"], "%Y-%m-%dT%H:%M:%SZ"
                ).replace(tzinfo=timezone.utc)
            except ValueError:
                ts = None
        status, ctype, body = None, None, block
        # HTTP response payload: status line + headers + blank line + body
        if block[:5] in (b"HTTP/",):
            head, _, body = block.partition(b"\r\n\r\n")
            lines = head.split(b"\r\n")
            parts = lines[0].split(b" ", 2)
            if len(parts) >= 2:
                try:
                    status = int(parts[1])
                except ValueError:
                    status = None
            for hl in lines[1:]:
                if hl.lower().startswith(b"content-type:"):
                    ctype = (
                        hl.split(b":", 1)[1].decode("utf-8", "replace")
                        .strip().split(";")[0].strip()
                    )
        yield {
            "url": url,
            "warc_ts": ts,
            "html": body,
            "status": status,
            "content_type": ctype,
        }


def parse_warc_records(raw: bytes) -> Iterator[dict]:
    """Whole-buffer convenience wrapper over :func:`parse_warc_stream`
    (tests, fixtures, small archives)."""
    yield from parse_warc_stream([raw])


_FLUSH_ROWS = 1000  # rows per Arrow batch out of the WARC parser


def pages_from_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read ``*.warc`` / ``*.warc.gz`` files under ``path`` into the pages
    shape (plus a ``host`` column). One task per archive file; records are
    streamed (member-wise gzip decompression → incremental record parse →
    ~1k-row Arrow flushes), so a task holds the compressed file bytes
    (binaryFile's contract) plus O(batch) rows — never the decompressed
    archive."""
    files = spark.read.format("binaryFile").load(path)

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if str(fpath).endswith(".gz"):
                    chunks: Iterable[bytes] = _iter_gzip_members(raw)
                else:
                    chunks = (
                        raw[i : i + (1 << 20)]
                        for i in range(0, len(raw), 1 << 20)
                    )
                rows: list[dict] = []
                for rec in parse_warc_stream(chunks):
                    rows.append(rec)
                    if len(rows) >= _FLUSH_ROWS:
                        yield pd.DataFrame(rows)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows)

    pages = files.select("path", "content").mapInPandas(gen, PAGES_SCHEMA)
    return pages.withColumn("host", url_host(F.col("url")))


def warc_bytes(records: Iterable[tuple[str, str, int, str, bytes]],
               gzip_members: bool = False, version: str = "1.0") -> bytes:
    """Serialize (url, iso_ts, status, content_type, body) tuples to WARC —
    the round-trip twin of :func:`parse_warc_records` (tests + fixtures).
    ``version`` writes a different ``WARC/x.y`` marker (spec-permitted, and
    real writers emit 1.1) to exercise the version-agnostic framing."""
    import gzip as _gzip

    out = []
    for url, iso_ts, status, ctype, body in records:
        http = (
            f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n\r\n".encode()
            + body
        )
        rec = (
            f"WARC/{version}\r\n".encode()
            + f"WARC-Type: response\r\n"
              f"WARC-Target-URI: {url}\r\n"
              f"WARC-Date: {iso_ts}\r\n"
              f"Content-Length: {len(http)}\r\n\r\n".encode()
            + http
            + b"\r\n\r\n"
        )
        out.append(_gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)


WARC_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

#: CDX-style per-record archive index — the random-access companion every
#: Common Crawl-shaped archive ships (url → file, byte offset, length)
WARC_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def write_warc(
    df: DataFrame,
    out_dir: str,
    gzip_members: bool = True,
    version: str = "1.0",
    index: bool = False,
) -> DataFrame:
    """Distributed WARC writer sink — the K-series twin of
    :func:`pages_from_warc`: each partition of ``(url, warc_ts, status,
    content_type, html)`` rows streams into ONE ``part-{pid:05d}.warc[.gz]``
    file under ``out_dir`` (gzip member per record, the Common Crawl
    convention, so the file is member-splittable on re-read), and the
    returned manifest DataFrame carries (path, n_records, n_bytes) per
    file. Lazy like any Spark plan: an action on the manifest materializes
    the files; re-execution is idempotent (write to ``.inprogress``, then
    atomic rename). Memory is O(one record) — records are serialized and
    flushed as the Arrow batches stream through, never accumulated.

    ``out_dir`` must be a filesystem every executor can reach (local dir in
    local mode; NFS/fuse mount on a cluster — object stores need the
    mounted form since this writes through ``open()``). NULL status maps
    to 0 and NULL content_type omits the header (read back as None), the
    same lossy edge the HTTP payload format itself has.

    ``index=True`` returns the CDX-style per-RECORD index instead
    (:data:`WARC_INDEX_SCHEMA`: url, path, offset, n_bytes — with gzip
    members each slice is a self-contained member, so a record is
    servable by one ranged read + gunzip, no scan). Recover the manifest
    with ``idx.groupBy("path").agg(count, sum(n_bytes))``; serve records
    with :func:`read_warc_record` (driver) or :func:`pages_from_index`
    (distributed). At 100 TB the index IS the serving path — write it
    once at archive time instead of re-scanning petabytes to find one
    page. Index mode buffers the (url, offset, length) tuples until the
    archive's atomic rename and only then emits them (rows must never
    reference a path that could fail to appear), so its memory is
    O(records-per-partition × ~100 bytes) — shard partitions accordingly.
    """
    import gzip as _gzip
    import hashlib as _hashlib
    import os

    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_members else ".warc"

    cols = ["url", "warc_ts", "status", "content_type", "html"]

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        final = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        # attempt-unique AND dot-prefixed: two attempts of the same
        # partition (speculative execution, a zombie original racing its
        # retry) must never share a temp file, and a leaked temp must be
        # invisible to the binaryFile glob pages_from_warc re-reads with
        # (Spark readers skip dot/underscore-prefixed files).
        tmp = os.path.join(
            out_dir,
            f".part-{pid:05d}{ext}.inprogress-{ctx.taskAttemptId()}",
        )
        fh = None
        n_records = 0
        pos = 0
        idx_rows: list[dict] = []
        try:
            for pdf in batches:
                if fh is None:
                    fh = open(tmp, "wb")
                for url, ts, status, ctype, html in zip(
                    *(pdf[c] for c in cols)
                ):
                    ct_header = (
                        f"Content-Type: {ctype}\r\n"
                        if ctype is not None and not pd.isna(ctype)
                        else ""
                    )
                    st = 0 if status is None or pd.isna(status) else int(status)
                    body = bytes(html) if html is not None else b""
                    http = (
                        f"HTTP/1.1 {st} X\r\n{ct_header}\r\n".encode() + body
                    )
                    # WARC-Date is mandatory (ISO 28500 §5.4): NULL
                    # timestamps serialize as the epoch rather than crash
                    iso = (
                        "1970-01-01T00:00:00Z"
                        if ts is None or pd.isna(ts)
                        else pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
                    )
                    # WARC-Record-ID is mandatory too (ISO 28500 §5.2);
                    # a deterministic urn:uuid (md5 of URI+date, cast to
                    # UUID shape) keeps re-execution byte-identical —
                    # random uuids would break idempotent task retries.
                    rid = _hashlib.md5(f"{url}|{iso}".encode()).hexdigest()
                    rid = (
                        f"{rid[:8]}-{rid[8:12]}-{rid[12:16]}-"
                        f"{rid[16:20]}-{rid[20:]}"
                    )
                    rec = (
                        f"WARC/{version}\r\n".encode()
                        + f"WARC-Type: response\r\n"
                          f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
                          f"WARC-Target-URI: {url}\r\n"
                          f"WARC-Date: {iso}\r\n"
                          f"Content-Length: {len(http)}\r\n\r\n".encode()
                        + http
                        + b"\r\n\r\n"
                    )
                    data = _gzip.compress(rec) if gzip_members else rec
                    fh.write(data)
                    if index:
                        idx_rows.append(
                            {
                                "url": url,
                                "path": final,
                                "offset": pos,
                                "n_bytes": len(data),
                            }
                        )
                    pos += len(data)
                    n_records += 1
        finally:
            if fh is not None:
                fh.close()
        if n_records == 0:
            # empty partition: no file, no manifest row
            if os.path.exists(tmp):
                os.remove(tmp)
            return
        os.replace(tmp, final)
        if index:
            # index rows are yielded ONLY AFTER the rename: a yield
            # inside the write loop would let an early-stopping consumer
            # (limit/first) close the generator before the epilogue runs,
            # stranding the archive as a hidden temp while the already-
            # emitted rows point at a path that never appears (r4 review
            # finding). Buffering costs ~4 small fields per record —
            # shard partitions if a single archive holds 10^7+ records.
            for i in range(0, len(idx_rows), _FLUSH_ROWS):
                yield pd.DataFrame(idx_rows[i : i + _FLUSH_ROWS])
        else:
            yield pd.DataFrame(
                [
                    {
                        "path": final,
                        "n_records": n_records,
                        "n_bytes": os.path.getsize(final),
                    }
                ]
            )

    schema = WARC_INDEX_SCHEMA if index else WARC_MANIFEST_SCHEMA
    return df.select(*cols).mapInPandas(gen, schema)


def read_warc_record(path: str, offset: int, n_bytes: int) -> dict:
    """Serve ONE record by index row — a single ranged read (seek +
    ``n_bytes``), gunzip if the archive is gzip-membered (each record is
    its own member, so the slice is self-contained), one record parse.
    Driver-side utility; the distributed form is :func:`pages_from_index`.
    """
    with open(path, "rb") as fh:
        fh.seek(offset)
        data = fh.read(n_bytes)
    if path.endswith(".gz"):
        data = _gunzip_members(data)
    recs = list(parse_warc_records(data))
    if len(recs) != 1:
        raise ValueError(
            f"index slice at {path}:{offset}+{n_bytes} parsed to "
            f"{len(recs)} records (corrupt index or archive)"
        )
    return recs[0]


def pages_from_index(spark: SparkSession, index_df: DataFrame) -> DataFrame:
    """Random-access page serving: resolve an index slice (any subset of a
    :func:`write_warc(index=True)` table — typically the output of an
    equi-join on url) to full page rows WITHOUT scanning the archives.
    Rows are grouped per path inside each Arrow batch so a task opens
    each file once and seeks record-to-record; cost is O(|requested|)
    ranged reads, independent of archive size — the 100 TB lookup path.
    Repartition the index by ``path`` first when requests cluster into
    few files and tasks should co-locate their opens."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for path, grp in pdf.groupby("path", sort=True):
                grp = grp.sort_values("offset")  # forward-only seeks
                with open(path, "rb") as fh:
                    for off, nb in zip(grp["offset"], grp["n_bytes"]):
                        fh.seek(int(off))
                        data = fh.read(int(nb))
                        if str(path).endswith(".gz"):
                            data = _gunzip_members(data)
                        rows.extend(parse_warc_records(data))
                        if len(rows) >= _FLUSH_ROWS:
                            yield pd.DataFrame(rows)
                            rows = []
            if rows:
                yield pd.DataFrame(rows)

    pages = index_df.select("path", "offset", "n_bytes").mapInPandas(
        gen, PAGES_SCHEMA
    )
    return pages.withColumn("host", url_host(F.col("url")))
