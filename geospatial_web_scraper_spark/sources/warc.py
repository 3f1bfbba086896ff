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
when it needs to). Record-gzip members (the CC convention: each record its
own gzip member, so files are splittable by member) are handled by
member-wise decompression.

Only ``WARC-Type: response`` records with an HTTP payload become pages;
request/metadata/warcinfo records are skipped, matching how CC consumers
read archives.
"""

from __future__ import annotations

import io
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
    """Concatenated gzip members (the per-record CC convention) → raw bytes."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def parse_warc_records(raw: bytes) -> Iterator[dict]:
    """Yield dicts for each ``response`` record: url, warc_ts, status,
    content_type, html. Pure stdlib, sequential scan driven by each
    record's Content-Length (the only framing the spec guarantees)."""
    buf = io.BytesIO(raw)
    while True:
        line = buf.readline()
        if not line:
            return
        if line.strip() != b"WARC/1.0":
            continue  # skip inter-record padding / unknown versions
        headers: dict[str, str] = {}
        while True:
            h = buf.readline()
            if not h or h in (b"\r\n", b"\n"):
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
        block = buf.read(length)
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


def pages_from_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read ``*.warc`` / ``*.warc.gz`` files under ``path`` into the pages
    shape (plus a ``host`` column). One task per archive file."""
    files = spark.read.format("binaryFile").load(path)

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if str(fpath).endswith(".gz"):
                    raw = _gunzip_members(raw)
                recs = list(parse_warc_records(raw))
                if recs:
                    yield pd.DataFrame(recs)

    pages = files.select("path", "content").mapInPandas(gen, PAGES_SCHEMA)
    return pages.withColumn("host", url_host(F.col("url")))


def warc_bytes(records: Iterable[tuple[str, str, int, str, bytes]],
               gzip_members: bool = False) -> bytes:
    """Serialize (url, iso_ts, status, content_type, body) tuples to WARC —
    the round-trip twin of :func:`parse_warc_records` (tests + fixtures)."""
    import gzip as _gzip

    out = []
    for url, iso_ts, status, ctype, body in records:
        http = (
            f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n\r\n".encode()
            + body
        )
        rec = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: response\r\n"
              f"WARC-Target-URI: {url}\r\n"
              f"WARC-Date: {iso_ts}\r\n"
              f"Content-Length: {len(http)}\r\n\r\n".encode()
            + http
            + b"\r\n\r\n"
        )
        out.append(_gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)
