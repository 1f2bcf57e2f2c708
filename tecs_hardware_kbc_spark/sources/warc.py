"""WARC source — read Common-Crawl-style web archives into the
engine's ``(url, warc_ts, html)`` page shape.

WARC (ISO 28500) is how a crawl actually arrives: a stream of
length-framed records, each a ``WARC/1.x`` header block (named fields,
CRLF-terminated, blank-line-ended) followed by ``Content-Length``
payload bytes; ``response`` records carry an HTTP response whose body
is the page. Common Crawl ships each crawl as ~64k ``.warc.gz`` files
compressed as one gzip MEMBER PER RECORD (so a reader can seek to a
record boundary and start inflating).

Plan shape: ``spark.read.format("binaryFile")`` yields one row per
archive file, and ``mapInPandas`` walks each file's records with the
pure-stdlib parser below — so parallelism = number of archive files,
the natural unit (Common Crawl sizes files ~1 GB for exactly this
reason), and no driver-side I/O ever happens. At 100 TB the job is
64k independent file tasks; nothing shuffles until the caller joins or
dedups the resulting page table.

Only stdlib (``zlib``) is used for gzip members — no warcio
dependency. The parser is deliberately tolerant: records with missing
Content-Length or truncated payloads terminate that FILE's stream
(never the job), and non-response records are skipped unless asked
for.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

WARC_PAGE_SCHEMA = ("path string, url string, warc_ts string, "
                    "http_status int, html string")


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout)."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.eof:  # truncated trailing member: stop cleanly
            break
        data = d.unused_data
    return b"".join(out)


def split_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (warc_headers, payload_bytes) per record from raw WARC
    bytes (gzip members are inflated first). Header field names are
    lower-cased; framing follows Content-Length exactly, then the
    record separator CRLFCRLF is skipped."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("ascii", "replace")] = \
                    v.strip().decode("utf-8", "replace")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        if body_start + length > n:
            break
        yield headers, data[body_start:body_start + length]
        pos = body_start + length
        while data.startswith(b"\r\n", pos):
            pos += 2


def _http_body(payload: bytes) -> tuple[int | None, bytes]:
    """(status, body) of an HTTP response payload; (None, payload) when
    the payload is not HTTP (e.g. a resource record)."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0:
        return None, b""
    status_line = payload[:payload.find(b"\r\n")].split()
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        status = None
    return status, payload[head_end + 4:]


def warc_pages(data: bytes) -> Iterator[dict]:
    """response-record pages from one WARC file's bytes:
    {url, warc_ts, http_status, html}."""
    for headers, payload in split_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        status, body = _http_body(payload)
        yield {
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": headers.get("warc-date", ""),
            "http_status": status,
            "html": body.decode("utf-8", "replace"),
        }


def read_warc(spark: SparkSession, path: str,
              ok_only: bool = True) -> DataFrame:
    """(url, warc_ts timestamp, html [, http_status, path]) from a
    WARC file glob. One task per archive file (see module docstring);
    ``ok_only`` keeps 2xx responses, the crawl-ingest default."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for rec in warc_pages(bytes(content)):
                    rec["path"] = p
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=["path", "url", "warc_ts",
                               "http_status", "html"])

    pages = files.mapInPandas(parse, schema=WARC_PAGE_SCHEMA)
    if ok_only:
        pages = pages.filter((F.col("http_status") >= 200)
                             & (F.col("http_status") < 300))
    return pages.withColumn(
        "warc_ts", F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ssX"))


def warc_cdx(data: bytes) -> Iterator[dict]:
    """CDX-style index rows for one WARC file: {url, warc_ts,
    warc_type, offset, length} where (offset, length) locate the
    record's bytes IN THE FILE AS STORED — for .warc.gz the gzip
    member's compressed extent, for plain WARC the record's framed
    extent — so a reader can fetch+inflate one record without touching
    the rest of the file. This is the artifact Common Crawl publishes
    as its CDX index; ``data[offset:offset+length]`` always re-parses
    to exactly that record (round-trip pinned by tests)."""
    if data[:2] == b"\x1f\x8b":
        pos = 0
        while pos < len(data) and data[pos:pos + 2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=31)
            member = d.decompress(data[pos:]) + d.flush()
            if not d.eof:
                break
            consumed = len(data) - pos - len(d.unused_data)
            for headers, _ in split_warc_records(member):
                yield _cdx_row(headers, pos, consumed)
            pos += consumed
        return
    pos = 0
    for headers, payload in split_warc_records(data):
        head_end = data.find(b"\r\n\r\n", pos)
        rec_len = (head_end + 4 - pos) + len(payload)
        end = pos + rec_len
        while data.startswith(b"\r\n", end):
            end += 2
        yield _cdx_row(headers, pos, end - pos)
        pos = end


def _cdx_row(headers: dict, offset: int, length: int) -> dict:
    return {"url": headers.get("warc-target-uri", ""),
            "warc_ts": headers.get("warc-date", ""),
            "warc_type": headers.get("warc-type", ""),
            "offset": offset, "length": length}


def read_warc_cdx(spark: SparkSession, path: str) -> DataFrame:
    """(path, url, warc_ts, warc_type, offset, length) index over a
    WARC file glob — same one-task-per-file plan as ``read_warc``."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for rec in warc_cdx(bytes(content)):
                    rec["path"] = p
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=["path", "url", "warc_ts", "warc_type",
                               "offset", "length"])

    return files.mapInPandas(
        parse, schema=("path string, url string, warc_ts string, "
                       "warc_type string, offset long, length long"))


def write_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize records ({warc_type, url, warc_ts, payload: bytes})
    into WARC bytes — the test/fixture writer (and the round-trip proof
    of the reader's framing). One gzip member per record when asked,
    the .warc.gz layout."""
    import gzip as _gzip

    out = []
    for r in records:
        payload = r["payload"]
        head = (f"WARC/1.0\r\n"
                f"WARC-Type: {r['warc_type']}\r\n"
                f"WARC-Target-URI: {r.get('url', '')}\r\n"
                f"WARC-Date: {r.get('warc_ts', '')}\r\n"
                f"Content-Length: {len(payload)}\r\n"
                f"\r\n").encode()
        rec = head + payload + b"\r\n\r\n"
        out.append(_gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)
