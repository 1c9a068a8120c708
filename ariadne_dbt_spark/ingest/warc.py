"""WARC (Web ARChive) ingestion — the CommonCrawl source format.

A 100 TB training-data pipeline starts from WARC: length-delimited
records (`WARC/1.x` header block + Content-Length payload), usually
stored as files of concatenated per-record gzip members. This reader
is pure stdlib (the format is simple; no warcio in this image):

* file discovery + distribution ride Spark's ``binaryFile`` source —
  each WARC file is one row, so parallelism = file count, which is how
  CommonCrawl shards anyway (~1 GB gzipped files × 64 000 per crawl);
* record splitting runs in ``mapInPandas`` (Arrow batches of files,
  one Python hop per batch, never per record);
* gzip: Python's ``gzip.decompress`` consumes ALL concatenated
  members, which is exactly the WARC-record-per-member layout;
* ``response`` records carry an HTTP message as payload: the HTTP
  status line + headers are split off so callers get the body bytes
  and the status code as columns.

Returned schema (one row per WARC record)::

    path          string   source file
    record_id     string   WARC-Record-ID header
    warc_type     string   warcinfo | request | response | resource...
    target_uri    string   WARC-Target-URI (null for warcinfo)
    content_type  string   record Content-Type header
    http_status   int      response records only, else null
    payload       binary   record block (HTTP body for responses)

Use ``payload`` with the multimodal/text operators downstream
(``F.decode(payload, 'utf-8')`` for HTML → text pipeline). The big-file
caveat: ``binaryFile`` materializes one file per row, so shard size
should stay at the CommonCrawl ~1 GB norm — Spark's 2 GB byte-array
ceiling is the hard bound, and smaller shards parallelize recovery.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "content_type string, http_status int, payload binary"
)


def parse_warc_bytes(raw: bytes) -> list[dict]:
    """Split one WARC file's bytes (gzipped or plain) into records.
    Driver-and-executor-shared pure function; tolerant of trailing
    garbage (stops at the first malformed header block)."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)  # concatenated members: all consumed
    out: list[dict] = []
    buf = io.BytesIO(raw)
    while True:
        # skip inter-record blank lines
        line = buf.readline()
        while line in (b"\r\n", b"\n"):
            line = buf.readline()
        if not line:
            break
        if not line.startswith(b"WARC/"):
            break  # malformed / trailing junk
        headers: dict[str, str] = {}
        while True:
            line = buf.readline()
            if line in (b"\r\n", b"\n", b""):
                break
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.decode("latin1").strip().lower()] = (
                    v.decode("latin1").strip()
                )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            break
        payload = buf.read(length)
        http_status = None
        if headers.get("warc-type") == "response" and payload[:5] == b"HTTP/":
            head, sep, body = payload.partition(b"\r\n\r\n")
            if sep:
                status_line = head.split(b"\r\n", 1)[0].split()
                if len(status_line) >= 2 and status_line[1].isdigit():
                    http_status = int(status_line[1])
                payload = body
        out.append(
            {
                "record_id": headers.get("warc-record-id"),
                "warc_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "content_type": headers.get("content-type"),
                "http_status": http_status,
                "payload": payload,
            }
        )
    return out


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed WARC read: ``binaryFile`` scan → per-file record
    split in ``mapInPandas``. Column pruning works upstream (the scan
    reads only file content + path), and everything downstream is
    ordinary DataFrame ops over the record rows."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob)

    def split_files(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content)):
                    rec["path"] = path
                    rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "record_id",
                    "warc_type",
                    "target_uri",
                    "content_type",
                    "http_status",
                    "payload",
                ],
            )

    return files.select("path", "content").mapInPandas(split_files, WARC_SCHEMA)


def make_warc_bytes(records: list[dict], *, gzip_members: bool = False) -> bytes:
    """Serialize records into WARC bytes (test-fixture twin of the
    parser; one gzip member per record when ``gzip_members`` — the
    CommonCrawl layout)."""
    chunks = []
    for r in records:
        payload = r.get("payload", b"")
        head = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {r.get('warc_type', 'resource')}\r\n".encode()
            + f"WARC-Record-ID: {r.get('record_id', '<urn:uuid:0>')}\r\n".encode()
            + (
                f"WARC-Target-URI: {r['target_uri']}\r\n".encode()
                if r.get("target_uri")
                else b""
            )
            + f"Content-Type: {r.get('content_type', 'text/plain')}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
        )
        rec = head + payload + b"\r\n\r\n"
        chunks.append(gzip.compress(rec) if gzip_members else rec)
    return b"".join(chunks)
