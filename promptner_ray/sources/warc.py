"""WARC source: Common-Crawl-style archives → the engine's pages table.

A minimal WARC/1.0 reader (no external deps — the ``warcio`` library is
not in this container) covering what a crawl-ingest pipeline needs:
``response`` records are parsed for ``WARC-Target-URI`` / ``WARC-Date``,
the HTTP response headers are stripped, and the body becomes the ``html``
column.  Reading is a Ray pipeline over whole files
(``read_binary_files`` — WARC records are length-prefixed and must not
straddle block splits; one task per archive file, the same layout
Common Crawl itself ships: many ~1 GB segment files, which IS the
parallelism unit at 100 TB).  ``write_warc`` emits spec-conformant
records so the reader round-trips the synthetic corpus byte-for-byte in
tests.
"""

from __future__ import annotations

import pathlib
from datetime import datetime, timezone

import pyarrow as pa

_CRLF = b"\r\n"


def parse_warc_bytes(data: bytes) -> list[dict]:
    """One WARC file → rows (url, warc_ts, html) from response records."""
    rows: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        header_block = data[pos:head_end].decode("utf-8", "replace")
        headers: dict[str, str] = {}
        lines = header_block.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at byte {pos}")
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        body = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        # strip the HTTP response header block when present
        if body.startswith(b"HTTP/"):
            http_end = body.find(_CRLF + _CRLF)
            if http_end >= 0:
                body = body[http_end + 4 :]
        ts = datetime.strptime(
            headers["warc-date"], "%Y-%m-%dT%H:%M:%SZ"
        ).replace(tzinfo=timezone.utc)
        rows.append(
            {
                "url": headers["warc-target-uri"],
                "warc_ts": ts,
                "html": body,
            }
        )
    return rows


def _parse_files_batch(batch: pa.Table) -> pa.Table:
    import gzip

    rows: list[dict] = []
    for data in batch.column("bytes").to_pylist():
        if data[:2] == b"\x1f\x8b":  # .warc.gz: Common Crawl's wire format
            # gzip.decompress handles multi-member streams, so both
            # whole-file and member-per-record (CC-style) archives work
            data = gzip.decompress(data)
        rows.extend(parse_warc_bytes(data))
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"].replace(tzinfo=None) for r in rows],
                type=pa.timestamp("us"),
            ),
            "html": pa.array([r["html"] for r in rows], type=pa.binary()),
        }
    )


def read_warc(paths: list[str] | str):
    """WARC file(s) → Dataset(url, warc_ts, html): one parse task per
    archive (the Common-Crawl segment file is the parallelism unit)."""
    import ray

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(_parse_files_batch, batch_format="pyarrow")


def write_warc(
    rows: list[dict], path: str | pathlib.Path, gzip_file: bool = False
) -> None:
    """pages-style rows (url, warc_ts, html) → one WARC/1.0 file
    (gzip-compressed when ``gzip_file`` or the path ends ``.gz``)."""
    out = bytearray()
    for r in rows:
        html = r["html"]
        if isinstance(html, str):
            html = html.encode("utf-8")
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        ts = r["warc_ts"]
        date = (
            ts.strftime("%Y-%m-%dT%H:%M:%SZ")
            if hasattr(ts, "strftime")
            else str(ts)
        )
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Length: {len(http)}\r\n"
        ).encode("utf-8")
        out += head + _CRLF + http + _CRLF + _CRLF
    payload = bytes(out)
    if gzip_file or str(path).endswith(".gz"):
        import gzip as _gzip

        payload = _gzip.compress(payload, mtime=0)  # deterministic output
    pathlib.Path(path).write_bytes(payload)
