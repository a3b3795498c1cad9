"""WARC (Web ARChive, ISO 28500) source for Ray Data.

Web-crawl corpora ship as WARC: length-prefixed records (`WARC/1.0` header
block, blank line, `Content-Length` bytes of payload, blank line ×2). This
module reads the `response` records of a WARC file into rows of
``(url, warc_ts, payload)`` as a proper ``FileBasedDatasource`` subclass, so
Ray Data parallelizes over FILES (one read task per file / file group),
exactly like its built-in parquet/json/csv sources — at cluster scale a
100k-file crawl becomes 100k independently-schedulable read tasks with no
coordination. Records inside one file stream sequentially (WARC is not
splittable without an external index: records are back-to-back with no
sync markers, and real crawls gzip per-record, so mid-file seeks can't find
a record boundary — the per-file task is the right parallel grain).

Batches are emitted every ``rows_per_block`` records so a multi-GB WARC
never materializes as one block (bounded memory per read task).

Scope: uncompressed WARC/1.0 with the headers crawls actually use
(WARC-Type, WARC-Target-URI, WARC-Date, Content-Length). HTTP response
payloads keep their HTTP header block; ``strip_http_headers=True`` (default)
drops it at the double-CRLF boundary, which is what text pipelines want.

A deterministic ``write_warc_file`` companion exists for tests/fixtures —
this sandbox has no real crawl data, so tests synthesize files and
round-trip them.
"""

from __future__ import annotations

import io
from typing import Callable, Iterator, List, Optional, Union

import pyarrow as pa
from ray.data.datasource import FileBasedDatasource

_CRLF = b"\r\n"

WARC_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.string()),      # WARC-Date, ISO-8601 as recorded
    ("payload", pa.binary()),
])


def _parse_header_block(raw: bytes) -> dict:
    """WARC named fields (case-insensitive keys) from one header block."""
    fields = {}
    for line in raw.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            fields[k.strip().lower()] = v.strip()
    return fields


def _strip_http(payload: bytes) -> bytes:
    """Drop the HTTP response header block if one leads the payload."""
    if payload.startswith(b"HTTP/"):
        cut = payload.find(_CRLF + _CRLF)
        if cut >= 0:
            return payload[cut + 4:]
    return payload


class WARCDatasource(FileBasedDatasource):
    """``ray.data.read_datasource(WARCDatasource(paths))`` — or use the
    :func:`read_warc` convenience wrapper."""

    _FILE_EXTENSIONS = ["warc"]

    def __init__(self, paths: Union[str, List[str]], *,
                 record_types: tuple = ("response",),
                 strip_http_headers: bool = True,
                 rows_per_block: int = 1024, **kwargs):
        super().__init__(paths, file_extensions=self._FILE_EXTENSIONS,
                         **kwargs)
        self._record_types = {t.encode() for t in record_types}
        self._strip_http = strip_http_headers
        self._rows_per_block = rows_per_block

    def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
        # pyarrow NativeFile supports buffered sequential reads; wrap for
        # readline() semantics without loading the file.
        stream = io.BufferedReader(_NativeRawAdapter(f), buffer_size=1 << 20)
        urls, tss, payloads = [], [], []
        while True:
            magic = stream.readline()
            if not magic:
                break
            if magic.strip() == b"":
                continue
            if not magic.startswith(b"WARC/"):
                raise ValueError(
                    f"{path}: expected WARC/1.x record header, got "
                    f"{magic[:40]!r}")
            header_lines = []
            while True:
                line = stream.readline()
                if not line or line == _CRLF or line == b"\n":
                    break
                header_lines.append(line.rstrip(b"\r\n"))
            fields = _parse_header_block(_CRLF.join(header_lines))
            length = int(fields.get(b"content-length", b"0"))
            payload = stream.read(length)
            if len(payload) < length:
                # a short read means the file was cut mid-record — fail
                # loudly like the bad-magic branch, never emit a silently
                # truncated payload row
                raise ValueError(
                    f"{path}: truncated WARC record (Content-Length "
                    f"{length}, {len(payload)} bytes available)")
            if fields.get(b"warc-type", b"") in self._record_types:
                # errors='replace': real crawls carry non-UTF-8 header
                # bytes (latin-1 URLs); one bad URL must not kill the
                # file's read task
                urls.append(fields.get(b"warc-target-uri", b"")
                            .decode("utf-8", "replace"))
                tss.append(fields.get(b"warc-date", b"")
                           .decode("utf-8", "replace"))
                payloads.append(_strip_http(payload) if self._strip_http
                                else payload)
                if len(urls) >= self._rows_per_block:
                    yield pa.table({"url": urls, "warc_ts": tss,
                                    "payload": payloads},
                                   schema=WARC_SCHEMA)
                    urls, tss, payloads = [], [], []
        if urls:
            yield pa.table({"url": urls, "warc_ts": tss,
                            "payload": payloads}, schema=WARC_SCHEMA)


class _NativeRawAdapter(io.RawIOBase):
    """Minimal RawIOBase view over a pyarrow NativeFile for BufferedReader."""

    def __init__(self, f):
        self._f = f

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        data = self._f.read(len(b))
        b[:len(data)] = data
        return len(data)


def read_warc(paths: Union[str, List[str]], *,
              record_types: tuple = ("response",),
              strip_http_headers: bool = True,
              rows_per_block: int = 1024, **read_args):
    """Read WARC file(s) into a Dataset of (url, warc_ts, payload)."""
    import ray.data as rd
    return rd.read_datasource(
        WARCDatasource(paths, record_types=record_types,
                       strip_http_headers=strip_http_headers,
                       rows_per_block=rows_per_block), **read_args)


def write_warc_file(path: str, records: list, *,
                    http_headers: bool = True) -> None:
    """Deterministic WARC/1.0 writer for fixtures: ``records`` is a list of
    (url, iso_ts, payload_bytes). Emits `warcinfo` + one `response` record
    per row, byte-stable for identical input."""
    with open(path, "wb") as out:
        info = b"software: pdfextraction-ray-fixture\r\n"
        out.write(b"WARC/1.0\r\n"
                  b"WARC-Type: warcinfo\r\n"
                  b"WARC-Date: 2020-01-01T00:00:00Z\r\n"
                  + b"Content-Length: " + str(len(info)).encode() + _CRLF
                  + _CRLF + info + _CRLF + _CRLF)
        for url, ts, payload in records:
            if http_headers:
                head = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                        b"Content-Length: " + str(len(payload)).encode()
                        + _CRLF + _CRLF)
                payload = head + payload
            out.write(b"WARC/1.0\r\n"
                      b"WARC-Type: response\r\n"
                      + b"WARC-Target-URI: " + url.encode() + _CRLF
                      + b"WARC-Date: " + ts.encode() + _CRLF
                      + b"Content-Length: " + str(len(payload)).encode()
                      + _CRLF + _CRLF)
            out.write(payload)
            out.write(_CRLF + _CRLF)
