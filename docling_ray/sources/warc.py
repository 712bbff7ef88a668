"""Minimal WARC/1.0 reader + deterministic WARC corpus generator.

Common-Crawl ships as WARC: concatenated (usually gzip-per-record)
records, each a header block terminated by CRLFCRLF with a
``Content-Length``-delimited payload; ``response`` records carry a full
HTTP response (status line + headers + body).  The reference ingests
loose files/streams (``docling/datamodel/document.py:241-278``) and has
no container formats; a crawl-scale engine must split the container
INSIDE the pipeline so shards parallelize by WARC chunk, not by
pre-exploded file.

``parse_warc`` is a pure function over one chunk's bytes (record
splitting is Content-Length driven — never delimiter scanning, so
binary payloads can contain anything); ``stages.scan`` is not involved.
Only ``WARC-Type: response`` records are emitted; the HTTP header block
is stripped to the body.  Gzip member concatenation is handled by
zlib decompression with multi-member looping (stdlib only).

The generator (`make_warc_table`) wraps the webpages corpus
(sources/webpages.py) so expected rows are TRUE-golden by construction:
the url/ts/html triplets ARE the generator's own, before WARC framing.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(raw: bytes) -> bytes:
    """Decompress concatenated gzip members (the WARC convention); plain
    bytes pass through untouched."""
    if not raw.startswith(b"\x1f\x8b"):
        return raw
    out = []
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(raw[pos:]))
        except zlib.error:
            break        # corrupt member / trailing junk: errors are data
        consumed = len(raw) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def parse_warc(raw: bytes) -> list[dict]:
    """One WARC chunk → list of ``{url, warc_date, html}`` for every
    ``response`` record.  Content-Length-driven record walk; malformed
    trailing bytes end the walk (never raise — errors are data)."""
    data = _gunzip_members(raw)
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF2, pos)
        if head_end < 0 or not data[pos:pos + 5] == b"WARC/":
            break
        headers = {}
        for line in data[pos:head_end].decode(
                "utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        if clen < 0:
            break       # adversarial negative length would walk BACKWARD
        body = data[head_end + 4:head_end + 4 + clen]
        pos = head_end + 4 + clen
        if headers.get("warc-type") != "response":
            continue
        http_end = body.find(_CRLF2)
        payload = body[http_end + 4:] if http_end >= 0 else body
        out.append({
            "url": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "html": payload,
        })
    return out


def _frame_record(url: str, date_iso: str, html: bytes,
                  gzip_member: bool) -> bytes:
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + html)
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date_iso}\r\n"
            f"Content-Length: {len(http)}\r\n\r\n").encode()
    rec = head + http + b"\r\n\r\n"
    if gzip_member:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(rec) + co.flush()
    return rec


def make_warc_table(n: int, seed: int = 42, records_per_chunk: int = 20,
                    gzip_members: bool = True) -> pa.Table:
    """Deterministic WARC corpus: the webpages rows framed as WARC
    response records (one optional gzip member each), ``records_per_chunk``
    records concatenated per chunk row — ``(chunk_id, warc:binary)``.
    A ``warcinfo`` record leads each chunk (readers must skip it)."""
    from docling_ray.sources.webpages import make_rows

    data = make_rows(0, n, seed=seed)
    chunks, ids = [], []
    cur: list[bytes] = []
    for i, (u, ts, html) in enumerate(zip(data["url"], data["warc_ts"],
                                          data["html"])):
        if not cur:
            info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                    b"Content-Length: 9\r\n\r\nwarc-info\r\n\r\n")
            if gzip_members:
                co = zlib.compressobj(6, zlib.DEFLATED, 31)
                info = co.compress(info) + co.flush()
            cur.append(info)
        cur.append(_frame_record(u, ts.isoformat() + "Z", html,
                                 gzip_members))
        if (i + 1) % records_per_chunk == 0:
            ids.append(len(ids))
            chunks.append(b"".join(cur))
            cur = []
    if cur:
        ids.append(len(ids))
        chunks.append(b"".join(cur))
    return pa.table({"chunk_id": pa.array(ids, pa.int64()),
                     "warc": pa.array(chunks, pa.large_binary())})
