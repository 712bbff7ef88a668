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


def _gunzip_members(raw: bytes) -> tuple[bytes, int]:
    """Decompress concatenated gzip members (the WARC convention); plain
    bytes pass through untouched.  Returns ``(data, truncated)`` where
    ``truncated`` is 1 when a corrupt member ended decompression early
    (the good prefix is still returned — errors are DATA, never an
    exception, but never silent either)."""
    if not raw.startswith(b"\x1f\x8b"):
        return raw, 0
    out = []
    pos = 0
    truncated = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(raw[pos:]))
        except zlib.error:
            truncated = 1   # corrupt member / trailing junk
            break
        consumed = len(raw) - pos - len(d.unused_data)
        if consumed <= 0:
            truncated = 1   # decoder made no progress: malformed stream
            break
        pos += consumed
    return b"".join(out), truncated


def parse_warc_stats(raw: bytes) -> tuple[list[dict], dict]:
    """One WARC chunk → ``(records, stats)``: the ``{url, warc_date,
    html}`` rows of every well-formed ``response`` record, plus
    counters so malformed input is VISIBLE data rather than a silent
    shorter output — ``n_records`` (records fully walked, any type),
    ``n_responses`` (emitted rows) and ``n_truncated`` (1 when the walk
    ended early: corrupt gzip member, non-WARC bytes mid-chunk, bad or
    negative Content-Length, or a body cut short by the chunk
    boundary).  Content-Length-driven record walk; never raises."""
    data, truncated = _gunzip_members(raw)
    out: list[dict] = []
    n_records = 0
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
            truncated = 1
            break
        headers = {}
        for line in data[pos:head_end].decode(
                "utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            truncated = 1
            break
        if clen < 0:
            truncated = 1   # negative length would walk BACKWARD
            break
        if head_end + 4 + clen > n:
            truncated = 1   # body cut short by the chunk boundary:
            break           # never emit a partial payload as a page
        body = data[head_end + 4:head_end + 4 + clen]
        pos = head_end + 4 + clen
        n_records += 1
        if headers.get("warc-type") != "response":
            continue
        http_end = body.find(_CRLF2)
        payload = body[http_end + 4:] if http_end >= 0 else body
        out.append({
            "url": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "html": payload,
        })
    return out, {"n_records": n_records, "n_responses": len(out),
                 "n_truncated": truncated}


def parse_warc(raw: bytes) -> list[dict]:
    """One WARC chunk → list of ``{url, warc_date, html}`` for every
    ``response`` record (see `parse_warc_stats` for the counter-bearing
    form; this is the rows-only view)."""
    return parse_warc_stats(raw)[0]


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


def make_warc_members(n: int, seed: int = 42,
                      records_per_chunk: int = 20,
                      gzip_members: bool = True) -> list[list[bytes]]:
    """The member-level view of `make_warc_table`: one list per chunk,
    each element a single framed record (gzip member when
    ``gzip_members``) — a leading ``warcinfo`` record then
    ``records_per_chunk`` responses.  Exposing the boundaries lets
    tests and the ``warc_stats`` query build DETERMINISTICALLY
    corrupted chunks whose good-prefix length is known by construction
    (a TRUE golden for the truncation counters)."""
    from docling_ray.sources.webpages import make_rows

    data = make_rows(0, n, seed=seed)
    chunks: list[list[bytes]] = []
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
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return chunks


def make_warc_table(n: int, seed: int = 42, records_per_chunk: int = 20,
                    gzip_members: bool = True) -> pa.Table:
    """Deterministic WARC corpus: the webpages rows framed as WARC
    response records (one optional gzip member each), ``records_per_chunk``
    records concatenated per chunk row — ``(chunk_id, warc:binary)``.
    A ``warcinfo`` record leads each chunk (readers must skip it)."""
    chunks = [b"".join(members) for members in
              make_warc_members(n, seed, records_per_chunk, gzip_members)]
    return pa.table({"chunk_id": pa.array(range(len(chunks)), pa.int64()),
                     "warc": pa.array(chunks, pa.large_binary())})
