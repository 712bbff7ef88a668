"""Ray Data stages for the extraction pipeline.

Each stage is a callable suitable for ``ds.map_batches(fn,
batch_format="pyarrow")``.  The HTML walk is inherently per-document Python
work, so the batch wrapper's job is to keep everything else zero-copy:
batches stay ``pyarrow.Table``s end to end, errors become data columns (the
reference's ``raises_on_error=False`` semantics,
``/root/reference/docling/document_converter.py:376-398``), and oversized
payload columns are projected away by the pipeline between stages.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

from docling_ray.kernels.html_extract import extract_html
from docling_ray.kernels.markdown import to_markdown

# -- format sniffing --------------------------------------------------------

_HTML_RE = re.compile(
    rb"(?i)<\s*(!doctype\s+html|html|head|body|div|p|h1)\b")
_XML_RE = re.compile(rb"^\s*<\?xml")
# non-HTML doctype whose root element opens right after — XML without a
# prolog (reference pattern, document.py:431-436)
_XML_DOCTYPE_RE = re.compile(
    rb"<!doctype\s+(?P<root>[a-zA-Z_:][a-zA-Z0-9_:.-]*)\s+[^>]*>\s*<(?P=root)\b",
    re.IGNORECASE)


_EXT_FORMATS = {
    ".html": "html", ".htm": "html", ".xhtml": "html",
    ".csv": "csv", ".json": "json",
    # .txt intentionally content-sniffed (USPTO APS "PATN" files are .txt)
    ".md": "markdown", ".markdown": "markdown",
    ".adoc": "asciidoc", ".asciidoc": "asciidoc",
    ".xml": "xml", ".nxml": "xml",
    ".docx": "docx", ".xlsx": "xlsx", ".xlsm": "xlsx", ".pptx": "pptx",
}


def sniff_format_bytes(raw: bytes, filename: str = "") -> str:
    """Format guess: file extension when available (the reference routes by
    extension/mime first, ``document.py:280-338``), else content sniffing
    over the leading bytes."""
    if filename:
        import os as _os

        ext = _os.path.splitext(filename)[1].lower()
        if ext in _EXT_FORMATS:
            fmt = _EXT_FORMATS[ext]
            return _sniff_ooxml(raw) if fmt in ("docx", "xlsx", "pptx") else fmt
    head = raw[:4096]
    if head[:3] == b"\xef\xbb\xbf":  # UTF-8 BOM
        head = head[3:]
    head = head.lstrip()
    if not head:
        return "empty"
    if head.startswith(b"PATN"):
        return "uspto"
    if head[:2] == b"PK":
        return _sniff_ooxml(raw)
    if head[:2] == b"\x1f\x8b":
        # gzip: the only gzip container format we route is METS-GBS
        # (reference gates on mime application/gzip + mets probe,
        # document.py:320-322); a non-METS archive becomes a failure row
        return "mets_gbs"
    if _XML_RE.match(head):
        return "xml"
    if _HTML_RE.search(head):
        return "html"
    if _XML_DOCTYPE_RE.search(head):
        return "xml"
    if head[:1] in (b"{", b"["):
        return "json"
    try:
        text = head.decode("utf-8")
    except UnicodeDecodeError:
        return "binary"
    # csv sniff over the leading lines (document.py:439-466 analog): the
    # dialect must parse the sample into rows of one consistent width
    import csv as _csv
    import io as _io

    lines = [ln for ln in text.splitlines() if ln.strip()][:10]
    if len(lines) >= 2:
        try:
            dialect = _csv.Sniffer().sniff(lines[0], ",;\t|:")
            if dialect.delimiter in {",", ";", "\t", "|", ":"}:
                widths = {len(row) for row in
                          _csv.reader(_io.StringIO("\n".join(lines)), dialect)}
                if len(widths) == 1 and widths != {1}:
                    return "csv"
        except _csv.Error:
            pass
    return "text"


def _sniff_ooxml(raw: bytes) -> str:
    import zipfile
    from io import BytesIO

    try:
        names = set(zipfile.ZipFile(BytesIO(raw)).namelist())
    except Exception:
        return "binary"
    if "word/document.xml" in names:
        return "docx"
    if "xl/workbook.xml" in names:
        return "xlsx"
    if "ppt/presentation.xml" in names:
        return "pptx"
    return "zip"


def sniff_batch(batch: pa.Table) -> pa.Table:
    fmt = [sniff_format_bytes(v.as_py() or b"") for v in batch["html"]]
    return batch.append_column("format", pa.array(fmt, pa.string()))


def hash_batch(batch: pa.Table, column: str = "html",
               out: str = "doc_id") -> pa.Table:
    """sha-256 identity key per document (mirror of
    ``/root/reference/docling/utils/utils.py:19-37``)."""
    ids = [hashlib.sha256(v.as_py() or b"").hexdigest() for v in batch[column]]
    return batch.append_column(out, pa.array(ids, pa.string()))


# -- extraction -------------------------------------------------------------

def extract_doc(raw: bytes, fmt: str):
    """bytes + sniffed format → DocTree (per-format kernel dispatch, the
    ``FormatOption`` routing analog of
    ``/root/reference/docling/document_converter.py:61-129``)."""
    if fmt == "xml":
        # doctype disambiguation mirrors the reference's marker lists
        # (/root/reference/docling/datamodel/document.py:340-374): USPTO for
        # the four patent DTD generations (incl. Grant V2.5 "us-grant-025"),
        # JATS for journal-publishing/archive doctypes.  Other XML is only
        # treated as XHTML when it actually declares itself XHTML; arbitrary
        # XML (feeds, config) is unsupported, not tag-soup "success".
        head = raw[:4096].decode("utf-8", errors="replace")
        doctype_m = re.search(r"<!DOCTYPE [^>]+>", head, re.IGNORECASE)
        doctype = doctype_m.group() if doctype_m else ""
        # case-insensitive: v2.5 grants declare "ST32-US-Grant-025xml.dtd",
        # pap-v1 publications "PATENT-APPLICATION-PUBLICATION"
        if any(marker in doctype.lower() for marker in (
                "us-patent-application-v4", "us-patent-grant-v4",
                "us-grant-025", "patent-application-publication")):
            from docling_ray.kernels.uspto_extract import extract_uspto

            return extract_uspto(raw)
        if "JATS-journalpublishing" in doctype or "JATS-archive" in doctype:
            from docling_ray.kernels.jats_extract import extract_jats

            return extract_jats(raw)
        lowered = head.lower()
        if "<html" in lowered:
            return extract_html(raw)
        # doctype-free JATS (common in the wild): the <article> root wins
        # over an incidental 'xhtml' substring (a table-namespace decl or
        # URL would otherwise misroute the article to tag-soup HTML)
        if "<article" in lowered:
            from docling_ray.kernels.jats_extract import extract_jats

            return extract_jats(raw)
        if "xhtml" in lowered[:1000]:  # reference's 1KB xhtml sniff window
            return extract_html(raw)
        raise ValueError("unsupported XML document (no USPTO/JATS/XHTML markers)")
    if fmt == "uspto":
        from docling_ray.kernels.uspto_extract import extract_uspto

        return extract_uspto(raw)
    if fmt == "mets_gbs":
        from docling_ray.kernels.mets_gbs import extract_mets_gbs

        return extract_mets_gbs(raw)
    if fmt == "html":
        return extract_html(raw)
    if fmt == "asciidoc":
        from docling_ray.kernels.asciidoc_extract import extract_asciidoc

        return extract_asciidoc(raw)
    if fmt == "docx":
        from docling_ray.kernels.docx_extract import extract_docx

        return extract_docx(raw)
    if fmt == "xlsx":
        from docling_ray.kernels.xlsx_extract import extract_xlsx

        return extract_xlsx(raw)
    if fmt == "pptx":
        from docling_ray.kernels.pptx_extract import extract_pptx

        return extract_pptx(raw)
    if fmt == "csv":
        from docling_ray.kernels.csv_extract import extract_csv

        return extract_csv(raw)
    if fmt == "json":
        from docling_ray.kernels.docjson import load_docjson

        return load_docjson(raw)
    if fmt in ("text", "markdown"):
        from docling_ray.kernels.md_extract import extract_markdown

        return extract_markdown(raw)
    raise ValueError(f"unsupported format: {fmt}")


def extract_batch(batch: pa.Table, emit_doc_json: bool = False,
                  limits=None) -> pa.Table:
    """document bytes → extracted markdown text (+status/error columns).

    The markdown string is the byte-identical-per-url oracle target; the
    kernel matches the reference converter on its own fixture corpus.
    With ``emit_doc_json`` the canonical item-tree JSON is kept as a
    column so downstream stages (chunking, enrichment, re-serialization)
    never re-parse the raw bytes.
    """
    import time as _time

    formats = (batch["format"].to_pylist() if "format" in batch.column_names
               else None)
    texts: list[str] = []
    n_items: list[int] = []
    statuses: list[str] = []
    errors: list[str] = []
    doc_jsons: list[str] = []
    doc_secs: list[float] = []
    timeout = getattr(limits, "document_timeout", None) if limits else None
    for i, value in enumerate(batch["html"]):
        _t0 = _time.monotonic()
        raw = value.as_py() or b""
        fmt = formats[i] if formats else "html"
        if limits is not None and len(raw) > limits.max_file_size:
            # oversize payload: invalid document, never parsed
            # (document.py:135-149 semantics)
            texts.append("")
            n_items.append(0)
            statuses.append("failure")
            errors.append(f"file size {len(raw)} exceeds limit "
                          f"{limits.max_file_size}")
            doc_jsons.append("")
            doc_secs.append(_time.monotonic() - _t0)
            continue
        if fmt == "binary":
            # undecodable payload with no recognized container: a failure
            # row, not an exception (reference marks such inputs FAILURE)
            texts.append("")
            n_items.append(0)
            statuses.append("failure")
            errors.append("unsupported binary payload")
            doc_jsons.append("")
            doc_secs.append(_time.monotonic() - _t0)
            continue
        try:
            doc = extract_doc(raw, fmt if fmt != "empty" else "html")
            md = to_markdown(doc)
            texts.append(md)
            n_items.append(sum(1 for _ in doc.iterate()))
            statuses.append("success")
            errors.append("")
            if emit_doc_json:
                from docling_ray.kernels.docjson_write import to_docjson

                doc_jsons.append(to_docjson(doc))
            else:
                doc_jsons.append("")
            doc_secs.append(_time.monotonic() - _t0)
        except Exception as exc:  # never raise: errors are data
            texts.append("")
            n_items.append(0)
            statuses.append("failure")
            errors.append(f"{type(exc).__name__}: {exc}")
            doc_jsons.append("")
            doc_secs.append(_time.monotonic() - _t0)
    out = batch.append_column("extracted_text", pa.array(texts, pa.large_string()))
    out = out.append_column("n_items", pa.array(n_items, pa.int32()))
    out = out.append_column("status", pa.array(statuses, pa.string()))
    out = out.append_column("error", pa.array(errors, pa.string()))
    if emit_doc_json:
        out = out.append_column("doc_json",
                                pa.array(doc_jsons, pa.large_string()))
    if timeout is not None:
        out = out.append_column("doc_sec", pa.array(doc_secs, pa.float64()))
        out = out.append_column(
            "timed_out",
            pa.array([s > timeout for s in doc_secs], pa.bool_()))
    return out


def extract_and_project(batch: pa.Table,
                        emit_doc_json: bool = False) -> pa.Table:
    """Fused sniff+hash+extract, dropping the heavy ``html`` payload on the
    way out — the downstream pipeline only ships extracted text (plus the
    ``doc_json`` item tree when a downstream stage — chunking, enrichment —
    consumes the structure; re-parsing raw bytes downstream is wasted
    work)."""
    batch = sniff_batch(batch)
    batch = hash_batch(batch)
    batch = extract_batch(batch, emit_doc_json=emit_doc_json)
    keep = [c for c in batch.column_names if c != "html"]
    return batch.select(keep)


def size_bucket_batch(batch: pa.Table, column: str = "html") -> pa.Table:
    """Byte-size bucket (log2 of payload size) used to repartition skewed
    inputs before the heavy stage (north-rule skew defense)."""
    sizes = pa.compute.binary_length(batch[column])
    buckets = [max(0, int(s.as_py() or 0).bit_length() - 10) for s in sizes]
    out = batch.append_column("size_bytes", sizes.cast(pa.int64()))
    return out.append_column("size_bucket", pa.array(buckets, pa.int8()))
