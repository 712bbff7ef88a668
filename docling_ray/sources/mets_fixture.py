"""Deterministic synthetic METS-GBS archive fixtures (TRUE-golden input).

Renders the SAME generator-known page cells as ``sources/pdf_pages.py``
(``_make_page_cells`` — integer-coordinate one/two-column line layouts
with controlled hyphenation and a construct-stream expected text) into
the METS-GBS container the reference backend consumes
(``/root/reference/docling/backend/mets_gbs_backend.py:197-399``): a
tar.gz holding one ``mets:mets PROFILE="gbs"`` manifest whose
``fileGrp USE="coordOCR"`` + ``structMap`` page divs map 1-indexed
ORDER values to per-page hOCR files of ``ocr_line`` spans with
``bbox l t r b;x_wconf`` titles.

Because every generated coordinate is integral, the hOCR round-trip is
LOSSLESS: parsing the archive yields exactly the generator's cells, so
the expected assembled document text is known at GENERATION time — the
pattern behind the repo's other TRUE goldens — while parity with the
reference's real fixture stays separately pytest-proven
(``tests/test_mets_gbs.py``).
"""

from __future__ import annotations

import gzip
import io
import random
import tarfile
from xml.sax.saxutils import escape, quoteattr

from docling_ray.sources.pdf_pages import _make_page_cells

_PAGE_W, _PAGE_H = 612, 792


def _hocr_page(cells: list[dict]) -> bytes:
    spans = []
    for c in cells:
        l, t, r, b = (c[k] for k in ("l", "t", "r", "b"))
        assert all(float(int(v)) == v for v in (l, t, r, b)), \
            "generator coordinates must be integral for a lossless hOCR"
        title = f"bbox {int(l)} {int(t)} {int(r)} {int(b)};x_wconf 100"
        spans.append(f'  <span class="ocr_line" title={quoteattr(title)}>'
                     f"{escape(c['text'])}</span>")
    body = "\n".join(spans)
    return (
        "<html><body>\n"
        f'<div class="ocr_page" title="bbox 0 0 {_PAGE_W} {_PAGE_H}">\n'
        f"{body}\n</div>\n</body></html>\n"
    ).encode()


def _mets_xml(n_pages: int) -> bytes:
    files = "\n".join(
        f'      <mets:file ID="OCR{p}">'
        f'<mets:FLocat xlink:href="page{p:04d}.html"/></mets:file>'
        for p in range(n_pages))
    divs = "\n".join(
        f'    <mets:div TYPE="page" ORDER="{p + 1}">'
        f'<mets:fptr FILEID="OCR{p}"/></mets:div>'
        for p in range(n_pages))
    return (
        '<mets:mets xmlns:mets="http://www.loc.gov/METS/" '
        'xmlns:xlink="http://www.w3.org/1999/xlink" PROFILE="gbs">\n'
        "  <mets:fileSec>\n"
        '    <mets:fileGrp USE="coordOCR">\n'
        f"{files}\n"
        "    </mets:fileGrp>\n"
        "  </mets:fileSec>\n"
        "  <mets:structMap>\n"
        f"{divs}\n"
        "  </mets:structMap>\n"
        "</mets:mets>\n"
    ).encode()


def make_mets_archive(n_pages: int = 3, seed: int = 7) -> tuple[bytes, str]:
    """Returns ``(tar_gz_bytes, expected_document_text)``.

    The expected text is the generator's OWN construct-stream prediction
    (de-hyphenated column texts in reading order, pages joined by
    newline) — computed without running any parse/layout kernel."""
    rng = random.Random(seed)
    members: list[tuple[str, bytes]] = [("mets.xml", _mets_xml(n_pages))]
    page_texts: list[str] = []
    for p in range(n_pages):
        cells, parts = _make_page_cells(rng, two_column=rng.random() < 0.4)
        members.append((f"page{p:04d}.html", _hocr_page(cells)))
        page_texts.append("\n".join(parts))
    buf = io.BytesIO()
    # fixed mtime/owner → byte-stable archive across runs
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        with tarfile.open(fileobj=gz, mode="w") as tar:
            for name, data in members:
                info = tarfile.TarInfo(name=name)
                info.size = len(data)
                info.mtime = 0
                tar.addfile(info, io.BytesIO(data))
    return buf.getvalue(), "\n".join(page_texts)
