"""Translation add-on tests (convert_to_interactive_html.py:57-85 walk)."""

import pyarrow as pa

from docling_ray.doctree import DocTree, TableCell, TableData
from docling_ray.stages.translate import (
    MarkingStubTranslator,
    translate_document,
)


def _doc():
    doc = DocTree("d")
    doc.add_heading(None, "Hello")
    doc.add_text(label="text", text="A paragraph.")
    doc.add_text(label="text", text="   ")  # whitespace-only: untouched
    doc.add_table(TableData(num_rows=1, num_cols=2, table_cells=[
        TableCell(text="cell one", start_row=0, end_row=1,
                  start_col=0, end_col=1),
        TableCell(text="cell two", start_row=0, end_row=1,
                  start_col=1, end_col=2),
    ]))
    return doc


def test_walk_translates_and_preserves_orig():
    doc = translate_document(_doc(), MarkingStubTranslator())
    items = [i for i, _ in doc.iterate()]
    assert items[0].text == "[zh] Hello" and items[0].orig == "Hello"
    assert items[1].text == "[zh] A paragraph."
    assert items[2].text == "   "  # empty text passes through
    table = items[3]
    assert [c.text for c in table.data.table_cells] == \
        ["[zh] cell one", "[zh] cell two"]


def test_failing_translator_keeps_original():
    class Broken:
        def translate(self, text, src="en", dest="zh"):
            raise RuntimeError("no backend")

    doc = translate_document(_doc(), Broken())
    items = [i for i, _ in doc.iterate()]
    assert items[0].text == "Hello"


def test_translation_stage_actor(ray_session):
    import ray.data

    from docling_ray.kernels.docjson import load_docjson
    from docling_ray.kernels.docjson_write import to_docjson
    from docling_ray.stages.translate import translate_dataset

    ds = ray.data.from_arrow(pa.table({
        "doc_id": ["a"],
        "doc_json": pa.array([to_docjson(_doc())], pa.large_string()),
    }))
    out = translate_dataset(ds, concurrency=1).to_pandas()
    doc = load_docjson(out.loc[0, "doc_json"])
    texts = [i.text for i, _ in doc.iterate() if getattr(i, "text", None)]
    assert texts[0] == "[zh] Hello"


def test_http_translator_against_local_server():
    """HttpTranslator speaks the documented JSON contract (verified
    against a throwaway localhost server; no external network)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from docling_ray.stages.translate import HttpTranslator

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(self.rfile.read(
                int(self.headers["Content-Length"])))
            out = json.dumps({"text": f"[{body['dest']}] {body['text']}"})
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(out.encode())

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        tr = HttpTranslator(
            f"http://127.0.0.1:{server.server_address[1]}/translate")
        assert tr.translate("Hello", dest="zh") == "[zh] Hello"
        doc = translate_document(_doc(), tr)
        items = [i for i, _ in doc.iterate()]
        assert items[0].text == "[zh] Hello" and items[0].orig == "Hello"
    finally:
        server.shutdown()


def test_formula_orig_survives_translation():
    from docling_ray.doctree import DocTree

    doc = DocTree("d")
    f = doc.add_text(label="formula", text="", orig="E = mc^2")
    translate_document(doc, MarkingStubTranslator())
    assert f.orig == "E = mc^2"  # source not clobbered
