"""Document translation add-on (the fork's feature, re-expressed).

Surface port of ``/root/reference/convert_to_interactive_html.py:57-85``:
``translate_document`` walks the item tree, translating every text item
(the original is preserved in ``orig``, the translation replaces
``text``) and every table cell's text in place (no original kept — the
upstream cell type has no slot for it, a quirk we mirror); a translator
is any object with ``translate(text, src, dest) -> str``, and a failing
translator returns the input text unchanged (never raises into the
pipeline).

The fork's concrete backends are HTTP clients to private services and an
offline argos model — neither is available or appropriate here, so the
shipped backends are:

- ``MarkingStubTranslator``: deterministic offline stub that wraps text
  with a language marker — exercises the full walk/write-back contract;
- ``HttpTranslator``: a generic JSON-over-HTTP client for a
  user-supplied endpoint (same translate() contract; network is absent
  in this runtime so it is construct-only tested).

Ray shape: actor-pool ``map_batches`` over ``doc_json`` — the translator
(model/session) is built once per actor.
"""

from __future__ import annotations

import logging
from typing import Protocol

import pyarrow as pa

from docling_ray.doctree import DocTree, TableItem, TextItem

logger = logging.getLogger(__name__)


class Translator(Protocol):
    def translate(self, text: str, src: str = "en",
                  dest: str = "zh") -> str: ...


def translate_document(doc: DocTree, translator: Translator,
                       src: str = "en", dest: str = "zh") -> DocTree:
    """The reference's walk: TextItems keep the original in ``orig``;
    table cells translate in place; empty text passes through."""
    for item, _ in doc.iterate():
        if isinstance(item, TextItem):
            # keep a pre-existing distinct orig (e.g. formula sources live
            # in orig with text="") instead of clobbering it with text
            if item.orig is None or item.orig == item.text:
                item.orig = item.text
            item.text = _safe(translator, item.text, src, dest)
        elif isinstance(item, TableItem):
            for cell in item.data.table_cells:
                cell.text = _safe(translator, cell.text, src, dest)
    return doc


def _safe(translator: Translator, text: str, src: str, dest: str) -> str:
    if not text.strip():
        return text
    try:
        return translator.translate(text, src=src, dest=dest)
    except Exception as exc:  # failure → original text (upstream contract)
        logger.warning("translation failed, keeping original: %s", exc)
        return text


class MarkingStubTranslator:
    """Deterministic offline stub: ``[dest] <text>`` — holds the contract
    so the walk, orig-preservation and cell handling are testable without
    a model or network."""

    def translate(self, text: str, src: str = "en", dest: str = "zh") -> str:
        return f"[{dest}] {text}"


class HttpTranslator:
    """Generic JSON HTTP translation client: POST {text, src, dest} to a
    user-configured endpoint, expect {"text": ...} back.  No network in
    this runtime — failures fall back to the original text via ``_safe``."""

    def __init__(self, endpoint: str, timeout: float = 30.0,
                 headers: dict | None = None):
        self.endpoint = endpoint
        self.timeout = timeout
        self.headers = {"Content-Type": "application/json", **(headers or {})}

    def translate(self, text: str, src: str = "en", dest: str = "zh") -> str:
        import json
        import urllib.request

        req = urllib.request.Request(
            self.endpoint,
            data=json.dumps({"text": text, "src": src,
                             "dest": dest}).encode("utf-8"),
            headers=self.headers)
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))["text"]


class TranslationStage:
    """Actor-pool stage over the ``doc_json`` column; the translator is
    built once per actor (``__init__``)."""

    def __init__(self, translator_factory=MarkingStubTranslator,
                 src: str = "en", dest: str = "zh"):
        self.translator = translator_factory()
        self.src = src
        self.dest = dest

    def __call__(self, batch: pa.Table) -> pa.Table:
        from docling_ray.kernels.docjson import load_docjson
        from docling_ray.kernels.docjson_write import to_docjson

        out = []
        for value in batch["doc_json"]:
            raw = value.as_py() or ""
            if not raw:
                out.append(raw)
                continue
            doc = translate_document(load_docjson(raw), self.translator,
                                     self.src, self.dest)
            out.append(to_docjson(doc))
        batch = batch.drop_columns(["doc_json"])
        return batch.append_column(
            "doc_json", pa.array(out, pa.large_string()))


def translate_dataset(ds, translator_factory=MarkingStubTranslator,
                      src: str = "en", dest: str = "zh",
                      concurrency: int = 2):
    return ds.map_batches(
        TranslationStage, batch_format="pyarrow", concurrency=(1, concurrency),
        fn_constructor_kwargs={"translator_factory": translator_factory,
                               "src": src, "dest": dest})
