"""Enrichment surface + driver.

Mirror of the reference's enrichment contract
(``/root/reference/docling/models/base_model.py:125-186``) and driver
(``/root/reference/docling/pipeline/base_pipeline.py:70-92``): a model
declares ``is_processable`` / ``prepare_element`` / ``__call__``, the
driver streams the document's items through ``prepare_element``, batches
them with ``chunkify(elements_batch_size=16)``
(``settings.py:33-35``), runs the model per batch and must exhaust its
output; outputs land on ``item.annotations``.

Ray shape: a whole document is the enrichment unit (items of one doc stay
together — the model sees the doc for context, exactly as upstream), so
the distributed form is an ACTOR-POOL ``map_batches`` over the doc_json
column: weights load once per actor in ``__init__``, each batch enriches
its documents in place and re-serializes.  Cross-doc element batching is
intentionally not done — it would shuffle per-item crops for a 16-element
micro-batch win.

This runtime has no model weights, so the shipped models are DETERMINISTIC
STUB TIERS (clearly marked) that exercise the full contract: a code
language classifier (regex heuristics) and a picture classifier (constant
class).  A learned model drops into the same class slot.
"""

from __future__ import annotations

import re
from itertools import islice
from typing import Iterable, Iterator, Optional

import pyarrow as pa

from docling_ray.doctree import DocTree, Item

ELEMENTS_BATCH_SIZE = 16


def chunkify(iterator: Iterable, chunk_size: int) -> Iterator[list]:
    """``/root/reference/docling/utils/utils.py:11-16``."""
    it = iter(iterator)
    while chunk := list(islice(it, chunk_size)):
        yield chunk


class BaseEnrichmentModel:
    """Contract of ``GenericEnrichmentModel``; subclass and override."""

    elements_batch_size: int = ELEMENTS_BATCH_SIZE

    def is_processable(self, doc: DocTree, element: Item) -> bool:
        raise NotImplementedError

    def prepare_element(self, doc: DocTree, element: Item) -> Optional[Item]:
        if self.is_processable(doc, element):
            return element
        return None

    def __call__(self, doc: DocTree,
                 element_batch: Iterable[Item]) -> Iterable[Item]:
        raise NotImplementedError


def enrich_document(doc: DocTree,
                    models: list[BaseEnrichmentModel]) -> DocTree:
    """The ``_enrich_document`` driver: prepare → chunkify → run →
    exhaust (``base_pipeline.py:70-92``)."""
    for model in models:
        prepared = (
            p for item, _ in doc.iterate()
            if (p := model.prepare_element(doc, item)) is not None)
        for element_batch in chunkify(prepared, model.elements_batch_size):
            for _ in model(doc=doc, element_batch=element_batch):
                pass  # must exhaust
    return doc


# -- stub model tiers (deterministic; weights absent in this runtime) -------

_LANG_HINTS = [
    ("python", re.compile(r"\bdef \w+\(|\bimport \w+|:\n\s{4}")),
    ("javascript", re.compile(r"\bfunction\s*\w*\(|=>|\bconst \w+")),
    ("java", re.compile(r"\bpublic (static |class )|\bSystem\.out")),
    ("c", re.compile(r"#include\s*<|\bprintf\(")),
    ("sql", re.compile(r"(?i)\bSELECT\b.*\bFROM\b")),
    ("shell", re.compile(r"^\s*(\$ |#!\s*/bin/)", re.M)),
]


class CodeLanguageStubModel(BaseEnrichmentModel):
    """STUB tier of ``CodeFormulaModel``'s code-language output
    (``/root/reference/docling/models/code_formula_model.py:45-337``):
    deterministic regex heuristics instead of the vision model; same
    is_processable filter (code items) and write-back contract."""

    def is_processable(self, doc: DocTree, element: Item) -> bool:
        return getattr(element, "label", "") == "code"

    def __call__(self, doc, element_batch):
        for item in element_batch:
            text = getattr(item, "text", "") or ""
            lang = "unknown"
            for name, rx in _LANG_HINTS:
                if rx.search(text):
                    lang = name
                    break
            item.annotations.append({"kind": "code_language", "value": lang})
            yield item


class PictureClassifierStubModel(BaseEnrichmentModel):
    """STUB tier of ``DocumentPictureClassifier``
    (``document_picture_classifier.py:1-185``): constant deterministic
    class with confidence 1.0 — holds the annotation shape
    (list of (class_name, confidence))."""

    def is_processable(self, doc: DocTree, element: Item) -> bool:
        return getattr(element, "label", "") == "picture"

    def __call__(self, doc, element_batch):
        for item in element_batch:
            item.annotations.append({
                "kind": "picture_class",
                "predicted_classes": [{"class_name": "other",
                                       "confidence": 1.0}],
            })
            yield item


class PictureDescriptionStubModel(BaseEnrichmentModel):
    """STUB tier of the picture-description models
    (``picture_description_base_model.py:1-91``): deterministic
    pseudo-description from the picture's caption/provenance — holds the
    annotation shape a VLM or HTTP-API describer fills."""

    def is_processable(self, doc: DocTree, element: Item) -> bool:
        return getattr(element, "label", "") == "picture"

    def describe(self, element: Item) -> str:
        cap = getattr(element, "caption", None)
        if cap is not None and getattr(cap, "text", ""):
            return f"Picture of: {cap.text}"
        return "Picture (no caption available)"

    def __call__(self, doc, element_batch):
        for item in element_batch:
            item.annotations.append({"kind": "description",
                                     "text": self.describe(item),
                                     "provenance": "stub"})
            yield item


class PictureDescriptionApiModel(PictureDescriptionStubModel):
    """HTTP-API describer contract
    (``picture_description_api_model.py:1-64``): per-batch requests fan
    out over a ThreadPoolExecutor of ``concurrency`` workers (the
    upstream pattern for I/O-bound enrichment INSIDE one Ray actor —
    process-level parallelism stays with Ray).  No network in this
    runtime: the request hook raises unless an endpoint is reachable."""

    def __init__(self, endpoint: str = "", concurrency: int = 2,
                 timeout: float = 20.0):
        self.endpoint = endpoint
        self.concurrency = concurrency
        self.timeout = timeout

    def _request(self, item: Item) -> str:
        import json
        import urllib.request

        req = urllib.request.Request(
            self.endpoint,
            data=json.dumps({"caption": getattr(
                getattr(item, "caption", None), "text", "")}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode())["text"]

    def __call__(self, doc, element_batch):
        from concurrent.futures import ThreadPoolExecutor

        items = list(element_batch)
        with ThreadPoolExecutor(self.concurrency) as pool:
            texts = list(pool.map(self._request, items))
        for item, text in zip(items, texts):
            item.annotations.append({"kind": "description", "text": text,
                                     "provenance": "api"})
            yield item


DEFAULT_ENRICHMENT_MODELS = (CodeLanguageStubModel, PictureClassifierStubModel)


class EnrichmentStage:
    """Actor-pool stage: models build once per actor (``__init__``), each
    batch enriches its docs' trees in place and re-serializes doc_json,
    emitting an ``n_enriched`` counter column."""

    def __init__(self, model_classes=DEFAULT_ENRICHMENT_MODELS):
        self.models = [cls() for cls in model_classes]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from docling_ray.kernels.docjson import load_docjson
        from docling_ray.kernels.docjson_write import to_docjson

        out_json, out_counts = [], []
        for value in batch["doc_json"]:
            raw = value.as_py() or ""
            if not raw:
                out_json.append(raw)
                out_counts.append(0)
                continue
            doc = load_docjson(raw)
            enrich_document(doc, self.models)
            n = sum(len(item.annotations) for item, _ in doc.iterate())
            out_json.append(to_docjson(doc))
            out_counts.append(n)
        batch = batch.drop_columns(["doc_json"])
        batch = batch.append_column("doc_json",
                                    pa.array(out_json, pa.large_string()))
        return batch.append_column("n_enriched",
                                   pa.array(out_counts, pa.int32()))


def enrich_dataset(ds, model_classes=DEFAULT_ENRICHMENT_MODELS,
                   concurrency: int = 2):
    return ds.map_batches(
        EnrichmentStage, batch_format="pyarrow", concurrency=(1, concurrency),
        fn_constructor_kwargs={"model_classes": model_classes})
