"""Enrichment surface tests: contract, driver, stub tiers, Ray stage."""

import pyarrow as pa

from docling_ray.doctree import DocTree
from docling_ray.stages.enrich import (
    BaseEnrichmentModel,
    CodeLanguageStubModel,
    PictureClassifierStubModel,
    chunkify,
    enrich_document,
)


def _sample_doc():
    doc = DocTree("d")
    doc.add_heading(None, "Title")
    doc.add_code("def f(x):\n    return x")
    doc.add_code("SELECT a FROM t")
    doc.add_picture()
    doc.add_text(label="text", text="plain paragraph")
    return doc


def test_chunkify_batches():
    assert list(chunkify(range(5), 2)) == [[0, 1], [2, 3], [4]]
    assert list(chunkify([], 2)) == []


def test_driver_prepare_filter_and_exhaust():
    calls = []

    class Probe(BaseEnrichmentModel):
        elements_batch_size = 2

        def is_processable(self, doc, element):
            return getattr(element, "label", "") == "code"

        def __call__(self, doc, element_batch):
            batch = list(element_batch)
            calls.append(len(batch))
            for item in batch:
                item.annotations.append({"kind": "probe"})
                yield item

    doc = _sample_doc()
    enrich_document(doc, [Probe()])
    assert calls == [2]  # both code items in one batch of size 2
    annotated = [i for i, _ in doc.iterate() if i.annotations]
    assert len(annotated) == 2


def test_stub_models_annotate():
    doc = _sample_doc()
    enrich_document(doc, [CodeLanguageStubModel(), PictureClassifierStubModel()])
    langs = [a["value"] for i, _ in doc.iterate() for a in i.annotations
             if a.get("kind") == "code_language"]
    assert langs == ["python", "sql"]
    pics = [a for i, _ in doc.iterate() for a in i.annotations
            if a.get("kind") == "picture_class"]
    assert len(pics) == 1
    assert pics[0]["predicted_classes"][0]["class_name"] == "other"


def test_annotations_roundtrip_docjson():
    from docling_ray.kernels.docjson import load_docjson
    from docling_ray.kernels.docjson_write import to_docjson

    doc = _sample_doc()
    enrich_document(doc, [CodeLanguageStubModel(), PictureClassifierStubModel()])
    loaded = load_docjson(to_docjson(doc))
    langs = [a["value"] for i, _ in loaded.iterate() for a in i.annotations
             if a.get("kind") == "code_language"]
    assert langs == ["python", "sql"]
    assert any(a.get("kind") == "picture_class"
               for i, _ in loaded.iterate() for a in i.annotations)


def test_enrich_dataset_actor_stage(ray_session):
    import ray.data

    from docling_ray.kernels.docjson_write import to_docjson
    from docling_ray.stages.enrich import enrich_dataset

    docs = [to_docjson(_sample_doc()) for _ in range(3)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": ["a", "b", "c"],
        "doc_json": pa.array(docs, pa.large_string()),
    }))
    out = enrich_dataset(ds, concurrency=1).to_pandas()
    assert (out["n_enriched"] == 3).all()  # 2 code langs + 1 picture class


def test_picture_description_stub():
    from docling_ray.stages.enrich import PictureDescriptionStubModel

    doc = DocTree("d")
    doc.add_picture()
    cap = doc.add_text(label="caption", text="A chart of results")
    pic2 = doc.add_picture(caption=cap)
    enrich_document(doc, [PictureDescriptionStubModel()])
    descs = [a["text"] for i, _ in doc.iterate() for a in i.annotations
             if a.get("kind") == "description"]
    assert "Picture (no caption available)" in descs
    assert "Picture of: A chart of results" in descs


def test_picture_description_api_contract():
    """API describer: fan-out over a thread pool inside the actor; with
    no reachable endpoint the batch fails as a unit (construct-only)."""
    from docling_ray.stages.enrich import PictureDescriptionApiModel

    model = PictureDescriptionApiModel(endpoint="http://127.0.0.1:9/x",
                                       concurrency=2, timeout=0.2)
    doc = DocTree("d")
    doc.add_picture()
    import pytest as _pytest

    with _pytest.raises(Exception):
        list(model(doc, [i for i, _ in doc.iterate()]))
