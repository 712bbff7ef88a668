"""DocumentExtractor surface (docling_ray/extractor.py) — contract tests
mirroring the reference's extractor machinery
(document_extractor.py:88-326, base_extraction_pipeline.py,
extraction_vlm_pipeline.py)."""

import dataclasses
import json

import pyarrow as pa
import pytest

from docling_ray.extractor import (FAILURE, SKIPPED, SUCCESS,
                                   DocumentExtractor, ExtractionError,
                                   ExtractionVlmPipeline,
                                   NuExtractStubModel,
                                   extract_dataset_templated,
                                   serialize_template)


# -- template serialization ----------------------------------------------------

def test_serialize_template_str_dict_dataclass():
    assert serialize_template("free prompt") == "free prompt"
    assert serialize_template({"a": 1}) == json.dumps({"a": 1}, indent=2)

    @dataclasses.dataclass
    class Invoice:
        vendor: str = "acme"
        total: float = 0.0
        n_items: int = dataclasses.field(default=3)

    inst = Invoice(vendor="x")
    assert json.loads(serialize_template(inst)) == {
        "vendor": "x", "total": 0.0, "n_items": 3}
    # a CLASS builds the example instance from defaults (the
    # polyfactory-with-defaults analog)
    assert json.loads(serialize_template(Invoice)) == {
        "vendor": "acme", "total": 0.0, "n_items": 3}
    with pytest.raises(ValueError):
        serialize_template(42)


# -- stub model: template-fill contract ----------------------------------------

def test_stub_model_fills_template_shape_deterministically():
    m = NuExtractStubModel()
    tpl = json.dumps({"title": "", "count": 0, "flag": True,
                      "nested": {"x": ""}, "items": [""]})
    [a1] = m.process_pages(["alpha beta gamma"], tpl)
    [a2] = m.process_pages(["alpha beta gamma"], tpl)
    assert a1 == a2                        # deterministic
    d = json.loads(a1)
    assert set(d) == {"title", "count", "flag", "nested", "items"}
    assert d["count"] == 3 and d["nested"]["x"].startswith("alpha")
    assert isinstance(d["items"], list) and len(d["items"]) == 1
    # non-JSON prompt → free-form contract
    [b] = m.process_pages(["words here"], "just extract")
    assert json.loads(b)["text"].startswith("words here")
    # empty page → empty string leaves
    [e] = m.process_pages([""], tpl)
    assert json.loads(e)["title"] == ""


# -- pipeline execute/status envelope ------------------------------------------

def test_pipeline_execute_status_and_error_envelope():
    p = ExtractionVlmPipeline()
    res = p.execute("doc-1", [{"page_no": 0, "text": "hello world"},
                              {"page_no": 1, "text": "more text"}],
                    raises_on_error=False, template={"title": ""})
    assert res.status == SUCCESS and len(res.pages) == 2
    assert res.pages[0].page_no == 1      # 1-indexed
    assert res.pages[0].extracted_data is not None
    assert res.pages[0].raw_text          # always populated
    # no pages → FAILURE with the upstream error message
    res2 = p.execute("doc-2", [], raises_on_error=False, template=None)
    assert res2.status == FAILURE
    assert "No images found" in res2.errors[0]["error_message"]


def test_extractor_allowed_formats_and_raise_semantics():
    ex = DocumentExtractor(allowed_formats=["pdf"])
    docs = [{"name": "a.pdf", "format": "pdf",
             "pages": [{"page_no": 0, "text": "x y"}]},
            {"name": "b.docx", "format": "docx",
             "pages": [{"page_no": 0, "text": "z"}]}]
    out = list(ex.extract_all(docs, template={"t": ""},
                              raises_on_error=False))
    assert [r.status for r in out] == [SUCCESS, SKIPPED]
    assert out[1].errors[0]["component_type"] == "user_input"
    with pytest.raises(ExtractionError):
        list(ex.extract_all(docs, template={"t": ""},
                            raises_on_error=True))
    # empty input raises (document_extractor.py:188-191)
    with pytest.raises(ExtractionError):
        list(ex.extract_all([], template={"t": ""}))
    # single-doc convenience
    r = ex.extract(docs[0], template={"t": ""})
    assert r.status == SUCCESS


def test_extractor_pipeline_cache_reuses_by_options_hash():
    ex = DocumentExtractor(allowed_formats=["pdf", "image"])
    p1 = ex._get_pipeline("pdf")
    p2 = ex._get_pipeline("image")
    assert p1 is p2                        # same class + same options
    from docling_ray.extractor import ExtractionFormatOption
    ex2 = DocumentExtractor(
        allowed_formats=["pdf", "image"],
        extraction_format_options={
            "image": ExtractionFormatOption(
                pipeline_options={"snippet_chars": 8})})
    assert ex2._get_pipeline("pdf") is not ex2._get_pipeline("image")


# -- Ray-Data surface -----------------------------------------------------------

def test_extract_dataset_templated_matches_local_pipeline(ray_session):
    import ray

    t = pa.table({
        "doc_id": pa.array(["d0", "d1", "d2"], pa.string()),
        "page_no": pa.array([0, 0, 1], pa.int64()),
        "text": pa.array(["alpha beta", None, "gamma delta epsilon"])})
    tpl = {"title": "", "n_tokens": 0}
    out = {r["doc_id"]: (r["extracted_json"], r["status"])
           for r in extract_dataset_templated(
               ray.data.from_arrow(t).repartition(2), tpl).take_all()}
    p = ExtractionVlmPipeline()
    for did, text in (("d0", "alpha beta"), ("d1", ""),
                      ("d2", "gamma delta epsilon")):
        res = p.execute(did, [{"page_no": 0, "text": text}],
                        raises_on_error=True, template=tpl)
        assert out[did] == (res.pages[0].raw_text, SUCCESS)
