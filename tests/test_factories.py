"""Factory/plugin registry tests (base_factory.py:24-122 semantics)."""

import pytest

from docling_ray.state.factories import (
    BaseOptions,
    StageFactory,
    enrichment_factory,
    ocr_factory,
)


class AlphaOptions(BaseOptions):
    kind = "alpha"


class Alpha:
    def __init__(self, options, **kwargs):
        self.options = options
        self.extra = kwargs

    @classmethod
    def get_options_type(cls):
        return AlphaOptions


def test_register_create_and_kind_listing():
    f = StageFactory("things")
    f.register(Alpha, "docling_ray", "docling_ray.tests")
    assert f.registered_kind == ["alpha"]
    inst = f.create_instance(AlphaOptions(), depth=3)
    assert isinstance(inst, Alpha) and inst.extra == {"depth": 3}
    opts = f.create_options("alpha")
    assert isinstance(opts, AlphaOptions)


def test_duplicate_and_unknown_kind_errors():
    f = StageFactory("things")
    f.register(Alpha, "docling_ray", "m")
    with pytest.raises(ValueError, match="already registered"):
        f.register(Alpha, "docling_ray", "m")

    class BetaOptions(BaseOptions):
        kind = "beta"

    with pytest.raises(RuntimeError) as err:
        f.create_options("beta")
    assert "'alpha'" in str(err.value)  # known kinds listed in the message


def test_external_plugin_gate():
    f = StageFactory("things")
    f.process_plugin({"things": [Alpha]}, "thirdparty", "evil.module",
                     allow_external_plugins=False)
    assert f.registered_kind == []  # skipped
    f.process_plugin({"things": [Alpha]}, "thirdparty", "evil.module",
                     allow_external_plugins=True)
    assert f.registered_kind == ["alpha"]


def test_ocr_factory_kinds_and_stub_behavior():
    f = ocr_factory()
    assert sorted(f.registered_kind) == [
        "easyocr", "ocrmac", "rapidocr", "tesseract", "tesseract_cli"]
    opts = f.create_options("easyocr")
    engine = f.create_instance(opts)
    with pytest.raises(NotImplementedError):
        engine()


def test_enrichment_factory_creates_working_models():
    from docling_ray.doctree import DocTree
    from docling_ray.stages.enrich import enrich_document

    f = enrichment_factory()
    models = [f.create_instance(f.create_options(k))
              for k in f.registered_kind]
    doc = DocTree("d")
    doc.add_code("import os\nprint(os.name)")
    enrich_document(doc, models)
    items = [i for i, _ in doc.iterate()]
    assert items[0].annotations[0]["value"] == "python"
