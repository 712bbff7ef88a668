"""Options-kind factory + plugin registry.

Behavioral port of the reference's pluggable model factories
(``/root/reference/docling/models/factories/base_factory.py:24-122``,
plugin defaults ``models/plugins/defaults.py``): stage classes register
against an options type keyed by its ``kind`` string; pipelines resolve
the concrete class from the options instance alone
(``create_instance``), and external plugins are discovered from package
entry points, gated by ``allow_external_plugins`` exactly like upstream
(non-first-party modules are skipped with a warning unless enabled).

pluggy isn't in this runtime; discovery uses stdlib
``importlib.metadata.entry_points`` — same contract: the entry point
resolves to a callable returning ``{group_attr: [classes]}``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional, Type

logger = logging.getLogger(__name__)


class BaseOptions:
    """Subclasses set ``kind``."""

    kind: str = ""


@dataclass
class FactoryMeta:
    kind: str
    plugin_name: str
    module: str


class StageFactory:
    default_plugin_name = "docling_ray"

    def __init__(self, plugin_attr_name: str,
                 plugin_name: str = default_plugin_name):
        self.plugin_name = plugin_name
        self.plugin_attr_name = plugin_attr_name
        self._classes: dict[Type[BaseOptions], type] = {}
        self._meta: dict[Type[BaseOptions], FactoryMeta] = {}

    @property
    def registered_kind(self) -> list[str]:
        return [opt.kind for opt in self._classes.keys()]

    @property
    def classes(self):
        return self._classes

    @property
    def registered_meta(self):
        return self._meta

    def create_instance(self, options: BaseOptions, **kwargs):
        try:
            _cls = self._classes[type(options)]
            return _cls(options=options, **kwargs)
        except KeyError:
            raise RuntimeError(self._err_msg_on_class_not_found(options.kind))

    def create_options(self, kind: str, *args, **kwargs) -> BaseOptions:
        for opt_cls in self._classes:
            if opt_cls.kind == kind:
                return opt_cls(*args, **kwargs)
        raise RuntimeError(self._err_msg_on_class_not_found(kind))

    def _err_msg_on_class_not_found(self, kind: str) -> str:
        known = "\n".join(f"\t{opt.kind!r} => {cls!r}"
                          for opt, cls in self._classes.items())
        return (f"No class found with the name {kind!r}, "
                f"known classes are:\n{known}")

    def register(self, cls: type, plugin_name: str,
                 plugin_module_name: str) -> None:
        opt_type = cls.get_options_type()
        if opt_type in self._classes:
            raise ValueError(f"{opt_type.kind!r} already registered to "
                             f"class {self._classes[opt_type]!r}")
        self._classes[opt_type] = cls
        self._meta[opt_type] = FactoryMeta(
            kind=opt_type.kind, plugin_name=plugin_name,
            module=plugin_module_name)

    def process_plugin(self, config: dict, plugin_name: str,
                       plugin_module_name: str,
                       allow_external_plugins: bool = False) -> None:
        """Register one plugin's classes; non-first-party modules are
        skipped unless external plugins are allowed (upstream gate,
        ``base_factory.py:100-107``)."""
        if not allow_external_plugins \
                and not plugin_module_name.startswith("docling_ray."):
            logger.warning(
                "The plugin %r will not be loaded because the engine is "
                "being executed with allow_external_plugins=false.",
                plugin_name)
            return
        for item in config.get(self.plugin_attr_name, []):
            try:
                self.register(item, plugin_name, plugin_module_name)
            except ValueError:
                logger.warning("%r already registered", item)

    def load_from_plugins(self, plugin_name: Optional[str] = None,
                          allow_external_plugins: bool = False) -> None:
        from importlib import metadata

        group = plugin_name or self.plugin_name
        try:
            eps = metadata.entry_points(group=group)
        except TypeError:  # pragma: no cover - older importlib API
            eps = metadata.entry_points().get(group, [])
        for ep in eps:
            attr = ep.load()
            if callable(attr):
                config = attr()
                self.process_plugin(config, ep.name, ep.module,
                                    allow_external_plugins)


# -- shipped factories ------------------------------------------------------

class OcrEngineOptions(BaseOptions):
    pass


def _ocr_stub(kind_name: str):
    opts = type(f"{kind_name.title()}OcrOptions", (OcrEngineOptions,),
                {"kind": kind_name})

    class Engine:
        """STUB OCR engine slot: holds the factory/actor contract; the
        native engine is absent in this runtime so invocation raises."""

        options_type = opts

        def __init__(self, options, **kwargs):
            self.options = options

        @classmethod
        def get_options_type(cls):
            return cls.options_type

        def __call__(self, *a, **k):
            raise NotImplementedError(
                f"OCR engine {kind_name!r} requires its native runtime "
                "(absent here); the coverage/trigger logic is in "
                "kernels/ocr_coverage.py")

    Engine.__name__ = f"{kind_name.title()}OcrStubEngine"
    return Engine


def ocr_factory() -> StageFactory:
    """Mirror of ``get_ocr_factory`` + ``plugins/defaults.py:ocr_engines``:
    the five upstream engine kinds, as stub slots."""
    factory = StageFactory("ocr_engines")
    for kind in ("easyocr", "tesseract", "tesseract_cli", "rapidocr",
                 "ocrmac"):
        factory.register(_ocr_stub(kind), "docling_ray",
                         "docling_ray.state.factories")
    return factory


def vlm_factory() -> StageFactory:
    """VLM page-model slots (``models/vlm_models_inline/*`` +
    ``api_vlm_model.py`` kinds).  No VLM weights or network in this
    runtime: each slot holds the actor contract and raises on use."""
    factory = StageFactory("vlm_models")
    for kind in ("transformers", "mlx", "api"):
        factory.register(_ocr_stub(f"vlm_{kind}"), "docling_ray",
                         "docling_ray.state.factories")
    return factory


def asr_factory() -> StageFactory:
    """ASR slot (``pipeline/asr_pipeline.py``'s whisper kinds)."""
    factory = StageFactory("asr_models")
    factory.register(_ocr_stub("whisper"), "docling_ray",
                     "docling_ray.state.factories")
    return factory


class EnrichmentOptions(BaseOptions):
    pass


class CodeLanguageOptions(EnrichmentOptions):
    kind = "code_language"


class PictureClassOptions(EnrichmentOptions):
    kind = "picture_class"


def enrichment_factory() -> StageFactory:
    from docling_ray.stages.enrich import (
        CodeLanguageStubModel,
        PictureClassifierStubModel,
    )

    class _Code(CodeLanguageStubModel):
        def __init__(self, options=None, **kwargs):
            self.options = options

        @classmethod
        def get_options_type(cls):
            return CodeLanguageOptions

    class _Pic(PictureClassifierStubModel):
        def __init__(self, options=None, **kwargs):
            self.options = options

        @classmethod
        def get_options_type(cls):
            return PictureClassOptions

    factory = StageFactory("enrichment_models")
    factory.register(_Code, "docling_ray", "docling_ray.state.factories")
    factory.register(_Pic, "docling_ray", "docling_ray.state.factories")
    return factory
