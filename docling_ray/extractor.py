"""DocumentExtractor surface — template-driven structured extraction.

Mirror of the reference's extractor machinery, rebuilt Ray-Data-first:

- options/templates/status surface:
  ``/root/reference/docling/document_extractor.py:88-326``
  (per-format ``ExtractionFormatOption`` with pipeline-class defaults,
  pipeline cache keyed by (class, md5-of-options), ``extract`` /
  ``extract_all`` raise semantics, SKIPPED for disallowed formats);
- pipeline contract:
  ``/root/reference/docling/pipeline/base_extraction_pipeline.py``
  (``execute`` wraps ``_extract_data`` + ``_determine_status`` in the
  try/except → FAILURE + ErrorItem envelope);
- template serialization + per-page result shape:
  ``/root/reference/docling/pipeline/extraction_vlm_pipeline.py``
  (str pass-through, dict → ``json.dumps(indent=2)``, model instance /
  class → example-instance JSON; ``ExtractedPageData(page_no,
  extracted_data, raw_text, errors)``; SUCCESS iff pages exist and none
  carries an error).

The distributed form is `extract_dataset_templated`: an ACTOR-POOL
``map_batches`` over page rows — the model loads once per actor in
``__init__`` (the stateful-stage rule), each batch is template-filled
vectorized, output is one Arrow row per page with the doc-level status
attached.  The local ``extract``/``extract_all`` iterator surface exists
for API parity and small jobs; a 100 TB corpus goes through the Dataset
form.

No VLM weights ship in this runtime, so the default model is
`NuExtractStubModel` — a clearly marked DETERMINISTIC tier that
exercises NuExtract's template-fill contract (template JSON in, JSON
with the same shape out, values derived from the page text).  A learned
model drops into the same ``vlm_factory`` slot (state/factories.py).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import re
from typing import Any, Iterable, Iterator, Optional, Union

import pyarrow as pa

# -- status + result datamodel (datamodel/extraction.py analog) -------------

PENDING = "pending"
SUCCESS = "success"
PARTIAL_SUCCESS = "partial_success"
FAILURE = "failure"
SKIPPED = "skipped"


class ExtractionError(RuntimeError):
    """`ConversionError` analog for the extraction surface."""


@dataclasses.dataclass
class ExtractedPageData:
    """``datamodel/extraction.py:12-23`` — one page's extraction."""

    page_no: int                                 # 1-indexed
    extracted_data: Optional[dict] = None
    raw_text: Optional[str] = None
    errors: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class ExtractionResult:
    """``datamodel/extraction.py:26-37`` — per-document envelope."""

    input_name: str
    status: str = PENDING
    errors: list = dataclasses.field(default_factory=list)
    pages: list = dataclasses.field(default_factory=list)


# -- template serialization ---------------------------------------------------

ExtractionTemplateType = Union[str, dict, Any]


def _example_value(tp) -> Any:
    """Deterministic example for a dataclass field type (the
    polyfactory ``__use_defaults__`` analog, without randomness)."""
    if tp in (int, "int"):
        return 0
    if tp in (float, "float"):
        return 0.0
    if tp in (bool, "bool"):
        return False
    if tp in (str, "str"):
        return ""
    return None


def serialize_template(template: ExtractionTemplateType) -> str:
    """``extraction_vlm_pipeline.py:183-200`` semantics: str passes
    through; dict → ``json.dumps(indent=2)``; a DATACLASS INSTANCE →
    its field dict as JSON; a dataclass CLASS → an example instance
    built from field defaults (deterministic placeholder where no
    default exists — the polyfactory-with-defaults analog)."""
    if isinstance(template, str):
        return template
    if isinstance(template, dict):
        return json.dumps(template, indent=2)
    if dataclasses.is_dataclass(template) and not isinstance(template, type):
        return json.dumps(dataclasses.asdict(template), indent=2)
    if isinstance(template, type) and dataclasses.is_dataclass(template):
        example = {}
        for f in dataclasses.fields(template):
            if f.default is not dataclasses.MISSING:
                example[f.name] = f.default
            elif f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
                example[f.name] = f.default_factory()  # type: ignore[misc]
            else:
                example[f.name] = _example_value(f.type)
        return json.dumps(example, indent=2)
    raise ValueError(f"Unsupported template type: {type(template)}")


# -- the stub VLM tier --------------------------------------------------------


class NuExtractStubModel:
    """DETERMINISTIC STUB of the NuExtract template-fill contract
    (``models/vlm_models_inline/nuextract_transformers_model.py`` as
    used by ``extraction_vlm_pipeline.py:90-108``): given page content
    and a template prompt, return JSON with the template's SHAPE and
    values derived from the page text — string fields get the page's
    first ``n``-char snippet salted by the field name (md5-stable),
    numeric fields get token counts.  No weights; a learned model
    replaces this class in the same slot with the same signature."""

    # RE2's \s set exactly ([\t\n\f\r ]), so the SQL oracle's
    # regexp_split_to_array(t, '\s+') tokenizes identically
    _WS = re.compile(r"[\t\n\f\r ]+")

    def __init__(self, snippet_chars: int = 32):
        self.snippet_chars = snippet_chars

    def _fill(self, schema: Any, text: str) -> Any:
        if isinstance(schema, dict):
            return {k: self._fill(v, text) for k, v in schema.items()}
        if isinstance(schema, list):
            return [self._fill(v, text) for v in schema[:1]]
        toks = [t for t in self._WS.split(text) if t]
        if isinstance(schema, bool):
            return len(toks) % 2 == 0
        if isinstance(schema, (int, float)):
            return len(toks)
        # string (or null) leaf: deterministic snippet keyed by the
        # requested field content so distinct fields differ
        salt = hashlib.md5(str(schema).encode("utf-8")).hexdigest()[:4]
        snippet = " ".join(toks)[:self.snippet_chars]
        return f"{snippet}|{salt}" if snippet else ""

    def process_pages(self, texts: list, prompt: str) -> list:
        """One raw_text per page: the filled template as compact JSON
        (sorted keys, so byte-stable) — or the prompt echoed when it is
        not JSON (the free-form-prompt contract)."""
        try:
            schema = json.loads(prompt)
        except (json.JSONDecodeError, ValueError):
            schema = None
        out = []
        for t in texts:
            t = t or ""
            if schema is None:
                out.append(json.dumps({"text": self._fill("text", t)},
                                      sort_keys=True))
            else:
                out.append(json.dumps(self._fill(schema, t),
                                      sort_keys=True))
        return out


DEFAULT_EXTRACTION_PROMPT = ("Extract all text and structured information "
                             "from this document. Return as JSON.")


# -- pipeline contract (base_extraction_pipeline.py) --------------------------


class BaseExtractionPipeline:
    """``pipeline/base_extraction_pipeline.py:13-57``: subclasses fill
    ``_extract_data`` / ``_determine_status``; ``execute`` wraps them in
    the FAILURE + error-item envelope."""

    def __init__(self, pipeline_options: dict):
        self.pipeline_options = dict(pipeline_options or {})

    def execute(self, name: str, pages: list,
                raises_on_error: bool,
                template: Optional[ExtractionTemplateType] = None
                ) -> ExtractionResult:
        res = ExtractionResult(input_name=name)
        try:
            res = self._extract_data(res, pages, template)
            res.status = self._determine_status(res)
        except Exception as e:  # noqa: BLE001 — envelope contract
            res.status = FAILURE
            res.errors.append({"component_type": "extraction_pipeline",
                               "module_name": type(self).__name__,
                               "error_message": str(e)})
            if raises_on_error:
                raise
        return res

    def _extract_data(self, res: ExtractionResult, pages: list,
                      template) -> ExtractionResult:
        raise NotImplementedError

    def _determine_status(self, res: ExtractionResult) -> str:
        raise NotImplementedError

    @classmethod
    def get_default_options(cls) -> dict:
        return {}


class ExtractionVlmPipeline(BaseExtractionPipeline):
    """``pipeline/extraction_vlm_pipeline.py`` shape: per page, run the
    (stub) VLM with the serialized template, parse the answer as JSON
    when possible, ``raw_text`` always populated; SUCCESS iff pages
    exist and none carries an error."""

    def __init__(self, pipeline_options: Optional[dict] = None):
        super().__init__(pipeline_options or self.get_default_options())
        self.model = NuExtractStubModel(
            snippet_chars=int(self.pipeline_options.get(
                "snippet_chars", 32)))

    @classmethod
    def get_default_options(cls) -> dict:
        return {"snippet_chars": 32}

    def _extract_data(self, res, pages, template):
        if not pages:
            res.errors.append({"component_type": "extraction_pipeline",
                               "module_name": type(self).__name__,
                               "error_message":
                                   "No images found in document"})
            return res
        prompt = (serialize_template(template) if template is not None
                  else DEFAULT_EXTRACTION_PROMPT)
        answers = self.model.process_pages(
            [p.get("text", "") for p in pages], prompt)
        for p, raw in zip(pages, answers):
            data = None
            try:
                data = json.loads(raw)
            except (json.JSONDecodeError, ValueError):
                pass
            res.pages.append(ExtractedPageData(
                page_no=int(p.get("page_no", 0)) + 1,
                extracted_data=data, raw_text=raw))
        return res

    def _determine_status(self, res):
        if res.pages and not any(p.errors for p in res.pages):
            return SUCCESS
        return FAILURE


# -- the extractor surface (document_extractor.py) ----------------------------


@dataclasses.dataclass
class ExtractionFormatOption:
    """``document_extractor.py:46-63``: per-format pipeline class +
    options; options default from the pipeline class when omitted."""

    pipeline_cls: type = ExtractionVlmPipeline
    pipeline_options: Optional[dict] = None

    def __post_init__(self):
        if self.pipeline_options is None:
            self.pipeline_options = self.pipeline_cls.get_default_options()


_DEFAULT_EXTRACTION_FORMATS = ("pdf", "image")


class DocumentExtractor:
    """``document_extractor.py:88-326``: allowed-format gate, per-format
    options with defaults, pipeline cache keyed by
    ``(pipeline_cls, md5(options))``, extract/extract_all raise
    semantics.  Inputs here are page-row dicts (the engine's page
    tables) rather than filesystem paths — the Ray surface below feeds
    whole Datasets through the same pipeline objects."""

    def __init__(self, allowed_formats: Optional[list] = None,
                 extraction_format_options: Optional[dict] = None):
        self.allowed_formats = list(
            allowed_formats if allowed_formats is not None
            else _DEFAULT_EXTRACTION_FORMATS)
        overrides = extraction_format_options or {}
        self.extraction_format_to_options = {
            fmt: overrides.get(fmt, ExtractionFormatOption())
            for fmt in self.allowed_formats}
        self._initialized_pipelines: dict = {}

    @staticmethod
    def _options_hash(options: dict) -> str:
        return hashlib.md5(str(sorted((options or {}).items()))
                           .encode("utf-8")).hexdigest()

    def _get_pipeline(self, fmt: str) -> Optional[BaseExtractionPipeline]:
        fopt = self.extraction_format_to_options.get(fmt)
        if fopt is None:
            return None
        key = (fopt.pipeline_cls, self._options_hash(fopt.pipeline_options))
        if key not in self._initialized_pipelines:
            self._initialized_pipelines[key] = fopt.pipeline_cls(
                fopt.pipeline_options)
        return self._initialized_pipelines[key]

    def extract(self, doc: dict, template: ExtractionTemplateType,
                raises_on_error: bool = True) -> ExtractionResult:
        return next(self.extract_all([doc], template,
                                     raises_on_error=raises_on_error))

    def extract_all(self, docs: Iterable[dict],
                    template: ExtractionTemplateType,
                    raises_on_error: bool = True
                    ) -> Iterator[ExtractionResult]:
        """Each ``doc`` is ``{name, format, pages: [{page_no, text}]}``.
        Disallowed format → SKIPPED (or raise), empty input → raise,
        mirroring ``document_extractor.py:168-191, 233-259``."""
        had_result = False
        for doc in docs:
            fmt = doc.get("format", "pdf")
            if fmt not in self.allowed_formats:
                msg = f"File format not allowed: {doc.get('name', '')}"
                if raises_on_error:
                    raise ExtractionError(msg)
                had_result = True
                yield ExtractionResult(
                    input_name=doc.get("name", ""), status=SKIPPED,
                    errors=[{"component_type": "user_input",
                             "module_name": "",
                             "error_message": msg}])
                continue
            pipeline = self._get_pipeline(fmt)
            if pipeline is None:
                if raises_on_error:
                    raise ExtractionError(
                        f"No extraction pipeline could be initialized "
                        f"for {doc.get('name', '')}.")
                had_result = True
                yield ExtractionResult(input_name=doc.get("name", ""),
                                       status=FAILURE)
                continue
            res = pipeline.execute(doc.get("name", ""),
                                   doc.get("pages", []),
                                   raises_on_error=raises_on_error,
                                   template=template)
            had_result = True
            if raises_on_error and res.status not in (SUCCESS,
                                                      PARTIAL_SUCCESS):
                raise ExtractionError(
                    f"Extraction failed for: {res.input_name} "
                    f"with status: {res.status}")
            yield res
        if not had_result and raises_on_error:
            raise ExtractionError(
                "Extraction failed because the provided file has no "
                "recognizable format or it wasn't in the list of "
                "allowed formats.")


# -- Ray-Data surface ----------------------------------------------------------


class TemplateExtractionStage:
    """Actor-pool stage: ONE pipeline object per actor (model load in
    ``__init__``, the stateful-stage rule), each batch of page rows is
    template-filled and emitted as one Arrow row per page with
    ``raw_text`` / ``extracted_json`` / ``status``."""

    def __init__(self, template_json: str,
                 pipeline_options: Optional[dict] = None,
                 text_col: str = "text", page_col: str = "page_no"):
        self.pipeline = ExtractionVlmPipeline(pipeline_options)
        self.prompt = template_json
        self.text_col = text_col
        self.page_col = page_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(batch[self.text_col].combine_chunks(), "") \
            .to_pylist()
        answers = self.pipeline.model.process_pages(texts, self.prompt)
        ok = []
        for raw in answers:
            try:
                json.loads(raw)
                ok.append(SUCCESS)
            except (json.JSONDecodeError, ValueError):
                ok.append(FAILURE)
        out = batch.append_column("raw_text",
                                  pa.array(answers, pa.large_string()))
        out = out.append_column("extracted_json",
                                pa.array(answers, pa.large_string()))
        return out.append_column("status", pa.array(ok, pa.string()))


def extract_dataset_templated(ds, template: ExtractionTemplateType,
                              text_col: str = "text",
                              page_col: str = "page_no",
                              pipeline_options: Optional[dict] = None,
                              concurrency: int = 4):
    """Template extraction over a page-row Dataset — the 100 TB form of
    ``DocumentExtractor.extract_all`` (same pipeline class, same
    template serialization, actor pool instead of a thread pool)."""
    prompt = (serialize_template(template) if template is not None
              else DEFAULT_EXTRACTION_PROMPT)
    return ds.map_batches(
        TemplateExtractionStage, batch_format="pyarrow",
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"template_json": prompt,
                               "pipeline_options": pipeline_options,
                               "text_col": text_col,
                               "page_col": page_col})
