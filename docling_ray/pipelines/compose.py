"""Custom pipeline composition surface.

The reference lets users assemble pipelines from parts: a FormatOption
binds a pipeline class + backend per format
(``/root/reference/docling/document_converter.py:61-129``) and custom
pipelines subclass ``BasePipeline`` overriding build/assemble/enrich
(``pipeline/base_pipeline.py:32-253``).  The Ray-native equivalent is a
declarative STAGE LIST: each stage is either a plain batch callable, a
callable class (actor pool), or a dataset-level transform, applied in
order to a ``ray.data.Dataset``.  UDF hooks are just more stages.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable, Optional


@dataclass
class Stage:
    """One pipeline step.

    - ``fn``: batch callable (``map_batches`` over pyarrow) by default;
      a CLASS becomes an actor-pool stage (``concurrency`` applies);
      with ``dataset_level=True`` the callable receives and returns the
      whole Dataset (for groupbys, joins, limits...).
    """

    fn: Callable
    name: str = ""
    batch_size: Optional[int] = None
    concurrency: Optional[int] = None
    dataset_level: bool = False
    kwargs: dict = field(default_factory=dict)

    def apply(self, ds):
        if self.dataset_level:
            return self.fn(ds, **self.kwargs)
        opts: dict[str, Any] = {"batch_format": "pyarrow"}
        if self.batch_size is not None:
            opts["batch_size"] = self.batch_size
        if inspect.isclass(self.fn):
            # autoscaling (1, N): a fixed min-actor pool can reserve every
            # CPU of a small cluster and deadlock an all-to-all op in the
            # same graph — same convention as every other stateful stage
            opts["concurrency"] = (1, self.concurrency or 2)
            if self.kwargs:
                opts["fn_constructor_kwargs"] = self.kwargs
            return ds.map_batches(self.fn, **opts)
        fn = self.fn
        if self.kwargs:
            kw = self.kwargs

            def fn(batch, _f=self.fn, _kw=kw):
                return _f(batch, **_kw)
        return ds.map_batches(fn, **opts)


class Pipeline:
    """Ordered stage list; ``run(ds)`` threads the dataset through.

    ``with_stage`` returns a NEW pipeline (composition is value-like, so
    a registry can hold immutable per-format pipelines and callers can
    extend them — the FormatOption override pattern)."""

    def __init__(self, stages: Optional[list[Stage]] = None,
                 name: str = "pipeline"):
        self.stages = list(stages or [])
        self.name = name

    def with_stage(self, stage: Stage, index: Optional[int] = None
                   ) -> "Pipeline":
        stages = list(self.stages)
        stages.insert(len(stages) if index is None else index, stage)
        return Pipeline(stages, name=self.name)

    def run(self, ds):
        for stage in self.stages:
            ds = stage.apply(ds)
        return ds


def extraction_pipeline(batch_size: int = 128) -> Pipeline:
    """The flagship chain as a composable pipeline value."""
    from docling_ray.stages.extract import extract_and_project

    return Pipeline([
        Stage(extract_and_project, name="extract", batch_size=batch_size),
    ], name="extraction")
