"""Per-stage timing: ProfilingItem / TimeRecorder analog + the
distributed form (per-stage wall-time COLUMNS + a groupby-stage rollup).

In-process surface ports ``/root/reference/docling/utils/profiling.py:
20-62`` (gated by the profile setting, avg/std/percentile over recorded
times).  The Ray-native form records stage timings as DATA: a stage
wrapper appends ``t_<stage>`` seconds columns per batch share, and
``stage_timing_stats`` rolls them up with a small aggregate — the
cluster-wide equivalent of ``ProfilingItem.avg/std/percentile`` without
shipping timing objects around.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from docling_ray.state.settings import settings


@dataclass
class ProfilingItem:
    scope: str = "page"
    count: int = 0
    times: list[float] = field(default_factory=list)

    def avg(self) -> float:
        return float(np.average(self.times))

    def std(self) -> float:
        return float(np.std(self.times))

    def mean(self) -> float:
        return float(np.mean(self.times))

    def percentile(self, perc: float) -> float:
        return float(np.percentile(self.times, perc))


class TimeRecorder:
    """``with TimeRecorder(timings, "layout"):`` — no-op unless
    ``settings.profile_pipeline_timings`` (upstream gate)."""

    def __init__(self, timings: dict, key: str, scope: str = "page"):
        self.enabled = settings.profile_pipeline_timings
        if self.enabled:
            self.item = timings.setdefault(key, ProfilingItem(scope=scope))

    def __enter__(self):
        if self.enabled:
            self.start = time.monotonic()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            self.item.times.append(time.monotonic() - self.start)
            self.item.count += 1


def timed_batch_stage(fn, stage: str):
    """Wrap a map_batches callable so each batch also carries its per-row
    share of the stage's wall time (column ``t_<stage>``, seconds)."""

    def wrapper(batch: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        out = fn(batch)
        dt = time.monotonic() - t0
        share = dt / max(out.num_rows, 1)
        return out.append_column(
            f"t_{stage}", pa.array([share] * out.num_rows, pa.float64()))

    wrapper.__name__ = f"{getattr(fn, '__name__', 'stage')}_timed"
    return wrapper


def stage_timing_stats(ds, stages: list[str]):
    """Mean/std/max seconds per stage across the dataset (one tiny
    aggregate; the per-stage ProfilingItem rollup at corpus scale)."""
    from ray.data.aggregate import Max, Mean, Std

    aggs = []
    for stage in stages:
        aggs.append(Mean(on=f"t_{stage}", alias_name=f"{stage}_mean"))
        aggs.append(Std(on=f"t_{stage}", alias_name=f"{stage}_std"))
        aggs.append(Max(on=f"t_{stage}", alias_name=f"{stage}_max"))
    return ds.aggregate(*aggs)
