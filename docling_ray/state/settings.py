"""Engine settings with the reference's env-var surface.

Analog of ``/root/reference/docling/datamodel/settings.py:40-66``
(``DOCLING_*`` env prefix): plain dataclass read once at import, every
field overridable via ``DOCLING_RAY_<NAME>``.  Only knobs that exist in
this engine are exposed; per-stage Ray parameters (batch sizes,
concurrency) remain explicit function arguments — in a distributed
engine those belong to the pipeline definition, not ambient state.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, fields


def _env(name: str, default):
    raw = os.environ.get(f"DOCLING_RAY_{name.upper()}")
    if raw is None:
        return default
    if isinstance(default, bool):
        return raw.lower() in ("1", "true", "yes", "on")
    if isinstance(default, int):
        return int(raw)
    if isinstance(default, float):
        return float(raw)
    return raw


@dataclass
class Settings:
    # perf (BatchConcurrencySettings analog)
    batch_size: int = 128          # docs per map_batches call
    elements_batch_size: int = 16  # enrichment micro-batches
    read_tasks_per_cpu: int = 3    # override_num_blocks = cpus * this
    # debug
    profile_pipeline_timings: bool = False
    # storage
    cache_dir: str = os.path.join(os.path.expanduser("~"), ".cache",
                                  "docling_ray")

    def __post_init__(self):
        for f in fields(self):
            setattr(self, f.name, _env(f.name, getattr(self, f.name)))


settings = Settings()
