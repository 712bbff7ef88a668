"""Regenerate the committed table-header-classifier weight artifact
(docling_ray/state/table_weights.npz) — deterministic for the fixed
seed, so re-running reproduces the same bytes modulo npz metadata."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from docling_ray.kernels.table_model import train_table_weights  # noqa: E402

if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "..",
                       "docling_ray", "state", "table_weights.npz")
    print(train_table_weights(os.path.abspath(out)))
