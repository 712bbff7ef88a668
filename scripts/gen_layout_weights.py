"""Regenerate the committed layout-classifier weight artifact
(docling_ray/state/layout_weights.npz) — deterministic for the fixed
seed, so re-running reproduces the same bytes modulo npz metadata."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from docling_ray.kernels.layout_model import train_layout_weights  # noqa: E402

if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "..",
                       "docling_ray", "state", "layout_weights.npz")
    print(train_layout_weights(os.path.abspath(out)))
