"""A real-weights layout classifier for the layout actor slot.

The reference's LayoutModel is an RT-DETR detector
(``/root/reference/docling/models/layout_model.py``); its weights cannot
ship in this runtime.  What CAN be proven here — and what this module
exists for — is the full learned-model actor contract with REAL weight
tensors: a logistic-regression cell classifier is TRAINED (deterministic
full-batch gradient descent, numpy only) on synthetic labeled layout
geometry, serialized to an ``.npz`` artifact, and loaded from disk ONCE
per actor by ``stages/pdf.py::LayoutLearnedStage`` — load in
``__init__``, vectorized batch predict in ``__call__``, the existing
`postprocess_layout` rules after.  The day RT-DETR weights appear they
replace the ``.npz`` and the predict call; every other line of the actor
path is already exercised.

Feature vector per cell (all scale-normalized):
``[height, width/page_w, l/page_w, t/page_h, n_chars/60]``.
The synthetic training set labels tall, short-text, near-top cells as
headings — enough signal for the classifier to be meaningfully non-trivial
(held-out accuracy asserted in tests), while staying fully deterministic.
"""

from __future__ import annotations

import numpy as np

N_FEATURES = 5


def cell_features(cells, page_w: float, page_h: float) -> np.ndarray:
    """Vectorized features for a list of `pdf_assemble.Cell`s."""
    n = len(cells)
    out = np.empty((n, N_FEATURES), np.float64)
    for i, c in enumerate(cells):
        out[i, 0] = c.bbox.b - c.bbox.t
        out[i, 1] = (c.bbox.r - c.bbox.l) / max(page_w, 1.0)
        out[i, 2] = c.bbox.l / max(page_w, 1.0)
        out[i, 3] = c.bbox.t / max(page_h, 1.0)
        out[i, 4] = len(c.text or "") / 60.0
    return out


def synthesize_training_set(seed: int = 42, n: int = 4000
                            ) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic labeled geometry: headings are taller (16-22pt),
    carry shorter text and sit higher on the page; body lines are
     10-13pt with longer text anywhere.  Distributions overlap so the
    boundary is learned, not memorized."""
    rng = np.random.default_rng(seed)
    n_head = n // 3
    n_body = n - n_head
    X = np.empty((n, N_FEATURES), np.float64)
    y = np.empty(n, np.int64)
    # headings
    X[:n_head, 0] = rng.uniform(15.0, 23.0, n_head)          # height
    X[:n_head, 1] = rng.uniform(0.2, 0.6, n_head)            # rel width
    X[:n_head, 2] = rng.uniform(0.05, 0.2, n_head)           # l
    X[:n_head, 3] = rng.uniform(0.02, 0.45, n_head)          # t
    X[:n_head, 4] = rng.uniform(8, 35, n_head) / 60.0        # chars
    y[:n_head] = 1
    # body
    X[n_head:, 0] = rng.uniform(9.0, 14.5, n_body)
    X[n_head:, 1] = rng.uniform(0.3, 0.9, n_body)
    X[n_head:, 2] = rng.uniform(0.05, 0.55, n_body)
    X[n_head:, 3] = rng.uniform(0.05, 0.95, n_body)
    X[n_head:, 4] = rng.uniform(18, 60, n_body) / 60.0
    y[n_head:] = 0
    perm = rng.permutation(n)
    return X[perm], y[perm]


def train_layout_weights(path: str, seed: int = 42, epochs: int = 400,
                         lr: float = 0.5) -> str:
    """Train the classifier (full-batch logistic GD — deterministic for a
    fixed seed) and serialize ``{W, b, mu, sd}`` to ``path``."""
    X, y = synthesize_training_set(seed)
    mu = X.mean(axis=0)
    sd = X.std(axis=0) + 1e-9
    Z = (X - mu) / sd
    w = np.zeros(N_FEATURES, np.float64)
    b = 0.0
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        g = p - y
        w -= lr * (Z.T @ g) / len(y)
        b -= lr * g.mean()
    np.savez(path, W=w, b=np.float64(b), mu=mu, sd=sd)
    return path


class NumpyLayoutModel:
    """Loads the ``.npz`` weight artifact once; `predict_heading` is a
    single vectorized matmul + sigmoid over a feature batch."""

    def __init__(self, path: str):
        blob = np.load(path)
        self.W = blob["W"]
        self.b = float(blob["b"])
        self.mu = blob["mu"]
        self.sd = blob["sd"]
        self.n_params = self.W.size + 1

    def heading_prob(self, feats: np.ndarray) -> np.ndarray:
        if not len(feats):
            return np.empty(0, np.float64)
        z = (feats - self.mu) / self.sd
        return 1.0 / (1.0 + np.exp(-(z @ self.W + self.b)))

    def predict_heading(self, feats: np.ndarray) -> np.ndarray:
        return self.heading_prob(feats) >= 0.5
