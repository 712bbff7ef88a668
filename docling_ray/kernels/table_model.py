"""A real-weights table-header classifier for the TableFormer slot.

The reference's table stage runs TableFormer
(``/root/reference/docling/models/table_structure_model.py:33-89``);
its weights cannot ship in this runtime.  As with the layout slot
(``kernels/layout_model.py``), what CAN be proven is the learned-model
actor contract with REAL trained tensors: a logistic-regression ROW
classifier (header vs body) is trained on synthetic labeled table-row
geometry, serialized to ``docling_ray/state/table_weights.npz``
(regenerable via ``scripts/gen_table_weights.py``), and loaded ONCE per
actor by ``stages/pdf.py::PageAssembleLearnedStage`` — replacing the
geometric tier's "row 0 is the header" rule with a per-row prediction.
A TableFormer drop-in replaces the ``.npz`` and the predict call; the
routing, OTSL emission and grid contract are already exercised.

Feature vector per table row:
``[row_index_norm, numeric_fraction, mean_chars/30, height_ratio,
filled_fraction]`` — header rows sit early, carry few numbers and
shorter text, and are often a little taller; body rows are
numeric-heavy.  Distributions overlap so the boundary is learned.
"""

from __future__ import annotations

import re

import numpy as np

N_FEATURES = 5
_NUMERIC = re.compile(r"^[\s$€%+-]*\d[\d.,\s%]*$")


def row_features(row_texts: list[str], row_idx: int, n_rows: int,
                 row_height: float, median_height: float,
                 n_cols: int) -> np.ndarray:
    texts = [t for t in row_texts if t.strip()]
    n = max(len(texts), 1)
    numeric = sum(bool(_NUMERIC.match(t.strip())) for t in texts)
    return np.array([
        row_idx / max(n_rows - 1, 1),
        numeric / n,
        (sum(len(t) for t in texts) / n) / 30.0,
        row_height / max(median_height, 1e-9),
        len(texts) / max(n_cols, 1),
    ], np.float64)


def synthesize_training_set(seed: int = 7, n: int = 4000
                            ) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic labeled rows: headers early / text-y / non-numeric /
    slightly taller; bodies numeric-heavy anywhere.  Overlapping."""
    rng = np.random.default_rng(seed)
    n_head = n // 3
    n_body = n - n_head
    X = np.empty((n, N_FEATURES), np.float64)
    y = np.empty(n, np.int64)
    X[:n_head, 0] = rng.uniform(0.0, 0.25, n_head)       # early rows
    X[:n_head, 1] = rng.uniform(0.0, 0.25, n_head)       # few numbers
    X[:n_head, 2] = rng.uniform(3, 16, n_head) / 30.0    # short labels
    X[:n_head, 3] = rng.uniform(1.0, 1.5, n_head)        # a bit taller
    X[:n_head, 4] = rng.uniform(0.7, 1.0, n_head)        # mostly filled
    y[:n_head] = 1
    X[n_head:, 0] = rng.uniform(0.05, 1.0, n_body)
    X[n_head:, 1] = rng.uniform(0.35, 1.0, n_body)
    X[n_head:, 2] = rng.uniform(2, 30, n_body) / 30.0
    X[n_head:, 3] = rng.uniform(0.75, 1.15, n_body)
    X[n_head:, 4] = rng.uniform(0.4, 1.0, n_body)
    y[n_head:] = 0
    perm = rng.permutation(n)
    return X[perm], y[perm]


def train_table_weights(path: str, seed: int = 7, epochs: int = 400,
                        lr: float = 0.5) -> str:
    """Full-batch logistic GD (deterministic for a fixed seed) →
    ``{W, b, mu, sd}`` at ``path`` (the layout-model recipe)."""
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


class NumpyTableModel:
    """Loads the ``.npz`` artifact once; header prediction is one
    vectorized matmul + sigmoid over the table's row-feature batch."""

    def __init__(self, path: str):
        blob = np.load(path)
        self.W = blob["W"]
        self.b = float(blob["b"])
        self.mu = blob["mu"]
        self.sd = blob["sd"]
        self.n_params = self.W.size + 1

    def header_prob(self, feats: np.ndarray) -> np.ndarray:
        if not len(feats):
            return np.empty(0, np.float64)
        z = (feats - self.mu) / self.sd
        return 1.0 / (1.0 + np.exp(-(z @ self.W + self.b)))

    def predict_header(self, feats: np.ndarray) -> np.ndarray:
        return self.header_prob(feats) >= 0.5
