"""Confidence scores and quality-grade binning.

Port of the reference's ``PageConfidenceScores`` / ``ConfidenceReport``
semantics (``/root/reference/docling/datamodel/base_models.py:374-453``):
per-page {parse, layout, table, ocr} scores, nan-mean / 5%-nan-quantile
rollups and the 0.5 / 0.8 / 0.9 grade thresholds.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import numpy as np

POOR, FAIR, GOOD, EXCELLENT, UNSPECIFIED = (
    "poor", "fair", "good", "excellent", "unspecified")


def score_to_grade(score: float) -> str:
    if score is None or math.isnan(score):
        return UNSPECIFIED
    if score < 0.5:
        return POOR
    if score < 0.8:
        return FAIR
    if score < 0.9:
        return GOOD
    return EXCELLENT


@dataclass
class PageConfidence:
    parse_score: float = float("nan")
    layout_score: float = float("nan")
    table_score: float = float("nan")
    ocr_score: float = float("nan")

    def _scores(self) -> list[float]:
        return [self.ocr_score, self.table_score, self.layout_score,
                self.parse_score]

    @property
    def mean_score(self) -> float:
        scores = self._scores()
        if all(math.isnan(s) for s in scores):
            return float("nan")
        return float(np.nanmean(scores))

    @property
    def low_score(self) -> float:
        scores = self._scores()
        if all(math.isnan(s) for s in scores):
            return float("nan")
        return float(np.nanquantile(scores, q=0.05))

    @property
    def mean_grade(self) -> str:
        return score_to_grade(self.mean_score)

    @property
    def low_grade(self) -> str:
        return score_to_grade(self.low_score)


def doc_confidence(pages: list[PageConfidence]) -> dict:
    """Document rollup: nan-mean of per-page mean/low scores + grades."""
    if pages:
        means = [p.mean_score for p in pages]
        lows = [p.low_score for p in pages]
        mean = (float(np.nanmean(means))
                if not all(math.isnan(m) for m in means) else float("nan"))
        low = (float(np.nanmean(lows))
               if not all(math.isnan(v) for v in lows) else float("nan"))
    else:
        mean = low = float("nan")
    return {
        "mean_score": mean,
        "low_score": low,
        "mean_grade": score_to_grade(mean),
        "low_grade": score_to_grade(low),
    }


def confidence_columns(parse_scores: list[Optional[float]],
                       layout_scores: Optional[list] = None) -> dict:
    """Vector helper for the doc-assembly reduce: per-doc confidence dict
    from per-page score lists."""
    pages = []
    for i, parse in enumerate(parse_scores):
        layout = (layout_scores[i] if layout_scores is not None
                  and i < len(layout_scores) else float("nan"))
        pages.append(PageConfidence(
            parse_score=float("nan") if parse is None else parse,
            layout_score=float("nan") if layout is None else layout))
    return doc_confidence(pages)
