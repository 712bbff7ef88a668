"""Layout postprocessing: deterministic cluster cleanup after the layout
stage — a faithful port of the reference's rule set
(``/root/reference/docling/utils/layout_postprocessor.py:155-684``):

- per-label confidence thresholds and TITLE→SECTION_HEADER remapping,
- best-overlap cell→cluster assignment (≥0.2 intersection-over-self) with
  orphan-cell clusters for unassigned text,
- iterative bbox tightening to cell extents (tables take the union),
- overlap resolution by union-find grouping with label preference rules
  (LIST_ITEM beats similar-area TEXT, CODE swallows ≥80%-contained
  clusters) and area/confidence fallbacks,
- wrapper handling (form / key-value / table / document-index): child
  capture at ≥0.8 containment, KEY_VALUE-vs-TABLE dedup, >90%-page-area
  picture drop,
- final (min cell index, top, left) ordering.

The candidate search is all-pairs per page (pages hold tens of clusters;
the reference's R-tree/interval indexes are pruning only — the grouping
outcome is identical).
"""

from __future__ import annotations

import sys
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Optional

from docling_ray.kernels.pdf_assemble import BBox, Cell, Cluster

WRAPPER_TYPES = {"form", "key_value_region", "table", "document_index"}
SPECIAL_TYPES = WRAPPER_TYPES | {"picture"}

CONFIDENCE_THRESHOLDS = {
    "caption": 0.5, "footnote": 0.5, "formula": 0.5, "list_item": 0.5,
    "page_footer": 0.5, "page_header": 0.5, "picture": 0.5,
    "section_header": 0.45, "table": 0.5, "text": 0.5, "title": 0.45,
    "code": 0.45, "checkbox_selected": 0.45, "checkbox_unselected": 0.45,
    "form": 0.45, "key_value_region": 0.45, "document_index": 0.45,
}

LABEL_REMAPPING = {"title": "section_header"}

OVERLAP_PARAMS = {
    "regular": {"area_threshold": 1.3, "conf_threshold": 0.05},
    "picture": {"area_threshold": 2.0, "conf_threshold": 0.3},
    "wrapper": {"area_threshold": 2.0, "conf_threshold": 0.2},
}


@dataclass
class LayoutOptions:
    create_orphan_clusters: bool = True
    keep_empty_clusters: bool = False
    skip_cell_assignment: bool = False


class UnionFind:
    def __init__(self, elements):
        self.parent = {e: e for e in elements}
        self.rank = dict.fromkeys(elements, 0)

    def find(self, x):
        if self.parent[x] != x:
            self.parent[x] = self.find(self.parent[x])
        return self.parent[x]

    def union(self, x, y):
        rx, ry = self.find(x), self.find(y)
        if rx == ry:
            return
        if self.rank[rx] > self.rank[ry]:
            self.parent[ry] = rx
        elif self.rank[rx] < self.rank[ry]:
            self.parent[rx] = ry
        else:
            self.parent[ry] = rx
            self.rank[rx] += 1

    def groups(self):
        out = defaultdict(list)
        for e in self.parent:
            out[self.find(e)].append(e)
        return out


def _iou(a: BBox, b: BBox) -> float:
    il, it = max(a.l, b.l), max(a.t, b.t)
    ir, ib = min(a.r, b.r), min(a.b, b.b)
    inter = max(0.0, ir - il) * max(0.0, ib - it)
    union = a.area() + b.area() - inter
    return inter / union if union else 0.0


def _overlaps(a: BBox, b: BBox, overlap_threshold=0.8,
              containment_threshold=0.8) -> bool:
    if a.area() <= 0 or b.area() <= 0:
        return False
    return (_iou(a, b) > overlap_threshold
            or a.intersection_over_self(b) > containment_threshold
            or b.intersection_over_self(a) > containment_threshold)


class LayoutPostprocessor:
    def __init__(self, cells: list[Cell], clusters: list[Cluster],
                 page_width: float, page_height: float,
                 options: Optional[LayoutOptions] = None):
        self.cells = cells
        self.page_area = page_width * page_height
        self.options = options or LayoutOptions()
        self.all_clusters = clusters
        self.regular_clusters = [c for c in clusters
                                 if c.label not in SPECIAL_TYPES]
        self.special_clusters = [c for c in clusters
                                 if c.label in SPECIAL_TYPES]
        for cluster in clusters:
            if not hasattr(cluster, "children") or cluster.children is None:
                cluster.children = []

    # -- public -----------------------------------------------------------
    def postprocess(self) -> list[Cluster]:
        self.regular_clusters = self._process_regular()
        self.special_clusters = self._process_special()

        contained_ids = {child.id for wrapper in self.special_clusters
                         for child in wrapper.children}
        self.regular_clusters = [c for c in self.regular_clusters
                                 if c.id not in contained_ids]

        final = self._sort_clusters(self.regular_clusters + self.special_clusters)
        for cluster in final:
            cluster.cells = self._sort_cells(cluster.cells)
            for child in cluster.children:
                child.cells = self._sort_cells(child.cells)
        return final

    # -- regular ----------------------------------------------------------
    def _process_regular(self) -> list[Cluster]:
        clusters = [c for c in self.regular_clusters
                    if c.confidence >= CONFIDENCE_THRESHOLDS.get(c.label, 0.5)]
        for cluster in clusters:
            if cluster.label in LABEL_REMAPPING:
                cluster.label = LABEL_REMAPPING[cluster.label]

        if not self.options.skip_cell_assignment:
            clusters = self._assign_cells(clusters)
            if not self.options.keep_empty_clusters:
                clusters = [c for c in clusters
                            if c.cells or c.label == "formula"]
            unassigned = self._unassigned_cells(clusters)
            if unassigned and self.options.create_orphan_clusters:
                next_id = max((c.id for c in self.all_clusters), default=0) + 1
                for i, cell in enumerate(unassigned):
                    orphan = Cluster(id=next_id + i, label="text",
                                     bbox=BBox(cell.bbox.l, cell.bbox.t,
                                               cell.bbox.r, cell.bbox.b),
                                     confidence=cell.confidence)
                    orphan.cells = [cell]
                    orphan.children = []
                    clusters.append(orphan)

        prev = len(clusters) + 1
        for _ in range(3):
            if prev == len(clusters):
                break
            prev = len(clusters)
            clusters = self._adjust_bboxes(clusters)
            clusters = self._remove_overlapping(clusters, "regular")
        return clusters

    # -- special ----------------------------------------------------------
    def _process_special(self) -> list[Cluster]:
        specials = [c for c in self.special_clusters
                    if c.confidence >= CONFIDENCE_THRESHOLDS.get(c.label, 0.5)]
        specials = self._drop_kv_over_tables(specials)

        if self.page_area > 0:
            specials = [c for c in specials
                        if not (c.label == "picture"
                                and c.bbox.area() / self.page_area > 0.90)]

        for special in specials:
            contained = [c for c in self.regular_clusters
                         if c.bbox.intersection_over_self(special.bbox) > 0.8]
            if contained:
                contained = self._sort_clusters(contained)
                special.children = contained
                if special.label in ("form", "key_value_region"):
                    special.bbox = BBox(
                        min(c.bbox.l for c in contained),
                        min(c.bbox.t for c in contained),
                        max(c.bbox.r for c in contained),
                        max(c.bbox.b for c in contained))
                if not self.options.skip_cell_assignment:
                    all_cells = [cell for child in contained
                                 for cell in child.cells]
                    special.cells = self._sort_cells(
                        self._dedup_cells(all_cells))

        pictures = self._remove_overlapping(
            [c for c in specials if c.label == "picture"], "picture")
        wrappers = self._remove_overlapping(
            [c for c in specials if c.label in WRAPPER_TYPES], "wrapper")
        return pictures + wrappers

    def _drop_kv_over_tables(self, specials: list[Cluster]) -> list[Cluster]:
        to_remove = set()
        for wrapper in specials:
            if wrapper.label not in WRAPPER_TYPES:
                continue
            for regular in self.regular_clusters:
                if regular.label == "table":
                    overlap = wrapper.bbox.intersection_over_self(regular.bbox)
                    conf_diff = wrapper.confidence - regular.confidence
                    if overlap > 0.9 and conf_diff < 0.1:
                        to_remove.add(wrapper.id)
                        break
        return [c for c in specials if c.id not in to_remove]

    # -- overlap resolution ------------------------------------------------
    def _prefer(self, candidate: Cluster, other: Cluster, params: dict) -> bool:
        if candidate.label == "list_item" and other.label == "text":
            area_ratio = candidate.bbox.area() / other.bbox.area()
            if abs(1 - area_ratio) < 0.2:
                return True
        if candidate.label == "code":
            if other.bbox.intersection_over_self(candidate.bbox) > 0.8:
                return True
        area_ratio = candidate.bbox.area() / other.bbox.area()
        conf_diff = other.confidence - candidate.confidence
        if (area_ratio <= params["area_threshold"]
                and conf_diff > params["conf_threshold"]):
            return False
        return True

    def _best_of_group(self, group: list[Cluster], params: dict) -> Cluster:
        best = None
        for candidate in group:
            if any(not self._prefer(candidate, other, params)
                   for other in group if other is not candidate):
                continue
            if best is None:
                best = candidate
            elif (candidate.bbox.area() > best.bbox.area()
                    and best.confidence - candidate.confidence
                    <= params["conf_threshold"]):
                best = candidate
        return best if best is not None else group[0]

    def _remove_overlapping(self, clusters: list[Cluster],
                            cluster_type: str) -> list[Cluster]:
        if not clusters:
            return []
        valid = {c.id: c for c in clusters}
        uf = UnionFind(valid.keys())
        params = OVERLAP_PARAMS[cluster_type]
        ids = list(valid)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                if _overlaps(valid[a].bbox, valid[b].bbox):
                    uf.union(a, b)
        result = []
        for group_ids in uf.groups().values():
            if len(group_ids) == 1:
                result.append(valid[group_ids[0]])
                continue
            group = [valid[cid] for cid in group_ids]
            best = self._best_of_group(group, params)
            for cluster in group:
                if cluster is not best:
                    best.cells.extend(cluster.cells)
            best.cells = self._sort_cells(self._dedup_cells(best.cells))
            result.append(best)
        return result

    # -- cells -------------------------------------------------------------
    def _assign_cells(self, clusters: list[Cluster],
                      min_overlap: float = 0.2) -> list[Cluster]:
        for cluster in clusters:
            cluster.cells = []
        for cell in self.cells:
            if not cell.text.strip() or cell.bbox.area() <= 0:
                continue
            best_overlap = min_overlap
            best_cluster = None
            for cluster in clusters:
                overlap = cell.bbox.intersection_over_self(cluster.bbox)
                if overlap > best_overlap:
                    best_overlap = overlap
                    best_cluster = cluster
            if best_cluster is not None:
                best_cluster.cells.append(cell)
        for cluster in clusters:
            cluster.cells = self._dedup_cells(cluster.cells)
        return clusters

    def _unassigned_cells(self, clusters: list[Cluster]) -> list[Cell]:
        assigned = {cell.index for c in clusters for cell in c.cells}
        return [cell for cell in self.cells
                if cell.index not in assigned and cell.text.strip()]

    def _adjust_bboxes(self, clusters: list[Cluster]) -> list[Cluster]:
        for cluster in clusters:
            if not cluster.cells:
                continue
            cells_bbox = BBox(
                min(c.bbox.l for c in cluster.cells),
                min(c.bbox.t for c in cluster.cells),
                max(c.bbox.r for c in cluster.cells),
                max(c.bbox.b for c in cluster.cells))
            if cluster.label == "table":
                cluster.bbox = BBox(
                    min(cluster.bbox.l, cells_bbox.l),
                    min(cluster.bbox.t, cells_bbox.t),
                    max(cluster.bbox.r, cells_bbox.r),
                    max(cluster.bbox.b, cells_bbox.b))
            else:
                cluster.bbox = cells_bbox
        return clusters

    @staticmethod
    def _dedup_cells(cells: list[Cell]) -> list[Cell]:
        seen = set()
        out = []
        for cell in cells:
            if cell.index not in seen:
                seen.add(cell.index)
                out.append(cell)
        return out

    @staticmethod
    def _sort_cells(cells: list[Cell]) -> list[Cell]:
        return sorted(cells, key=lambda c: c.index)

    @staticmethod
    def _sort_clusters(clusters: list[Cluster]) -> list[Cluster]:
        return sorted(clusters, key=lambda c: (
            min((cell.index for cell in c.cells), default=sys.maxsize),
            c.bbox.t, c.bbox.l))


def postprocess_layout(cells: list[Cell], clusters: list[Cluster],
                       page_width: float, page_height: float,
                       options: Optional[LayoutOptions] = None) -> list[Cluster]:
    return LayoutPostprocessor(cells, clusters, page_width, page_height,
                               options).postprocess()
