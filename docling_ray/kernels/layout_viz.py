"""Layout visualizer: cluster/cell boxes rendered as SVG.

Analog of the reference's LayoutVisualizer used by the split-page HTML
export (``/root/reference/docling/cli/main.py:220-234``).  Upstream
draws onto the rasterized page image (PIL); this runtime has no raster
codecs, so the visualization is a standalone SVG string — same
information (one rectangle per cluster, colored by label, optional
labels and cell boxes), embeddable directly into the split-page view's
page pane as a data URI or inline element."""

from __future__ import annotations

from html import escape

_LABEL_COLORS = {
    "text": "#1f77b4", "section_header": "#d62728", "title": "#9467bd",
    "table": "#2ca02c", "document_index": "#2ca02c", "picture": "#ff7f0e",
    "figure": "#ff7f0e", "caption": "#8c564b", "footnote": "#e377c2",
    "page_header": "#7f7f7f", "page_footer": "#7f7f7f",
    "list_item": "#17becf", "code": "#bcbd22", "formula": "#aec7e8",
    "key_value_region": "#98df8a", "form": "#98df8a",
}


def layout_svg(width: float, height: float, clusters: list[dict],
               cells: list[dict] | None = None,
               show_label: bool = True) -> str:
    """clusters: dicts with label, l, t, r, b (top-left origin).
    cells (optional): same bbox keys, drawn as thin gray boxes under the
    cluster overlay."""
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 '
        f'{width:g} {height:g}" width="{width:g}" height="{height:g}">',
        f'<rect x="0" y="0" width="{width:g}" height="{height:g}" '
        'fill="white" stroke="#ccc"/>',
    ]
    for cell in cells or []:
        parts.append(
            f'<rect x="{cell["l"]:g}" y="{cell["t"]:g}" '
            f'width="{cell["r"] - cell["l"]:g}" '
            f'height="{cell["b"] - cell["t"]:g}" '
            'fill="none" stroke="#bbb" stroke-width="0.5"/>')
    for cl in clusters:
        color = _LABEL_COLORS.get(cl.get("label", "text"), "#1f77b4")
        parts.append(
            f'<rect x="{cl["l"]:g}" y="{cl["t"]:g}" '
            f'width="{cl["r"] - cl["l"]:g}" height="{cl["b"] - cl["t"]:g}" '
            f'fill="{color}" fill-opacity="0.12" stroke="{color}" '
            'stroke-width="1.5"/>')
        if show_label:
            parts.append(
                f'<text x="{cl["l"] + 2:g}" y="{max(cl["t"] - 2, 8):g}" '
                f'font-size="9" fill="{color}">'
                f'{escape(cl.get("label", ""))}</text>')
    parts.append("</svg>")
    return "\n".join(parts)


def page_layout_data_uri(width: float, height: float, clusters: list[dict],
                         cells: list[dict] | None = None,
                         show_label: bool = True) -> str:
    """SVG as a data: URI for ``to_html_split_page(page_images=...)``."""
    import base64

    svg = layout_svg(width, height, clusters, cells, show_label)
    return ("data:image/svg+xml;base64,"
            + base64.b64encode(svg.encode("utf-8")).decode("ascii"))
