"""Dependency-free plotly-schema figure builder.

Implements the small subset of the ``plotly.graph_objects`` /
``plotly.subplots`` API the reference's notebook modules use —
``make_subplots``, ``Figure.add_trace(row=, col=)``,
``update_layout`` / ``update_xaxes`` / ``update_yaxes``,
``add_annotation``, ``add_shape`` — producing the exact dict shape of
``plotly.graph_objects.Figure.to_dict()``: ``{"data": [...],
"layout": {...}}`` with cartesian traces bound to numbered axis pairs
and domain traces (indicator / table / pie) given paper domains.

``Figure.to_plotly()`` rebuilds a real plotly figure from the dict when
plotly is installed, so downstream notebook rendering is unchanged; in
this container (no plotly) the dict IS the deliverable and is what the
tests assert on.
"""

from __future__ import annotations

import json
from typing import Any

_DOMAIN_TYPES = {"indicator", "table", "pie", "sunburst", "funnelarea"}


class _Cell:
    """One subplot cell: paper-domain rectangle + axis ids (or domain-only)."""

    def __init__(self, row, col, x0, x1, y0, y1, kind, secondary_y):
        self.row, self.col = row, col
        self.x_dom, self.y_dom = [x0, x1], [y0, y1]
        self.kind = kind
        self.axis_n: int | None = None  # 1-based cartesian axis number
        self.secondary_axis_n: int | None = None
        self.wants_secondary = secondary_y


def _axis_names(n: int) -> tuple[str, str]:
    suffix = "" if n == 1 else str(n)
    return f"xaxis{suffix}", f"yaxis{suffix}"


def _axis_refs(n: int) -> tuple[str, str]:
    suffix = "" if n == 1 else str(n)
    return f"x{suffix}", f"y{suffix}"


class Figure:
    def __init__(self, data: list[dict] | None = None,
                 layout: dict | None = None):
        self.data: list[dict] = [dict(t) for t in (data or [])]
        self.layout: dict = dict(layout or {})
        self._grid: dict[tuple[int, int], _Cell] = {}

    # -- grid plumbing (populated by make_subplots) --------------------

    def _cell(self, row: int, col: int) -> _Cell:
        try:
            return self._grid[(row, col)]
        except KeyError:
            raise ValueError(f"no subplot at row={row}, col={col}") from None

    def _cartesian_axes(self, cell: _Cell, secondary_y: bool) -> tuple[str, str]:
        xref, yref = _axis_refs(cell.axis_n)
        if secondary_y:
            if cell.secondary_axis_n is None:
                raise ValueError(
                    f"subplot ({cell.row},{cell.col}) has no secondary y"
                )
            yref = _axis_refs(cell.secondary_axis_n)[1]
        return xref, yref

    # -- plotly-like API -----------------------------------------------

    def add_trace(self, trace: dict, row: int | None = None,
                  col: int | None = None,
                  secondary_y: bool = False) -> "Figure":
        trace = dict(trace)
        if row is not None:
            cell = self._cell(row, col)
            if trace.get("type") in _DOMAIN_TYPES:
                trace["domain"] = {"x": list(cell.x_dom), "y": list(cell.y_dom)}
            else:
                xref, yref = self._cartesian_axes(cell, secondary_y)
                trace["xaxis"], trace["yaxis"] = xref, yref
        self.data.append(trace)
        return self

    def update_layout(self, **kwargs) -> "Figure":
        self.layout.update(kwargs)
        return self

    def _update_axis(self, xy: str, row, col, kwargs) -> None:
        if row is not None:
            cells = [self._cell(row, col)]
        else:
            cells = [c for c in self._grid.values() if c.axis_n is not None]
        secondary = kwargs.pop("secondary_y", False)
        for cell in cells:
            if cell.axis_n is None:
                continue
            n = cell.secondary_axis_n if (secondary and xy == "y") else cell.axis_n
            if n is None:
                continue
            name = _axis_names(n)[0 if xy == "x" else 1]
            self.layout.setdefault(name, {}).update(kwargs)

    def update_xaxes(self, row: int | None = None, col: int | None = None,
                     **kwargs) -> "Figure":
        self._update_axis("x", row, col, dict(kwargs))
        return self

    def update_yaxes(self, row: int | None = None, col: int | None = None,
                     **kwargs) -> "Figure":
        self._update_axis("y", row, col, dict(kwargs))
        return self

    def add_annotation(self, row: int | None = None, col: int | None = None,
                       **kwargs) -> "Figure":
        ann = dict(kwargs)
        if row is not None:
            xref, yref = self._cartesian_axes(self._cell(row, col), False)
            ann.setdefault("xref", xref)
            ann.setdefault("yref", yref)
        self.layout.setdefault("annotations", []).append(ann)
        return self

    def add_shape(self, row: int | None = None, col: int | None = None,
                  **kwargs) -> "Figure":
        shape = dict(kwargs)
        if row is not None:
            xref, yref = self._cartesian_axes(self._cell(row, col), False)
            shape.setdefault("xref", xref)
            shape.setdefault("yref", yref)
        self.layout.setdefault("shapes", []).append(shape)
        return self

    # -- export --------------------------------------------------------

    def to_dict(self) -> dict[str, Any]:
        return {"data": [dict(t) for t in self.data],
                "layout": json.loads(json.dumps(self.layout, default=str))}

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), default=str, sort_keys=True)

    def to_plotly(self):
        """Rebuild a real plotly Figure when plotly is installed."""
        import plotly.graph_objects as go  # gated: absent in this container

        return go.Figure(self.to_dict())

    def show(self) -> None:
        """Text fallback for the notebook ``fig.show()`` habit."""
        title = self.layout.get("title_text") or self.layout.get("title", "")
        traces = ", ".join(t.get("type", "scatter") for t in self.data)
        print(f"Figure({title!r}: {len(self.data)} traces [{traces}])")


def make_subplots(rows: int = 1, cols: int = 1,
                  specs: list[list[dict | None]] | None = None,
                  subplot_titles: tuple[str, ...] | None = None,
                  column_widths: list[float] | None = None,
                  row_heights: list[float] | None = None,
                  horizontal_spacing: float | None = None,
                  vertical_spacing: float | None = None) -> Figure:
    """Grid layout with plotly's conventions: row 1 on top, axis pairs
    numbered row-major, colspan consumes cells to the right, domain-type
    cells get no axes, ``secondary_y`` adds an overlaying right axis."""
    h_gap = 0.2 / cols if horizontal_spacing is None else horizontal_spacing
    v_gap = 0.3 / rows if vertical_spacing is None else vertical_spacing

    def _edges(weights, n, gap):
        weights = list(weights) if weights else [1.0] * n
        total = sum(weights)
        avail = 1.0 - gap * (n - 1)
        edges, pos = [], 0.0
        for w in weights:
            span = avail * (w / total)
            edges.append((pos, pos + span))
            pos += span + gap
        return edges

    col_edges = _edges(column_widths, cols, h_gap)
    row_edges = _edges(row_heights, rows, v_gap)  # top-to-bottom

    fig = Figure()
    covered: set[tuple[int, int]] = set()
    cells: list[_Cell] = []
    for r in range(1, rows + 1):
        for c in range(1, cols + 1):
            if (r, c) in covered:
                continue
            spec = (specs[r - 1][c - 1] if specs else {}) or {}
            if specs and specs[r - 1][c - 1] is None:
                continue
            colspan = int(spec.get("colspan", 1))
            rowspan = int(spec.get("rowspan", 1))
            for rr in range(r, r + rowspan):
                for cc in range(c, c + colspan):
                    if (rr, cc) != (r, c):
                        covered.add((rr, cc))
            x0 = col_edges[c - 1][0]
            x1 = col_edges[c + colspan - 2][1]
            y_top = 1.0 - row_edges[r - 1][0]
            y_bot = 1.0 - row_edges[r + rowspan - 2][1]
            cell = _Cell(r, c, x0, x1, y_bot, y_top,
                         spec.get("type", "xy"),
                         bool(spec.get("secondary_y")))
            cells.append(cell)
            fig._grid[(r, c)] = cell

    # number cartesian axes row-major, then secondary axes
    n = 0
    for cell in cells:
        if cell.kind in _DOMAIN_TYPES:
            continue
        n += 1
        cell.axis_n = n
        xname, yname = _axis_names(n)
        xref, yref = _axis_refs(n)
        fig.layout[xname] = {"domain": list(cell.x_dom), "anchor": yref}
        fig.layout[yname] = {"domain": list(cell.y_dom), "anchor": xref}
    for cell in cells:
        if cell.wants_secondary and cell.axis_n is not None:
            n += 1
            cell.secondary_axis_n = n
            yname = _axis_names(n)[1]
            fig.layout[yname] = {
                "overlaying": _axis_refs(cell.axis_n)[1],
                "side": "right",
                "anchor": _axis_refs(cell.axis_n)[0],
            }

    if subplot_titles:
        anns = fig.layout.setdefault("annotations", [])
        for cell, title in zip(cells, subplot_titles):
            if not title:
                continue
            anns.append({
                "text": title, "showarrow": False,
                "xref": "paper", "yref": "paper",
                "x": (cell.x_dom[0] + cell.x_dom[1]) / 2.0,
                "y": cell.y_dom[1],
                "xanchor": "center", "yanchor": "bottom",
                "font": {"size": 16},
            })
    return fig
