"""The checked-in ``notebooks/example.ipynb`` is a RUNNABLE twin of the
reference walkthrough (``/root/reference/notebooks/example.ipynb``:
load → history → metadata → add-actions → file_uris, plus the analyzer
and dashboards the reference exposes through its package API). These
tests execute every code cell in order through one shared namespace —
exactly what a kernel does — so the notebook can never rot relative to
the engine."""

from __future__ import annotations

import pytest

# executes every notebook cell in order: slow battery, full-suite close-out only
pytestmark = pytest.mark.slow

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NB_PATH = os.path.join(REPO, "notebooks", "example.ipynb")


def _load_nb() -> dict:
    with open(NB_PATH) as fh:
        return json.load(fh)


def test_notebook_is_valid_nbformat4():
    nb = _load_nb()
    assert nb["nbformat"] == 4
    kinds = [c["cell_type"] for c in nb["cells"]]
    assert kinds[0] == "markdown"
    assert kinds.count("code") == 7
    for cell in nb["cells"]:
        if cell["cell_type"] == "code":
            # a kernel requires these keys to execute the cell
            assert "source" in cell and "outputs" in cell


def test_notebook_cells_execute_in_order(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("DLHS_NOTEBOOK_DIR", str(tmp_path / "nb_tables"))
    ns: dict = {}
    for i, cell in enumerate(_load_nb()["cells"]):
        if cell["cell_type"] != "code":
            continue
        code = compile("".join(cell["source"]), f"{NB_PATH}[cell {i}]", "exec")
        exec(code, ns)  # shared namespace == kernel semantics

    # cell 1: snapshot head/shape/dtypes of the simple sample table
    assert ns["shape"] == (1500, len(ns["df"].columns))
    # cell 2: history covers the WRITE that created the table
    assert {r.operation for r in ns["history_rows"]} >= {"WRITE"}
    # cell 3: metadata + DESCRIBE DETAIL agree on partitioning
    assert ns["metadata"]["partition_columns"] == ["day"]
    assert ns["detail"]["partitionColumns"] == ["day"]
    # cells 4-5: one URI per live add-action, all under the table root
    assert ns["detail"]["numFiles"] == len(ns["file_uris"]) > 0
    assert all(u.endswith(".parquet") for u in ns["file_uris"])
    # cell 6: analyzer ran and scored
    score, _status = ns["metrics"].calculate_health_score()
    assert 0.0 <= score <= 100.0
    # cell 7: every dashboard rendered to a plotly-schema dict
    assert ns["figure_names"]
    figs = ns["report"]["complex"]["figures"]
    for name in ns["figure_names"]:
        assert isinstance(figs[name], dict) and "data" in figs[name]
