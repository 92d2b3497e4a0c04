"""Logging + results tables.

Rebuild of utils/log.py:~20–250 (approx., SURVEY.md §2.2 / §5.5) — the
reference's three channels:
1. python ``logging`` to console + ``results/<save>/log.txt``
   (``setup_logging``),
2. ``ResultsLog``: per-epoch rows → CSV + JSON (pandas when available,
   pure-python fallback) + optional matplotlib PNG plots (the
   reference used bokeh HTML; plots are optional per SURVEY.md §5.5),
3. args dump to JSON (``export_args_namespace``).
"""

from __future__ import annotations

import csv
import json
import logging
import logging.handlers
import os
from typing import Any, Dict, List, Optional


def setup_logging(log_file: Optional[str] = None, level=logging.INFO,
                  resume: bool = False):
    root = logging.getLogger()
    root.setLevel(level)
    for h in list(root.handlers):
        root.removeHandler(h)
    fmt = logging.Formatter(
        "%(asctime)s - %(levelname)s - %(message)s", "%Y-%m-%d %H:%M:%S")
    console = logging.StreamHandler()
    console.setFormatter(fmt)
    root.addHandler(console)
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file, mode="a" if resume else "w")
        fh.setFormatter(fmt)
        root.addHandler(fh)


class ResultsLog:
    """Accumulates one row per epoch; persists CSV + JSON; optional
    matplotlib plots of train-vs-val curves."""

    def __init__(self, path: str = "results", title: str = ""):
        os.makedirs(path, exist_ok=True)
        self.path = path
        self.title = title
        self.csv_path = os.path.join(path, "results.csv")
        self.json_path = os.path.join(path, "results.json")
        self.plot_path = os.path.join(path, "results.png")
        self.rows: List[Dict[str, Any]] = []
        self._plots: List[Dict[str, Any]] = []

    def add(self, **kwargs):
        self.rows.append(dict(kwargs))

    def load(self):
        if os.path.exists(self.json_path):
            with open(self.json_path) as f:
                self.rows = json.load(f)
        return self

    def save(self):
        if not self.rows:
            return
        keys: List[str] = []
        for row in self.rows:
            for k in row:
                if k not in keys:
                    keys.append(k)
        with open(self.csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=keys)
            writer.writeheader()
            writer.writerows(self.rows)
        with open(self.json_path, "w") as f:
            json.dump(self.rows, f, indent=1, default=str)
        if self._plots:
            self._render_plots()

    def plot(self, x: str, y: List[str], title: str = "", ylabel: str = ""):
        """Queue a subplot (rendered on save); mirrors ResultsLog.plot."""
        self._plots.append({"x": x, "y": y, "title": title, "ylabel": ylabel})

    def _render_plots(self):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # plots optional
            return
        n = len(self._plots)
        fig, axes = plt.subplots(1, n, figsize=(6 * n, 4), squeeze=False)
        for ax, spec in zip(axes[0], self._plots):
            xs = [r.get(spec["x"]) for r in self.rows]
            for series in spec["y"]:
                ys = [r.get(series) for r in self.rows]
                ax.plot(xs, ys, label=series)
            ax.set_title(spec["title"] or self.title)
            ax.set_xlabel(spec["x"])
            ax.set_ylabel(spec["ylabel"])
            ax.legend()
            ax.grid(True, alpha=0.3)
        fig.tight_layout()
        fig.savefig(self.plot_path, dpi=100)
        plt.close(fig)

    def show(self):  # parity stub (bokeh .show() upstream)
        pass


def export_args_namespace(args, filename: str):
    """args (argparse.Namespace) → json (utils/log.py equivalent)."""
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    with open(filename, "w") as f:
        json.dump(vars(args), f, indent=2, default=str)
