"""Evaluation-artifact renderers (SURVEY §2.12 "Confusion matrix +
report as artifacts"): the reference saves its confusion matrix and
classification report as table images
(`code/python/classifi_confu.py:26-89` — matplotlib `ax.table` →
PNG). The engine's counterparts:

- data side: `plans/eval_plans.confusion_matrix` /
  `classification_report` (pure aggregations, oracle-checked);
- artifact side (this module): render any small result DataFrame as
  a PNG table when matplotlib is available, and ALWAYS as a
  deterministic fixed-width text table — the artifact consumable in
  any environment (this container ships no matplotlib).

Driver-side by design, like the Excel sink: artifacts are for humans,
so inputs are row-limit-guarded aggregate outputs (a confusion matrix
is |labels|² cells regardless of corpus size — collecting it is not a
scale concern; the GUARD is against misuse on raw tables).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

DEFAULT_MAX_ROWS = 1000


def _collect_small(df: DataFrame, max_rows: int) -> tuple[list[str], list[list[str]]]:
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"artifact renderer is for aggregate outputs (≤{max_rows} rows); "
            "got more — render a rollup, not a raw table"
        )
    cols = df.columns
    fmt = lambda v: "" if v is None else (f"{v:.6g}" if isinstance(v, float) else str(v))  # noqa: E731
    return cols, [[fmt(r[c]) for c in cols] for r in rows]


def render_table_text(df: DataFrame, path: str, max_rows: int = DEFAULT_MAX_ROWS) -> str:
    """Fixed-width text table — byte-deterministic for a given result,
    so artifact diffs are meaningful in CI. Returns the path."""
    cols, data = _collect_small(df, max_rows)
    widths = [
        max(len(c), *(len(row[i]) for row in data)) if data else len(c)
        for i, c in enumerate(cols)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    lines = [sep, "| " + " | ".join(c.ljust(w) for c, w in zip(cols, widths)) + " |", sep]
    for row in data:
        lines.append("| " + " | ".join(v.ljust(w) for v, w in zip(row, widths)) + " |")
    lines.append(sep)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def render_table_png(df: DataFrame, path: str, max_rows: int = DEFAULT_MAX_ROWS) -> str:
    """matplotlib `ax.table` PNG, matching classifi_confu.py:50-63.
    Raises ImportError where matplotlib is absent — callers wanting an
    always-available artifact use :func:`render_table_text` (or
    :func:`save_eval_artifacts`, which emits both when possible)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - exercised via gate test
        raise ImportError(
            "render_table_png needs matplotlib; use render_table_text instead"
        ) from e
    cols, data = _collect_small(df, max_rows)
    fig, ax = plt.subplots(figsize=(max(4, len(cols) * 1.2), max(3, len(data) * 0.3)))
    ax.axis("off")
    tbl = ax.table(cellText=data, colLabels=cols, cellLoc="center", loc="center")
    tbl.auto_set_font_size(False)
    tbl.set_fontsize(10)
    tbl.scale(1.2, 1.2)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=200, bbox_inches="tight")
    plt.close(fig)
    return path


def save_eval_artifacts(
    named_results: dict[str, DataFrame],
    out_dir: str,
    max_rows: int = DEFAULT_MAX_ROWS,
) -> dict[str, list[str]]:
    """Render each named result (e.g. ``{"confusion_matrix": df,
    "classification_report": df}``) to ``out_dir``: text always, PNG
    when matplotlib exists — the engine's version of the reference's
    confusion_matrix.png / classification_report.png pair."""
    written: dict[str, list[str]] = {}
    for name, df in named_results.items():
        paths = [render_table_text(df, os.path.join(out_dir, f"{name}.txt"), max_rows)]
        try:
            paths.append(render_table_png(df, os.path.join(out_dir, f"{name}.png"), max_rows))
        except ImportError:
            pass
        written[name] = paths
    return written
