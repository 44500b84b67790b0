"""Model size summary (reference src/summary.py): per-module parameter table
and totals, written to ``output/summary.md``."""

from __future__ import annotations

import os

import jax
import numpy as np

from ..utils import makedir_exist_ok


def param_table(variables: dict) -> tuple[list[tuple[str, tuple, int]], dict]:
    rows = []
    totals = {}
    for collection, tree in variables.items():
        total = 0
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in flat:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            n = int(np.prod(leaf.shape)) if leaf.shape else 1
            rows.append((f"{collection}/{name}", tuple(leaf.shape), n))
            total += n
        totals[collection] = total
    return rows, totals


def summarize_model(model, variables: dict, name: str = "model",
                    output_dir: str | None = None) -> str:
    rows, totals = param_table(variables)
    lines = [f"# {name}", "",
             "| parameter | shape | count |", "|---|---|---|"]
    for pname, shape, n in rows:
        lines.append(f"| {pname} | {shape} | {n:,} |")
    lines.append("")
    grand = 0
    for coll, n in totals.items():
        lines.append(f"- **{coll}**: {n:,} params")
        grand += n
    mb = grand * 4 / (1 << 20)
    lines.append(f"- **total**: {grand:,} params ({mb:.2f} MB fp32)")
    text = "\n".join(lines)
    if output_dir:
        makedir_exist_ok(output_dir)
        with open(os.path.join(output_dir, "summary.md"), "a") as f:
            f.write(text + "\n\n")
    return text
