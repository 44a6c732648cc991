"""Table persistence: save/load the table registry as npz checkpoints.

Fills the checkpoint/resume slot from SURVEY §5 — the reference keeps tables
only in an in-memory dict (``FutharkContext.py:42``) with nothing persisted.
Format: one ``<table>.npz`` per table (named columns, insertion order kept in
a ``#schema`` entry) under the target directory. Queries are pure, so resume
is simply reload + re-run.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def save_tables(tables: Dict[str, "Table"], directory: str) -> None:
    os.makedirs(directory, exist_ok=True)
    manifest = {}
    for name, t in tables.items():
        path = os.path.join(directory, f"{name}.npz")
        # String columns persist as (codes, "#dict.<col>" dictionary) pairs.
        extra = {f"#dict.{c}": d for c, d in t.dicts.items()}
        np.savez(path, **t.host_columns, **extra)
        manifest[name] = {
            "schema": t.get_schema(), "n_rows": t.n_rows,
            "str_cols": sorted(t.dicts.keys()),
        }
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)


def load_tables(context, directory: str) -> None:
    """Re-register every saved table on ``context`` (a Context)."""
    with open(os.path.join(directory, "manifest.json")) as f:
        manifest = json.load(f)
    for name, info in manifest.items():
        str_cols = set(info.get("str_cols", ()))
        with np.load(os.path.join(directory, f"{name}.npz")) as z:
            cols = {}
            for c in info["schema"]:
                a = z[c]
                if c in str_cols:
                    # decode codes → strings; create_table re-encodes (the
                    # values are already sorted-unique, so codes round-trip)
                    a = z[f"#dict.{c}"][a]
                cols[c] = a
        context.create_table(name, cols)
