"""Structured snapshot / resume.

Replaces the reference's de-facto checkpoint layer — per-frame text
appends under ourCache/ (/root/reference/XXXport_files.py, SURVEY.md §5
"Checkpoint / resume") — with versioned npz snapshots of whole pytree
states (SlamState, BA problems, ...). Any NamedTuple-of-arrays pytree
round-trips.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

SCHEMA_VERSION = 1


def save(path: str, tree: Any, meta: dict | None = None) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path, __treedef__=np.frombuffer(
            json.dumps({"version": SCHEMA_VERSION,
                        "n_leaves": len(leaves),
                        "meta": meta or {}}).encode(), dtype=np.uint8),
        **arrays)


def load(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (same pytree shape)."""
    data = np.load(path)
    header = json.loads(bytes(data["__treedef__"]).decode())
    if header["version"] != SCHEMA_VERSION:
        raise ValueError(f"checkpoint schema {header['version']} != "
                         f"{SCHEMA_VERSION}")
    leaves_like, treedef = jax.tree.flatten(like)
    n = header["n_leaves"]
    if n != len(leaves_like):
        raise ValueError(f"leaf count mismatch: {n} vs {len(leaves_like)}")
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    return jax.tree.unflatten(treedef, leaves)


def load_meta(path: str) -> dict:
    data = np.load(path)
    return json.loads(bytes(data["__treedef__"]).decode())["meta"]
