"""Checkpoint / resume for filter + backend state.

SURVEY.md §6: filter/map/graph states are pytrees, so snapshots are plain
`np.savez` archives (flattened pytree leaves + treedef structure recorded
by path). Restart-based failure recovery: a multi-host job that loses a
host relaunches on a smaller mesh and resumes from the latest snapshot.
Works on any pytree of arrays (ParticleState, keyframe graphs, BA solver
state) without orbax's async machinery — deterministic, dependency-light,
and readable from pure numpy.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    keys = ["/".join(str(p) for p in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return keys, leaves, treedef


def save_checkpoint(path: str, tree, step: int = 0):
    """Save a pytree snapshot; `step` is stored for resume bookkeeping."""
    keys, leaves, _ = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays["__keys__"] = np.array(keys)
    arrays["__step__"] = np.array(step)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    tmp = str(path) + ".tmp.npz"
    np.savez(tmp, **arrays)
    Path(tmp).rename(path)  # atomic publish


def load_checkpoint(path: str, template):
    """Load a snapshot into the structure of `template` (same pytree shape).

    Returns (tree, step). Leaf order/paths are verified against the template
    so a config change that altered the state layout fails loudly.
    """
    data = np.load(path, allow_pickle=False)
    keys_saved = list(data["__keys__"])
    keys_tmpl, leaves_tmpl, treedef = _flatten_with_paths(template)
    if [str(k) for k in keys_saved] != keys_tmpl:
        raise ValueError(
            f"checkpoint layout mismatch: saved {keys_saved[:3]}... vs "
            f"template {keys_tmpl[:3]}..."
        )
    leaves = []
    for i, tmpl_leaf in enumerate(leaves_tmpl):
        arr = data[f"leaf_{i}"]
        if arr.shape != tuple(np.shape(tmpl_leaf)):
            raise ValueError(
                f"checkpoint leaf {keys_tmpl[i]} shape {arr.shape} != "
                f"template {np.shape(tmpl_leaf)}"
            )
        leaves.append(jax.numpy.asarray(arr))
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    return tree, int(data["__step__"])


def latest_checkpoint(ckpt_dir: str, prefix: str = "ckpt_") -> str | None:
    d = Path(ckpt_dir)
    if not d.exists():
        return None
    cands = sorted(d.glob(f"{prefix}*.npz"))
    return str(cands[-1]) if cands else None
