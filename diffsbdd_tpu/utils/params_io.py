"""Compact single-file parameter snapshots (.npz).

Orbax checkpoints (diffsbdd_tpu/checkpoint.py) are the production
train/resume format; this module is for small, committable weight
artifacts — e.g. the trained-sanity test fixture — where one flat file
beats a checkpoint directory.  Leaves are stored under their '/'-joined
tree paths, optionally downcast (float16 halves the artifact; the
round-trip error ~1e-3 relative is far below sampling noise for
inference-side checks).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_params_npz(path, params, dtype: Optional[np.dtype] = None) -> None:
    """Write a params pytree to one compressed .npz file.

    ``dtype``: optional downcast applied to floating-point leaves only
    (integer leaves — e.g. step counters — are stored as-is).
    """
    flat = _flatten(params)
    if dtype is not None:
        flat = {k: (v.astype(dtype) if np.issubdtype(v.dtype, np.floating)
                    else v)
                for k, v in flat.items()}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)


def load_params_npz(path, template: Any = None, dtype=np.float32) -> Any:
    """Load a .npz written by :func:`save_params_npz`.

    With ``template`` (a params pytree of matching structure, e.g. from
    ``module.init_params``), returns that structure with leaves replaced —
    shapes are validated against the template.  Without, returns a nested
    dict keyed by the stored paths.
    """
    import jax

    data = np.load(Path(path))
    flat = {k: np.asarray(data[k]) for k in data.files}
    if dtype is not None:
        flat = {k: (v.astype(dtype) if np.issubdtype(v.dtype, np.floating)
                    else v)
                for k, v in flat.items()}

    if template is None:
        nested: Dict[str, Any] = {}
        for key, val in flat.items():
            node = nested
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = val
        return nested

    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path_t, leaf in paths_and_leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path_t)
        if key not in flat:
            raise KeyError(f"missing parameter '{key}' in {path}")
        val = flat[key]
        if tuple(val.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"shape mismatch for '{key}': stored "
                             f"{val.shape} vs template {np.shape(leaf)}")
        leaves.append(val)
    extra = set(flat) - {"/".join(str(getattr(p, "key",
                                              getattr(p, "idx", p)))
                                  for p in pl)
                         for pl, _ in paths_and_leaves}
    if extra:
        raise KeyError(f"unconsumed parameters in {path}: {sorted(extra)[:5]}")
    return jax.tree_util.tree_unflatten(treedef, leaves)
