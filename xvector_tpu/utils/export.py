"""Weight export: HDF5 dump of a trained model's parameters.

Parity with the reference's ``Model.save_prameters_to_h5`` weight export
(``models.py:180-214``), which walks the TF1 graph and writes each
variable under its scope path.  Here the params pytree is walked and each
leaf is stored under ``/<path>/<to>/<leaf>`` so external tools (or a torch
reimplementation) can consume the checkpoint without JAX.
"""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = ["export_h5", "import_h5"]


def _walk(tree: Any, prefix: str = ""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, f"{prefix}/{k}")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _walk(v, f"{prefix}/{i}")
    else:
        yield prefix, np.asarray(tree)


def export_h5(path: str, params: Any, state: Any = None):
    import h5py
    with h5py.File(path, "w") as f:
        for name, arr in _walk(params, "/params"):
            f.create_dataset(name, data=arr)
        if state is not None:
            for name, arr in _walk(state, "/state"):
                f.create_dataset(name, data=arr)


def import_h5(path: str, like_params: Any, like_state: Any = None):
    """Load arrays back into pytrees shaped like the given templates."""
    import h5py

    def fill(tree, prefix, f):
        if isinstance(tree, dict):
            return {k: fill(v, f"{prefix}/{k}", f) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            out = [fill(v, f"{prefix}/{i}", f) for i, v in enumerate(tree)]
            return type(tree)(out) if isinstance(tree, tuple) else out
        return np.asarray(f[prefix])

    with h5py.File(path, "r") as f:
        params = fill(like_params, "/params", f)
        state = (fill(like_state, "/state", f)
                 if like_state is not None else None)
    return params, state
