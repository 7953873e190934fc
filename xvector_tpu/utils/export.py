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

__all__ = ["export_h5", "import_h5", "import_reference_h5",
           "export_reference_h5", "reference_named_weights"]


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


def reference_named_weights(cfg, params, state) -> dict:
    """Map this framework's (params, state) pytrees to the REFERENCE's
    TF1 variable names (``models.py:55-101`` scopes + ``tf_block.py``
    BN variables) — the inverse of :func:`import_reference_h5`'s naming.

    Returns ``{name: np.float32 array}`` with names like
    ``frame_level_info_layer-0/w:0`` exactly as the reference's h5
    export writes them, so a model trained HERE migrates back into the
    reference implementation (executed round-trip asserted in
    ``tests/test_reference_executed.py``)."""
    out = {}

    def put_layer(scope, lay, st):
        out[scope + "/w:0"] = lay["w"]
        out[scope + "/b:0"] = lay["b"]
        out[scope + "/gamma:0"] = lay["bn"]["gamma"]
        out[scope + "/beta:0"] = lay["bn"]["beta"]
        out[scope + "/mean:0"] = st["mean"]
        out[scope + "/variance:0"] = st["var"]
        if "alpha" in lay:
            out[scope + "/prelu/prelu:0"] = lay["alpha"]

    for i in range(len(cfg.channels)):
        put_layer("frame_level_info_layer-%d" % i,
                  params["frame"][i], state["frame"][i])
    for i in range(len(cfg.embed_dims)):
        put_layer("embed_layer-%d" % i,
                  params["embed"][i], state["embed"][i])
    if cfg.pooling == "attention":
        out["attention/w:0"] = params["attention"]["w"]
        out["attention/b:0"] = params["attention"]["b"]
        out["attention/v:0"] = params["attention"]["v"]
    out["output/w:0"] = params["output"]["w"]
    out["output/b:0"] = params["output"]["b"]
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


def export_reference_h5(path: str, cfg, params, state):
    """Write ``model.h5`` in the reference's naming scheme (see
    :func:`reference_named_weights`)."""
    import h5py
    with h5py.File(path, "w") as f:
        for name, arr in reference_named_weights(cfg, params, state).items():
            f.create_dataset(name, data=arr)


def import_reference_h5(path: str, cfg, num_classes: int):
    """Import a model.h5 exported by the REFERENCE trainer
    (``models.py:180-214`` ``get_models_weights``) into this framework's
    (params, state) pytrees — a trained TF1 x-vector model migrates
    without retraining.

    Reference naming (TF1 variable scopes, ``models.py:55-101``,
    ``tf_block.py:9-28``):

      frame_level_info_layer-{i}/{w,b,gamma,beta,mean,variance}:0
      embed_layer-{i}/{w,b,gamma,beta,mean,variance}:0
      output/{w,b}:0
      (PReLU variants: frame_level_info_layer-{i}/prelu/prelu:0)

    Conv kernels are (k, in, out) and affines (in, out) in both
    frameworks, so arrays transfer without transposition.  Missing BN
    population stats (the export writes them best-effort) fall back to
    the 0/1 init.  Returns (params, state) matching
    ``tdnn.init_params(cfg, num_classes)`` shapes, validated.
    """
    import h5py
    import jax
    import jax.numpy as jnp

    from ..models import tdnn

    params, state = tdnn.init_params(jax.random.PRNGKey(0), cfg,
                                     num_classes)
    with h5py.File(path, "r") as f:
        names = {}
        f.visititems(lambda n, obj: names.update(
            {n: np.asarray(obj)}) if hasattr(obj, "shape") else None)

    def get(name, default=None):
        for cand in (name, name + ":0", "/" + name, "/" + name + ":0"):
            if cand in names:
                return names[cand]
        if default is not None:
            return default
        raise KeyError(f"reference h5 missing {name!r}; has e.g. "
                       f"{sorted(names)[:5]}")

    def put(dst, key, arr):
        want = np.asarray(dst[key]).shape
        arr = np.asarray(arr, np.float32)
        if arr.shape != want:
            raise ValueError(
                f"shape mismatch for {key}: h5 {arr.shape} vs model "
                f"{want} — wrong --model preset for this h5?")
        dst[key] = jnp.asarray(arr)

    for i in range(len(cfg.channels)):
        scope = f"frame_level_info_layer-{i}"
        layer = params["frame"][i]
        put(layer, "w", get(f"{scope}/w"))
        put(layer, "b", get(f"{scope}/b"))
        put(layer["bn"], "gamma", get(f"{scope}/gamma"))
        put(layer["bn"], "beta", get(f"{scope}/beta"))
        st = state["frame"][i]
        put(st, "mean", get(f"{scope}/mean", np.asarray(st["mean"])))
        put(st, "var", get(f"{scope}/variance", np.asarray(st["var"])))
        if "alpha" in layer:
            put(layer, "alpha", get(f"{scope}/prelu/prelu"))
    for i in range(len(cfg.embed_dims)):
        scope = f"embed_layer-{i}"
        layer = params["embed"][i]
        put(layer, "w", get(f"{scope}/w"))
        put(layer, "b", get(f"{scope}/b"))
        put(layer["bn"], "gamma", get(f"{scope}/gamma"))
        put(layer["bn"], "beta", get(f"{scope}/beta"))
        st = state["embed"][i]
        put(st, "mean", get(f"{scope}/mean", np.asarray(st["mean"])))
        put(st, "var", get(f"{scope}/variance", np.asarray(st["var"])))
        if "alpha" in layer:
            put(layer, "alpha", get(f"{scope}/prelu/prelu"))
    if cfg.pooling == "attention":
        # models.py:1040-1044: attention scope {w, b, v}
        att = params["attention"]
        put(att, "w", get("attention/w"))
        put(att, "b", get("attention/b"))
        put(att, "v", get("attention/v"))
    put(params["output"], "w", get("output/w"))
    put(params["output"], "b", get("output/b"))
    return params, state
