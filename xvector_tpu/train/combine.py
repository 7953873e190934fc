"""Final model combination — the capability the reference plans but never
runs, implemented to actually work.

The reference computes the set of end-of-training iterations whose models
would enter a final weighted combination (``ze_utils.py:76-108``
``get_model_combine_iters``), keeps those checkpoints out of GC, and then
**raises** if combination is requested (``train_dnn.py:571-581``); its
averaging helper is a commented-out stub (``ze_utils.py:164-183``) around
Kaldi's ``nnet3-combine-fast`` (which optimizes combination weights on a
subset of training data).  Here:

* :func:`combine_iterations` reproduces the reference's candidate-set
  formula (with integer semantics — the reference's float ``range()``
  arguments would TypeError on python 3, another reason it never ran);
* :func:`optimize_combination` performs the actual combination the
  TPU-native way: stack the candidate checkpoints' parameter pytrees along
  a leading model axis, parameterize a convex combination through a
  softmax over ``N`` logits, and optimize those logits on held-out
  minibatches with Adam — the whole objective (combined params → forward →
  CE) is one jitted graph, so the "combine" runs on device at training
  speed.  BN population statistics combine with the same weights (they are
  per-channel means/variances, affine in the model average).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import tdnn
from ..models.heads import accuracy, softmax_ce

__all__ = ["combine_iterations", "combine_pytrees", "optimize_combination"]


def combine_iterations(num_iters: int, num_archives: int,
                       max_models_combine: int = 20,
                       num_jobs_final: int = 1) -> List[int]:
    """Iterations (1-based, ending at ``num_iters``) whose checkpoints form
    the combination candidate set — ``ze_utils.py:76-108`` semantics:
    combine over ~half an epoch (+1), capped at half of training, and
    sub-sampled down to ``max_models_combine`` models."""
    approx_iters_per_epoch_final = num_archives // max(num_jobs_final, 1)
    initial = min(approx_iters_per_epoch_final // 2 + 1, num_iters // 2)
    initial = max(initial, 1)
    if initial > max_models_combine:
        factor = initial // max_models_combine
        models = set(range(num_iters - initial + 1, num_iters + 1,
                           max(factor, 1)))
        models.add(num_iters)
    else:
        n = max(min(max_models_combine, num_iters // 2), 1)
        models = set(range(num_iters - n + 1, num_iters + 1))
    return sorted(m for m in models if m >= 1)


def combine_pytrees(trees: Sequence, weights) -> object:
    """Convex combination of ``N`` identically-structured pytrees with
    ``weights`` (shape ``(N,)``): one stacked ``tensordot`` per leaf."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    return jax.tree.map(lambda s: jnp.tensordot(weights, s, axes=1), stacked)


def optimize_combination(model_cfg: tdnn.TdnnConfig,
                         params_list: Sequence,
                         state_list: Sequence,
                         batches: Sequence[Tuple[np.ndarray, np.ndarray,
                                                 int, int]],
                         compute_dtype=jnp.float32,
                         steps: int = 80,
                         lr: float = 0.25) -> Tuple[object, object, Dict]:
    """Optimize softmax combination weights over checkpoint models.

    batches: materialized (feats (B,T,F), labels (B,), true_len, n_rows)
    eval minibatches (the reference's combination data is a train subset).
    Returns (combined_params, combined_state, info) where info carries the
    final weights and the before/after objective.
    """
    n = len(params_list)
    if n != len(state_list) or n == 0:
        raise ValueError("need ≥1 model with matching state list")
    p_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
    s_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *state_list)

    dev_batches = [(jnp.asarray(f), jnp.asarray(l), jnp.int32(t),
                    jnp.int32(r)) for f, l, t, r in batches]

    # p/s_stacked are explicit jit ARGUMENTS everywhere below: a
    # closed-over device array is embedded as a CONSTANT in the lowered
    # HLO, and shipping ~20 models x ~18 MB of weights inside the compile
    # request breaks remote-compile transports (observed HTTP 413 /
    # multi-ten-minute compile uploads)
    def model_loss(logits_w, ps, ss, feats, labels, t_len, n_rows):
        w = jax.nn.softmax(logits_w)
        params = jax.tree.map(lambda s: jnp.tensordot(w, s, axes=1), ps)
        state = jax.tree.map(lambda s: jnp.tensordot(w, s, axes=1), ss)
        b, t = feats.shape[:2]
        frame_ids = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
        mask = (frame_ids < t_len).astype(jnp.float32)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)[:, 0]
        weight = (row_ids < n_rows).astype(jnp.float32)
        out = tdnn.apply(model_cfg, params, state, feats, mask=mask,
                         train=False, compute_dtype=compute_dtype)
        return softmax_ce(out["logits"], labels, weight), \
            accuracy(out["logits"], labels, weight)

    opt = optax.adam(lr)

    @jax.jit
    def step(logits_w, opt_state, ps, ss, feats, labels, t_len, n_rows):
        (loss, acc), g = jax.value_and_grad(model_loss, has_aux=True)(
            logits_w, ps, ss, feats, labels, t_len, n_rows)
        updates, opt_state = opt.update(g, opt_state, logits_w)
        return optax.apply_updates(logits_w, updates), opt_state, loss, acc

    eval_loss = jax.jit(
        lambda lw, ps, ss, f, l, t, r: model_loss(lw, ps, ss, f, l,
                                                  t, r)[0])

    def total_loss(lw):
        return float(np.mean([float(eval_loss(lw, p_stacked, s_stacked,
                                              *fb))
                              for fb in dev_batches]))

    # start biased toward the newest model so the search begins near the
    # reference's default answer (the final iteration)
    logits_w = jnp.zeros((n,), jnp.float32).at[-1].set(1.0)
    opt_state = opt.init(logits_w)
    final_only = jnp.full((n,), -30.0).at[-1].set(30.0)  # ≈ one-hot final
    baseline = total_loss(final_only)

    i = 0
    while i < steps:
        for fb in dev_batches:
            if i >= steps:
                break
            logits_w, opt_state, loss, acc = step(
                logits_w, opt_state, p_stacked, s_stacked, *fb)
            i += 1
    combined_loss = total_loss(logits_w)
    # never worse than the final model on the combination data — Kaldi's
    # combine stage has the final model in its convex hull for the same
    # reason
    fell_back = combined_loss > baseline
    if fell_back:
        logits_w, combined_loss = final_only, baseline
    weights = jax.nn.softmax(logits_w)
    params = combine_pytrees(params_list, weights)
    state = combine_pytrees(state_list, weights)
    info = {
        "weights": np.asarray(weights).tolist(),
        "final_model_loss": baseline,
        "combined_loss": combined_loss,
        "fell_back": bool(fell_back),
        "num_models": n,
        "steps": i,
    }
    return params, state, info
