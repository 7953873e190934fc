"""Training loop: jitted SPMD step + iteration-structured outer loop.

Replaces the reference's L3/L4 stack — per-iteration subprocess jobs running
a TF1 session loop (``train_dnn.py:463-593`` outer scheduler,
``models.py:216-305`` minibatch loop) — with:

* ONE jitted train step (forward + CE(+L2) loss + Adam update + BN-state
  EMA) compiled per padded minibatch shape, sharded over a ``(data, model)``
  mesh; gradient reduction is XLA's psum, superseding the reference's
  checkpoint averaging;
* an outer loop that keeps the reference's *iteration* semantics: one
  archive per iteration, exponential effective-LR schedule
  (``ze_utils.py:111-120``), piecewise-linear dropout schedule, optional
  proportional shrink, per-iteration checkpoints with ``done`` sentinels,
  GC (keep last 2 + every ``preserve_model_interval``-th,
  ``ze_utils.py:186-194``), ``model_final`` marker, resume by skipping
  completed iterations (``train_dnn.py:344-346``);
* background-free diagnostics: held-out valid / train-subset evaluation runs
  on-device between iterations (the reference shells out to CPU eval jobs,
  ``train_dnn.py:429-460``) and metrics go to ``metrics.jsonl`` instead of
  regex-mined logs (``ze_utils.py:491-558``).
"""

from __future__ import annotations

import functools
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import tdnn
from ..models.heads import accuracy, am_softmax, softmax_ce
from ..parallel import mesh as meshlib
from . import checkpoints, schedules

__all__ = ["TrainConfig", "Trainer", "make_train_step", "make_eval_step"]


@dataclass(frozen=True)
class TrainConfig:
    model: str = "no_dropout"             # preset name (MODEL_ZOO)
    num_targets: int = 0
    initial_effective_lrate: float = 1e-3  # run_xvector.sh:99
    final_effective_lrate: float = 1e-4    # run_xvector.sh:100
    num_epochs: int = 2                    # run_xvector.sh:103
    dropout_schedule: str = "0,0@0.10,0.1@0.50,0"   # run_xvector.sh:83
    proportional_shrink: float = 0.0       # 10 in recipe but dead in TF
    apply_shrink: bool = False             # R1: off for strict parity
    random_seed: int = 2468                # run_xvector.sh:85
    head: str = "softmax"                  # softmax | am_softmax
    am_scale: float = 30.0
    am_margin: float = 0.2
    preserve_model_interval: int = 10      # run_xvector.sh:106
    compute_dtype: str = "bfloat16"
    max_param_change: float = 0.0          # 0 = off (dead knob in reference)


def _loss_fn(model_cfg: tdnn.TdnnConfig, cfg: TrainConfig, params, state,
             batch, labels, mask, weight, dropout_keep, rng):
    out = tdnn.apply(model_cfg, params, state, batch, mask=mask,
                     row_weight=weight, train=True,
                     dropout_keep=dropout_keep, rng=rng,
                     compute_dtype=jnp.dtype(cfg.compute_dtype))
    if cfg.head == "am_softmax":
        ce, logits = am_softmax(out["hidden"], params["output"]["w"],
                                labels, cfg.am_scale, cfg.am_margin,
                                row_weight=weight)
    else:
        logits = out["logits"]
        ce = softmax_ce(logits, labels, weight)
    loss = ce + out["l2_loss"]
    return loss, (out["state"], ce, accuracy(logits, labels, weight))


def make_train_step(model_cfg: tdnn.TdnnConfig, cfg: TrainConfig,
                    optimizer: optax.GradientTransformation):
    """Build the jitted train step.  Scalars (lr, dropout_keep, shrink) are
    traced operands so schedule changes never retrigger compilation."""

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, opt_state, state, batch, labels, mask, weight, lr,
             dropout_keep, shrink, rng):
        grad_fn = jax.value_and_grad(_loss_fn, argnums=2, has_aux=True)
        (loss, (new_state, ce, acc)), grads = grad_fn(
            model_cfg, cfg, params, state, batch, labels, mask, weight,
            dropout_keep, rng)
        if cfg.max_param_change > 0.0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, cfg.max_param_change
                                / (gnorm * lr + 1e-20))
            grads = jax.tree.map(lambda g: g * scale, grads)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if cfg.apply_shrink:
            params = jax.tree.map(lambda p: p * shrink, params)
        return params, opt_state, new_state, {
            "loss": loss, "ce": ce, "accuracy": acc}

    return step


def make_eval_step(model_cfg: tdnn.TdnnConfig, cfg: TrainConfig):
    @jax.jit
    def step(params, state, batch, labels, mask, weight):
        out = tdnn.apply(model_cfg, params, state, batch, mask=mask,
                         train=False,
                         compute_dtype=jnp.dtype(cfg.compute_dtype))
        return softmax_ce(out["logits"], labels, weight), \
            accuracy(out["logits"], labels, weight)
    return step


class Trainer:
    """Iteration-structured trainer over materialised archives."""

    def __init__(self, cfg: TrainConfig, work_dir: str,
                 mesh=None, feat_dim: int = 23):
        if cfg.num_targets <= 0:
            raise ValueError("num_targets must be set")
        self.cfg = cfg
        self.model_cfg = tdnn.MODEL_ZOO[cfg.model]
        if self.model_cfg.feat_dim != feat_dim:
            from dataclasses import replace
            self.model_cfg = replace(self.model_cfg, feat_dim=feat_dim)
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.mesh = mesh if mesh is not None else meshlib.make_mesh()
        # Adam exactly as the reference (models.py:518 AdamOptimizer
        # defaults); lr injected per step so one compilation serves the
        # whole schedule.
        self.optimizer = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.initial_effective_lrate)
        self._step_fn = make_train_step(self.model_cfg, cfg, self.optimizer)
        self._eval_fn = make_eval_step(self.model_cfg, cfg)
        self._metrics_path = os.path.join(work_dir, "metrics.jsonl")
        self._dropout_points = schedules.parse_dropout_schedule(
            cfg.dropout_schedule)

        key = jax.random.PRNGKey(cfg.random_seed)
        self.params, self.state = tdnn.init_params(
            key, self.model_cfg, cfg.num_targets)
        self.opt_state = self.optimizer.init(self.params)
        self._place_all()

    # -- sharding placement ------------------------------------------------
    def _place_all(self):
        shardings = meshlib.param_shardings(self.mesh, self.params)
        self.params = jax.device_put(self.params, shardings)
        self.state = jax.device_put(self.state,
                                    meshlib.replicated(self.mesh))
        self.opt_state = jax.device_put(
            self.opt_state,
            meshlib.param_shardings(self.mesh, self.opt_state))

    def _device_batch(self, feats, labels, mask):
        """Place a host batch on the mesh, padding the batch dim up to a
        multiple of the data axis with zero-weight rows."""
        n = feats.shape[0]
        data_axis = self.mesh.shape["data"]
        pad = (-n) % data_axis
        weight = np.ones(n, dtype=np.float32)
        if pad:
            feats = np.concatenate(
                [feats, np.zeros((pad,) + feats.shape[1:], feats.dtype)])
            labels = np.concatenate(
                [labels, np.zeros(pad, labels.dtype)])
            mask = np.concatenate(
                [mask, np.zeros((pad,) + mask.shape[1:], mask.dtype)])
            weight = np.concatenate([weight, np.zeros(pad, np.float32)])
        bs = meshlib.batch_sharding(self.mesh)
        return (jax.device_put(feats, bs), jax.device_put(labels, bs),
                jax.device_put(mask, bs), jax.device_put(weight, bs))

    # -- metrics -----------------------------------------------------------
    def _log(self, record: Dict[str, Any]):
        record["time"] = time.time()
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    # -- core loops --------------------------------------------------------
    def train_one_iteration(self, it: int, batches: Iterable, lr: float,
                            dropout: float, shrink: float) -> Dict[str, float]:
        """One iteration = one pass over one archive's minibatches
        (train_dnn_one_iteration semantics, minus the process boundary)."""
        rng = jax.random.PRNGKey(self.cfg.random_seed + 1000 * it)
        tot_loss = tot_acc = n = 0.0
        device_wait = 0.0
        for i, (feats, labels, mask) in enumerate(batches):
            feats, labels, mask, weight = self._device_batch(
                feats, labels, mask)
            rng, sub = jax.random.split(rng)
            t0 = time.monotonic()
            self.params, self.opt_state, self.state, m = self._step_fn(
                self.params, self.opt_state, self.state, feats, labels,
                mask, weight, jnp.float32(lr), jnp.float32(1.0 - dropout),
                jnp.float32(shrink), sub)
            if i % 32 == 0:     # periodic sync for wait accounting
                m = jax.tree.map(float, m)
                device_wait += time.monotonic() - t0
                tot_loss += m["loss"]
                tot_acc += m["accuracy"]
                n += 1
        jax.block_until_ready(self.params)
        return {"loss": tot_loss / max(n, 1), "accuracy": tot_acc / max(n, 1),
                "device_wait": device_wait}

    def evaluate(self, batches: Iterable) -> Dict[str, float]:
        tot_loss = tot_acc = tot_w = 0.0
        for feats, labels, mask in batches:
            w = feats.shape[0]
            feats, labels, mask, weight = self._device_batch(
                feats, labels, mask)
            loss, acc = self._eval_fn(self.params, self.state, feats,
                                      labels, mask, weight)
            tot_loss += float(loss) * w
            tot_acc += float(acc) * w
            tot_w += w
        return {"loss": tot_loss / max(tot_w, 1),
                "accuracy": tot_acc / max(tot_w, 1)}

    def train(self, archive_batches: Callable[[int], Iterable],
              num_archives: int,
              valid_batches: Optional[Callable[[], Iterable]] = None,
              train_subset_batches: Optional[Callable[[], Iterable]] = None,
              start_iter: int = 0) -> int:
        """Full run.  ``archive_batches(i)`` yields the minibatches of
        archive ``i % num_archives``.  Returns the final iteration index.

        num_iters follows train_dnn.py:504 with num_jobs ≡ 1:
        ``num_epochs * num_archives``.
        """
        cfg = self.cfg
        num_iters = cfg.num_epochs * num_archives
        to_process = cfg.num_epochs * num_archives

        start_iter = checkpoints.restore_latest(self, start_iter)

        for it in range(start_iter, num_iters):
            lr = schedules.learning_rate(
                it, to_process, cfg.initial_effective_lrate,
                cfg.final_effective_lrate,
                is_final_iter=(it + 1 >= num_iters))
            frac = (it + 1) / num_iters
            drop = schedules.dropout_proportion(self._dropout_points, frac)
            shrink = (schedules.shrink_value(cfg.proportional_shrink, lr)
                      if cfg.apply_shrink and cfg.proportional_shrink > 0
                      else 1.0)
            t0 = time.monotonic()
            stats = self.train_one_iteration(
                it, archive_batches(it % num_archives), lr, drop, shrink)
            stats.update(iteration=it, lr=lr, dropout=drop,
                         seconds=time.monotonic() - t0, kind="train")
            self._log(stats)
            if valid_batches is not None:
                v = self.evaluate(valid_batches())
                self._log({"iteration": it, "kind": "valid", **v})
            if train_subset_batches is not None:
                v = self.evaluate(train_subset_batches())
                self._log({"iteration": it, "kind": "train_subset", **v})
            checkpoints.save_iteration(self, it + 1)
            checkpoints.collect_garbage(
                self.work_dir, it + 1, cfg.preserve_model_interval)
        checkpoints.mark_final(self.work_dir, num_iters)
        return num_iters
