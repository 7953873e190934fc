"""shard_map data-parallel train step — explicit-collective twin of the
GSPMD block step in ``trainer.py``.

Why it exists: the GSPMD path (jit + sharded inputs) auto-partitions
everything EXCEPT ``pallas_call``, which has no SPMD partitioning rule —
so the fused-read Pallas conv backward (``ops/conv_bwd.py``, +7% step) is
single-device-only there.  Under ``shard_map`` every shard traces with its
LOCAL shapes, so the Pallas kernels compose with data parallelism at pod
scale; the collectives the compiler used to insert are written out by
hand:

* BN batch moments: per-shard sums/counts psum'd over ``data``
  (``tdnn._masked_moments(axis_name=...)``) — bit-identical global batch
  statistics;
* loss/accuracy: weighted-sum + weight psums (``heads._wmean``);
* gradients: all-reduced once per step over the ``data`` axis by
  vma-aware transposition (the psum appears as the transpose of the
  pvary that injects the replicated params into per-shard compute) —
  the synchronous form of the all-reduce that supersedes the
  reference's checkpoint averaging (``train_dnn.py:399-414``);
* the optimizer update then runs identically on every shard, keeping
  params replicated without any broadcast.

Semantics match the GSPMD step exactly (tested to ~1e-6 on a CPU mesh);
pick with ``TrainConfig.spmd_step = "shard_map"``.  Restrictions: the
``model`` mesh axis must be 1 (the sharded-CE head carries its own
shard_map and cannot nest), and the per-shard batch slice must be
non-empty.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..models import tdnn
from ..models.heads import accuracy, am_softmax, softmax_ce

try:                                    # JAX ≥ 0.7 public path
    from jax import shard_map as _shard_map
except ImportError:                     # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map
from jax.sharding import PartitionSpec as P

__all__ = ["make_shardmap_block_train_step"]

AXIS = "data"


def _local_mask(batch_shape, t_len, n_rows, local_b: int):
    """(B_local, T) frame mask + (B_local,) row weight, with GLOBAL row
    indices (shard offset × local rows + iota) so ``n_rows`` keeps its
    whole-batch meaning."""
    b, t = batch_shape[:2]
    frame_ids = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    mask = (frame_ids < t_len).astype(jnp.float32)
    shard = jax.lax.axis_index(AXIS)
    row_ids = shard * local_b + \
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)[:, 0]
    weight = (row_ids < n_rows).astype(jnp.float32)
    return mask, weight


def make_shardmap_block_train_step(model_cfg: tdnn.TdnnConfig, cfg,
                                   optimizer: optax.GradientTransformation,
                                   mesh, dense: bool = False):
    """Same signature/contract as ``trainer.make_block_train_step``,
    including the ``dense=True`` mask-free twin for certified-full
    blocks: BN moments and loss reductions keep their ``axis_name``
    psums (global statistics), only the mask build and masked
    multiplies drop out."""
    if mesh.shape.get("model", 1) != 1:
        raise ValueError("shard_map step needs a model axis of 1 "
                         "(sharded-CE nests its own shard_map)")
    if cfg.head == "sharded_softmax":
        raise ValueError("use the GSPMD step for the sharded-softmax head")
    n_shards = mesh.shape[AXIS]

    def loss_fn(params, state, batch, labels, t_len, n_rows, dropout_keep,
                rng):
        local_b = batch.shape[0]
        if dense:
            mask, weight = None, None
        else:
            mask, weight = _local_mask(batch.shape, t_len, n_rows, local_b)
        out = tdnn.apply(model_cfg, params, state, batch, mask=mask,
                         row_weight=weight, train=True,
                         dropout_keep=dropout_keep, rng=rng,
                         compute_dtype=jnp.dtype(cfg.compute_dtype),
                         bn_stats_out=True,
                         skip_head=cfg.head == "am_softmax",
                         fused_conv_bwd=cfg.fused_conv_bwd,
                         axis_name=AXIS)
        if cfg.head == "am_softmax":
            ce, logits = am_softmax(out["hidden"], params["output"]["w"],
                                    labels, cfg.am_scale, cfg.am_margin,
                                    row_weight=weight, axis_name=AXIS)
            acc = accuracy(logits, labels, weight, axis_name=AXIS)
        else:
            ce = softmax_ce(out["logits"], labels, weight, axis_name=AXIS)
            acc = accuracy(out["logits"], labels, weight, axis_name=AXIS)
        # l2 is an unvarying (params-only) term: its gradient takes the
        # replicated path with no implicit psum, so add it unscaled
        return ce + out["l2_loss"], (out["state"], acc)

    def shard_body(params, opt_state, state, xs, ys, t_lens, n_rows_arr,
                   lr, dropout_keep, shrink, rng):
        opt_state.hyperparams["learning_rate"] = lr
        # decorrelate dropout across shards (each shard sees a different
        # slice of the batch, so masks must be independent per shard)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(AXIS))
        keys = jax.random.split(rng, xs.shape[0])

        def body(carry, inp):
            params, opt_state = carry
            x, y, t_len, n_rows, key = inp
            # The gradient all-reduce is implicit: the loss is psum'd
            # (unvarying), params are unvarying, and vma-aware
            # transposition turns the pvary that injected params into the
            # varying per-shard compute into a psum of the per-shard
            # gradient contributions — i.e. grads arrive here already
            # globally summed and replicated.  An explicit psum on top
            # would multiply them by the axis size.
            (loss, (moments, acc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, state, x, y, t_len, n_rows,
                                       dropout_keep, key)
            # Exception: a custom_vjp (the Pallas fused conv backward)
            # returns the shard-LOCAL dw and stays varying — finish its
            # all-reduce by psumming exactly the leaves the vma tracker
            # still marks varying.
            grads = jax.tree.map(
                lambda g: jax.lax.psum(g, AXIS)
                if AXIS in jax.typeof(g).vma else g, grads)
            if cfg.max_param_change > 0.0:
                gnorm = optax.global_norm(grads)
                scale = jnp.minimum(
                    1.0, cfg.max_param_change / (gnorm * lr + 1e-20))
                grads = jax.tree.map(lambda g: g * scale, grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if cfg.apply_shrink:
                params = jax.tree.map(lambda p: p * shrink, params)
            return (params, opt_state), (moments, jnp.stack([loss, acc]))

        (params, opt_state), (stacked, stats) = jax.lax.scan(
            body, (params, opt_state), (xs, ys, t_lens, n_rows_arr, keys))
        new_state = tdnn.fold_bn_state(state, stacked, model_cfg.bn_decay)
        return params, opt_state, new_state, {
            "loss": jnp.mean(stats[:, 0]),
            "accuracy": jnp.mean(stats[:, 1])}

    # NOTE: vma checking must stay ON: with check_vma=False the transpose
    # of psum degenerates to psum, which multiplies every gradient flowing
    # through the loss/BN-moment collectives by n_shards.
    sharded = _shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(), P(), P(None, AXIS), P(None, AXIS), P(), P(),
                  P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()))

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def block(params, opt_state, state, xs, ys, t_lens, n_rows_arr, lr,
              dropout_keep, shrink, rng):
        if xs.shape[1] % n_shards:
            raise ValueError(f"batch {xs.shape[1]} not divisible by "
                             f"data={n_shards}")
        return sharded(params, opt_state, state, xs, ys, t_lens,
                       n_rows_arr, lr, dropout_keep, shrink, rng)

    return block
