"""TDNN x-vector model zoo — functional JAX core.

Re-designs the reference's eight TF1 graph classes
(``/root/reference/local/tf/models.py:20-1244``) as ONE parameterised
functional model: a config dataclass selects topology/activation/init/pooling,
parameters live in a pytree, and batch-norm population statistics live in a
separate mutable-state pytree threaded through ``apply``.  Everything is
jit/pjit-friendly: static shapes, no Python control flow on traced values,
masked pooling for padded variable-length batches (the reference has no
padding because it runs batch-size-1 chunks at extraction,
``models.py:410``).

Topology presets (→ reference class, file:line):
  * ``base``             → ``Model``                      (models.py:20)
  * ``no_dropout``       → ``ModelWithoutDropout``        (models.py:436) — recipe default
  * ``tdnn_dilated``     → ``ModelWithoutDropoutTdnn``    (models.py:538)
  * ``prelu``            → ``ModelWithoutDropoutPRelu``   (models.py:643)
  * ``l2_prelu``         → ``ModelL2LossWithoutDropoutPRelu``  (models.py:746)
  * ``l2_lrelu``         → ``ModelL2LossWithoutDropoutLRelu`` (models.py:866)
  * ``l2_lrelu_attention`` → ``ModelL2LossWithoutDropoutLReluAttention`` (models.py:985)
  * ``l2_relu_he``       → ``ModelL2LossWithoutDropoutReluHeInit`` (models.py:1118)

Shared semantics replicated exactly: conv1d(SAME, stride 1) + bias → act →
batch-norm (population-EMA decay 0.95, eps 1e-3, moments over all leading
axes); stats pooling mean ‖ sqrt(var + 1e-5); two embedding affines whose
layer-0 **pre-activation** is the x-vector readout; softmax head with
Xavier-init weight; optional L2 term ``beta·(Σ ½‖w‖²+½‖b‖²)`` over
embed/output layers with 0.1× on embed-0 (models.py:811-832).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

VAR2STD_EPSILON = 1e-5   # models.py:16
BN_EPSILON = 1e-3        # tf_block.py:9 default epsilon
BN_DECAY = 0.95          # models.py:480 et al.

Params = Dict[str, Any]
State = Dict[str, Any]


# ---------------------------------------------------------------------------
# Config + zoo
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TdnnConfig:
    name: str = "no_dropout"
    feat_dim: int = 23
    kernel_sizes: Tuple[int, ...] = (5, 5, 7, 1, 1)
    dilations: Tuple[int, ...] = (1, 1, 1, 1, 1)
    channels: Tuple[int, ...] = (512, 512, 512, 512, 1536)
    embed_dims: Tuple[int, ...] = (512, 512)
    activation: str = "relu"          # relu | prelu | lrelu
    lrelu_alpha: float = 0.2
    use_dropout: bool = False
    l2_beta: float = 0.0              # 2e-4 in L2 variants (models.py:1128)
    pooling: str = "stats"            # stats | attention
    init: str = "trunc_normal"        # trunc_normal | he
    bn_decay: float = BN_DECAY
    bn_eps: float = BN_EPSILON

    @property
    def num_frame_layers(self) -> int:
        return len(self.kernel_sizes)

    @property
    def pooled_dim(self) -> int:
        if self.pooling == "attention":
            return self.channels[-1]          # 2 × (last/2)
        return 2 * self.channels[-1]

    @property
    def xvector_dim(self) -> int:
        return self.embed_dims[0]

    @property
    def receptive_field(self) -> int:
        return 1 + sum((k - 1) * d
                       for k, d in zip(self.kernel_sizes, self.dilations))


MODEL_ZOO: Dict[str, TdnnConfig] = {
    "base": TdnnConfig(name="base", use_dropout=True),
    "no_dropout": TdnnConfig(name="no_dropout"),
    "tdnn_dilated": TdnnConfig(
        name="tdnn_dilated", kernel_sizes=(5, 3, 3, 1, 1),
        dilations=(1, 2, 3, 1, 1)),
    "prelu": TdnnConfig(name="prelu", activation="prelu"),
    "l2_prelu": TdnnConfig(name="l2_prelu", activation="prelu",
                           l2_beta=2e-4),
    "l2_lrelu": TdnnConfig(name="l2_lrelu", activation="lrelu",
                           l2_beta=2e-4),
    "l2_lrelu_attention": TdnnConfig(
        name="l2_lrelu_attention", activation="lrelu", l2_beta=2e-4,
        channels=(512, 512, 512, 512, 6 * 512), pooling="attention"),
    "l2_relu_he": TdnnConfig(name="l2_relu_he", l2_beta=2e-4, init="he"),
    # Extended TDNN (BASELINE.json config 3; Snyder et al. 2019): TDNN
    # layers interleaved with dense (k=1) layers, wider dilated context
    # (RF 23), 1500-ch pre-pooling layer.  No reference class counterpart
    # — the reference's closest is ModelWithoutDropoutTdnn (models.py:538).
    "etdnn": TdnnConfig(
        name="etdnn",
        kernel_sizes=(5, 1, 3, 1, 3, 1, 3, 1, 1, 1),
        dilations=(1, 1, 2, 1, 3, 1, 4, 1, 1, 1),
        channels=(512,) * 9 + (1500,)),
    # reduced-width config for CI / smoke runs (no reference counterpart)
    "tiny": TdnnConfig(name="tiny", channels=(32, 32, 32, 32, 96),
                       embed_dims=(64, 64)),
}

# Reference TF class name → preset, for CLI parity with
# ``--tf-model-class`` (train_dnn.py:29-184).
REFERENCE_CLASS_TO_PRESET = {
    "Model": "base",
    "ModelWithoutDropout": "no_dropout",
    "ModelWithoutDropoutTdnn": "tdnn_dilated",
    "ModelWithoutDropoutPRelu": "prelu",
    "ModelL2LossWithoutDropoutPRelu": "l2_prelu",
    "ModelL2LossWithoutDropoutLRelu": "l2_lrelu",
    "ModelL2LossWithoutDropoutLReluAttention": "l2_lrelu_attention",
    "ModelL2LossWithoutDropoutReluHeInit": "l2_relu_he",
}


# ---------------------------------------------------------------------------
# Initialisation
# ---------------------------------------------------------------------------

def _trunc_normal(key, shape, stddev):
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape,
                                                jnp.float32)


def _xavier_uniform(key, shape):
    fan_in, fan_out = shape[-2], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def init_params(key, cfg: TdnnConfig, num_classes: int
                ) -> Tuple[Params, State]:
    """Build (params, bn_state) pytrees for a topology preset."""
    keys = iter(jax.random.split(key, 64))
    params: Params = {"frame": [], "embed": []}
    state: State = {"frame": [], "embed": []}

    def bn(dim):
        return ({"gamma": jnp.ones(dim), "beta": jnp.zeros(dim)},
                {"mean": jnp.zeros(dim), "var": jnp.ones(dim)})

    def act_params(dim):
        if cfg.activation == "prelu":
            return {"alpha": jnp.full((dim,), 0.1)}    # tf_block.py:44
        return {}

    prev = cfg.feat_dim
    for k, ch in zip(cfg.kernel_sizes, cfg.channels):
        if cfg.init == "he":
            fan_in = k * prev
            w = _trunc_normal(next(keys), (k, prev, ch),
                              math.sqrt(2.0 / fan_in))
            limit = math.sqrt(6.0 / fan_in)
            b = jax.random.uniform(next(keys), (ch,), jnp.float32,
                                   -limit, limit)
        else:
            w = _trunc_normal(next(keys), (k, prev, ch), 0.1)
            b = jnp.full((ch,), 0.1)
        bn_p, bn_s = bn(ch)
        params["frame"].append({"w": w, "b": b, "bn": bn_p,
                                **act_params(ch)})
        state["frame"].append(bn_s)
        prev = ch

    if cfg.pooling == "attention":
        half = cfg.channels[-1] // 2
        params["attention"] = {
            "w": _trunc_normal(next(keys), (half, half), 0.1),
            "b": jnp.full((half,), 0.1),
            "v": jnp.full((half,), 0.1),
        }

    prev = cfg.pooled_dim
    for dim in cfg.embed_dims:
        if cfg.init == "he":
            w = _trunc_normal(next(keys), (prev, dim),
                              math.sqrt(2.0 / prev))
            limit = math.sqrt(6.0 / prev)
            b = jax.random.uniform(next(keys), (dim,), jnp.float32,
                                   -limit, limit)
        else:
            w = _trunc_normal(next(keys), (prev, dim), 0.1)
            b = jnp.full((dim,), 0.1)
        bn_p, bn_s = bn(dim)
        params["embed"].append({"w": w, "b": b, "bn": bn_p,
                                **act_params(dim)})
        state["embed"].append(bn_s)
        prev = dim

    params["output"] = {"w": _xavier_uniform(next(keys),
                                             (prev, num_classes)),
                        "b": jnp.full((num_classes,), 0.1)}
    return params, state


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _activate(cfg: TdnnConfig, layer: Params, x):
    if cfg.activation == "relu":
        return jax.nn.relu(x)
    if cfg.activation == "lrelu":
        return jax.nn.leaky_relu(x, cfg.lrelu_alpha)
    if cfg.activation == "prelu":
        # keep the activation in x's dtype: a f32 alpha would promote the
        # whole (B, T, C) tensor and double its fwd+bwd HBM traffic
        alpha = layer["alpha"].astype(x.dtype)
        return jnp.maximum(x, 0.0) + alpha * jnp.minimum(x, 0.0)
    raise ValueError(cfg.activation)


def _masked_moments(x, mask, axes, axis_name=None):
    """f32 mean/var over `axes`, ignoring positions where mask==0.

    Elementwise products run in x's own dtype and only the REDUCTIONS
    accumulate in f32 (``dtype=`` on the sums) — a bf16 activation never
    materialises an f32 copy, which halves the HBM traffic of every BN
    moment pass.  mask broadcasts against x with a trailing feature dim of
    1.  With a sharded batch under pjit the sums become cross-replica
    psums automatically, giving exact global batch statistics; inside a
    shard_map region pass ``axis_name`` to psum the sums/counts explicitly
    (same global statistics, manual collectives).
    """
    def allsum(v):
        return jax.lax.psum(v, axis_name) if axis_name else v

    # accumulate in f32 — or f64 when the input is already f64 (the
    # double-precision referee path in tests; bf16/f32 production inputs
    # are unaffected)
    acc = jnp.promote_types(x.dtype, jnp.float32)
    if mask is None:
        count = 1.0
        for a in axes:
            count = count * x.shape[a]
        count = allsum(jnp.asarray(count, acc))
        mean = allsum(jnp.sum(x, axes, dtype=acc)) / count
        var = allsum(jnp.sum(jnp.square(x), axes,
                             dtype=acc)) / count - jnp.square(mean)
        return mean, var
    m = mask.astype(x.dtype)
    count = jnp.maximum(allsum(jnp.sum(mask.astype(acc), axes)), 1.0)
    mean = allsum(jnp.sum(x * m, axes, dtype=acc)) / count
    var = allsum(jnp.sum(jnp.square(x) * m, axes,
                         dtype=acc)) / count - jnp.square(mean)
    return mean, var


def _batch_norm(x, bn_p, bn_s, mask, train: bool, cfg: TdnnConfig,
                stats_out: bool = False, axis_name=None):
    """tf_block.batch_norm_wrapper semantics: train → batch moments +
    EMA update of population stats; eval → population stats.

    ``stats_out=True`` (train only) returns the RAW batch moments instead
    of EMA'd state — callers that scan many steps fold the EMA in closed
    form afterwards (see ``fold_bn_state``), keeping the population stats
    out of the scan carry.  Train-mode normalisation never reads them, so
    the forward/backward math is identical either way.
    """
    axes = tuple(range(x.ndim - 1))
    if train:
        mean, var = _masked_moments(x, mask, axes, axis_name=axis_name)
        if stats_out:
            new_s = {"mean": mean, "var": var}
        else:
            new_s = {
                "mean": bn_s["mean"] * cfg.bn_decay + mean * (1 - cfg.bn_decay),
                "var": bn_s["var"] * cfg.bn_decay + var * (1 - cfg.bn_decay)}
    else:
        mean, var = bn_s["mean"], bn_s["var"]
        new_s = bn_s
    # fold (mean, var, γ, β) into one per-channel affine computed in f32,
    # applied in x's dtype: the big elementwise pass stays bf16 and fuses
    # into the conv epilogue instead of materialising f32 activations
    inv = jax.lax.rsqrt(var + cfg.bn_eps)
    a = (inv * bn_p["gamma"]).astype(x.dtype)
    b = (bn_p["beta"] - mean * inv * bn_p["gamma"]).astype(x.dtype)
    return x * a + b, new_s


def fold_bn_state(state0: State, stacked: State, decay: float) -> State:
    """Fold N stacked per-step batch moments into the EMA population stats:
    s_N = decay^N s_0 + (1-decay) Σ_i decay^(N-1-i) b_i — exactly the
    result of applying the EMA update sequentially."""
    leaves = jax.tree.leaves(stacked)
    n = leaves[0].shape[0]
    i = jnp.arange(n, dtype=jnp.float32)
    w = (1.0 - decay) * decay ** (n - 1 - i)

    def fold(s0, bs):
        return decay ** n * s0 + jnp.tensordot(w, bs, axes=1)

    return jax.tree.map(fold, state0, stacked)


def _conv1d_same(x, w, dilation: int, fused_bwd: bool = False):
    """(B, T, Cin) ⊛ (K, Cin, Cout) → (B, T, Cout), SAME padding.

    Two lowerings, both pure dot_general (no conv primitive):
    * narrow input (k·Cin ≤ 160, i.e. the 23-dim MFCC front layer):
      unfold-to-one-matmul — k tiny-K matmuls would run the MXU at <20%
      of a 128-lane pass; the concatenated slices give ONE contraction of
      k·Cin≈115.
    * otherwise: k shifted matmuls of the SAME-padded input, summed.
      lax.conv_general_dilated is avoided deliberately: its grad rules
      make XLA pick T-major activation layouts and the resulting
      {2,1,0}↔{2,0,1} relayouts of every (B,T,512) tensor cost ~0.7 ms of
      a ~4.5 ms train step (profiled); the all-dots graph keeps one layout
      end to end and is 16% faster per step despite a slower lone conv.

    Runs uniformly in the weight dtype (bf16 feeds the MXU at 2× rate; the
    MXU still accumulates in f32 internally).
    """
    k, cin, cout = w.shape
    x = x.astype(w.dtype)
    t = x.shape[1]
    left = (k - 1) // 2 * dilation
    right = (k - 1) * dilation - left
    if k == 1:
        return jnp.dot(x, w[0])
    if fused_bwd and k * cin > 160:
        from xvector_tpu.ops import conv_bwd as _cb
        if ((jax.default_backend() == "tpu" or _cb.INTERPRET)
                and _cb.pallas_bwd_supported(x.shape, w.shape, dilation)):
            # single-pass Pallas dw/dx (reads x and the cotangent once
            # instead of k times); forward values identical.  Opt-in:
            # a pallas_call has no GSPMD partitioning rule, so this is
            # for single-device or shard_map (per-shard-shaped) graphs
            # only; _cb.INTERPRET lets CPU-mesh tests exercise it.
            return _cb.conv1d_same_fused_bwd(x, w, dilation, _cb.INTERPRET)
    xp = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    if k * cin <= 160:
        pieces = [xp[:, j * dilation: j * dilation + t] for j in range(k)]
        xu = jnp.concatenate(pieces, axis=-1)          # (B, T, k·Cin)
        return jnp.dot(xu, w.reshape(k * cin, cout))
    out = None
    for j in range(k):
        term = jnp.dot(xp[:, j * dilation: j * dilation + t], w[j])
        out = term if out is None else out + term
    return out


def _affine(x, w, b, compute_dtype):
    """x @ w + b with bf16-capable operands and f32 (or wider) accum."""
    acc = jnp.promote_types(compute_dtype, jnp.float32)
    return jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype),
                   preferred_element_type=acc) + b


def stats_pooling(h, mask=None, eps: float = VAR2STD_EPSILON):
    """mean ‖ sqrt(var+eps) over the time axis (models.py:485-486), masked
    for padded frames."""
    mean, var = _masked_moments(
        h.astype(jnp.promote_types(h.dtype, jnp.float32)), mask, (1,))
    return jnp.concatenate([mean, jnp.sqrt(jnp.maximum(var, 0.0) + eps)],
                           axis=-1)


def attention_pooling(h, att: Params, mask=None, eps: float = VAR2STD_EPSILON):
    """Self-attentive pooling (models.py:1039-1051): split channels in two,
    scores from h1, attention-weighted mean/std of h2.

    Runs in the incoming compute dtype with f32 MXU accumulation
    (``preferred_element_type``) — the earlier ``h.astype(f32)`` up-cast
    materialised the (B, T, 6·512) pre-pooling activation in f32, ~240 MB
    of HBM round-trip per direction at the recipe working point, and was
    the main reason the attention variant ran at 49% of the flagship's
    throughput (BENCH_r02).  Softmax statistics stay f32."""
    half = h.shape[-1] // 2
    acc = jnp.promote_types(h.dtype, jnp.float32)
    h1, h2 = h[..., :half], h[..., half:]
    pre = jnp.dot(h1, att["w"].astype(h.dtype),
                  preferred_element_type=acc) + att["b"]
    scores = jnp.dot(jnp.tanh(pre).astype(h.dtype),
                     att["v"].astype(h.dtype),
                     preferred_element_type=acc)                # (B, T)
    if mask is not None:
        scores = jnp.where(mask[..., 0] > 0, scores, -1e30)
    alpha = jax.nn.softmax(scores, axis=1)                      # f32
    a = alpha.astype(h.dtype)
    mean = jnp.einsum("btc,bt->bc", h2, a,
                      preferred_element_type=acc)
    ex2 = jnp.einsum("btc,btc,bt->bc", h2, h2, a,
                     preferred_element_type=acc)
    var = ex2 - jnp.square(mean)
    return jnp.concatenate([mean, jnp.sqrt(jnp.maximum(var, 0.0) + eps)],
                           axis=-1)


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

def apply(cfg: TdnnConfig, params: Params, state: State, x,
          *, mask=None, row_weight=None, train: bool = False,
          dropout_keep: float | jnp.ndarray = 1.0,
          rng: Optional[jax.Array] = None,
          compute_dtype=jnp.float32,
          bn_stats_out: bool = False,
          skip_head: bool = False,
          fused_conv_bwd: bool = False,
          axis_name: Optional[str] = None) -> Dict[str, Any]:
    """Forward pass.

    Args:
      x: (B, T, feat_dim) features.
      mask: optional (B, T) 1/0 frame-validity mask for padded batches.
      row_weight: optional (B,) 1/0 row validity (mesh batch padding);
        zero-weight rows are excluded from batch-norm statistics.
      train: BN/dropout mode (static).
      dropout_keep: keep probability (traced OK; only used when
        cfg.use_dropout and train).
      rng: PRNG key for dropout.
      compute_dtype: conv/matmul compute dtype (bf16 on TPU for speed; BN
        statistics and pooling always run in f32).
      axis_name: mesh axis to psum BN batch moments over when running
        inside a shard_map region (per-shard batches); None under
        jit/GSPMD where the psums are inserted automatically.

    Returns dict with:
      ``logits`` (B, num_classes), ``xvector`` (B, embed0) — the embed-0
      pre-activation readout (models.py:382-384), ``pooled``, ``l2_loss``
      (scalar, already beta-scaled), ``state`` (new BN state).
    """
    m = None if mask is None else mask.astype(jnp.float32)[..., None]
    rw = (None if row_weight is None
          else row_weight.astype(jnp.float32)[:, None])
    if rw is not None:
        m = rw[..., None] if m is None else m * rw[..., None]
    new_state: State = {"frame": [], "embed": []}
    h = x.astype(compute_dtype)
    dropkeys = (jax.random.split(rng, 8) if rng is not None else None)
    drop_i = 0

    def dropout(h):
        nonlocal drop_i
        if not (cfg.use_dropout and train):
            return h
        if dropkeys is None:
            raise ValueError("dropout requires an rng key")
        keep = jnp.asarray(dropout_keep, h.dtype)
        mask_ = jax.random.bernoulli(dropkeys[drop_i], keep, h.shape)
        drop_i += 1
        return jnp.where(mask_, h / keep, 0.0)

    if m is not None:
        h = h * m.astype(h.dtype)  # zero pad frames (SAME-style padding)
    for i, layer in enumerate(params["frame"]):
        # bias in the compute dtype: a f32 bias would promote every
        # (B, T, C) activation to f32, doubling its HBM traffic through
        # the forward AND the saved-residual reads of the backward
        h = _conv1d_same(h, layer["w"].astype(compute_dtype),
                         cfg.dilations[i], fused_bwd=fused_conv_bwd
                         ) + layer["b"].astype(compute_dtype)
        h = _activate(cfg, layer, h)
        h, bn_s = _batch_norm(h, layer["bn"], state["frame"][i], m,
                              train, cfg, stats_out=bn_stats_out,
                              axis_name=axis_name)
        if m is not None:
            h = h * m.astype(h.dtype)  # keep pad positions zero for next conv
        new_state["frame"].append(bn_s)
        if i != cfg.num_frame_layers - 1:
            h = dropout(h)

    if cfg.pooling == "attention":
        pooled = attention_pooling(h, params["attention"], m)
    else:
        pooled = stats_pooling(h, m)

    acc = jnp.promote_types(jnp.dtype(compute_dtype), jnp.float32)
    l2 = jnp.asarray(0.0, acc)
    h = pooled
    xvector = None
    for i, layer in enumerate(params["embed"]):
        pre = _affine(h, layer["w"], layer["b"], compute_dtype)
        if i == 0:
            xvector = pre.astype(acc)
        if cfg.l2_beta > 0.0:
            scale = 0.1 if i == 0 else 1.0     # models.py:811-817
            l2 = l2 + scale * 0.5 * (jnp.sum(jnp.square(layer["w"]))
                                     + jnp.sum(jnp.square(layer["b"])))
        h = _activate(cfg, layer, pre)
        h, bn_s = _batch_norm(h, layer["bn"], state["embed"][i], rw,
                              train, cfg, stats_out=bn_stats_out,
                              axis_name=axis_name)
        new_state["embed"].append(bn_s)
        if i != len(cfg.embed_dims) - 1:
            h = dropout(h)

    out = params["output"]
    # skip_head: heads that consume `hidden` directly (AM-softmax, the
    # sharded-CE head) don't need the dense (B, C) logits matmul
    logits = (None if skip_head
              else _affine(h, out["w"], out["b"], compute_dtype))
    if cfg.l2_beta > 0.0:
        l2 = l2 + 0.5 * (jnp.sum(jnp.square(out["w"]))
                         + jnp.sum(jnp.square(out["b"])))

    return {
        "logits": None if logits is None else logits.astype(acc),
        "xvector": xvector,
        "hidden": h.astype(acc),           # post embed stack, pre output
        "pooled": pooled,
        "l2_loss": cfg.l2_beta * l2,
        "state": new_state,
    }


def frame_stack(cfg: TdnnConfig, params: Params, state: State, x,
                mask=None, compute_dtype=jnp.float32):
    """Eval-mode frame-level stack: (B, T, F) → (B, T, channels[-1]),
    masked.  The XLA reference path for ops/tdnn_kernel's fused Pallas
    version."""
    m = None if mask is None else mask.astype(jnp.float32)[..., None]
    h = x.astype(compute_dtype)
    if m is not None:
        h = h * m.astype(h.dtype)
    for i, layer in enumerate(params["frame"]):
        h = _conv1d_same(h, layer["w"].astype(compute_dtype),
                         cfg.dilations[i]) + layer["b"].astype(compute_dtype)
        h = _activate(cfg, layer, h)
        h, _ = _batch_norm(h, layer["bn"], state["frame"][i], m, False, cfg)
        if m is not None:
            h = h * m.astype(h.dtype)
    return h


def extract_xvector(cfg: TdnnConfig, params: Params, state: State, x,
                    mask=None, compute_dtype=jnp.float32):
    """Embedding-only forward (no classifier head) for extraction."""
    m = None if mask is None else mask.astype(jnp.float32)[..., None]
    h = frame_stack(cfg, params, state, x, mask, compute_dtype)
    if cfg.pooling == "attention":
        pooled = attention_pooling(h, params["attention"], m)
    else:
        pooled = stats_pooling(h, m)
    e0 = params["embed"][0]
    return _affine(pooled, e0["w"], e0["b"],
                   compute_dtype).astype(jnp.float32)
