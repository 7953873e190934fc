"""Fused-read Pallas forward + backward for the wide TDNN conv layers.

The conv layers are lowered as k shifted dot_generals
(``models/tdnn.py:_conv1d_same``, replacing the reference's
``tf.layers.conv1d`` at ``models.py:470-477``).  XLA differentiates that
graph into k separate dw contractions and k separate dx contractions —
each re-reading the full (B, T, C) activation / cotangent tensor from
HBM, so the backward of a k=5 layer moves ~5× the bytes it needs and
profiles at ~113 TFLOP/s vs the ~200 peak.

These kernels read each tensor once:

* ``_fwd_kernel`` — grid over batch blocks; all k shifts of the padded
  input contract against the stacked weights from one VMEM tile.
* ``_dw_kernel`` — grid over batch blocks; the (k·C, Cout) f32 dw lives
  resident in the revisited output block (zeroed at step 0, accumulated
  every step), so all k shift contractions reuse the activation tile
  already in VMEM.
* ``_dx_kernel`` — grid over batch blocks; all k shifts of the padded
  cotangent contract against the flipped weights from one VMEM tile.

All run f32 MXU accumulation (``preferred_element_type``) over bf16
operands and round once at the end — strictly tighter than the per-dot
bf16 rounding of the XLA shifted-dot path.

``conv1d_same_fused_bwd`` wires them into one ``jax.custom_vjp``;
eligibility (TPU backend, lane/sublane-aligned shapes) is checked by
:func:`pallas_bwd_supported`.

Measured on v5e at the recipe working point (64×304×512 blocks, 7k-class
head): the fused backward is worth ~7% of the train step; the fused
forward a further ~1% (4.07 → 4.03 ms/minibatch) — at these shapes XLA
already overlaps the redundant forward HBM reads under the MXU, so the
forward win is the f32 accumulation more than the bandwidth.  _ROWS=8
was tried and regressed (-3%, less double-buffering headroom);
``dimension_semantics=("parallel",)`` on the fwd/dx grids is worth ~0.2%.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv1d_same_fused_bwd", "pallas_bwd_supported"]

# Extra time padding so every shifted slice stays in bounds for all
# supported (k, dilation) combos ((k-1)·d ≤ 12 in the model zoo) while
# keeping the padded time axis sublane-aligned.
_TPAD = 16
_ROWS = 4          # batch rows per grid step (VMEM budget, see module doc)

# Test hook: run the kernels in Pallas interpret mode so the fused-backward
# path (incl. its use inside shard_map) is exercisable on CPU meshes.
INTERPRET = False


def _fwd_shifted_dots(x, w, dilation, t):
    k = w.shape[0]
    left = (k - 1) // 2 * dilation
    right = (k - 1) * dilation - left
    xp = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    out = None
    for j in range(k):
        term = jnp.dot(xp[:, j * dilation: j * dilation + t], w[j])
        out = term if out is None else out + term
    return out


def _dw_kernel(xp_ref, g_ref, dw_ref, *, k, dilation, t, rows):
    """Row-folded: the batch-row block is reshaped into the contraction
    dimension so each shift is ONE (rows·T, Cin)ᵀ(rows·T, Cout) MXU dot
    instead of ``rows`` small ones — measured 0.469→0.411 ms (k=5) /
    0.600→0.524 ms (k=7) at (64, 304, 512) on v5e (the per-row variant
    drains the MXU pipeline at M=N=512, K=304)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    cin = xp_ref.shape[2]
    cout = g_ref.shape[2]
    g2 = g_ref[:].reshape(rows * t, cout)
    for j in range(k):
        a = xp_ref[:, j * dilation: j * dilation + t, :] \
            .reshape(rows * t, cin)
        dw_ref[j * cin:(j + 1) * cin, :] += jax.lax.dot_general(
            a, g2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _fwd_kernel(xp_ref, w_ref, y_ref, *, k, dilation, t, rows):
    """Read-once forward: all k shifts of the padded input contract
    against the stacked weights from one VMEM tile (the exact mirror of
    ``_dx_kernel`` with unflipped weights and the (Cin) axis contracted).
    Row-folded like ``_dw_kernel``: one (rows·T, Cin)(Cin, Cout) dot per
    shift."""
    cin = xp_ref.shape[2]
    cout = y_ref.shape[2]
    acc = None
    for j in range(k):
        a = xp_ref[:, j * dilation: j * dilation + t, :] \
            .reshape(rows * t, cin)
        wj = w_ref[j * cin:(j + 1) * cin, :]                # (Cin, Cout)
        term = jnp.dot(a, wj, preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    y_ref[:] = acc.reshape(rows, t, cout).astype(y_ref.dtype)


def _pallas_fwd(xp, w2d, k, dilation, t, out_dtype, interpret=False):
    b, tp, cin = xp.shape
    cout = w2d.shape[1]
    kern = functools.partial(_fwd_kernel, k=k, dilation=dilation, t=t,
                             rows=_ROWS)
    return pl.pallas_call(
        kern,
        grid=(b // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, tp, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, t, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((b, t, cout), out_dtype, xp, w2d),
        compiler_params=pltpu.CompilerParams(
            # batch blocks are independent: let Mosaic pipeline grid steps
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * cin * cout * k,
            bytes_accessed=xp.size * 2 + w2d.size * 2 + b * t * cout * 2,
            transcendentals=0),
        interpret=_interp(interpret),
    )(xp, w2d)


def _dx_kernel(gp_ref, w_ref, dx_ref, *, k, dilation, t, rows):
    """Row-folded like ``_dw_kernel``: one (rows·T, Cout)(Cout, Cin) dot
    per shift against the flipped weights."""
    cin = dx_ref.shape[2]
    cout = gp_ref.shape[2]
    acc = None
    for j in range(k):
        g = gp_ref[:, j * dilation: j * dilation + t, :] \
            .reshape(rows * t, cout)
        wj = w_ref[(k - 1 - j) * cin:(k - j) * cin, :]      # (Cin, Cout)
        term = jax.lax.dot_general(
            g, wj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (rows·T, Cin)
        acc = term if acc is None else acc + term
    dx_ref[:] = acc.reshape(rows, t, cin).astype(dx_ref.dtype)


def _interp(flag):
    """Interpret-mode selector: the TPU-emulating interpreter handles
    vma-annotated operands inside shard_map (the plain HLO interpreter
    does not)."""
    return pltpu.InterpretParams() if flag else False


def _out_struct(shape, dtype, *like):
    """Output aval for pallas_call that survives vma checking inside
    shard_map: both kernels produce per-shard (varying) values, so the
    outputs vary over the union of the inputs' mesh axes."""
    vma = frozenset().union(*(jax.typeof(a).vma for a in like))
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _pallas_dw(xp, g, k, dilation, interpret=False):
    b, tp, cin = xp.shape
    t, cout = g.shape[1], g.shape[2]
    kern = functools.partial(_dw_kernel, k=k, dilation=dilation, t=t,
                             rows=_ROWS)
    return pl.pallas_call(
        kern,
        grid=(b // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, tp, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, t, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * cin, cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((k * cin, cout), jnp.float32, xp, g),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * cin * cout * k,
            bytes_accessed=xp.size * 2 + g.size * 2 + k * cin * cout * 4,
            transcendentals=0),
        interpret=_interp(interpret),
    )(xp, g)


def _pallas_dx(gp, w2d, k, dilation, t, out_dtype, interpret=False):
    b, tp, cout = gp.shape
    cin = w2d.shape[0] // k
    kern = functools.partial(_dx_kernel, k=k, dilation=dilation, t=t,
                             rows=_ROWS)
    return pl.pallas_call(
        kern,
        grid=(b // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, tp, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, t, cin), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((b, t, cin), out_dtype, gp, w2d),
        compiler_params=pltpu.CompilerParams(
            # batch blocks are independent: let Mosaic pipeline grid steps
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * cin * cout * k,
            bytes_accessed=gp.size * 2 + w2d.size * 2 + b * t * cin * 2,
            transcendentals=0),
        interpret=_interp(interpret),
    )(gp, w2d)


def pallas_bwd_supported(x_shape, w_shape, dilation) -> bool:
    """Wide, aligned shapes only: lanes need C ≡ 0 (mod 128), sublanes
    T ≡ 0 (mod 16) (bf16 tile), batch divisible by the row-block, and the
    max shift must fit the fixed time padding."""
    b, t, _ = x_shape
    k, cin, cout = w_shape
    return (k > 1 and cin % 128 == 0 and cout % 128 == 0
            and t % 16 == 0 and b % _ROWS == 0
            and (k - 1) * dilation <= _TPAD)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv1d_same_fused_bwd(x, w, dilation, interpret=False):
    """(B, T, Cin) ⊛ (K, Cin, Cout) SAME conv; Pallas fused-read forward
    (reads x once instead of k times — the shifted-dot lowering re-reads
    the full activation per shift, and at (64, 304, 512) shapes the conv
    is HBM-bound, not MXU-bound) and Pallas fused-read backward.  Forward
    accumulates all k shift contractions in f32 and rounds once, strictly
    tighter than the per-dot rounding of the shifted-dot lowering.

    In interpret mode (the CPU test meshes) the forward stays the
    bit-identical shifted-dot lowering: the strict shard_map-vs-GSPMD
    parity tests compare one-step Adam updates, which amplify even
    ulp-level forward differences between the interpreted kernel and the
    XLA dot into O(lr) parameter deltas.  ``_pallas_fwd`` has its own
    interpret-mode parity test."""
    if interpret:
        return _fwd_shifted_dots(x, w, dilation, x.shape[1])
    k = w.shape[0]
    t = x.shape[1]
    left = (k - 1) // 2 * dilation
    xp = jnp.pad(x, ((0, 0), (left, _TPAD - left), (0, 0)))
    w2d = w.reshape(k * w.shape[1], w.shape[2])
    return _pallas_fwd(xp, w2d, k, dilation, t, x.dtype, interpret)


def _fused_fwd(x, w, dilation, interpret):
    return conv1d_same_fused_bwd(x, w, dilation, interpret), (x, w)


def _fused_bwd(dilation, interpret, res, g):
    x, w = res
    k = w.shape[0]
    t = x.shape[1]
    left = (k - 1) // 2 * dilation
    right = (k - 1) * dilation - left
    g = g.astype(w.dtype)
    xp = jnp.pad(x, ((0, 0), (left, _TPAD - left), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (right, _TPAD - right), (0, 0)))
    w2d = w.reshape(k * w.shape[1], w.shape[2])
    dw = _pallas_dw(xp, g, k, dilation, interpret)
    dx = _pallas_dx(gp, w2d, k, dilation, t, x.dtype, interpret)
    return dx, dw.reshape(w.shape).astype(w.dtype)


conv1d_same_fused_bwd.defvjp(_fused_fwd, _fused_bwd)
