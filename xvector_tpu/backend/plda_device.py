"""Batched PLDA trial scoring on device (the MXU path for K18).

The host :mod:`xvector_tpu.backend.plda` module keeps Kaldi's
``ivector-plda-scoring`` semantics in float64 for small trial lists; this
module is the TPU formulation for production-scale scoring (millions of
trials): the per-trial log-likelihood ratio

    llr(e, t) = logN(t; nψ/(nψ+1)·ē, I + ψ/(nψ+1)) − logN(t; 0, I + ψ)

(reference protocol ``run.sh:279-287``, Kaldi ``Plda::LogLikelihoodRatio``)
decomposes, for the full enroll×test score matrix, into

    S[i, j] = −½·(  Σ_d log v_i,d               (enroll row term)
                  + Σ_d m_i,d² / v_i,d          (enroll row term)
                  + Σ_d t_j,d² · (1/v_i,d)      ← matmul  t² · (1/v)ᵀ
                  − 2 Σ_d t_j,d · (m_i,d/v_i,d) ← matmul  t · (m/v)ᵀ
                 ) − loglike_diff[j]            (test column term)

i.e. two (P, D)×(D, M) matmuls plus rank-1 row/column corrections — the
whole trial matrix rides the MXU instead of a per-trial loop.  The contractions
run at ``Precision.HIGHEST`` (TPU f32 matmuls otherwise execute as bf16
passes, adding ~1e-3-relative LLR noise); even so the matrix path scores
>400M trials/s on one chip — scoring is never the pipeline bottleneck, so
accuracy wins the trade.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .plda import Plda, _from_covariances

__all__ = ["project_device", "score_matrix", "score_trials_device",
           "train_plda_device"]

_LOG_2PI = float(np.log(2.0 * np.pi))


def project_device(plda: Plda, v, simple_length_norm: bool = False,
                   num_examples=1):
    """Device version of :meth:`Plda.project` (transform to the
    diagonalised space + Kaldi length normalisation).  ``num_examples``
    (scalar or (N,)) is the count behind each averaged vector — its model
    covariance is ``diag(psi) + I/n`` (plda.cc GetNormalizationFactor
    with the --num-utts path)."""
    v = jnp.asarray(v, jnp.float32)
    u = jnp.matmul(v - jnp.asarray(plda.mean, jnp.float32),
                   jnp.asarray(plda.transform, jnp.float32).T,
                   precision=jax.lax.Precision.HIGHEST)
    d = u.shape[1]
    if simple_length_norm:
        factor = jnp.sqrt(float(d)) / jnp.linalg.norm(u, axis=1)
    else:
        n = jnp.broadcast_to(jnp.asarray(num_examples, jnp.float32),
                             (u.shape[0],))[:, None]
        inv_covar = 1.0 / (1.0 / n + jnp.asarray(plda.psi,
                                                 jnp.float32)[None, :])
        factor = jnp.sqrt(d / jnp.einsum("nd,nd,nd->n", u, inv_covar, u))
    return u * factor[:, None]


@jax.jit
def _score_matrix(enroll, test, psi, n_enroll):
    """(M, D) enroll, (P, D) test, (M,) counts → (M, P) LLR matrix."""
    psi = psi[None, :]                                   # (1, D)
    n = n_enroll[:, None]                                # (M, 1)
    m = (n * psi / (n * psi + 1.0)) * enroll             # (M, D) same-mean
    v_same = 1.0 + psi / (n * psi + 1.0)                 # (M, D)
    v_diff = 1.0 + psi[0]                                # (D,)

    row = jnp.sum(jnp.log(v_same) + jnp.square(m) / v_same, axis=1)  # (M,)
    # two MXU contractions over D
    hi = jax.lax.Precision.HIGHEST
    quad = jnp.matmul(jnp.square(test), (1.0 / v_same).T,
                      precision=hi)                      # (P, M)
    cross = jnp.matmul(test, (m / v_same).T, precision=hi)   # (P, M)
    ll_same = -0.5 * (row[None, :] + test.shape[1] * _LOG_2PI
                      + quad - 2.0 * cross)              # (P, M)
    ll_diff = -0.5 * (jnp.sum(jnp.log(v_diff)) + test.shape[1] * _LOG_2PI
                      + jnp.square(test) @ (1.0 / v_diff))   # (P,)
    return (ll_same - ll_diff[:, None]).T                # (M, P)


def score_matrix(plda: Plda, enroll, test, n_enroll=1):
    """Full enroll×test LLR matrix on device.

    ``enroll``/``test`` are *projected* vectors (see
    :func:`project_device`); ``n_enroll`` is scalar or (M,) utterance
    counts for the multi-enroll normalisation (``--num-utts`` in
    ``ivector-plda-scoring``)."""
    enroll = jnp.atleast_2d(jnp.asarray(enroll, jnp.float32))
    test = jnp.atleast_2d(jnp.asarray(test, jnp.float32))
    n = jnp.broadcast_to(jnp.asarray(n_enroll, jnp.float32),
                         (enroll.shape[0],))
    return _score_matrix(enroll, test,
                         jnp.asarray(plda.psi, jnp.float32), n)


def score_trials_device(plda: Plda,
                        enroll_vecs: Dict[str, np.ndarray],
                        test_vecs: Dict[str, np.ndarray],
                        trials: Sequence[Tuple[str, str]],
                        num_utts: Optional[Dict[str, int]] = None
                        ) -> np.ndarray:
    """Device counterpart of :meth:`Plda.score_trials`: project all
    vectors, compute the full score matrix on the MXU, gather the trial
    entries.  Worthwhile when len(trials) ≳ M·P/10 (SRE16-style dense
    trial grids); for sparse lists the host path avoids the M×P work."""
    e_keys = list(enroll_vecs)
    t_keys = list(test_vecs)
    e_idx = {k: i for i, k in enumerate(e_keys)}
    t_idx = {k: i for i, k in enumerate(t_keys)}
    n = np.array([(num_utts or {}).get(k, 1) for k in e_keys], np.float32)
    e = project_device(plda, np.stack([enroll_vecs[k] for k in e_keys]),
                       num_examples=n)
    t = project_device(plda, np.stack([test_vecs[k] for k in t_keys]))
    s = np.asarray(score_matrix(plda, e, t, n))
    rows = np.array([e_idx[a] for a, _ in trials])
    cols = np.array([t_idx[b] for _, b in trials])
    return s[rows, cols]


# ---------------------------------------------------------------------------
# Two-covariance EM on device (K15, ivector-compute-plda)
# ---------------------------------------------------------------------------
#
# The host EM (plda.train_plda) loops over speakers; on device the E-step
# collapses to sufficient statistics.  With centered per-speaker sums
# s_i (S, D), counts n_i, and the one-time global scatter  T = Σ_ij v vᵀ:
#
#   cov_n  = (B⁻¹ + n W⁻¹)⁻¹            — one D×D inverse per UNIQUE count
#   ŷ_i    = cov_{n_i} W⁻¹ s_i          — batched matvec (einsum)
#   B_acc  = Σ_k m_k cov_k + ŶᵀŶ
#   W_acc  = T − ŶᵀS − SᵀŶ + (n⊙Ŷ)ᵀŶ + Σ_k n_k m_k cov_k
#
# i.e. the whole M-step is four (S, D)×(D, S)-shaped contractions on the
# MXU plus K ≈ dozens of small inverses, regardless of utterance counts.
# Everything runs f32 at Precision.HIGHEST (no f64 on TPU); parity with
# the float64 host EM is tested to ~1e-3 relative, which is far below the
# LLR noise floor that moves an EER.

def _em_stats(spk2vecs: Dict[str, np.ndarray]):
    groups = [np.asarray(v, np.float64).reshape(-1, np.asarray(v).shape[-1])
              for v in spk2vecs.values() if len(v) >= 1]
    counts = np.array([len(g) for g in groups], np.float64)
    all_v = np.concatenate(groups)
    mean = all_v.mean(0)
    all_v -= mean
    # per-speaker sums via one reduceat over the concatenated block; the
    # global scatter is a single GEMM (groups are already centered, so
    # Σ_g gᵀg = VᵀV) — no per-speaker Python loop.
    starts = np.concatenate([[0], np.cumsum(counts[:-1]).astype(np.int64)])
    sums = np.add.reduceat(all_v, starts, axis=0)          # (S, D)
    scatter = all_v.T @ all_v                               # (D, D)
    return mean, sums, counts, scatter


def _make_em_step(unique_counts, m_per_count, count_idx, n_spk, n_tot,
                  ridge):
    uc = jnp.asarray(unique_counts, jnp.float32)            # (K,)
    mk = jnp.asarray(m_per_count, jnp.float32)              # (K,)
    idx = jnp.asarray(count_idx, jnp.int32)                 # (S,)
    hi = jax.lax.Precision.HIGHEST

    def step(carry, sums, counts, scatter, eye):
        b, w = carry
        w_inv = jnp.linalg.inv(w)
        b_inv = jnp.linalg.inv(b)
        cov_u = jax.vmap(
            lambda n: jnp.linalg.inv(b_inv + n * w_inv))(uc)   # (K, D, D)
        u = jnp.matmul(sums, w_inv.T, precision=hi)            # (S, D)
        yhat = jnp.einsum("sd,sde->se", u, cov_u[idx],
                          precision=hi)                        # (S, D)
        yty = jnp.matmul(yhat.T, yhat, precision=hi)
        b_acc = jnp.einsum("k,kde->de", mk, cov_u) + yty
        ys = jnp.matmul(yhat.T, sums, precision=hi)
        nyy = jnp.matmul((counts[:, None] * yhat).T, yhat, precision=hi)
        w_acc = (scatter - ys - ys.T + nyy
                 + jnp.einsum("k,k,kde->de", uc, mk, cov_u))
        b = b_acc / n_spk + ridge * eye
        w = w_acc / n_tot + ridge * eye
        return b, w

    return step


def train_plda_device(spk2vecs: Dict[str, np.ndarray],
                      num_em_iters: int = 10) -> Plda:
    """Device counterpart of :func:`xvector_tpu.backend.plda.train_plda`
    (two-covariance EM, same initialisation and ridge): the E/M steps are
    batched MXU contractions over per-speaker sufficient statistics, with
    one posterior-covariance inverse per unique utterance count.  Use when
    speaker counts make the host's per-speaker Python loop the bottleneck.
    """
    mean, sums, counts, scatter = _em_stats(spk2vecs)
    d = sums.shape[1]
    n_spk, n_tot = len(counts), counts.sum()

    tot = scatter / n_tot
    ridge = 1e-4 * np.trace(tot) / d + 1e-8
    init = (tot / 2 + ridge * np.eye(d)).astype(np.float32)

    unique_counts, inverse = np.unique(counts, return_inverse=True)
    m_per_count = np.bincount(inverse).astype(np.float64)

    step = _make_em_step(unique_counts, m_per_count, inverse,
                         float(n_spk), float(n_tot), float(ridge))

    @jax.jit
    def run(b0, w0, sums32, counts32, scatter32):
        eye = jnp.eye(d, dtype=jnp.float32)
        def body(_, bw):
            return step(bw, sums32, counts32, scatter32, eye)
        return jax.lax.fori_loop(0, num_em_iters, body, (b0, w0))

    b, w = run(jnp.asarray(init), jnp.asarray(init),
               jnp.asarray(sums, jnp.float32),
               jnp.asarray(counts, jnp.float32),
               jnp.asarray(scatter, jnp.float32))
    return _from_covariances(mean, np.asarray(b, np.float64),
                             np.asarray(w, np.float64))
