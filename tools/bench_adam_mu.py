"""Measure the landed-but-unmeasured perf knob: bf16 Adam first moment.

Times the production block train step (flagship no_dropout, recipe
working point, identical to bench.py) with ``optax.adam`` mu_dtype
float32 vs bfloat16 on the real chip.  Prints one JSON line with both
step times so DESIGN.md can carry a measured keep-or-reject.

Honest-timing rules (see memory: tpu-benchmarking-pitfalls): block-scan
chains 16 minibatches per dispatch, sync by pulling a scalar to host,
best-of-rounds steady state, one TPU process at a time.
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

NUM_SPEAKERS = 7185
MINIBATCH = 64
FRAMES = 304
FEAT_DIM = 23


def measure(mu_dtype: str, rounds: int = 5, blocks: int = 8) -> float:
    import jax
    import jax.numpy as jnp
    import optax
    from xvector_tpu.models import tdnn
    from xvector_tpu.train.trainer import TrainConfig, make_block_train_step

    block = 16
    cfg = TrainConfig(model="no_dropout", num_targets=NUM_SPEAKERS,
                      compute_dtype="bfloat16", block_size=block,
                      adam_moments_dtype=mu_dtype,
                      fused_conv_bwd=jax.default_backend() == "tpu")
    model_cfg = tdnn.MODEL_ZOO["no_dropout"]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), model_cfg,
                                     NUM_SPEAKERS)
    base = optax.adam if mu_dtype == "float32" else functools.partial(
        optax.adam, mu_dtype=jnp.dtype(mu_dtype))
    opt = optax.inject_hyperparams(base)(learning_rate=1e-3)
    opt_state = opt.init(params)
    step = make_block_train_step(model_cfg, cfg, opt)

    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(block, MINIBATCH, FRAMES, FEAT_DIM)
                     .astype(np.float16))
    ys = jnp.asarray(rng.randint(0, NUM_SPEAKERS, (block, MINIBATCH))
                     .astype(np.int32))
    args = (jnp.full((block,), FRAMES, jnp.int32),
            jnp.full((block,), MINIBATCH, jnp.int32),
            jnp.float32(1e-3), jnp.float32(1.0), jnp.float32(1.0),
            jax.random.PRNGKey(1))
    t0 = time.perf_counter()
    params, opt_state, state, m = step(params, opt_state, state, xs, ys,
                                       *args)
    np.asarray(m["loss"])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(blocks):
            params, opt_state, state, m = step(params, opt_state, state,
                                               xs, ys, *args)
        np.asarray(m["loss"])
        best = min(best, (time.perf_counter() - t0) / (blocks * block))
    return best * 1e3, compile_s


def main():
    from xvector_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    out = {"device": jax.devices()[0].device_kind}
    for mu in ("float32", "bfloat16"):
        ms, compile_s = measure(mu)
        out[f"step_ms_mu_{mu}"] = round(ms, 4)
        out[f"compile_s_mu_{mu}"] = round(compile_s, 1)
    out["delta_pct"] = round(100.0 * (out["step_ms_mu_float32"]
                                      - out["step_ms_mu_bfloat16"])
                             / out["step_ms_mu_float32"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
