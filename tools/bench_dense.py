"""Measure the dense (mask-free) block-step fast path vs the masked step
at the bench working point on the real chip.  Full batches only — both
programs compute the same updates (tests/test_trainer.py asserts
equality); this measures the cost of the mask machinery itself."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

NUM_SPEAKERS = 7185
MINIBATCH = 64
FRAMES = 304
FEAT_DIM = 23


def measure(dense: bool, rounds: int = 5, blocks: int = 8):
    import jax
    import jax.numpy as jnp
    import optax
    from xvector_tpu.models import tdnn
    from xvector_tpu.train.trainer import TrainConfig, make_block_train_step

    block = 16
    cfg = TrainConfig(model="no_dropout", num_targets=NUM_SPEAKERS,
                      compute_dtype="bfloat16", block_size=block,
                      fused_conv_bwd=jax.default_backend() == "tpu")
    model_cfg = tdnn.MODEL_ZOO["no_dropout"]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), model_cfg,
                                     NUM_SPEAKERS)
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    opt_state = opt.init(params)
    step = make_block_train_step(model_cfg, cfg, opt, dense=dense)

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
    return best * 1e3, compile_s, float(np.asarray(m["loss"]))


def main():
    from xvector_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    out = {"device": jax.devices()[0].device_kind}
    for dense in (False, True):
        ms, compile_s, loss = measure(dense)
        key = "dense" if dense else "masked"
        out[f"step_ms_{key}"] = round(ms, 4)
        out[f"compile_s_{key}"] = round(compile_s, 1)
        out[f"loss_{key}"] = loss
    out["gain_pct"] = round(100.0 * (out["step_ms_masked"]
                                     - out["step_ms_dense"])
                            / out["step_ms_masked"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
