"""Measure the bf16-Adam-first-moment knob (`adam_moments_dtype`) on the
production block step (dense twin — what the trainer dispatches for full
blocks) at the bench working point.

Thin driver over bench.py's `_measure_train_step`.  History: the round-4
verdict (-0.38%, rejected) was first measured on the MASKED program;
this driver now measures on the dense program so the verdict tracks what
production actually runs.
"""

import functools
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    from xvector_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    import bench

    out = {"device": jax.devices()[0].device_kind}
    for mu in ("float32", "bfloat16"):
        base = (optax.adam if mu == "float32" else functools.partial(
            optax.adam, mu_dtype=jnp.dtype(mu)))
        factory = functools.partial(
            optax.inject_hyperparams(base), learning_rate=1e-3)
        ms, compile_s, _ = bench._measure_train_step(
            jax, jnp, "no_dropout", rounds=5,
            optimizer_factory=lambda f=factory: f(), return_detail=True)
        out[f"step_ms_mu_{mu}"] = round(ms * 1e3, 4)
        out[f"compile_s_mu_{mu}"] = round(compile_s, 1)
    out["delta_pct"] = round(100.0 * (out["step_ms_mu_float32"]
                                      - out["step_ms_mu_bfloat16"])
                             / out["step_ms_mu_float32"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
