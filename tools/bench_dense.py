"""Measure the dense (mask-free) block-step fast path vs the masked step
at the bench working point on the real chip.  Full batches only — both
programs compute the same updates (tests/test_trainer.py asserts
equality); this measures the cost of the mask machinery itself.

Thin driver over bench.py's `_measure_train_step` (the single honest-
timing harness; see memory: tpu-benchmarking-pitfalls)."""

import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    from xvector_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import bench

    out = {"device": jax.devices()[0].device_kind}
    for dense in (False, True):
        ms, compile_s, loss = bench._measure_train_step(
            jax, jnp, "no_dropout", rounds=5, dense=dense,
            return_detail=True)
        key = "dense" if dense else "masked"
        out[f"step_ms_{key}"] = round(ms * 1e3, 4)
        out[f"compile_s_{key}"] = round(compile_s, 1)
        out[f"loss_{key}"] = loss
    out["gain_pct"] = round(100.0 * (out["step_ms_masked"]
                                     - out["step_ms_dense"])
                            / out["step_ms_masked"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
