"""Extraction bucket-shape sweep (round-5 VERDICT #8): bench_extract has
reported ~17.5k emb/s at (b=32, t=1024) for four rounds — confirm or
refute that the shape is optimal by sweeping batch width and chunk length
with the same scan-amortized harness.  Writes docs/extract_sweep_r05.json."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

FEAT_DIM = 23


def measure(jax, jnp, b, t, n=10, calls=8):
    from xvector_tpu.models import tdnn
    model_cfg = tdnn.MODEL_ZOO["no_dropout"]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), model_cfg, 512)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, FEAT_DIM).astype(np.float32))
    mask = jnp.ones((b, t), jnp.float32)

    @jax.jit
    def fwd_n(x):
        def body(c, _):
            xv = tdnn.extract_xvector(model_cfg, params, state, c, mask,
                                      compute_dtype=jnp.bfloat16)
            return c + 1e-6 * xv[:, None, :FEAT_DIM], xv[0, 0]
        c, outs = jax.lax.scan(body, x, None, length=n)
        return outs

    np.asarray(fwd_n(x))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = fwd_n(x)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / (n * calls))
    return b / best, b * t * 0.01 / best   # emb/s, audio_s/s


def main():
    import jax
    import jax.numpy as jnp
    from xvector_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    out = {"device": str(jax.devices()[0]), "rows": []}
    for b, t in [(16, 1024), (32, 1024), (64, 1024), (128, 1024),
                 (256, 1024), (32, 512), (64, 512), (128, 512), (256, 512),
                 (128, 2048), (64, 2048)]:
        emb_s, audio_s = measure(jax, jnp, b, t)
        row = {"batch": b, "frames": t, "emb_per_s": round(emb_s, 1),
               "audio_s_per_s": round(audio_s, 1)}
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "docs", "extract_sweep_r05.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
