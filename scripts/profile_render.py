"""Profile the validation/eval render chunk on the live TPU
(16384 rays, 64 coarse + 128 fine merged samples, inference kernels).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_render.py
"""

from __future__ import annotations

import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from nerfmeshes_tpu.config import get_default_cfg
from nerfmeshes_tpu.train.step import make_render_chunk
from nerfmeshes_tpu.train.system import create_models, init_params
from nerfmeshes_tpu.utils.profiling import summarize_trace, trace


def main() -> None:
    cfg = get_default_cfg()
    cfg.experiment.compute_dtype = "bfloat16"

    coarse, fine = create_models(cfg)
    params = init_params(cfg, coarse, fine, jax.random.key(0))
    render_chunk = make_render_chunk(cfg, coarse, fine)

    R = 16384
    rng = np.random.default_rng(0)
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((R, 3))
    d = jnp.asarray(d)

    cb, fb = render_chunk(params, o, d, 2.0, 6.0)
    jax.block_until_ready(fb.rgb_map)
    t0 = time.time()
    for _ in range(10):
        cb, fb = render_chunk(params, o, d, 2.0, 6.0)
    jax.block_until_ready(fb.rgb_map)
    per_call_ms = (time.time() - t0) / 10 * 1000
    print(f"per-chunk: {per_call_ms:.2f} ms  ({R/per_call_ms*1000:.0f} rays/s)")

    logdir = tempfile.mkdtemp(prefix="rendertrace_")
    with trace(logdir):
        cb, fb = render_chunk(params, o, d, 2.0, 6.0)
        jax.block_until_ready(fb.rgb_map)

    total = 0.0
    for name, ms in summarize_trace(logdir, top=30):
        total += ms
        print(f"{ms:9.3f} ms  {name}")
    print(f"device total: {total:.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
