"""Benchmark: Mrays/s/chip forward+backward on the Cornell box (BASELINE config 3).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload: Cornell box 512x512, 64 spp total, differentiable render — each spp
chunk computes the L2-loss gradient w.r.t. the material/texture parameter
pytree (fwd+bwd through the wavefront path tracer).  "rays" follows the
reference's counting (rays_per_pixel = spp, `render.h:35-38`): one camera
sample = one ray, so Mrays/s = pixels * spp / seconds / 1e6.

The reference publishes no absolute numbers (BASELINE.md: published == {}), so
vs_baseline is reported against the round-1 recorded value once one exists.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from raytracing_gpu_tpu.core.config import RenderSettings
from raytracing_gpu_tpu.engine import diff
from raytracing_gpu_tpu.engine.fused_diff import compile_fused_param_renderer
from raytracing_gpu_tpu.models import scenes

# Round-1 recorded value (TPU v5e, 2026-08-18) for relative tracking.
BASELINE_MRAYS = 28.4

WIDTH = 512
SPP_TOTAL = 64
SPP_PER_CHUNK = 8
MAX_DEPTH = 8
RAY_BATCH = 65536


def main() -> None:
    sd = scenes.get("cornell_box")
    settings = RenderSettings(
        image_width=WIDTH, aspect_ratio=1.0, spp_per_chunk=SPP_PER_CHUNK,
        num_chunks=SPP_TOTAL // SPP_PER_CHUNK, max_depth=MAX_DEPTH,
        ray_batch=RAY_BATCH,
    )
    key = jax.random.PRNGKey(1984)

    # geometry baked as XLA constants; params traced (7x faster than
    # passing the whole scene as an argument — see engine/render.py).
    # The chunk's VJP is hand-scheduled (engine/fused_diff.py): walk kernel +
    # closed-form adjoint chains, no XLA-AD residual machinery.
    param_chunk = compile_fused_param_renderer(sd.scene, sd.camera, settings)
    params = diff.get_params(sd.scene)
    target = jnp.zeros_like(param_chunk(params, key))

    @jax.jit
    def fwd_bwd(params, chunk_key):
        def loss_fn(p):
            return jnp.mean((param_chunk(p, chunk_key) - target) ** 2)
        return jax.value_and_grad(loss_fn)(params)

    # warmup / compile (fold_in compiles its own tiny program — pre-fold the
    # chunk keys so the timed region measures only the render fwd+bwd)
    chunk_keys = [jax.random.fold_in(key, c) for c in range(settings.num_chunks)]
    jax.block_until_ready(chunk_keys)
    loss, grads = fwd_bwd(params, chunk_keys[0])
    jax.block_until_ready(grads)

    t0 = time.perf_counter()
    for ck in chunk_keys:
        loss, grads = fwd_bwd(params, ck)
    jax.block_until_ready(grads)
    dt = time.perf_counter() - t0

    rays = WIDTH * WIDTH * SPP_TOTAL
    mrays = rays / dt / 1e6
    print(json.dumps({
        "metric": "Mrays/s/chip fwd+bwd (Cornell box 512^2, 64spp, depth 8)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": (round(mrays / BASELINE_MRAYS, 3)
                        if BASELINE_MRAYS else None),
    }))


if __name__ == "__main__":
    main()
