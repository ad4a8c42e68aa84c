"""Speed-of-light measurements for the megakernel + differentiable path.

Answers "what could this chip do?" (VERDICT r2 missing #2): measures the
achievable hardware ceilings the path tracer can be bound by —

  * VPU f32 throughput (chained FMAs on VMEM-resident tiles; the walk is
    elementwise vector math, the MXU never enters it),
  * HBM bandwidth (serial read+write chain over a 256 MB array),
  * MXU bf16 matmul (sanity anchor against the v5e spec sheet),

then times each phase of the north-star workload (Cornell 512^2, depth 8,
fwd+bwd w.r.t. the texture/material params) so docs/PERF.md can state what
fraction of light each phase achieves.  Emits one JSON line per measurement.

Timing methodology (this matters on the remote-TPU tunnel): a dispatch is
~us but a synchronizing scalar fetch costs ~30 ms RPC, and
`block_until_ready` does NOT reliably wait for device completion through the
tunnel.  Every measurement therefore loops its reps INSIDE one jitted
program (`lax.fori_loop`), returns an on-device scalar, and reports
(t(R2) - t(R1)) / (R2 - R1) so the constant dispatch+fetch overhead cancels.
Verified against known silicon: 4096^3 bf16 matmul measures 178 TFLOP/s
(v5e spec 197), the HBM chain 633 GB/s (spec 819).

Run on the bench TPU:  python tools/roofline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _timed_scalar(f, *args) -> float:
    """Best-of-2 wall time of one jit call including the scalar fetch."""
    float(f(*args))  # compile + settle
    t0 = time.perf_counter()
    float(f(*args))
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(*args))
    return min(dt, time.perf_counter() - t0)


def per_rep(build, args, r1: int, r2: int) -> float:
    """Per-iteration device time via two in-jit rep counts (overhead cancels)."""
    return (_timed_scalar(build(r2), *args)
            - _timed_scalar(build(r1), *args)) / (r2 - r1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    return kw


def bench_hbm_bw() -> float:
    """Serial read+write chain over 256 MB: x <- x*a + b per iteration."""
    x0 = jnp.arange(64 * 2**20, dtype=jnp.float32)

    def build(R):
        @jax.jit
        def f(x):
            return jax.lax.fori_loop(
                0, R, lambda i, x: x * 0.999999 + 1e-7, x)[0]
        return f

    dt = per_rep(build, (x0,), 4, 36)
    gbs = 2 * x0.size * 4 / dt / 1e9
    emit(measure="hbm_rw_chain", gb_per_s=round(gbs, 1), seconds_per_iter=dt)
    return gbs


def bench_mxu() -> float:
    """Chained 4096^3 bf16 matmuls — anchor vs the v5e 197 TFLOP/s spec."""
    a0 = jnp.full((4096, 4096), 0.001, jnp.bfloat16)

    def build(R):
        @jax.jit
        def f(a):
            return jnp.sum(jax.lax.fori_loop(
                0, R, lambda i, y: (y @ a) * 0.5, a))
        return f

    dt = per_rep(build, (a0,), 2, 18)
    tf = 2 * 4096**3 / dt / 1e12
    emit(measure="mxu_bf16_matmul", tflops=round(tf, 1), seconds_per_iter=dt)
    return tf


def bench_vpu_fma() -> float:
    """Chained f32 FMAs on a VMEM-resident tile inside one Pallas kernel.

    Serial dependence x = x*a + b; the kernel grid re-runs the chain per
    tile.  Reports FLOP/s = 2 * K * elements / t.
    """
    SUB, LANES, TILES = 256, 128, 64
    x0 = jnp.full((SUB * TILES, LANES), 1e-3, jnp.float32)
    spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def build(K):
        def kernel(x_ref, o_ref):
            x = x_ref[...]
            a = x * 0.5 + 0.25
            b = x * 0.125 + 0.5
            x = jax.lax.fori_loop(
                0, K, lambda i, x: x * a + b, x)
            o_ref[...] = x

        @jax.jit
        def f(x):
            return pl.pallas_call(
                kernel, grid=(TILES,), in_specs=[spec], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)[0, 0]
        return f

    dt = per_rep(build, (x0,), 64, 576)  # per-FMA-step time over the array
    flops = 2 * x0.size / dt / 1e12
    emit(measure="vpu_f32_fma_chain", tflops=round(flops, 3),
         seconds_per_step=dt)
    return flops


def bench_north_star_phases():
    """Per-phase device time for the Cornell fwd+bwd step at bench shape."""
    from raytracing_gpu_tpu.core.config import RenderSettings
    from raytracing_gpu_tpu.engine import diff
    from raytracing_gpu_tpu.engine.integrator import shade_packed
    from raytracing_gpu_tpu.engine.render import (compile_param_renderer,
                                                  compile_renderer)
    from raytracing_gpu_tpu.models import scenes
    from raytracing_gpu_tpu.ops import pallas_trace

    sd = scenes.get("cornell_box")
    N, D = 65536, 8
    key = jax.random.PRNGKey(0)
    # real camera rays: one 65536-ray wave of the 512^2 bench frame (the
    # first quarter of the image) — coherence matters for the packet walk
    flat = jnp.arange(N, dtype=jnp.int32)
    r_pix, c_pix = flat // 512, flat % 512
    u = (c_pix.astype(jnp.float32) + 0.5) / 511.0
    v = ((511 - r_pix).astype(jnp.float32) + 0.5) / 511.0
    o, d, tm = sd.camera.get_rays(jax.random.PRNGKey(2), u, v)
    o, d, tm = jax.block_until_ready((o, d, tm))
    tracer = pallas_trace.PallasTracer(sd.scene)
    params = diff.get_params(sd.scene)
    scene = sd.scene

    def loop_scalar(body, r1=4, r2=36):
        """R reps of body(i) -> scalar, summed, inside one jit."""
        def build(R):
            @jax.jit
            def f(acc):
                return jax.lax.fori_loop(
                    0, R, lambda i, a: a + body(i), acc)
            return f
        return per_rep(build, (jnp.float32(0.0),), r1, r2)

    # A: forward megakernel (radiance fully in-kernel)
    dt = loop_scalar(lambda i: jnp.sum(
        tracer(None, o, d, tm, jax.random.fold_in(key, i), max_depth=D)))
    emit(measure="walk_forward_kernel", n_rays=N, depth=D, seconds=dt,
         mrays_per_s=round(N / dt / 1e6, 1))

    # B: record-mode walk (packed plane out)
    dt = loop_scalar(lambda i: jnp.sum(tracer.walk_packed(
        o, d, tm, jax.random.fold_in(key, i), max_depth=D)[0]).astype(
            jnp.float32))
    emit(measure="walk_record_kernel", n_rays=N, depth=D, seconds=dt,
         mrays_per_s=round(N / dt / 1e6, 1))

    planes = tracer.walk_packed(o, d, tm, key, max_depth=D)

    def shade_fwd(p, s):
        sc = diff.set_params(scene, p)
        # s-dependent tweak so the loop body cannot be hoisted as constant
        pl0 = (planes[0] ^ (s.astype(jnp.int32) & 0),) + planes[1:]
        return shade_packed(sc, *pl0, need_p=tracer.need_p,
                            need_uv=tracer.need_uv)

    # C: XLA shade forward
    dt = loop_scalar(lambda i: jnp.sum(shade_fwd(params, i)))
    emit(measure="xla_shade_forward", n_rays=N, depth=D, seconds=dt,
         mrays_per_s=round(N / dt / 1e6, 1))

    # D: XLA shade fwd+bwd
    def shade_grad(i):
        def loss(pp):
            return jnp.mean(shade_fwd(pp, i) ** 2)
        val, g = jax.value_and_grad(loss)(params)
        return val + jnp.sum(g["tex_c1"])

    dt = loop_scalar(shade_grad)
    emit(measure="xla_shade_fwd_bwd", n_rays=N, depth=D, seconds=dt,
         mrays_per_s=round(N / dt / 1e6, 1))

    # E: full bench chunk fwd+bwd (identical workload to bench.py)
    st = RenderSettings(image_width=512, aspect_ratio=1.0, spp_per_chunk=8,
                        num_chunks=8, max_depth=D, ray_batch=N)
    param_chunk = compile_param_renderer(sd.scene, sd.camera, st)
    target = jnp.zeros_like(param_chunk(params, key))
    chunk_rays = st.num_pixels * st.spp_per_chunk

    def e2e(i):
        def loss_fn(pp):
            return jnp.mean((param_chunk(pp, jax.random.fold_in(key, i))
                             - target) ** 2)
        val, g = jax.value_and_grad(loss_fn)(params)
        return val + jnp.sum(g["tex_c1"])

    def build_e2e(R):
        @jax.jit
        def f(acc):
            return jax.lax.fori_loop(0, R, lambda i, a: a + e2e(i), acc)
        return f

    dt = per_rep(build_e2e, (jnp.float32(0.0),), 1, 3)
    emit(measure="e2e_chunk_fwd_bwd", chunk_rays=chunk_rays, depth=D,
         seconds=dt, mrays_per_s=round(chunk_rays / dt / 1e6, 1))

    # F: forward-only chunk for the fwd:bwd ratio
    fchunk = compile_renderer(sd.scene, sd.camera, st)

    def build_f(R):
        @jax.jit
        def f(acc):
            return jax.lax.fori_loop(
                0, R, lambda i, a: a + jnp.sum(
                    fchunk.__wrapped__(jax.random.fold_in(key, i))), acc)
        return f

    dt = per_rep(build_f, (jnp.float32(0.0),), 1, 3)
    emit(measure="e2e_chunk_forward", chunk_rays=chunk_rays, depth=D,
         seconds=dt, mrays_per_s=round(chunk_rays / dt / 1e6, 1))


def main():
    emit(measure="device", device=str(jax.devices()[0]),
         backend=jax.default_backend())
    bench_hbm_bw()
    bench_mxu()
    bench_vpu_fma()
    bench_north_star_phases()


if __name__ == "__main__":
    main()
