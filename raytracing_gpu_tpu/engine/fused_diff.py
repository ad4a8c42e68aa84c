"""Hand-scheduled VJP for the differentiable render chunk.

The two-phase differentiable path (Pallas record walk + XLA autodiff shade,
engine/render.py compile_param_renderer) pays a large composition tax: with
the shade differentiated by XLA inside the spp x wave scans, the TPU-measured
end-to-end fwd+bwd chunk is ~2.7x the sum of its parts (walk ~128us + shade
fwd+bwd ~171us per 65k-ray wave, vs ~806us/wave e2e — tools/roofline.py).
The residual stacking, reversed-scan bookkeeping and remat scheduling that
jax.vjp generates around the wave loop is all overhead an analytic treatment
avoids, because the radiance estimator has a closed-form adjoint.

Per lane, phase 2 is the product chain (reference `render.h:55-81`):

    L = sum_b T_b * E_b,   T_0 = 1,   T_{b+1} = T_b * F_b
    E_b = miss_b * background + hit_b * emit_b
    F_b = cont_b * att_b + (1 - cont_b)

whose adjoint is another linear chain: with the suffix sum
S_b = E_b + F_b * S_{b+1} (so L = S_0),

    dL/d att_b  = g * T_b * S_{b+1} * cont_b
    dL/d emit_b = g * T_b * hit_b

Everything parameter-dependent sits behind one flattened `materials.shade`
call per wave, so the whole backward pass is: re-run the (detached) walk
kernel's recorded planes through one shade forward, two tiny scans (prefix
product T, suffix sum S), and ONE shade VJP — no per-bounce residuals, no
stacking, no reversed outer scan.  The chunk-level `jax.custom_vjp` below
makes this transparent to `jax.grad`.

The estimator is bit-identical to compile_param_renderer's (same keys, same
walk, same shade math) — tests assert primal equality and gradient allclose.

Reference parity: this subsystem has no reference analogue (the reference is
forward-only); it serves the north-star differentiable requirement
(BASELINE.md: gradients to material/texture/emitter parameters).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import Array

from ..core import rng
from ..core.camera import Camera
from ..core.config import RenderSettings
from ..scene import materials as materials_mod
from ..scene.types import Scene
from . import diff
from .integrator import shade_packed, unpack_walk
from .render import _grid_geometry


def _shade_chain_bwd(scene0: Scene, params, planes, g, need_p: bool,
                     need_uv: bool):
    """d<g, L(params)> / d params for one wave, by the closed-form adjoint.

    scene0 is the concrete baked scene (params overwrite its differentiable
    leaves); planes are the walk kernel's packed record planes; g is the
    incoming radiance cotangent (N, 3).
    """
    data = unpack_walk(planes, need_p, need_uv)
    d_, n = data.mat_id.shape
    h = data.hit.astype(jnp.float32)[..., None]    # (D, N, 1)
    m = data.miss.astype(jnp.float32)[..., None]
    c = data.cont.astype(jnp.float32)[..., None]

    # one flattened shade call per wave: the ONLY parameter-dependent code
    def shade_flat(p):
        sc = diff.set_params(scene0, p)
        return materials_mod.shade(
            sc, data.mat_id.reshape(-1), data.u.reshape(-1),
            data.v.reshape(-1), data.p.reshape(-1, 3))

    (att_f, emit_f), shade_vjp = jax.vjp(shade_flat, params)
    att = att_f.reshape(d_, n, 3)
    emit = emit_f.reshape(d_, n, 3)

    bg = jnp.asarray(scene0.background, jnp.float32)
    e_term = m * bg + h * emit                      # E_b
    f_term = c * att + (1.0 - c)                    # F_b

    # T_b: exclusive prefix product of F along the bounce axis
    t_chain = jnp.concatenate(
        [jnp.ones((1, n, 3), jnp.float32), jnp.cumprod(f_term, axis=0)[:-1]],
        axis=0)
    # S_{b+1}: suffix sum S_b = E_b + F_b S_{b+1}, shifted down one bounce
    def rev(s, x):
        e, f = x
        s = e + f * s
        return s, s

    _, s_chain = jax.lax.scan(rev, jnp.zeros((n, 3), jnp.float32),
                              (e_term, f_term), reverse=True)
    s_next = jnp.concatenate(
        [s_chain[1:], jnp.zeros((1, n, 3), jnp.float32)], axis=0)

    g_att = (g[None] * t_chain * s_next * c).reshape(-1, 3)
    g_emit = (g[None] * t_chain * h).reshape(-1, 3)
    (d_params,) = shade_vjp((g_att, g_emit))
    return d_params


def compile_fused_param_renderer(
    scene: Scene, camera: Camera, settings: RenderSettings,
    save_planes: bool | None = None, gen_rays: bool | None = None,
    mesh=None,
) -> Callable[[dict, Array], Array]:
    """Differentiable chunk renderer (params, key) -> (npix_pad, 3) sums with
    a hand-written custom VJP.

    Drop-in replacement for engine.render.compile_param_renderer on scenes the
    Pallas walk kernel supports: identical primal values (same key schedule),
    allclose gradients, ~2-3x faster fwd+bwd on TPU (the AD composition tax is
    gone).  Falls back is the caller's job (`ops.pallas_trace.supports_scene`).

    save_planes: keep the walk kernel's record planes as the VJP residual and
    skip the re-walk in the backward pass (HBM for time: ~8 MB per wave per
    bounce-plane).  Default: on when the stacked planes fit in ~1 GB.

    gen_rays: generate camera rays IN-KERNEL (pallas_trace.trace_pixels
    docstring) instead of XLA-side threefry+thin-lens — drops the ~90-140us
    per-wave ray-generation tax from both passes.  The sampling distribution
    is identical but the RNG stream differs, so the primal no longer
    bit-matches compile_param_renderer (use gen_rays=False for that).
    Default: on when the backend is TPU.

    mesh: an (sp, dp) `parallel.mesh.make_mesh` mesh — the whole fused
    walk+adjoint then runs INSIDE shard_map (each device owns an spp slice x
    pixel slice; radiance psum over sp rides ICI, parameter cotangents psum
    over the whole mesh via the shard_map transpose of the replicated params
    input).  Wave keys/seeds fold by GLOBAL sample/wave index, so the sharded
    render is numerically identical to the single-device fused renderer up
    to float summation order (asserted in tests/test_parallel.py).  The
    output is dp-sharded (npix_pad rows, padded to b * n_dp).
    """
    from ..ops import pallas_trace

    if not pallas_trace.supports_scene(scene):
        raise ValueError("scene not supported by the pallas walk kernel")
    if gen_rays is None:
        gen_rays = jax.default_backend() == "tpu"
    if mesh is not None:
        return _compile_sharded_fused(scene, camera, settings, mesh,
                                      save_planes, gen_rays)
    tracer = pallas_trace.PallasTracer(scene)
    need_p, need_uv = tracer.need_p, tracer.need_uv
    h, w, npix, npix_pad, b, nb = _grid_geometry(settings)
    spp = settings.spp_per_chunk
    max_depth, t_min = settings.max_depth, settings.t_min

    flat = jnp.arange(npix_pad, dtype=jnp.int32)
    rows_all = jnp.minimum(flat // w, h - 1).reshape(nb, b)
    cols_all = jnp.minimum(flat % w, w - 1).reshape(nb, b)
    inv_w = 1.0 / max(w - 1, 1)
    inv_h = 1.0 / max(h - 1, 1)

    def wave_rays(key, s, bid):
        """Camera rays for (spp pass s, wave bid) — EXACTLY render.chunk_sums'
        key schedule, so fused and two-phase renders are bit-identical."""
        ks = rng.fold(key, s)
        kb = rng.fold(ks, bid)
        k_jit, k_cam, k_trace = jax.random.split(kb, 3)
        jit2 = rng.uniform(k_jit, (b, 2))
        r = rows_all[bid]
        c = cols_all[bid]
        u = (c.astype(jnp.float32) + jit2[:, 0]) * inv_w
        v = ((h - 1 - r).astype(jnp.float32) + jit2[:, 1]) * inv_h
        o, d, tm = camera.get_rays(k_cam, u, v)
        return o, d, tm, k_trace

    s_idx = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), nb)
    b_idx = jnp.tile(jnp.arange(nb, dtype=jnp.int32), spp)

    n_planes = 1 + (3 if need_p else 0) + (2 if need_uv else 0)
    plane_bytes = spp * nb * max_depth * b * 4 * n_planes
    if save_planes is None:
        save_planes = plane_bytes <= (1 << 30)

    def walk(key, base, s, bid):
        # base: chunk_seed(key), computed ONCE outside the wave map — a
        # threefry call per wave is the SMEM-scalar stall pattern
        # (pallas_trace.wave_seed docstring)
        if gen_rays:
            seed = pallas_trace.wave_seed(base, s, bid)
            planes = tracer.walk_packed_pixels(
                camera, h, w, bid * b, b, seed, max_depth=max_depth,
                t_min=t_min)
            return tuple(p.reshape(max_depth, -1)[:, :b] for p in planes)
        o, d, tm, k_trace = wave_rays(key, s, bid)
        return tracer.walk_packed(o, d, tm, k_trace, max_depth=max_depth,
                                  t_min=t_min)

    # key enters as its raw uint32 key-data bitcast to f32 so the custom_vjp
    # signature is all-float (integer/key cotangents need float0 plumbing;
    # a bitcast is free and compiles away)
    def _key_and_base(keyf):
        key = jax.random.wrap_key_data(
            jax.lax.bitcast_convert_type(keyf, jnp.uint32))
        return key, pallas_trace.chunk_seed(key)

    @jax.custom_vjp
    def chunk_cvjp(params, keyf):
        key, base = _key_and_base(keyf)
        scene_p = diff.set_params(scene, params)

        def one(x):
            s, bid = x
            planes = walk(key, base, s, bid)
            return shade_packed(scene_p, *planes, need_p=need_p,
                                need_uv=need_uv)

        rads = jax.lax.map(one, (s_idx, b_idx))          # (spp*nb, b, 3)
        return rads.reshape(spp, nb, b, 3).sum(0).reshape(npix_pad, 3)

    def chunk_fwd(params, keyf):
        if not save_planes:
            return chunk_cvjp(params, keyf), (params, keyf, None)
        # run the walks once here and keep the stacked planes as the residual
        # (the primal radiance must still be recomputed — shade is cheap)
        key, base = _key_and_base(keyf)
        scene_p = diff.set_params(scene, params)

        def one(x):
            s, bid = x
            planes = walk(key, base, s, bid)
            rad = shade_packed(scene_p, *planes, need_p=need_p,
                               need_uv=need_uv)
            return rad, planes

        rads, planes_all = jax.lax.map(one, (s_idx, b_idx))
        out = rads.reshape(spp, nb, b, 3).sum(0).reshape(npix_pad, 3)
        return out, (params, keyf, planes_all)

    def chunk_bwd(res, g):
        params, keyf, planes_all = res
        key, base = _key_and_base(keyf)
        g_waves = g.reshape(nb, b, 3)

        def one(acc, x):
            if planes_all is None:
                # re-walk (deterministic in the key): residual-free
                # composition — fwd saved only (params, key)
                s, bid = x
                planes = walk(key, base, s, bid)
            else:
                bid, planes = x[0], x[1:]
            d_p = _shade_chain_bwd(scene, params, planes, g_waves[bid],
                                   need_p, need_uv)
            return jax.tree.map(jnp.add, acc, d_p), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        xs = ((s_idx, b_idx) if planes_all is None
              else (b_idx,) + tuple(planes_all))
        d_params, _ = jax.lax.scan(one, zeros, xs)
        return d_params, jnp.zeros_like(keyf)

    chunk_cvjp.defvjp(chunk_fwd, chunk_bwd)

    @jax.jit
    def chunk(params, key):
        keyf = jax.lax.bitcast_convert_type(
            jax.random.key_data(key), jnp.float32)
        return chunk_cvjp(params, keyf)

    return chunk


def _compile_sharded_fused(scene: Scene, camera: Camera,
                           settings: RenderSettings, mesh,
                           save_planes, gen_rays):
    """shard_map form of the fused renderer: (params, key) -> dp-sharded
    (npix_pad, 3) sums, differentiable at kernel speed on every chip.

    The multi-chip counterpart of the hand-VJP chunk above (VERDICT r3 #3):
    the custom_vjp sits INSIDE the shard_map region, so the backward pass on
    each device is the same closed-form adjoint over its local waves; the
    shard_map transpose of the replicated `params` input inserts the
    parameter-cotangent psum over the mesh (the same mechanism the generic
    sharded AD path uses, `parallel/render.py`), and the forward radiance
    psum over sp is the reference frame-buffer ensemble turned collective
    (`render.h:152-162`).
    """
    from functools import partial as _partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import pallas_trace
    from ..parallel.mesh import DP_AXIS, SP_AXIS

    tracer = pallas_trace.PallasTracer(scene)
    need_p, need_uv = tracer.need_p, tracer.need_uv
    h, w = settings.image_height, settings.image_width
    npix = h * w
    spp = settings.spp_per_chunk
    max_depth, t_min = settings.max_depth, settings.t_min
    n_sp = mesh.shape[SP_AXIS]
    n_dp = mesh.shape[DP_AXIS]
    if spp % n_sp:
        raise ValueError(f"spp_per_chunk={spp} not divisible by sp={n_sp}")
    spp_local = spp // n_sp

    def ceil_to(n, m):
        return ((n + m - 1) // m) * m

    b = min(settings.ray_batch, ceil_to(npix, 8))
    npix_pad = ceil_to(npix, b * n_dp)
    local_npix = npix_pad // n_dp
    nb_local = local_npix // b
    inv_w = 1.0 / max(w - 1, 1)
    inv_h = 1.0 / max(h - 1, 1)

    n_planes = 1 + (3 if need_p else 0) + (2 if need_uv else 0)
    plane_bytes = spp_local * nb_local * max_depth * b * 4 * n_planes
    if save_planes is None:
        save_planes = plane_bytes <= (1 << 30)

    def _key_and_base(keyf):
        key = jax.random.wrap_key_data(
            jax.lax.bitcast_convert_type(keyf, jnp.uint32))
        return key, pallas_trace.chunk_seed(key)

    def walk(key, base, s_g, bid_g):
        """One wave's record planes by GLOBAL sample/wave index — the exact
        single-device schedule, so sharded == unsharded numerically."""
        if gen_rays:
            seed = pallas_trace.wave_seed(base, s_g, bid_g)
            planes = tracer.walk_packed_pixels(
                camera, h, w, bid_g * b, b, seed, max_depth=max_depth,
                t_min=t_min)
            return tuple(p.reshape(max_depth, -1)[:, :b] for p in planes)
        ks = rng.fold(key, s_g)
        kb = rng.fold(ks, bid_g)
        k_jit, k_cam, k_trace = jax.random.split(kb, 3)
        jit2 = rng.uniform(k_jit, (b, 2))
        flat = bid_g * b + jnp.arange(b, dtype=jnp.int32)
        r = jnp.minimum(flat // w, h - 1)
        c = jnp.minimum(flat % w, w - 1)
        u = (c.astype(jnp.float32) + jit2[:, 0]) * inv_w
        v = ((h - 1 - r).astype(jnp.float32) + jit2[:, 1]) * inv_h
        o, d, tm = camera.get_rays(k_cam, u, v)
        return tracer.walk_packed(o, d, tm, k_trace, max_depth=max_depth,
                                  t_min=t_min)

    def local_indices():
        sp = jax.lax.axis_index(SP_AXIS)
        dp = jax.lax.axis_index(DP_AXIS)
        s_l = jnp.repeat(jnp.arange(spp_local, dtype=jnp.int32), nb_local)
        b_l = jnp.tile(jnp.arange(nb_local, dtype=jnp.int32), spp_local)
        return sp * spp_local + s_l, dp * nb_local + b_l

    @jax.custom_vjp
    def chunk_cvjp(params, keyf):
        key, base = _key_and_base(keyf)
        scene_p = diff.set_params(scene, params)
        s_idx, b_idx = local_indices()

        def one(x):
            s_g, bid_g = x
            planes = walk(key, base, s_g, bid_g)
            return shade_packed(scene_p, *planes, need_p=need_p,
                                need_uv=need_uv)

        rads = jax.lax.map(one, (s_idx, b_idx))
        out = rads.reshape(spp_local, nb_local, b, 3).sum(0)
        return jax.lax.psum(out.reshape(local_npix, 3), SP_AXIS)

    def chunk_fwd(params, keyf):
        if not save_planes:
            return chunk_cvjp(params, keyf), (params, keyf, None)
        key, base = _key_and_base(keyf)
        scene_p = diff.set_params(scene, params)
        s_idx, b_idx = local_indices()

        def one(x):
            s_g, bid_g = x
            planes = walk(key, base, s_g, bid_g)
            rad = shade_packed(scene_p, *planes, need_p=need_p,
                               need_uv=need_uv)
            return rad, planes

        rads, planes_all = jax.lax.map(one, (s_idx, b_idx))
        out = rads.reshape(spp_local, nb_local, b, 3).sum(0)
        out = jax.lax.psum(out.reshape(local_npix, 3), SP_AXIS)
        return out, (params, keyf, planes_all)

    def chunk_bwd(res, g):
        # The region output is sp-replicated but declared P(DP): shard_map's
        # transpose SPLITS the true cotangent across the unmentioned sp axis
        # (sum-preserving, measured 1/n_sp per device).  The primal ends in
        # psum(·, sp), whose transpose is itself a psum — recover the full
        # cotangent here, exactly as the primitive transpose would.  Each
        # device then runs the closed-form adjoint over its own local waves
        # and the shard_map transpose of the replicated params input psums
        # d_params mesh-wide.
        params, keyf, planes_all = res
        g = jax.lax.psum(g, SP_AXIS)
        key, base = _key_and_base(keyf)
        s_idx, b_idx = local_indices()
        g_waves = g.reshape(nb_local, b, 3)

        def one(acc, x):
            if planes_all is None:
                s_g, bid_g = x
                planes = walk(key, base, s_g, bid_g)
                bid_l = bid_g - jax.lax.axis_index(DP_AXIS) * nb_local
            else:
                bid_l, planes = x[0], x[1:]
            d_p = _shade_chain_bwd(scene, params, planes, g_waves[bid_l],
                                   need_p, need_uv)
            return jax.tree.map(jnp.add, acc, d_p), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        xs = ((s_idx, b_idx) if planes_all is None
              else (jnp.tile(jnp.arange(nb_local, dtype=jnp.int32),
                             spp_local),) + tuple(planes_all))
        d_params, _ = jax.lax.scan(one, zeros, xs)
        return d_params, jnp.zeros_like(keyf)

    chunk_cvjp.defvjp(chunk_fwd, chunk_bwd)

    sharded = _partial(
        shard_map, mesh=mesh, in_specs=(P(), P()), out_specs=P(DP_AXIS),
        check_rep=False,
    )(lambda params, keyf: chunk_cvjp(params, keyf))

    @jax.jit
    def chunk(params, key):
        keyf = jax.lax.bitcast_convert_type(
            jax.random.key_data(key), jnp.float32)
        return sharded(params, keyf)

    return chunk
