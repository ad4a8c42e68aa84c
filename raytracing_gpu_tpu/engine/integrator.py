"""Wavefront path tracer core.

The reference's `color_f` is a per-thread iterative bounce loop with virtual
dispatch (`render.h:55-81`).  The TPU-native redesign is wavefront: the whole
ray batch advances one bounce per step of a `lax.scan` over a ray SoA
{origin, direction, time, throughput, radiance, alive}, with dead lanes masked.
`scan` (static trip count = max_depth) keeps the loop reverse-differentiable,
which the differentiable rendering path requires.

Radiance accumulation uses the standard estimator
    L += throughput * emitted;  throughput *= attenuation
rather than the reference's non-standard `emitted + A*cur_col` recurrence
(`render.h:57-75`, SURVEY quirk 2) — per SURVEY, the build matches corrected
RTOW semantics, not reference bugs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from ..core import rng, vec
from ..scene import materials as materials_mod
from ..scene.types import Scene
from .intersect import closest_hit


def trace(
    scene: Scene,
    origins: Array,     # (N, 3)
    directions: Array,  # (N, 3)
    times: Array,       # (N,)
    key: Array,
    max_depth: int = 50,
    t_min: float = 0.001,
    rr_start: int = 0,
) -> Array:
    """Estimate radiance along each ray.  Returns (N, 3).

    Mirrors `color_f` (`render.h:55-81`): at each bounce, find the closest hit;
    on miss add background and terminate; otherwise add emission and continue
    with the scattered ray, or terminate if the material absorbs.
    Depth-exhausted rays contribute nothing further (`render.h:79-80`).

    rr_start > 0 enables russian roulette from that bounce index: each
    surviving path continues with probability p = clip(max(throughput), 0.05,
    1) and is reweighted by 1/p, so the estimator stays unbiased (standard
    RR; the reference has none — it runs the full fixed 50-bounce loop,
    `render.h:27,60`).  On TPU this is the dead-lane answer: a wavefront tile
    pays for its deepest live lane, and RR collapses the long tail.
    """
    n = origins.shape[0]
    state = (
        origins,
        directions,
        times,
        jnp.ones((n, 3), jnp.float32),   # throughput
        jnp.zeros((n, 3), jnp.float32),  # radiance
        jnp.ones((n,), bool),            # alive
    )

    def live_bounce(state, depth):
        o, d, tm, throughput, radiance, alive = state
        kb = rng.fold(key, depth)
        k_hit, k_scat = jax.random.split(kb)

        rec = closest_hit(scene, o, d, tm, k_hit, t_min=t_min)

        miss = alive & ~rec.hit
        radiance = radiance + jnp.where(
            miss[:, None], throughput * scene.background, 0.0
        )

        sc = materials_mod.scatter(
            scene, k_scat, d, rec.p, rec.normal, rec.front_face,
            rec.u, rec.v, rec.mat_id,
        )
        hit_lane = alive & rec.hit
        radiance = radiance + jnp.where(hit_lane[:, None], throughput * sc.emitted, 0.0)

        cont = hit_lane & sc.ok
        throughput = jnp.where(cont[:, None], throughput * sc.attenuation, throughput)
        if rr_start > 0:
            # survive w.p. p = clip(max component of throughput, .05, 1);
            # reweight survivors by 1/p.  `depth` is the scan counter, so the
            # gate is a traced scalar select — no retrace per bounce.
            k_rr = rng.fold(kb, 0x5252)
            p = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
            do_rr = depth >= rr_start
            survive = ~do_rr | (rng.uniform(k_rr, (throughput.shape[0],)) < p)
            scale = jnp.where(do_rr & survive, 1.0 / p, 1.0)
            throughput = jnp.where(cont[:, None], throughput * scale[:, None],
                                   throughput)
            cont = cont & survive
        o = vec.where(hit_lane, rec.p, o)
        d = vec.where(hit_lane, sc.direction, d)
        return (o, d, tm, throughput, radiance, cont)

    def bounce(state, depth):
        # early exit: once every lane is dead, skip the whole intersection +
        # shade body (the reference breaks per-thread, render.h:60-79; at
        # depth-50 defaults most batches are all-dead within ~8 bounces)
        state = jax.lax.cond(jnp.any(state[-1]),
                             lambda s: live_bounce(s, depth),
                             lambda s: s, state)
        return state, None

    (_, _, _, _, radiance, _), _ = jax.lax.scan(
        bounce, state, jnp.arange(max_depth)
    )
    return radiance


class BounceData(NamedTuple):
    """Per-bounce shading inputs recorded by the path walk (stacked (D, ...))."""

    mat_id: Array  # (D, N)
    u: Array       # (D, N)
    v: Array       # (D, N)
    p: Array       # (D, N, 3)
    hit: Array     # (D, N) hit this bounce while alive
    cont: Array    # (D, N) path continued after this bounce
    miss: Array    # (D, N) escaped to background this bounce
    # optional (D, N) russian-roulette survival scale (1/p for surviving
    # roulette bounces, 1 elsewhere).  Recorded by the wavefront record walk
    # with DETACHED probabilities (p from the baked-parameter throughput),
    # so survival decisions are constant w.r.t. params: the estimator stays
    # unbiased for any fixed p, and f(params) stays smooth for autodiff/FD.
    scale: Optional[Array] = None


def trace_bounces(
    scene: Scene, origins, directions, times, key,
    max_depth: int = 50, t_min: float = 0.001,
) -> BounceData:
    """Phase 1 of the differentiable split: walk paths with fully DETACHED
    parameters, recording only the shading inputs each bounce needs.

    Because nothing here carries parameter tangents, autodiff treats the whole
    walk — intersection, BVH traversal, direction sampling — as constant
    forward compute: no residual materialization, full fusion.  Phase 2
    (`shade_radiance`) is the only differentiated code.
    """
    scene = jax.lax.stop_gradient(scene)
    origins, directions, times = jax.lax.stop_gradient((origins, directions, times))
    n = origins.shape[0]
    state = (origins, directions, times, jnp.ones((n,), bool))

    def live_bounce(state, depth):
        o, d, tm, alive = state
        kb = rng.fold(key, depth)
        k_hit, k_scat = jax.random.split(kb)
        rec = closest_hit(scene, o, d, tm, k_hit, t_min=t_min)
        direction, ok = materials_mod.scatter_direction(
            scene, k_scat, d, rec.normal, rec.front_face, rec.mat_id
        )
        hit_lane = alive & rec.hit
        miss = alive & ~rec.hit
        cont = hit_lane & ok
        data = BounceData(mat_id=rec.mat_id, u=rec.u, v=rec.v, p=rec.p,
                          hit=hit_lane, cont=cont, miss=miss)
        o = vec.where(hit_lane, rec.p, o)
        d = vec.where(hit_lane, direction, d)
        return (o, d, tm, cont), data

    def dead_bounce(state):
        n_ = state[0].shape[0]
        f = jnp.zeros((n_,), bool)
        data = BounceData(mat_id=jnp.zeros((n_,), jnp.int32),
                          u=jnp.zeros((n_,)), v=jnp.zeros((n_,)),
                          p=jnp.zeros((n_, 3)), hit=f, cont=f, miss=f)
        return state, data

    def bounce(state, depth):
        # all-dead early exit mirroring `trace` (a shade_radiance over the
        # zero BounceData contributes exactly nothing)
        return jax.lax.cond(jnp.any(state[-1]),
                            lambda s: live_bounce(s, depth),
                            dead_bounce, state)

    _, data = jax.lax.scan(bounce, state, jnp.arange(max_depth))
    return data


def shade_radiance(scene: Scene, data: BounceData) -> Array:
    """Phase 2: differentiable radiance accumulation over recorded bounces.

    L = sum_b T_b * E_b (+ T_b * background on escape); T_{b+1} = T_b * A_b.
    A (attenuation) and E (emission) are the only parameter-dependent factors,
    so the autodiff graph is this product chain + texture evaluation — tiny
    compared to the path walk.
    """
    depth, n = data.mat_id.shape
    # mask-MULTIPLY form, not jnp.where, with the bool->f32 conversion OUTSIDE
    # the scan: identical values (masks are exactly 0/1, all operands finite),
    # but the residuals the enclosing spp/wave scans store for the backward
    # pass become plain f32[D,N] tensors.  With jnp.where on preds, the TPU
    # profile showed >50% of the whole fwd+bwd step in dynamic-update-slices
    # of bit-packed pred[D,N,3] residual stacks (tiling (8,128)(4,1) —
    # read-modify-write per word).
    h_all = data.hit.astype(jnp.float32)
    m_all = data.miss.astype(jnp.float32)
    c_all = data.cont.astype(jnp.float32)
    s_all = jnp.ones_like(h_all) if data.scale is None else data.scale

    # Image-atlas scenes: texture/material evaluation hoisted OUT of the
    # bounce scan — one shade call over the flattened (D*N,) hit set instead
    # of D per-bounce calls.  Same math, but the atlas gathers launch once at
    # D x the batch (that path is gather-launch-bound — docs/PERF.md: earth
    # fwd+bwd 1.31 -> 2.13 Mrays/s).  Matmul-shaded scenes (solid/checker)
    # keep the per-bounce form: the fast-shade matmul fuses into the scan and
    # hoisting costs ~5% there (Cornell 73 -> 69, measured).
    hoist = _uses_image_textures(scene)
    if hoist:
        att_all, emit_all = materials_mod.shade(
            scene, data.mat_id.reshape(-1), data.u.reshape(-1),
            data.v.reshape(-1), data.p.reshape(-1, 3))
        xs = (att_all.reshape(depth, n, 3), emit_all.reshape(depth, n, 3),
              h_all, m_all, c_all, s_all)
    else:
        xs = (data.mat_id, data.u, data.v, data.p, h_all, m_all, c_all,
              s_all)

    def step(throughput, x):
        if hoist:
            att, emit, h, m, c, s = x
        else:
            mat_id, u, v, p, h, m, c, s = x
            att, emit = materials_mod.shade(scene, mat_id, u, v, p)
        contrib = throughput * (m[:, None] * scene.background
                                + h[:, None] * emit)
        # s is the detached RR survival scale (1 when cont == 0, so dead
        # lanes' frozen throughput is untouched)
        throughput = (throughput * (c[:, None] * att + (1.0 - c[:, None]))
                      * s[:, None])
        return throughput, contrib

    _, contribs = jax.lax.scan(step, jnp.ones((n, 3), jnp.float32), xs)
    return contribs.sum(axis=0)


def _uses_image_textures(scene: Scene) -> bool:
    """Static check: does any texture row use the image atlas?  (Concrete
    under compile_renderer/compile_param_renderer which bake the scene;
    conservatively False when the kind table is traced.)"""
    import numpy as np
    from ..scene.types import TEX_IMAGE

    kinds = scene.textures.kind
    if isinstance(kinds, jax.core.Tracer):
        return False
    return bool(np.any(np.asarray(kinds) == TEX_IMAGE))


def unpack_walk(planes, need_p: bool, need_uv: bool,
                need_scale: bool = False) -> BounceData:
    """Raw record planes (ops.pallas_trace.walk_packed) -> BounceData.

    planes = (packed (D, N) i32, [px, py, pz,] [u, v,] [scale]) — the masks
    live in bits 16-18 of the packed plane and absent planes become zeros
    here; the trailing scale plane (wavefront record walk with russian
    roulette) defaults to ones.
    """
    packed = planes[0]
    max_depth, n = packed.shape
    zeros = jnp.zeros((max_depth, n), jnp.float32)
    i = 1
    if need_p:
        p = jnp.stack([planes[i], planes[i + 1], planes[i + 2]], axis=-1)
        i += 3
    else:
        p = jnp.zeros((max_depth, n, 3), jnp.float32)
    if need_uv:
        u, v = planes[i], planes[i + 1]
        i += 2
    else:
        u = v = zeros
    scale = planes[i] if need_scale else None
    return BounceData(
        mat_id=packed & 0xFFFF, u=u, v=v, p=p,
        hit=(packed & (1 << 16)) != 0, cont=(packed & (1 << 17)) != 0,
        miss=(packed & (1 << 18)) != 0, scale=scale,
    )


def shade_packed(scene: Scene, *planes, need_p: bool, need_uv: bool,
                 need_scale: bool = False) -> Array:
    """Phase 2 over RAW record planes: unpack + shade in one step.

    Designed to sit under `jax.checkpoint`: the only residual the outer
    spp/wave scans then store is the compact packed i32 plane (2 MB per
    65k-ray wave at depth 8) — the unpacked bool masks, the broadcast zero
    p/uv planes, and the product-chain intermediates are all re-derived in
    the backward pass.  Without this, the TPU profile showed ~60% of the
    fwd+bwd step in dynamic-update-slices materializing pred[D,N,3]
    residual stacks.
    """
    return shade_radiance(scene,
                          unpack_walk(planes, need_p, need_uv, need_scale))


def trace_diff(
    scene: Scene, origins, directions, times, key,
    max_depth: int = 50, t_min: float = 0.001, rr_start: int = 0,
) -> Array:
    """Differentiable radiance estimate: identical Monte Carlo estimator to
    `trace` (same keys, same paths) but with the walk/shade split so the
    backward pass costs ~one texture-eval VJP per bounce instead of
    differentiating the whole intersection pipeline.

    Russian roulette is a forward-render feature: the detached walk carries no
    throughput, so rr_start must be 0 here (gradient workloads run at modest
    depth where RR wins nothing; see `trace` for the forward version)."""
    assert rr_start == 0, "russian roulette is not supported on the diff path"
    data = trace_bounces(scene, origins, directions, times, key,
                         max_depth=max_depth, t_min=t_min)
    return shade_radiance(scene, data)
