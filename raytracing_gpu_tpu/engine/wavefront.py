"""Sorted-wavefront renderer for big-mesh scenes (the 100k-triangle path).

The full-depth megakernel walks the triangle BVH with one cursor per ray
tile; after a diffuse bounce a tile's rays diverge and the packet's subtree
union approaches the whole tree — the round-3 measurement was 0.46 Mrays/s
on the 100,352-triangle backpack vs 811 on Cornell (docs/PERF.md).  The
TPU-native fix is bounce-synchronous reordering: keep the bounce loop in
XLA and, between bounces, SORT the wave by (terminated, direction octant,
origin morton) so every (STEP_SUB, 128) = (32, 128) packet the closest-hit kernel
(`ops.pallas_trace.PallasTracer.hit`) sees is coherent — and dead rays
compact into all-dead tiles the kernel skips for the cost of one any().

The division of labor is strict: Pallas walks the packed-geometry BVH and
returns (t, p, barycentrics, slot); XLA does everything that needs gathers
or RNG — winner-attribute resolution from the scene tables (normals/uv/
material by slot id), `materials.scatter` direction sampling, shading,
russian roulette, and the argsort itself.  Because the bounce loop owns the
throughput in XLA, RR works here even for image-textured scenes — the one
configuration the full-depth record walk cannot roulette
(engine/render.py).

Reference analogue: the per-thread megakernel bounce loop `render.h:55-81`,
restructured as a wavefront with ray reordering; the reference needs no
sorting because a scalar GPU thread walks only its own ray's subtree.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..core import rng, vec
from ..core.camera import Camera
from ..core.config import RenderSettings
from ..scene import materials as materials_mod
from ..scene.types import Scene
from .intersect import HitRecord
from .render import _grid_geometry


def _part1by2(x: Array) -> Array:
    """Spread the low 10 bits of x to every third bit (morton interleave)."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _sort_keys(o: Array, d: Array, alive: Array, lo, hi) -> Array:
    """i32 sort key: (terminated, direction octant, origin morton-21).

    Terminated rays sort last (they become all-dead kernel tiles); live rays
    group by direction octant first, then by 7-bits-per-axis morton position
    — packets of rays leaving the same region in the same octant walk a
    tight subtree union.
    """
    okt = (((d[:, 0] < 0).astype(jnp.int32) << 2)
           | ((d[:, 1] < 0).astype(jnp.int32) << 1)
           | (d[:, 2] < 0).astype(jnp.int32))
    q = jnp.clip((o - lo) / (hi - lo), 0.0, 1.0)
    cell = jnp.clip((q * 128.0).astype(jnp.int32), 0, 127)
    morton = (_part1by2(cell[:, 0])
              | (_part1by2(cell[:, 1]) << 1)
              | (_part1by2(cell[:, 2]) << 2))
    dead = (~alive).astype(jnp.int32)
    return (dead << 30) | (okt << 21) | morton


def resolve_hit(scene: Scene, tri_perm: Array, packed: Array, p: Array,
                u: Array, v: Array, normal: Array, slot: Array,
                d: Array) -> HitRecord:
    """Hit-kernel outputs -> HitRecord: the attribute resolve the kernel
    defers (Mosaic has no gathers; XLA row-gathers at wave width are cheap).

    Triangle winners carry barycentrics (u = vertex-1 weight, v = vertex-2
    weight) and a packed-table slot; normals/uv/material gather from the
    scene's triangle columns exactly as the XLA tracer's `tri_record`
    (reference `triangle.h:101-116,160-174`).  Non-triangle winners arrive
    fully resolved (normal faced+normalized in-kernel, uv final).
    """
    hit = (packed & (1 << 16)) != 0
    front_nt = (packed & (1 << 19)) != 0
    is_tri = (packed & (1 << 20)) != 0
    tr = scene.triangles
    orig = tri_perm[jnp.clip(slot.astype(jnp.int32), 0,
                             tri_perm.shape[0] - 1)]
    orig = jnp.maximum(orig, 0)
    w0 = (1.0 - u - v)[:, None]
    vert_n = (w0 * tr.n0[orig] + u[:, None] * tr.n1[orig]
              + v[:, None] * tr.n2[orig])
    face_n = vec.cross(tr.e2[orig], tr.e1[orig])   # reference normal order
    outward = vec.where(tr.has_vn[orig], vert_n, face_n)
    front_t = vec.dot(d, outward) < 0.0
    n_t = vec.unit(vec.where(front_t, outward, -outward))
    uv_t = (w0 * tr.uv0[orig] + u[:, None] * tr.uv1[orig]
            + v[:, None] * tr.uv2[orig])
    mat = jnp.where(is_tri, tr.mat_id[orig], packed & 0xFFFF)
    return HitRecord(
        hit=hit, t=jnp.zeros_like(u), p=p,
        normal=vec.where(is_tri, n_t, normal),
        front_face=jnp.where(is_tri, front_t, front_nt),
        u=jnp.where(is_tri, uv_t[:, 0], u),
        v=jnp.where(is_tri, uv_t[:, 1], v),
        mat_id=mat,
    )


def compile_wavefront_renderer(
    scene: Scene, camera: Camera, settings: RenderSettings,
    tracer=None,
) -> Callable[[Array], Array]:
    """Scene-specialized forward renderer: key -> (npix_pad, 3) sums.

    Drop-in for `engine.render.compile_renderer` on big-mesh scenes
    (`tracer.bake.tri_stream` and `tracer.supports_hit`).  The estimator is
    `engine.integrator.trace`'s (same scatter/shade code, XLA threefry keys);
    only the intersector differs, so parity with the XLA engine is exact on
    hits and statistical on radiance.
    """
    from ..ops import pallas_trace

    if tracer is None:
        tracer = pallas_trace.PallasTracer(scene)
    assert tracer.supports_hit
    h, w, npix, npix_pad, b, nb = _grid_geometry(settings)
    spp = settings.spp_per_chunk
    max_depth, t_min = settings.max_depth, settings.t_min
    rr_start = settings.rr_start
    bg = jnp.asarray(np.asarray(scene.background), jnp.float32)
    lo = jnp.asarray(tracer.world_lo, jnp.float32)
    hi = lo + jnp.maximum(
        jnp.asarray(tracer.world_hi, jnp.float32) - lo, 1e-6)
    tri_perm = tracer.tri_perm

    flat = jnp.arange(npix_pad, dtype=jnp.int32)
    rows_all = jnp.minimum(flat // w, h - 1).reshape(nb, b)
    cols_all = jnp.minimum(flat % w, w - 1).reshape(nb, b)
    inv_w = 1.0 / max(w - 1, 1)
    inv_h = 1.0 / max(h - 1, 1)

    def bounce_shade(o, d, tm, thr, rad, alive, kb, depth):
        """One kernel closest-hit + the XLA half of the bounce — the same
        update `engine.integrator.trace` performs (`render.h:55-81`)."""
        k_scat, k_rr = jax.random.split(rng.fold(kb, depth))
        packed, p, u, v, normal, slot = tracer.hit(o, d, tm, alive,
                                                   t_min=t_min)
        rec = resolve_hit(scene, tri_perm, packed, p, u, v, normal, slot, d)
        miss = (packed & (1 << 18)) != 0   # alive & ~hit (kernel-masked)
        sc = materials_mod.scatter(scene, k_scat, d, rec.p, rec.normal,
                                   rec.front_face, rec.u, rec.v, rec.mat_id)
        rad = rad + jnp.where(miss[:, None], thr * bg, 0.0)
        rad = rad + jnp.where(rec.hit[:, None], thr * sc.emitted, 0.0)
        cont = rec.hit & sc.ok
        thr = jnp.where(cont[:, None], thr * sc.attenuation, thr)
        if rr_start > 0:
            # integrator.trace's russian roulette, wavefront edition: the
            # throughput lives in XLA, so image-textured scenes roulette too
            p_s = jnp.clip(jnp.max(thr, axis=-1), 0.05, 1.0)
            # jnp bool even when depth is the python-int peeled bounce 0
            # (python `~False` is -2 and would silently int-ify the masks)
            do_rr = jnp.greater_equal(depth, rr_start)
            survive = ~do_rr | (rng.uniform(k_rr, (thr.shape[0],)) < p_s)
            scale = jnp.where(do_rr & survive, 1.0 / p_s, 1.0)
            thr = jnp.where(cont[:, None], thr * scale[:, None], thr)
            cont = cont & survive
        o = vec.where(rec.hit, rec.p, o)
        d = vec.where(rec.hit, sc.direction, d)
        return o, d, tm, thr, rad, cont

    def trace_wave(o, d, tm, kb):
        n = o.shape[0]
        thr = jnp.ones((n, 3), jnp.float32)
        rad = jnp.zeros((n, 3), jnp.float32)
        perm = jnp.arange(n, dtype=jnp.int32)
        alive = jnp.ones((n,), bool)

        # bounce 0 unsorted: primary rays are pixel-coherent already
        o, d, tm, thr, rad, alive = bounce_shade(o, d, tm, thr, rad, alive,
                                                 kb, 0)

        def live_bounce(carry, depth):
            o, d, tm, thr, rad, alive, perm = carry
            order = jnp.argsort(_sort_keys(o, d, alive, lo, hi))
            o, d = o[order], d[order]
            tm, thr, rad = tm[order], thr[order], rad[order]
            alive, perm = alive[order], perm[order]
            o, d, tm, thr, rad, alive = bounce_shade(
                o, d, tm, thr, rad, alive, kb, depth)
            return (o, d, tm, thr, rad, alive, perm)

        def bounce(carry, depth):
            carry = jax.lax.cond(jnp.any(carry[5]),
                                 lambda c: live_bounce(c, depth),
                                 lambda c: c, carry)
            return carry, None

        carry = (o, d, tm, thr, rad, alive, perm)
        carry, _ = jax.lax.scan(bounce, carry,
                                jnp.arange(1, max_depth, dtype=jnp.int32))
        rad, perm = carry[4], carry[6]
        # undo the accumulated permutation (one scatter per wave)
        return jnp.zeros((n, 3), jnp.float32).at[perm].set(rad)

    s_idx = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), nb)
    b_idx = jnp.tile(jnp.arange(nb, dtype=jnp.int32), spp)

    @jax.jit
    def chunk(key):
        def one(x):
            s, bid = x
            ks = rng.fold(key, s)
            kb = rng.fold(ks, bid)
            k_jit, k_cam, k_trace = jax.random.split(kb, 3)
            jit2 = rng.uniform(k_jit, (b, 2))
            r = rows_all[bid]
            c = cols_all[bid]
            u = (c.astype(jnp.float32) + jit2[:, 0]) * inv_w
            v = ((h - 1 - r).astype(jnp.float32) + jit2[:, 1]) * inv_h
            o, d, tm = camera.get_rays(k_cam, u, v)
            return trace_wave(o, d, tm, k_trace)

        rads = jax.lax.map(one, (s_idx, b_idx))
        return rads.reshape(spp, nb, b, 3).sum(0).reshape(npix_pad, 3)

    return chunk
