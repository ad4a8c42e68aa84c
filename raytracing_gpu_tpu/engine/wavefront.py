"""Sorted-wavefront renderer for big-mesh scenes (the 100k-triangle path).

The full-depth megakernel walks the triangle BVH with one cursor per ray
tile; after a diffuse bounce a tile's rays diverge and the packet's subtree
union approaches the whole tree — the round-3 measurement was 0.46 Mrays/s
on the 100,352-triangle backpack vs 811 on Cornell (docs/PERF.md).  The
TPU-native fix is bounce-synchronous reordering: keep the bounce loop in
XLA and, between bounces, SORT the wave by (terminated, direction octant,
origin morton) so every (8, 128) packet the single-bounce kernel
(`ops.pallas_trace.PallasTracer.step`) sees is coherent — and dead rays
compact into all-dead tiles the kernel skips for the cost of one any().
XLA does what it is good at (argsort, gathers, material-table shading);
Pallas does the packet BVH walk and in-kernel scatter sampling.

Because the bounce loop owns the throughput in XLA, russian roulette works
here even for image-textured scenes — the one configuration the full-depth
record walk cannot roulette (engine/render.py).

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

from ..core import rng
from ..core.camera import Camera
from ..core.config import RenderSettings
from ..scene import materials as materials_mod
from ..scene.types import Scene
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


def compile_wavefront_renderer(
    scene: Scene, camera: Camera, settings: RenderSettings,
    tracer=None,
) -> Callable[[Array], Array]:
    """Scene-specialized forward renderer: key -> (npix_pad, 3) sums.

    Drop-in for `engine.render.compile_renderer` on scenes with HBM-streamed
    triangle tables (`tracer.bake.tri_stream`).  Radiance is estimated with
    the same estimator as the megakernel path; the RNG stream differs
    (in-kernel PCG per bounce), so parity with the XLA engine is statistical,
    like `trace_pixels`.
    """
    from ..ops import pallas_trace

    if tracer is None:
        tracer = pallas_trace.PallasTracer(scene)
    need_p, need_uv = tracer.need_p, tracer.need_uv
    h, w, npix, npix_pad, b, nb = _grid_geometry(settings)
    spp = settings.spp_per_chunk
    max_depth, t_min = settings.max_depth, settings.t_min
    rr_start = settings.rr_start
    bg = jnp.asarray(np.asarray(scene.background), jnp.float32)
    lo = jnp.asarray(tracer.world_lo, jnp.float32)
    hi = jnp.asarray(jnp.maximum(tracer.world_hi - tracer.world_lo, 1e-6)
                     + tracer.world_lo, jnp.float32)

    flat = jnp.arange(npix_pad, dtype=jnp.int32)
    rows_all = jnp.minimum(flat // w, h - 1).reshape(nb, b)
    cols_all = jnp.minimum(flat % w, w - 1).reshape(nb, b)
    inv_w = 1.0 / max(w - 1, 1)
    inv_h = 1.0 / max(h - 1, 1)

    def shade_bounce(out, o, d, tm, thr, rad, alive, k_rr, depth):
        """Consume one step-kernel output: accumulate radiance, advance."""
        it = iter(out)
        packed = next(it)
        if need_p:
            p = jnp.stack([next(it), next(it), next(it)], axis=-1)
        else:
            p = jnp.zeros((b, 3), jnp.float32)
        if need_uv:
            u, v = next(it), next(it)
        else:
            u = v = jnp.zeros((b,), jnp.float32)
        new_o, new_d = next(it), next(it)

        # masks already include the alive plane the kernel was given
        hit = (packed & (1 << 16)) != 0
        cont = (packed & (1 << 17)) != 0
        miss = (packed & (1 << 18)) != 0
        mat = packed & 0xFFFF
        att, emit = materials_mod.shade(scene, mat, u, v, p)
        rad = rad + jnp.where(miss[:, None], thr * bg, 0.0)
        rad = rad + jnp.where(hit[:, None], thr * emit, 0.0)
        thr = jnp.where(cont[:, None], thr * att, thr)
        if rr_start > 0:
            # russian roulette in XLA — the wavefront owns the throughput,
            # so image-textured scenes roulette too (engine.integrator.trace
            # semantics: survive w.p. clip(max(thr), .05, 1), reweight)
            p_s = jnp.clip(jnp.max(thr, axis=-1), 0.05, 1.0)
            do_rr = depth >= rr_start
            survive = ~do_rr | (rng.uniform(k_rr, (b,)) < p_s)
            scale = jnp.where(do_rr & survive, 1.0 / p_s, 1.0)
            thr = jnp.where(cont[:, None], thr * scale[:, None], thr)
            cont = cont & survive
        # the kernel passes rays through where not hit
        return new_o, new_d, tm, thr, rad, cont

    def trace_wave(o, d, tm, base, s, bid, k_rr):
        n = o.shape[0]
        thr = jnp.ones((n, 3), jnp.float32)
        rad = jnp.zeros((n, 3), jnp.float32)
        perm = jnp.arange(n, dtype=jnp.int32)
        alive = jnp.ones((n,), bool)

        # bounce 0 unsorted: primary rays are pixel-coherent already
        out = tracer.step(o, d, tm, alive,
                          pallas_trace.wave_seed(base, s, bid, 0),
                          t_min=t_min)
        o, d, tm, thr, rad, alive = shade_bounce(
            out, o, d, tm, thr, rad, alive, rng.fold(k_rr, 0), 0)

        def live_bounce(carry, depth):
            o, d, tm, thr, rad, alive, perm = carry
            order = jnp.argsort(_sort_keys(o, d, alive, lo, hi))
            o, d = o[order], d[order]
            tm, thr, rad = tm[order], thr[order], rad[order]
            alive, perm = alive[order], perm[order]
            out = tracer.step(o, d, tm, alive,
                              pallas_trace.wave_seed(base, s, bid, depth),
                              t_min=t_min)
            o, d, tm, thr, rad, alive = shade_bounce(
                out, o, d, tm, thr, rad, alive, rng.fold(k_rr, depth), depth)
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
        base = pallas_trace.chunk_seed(key)

        def one(x):
            s, bid = x
            ks = rng.fold(key, s)
            kb = rng.fold(ks, bid)
            k_jit, k_cam, k_rr = jax.random.split(kb, 3)
            jit2 = rng.uniform(k_jit, (b, 2))
            r = rows_all[bid]
            c = cols_all[bid]
            u = (c.astype(jnp.float32) + jit2[:, 0]) * inv_w
            v = ((h - 1 - r).astype(jnp.float32) + jit2[:, 1]) * inv_h
            o, d, tm = camera.get_rays(k_cam, u, v)
            return trace_wave(o, d, tm, base, s, bid, k_rr)

        rads = jax.lax.map(one, (s_idx, b_idx))
        return rads.reshape(spp, nb, b, 3).sum(0).reshape(npix_pad, 3)

    return chunk
