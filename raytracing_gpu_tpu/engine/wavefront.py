"""Sorted-wavefront renderers for divergence-heavy scenes.

The full-depth megakernel walks the BVH with one cursor per ray tile;
after a diffuse bounce a tile's rays diverge and the packet's subtree
union approaches the whole tree — the round-3 measurement was 0.46 Mrays/s
on the 100,352-triangle backpack vs 811 on Cornell (docs/PERF.md).  The
TPU-native fix is sorting: keep the bounce loop in XLA and reorder the
wave by (terminated, direction octant, origin morton) so every packet the
closest-hit kernel (`ops.pallas_trace.PallasTracer.hit`) sees is coherent.
Three drivers share that core (`make_trace_wave` / `bounce_shade`):

* `compile_wavefront_renderer` — bounce-SYNCHRONOUS: per-wave bounce scan,
  dead rays compact into all-dead tiles the kernel skips, one
  unique-permutation unscatter per wave.  The low-spp and per-device
  shard_map route.
* `compile_regen_renderer` — REGENERATIVE (round 5): one persistent
  always-full wave per sample chunk; terminated lanes deposit radiance
  into a small VMEM ring (scatter cost scales with target VMEM fit —
  measured) drained by contiguous block copies, and refill with fresh
  camera rays from a pixel-major sample stream, all in a single
  while_loop dispatch.  The big-mesh / sphere-BVH / deep-depth route
  (0.36 -> 3.9-5.9 Mrays/s on BASELINE config 5).
* `make_record_trace_wave` — DETACHED record mode: emits the
  `walk_packed` planes (mat, masks, p, uv[, RR scale]) in pixel order for
  `integrator.shade_packed`, making the same scene classes differentiable
  (VERDICT r4 #2), with detached-probability russian roulette.

The division of labor is strict: Pallas walks the packed-geometry tables
and returns (t, p, barycentrics, slot); XLA does everything that needs
gathers or RNG — winner-attribute resolution (ONE gather via the
slot-attribute table), `materials.scatter` direction sampling, shading,
russian roulette, and the argsort itself.

Reference analogue: the per-thread megakernel bounce loop `render.h:55-81`,
restructured as wavefronts with ray reordering; the reference needs no
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


def pack_attr_table(scene: Scene, tri_perm) -> Array:
    """(S, 16) f32 per-SLOT winner-attribute table for `resolve_hit_packed`.

    One host-side join of the triangle attribute columns, indexed by the hit
    kernel's packed-table slot (tri_perm maps slot -> original triangle id):
    n0 n1 n2 (replicated face normal cross(e2, e1) when the mesh has no
    vertex normals, so the barycentric interpolation is the constant —
    reference `triangle.h:165-174`) | uv0 uv1 uv2 | mat_id.  Collapses the
    13 per-bounce attribute gathers of the round-4 resolve into ONE (N, 16)
    row gather (13 separate 65k-gathers measured 2.7 ms vs 0.18 ms packed,
    docs/PERF.md round 5)."""
    tr = scene.triangles
    n0 = np.asarray(tr.n0, np.float32)
    n1 = np.asarray(tr.n1, np.float32)
    n2 = np.asarray(tr.n2, np.float32)
    has = np.asarray(tr.has_vn)[:, None]
    face = np.cross(np.asarray(tr.e2, np.float32),
                    np.asarray(tr.e1, np.float32))
    attr = np.concatenate([
        np.where(has, n0, face), np.where(has, n1, face),
        np.where(has, n2, face),
        np.asarray(tr.uv0, np.float32), np.asarray(tr.uv1, np.float32),
        np.asarray(tr.uv2, np.float32),
        np.asarray(tr.mat_id, np.float32)[:, None],
    ], axis=1)                                  # (n_tri, 16)
    perm = np.asarray(tri_perm)
    if len(attr) == 0 or len(perm) == 0:
        # triangle-free scene: the hit kernel never sets is_tri, so the
        # resolve's gather target just needs one valid row
        return jnp.zeros((1, 16), jnp.float32)
    out = attr[np.clip(perm, 0, len(attr) - 1)]
    out[perm < 0] = 0.0
    return jnp.asarray(out)


def resolve_hit_packed(attr_slot: Array, packed: Array, p: Array, u: Array,
                       v: Array, normal: Array, slot: Array,
                       d: Array) -> HitRecord:
    """`resolve_hit` with the precomputed slot-attribute table: one gather.

    Semantics identical to `resolve_hit` (oracle-tested against it); only
    the memory access pattern differs."""
    hit = (packed & (1 << 16)) != 0
    front_nt = (packed & (1 << 19)) != 0
    is_tri = (packed & (1 << 20)) != 0
    a = attr_slot[jnp.clip(slot.astype(jnp.int32), 0,
                           attr_slot.shape[0] - 1)]
    w0 = (1.0 - u - v)[:, None]
    vert_n = w0 * a[:, 0:3] + u[:, None] * a[:, 3:6] + v[:, None] * a[:, 6:9]
    front_t = vec.dot(d, vert_n) < 0.0
    n_t = vec.unit(vec.where(front_t, vert_n, -vert_n))
    uv_t = (w0 * a[:, 9:11] + u[:, None] * a[:, 11:13]
            + v[:, None] * a[:, 13:15])
    mat = jnp.where(is_tri, a[:, 15].astype(jnp.int32), packed & 0xFFFF)
    return HitRecord(
        hit=hit, t=jnp.zeros_like(u), p=p,
        normal=vec.where(is_tri, n_t, normal),
        front_face=jnp.where(is_tri, front_t, front_nt),
        u=jnp.where(is_tri, uv_t[:, 0], u),
        v=jnp.where(is_tri, uv_t[:, 1], v),
        mat_id=mat,
    )


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


def make_trace_wave(scene: Scene, tracer, max_depth: int, t_min: float,
                    rr_start: int = 0):
    """Bounce-synchronous sorted-wavefront tracer for ONE ray wave:
    (o, d, tm, key) -> (n, 3) radiance.

    The core of `compile_wavefront_renderer`, factored out so the sharded
    renderer (`parallel.render.compile_sharded_renderer`) can run the same
    wavefront per device inside `shard_map` — each chip reorders and traces
    only the rays it owns; no cross-device communication is needed because
    the sort is a per-wave locality optimization, not a reduction.
    """
    bg = jnp.asarray(np.asarray(scene.background), jnp.float32)
    lo = jnp.asarray(tracer.world_lo, jnp.float32)
    hi = lo + jnp.maximum(
        jnp.asarray(tracer.world_hi, jnp.float32) - lo, 1e-6)
    attr_slot = pack_attr_table(scene, tracer.bake.tri_perm)

    def bounce_shade(o, d, tm, thr, rad, alive, kb, depth):
        """One kernel closest-hit + the XLA half of the bounce — the same
        update `engine.integrator.trace` performs (`render.h:55-81`)."""
        k_scat, k_rr = jax.random.split(rng.fold(kb, depth))
        packed, p, u, v, normal, slot = tracer.hit(o, d, tm, alive,
                                                   t_min=t_min)
        rec = resolve_hit_packed(attr_slot, packed, p, u, v, normal, slot, d)
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
            # ONE packed (N, 16) gather instead of 13 per-plane gathers
            # (measured 0.15 ms vs 2.7 ms per bounce on v5e — the round-4
            # wavefront's single biggest glue cost, docs/PERF.md round 5)
            pay = jnp.concatenate(
                [o, d, tm[:, None], thr, rad,
                 perm.astype(jnp.float32)[:, None],
                 jnp.zeros((o.shape[0], 2), jnp.float32)], axis=1)[order]
            o, d = pay[:, 0:3], pay[:, 3:6]
            tm, thr, rad = pay[:, 6], pay[:, 7:10], pay[:, 10:13]
            perm = pay[:, 13].astype(jnp.int32)
            alive = alive[order]
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

    return trace_wave


def make_record_trace_wave(scene: Scene, tracer, max_depth: int,
                           t_min: float, rr_start: int = 0):
    """Detached record-mode wavefront walk for ONE ray wave:
    (o, d, tm, key) -> raw record planes ((D, n) packed i32,
    [px, py, pz,] [u, v]) in PIXEL order — the `walk_packed` contract
    (`ops.pallas_trace.PallasTracer.walk_packed`), produced by the SORTED
    wavefront instead of the streamed megakernel record walk.

    This is what makes big-mesh scenes differentiable at wavefront speed
    (VERDICT r4 #2): the walk is detached (hit kernel + scatter sampling,
    no parameter dependence), records (mat_id, masks, p, uv) per bounce,
    and `integrator.shade_packed` replays the throughput product chain
    differentiably — the identical phase-2 the megakernel record mode uses,
    so the closed-form estimator algebra is shared, not duplicated.

    Per bounce the sorted-order record row is unscattered to pixel order
    with ONE (n, 8) unique-index set (measured ~0.4-0.7 ms vs the streamed
    record walk's 100x slowdown on 100k-tri scenes).

    rr_start > 0 enables DETACHED russian roulette (VERDICT r4 weak #5 —
    the megakernel record walk cannot roulette at all): survival
    probabilities come from the BAKED-parameter throughput, so the
    decisions and the recorded 1/p scale plane are constants w.r.t. the
    traced params — the estimator is unbiased for any fixed p, f(params)
    stays smooth (finite differences remain a valid oracle), and only the
    variance-optimality of p drifts as the optimized params move away from
    the baked ones.
    """
    lo = jnp.asarray(tracer.world_lo, jnp.float32)
    hi = lo + jnp.maximum(
        jnp.asarray(tracer.world_hi, jnp.float32) - lo, 1e-6)
    attr_slot = pack_attr_table(scene, tracer.bake.tri_perm)
    need_p, need_uv = tracer.need_p, tracer.need_uv

    def bounce_record(o, d, tm, thr, alive, kb, depth):
        """One detached bounce: closest hit + scatter direction, emitting
        the packed record row.  thr is the DETACHED baked-parameter
        throughput — only used to set russian-roulette probabilities;
        phase 2 owns the differentiable shading."""
        k_scat, k_rr = jax.random.split(rng.fold(kb, depth))
        packed_k, p, u, v, normal, slot = tracer.hit(o, d, tm, alive,
                                                     t_min=t_min)
        rec = resolve_hit_packed(attr_slot, packed_k, p, u, v, normal,
                                 slot, d)
        miss = (packed_k & (1 << 18)) != 0
        sc = materials_mod.scatter(scene, k_scat, d, rec.p, rec.normal,
                                   rec.front_face, rec.u, rec.v, rec.mat_id)
        cont = rec.hit & sc.ok
        thr = jnp.where(cont[:, None], thr * sc.attenuation, thr)
        scale_rec = jnp.ones(o.shape[0], jnp.float32)
        if rr_start > 0:
            # same draws/decisions as the forward wavefront's bounce_shade
            p_s = jnp.clip(jnp.max(thr, axis=-1), 0.05, 1.0)
            do_rr = jnp.greater_equal(depth, rr_start)
            survive = ~do_rr | (rng.uniform(k_rr, (thr.shape[0],)) < p_s)
            scale = jnp.where(do_rr & survive, 1.0 / p_s, 1.0)
            thr = jnp.where(cont[:, None], thr * scale[:, None], thr)
            scale_rec = jnp.where(cont & survive, scale, 1.0)
            cont = cont & survive
        plane = (rec.mat_id
                 | (rec.hit.astype(jnp.int32) << 16)
                 | (cont.astype(jnp.int32) << 17)
                 | (miss.astype(jnp.int32) << 18))
        row = jnp.concatenate(
            [plane.astype(jnp.float32)[:, None], rec.p,
             rec.u[:, None], rec.v[:, None], scale_rec[:, None],
             jnp.zeros((o.shape[0], 1), jnp.float32)], axis=1)   # (n, 8)
        o = vec.where(rec.hit, rec.p, o)
        d = vec.where(rec.hit, sc.direction, d)
        return o, d, thr, cont, row

    def trace_record(o, d, tm, kb):
        n = o.shape[0]
        perm = jnp.arange(n, dtype=jnp.int32)
        alive = jnp.ones((n,), bool)
        thr = jnp.ones((n, 3), jnp.float32)
        o, d, thr, alive, row0 = bounce_record(o, d, tm, thr, alive, kb, 0)

        def live_bounce(carry, depth):
            o, d, tm, thr, alive, perm = carry
            order = jnp.argsort(_sort_keys(o, d, alive, lo, hi))
            pay = jnp.concatenate(
                [o, d, tm[:, None], thr,
                 perm.astype(jnp.float32)[:, None]], axis=1)[order]
            o, d, tm = pay[:, 0:3], pay[:, 3:6], pay[:, 6]
            thr = pay[:, 7:10]
            perm = pay[:, 10].astype(jnp.int32)
            alive = alive[order]
            o, d, thr, alive, row = bounce_record(o, d, tm, thr, alive, kb,
                                                  depth)
            # unscatter the record to pixel order (unique-index set)
            row = jnp.zeros((n, 8), jnp.float32).at[perm].set(row)
            return (o, d, tm, thr, alive, perm), row

        # all-dead bounces still need scale == 1 rows (shade multiplies the
        # carried throughput by the scale plane unconditionally)
        dead_row = jnp.zeros((n, 8), jnp.float32).at[:, 6].set(1.0)

        def bounce(carry, depth):
            return jax.lax.cond(
                jnp.any(carry[4]),
                lambda c: live_bounce(c, depth),
                lambda c: (c, dead_row), carry)

        carry = (o, d, tm, thr, alive, perm)
        carry, rows = jax.lax.scan(bounce, carry,
                                   jnp.arange(1, max_depth, dtype=jnp.int32))
        rows = jnp.concatenate([row0[None], rows])      # (D, n, 8)
        planes = [rows[..., 0].astype(jnp.int32)]
        if need_p:
            planes += [rows[..., 1], rows[..., 2], rows[..., 3]]
        if need_uv:
            planes += [rows[..., 4], rows[..., 5]]
        if rr_start > 0:
            planes.append(rows[..., 6])
        return tuple(planes)

    return trace_record


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

    trace_wave = make_trace_wave(scene, tracer, settings.max_depth,
                                 settings.t_min, settings.rr_start)

    flat = jnp.arange(npix_pad, dtype=jnp.int32)
    rows_all = jnp.minimum(flat // w, h - 1).reshape(nb, b)
    cols_all = jnp.minimum(flat % w, w - 1).reshape(nb, b)
    inv_w = 1.0 / max(w - 1, 1)
    inv_h = 1.0 / max(h - 1, 1)

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


def _pow2_at_least(n: int) -> int:
    return 1 << max(int(n - 1).bit_length(), 0)


def compile_regen_renderer(
    scene: Scene, camera: Camera, settings: RenderSettings,
    tracer=None, debug_stats: bool = False, hit_sub: int | None = None,
    _local=None,
) -> Callable[[Array], Array]:
    """Regenerative (persistent) wavefront: key -> (npix_pad, 3) sums.

    The round-4 bounce-synchronous wavefront (`compile_wavefront_renderer`)
    pays full-wave glue (sort, gathers, shade) at EVERY bounce even when 90%
    of the wave has terminated, and its kernel waves decay to mostly-dead
    tiles.  This driver instead keeps ONE always-nearly-full wave alive for
    the whole chunk: rays that terminate deposit their radiance and their
    lanes are immediately REFILLED with fresh camera rays from a sequential
    pixel-major sample stream (ray s -> pixel s // spp) — the classic
    path-regeneration wavefront, here shaped by two TPU constraints:

    * static shapes: the wave never compacts; a per-bounce (terminated,
      octant, morton) argsort moves dead lanes to the tail, where the refill
      assigns them consecutive stream indices (so fresh rays enter
      pixel-coherent and sorted);
    * XLA scatter cost scales with the TARGET size (measured on v5e: 65k
      adds into 524k rows = 2.65 ms vs 0.63 ms into 64k rows — VMEM fit),
      so per-bounce radiance deposits go to a small power-of-two RING of
      pixel rows.  Pixel-major stream order bounds the live pixel window:
      the stream advances <= N/spp pixels per bounce and a ray lives
      <= max_depth bounces, so a ring of (max_depth + 4) * N/spp rows can
      never collide; rows older than max_depth bounces of stream progress
      are final and DRAIN to the framebuffer in contiguous aligned block
      copies (dynamic_update_slice, ~us) — never a big scatter.

    Estimator identical to `compile_wavefront_renderer` (same scatter/shade
    code, same per-bounce key folding); sample jitter keys differ (folded by
    loop iteration, not sample index), so parity with other engines is
    statistical, as between any two spp orderings.  Supports per-lane
    russian roulette (depth rides the payload).

    Reference analogue: `render.h:94-113` traces every sample to completion
    in one thread; regeneration is how a vector machine gets the same
    always-busy occupancy.

    hit_sub: kernel packet rows, swept per scene class on v5e.  Regen
    steady-state waves are ~1/3 hard scattered rays; on the 100k-tri
    backpack smaller packets win (sub=32 2.91, 16 3.25, 8 2.83 Mrays/s e2e)
    while on the sphere-BVH big_scene1 the cheaper candidates favor bigger
    packets (sub=16 3.60, 32 5.30).  Default: 16 for tri_stream scenes,
    32 otherwise.

    _local: INTERNAL (parallel.render.compile_sharded_renderer): a
    (npix_local, spp_local) pair — build the regen body for one device's
    contiguous pixel span.  The returned callable is then UNJITTED and
    takes (key, pix_lo) with pix_lo the traced global index of the span's
    first pixel (each shard_map device regens its own pixels with its own
    persistent wave), and returns the raw (npix_pad_local, 3) sums.
    """
    from ..ops import pallas_trace

    if tracer is None:
        tracer = pallas_trace.PallasTracer(scene)
    assert tracer.supports_hit
    if hit_sub is None:
        hit_sub = 16 if tracer.bake.tri_stream else 32
    h, w = settings.image_height, settings.image_width
    npix = h * w if _local is None else _local[0]
    N = settings.ray_batch
    spp = settings.spp_per_chunk if _local is None else _local[1]
    max_depth, t_min = settings.max_depth, settings.t_min
    rr_start = settings.rr_start
    bg = jnp.asarray(np.asarray(scene.background), jnp.float32)
    lo = jnp.asarray(tracer.world_lo, jnp.float32)
    hi = lo + jnp.maximum(
        jnp.asarray(tracer.world_hi, jnp.float32) - lo, 1e-6)
    attr_slot = pack_attr_table(scene, tracer.bake.tri_perm)

    adv = -(-N // spp)                      # max pixel advance per bounce
    ring_w = _pow2_at_least((max_depth + 4) * adv)
    drain_k = ring_w // 16                  # aligned drain block (>= adv)
    # the driver's chunk contract: output rows == _grid_geometry's npix_pad;
    # but the stream only needs drain_k alignment — trace the smaller pad
    # (the grid pads to whole 65k waves, ~9% wasted rays at 800x600) and
    # zero-fill the output rows beyond it
    npix_pad_out = (_grid_geometry(settings)[3] if _local is None else 0)
    npix_pad = -(-npix // drain_k) * drain_k
    total = npix_pad * spp                  # stream length (rays)
    inv_w = 1.0 / max(w - 1, 1)
    inv_h = 1.0 / max(h - 1, 1)

    def step(carry):
        (it, stream_next, drained, hist, key, pix_lo, fb, ring,
         pay, alive) = carry
        k_it = rng.fold(key, it)
        k_jit, k_cam, k_scat, k_rr = jax.random.split(k_it, 4)

        # 1. sort: dead lanes to the tail, live grouped (octant, morton).
        #    ONE packed payload gather (13 separate gathers cost 2.7 ms).
        o, d = pay[:, 0:3], pay[:, 3:6]
        order = jnp.argsort(_sort_keys(o, d, alive, lo, hi))
        pay = pay[order]
        alive = alive[order]

        # 2. refill the dead tail with consecutive stream rays
        n_live = jnp.sum(alive.astype(jnp.int32))
        lane = jnp.arange(N, dtype=jnp.int32)
        s_idx = stream_next + (lane - n_live)
        new = (~alive) & (s_idx < total) & (lane >= n_live)
        pix_new = jnp.clip(s_idx // spp, 0, npix_pad - 1)
        g = pix_lo + pix_new               # global pixel for camera coords
        r = jnp.minimum(g // w, h - 1)
        c = jnp.minimum(g % w, w - 1)
        jit2 = rng.uniform(k_jit, (N, 2))
        u = (c.astype(jnp.float32) + jit2[:, 0]) * inv_w
        v = ((h - 1 - r).astype(jnp.float32) + jit2[:, 1]) * inv_h
        o_n, d_n, tm_n = camera.get_rays(k_cam, u, v)
        newf = new[:, None].astype(jnp.float32)
        o = vec.where(new, o_n, pay[:, 0:3])
        d = vec.where(new, d_n, pay[:, 3:6])
        tm = jnp.where(new, tm_n, pay[:, 6])
        thr = (1.0 - newf) * pay[:, 7:10] + newf
        rad = (1.0 - newf) * pay[:, 10:13]
        pix = jnp.where(new, pix_new, pay[:, 13].astype(jnp.int32))
        depth = jnp.where(new, 0, pay[:, 14].astype(jnp.int32))
        alive = alive | new
        n_refill = jnp.minimum(jnp.maximum(N - n_live, 0),
                               total - stream_next)

        # 3. one closest-hit + the XLA half of the bounce (identical update
        #    to compile_wavefront_renderer.bounce_shade)
        packed, p, uu, vv, normal, slot = tracer.hit(
            o, d, tm, alive, t_min=t_min,
            **({} if hit_sub is None else {"sub": hit_sub}))
        rec = resolve_hit_packed(attr_slot, packed, p, uu, vv, normal,
                                 slot, d)
        miss = (packed & (1 << 18)) != 0
        sc = materials_mod.scatter(scene, k_scat, d, rec.p, rec.normal,
                                   rec.front_face, rec.u, rec.v, rec.mat_id)
        rad = rad + jnp.where(miss[:, None], thr * bg, 0.0)
        rad = rad + jnp.where(rec.hit[:, None], thr * sc.emitted, 0.0)
        cont = rec.hit & sc.ok
        thr = jnp.where(cont[:, None], thr * sc.attenuation, thr)
        if rr_start > 0:
            p_s = jnp.clip(jnp.max(thr, axis=-1), 0.05, 1.0)
            do_rr = depth >= rr_start
            survive = ~do_rr | (rng.uniform(k_rr, (N,)) < p_s)
            scale = jnp.where(do_rr & survive, 1.0 / p_s, 1.0)
            thr = jnp.where(cont[:, None], thr * scale[:, None], thr)
            cont = cont & survive
        depth = depth + 1
        cont = cont & (depth < max_depth)
        o = vec.where(rec.hit, rec.p, o)
        d = vec.where(rec.hit, sc.direction, d)

        # 4. deposit dying rays into the ring (small scatter target)
        died = alive & ~cont
        ring = ring.at[pix & (ring_w - 1)].add(
            jnp.where(died[:, None], rad, 0.0))
        alive = cont

        # 5. drain final ring blocks to the framebuffer (contiguous copies).
        #    Pixels below hist[0] // spp were fully issued max_depth bounces
        #    ago, so every ray that can deposit to them is dead.  Up to two
        #    blocks per bounce (steady-state advance is <= one).
        safe_pix = hist[0] // spp
        hist = jnp.concatenate([hist[1:],
                                jnp.asarray([stream_next + n_refill])])

        def drain_once(state):
            fb, ring, drained = state
            rows = jax.lax.dynamic_slice(
                ring, (drained % ring_w, 0), (drain_k, 3))
            fb = jax.lax.dynamic_update_slice(fb, rows, (drained, 0))
            ring = jax.lax.dynamic_update_slice(
                ring, jnp.zeros((drain_k, 3), jnp.float32),
                (drained % ring_w, 0))
            return fb, ring, drained + drain_k

        for _ in range(2):
            fb, ring, drained = jax.lax.cond(
                drained + drain_k <= safe_pix, drain_once,
                lambda s: s, (fb, ring, drained))

        pay = jnp.concatenate(
            [o, d, tm[:, None], thr, rad, pix.astype(jnp.float32)[:, None],
             depth.astype(jnp.float32)[:, None]], axis=1)
        return (it + 1, stream_next + n_refill, drained, hist, key, pix_lo,
                fb, ring, pay, alive)

    def body(key, pix_lo):
        fb = jnp.zeros((npix_pad, 3), jnp.float32)
        ring = jnp.zeros((ring_w, 3), jnp.float32)
        pay = jnp.zeros((N, 15), jnp.float32)
        pay = pay.at[:, 3].set(1.0)            # unit-ish dirs for padding
        alive = jnp.zeros((N,), bool)
        hist = jnp.zeros((max_depth,), jnp.int32)
        carry = (jnp.int32(0), jnp.int32(0), jnp.int32(0), hist, key,
                 jnp.asarray(pix_lo, jnp.int32), fb, ring, pay, alive)

        def cond(carry):
            it, stream_next, *_rest = carry
            alive = carry[-1]
            return (stream_next < total) | jnp.any(alive)

        carry = jax.lax.while_loop(cond, step, carry)
        drained, fb, ring = carry[2], carry[6], carry[7]
        # final flush: each ring row r still holds at most one undrained
        # pixel p = drained + ((r - drained) mod ring_w); one small scatter
        row = jnp.arange(ring_w, dtype=jnp.int32)
        p_cand = drained + ((row - drained) % ring_w)
        ok = p_cand < npix_pad
        fb = fb.at[jnp.where(ok, p_cand, 0)].add(
            jnp.where(ok[:, None], ring, 0.0))
        if _local is None:
            if npix_pad_out <= npix_pad:
                fb = fb[:npix_pad_out]
            else:
                fb = jnp.concatenate(
                    [fb,
                     jnp.zeros((npix_pad_out - npix_pad, 3), jnp.float32)])
        if debug_stats:
            return fb, {"iterations": carry[0], "stream": carry[1]}
        return fb

    if _local is not None:
        return body

    @jax.jit
    def chunk(key):
        return body(key, 0)

    return chunk
