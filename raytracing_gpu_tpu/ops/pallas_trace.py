"""Pallas TPU megakernel: the full bounce loop as one on-chip program.

The XLA wavefront path (engine/integrator.py) is a scan of fused-but-separate
stages with (N, 3) layouts.  This kernel is the TPU-native megakernel the
reference's CUDA `render` kernel (`render.h:94-113`) maps to when redesigned
for a vector core:

- rays live as lane-aligned (8*SUB, 128) f32 tiles (full VPU occupancy),
- scene GEOMETRY is baked into the kernel as literal scalars (rect/box
  parameters unroll into straight-line code; spheres stream from a VMEM
  table so 500-sphere scenes don't explode code size),
- per-primitive SHADING data (albedo/fuzz/ir/emission) is *denormalized* into
  the candidate loop: the winning primitive's shading state is carried as
  vector registers, so there are no material-table gathers at all,
- the RNG is the hardware PRNG (`pltpu.prng_seed`/`prng_random_bits`),
- the bounce loop is a `fori_loop` with all state in VMEM registers — zero
  HBM traffic between bounces.

Coverage: spheres (static + moving), axis-aligned rects, boxes (with
rotate_y/translate instance transforms), lambertian/metal/dielectric/
diffuse_light/isotropic materials, solid + checker textures, sky/black
backgrounds.  Scenes using constant media, triangles, or perlin/image
textures fall back to the XLA path (`supports_scene` reports which).

Used by `engine.render.compile_renderer(engine="pallas")` for forward
rendering; the differentiable path keeps the XLA phase-2 shade (gradients
never flow through this kernel — geometry is detached by design).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import types as st

BIG = 1e30
SUB = 64          # sublane rows per tile -> tile = (64, 128) = 8192 rays
LANES = 128
TILE = SUB * LANES
_EPS = 1e-12

# carried shading state kinds match scene.types material tags


class SceneBake(NamedTuple):
    """Host-side snapshot of everything the kernel bakes or streams."""

    rects: list            # dicts of python floats
    boxes: list
    sphere_table: np.ndarray  # (S, 24) float32 denormalized sphere rows
    background: tuple
    sky: bool


def supports_scene(scene: st.Scene) -> bool:
    """True when the kernel covers this scene's feature set."""
    if scene.has_sphere_media or scene.has_box_media:
        return False
    scene = jax.device_get(scene)
    if bool(np.asarray(scene.triangles.active).any()):
        return False
    # all referenced textures must be solid or checker
    kinds = np.asarray(scene.textures.kind)
    used = np.unique(np.asarray(scene.materials.tex_id))
    if not np.all(np.isin(kinds[used], [st.TEX_SOLID, st.TEX_CHECKER])):
        return False
    return True


def _mat_shading(scene, mat_id: int):
    """(kind, albedo c1, c2, checker_scale, fuzz, ir) host scalars for a material."""
    mats = scene.materials
    texs = scene.textures
    kind = int(np.asarray(mats.kind[mat_id]))
    tex = int(np.asarray(mats.tex_id[mat_id]))
    c1 = tuple(float(x) for x in np.asarray(texs.c1[tex]))
    c2 = tuple(float(x) for x in np.asarray(texs.c2[tex]))
    checker = int(np.asarray(texs.kind[tex])) == st.TEX_CHECKER
    scale = float(np.asarray(texs.scale[tex]))
    fuzz = float(np.asarray(mats.fuzz[mat_id]))
    ir = float(np.asarray(mats.ir[mat_id]))
    return dict(kind=kind, c1=c1, c2=c2, checker=checker, scale=scale,
                fuzz=fuzz, ir=ir, mat=int(mat_id))


def bake_scene(scene: st.Scene) -> SceneBake:
    """Snapshot the packed scene into python scalars / a dense sphere table.

    One bulk device_get up front: element-wise np.asarray on device arrays
    would issue hundreds of tiny D2H transfers (pathological through the TPU
    tunnel)."""
    scene = jax.device_get(scene)
    rects = []
    rc = scene.rects
    for i in range(int(rc.axis.shape[0])):
        if not bool(np.asarray(rc.active[i])):
            continue
        rects.append(dict(
            axis=int(np.asarray(rc.axis[i])),
            a0=float(np.asarray(rc.a0[i])), a1=float(np.asarray(rc.a1[i])),
            b0=float(np.asarray(rc.b0[i])), b1=float(np.asarray(rc.b1[i])),
            k=float(np.asarray(rc.k[i])),
            **_mat_shading(scene, int(np.asarray(rc.mat_id[i]))),
        ))
    boxes = []
    bx = scene.boxes
    for i in range(int(bx.bmin.shape[0])):
        if not bool(np.asarray(bx.active[i])):
            continue
        boxes.append(dict(
            bmin=tuple(float(x) for x in np.asarray(bx.bmin[i])),
            bmax=tuple(float(x) for x in np.asarray(bx.bmax[i])),
            cos=float(np.asarray(bx.cos_t[i])), sin=float(np.asarray(bx.sin_t[i])),
            off=tuple(float(x) for x in np.asarray(bx.offset[i])),
            **_mat_shading(scene, int(np.asarray(bx.mat_id[i]))),
        ))

    sp = scene.spheres
    rows = []
    for i in range(int(sp.radius.shape[0])):
        if not bool(np.asarray(sp.active[i])):
            continue
        sh = _mat_shading(scene, int(np.asarray(sp.mat_id[i])))
        c0 = np.asarray(sp.center0[i])
        c1v = np.asarray(sp.center1[i])
        rows.append([
            c0[0], c0[1], c0[2], c1v[0], c1v[1], c1v[2],
            float(np.asarray(sp.time0[i])), float(np.asarray(sp.time1[i])),
            float(np.asarray(sp.radius[i])), float(sh["kind"]),
            sh["c1"][0], sh["c1"][1], sh["c1"][2],
            sh["c2"][0], sh["c2"][1], sh["c2"][2],
            sh["scale"], sh["fuzz"], sh["ir"], 1.0 if sh["checker"] else 0.0,
            float(sh["mat"]), 0.0, 0.0, 0.0,  # mat id + pad to 24 columns
        ])
    table = (np.asarray(rows, np.float32) if rows
             else np.zeros((0, 24), np.float32))
    bg = tuple(float(x) for x in np.asarray(scene.background))
    return SceneBake(rects=rects, boxes=boxes, sphere_table=table,
                     background=bg, sky=bg != (0.0, 0.0, 0.0))


# --------------------------------------------------------------------------
# kernel helpers (operate on (SUB, 128) f32 blocks)
# --------------------------------------------------------------------------


def _pcg_hash(x):
    """PCG output permutation over uint32 — a counter-based generator whose
    state is (seed, lane, draw-site): pure VPU integer ops, identical on
    CPU-interpret and TPU, deterministic and order-independent (the same
    key-as-counter philosophy as core/rng.py, minus the threefry cost)."""
    x = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    x = ((x >> ((x >> jnp.uint32(28)) + jnp.uint32(4))) ^ x) * jnp.uint32(277803737)
    return (x >> jnp.uint32(22)) ^ x


def _uniform(base, salt: int):
    """U[0,1) per lane for a given draw site.

    Mosaic has no uint32->f32 cast; the 24-bit value is bitcast to int32
    (always non-negative) before the int->float convert.
    """
    bits = _pcg_hash(base + jnp.uint32(salt) * jnp.uint32(0x9E3779B9))
    i24 = jax.lax.bitcast_convert_type(bits >> jnp.uint32(8), jnp.int32)
    return i24.astype(jnp.float32) * (1.0 / 16777216.0)


def _unit_vector(base, salt: int):
    """Uniform sphere direction (cylinder projection, core/rng.py)."""
    z = 2.0 * _uniform(base, salt) - 1.0
    phi = (2.0 * math.pi) * _uniform(base, salt + 1)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return r * jnp.cos(phi), r * jnp.sin(phi), z


def _in_sphere(base, salt: int):
    ux, uy, uz = _unit_vector(base, salt)
    # no cbrt primitive in Mosaic: u^(1/3) = exp(log(u)/3), guarded at 0
    u = jnp.maximum(_uniform(base, salt + 2), 1e-12)
    r = jnp.exp(jnp.log(u) * (1.0 / 3.0))
    return r * ux, r * uy, r * uz


def _checker_albedo(prim, px, py, pz):
    s = prim["scale"]
    sines = jnp.sin(s * px) * jnp.sin(s * py) * jnp.sin(s * pz)
    odd = sines < 0.0
    c1, c2 = prim["c1"], prim["c2"]
    return (jnp.where(odd, c2[0], c1[0]), jnp.where(odd, c2[1], c1[1]),
            jnp.where(odd, c2[2], c1[2]))


def _shade_of(prim, px, py, pz, shape):
    """Albedo rgb vectors for a baked primitive at hit points."""
    if prim["checker"]:
        return _checker_albedo(prim, px, py, pz)
    c1 = prim["c1"]
    full = jnp.full(shape, c1[0]), jnp.full(shape, c1[1]), jnp.full(shape, c1[2])
    return full


def _make_kernel(bake: SceneBake, max_depth: int, t_min: float,
                 n_sphere_rows: int, record: bool = False,
                 need_p: bool = True):
    """Build the kernel function with the scene baked in.

    record=False: radiance outputs (forward rendering).
    record=True: per-bounce BounceData outputs (detached walk for the
    differentiable split — phase 2 shading stays in XLA, engine/integrator).
    The hit/cont/miss masks are packed into bits 16-18 of the mat_id output
    (one i32 store instead of four); hit points are emitted only when
    `need_p` (a scene whose used textures are all solid never reads them —
    skipping px/py/pz cuts the record HBM traffic in half).
    """

    def kernel(seed_ref, sph_ref, ox_ref, oy_ref, oz_ref,
               dx_ref, dy_ref, dz_ref, tm_ref,
               *out_refs):
        if record and need_p:
            mid_ref, px_ref, py_ref, pz_ref = out_refs
        elif record:
            (mid_ref,) = out_refs
        else:
            lr_ref, lg_ref, lb_ref = out_refs
        shape = ox_ref.shape  # (SUB, 128)
        # per-lane RNG counter base: seed mixed with the global lane id
        row_ids = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        col_ids = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        lane = (jnp.uint32(pl.program_id(0)) * jnp.uint32(TILE)
                + row_ids * jnp.uint32(LANES) + col_ids)
        rng_base = _pcg_hash(lane ^ (seed_ref[0].astype(jnp.uint32)
                                     * jnp.uint32(0x85EBCA6B)))

        def bounce(b, state):
            # `alive` is carried as a f32 mask: Mosaic cannot round-trip i1
            # vectors through the fori_loop carry (i8->i1 trunc unsupported).
            (ox, oy, oz, dx, dy, dz, tm, tr, tg, tb, lr, lg, lb, alive_f) = state
            alive = alive_f > 0.5

            # ---------------- closest hit over baked primitives ------------
            t_best = jnp.full(shape, BIG)
            nx = jnp.zeros(shape)
            ny = jnp.zeros(shape)
            nz = jnp.zeros(shape)
            kind = jnp.zeros(shape, jnp.int32)
            mid = jnp.zeros(shape, jnp.int32)
            ar = jnp.zeros(shape)
            ag = jnp.zeros(shape)
            ab = jnp.zeros(shape)
            fuzz = jnp.zeros(shape)
            ir_v = jnp.ones(shape)

            def upd(ok, t, nxx, nyy, nzz, k, m, a3, fz, irr, carry):
                t_best, nx, ny, nz, kind, mid, ar, ag, ab, fuzz, ir_v = carry
                better = ok & (t < t_best)
                t_best = jnp.where(better, t, t_best)
                nx = jnp.where(better, nxx, nx)
                ny = jnp.where(better, nyy, ny)
                nz = jnp.where(better, nzz, nz)
                kind = jnp.where(better, k, kind)
                mid = jnp.where(better, m, mid)
                ar = jnp.where(better, a3[0], ar)
                ag = jnp.where(better, a3[1], ag)
                ab = jnp.where(better, a3[2], ab)
                fuzz = jnp.where(better, fz, fuzz)
                ir_v = jnp.where(better, irr, ir_v)
                return (t_best, nx, ny, nz, kind, mid, ar, ag, ab, fuzz, ir_v)

            carry = (t_best, nx, ny, nz, kind, mid, ar, ag, ab, fuzz, ir_v)

            # rects (reference aarect.h), unrolled with literal constants
            for prim in bake.rects:
                ax = prim["axis"]
                o_k = (ox, oy, oz)[ax]
                d_k = (dx, dy, dz)[ax]
                d_safe = jnp.where(jnp.abs(d_k) < _EPS,
                                   jnp.where(d_k >= 0, _EPS, -_EPS), d_k)
                t = (prim["k"] - o_k) / d_safe
                a_ax = 1 if ax == 0 else 0
                b_ax = 1 if ax == 2 else 2
                pa = (ox, oy, oz)[a_ax] + t * (dx, dy, dz)[a_ax]
                pb = (ox, oy, oz)[b_ax] + t * (dx, dy, dz)[b_ax]
                ok = ((t >= t_min) & (pa >= prim["a0"]) & (pa <= prim["a1"])
                      & (pb >= prim["b0"]) & (pb <= prim["b1"]))
                n3 = [0.0, 0.0, 0.0]
                n3[ax] = 1.0
                px = ox + t * dx
                py = oy + t * dy
                pz = oz + t * dz
                alb = _shade_of(prim, px, py, pz, shape)
                carry = upd(ok, t, jnp.full(shape, n3[0]), jnp.full(shape, n3[1]),
                            jnp.full(shape, n3[2]), prim["kind"], prim["mat"],
                            alb, prim["fuzz"], prim["ir"], carry)

            # boxes: world->object transform + slab test (reference box.h +
            # hittable.h instance wrappers, fused)
            for prim in bake.boxes:
                c, s = prim["cos"], prim["sin"]
                offx, offy, offz = prim["off"]
                ox_t = ox - offx
                oy_t = oy - offy
                oz_t = oz - offz
                ox2 = c * ox_t - s * oz_t
                oz2 = s * ox_t + c * oz_t
                dx2 = c * dx - s * dz
                dz2 = s * dx + c * dz
                lo, hi = prim["bmin"], prim["bmax"]

                def inv(v):
                    return 1.0 / jnp.where(jnp.abs(v) < _EPS,
                                           jnp.where(v >= 0, _EPS, -_EPS), v)

                ivx, ivy, ivz = inv(dx2), inv(dy := dy), inv(dz2)
                tx0 = (lo[0] - ox2) * ivx
                tx1 = (hi[0] - ox2) * ivx
                ty0 = (lo[1] - oy_t) * ivy
                ty1 = (hi[1] - oy_t) * ivy
                tz0 = (lo[2] - oz2) * ivz
                tz1 = (hi[2] - oz2) * ivz
                tnx = jnp.minimum(tx0, tx1)
                tny = jnp.minimum(ty0, ty1)
                tnz = jnp.minimum(tz0, tz1)
                tfx = jnp.maximum(tx0, tx1)
                tfy = jnp.maximum(ty0, ty1)
                tfz = jnp.maximum(tz0, tz1)
                tn = jnp.maximum(jnp.maximum(tnx, tny), tnz)
                tf = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
                hit_iv = tf > jnp.maximum(tn, 0.0)
                t = jnp.where(tn >= t_min, tn, tf)
                ok = hit_iv & (t >= t_min)
                # face: which slab achieved the hit t
                is_x = (t == tnx) | (t == tfx)
                is_y = (t == tny) | (t == tfy)
                sx = jnp.where(dx2 >= 0, -1.0, 1.0)
                sy = jnp.where(dy >= 0, -1.0, 1.0)
                sz = jnp.where(dz2 >= 0, -1.0, 1.0)
                exiting = t == tf
                sx = jnp.where(exiting, -sx, sx)
                sy = jnp.where(exiting, -sy, sy)
                sz = jnp.where(exiting, -sz, sz)
                nobj_x = jnp.where(is_x, sx, 0.0)
                nobj_y = jnp.where(~is_x & is_y, sy, 0.0)
                nobj_z = jnp.where(~is_x & ~is_y, sz, 0.0)
                # object -> world rotation
                nwx = c * nobj_x + s * nobj_z
                nwz = -s * nobj_x + c * nobj_z
                px = ox + t * dx
                py = oy + t * dy
                pz = oz + t * dz
                alb = _shade_of(prim, px, py, pz, shape)
                carry = upd(ok, t, nwx, nobj_y, nwz, prim["kind"], prim["mat"],
                            alb, prim["fuzz"], prim["ir"], carry)

            # spheres: stream the denormalized table (scalar reads per row)
            if n_sphere_rows > 0:
                def sphere_row(i, carry):
                    c0x = sph_ref[i, 0]
                    c0y = sph_ref[i, 1]
                    c0z = sph_ref[i, 2]
                    c1x = sph_ref[i, 3]
                    c1y = sph_ref[i, 4]
                    c1z = sph_ref[i, 5]
                    tt0 = sph_ref[i, 6]
                    tt1 = sph_ref[i, 7]
                    rad = sph_ref[i, 8]
                    k_f = sph_ref[i, 9]
                    a1r = sph_ref[i, 10]
                    a1g = sph_ref[i, 11]
                    a1b = sph_ref[i, 12]
                    a2r = sph_ref[i, 13]
                    a2g = sph_ref[i, 14]
                    a2b = sph_ref[i, 15]
                    csc = sph_ref[i, 16]
                    fz = sph_ref[i, 17]
                    irr = sph_ref[i, 18]
                    is_check = sph_ref[i, 19]
                    m_id = sph_ref[i, 20]

                    denom = jnp.where(jnp.abs(tt1 - tt0) < 1e-12, 1.0, tt1 - tt0)
                    frac = (tm - tt0) / denom
                    cx = c0x + frac * (c1x - c0x)
                    cy = c0y + frac * (c1y - c0y)
                    cz = c0z + frac * (c1z - c0z)
                    ocx = ox - cx
                    ocy = oy - cy
                    ocz = oz - cz
                    a = dx * dx + dy * dy + dz * dz
                    hb = ocx * dx + ocy * dy + ocz * dz
                    cc = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
                    disc = hb * hb - a * cc
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    inv_a = 1.0 / jnp.maximum(a, _EPS)
                    near = (-hb - sq) * inv_a
                    far = (-hb + sq) * inv_a
                    has = disc > 0.0
                    t = jnp.where(has & (near >= t_min), near,
                                  jnp.where(has & (far >= t_min), far, BIG))
                    ok = t < BIG * 0.5
                    px = ox + t * dx
                    py = oy + t * dy
                    pz = oz + t * dz
                    inv_r = 1.0 / jnp.where(jnp.abs(rad) < _EPS, 1.0, rad)
                    nxx = (px - cx) * inv_r
                    nyy = (py - cy) * inv_r
                    nzz = (pz - cz) * inv_r
                    sines = jnp.sin(csc * px) * jnp.sin(csc * py) * jnp.sin(csc * pz)
                    odd = (is_check > 0.5) & (sines < 0.0)
                    alb = (jnp.where(odd, a2r, a1r), jnp.where(odd, a2g, a1g),
                           jnp.where(odd, a2b, a1b))
                    return upd(ok, t, nxx, nyy, nzz, k_f.astype(jnp.int32),
                               m_id.astype(jnp.int32), alb, fz, irr, carry)

                carry = jax.lax.fori_loop(0, n_sphere_rows, sphere_row, carry)

            (t_best, nx, ny, nz, kind, mid, ar, ag, ab, fuzz, ir_v) = carry
            hit = alive & (t_best < BIG * 0.5)
            miss = alive & ~(t_best < BIG * 0.5)

            # set_face_normal + normalize
            front = (dx * nx + dy * ny + dz * nz) < 0.0
            flip = jnp.where(front, 1.0, -1.0)
            nlen = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
            nx = nx * flip * nlen
            ny = ny * flip * nlen
            nz = nz * flip * nlen

            # background on miss
            bgr, bgg, bgb = bake.background
            lr = lr + jnp.where(miss, tr * bgr, 0.0)
            lg = lg + jnp.where(miss, tg * bgg, 0.0)
            lb = lb + jnp.where(miss, tb * bgb, 0.0)

            # emission (diffuse_light stores its emission in albedo carry)
            is_light = kind == st.DIFFUSE_LIGHT
            lit = hit & is_light
            lr = lr + jnp.where(lit, tr * ar, 0.0)
            lg = lg + jnp.where(lit, tg * ag, 0.0)
            lb = lb + jnp.where(lit, tb * ab, 0.0)

            # ---------------- scatter --------------------------------------
            salt0 = b * jnp.int32(16)
            draw = rng_base + jnp.uint32(salt0) * jnp.uint32(0x68E31DA4)
            uvx, uvy, uvz = _unit_vector(draw, 0)
            svx, svy, svz = _in_sphere(draw, 3)
            u_choice = _uniform(draw, 7)

            # lambertian: n + unit
            ldx = nx + uvx
            ldy = ny + uvy
            ldz = nz + uvz
            degen = (jnp.abs(ldx) < 1e-8) & (jnp.abs(ldy) < 1e-8) & (jnp.abs(ldz) < 1e-8)
            ldx = jnp.where(degen, nx, ldx)
            ldy = jnp.where(degen, ny, ldy)
            ldz = jnp.where(degen, nz, ldz)

            # metal: reflect(unit(d), n) + fuzz*in_sphere
            dlen = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-20))
            udx = dx * dlen
            udy = dy * dlen
            udz = dz * dlen
            dn = udx * nx + udy * ny + udz * nz
            rx = udx - 2.0 * dn * nx
            ry = udy - 2.0 * dn * ny
            rz = udz - 2.0 * dn * nz
            mdx = rx + fuzz * svx
            mdy = ry + fuzz * svy
            mdz = rz + fuzz * svz
            metal_ok = (mdx * nx + mdy * ny + mdz * nz) > 0.0

            # dielectric
            ratio = jnp.where(front, 1.0 / ir_v, ir_v)
            cos_t = jnp.minimum(-(udx * nx + udy * ny + udz * nz), 1.0)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
            cannot = ratio * sin_t > 1.0
            r0 = (1.0 - ratio) / (1.0 + ratio)
            r0 = r0 * r0
            om = 1.0 - cos_t
            om2 = om * om
            schlick = r0 + (1.0 - r0) * om2 * om2 * om
            choose_reflect = cannot | (schlick > u_choice)
            # refract
            perx = ratio * (udx + cos_t * nx)
            pery = ratio * (udy + cos_t * ny)
            perz = ratio * (udz + cos_t * nz)
            k2 = jnp.maximum(1.0 - (perx * perx + pery * pery + perz * perz), 0.0)
            par = -jnp.sqrt(k2)
            fdx = perx + par * nx
            fdy = pery + par * ny
            fdz = perz + par * nz
            ddx = jnp.where(choose_reflect, rx, fdx)
            ddy = jnp.where(choose_reflect, ry, fdy)
            ddz = jnp.where(choose_reflect, rz, fdz)

            is_metal = kind == st.METAL
            is_diel = kind == st.DIELECTRIC
            is_iso = kind == st.ISOTROPIC

            newdx = jnp.where(is_metal, mdx, ldx)
            newdy = jnp.where(is_metal, mdy, ldy)
            newdz = jnp.where(is_metal, mdz, ldz)
            newdx = jnp.where(is_diel, ddx, newdx)
            newdy = jnp.where(is_diel, ddy, newdy)
            newdz = jnp.where(is_diel, ddz, newdz)
            newdx = jnp.where(is_iso, svx, newdx)
            newdy = jnp.where(is_iso, svy, newdy)
            newdz = jnp.where(is_iso, svz, newdz)

            # (~is_metal | metal_ok): select over i1 vectors is not legal in
            # Mosaic (it would round-trip through i8), so use boolean algebra
            ok_mask = (~is_metal | metal_ok) & ~is_light
            cont = hit & ok_mask

            # throughput *= attenuation (dielectric attenuates by 1)
            tr = jnp.where(cont & ~is_diel, tr * ar, tr)
            tg = jnp.where(cont & ~is_diel, tg * ag, tg)
            tb = jnp.where(cont & ~is_diel, tb * ab, tb)

            px = ox + t_best * dx
            py = oy + t_best * dy
            pz = oz + t_best * dz
            if record:
                packed = (mid
                          | (hit.astype(jnp.int32) << 16)
                          | (cont.astype(jnp.int32) << 17)
                          | (miss.astype(jnp.int32) << 18))
                mid_ref[pl.ds(b, 1)] = packed[None]
                if need_p:
                    px_ref[pl.ds(b, 1)] = px[None]
                    py_ref[pl.ds(b, 1)] = py[None]
                    pz_ref[pl.ds(b, 1)] = pz[None]
            ox = jnp.where(hit, px, ox)
            oy = jnp.where(hit, py, oy)
            oz = jnp.where(hit, pz, oz)
            dx = jnp.where(hit, newdx, dx)
            dy = jnp.where(hit, newdy, dy)
            dz = jnp.where(hit, newdz, dz)
            return (ox, oy, oz, dx, dy, dz, tm, tr, tg, tb, lr, lg, lb,
                    jnp.where(cont, 1.0, 0.0))

        ones = jnp.ones(shape)
        zeros = jnp.zeros(shape)
        state = (ox_ref[:], oy_ref[:], oz_ref[:],
                 dx_ref[:], dy_ref[:], dz_ref[:], tm_ref[:],
                 ones, ones, ones, zeros, zeros, zeros, ones)
        state = jax.lax.fori_loop(0, max_depth, bounce, state)
        if not record:
            lr_ref[:] = state[10]
            lg_ref[:] = state[11]
            lb_ref[:] = state[12]

    return kernel


@functools.partial(jax.jit, static_argnames=("bake_key", "max_depth", "t_min",
                                             "interpret", "record", "need_p"))
def _run(bake_key, seed, sph_table, ox, oy, oz, dx, dy, dz, tm,
         max_depth, t_min, interpret, record=False, need_p=True):
    bake = _BAKES[bake_key]
    rows = ox.shape[0]
    grid = (rows // SUB,)
    n_s = sph_table.shape[0]
    kernel = _make_kernel(bake, max_depth, t_min, n_s, record=record,
                          need_p=need_p)
    ray_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if record:
        rec_spec = pl.BlockSpec((max_depth, SUB, LANES), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        rec_shape = (max_depth, rows, LANES)
        n_out = 4 if need_p else 1
        out_specs = [rec_spec] * n_out
        out_shape = (
            [jax.ShapeDtypeStruct(rec_shape, jnp.int32)]
            + [jax.ShapeDtypeStruct(rec_shape, jnp.float32)] * (n_out - 1)
        )
    else:
        out_specs = [ray_spec, ray_spec, ray_spec]
        out_shape = [jax.ShapeDtypeStruct(ox.shape, jnp.float32)] * 3
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec((max(n_s, 1), 24), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(seed, sph_table, ox, oy, oz, dx, dy, dz, tm)
    return out


# bakes are static (hashable) via an interning table keyed by id
_BAKES: dict = {}


class PallasTracer:
    """Scene-specialized megakernel tracer with the `trace` call signature."""

    def __init__(self, scene: st.Scene):
        if not supports_scene(scene):
            raise ValueError("scene uses features outside the pallas kernel set")
        self.bake = bake_scene(scene)
        self.key = ("bake", id(self.bake))
        _BAKES[self.key] = self.bake
        sph = self.bake.sphere_table
        self.sph_table = jnp.asarray(sph if len(sph) else
                                     np.zeros((1, 24), np.float32))
        self.n_rows = len(sph)
        # phase-2 shading reads hit points only for position-dependent
        # textures (checker; solid never does) — see walk()
        host = jax.device_get(scene)
        kinds = np.asarray(host.textures.kind)
        used = np.unique(np.asarray(host.materials.tex_id))
        self.need_p = bool(np.any(kinds[used] != st.TEX_SOLID))

    def _tile_args(self, o, d, tm, key):
        """Pad the ray batch to whole (SUB, LANES) tiles and split to SoA."""
        n = o.shape[0]
        rows = -(-(-(-n // LANES)) // SUB) * SUB
        pad = rows * LANES - n
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
            tm = jnp.concatenate([tm, jnp.zeros(pad, tm.dtype)])
        seed = jax.random.randint(key, (1,), 0, 2**31 - 1, jnp.int32)
        args = [a.reshape(rows, LANES) for a in
                (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tm)]
        return n, seed, args

    def __call__(self, scene, o, d, tm, key, max_depth=50, t_min=0.001):
        """Matches engine.integrator.trace's signature (scene arg unused —
        the bake is closed over)."""
        interpret = jax.default_backend() != "tpu"
        n, seed, args = self._tile_args(o, d, tm, key)
        lr, lg, lb = _run(self.key, seed, self.sph_table, *args,
                          max_depth=max_depth, t_min=t_min, interpret=interpret)
        out = jnp.stack([lr.reshape(-1), lg.reshape(-1), lb.reshape(-1)], axis=-1)
        return out[:n]

    def walk(self, o, d, tm, key, max_depth=50, t_min=0.001):
        """Phase-1 detached path walk -> engine.integrator.BounceData.

        The kernel records (mat_id, hit point, masks) per bounce; u/v are
        zeros (supported texture kinds never read them).  Feed the result to
        `engine.integrator.shade_radiance` for the differentiable phase 2.
        """
        from ..engine.integrator import BounceData

        interpret = jax.default_backend() != "tpu"
        n, seed, args = self._tile_args(o, d, tm, key)
        out = _run(
            self.key, seed, self.sph_table, *args,
            max_depth=max_depth, t_min=t_min, interpret=interpret, record=True,
            need_p=self.need_p,
        )
        flat = lambda a: a.reshape(max_depth, -1)[:, :n]
        packed = flat(out[0])
        zeros = jnp.zeros((max_depth, n), jnp.float32)
        if self.need_p:
            p = jnp.stack([flat(out[1]), flat(out[2]), flat(out[3])], axis=-1)
        else:
            p = jnp.zeros((max_depth, n, 3), jnp.float32)
        return BounceData(
            mat_id=packed & 0xFFFF, u=zeros, v=zeros, p=p,
            hit=(packed & (1 << 16)) != 0, cont=(packed & (1 << 17)) != 0,
            miss=(packed & (1 << 18)) != 0,
        )
