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

Coverage (full scene set as of round 2): spheres (static + moving),
axis-aligned rects, boxes (with rotate_y/translate instance transforms),
triangle meshes (packet traversal of a threaded flat BVH: one scalar node
cursor per ray tile, vector slab tests, any()-reductions to descend — no
vector gathers, which Mosaic lacks), constant media on sphere/box boundaries
(exponential free-path sampling with the in-kernel PCG RNG,
`constant_medium.h:34-70`), lambertian/metal/dielectric/diffuse_light/
isotropic materials, solid + checker + perlin-family (noise/turb/marble,
gather-free hash-gradient noise shared with scene/perlin.py) textures
in-kernel, sphere uv via polynomial atan2/acos (Mosaic lowers neither), and
image textures via record mode (the walk emits uv; XLA shades from the
atlas).  `supports_scene` is True for every scene; `supports_forward` is
True except when image textures are used (those route walk + XLA shade).

Texture evaluation is deferred: the closest-hit carry holds the winning
primitive's texture *parameters* (kind/c1/c2/scale), and albedo is computed
ONCE per bounce after the carry resolves — not per candidate row.

The bounce loop is a `while_loop` that exits as soon as every lane in the
tile is dead (the reference breaks per-thread, `render.h:60-79`; a vector
core exits per-tile).

Used by `engine.render.compile_renderer(engine="pallas")` for forward
rendering; the differentiable path keeps the XLA phase-2 shade (gradients
never flow through this kernel — geometry is detached by design).
"""

from __future__ import annotations

import functools
import math
import os as _os
import warnings as _warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import types as st

BIG = 1e30
SUB = 64          # sublane rows per tile -> tile = (64, 128) = 8192 rays
STEP_SUB = 32     # hit/step packet rows: (32, 128) = 4096 rays.  v5e sweep
                  # (backpack, coherent 65k wave): 8 -> 11.2 ms, 16 -> 6.6,
                  # 32 -> 5.0, 64 -> 5.7 — bigger packets amortize the
                  # scalar node walk until union growth wins at 64
LANES = 128
TILE = SUB * LANES
_EPS = 1e-12

# Perf-debug tiers (tools/roofline.py decomposition ONLY): when set, the
# kernels skip DMA and/or candidate testing and renders are WRONG by design.
# Read once at import (jit caching ignores later changes anyway) and warn
# loudly so a stray env var cannot silently corrupt normal renders.
_TRI_DEBUG = _os.environ.get("RT_TRI_DEBUG", "")
_HIT_DEBUG = _os.environ.get("RT_HIT_DEBUG", "")
if _TRI_DEBUG or _HIT_DEBUG:
    _warnings.warn(
        f"pallas_trace PERF-DEBUG tier active (RT_TRI_DEBUG={_TRI_DEBUG!r}, "
        f"RT_HIT_DEBUG={_HIT_DEBUG!r}): kernels skip work and renders are "
        "INCORRECT. Unset these unless decomposing kernel cost.",
        stacklevel=2)

# carried shading state kinds match scene.types material tags


class SceneBake(NamedTuple):
    """Host-side snapshot of everything the kernel bakes or streams.

    Primitive tables are LEAF-CONTIGUOUS: the BVH leaf at node i owns rows
    [start[i], start[i] + leaf_k) of its table (padded with rows that can
    never hit), so a leaf visit is one contiguous read — scalar VMEM loads
    for resident tables, a single DMA for HBM-streamed ones.
    """

    rects: list            # dicts of python floats
    boxes: list
    sphere_media: list     # constant-medium sphere boundaries (unrolled)
    box_media: list        # constant-medium box boundaries (unrolled)
    sphere_table: np.ndarray  # (S, 24) float32 denormalized SOLID sphere rows
    sph_nodes: np.ndarray     # (Ms, 6) float32 sphere-BVH bounds (empty = dense loop)
    sph_links: np.ndarray     # (Ms, 2) int32 threaded (hit, miss) links
    sph_start: np.ndarray     # (Ms, 1) int32 leaf start row (-1 = internal)
    sph_leaf_k: int
    tri_table: np.ndarray     # (T, 40) float32 denormalized triangle rows
    tri_nodes: np.ndarray     # (M, 6) float32 BVH node bounds (min, max)
    tri_links: np.ndarray     # (M, 2) int32 threaded (hit, miss) links
    tri_start: np.ndarray     # (M, 1) int32 leaf start row (-1 = internal)
    tri_leaf_k: int
    tri_mode: str             # "resident" | "stream" (see _bake_triangles)
    tri_geom: np.ndarray      # (R, 128) packed hit-tier geometry rows
    tri_perm: np.ndarray      # (R*_HIT_PACK,) i32 slot -> original tri id
    hit_nodes: np.ndarray     # (Mh/4, 92) hit-tier nodes, 4 records/row,
                              # each bounds|start|links8 (_HIT_NODE_PACK)
    hit_rows_per_leaf: int
    sph_hit_nodes: np.ndarray  # (Ms, 23) hit-tier SPHERE nodes:
                               # bounds|start row|links8 (empty = dense loop)
    background: tuple
    sky: bool
    digest: str            # content hash — the jit static-arg identity

    @property
    def tri_stream(self) -> bool:
        return self.tri_mode == "stream"


# triangle row column layout (see _bake_triangles)
_TRI_V0, _TRI_E1, _TRI_E2 = 0, 3, 6
_TRI_N0, _TRI_N1, _TRI_N2 = 9, 12, 15
_TRI_UV0, _TRI_UV1, _TRI_UV2 = 18, 20, 22
_TRI_KIND, _TRI_FUZZ, _TRI_IR, _TRI_MAT = 24, 25, 26, 27
_TRI_C1, _TRI_C2, _TRI_SCALE, _TRI_TEXK = 28, 31, 34, 35
_TRI_COLS = 40

# Mosaic pads a VMEM-resident (N, C) table's minor dim to 128 lanes, so a
# table costs N*512 bytes of VMEM regardless of C.  The triangle BVH's node
# data (bounds + threaded links + leaf start) is FUSED into one (M, 9) f32
# array — links/starts stored as exactly-representable floats — so a node
# costs 512 B instead of the 1536 B three separate row-major arrays would
# (round-3's 64-candidate streamed leaves existed only to keep the node side
# under budget; fusing the arrays buys leaf_k=16 at the same VMEM).  The
# resident-vs-streamed decision is made from the TOTAL footprint (table +
# fused node array), not a row count.  Budget leaves headroom for ray tiles
# + scratch.
_TRI_VMEM_BUDGET = 8 * 2**20
_TRI_LEAF_K = 4         # resident-table leaf size (unchanged from round 1)
_TRI_STREAM_LEAF_K = 16  # streamed leaf size: one DMA per visited leaf
_SPH_BVH_MIN = 64        # dense sphere loop below this many rows
_SPH_LEAF_K = 8
# ---- packed-geometry hit tier (the closest-hit kernel, `_make_hit_kernel`)
# The denormalized 40-col rows cost 512 B each (lane padding) and 28 scalar
# VMEM reads per candidate — measured on v5e: ~290 ns/candidate, chain-bound
# on the scalar loads, plus ~2.6 us DMA latency per streamed leaf.  The hit
# tier stores GEOMETRY ONLY (v0|e1|e2 = 9 f32), 14 triangles per 128-lane
# row, so a 100k-tri mesh is ~5 MB and VMEM-RESIDENT; leaves are padded to
# whole rows (leaf start is a ROW index), each visit is ROWS_PER_LEAF
# dynamic-sublane vector loads + static-lane extracts, and the winner's
# attributes (normals/uv/material) resolve OUTSIDE the kernel by one gather
# per wave (engine/wavefront.py) — the kernel never touches them.
_HIT_PACK = 14                  # triangles per geometry row (14 * 9 = 126)
_HIT_ROWS_PER_LEAF = 2          # leaf = 28 candidates, escalated if needed
_HIT_VMEM_BUDGET = 11 * 2**20   # geometry rows + node rows
# Node records COULD pack >1 per 128-lane row (rows lane-pad to 512 B), but
# measured on v5e this LOSES: the per-step subslot where-chains serialize
# the scalar walk (+3.3 ms/iter at pack=4 on the backpack steady wave,
# round 5) and the node table was not the VMEM bottleneck anyway.  Smaller
# leaves (rows_per_leaf=1) also lose (2.14 vs 3.25 Mrays/s e2e): DIVERGENT
# packets pay per-visit, and more/smaller leaves mean more visits.  Keep
# the machinery (PACK=1 compiles to plain static-lane extracts).
_HIT_NODE_PACK = 1
_HIT_NODE_COLS = 23

# sphere row column layout (see bake_scene)
_SPH_C0, _SPH_C1, _SPH_T0, _SPH_T1, _SPH_RAD, _SPH_KIND = 0, 3, 6, 7, 8, 9
_SPH_A1, _SPH_A2, _SPH_SCALE, _SPH_FUZZ, _SPH_IR = 10, 13, 16, 17, 18
_SPH_TEXK, _SPH_MAT, _SPH_UOFF = 19, 20, 21
_MAX_MEDIA = 16  # RNG salt slots reserved per bounce for media free paths


def _host_scene(scene):
    """Numpy-leaf view of a scene for host-side baking.

    SceneBuilder.build attaches its numpy snapshot to the device scene; when
    present (any builder-produced scene) baking costs zero device->host
    transfers — a per-leaf device_get through the remote-TPU tunnel costs
    ~2 s/leaf, ~2 min for a full scene.  Scenes that went through .replace()
    (e.g. diff.set_params) fall back to one bulk device_get.
    """
    host = getattr(scene, "_host_np", None)
    return host if host is not None else jax.device_get(scene)


def _used_tex_kinds_by_class(scene) -> dict:
    """{prim class: set of texture kinds bound to its active materials}."""
    out = {}
    tex_of_mat = np.asarray(scene.materials.tex_id)
    tex_kind = np.asarray(scene.textures.kind)
    for name, tbl in (("sphere", scene.spheres), ("rect", scene.rects),
                      ("box", scene.boxes), ("tri", scene.triangles)):
        act = np.asarray(tbl.active)
        mats = np.asarray(tbl.mat_id)[act]
        out[name] = {int(k) for k in np.unique(tex_kind[tex_of_mat[mats]])} \
            if mats.size else set()
    return out


def supports_scene(scene: st.Scene) -> bool:
    """True when the megakernel covers this scene's feature set in WALK
    (record) mode — the differentiable path and the two-phase forward path.

    As of round 2 this is every scene the framework can express: all
    geometry (spheres/rects/boxes/triangle-BVH), constant media, all texture
    families (image textures record uv for the XLA phase-2 shade; sphere uv
    is computed with polynomial atan2/acos).  The only cap is _MAX_MEDIA
    constant-medium boundaries (RNG salt slots per bounce) — far above any
    reference scene (cornell_smoke has 2).
    """
    host = _host_scene(scene)
    n_media = int(np.sum(np.asarray(host.spheres.medium)
                         & np.asarray(host.spheres.active)))
    n_media += int(np.sum(np.asarray(host.boxes.medium)
                          & np.asarray(host.boxes.active)))
    return n_media <= _MAX_MEDIA


def supports_forward(scene: st.Scene) -> bool:
    """True when the kernel can additionally SHADE in-kernel (pure forward
    radiance mode): everything except image textures, whose atlas lives in
    XLA (walk + phase-2 shade covers those)."""
    if not supports_scene(scene):
        return False
    by_class = _used_tex_kinds_by_class(_host_scene(scene))
    return not any(st.TEX_IMAGE in k for k in by_class.values())


def _mat_shading(scene, mat_id: int):
    """(kind, texture kind/colors/scale, fuzz, ir) host scalars for a material."""
    mats = scene.materials
    texs = scene.textures
    kind = int(np.asarray(mats.kind[mat_id]))
    tex = int(np.asarray(mats.tex_id[mat_id]))
    c1 = tuple(float(x) for x in np.asarray(texs.c1[tex]))
    c2 = tuple(float(x) for x in np.asarray(texs.c2[tex]))
    texk = int(np.asarray(texs.kind[tex]))
    scale = float(np.asarray(texs.scale[tex]))
    fuzz = float(np.asarray(mats.fuzz[mat_id]))
    ir = float(np.asarray(mats.ir[mat_id]))
    return dict(kind=kind, c1=c1, c2=c2, texk=texk, scale=scale,
                fuzz=fuzz, ir=ir, mat=int(mat_id))


def bake_scene(scene: st.Scene) -> SceneBake:
    """Snapshot the packed scene into python scalars / a dense sphere table.

    Uses the builder's numpy snapshot when present (_host_scene): any
    device_get through the TPU tunnel costs seconds per leaf."""
    scene = _host_scene(scene)
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
    box_media = []
    bx = scene.boxes
    for i in range(int(bx.bmin.shape[0])):
        if not bool(np.asarray(bx.active[i])):
            continue
        row = dict(
            bmin=tuple(float(x) for x in np.asarray(bx.bmin[i])),
            bmax=tuple(float(x) for x in np.asarray(bx.bmax[i])),
            cos=float(np.asarray(bx.cos_t[i])), sin=float(np.asarray(bx.sin_t[i])),
            off=tuple(float(x) for x in np.asarray(bx.offset[i])),
            **_mat_shading(scene, int(np.asarray(bx.mat_id[i]))),
        )
        if bool(np.asarray(bx.medium[i])):
            row["nid"] = float(np.asarray(bx.neg_inv_density[i]))
            box_media.append(row)
        else:
            boxes.append(row)

    sp = scene.spheres
    rows = []
    sphere_media = []
    for i in range(int(sp.radius.shape[0])):
        if not bool(np.asarray(sp.active[i])):
            continue
        sh = _mat_shading(scene, int(np.asarray(sp.mat_id[i])))
        c0 = np.asarray(sp.center0[i])
        c1v = np.asarray(sp.center1[i])
        if bool(np.asarray(sp.medium[i])):
            sphere_media.append(dict(
                c0=tuple(float(x) for x in c0),
                c1=tuple(float(x) for x in c1v),
                t0=float(np.asarray(sp.time0[i])),
                t1=float(np.asarray(sp.time1[i])),
                radius=float(np.asarray(sp.radius[i])),
                nid=float(np.asarray(sp.neg_inv_density[i])), **sh,
            ))
            continue
        rows.append([
            c0[0], c0[1], c0[2], c1v[0], c1v[1], c1v[2],
            float(np.asarray(sp.time0[i])), float(np.asarray(sp.time1[i])),
            float(np.asarray(sp.radius[i])), float(sh["kind"]),
            sh["c1"][0], sh["c1"][1], sh["c1"][2],
            sh["c2"][0], sh["c2"][1], sh["c2"][2],
            sh["scale"], sh["fuzz"], sh["ir"], float(sh["texk"]),
            float(sh["mat"]), float(np.asarray(sp.u_off[i])),  # uv phase
            0.0, 0.0,  # pad to 24 columns
        ])
    table = (np.asarray(rows, np.float32) if rows
             else np.zeros((0, 24), np.float32))
    # Sphere-heavy scenes (big_scene1: ~484) get a packet-walked BVH like
    # triangles; small scenes keep the cheaper dense candidate loop.
    sph_nodes = np.zeros((0, 6), np.float32)
    sph_links = np.zeros((0, 2), np.int32)
    sph_start = np.full((0, 1), -1, np.int32)
    sph_hit_nodes = np.zeros((0, 23), np.float32)
    if len(table) > _SPH_BVH_MIN:
        from ..accel import bvh as bvh_mod

        c0s = table[:, _SPH_C0:_SPH_C0 + 3]
        c1s = table[:, _SPH_C1:_SPH_C1 + 3]
        rr = np.abs(table[:, _SPH_RAD:_SPH_RAD + 1])
        # moving spheres: union of the t0/t1 boxes (moving_sphere.h bbox)
        bvh = bvh_mod.build(np.minimum(c0s, c1s) - rr,
                            np.maximum(c0s, c1s) + rr, leaf_size=_SPH_LEAF_K)
        table, sph_nodes, sph_links, sph_start = _leaf_contiguous(
            table, bvh, _SPH_LEAF_K)
        # hit-tier sphere nodes: bounds | leaf start row | 8 octant link
        # pairs — same walk layout as the triangle hit tier, so the pure
        # closest-hit kernel can packet-walk sphere-heavy scenes
        # (big_scene1) instead of reporting supports_hit == False
        sph_hit_nodes = np.concatenate(
            [sph_nodes, sph_start.astype(np.float32),
             _octant_links(bvh)], axis=1)
    (tri_table, tri_nodes, tri_links, tri_start, tri_leaf_k, tri_mode,
     tri_geom, tri_perm, hit_nodes, hit_rows) = _bake_triangles(scene)
    bg = tuple(float(x) for x in np.asarray(scene.background))

    h = __import__("hashlib").sha256()
    for part in (rects, boxes, sphere_media, box_media, bg,
                 tri_leaf_k, tri_mode, hit_rows, _SPH_LEAF_K):
        h.update(repr(part).encode())
    for arr in (table, sph_nodes, sph_links, sph_start, sph_hit_nodes,
                tri_table, tri_nodes, tri_links, tri_start,
                tri_geom, tri_perm, hit_nodes):
        h.update(str(arr.shape).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return SceneBake(rects=rects, boxes=boxes, sphere_media=sphere_media,
                     box_media=box_media, sphere_table=table,
                     sph_nodes=sph_nodes, sph_links=sph_links,
                     sph_start=sph_start, sph_leaf_k=_SPH_LEAF_K,
                     tri_table=tri_table, tri_nodes=tri_nodes,
                     tri_links=tri_links, tri_start=tri_start,
                     tri_leaf_k=tri_leaf_k, tri_mode=tri_mode,
                     tri_geom=tri_geom, tri_perm=tri_perm,
                     hit_nodes=hit_nodes, hit_rows_per_leaf=hit_rows,
                     sph_hit_nodes=sph_hit_nodes,
                     background=bg, sky=bg != (0.0, 0.0, 0.0),
                     digest=h.hexdigest())


def _leaf_contiguous(rows: np.ndarray, bvh, leaf_k: int):
    """Reorder primitive rows so each BVH leaf owns a fixed contiguous slot.

    Returns (table, nodes, links, start) where table row `start[i] + k` is
    leaf i's k-th primitive (slots past the leaf's count hold an all-zero row,
    which no candidate test can accept: triangles fail |det| > 1e-7, spheres
    fail radius != 0).  One contiguous range per leaf is what makes the visit
    a single DMA in streamed mode and branch-free scalar reads otherwise.
    """
    lp = np.asarray(bvh.leaf_prims)
    m = lp.shape[0]
    assert lp.shape[1] <= leaf_k
    start = np.full((m, 1), -1, np.int32)
    leaf_nodes = np.nonzero(lp[:, 0] >= 0)[0]
    start[leaf_nodes, 0] = (np.arange(len(leaf_nodes), dtype=np.int32)
                            * leaf_k)
    flat = np.full((len(leaf_nodes), leaf_k), -1, np.int64)
    flat[:, : lp.shape[1]] = lp[leaf_nodes]
    flat = flat.reshape(-1)
    rows_pad = np.concatenate(
        [rows, np.zeros((1, rows.shape[1]), rows.dtype)], axis=0)
    src = np.where(flat >= 0, flat, rows.shape[0])
    table = rows_pad[src]
    nodes = np.concatenate([np.asarray(bvh.node_min, np.float32),
                            np.asarray(bvh.node_max, np.float32)], axis=1)
    links = np.stack([np.asarray(bvh.hit_link, np.int32),
                      np.asarray(bvh.miss_link, np.int32)], axis=1)
    return table, nodes, links, start


def _bake_triangles(scene):
    """Denormalized triangle rows + flat threaded BVH arrays (host numpy).

    Row layout (40 f32): v0 e1 e2 | n0 n1 n2 (face normal replicated when no
    vertex normals — interpolation is then the constant) | uv0 uv1 uv2 |
    kind fuzz ir mat | c1 c2 scale checker | pad.  The table is reordered
    leaf-contiguous (see _leaf_contiguous); when the resident footprint
    (table + node arrays, _tri_vmem_bytes) exceeds _TRI_VMEM_BUDGET the table
    stays in HBM and the walk DMAs one leaf at a time.

    Returns (table, nodes, links, start, leaf_k, stream).
    """
    tr = scene.triangles
    act = np.asarray(tr.active)
    n_all = act.shape[0]
    if not act.any():
        # 0-row dummies; the kernel skips the walk entirely when the tracer
        # reports n_tri_nodes == 0
        return (np.zeros((0, _TRI_COLS), np.float32),
                np.zeros((0, 6), np.float32),
                np.zeros((0, 2), np.int32), np.full((0, 1), -1, np.int32),
                _TRI_LEAF_K, "resident",
                np.zeros((0, LANES), np.float32),
                np.zeros((0,), np.int32),
                np.zeros((0, _HIT_NODE_PACK * _HIT_NODE_COLS), np.float32),
                _HIT_ROWS_PER_LEAF)

    rows = np.zeros((n_all, _TRI_COLS), np.float32)
    v0 = np.asarray(tr.v0, np.float32)
    e1 = np.asarray(tr.e1, np.float32)
    e2 = np.asarray(tr.e2, np.float32)
    rows[:, _TRI_V0:_TRI_V0 + 3] = v0
    rows[:, _TRI_E1:_TRI_E1 + 3] = e1
    rows[:, _TRI_E2:_TRI_E2 + 3] = e2
    has_vn = np.asarray(tr.has_vn)[:, None]
    # reference face-normal order is cross(e2, e1) (triangle.h:34-41 via
    # engine.intersect.tri_record); set_face_normal later flips it anyway
    face_n = np.cross(e2, e1).astype(np.float32)
    for col, nn in ((_TRI_N0, tr.n0), (_TRI_N1, tr.n1), (_TRI_N2, tr.n2)):
        rows[:, col:col + 3] = np.where(has_vn, np.asarray(nn, np.float32),
                                        face_n)
    for col, uv in ((_TRI_UV0, tr.uv0), (_TRI_UV1, tr.uv1), (_TRI_UV2, tr.uv2)):
        rows[:, col:col + 2] = np.asarray(uv, np.float32)
    # Denormalized shading columns, vectorized: per-material values computed
    # from the material/texture tables once, broadcast by fancy indexing
    # (the per-row _mat_shading loop took seconds at 100k tris).
    mat_ids = np.asarray(tr.mat_id)
    mats, texs = scene.materials, scene.textures
    mkind = np.asarray(mats.kind, np.float32)
    mtex = np.asarray(mats.tex_id)
    tex = mtex[mat_ids]
    rows[:, _TRI_KIND] = mkind[mat_ids]
    rows[:, _TRI_FUZZ] = np.asarray(mats.fuzz, np.float32)[mat_ids]
    rows[:, _TRI_IR] = np.asarray(mats.ir, np.float32)[mat_ids]
    rows[:, _TRI_MAT] = mat_ids.astype(np.float32)
    rows[:, _TRI_C1:_TRI_C1 + 3] = np.asarray(texs.c1, np.float32)[tex]
    rows[:, _TRI_C2:_TRI_C2 + 3] = np.asarray(texs.c2, np.float32)[tex]
    rows[:, _TRI_SCALE] = np.asarray(texs.scale, np.float32)[tex]
    rows[:, _TRI_TEXK] = np.asarray(texs.kind, np.float32)[tex]

    # Build the kernel's own BVH over active triangles (leaf size differs
    # from the XLA traversal's scene.tri_bvh; the reorder needs leaf-slot
    # layout anyway).  Host numpy / native SAH — ~100k tris is fast.
    from ..accel import bvh as bvh_mod

    keep = np.nonzero(act)[0]
    v1 = v0 + e1
    v2 = v0 + e2
    bmin = np.minimum(np.minimum(v0, v1), v2)
    bmax = np.maximum(np.maximum(v0, v1), v2)
    flat = (bmax - bmin) < 1e-6
    bmin = np.where(flat, bmin - bvh_mod.BBOX_PAD, bmin)
    bmax = np.where(flat, bmax + bvh_mod.BBOX_PAD, bmax)

    from ..utils.profiling import logger

    packed = _bake_tri_packed(rows[:, :9], keep, bmin, bmax)

    # Decision chain: row-major resident (leaf_k=4, cheapest candidate
    # count) -> HBM streaming (fused node array resident, leaves DMA'd).
    fits_resident = len(keep) * 512 <= _TRI_VMEM_BUDGET
    if fits_resident:
        bvh = bvh_mod.build(bmin[keep], bmax[keep], leaf_size=_TRI_LEAF_K)
        table, nodes, links, start = _leaf_contiguous(rows[keep], bvh,
                                                      _TRI_LEAF_K)
        if _tri_vmem_bytes(len(table), len(nodes),
                           "resident") <= _TRI_VMEM_BUDGET:
            return (table, nodes, links, start, _TRI_LEAF_K, "resident",
                    *packed)
    # streamed: smallest leaf whose fused node array fits the VMEM budget
    # (fewer candidates per visited leaf beats fewer DMAs — the sorted
    # wavefront keeps visit counts low)
    leaf_k = _TRI_STREAM_LEAF_K
    while True:
        bvh = bvh_mod.build(bmin[keep], bmax[keep], leaf_size=leaf_k)
        table, nodes, links, start = _leaf_contiguous(rows[keep], bvh, leaf_k)
        node_bytes = _tri_vmem_bytes(0, len(nodes), "stream", leaf_k=leaf_k)
        if node_bytes <= _TRI_VMEM_BUDGET or leaf_k >= 1024:
            break
        leaf_k *= 2
    logger.debug("tri bake: %d tris streamed, %d nodes, leaf_k=%d, "
                 "%.1f MB VMEM node-side",
                 len(keep), len(nodes), leaf_k, node_bytes / 2**20)
    return table, nodes, links, start, leaf_k, "stream", *packed


def _bake_tri_packed(geom9: np.ndarray, keep: np.ndarray,
                     bmin: np.ndarray, bmax: np.ndarray):
    """Hit-tier bake: geometry-only packed rows + slot->id perm + fused BVH.

    geom9: (n_all, 9) v0|e1|e2 columns; keep: active row indices; bmin/bmax:
    per-triangle AABBs over ALL rows.  Leaves are padded to whole geometry
    rows (_HIT_PACK triangles each) so every candidate read is a
    dynamic-SUBLANE row load + STATIC-lane extract — the layout Mosaic can
    lower, unlike dynamic-lane scalar reads (the round-3 tpose dead end).
    Escalates rows-per-leaf until geometry + nodes fit _HIT_VMEM_BUDGET.
    Returns (geom_rows (R, 128) f32, perm (slots,) i32, nodes
    (ceil(M/4), 92) f32 — _HIT_NODE_PACK records per row, each
    [bounds | leaf start row | 8 octant link pairs, see _octant_links] —
    rows_per_leaf).
    """
    from ..accel import bvh as bvh_mod

    keep = np.asarray(keep)
    rows_per_leaf = _HIT_ROWS_PER_LEAF
    while True:
        leaf_k = rows_per_leaf * _HIT_PACK
        bvh = bvh_mod.build(bmin[keep], bmax[keep], leaf_size=leaf_k)
        lp = np.asarray(bvh.leaf_prims)
        m = lp.shape[0]
        leaf_nodes = np.nonzero(lp[:, 0] >= 0)[0]
        nl = len(leaf_nodes)
        vmem = (nl * rows_per_leaf + -(-m // _HIT_NODE_PACK)) * 512
        if vmem <= _HIT_VMEM_BUDGET or rows_per_leaf >= 64:
            break
        rows_per_leaf *= 2

    sel = np.full((nl, leaf_k), -1, np.int64)
    sel[:, : lp.shape[1]] = lp[leaf_nodes]
    gk = geom9[keep].astype(np.float32)        # (nk, 9)
    gk_pad = np.concatenate([gk, np.zeros((1, 9), np.float32)])
    src = np.where(sel >= 0, sel, len(gk)).reshape(-1)
    slots = gk_pad[src]                         # (nl * leaf_k, 9)
    perm = np.where(sel >= 0, keep[np.clip(sel, 0, None)],
                    -1).astype(np.int32).reshape(-1)
    geom_rows = slots.reshape(nl * rows_per_leaf, _HIT_PACK * 9)
    geom_rows = np.pad(geom_rows,
                       ((0, 0), (0, LANES - _HIT_PACK * 9))).astype(np.float32)
    start = np.full(m, -1.0, np.float32)        # leaf start as ROW index
    start[leaf_nodes] = (np.arange(nl) * rows_per_leaf).astype(np.float32)
    links8 = _octant_links(bvh)                 # (m, 16) f32
    # node record (23): bounds | start row | 8 octant (hit, miss) link pairs
    nodes = np.concatenate(
        [np.asarray(bvh.node_min, np.float32),
         np.asarray(bvh.node_max, np.float32),
         start[:, None], links8], axis=1)
    # per-ROW bounding boxes in the node record's spare lanes (the row
    # lane-pads to 512 B regardless): cols 23+6r..29+6r bound geometry row
    # r of the leaf.  The kernel tests them before each row's _HIT_PACK
    # candidates — a whole-row skip costs one any() (the round-3
    # PER-CANDIDATE gate lost 2x because the any() overhead matched one
    # candidate; amortized over 14 it wins), and padding rows (empty box)
    # skip for free.  Only baked when they fit next to the 23 base cols.
    if _HIT_NODE_PACK == 1 and 23 + 6 * rows_per_leaf <= LANES:
        tri9 = slots.reshape(nl, rows_per_leaf, _HIT_PACK, 9)
        valid = (sel >= 0).reshape(nl, rows_per_leaf, _HIT_PACK)
        v0 = tri9[..., 0:3]
        v1 = v0 + tri9[..., 3:6]
        v2 = v0 + tri9[..., 6:9]
        tmin = np.minimum(np.minimum(v0, v1), v2)
        tmax = np.maximum(np.maximum(v0, v1), v2)
        big = np.float32(3e38)
        tmin = np.where(valid[..., None], tmin, big)
        tmax = np.where(valid[..., None], tmax, -big)
        row_lo = tmin.min(axis=2)               # (nl, rows_per_leaf, 3)
        row_hi = tmax.max(axis=2)
        rb = np.concatenate([row_lo, row_hi], axis=-1)  # (nl, R, 6)
        row_bb = np.zeros((m, 6 * rows_per_leaf), np.float32)
        row_bb[:, 0::6] = big                   # empty box for internals
        row_bb[:, 3::6] = -big
        row_bb[leaf_nodes] = rb.reshape(nl, -1)
        nodes = np.concatenate([nodes, row_bb], axis=1)
    # pack _HIT_NODE_PACK records per VMEM row (rows lane-pad to 512 B, so
    # only the ROW count costs memory); pad with -1 terminator records.
    # PACK == 1 keeps records as-is (incl. the optional row-bbox cols).
    if _HIT_NODE_PACK > 1:
        m4 = -(-m // _HIT_NODE_PACK) * _HIT_NODE_PACK
        nodes = np.concatenate(
            [nodes, np.full((m4 - m, nodes.shape[1]), -1.0, np.float32)])
        nodes = nodes.reshape(m4 // _HIT_NODE_PACK,
                              _HIT_NODE_PACK * nodes.shape[1])
    return geom_rows, perm, nodes, rows_per_leaf


def _octant_links(bvh) -> np.ndarray:
    """Eight threadings of the BVH, one per ray-direction octant, each
    visiting the NEAR child first along the separating axis of its children.

    The preorder threading (accel/bvh.py) fixes child order at build time;
    closest-hit pruning then only kicks in after far geometry was already
    tested.  With direction-ordered links the walk reaches the near surface
    first, t_best tightens immediately, and occluded subtrees prune — the
    stackless analogue of ordered traversal (the reference's cursor walk has
    no ordering either, `bvh.h:348-436`).  The wavefront driver sorts rays
    by octant, so a packet shares one ordering; a mixed packet merely loses
    some pruning (any octant's threading is complete and correct).

    Returns (m, 16) f32: octant o's (hit_link, miss_link) at cols 2o, 2o+1.
    """
    hit0 = np.asarray(bvh.hit_link)
    miss0 = np.asarray(bvh.miss_link)
    m = len(hit0)
    leaf = np.asarray(bvh.leaf_prims)[:, 0] >= 0
    # children in preorder threading: first = i+1, second = miss(i+1)
    c1 = np.arange(1, m + 1)
    c2 = np.where(~leaf, miss0[np.clip(c1, 0, m - 1)], -1)
    cen = 0.5 * (np.asarray(bvh.node_min) + np.asarray(bvh.node_max))
    out = np.zeros((m, 16), np.float32)
    for oct_ in range(8):
        neg = np.array([oct_ & 4, oct_ & 2, oct_ & 1]) != 0
        hit = np.full(m, -1, np.int64)
        miss = np.full(m, -1, np.int64)
        # iterative preorder threading with per-node child order
        stack = [(0, -1)]
        while stack:
            i, succ = stack.pop()
            miss[i] = succ
            if leaf[i]:
                hit[i] = succ
                continue
            a, b = int(c1[i]), int(c2[i])
            axis = int(np.argmax(np.abs(cen[b] - cen[a])))
            if (cen[b][axis] < cen[a][axis]) != neg[axis]:
                a, b = b, a     # b-side is nearer for this octant
            hit[i] = a
            stack.append((b, succ))
            stack.append((a, b))
        out[:, 2 * oct_] = hit.astype(np.float32)
        out[:, 2 * oct_ + 1] = miss.astype(np.float32)
    return out


def _tri_vmem_bytes(n_table_rows: int, n_nodes: int, mode: str,
                    leaf_k: int = _TRI_STREAM_LEAF_K) -> int:
    """Estimated VMEM cost of the kernel's triangle-side arrays.

    Every row-major row lane-pads to 128 lanes (512 B); nodes/links/start
    fuse into ONE (M, 9) f32 array (512 B/node); streamed mode holds the
    leaf scratch block (leaf_k rows — escalation grows it, so the caller
    must pass its candidate leaf_k) instead of the table."""
    scratch = leaf_k * 512 if mode == "stream" else 0
    return (n_table_rows + n_nodes) * 512 + scratch


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


def _atan_unit(z):
    """atan(z) for |z| <= 1 — Abramowitz & Stegun 4.4.49 polynomial
    (|err| < 1e-5 rad).  Mosaic lowers no inverse-trig primitives; texture uv
    needs ~1e-4 accuracy, far below a texel at any atlas size."""
    z2 = z * z
    return z * (0.9998660
                + z2 * (-0.3302995
                        + z2 * (0.1801410
                                + z2 * (-0.0851330 + z2 * 0.0208351))))


def _atan2_poly(y, x):
    """Full-quadrant atan2 from the |z|<=1 core via range reduction."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, 1e-30)
    r = _atan_unit(z)
    r = jnp.where(ay > ax, (math.pi / 2) - r, r)
    r = jnp.where(x < 0.0, math.pi - r, r)
    return jnp.where(y < 0.0, -r, r)


def _acos_poly(x):
    """acos(x) = atan2(sqrt(1 - x^2), x)."""
    s = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    return _atan2_poly(s, x)


# ----- hash-gradient perlin (identical math to scene/perlin.py, on
# component arrays so the kernel never forms an (..., 3) axis) -----------


def _hash3(i, j, k):
    x = (i.astype(jnp.uint32) * jnp.uint32(0x8DA6B343)
         ^ j.astype(jnp.uint32) * jnp.uint32(0xD8163841)
         ^ k.astype(jnp.uint32) * jnp.uint32(0xCB1AB31F))
    return _pcg_hash(x)


def _grad_dot(h, x, y, z):
    h = (h & jnp.uint32(15)).astype(jnp.int32)
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    u = jnp.where((h & 1) == 0, u, -u)
    v = jnp.where((h & 2) == 0, v, -v)
    return u + v


_PERLIN_NORM = 1.0 / 1.15  # scene/perlin.py _NORM — keep in sync


def _noise3(px, py, pz):
    """Hash-gradient perlin noise on component arrays (scene/perlin.py)."""
    fx, fy, fz = jnp.floor(px), jnp.floor(py), jnp.floor(pz)
    u, v, w = px - fx, py - fy, pz - fz
    i, j, k = fx.astype(jnp.int32), fy.astype(jnp.int32), fz.astype(jnp.int32)
    uu = u * u * (3.0 - 2.0 * u)
    vv = v * v * (3.0 - 2.0 * v)
    ww = w * w * (3.0 - 2.0 * w)
    accum = jnp.zeros_like(u)
    for di in (0, 1):
        wi = uu if di else (1.0 - uu)
        for dj in (0, 1):
            wj = vv if dj else (1.0 - vv)
            for dk in (0, 1):
                wk = ww if dk else (1.0 - ww)
                g = _grad_dot(_hash3(i + di, j + dj, k + dk),
                              u - di, v - dj, w - dk)
                accum = accum + wi * wj * wk * g
    return accum * _PERLIN_NORM


def _turb3(px, py, pz, depth=7):
    accum = jnp.zeros_like(px)
    weight = 1.0
    for _ in range(depth):
        accum = accum + weight * _noise3(px, py, pz)
        weight *= 0.5
        px, py, pz = px * 2.0, py * 2.0, pz * 2.0
    return jnp.abs(accum)


def _deferred_albedo(tex_kinds, texk, scale, c1r, c1g, c1b, c2r, c2g, c2b,
                     px, py, pz):
    """Deferred texture evaluation on resolved-winner planes (once per
    bounce, not per candidate).  solid: c1.  checker: sign-of-sines select
    (texture.h:26-46).  perlin family: hash-gradient noise (scene/perlin.py).
    Unused families compile away (tex_kinds is the static bake-time set).
    The fused-VJP backward (engine/fused_diff.py's closed-form XLA adjoint)
    reproduces identical albedo values from the recorded planes."""
    ar, ag, ab = c1r, c1g, c1b
    if st.TEX_CHECKER in tex_kinds:
        sines = (jnp.sin(scale * px) * jnp.sin(scale * py)
                 * jnp.sin(scale * pz))
        odd = (texk == st.TEX_CHECKER) & (sines < 0.0)
        ar = jnp.where(odd, c2r, ar)
        ag = jnp.where(odd, c2g, ag)
        ab = jnp.where(odd, c2b, ab)
    if tex_kinds & {st.TEX_NOISE, st.TEX_TURB, st.TEX_MARBLE}:
        spx, spy, spz = scale * px, scale * py, scale * pz
        turb_v = _turb3(spx, spy, spz)
        if st.TEX_NOISE in tex_kinds:
            gray = 0.5 * (1.0 + _noise3(spx, spy, spz))
            sel = texk == st.TEX_NOISE
            ar = jnp.where(sel, gray, ar)
            ag = jnp.where(sel, gray, ag)
            ab = jnp.where(sel, gray, ab)
        if st.TEX_TURB in tex_kinds:
            sel = texk == st.TEX_TURB
            ar = jnp.where(sel, turb_v, ar)
            ag = jnp.where(sel, turb_v, ag)
            ab = jnp.where(sel, turb_v, ab)
        if st.TEX_MARBLE in tex_kinds:
            marble = 0.5 * (1.0 + jnp.sin(scale * pz + 10.0 * turb_v))
            sel = texk == st.TEX_MARBLE
            ar = jnp.where(sel, marble, ar)
            ag = jnp.where(sel, marble, ag)
            ab = jnp.where(sel, marble, ab)
    return ar, ag, ab


def _make_kernel(bake: SceneBake, max_depth: int, t_min: float,
                 record: bool = False, need_p: bool = True,
                 need_uv: bool = False, shade: bool | None = None,
                 cam: tuple | None = None, rr_start: int = 0,
                 sub: int = SUB):
    """Build the kernel function with the scene baked in.

    record=False: radiance outputs (forward rendering).
    record=True: per-bounce BounceData outputs (detached walk for the
    differentiable split — phase 2 shading stays in XLA, engine/integrator).
    shade (default: not record): also accumulate radiance in-kernel.
    record=True, shade=True is the fused differentiable forward: radiance
    comes out of THIS kernel while the packed planes become the custom-VJP
    residual (engine/fused_diff.py).
    cam (static tuple, see _cam_tuple): generate the camera rays IN-KERNEL
    from a per-wave base pixel index instead of taking 7 ray planes — the
    XLA-side ray generation (threefry jitter + lens sampling + 7 HBM planes)
    measured ~90-140us per 65k-ray wave, more than the walk itself
    (tools/roofline.py).  Thin-lens + motion-blur sampling per the reference
    `camera.h:49-58`, drawn from the in-kernel PCG stream.
    The hit/cont/miss masks are packed into bits 16-18 of the mat_id output
    (one i32 store instead of four); hit points are emitted only when
    `need_p` (a scene whose used textures are all solid never reads them —
    skipping px/py/pz cuts the record HBM traffic in half) and uv only when
    `need_uv` (image textures on rects/triangles).

    Triangles traverse a threaded flat BVH in PACKET form — the TPU-native
    answer to per-ray pointer chasing (reference `bvh.h:348-436`): the whole
    (sub, 128) ray tile walks with ONE scalar node cursor; node bounds are
    scalar VMEM reads, the slab test is vector math over the tile, and a
    `jnp.any` reduction decides descend-vs-skip.  Coherent tiles visit only
    the subtree their rays touch; there are no vector gathers (Mosaic has
    none).

    `sub` sets the tile's sublane rows (grid = rows / sub).
    """
    if shade is None:
        shade = not record
    # texture families the scene actually uses — unused ones compile away
    tex_kinds = {int(p["texk"]) for p in
                 (bake.rects + bake.boxes + bake.sphere_media + bake.box_media)}
    if len(bake.sphere_table):
        tex_kinds |= {int(k) for k in
                      np.unique(bake.sphere_table[:, _SPH_TEXK])}
    if len(bake.tri_table):
        tex_kinds |= {int(k) for k in np.unique(bake.tri_table[:, _TRI_TEXK])}

    n_sphere_rows = len(bake.sphere_table)
    n_sph_nodes = len(bake.sph_nodes)
    sph_leaf_k = bake.sph_leaf_k
    n_tri_nodes = len(bake.tri_nodes)
    tri_leaf_k = bake.tri_leaf_k
    tri_mode = bake.tri_mode
    tri_stream = tri_mode == "stream"

    def kernel(seed_ref, sph_ref, snode_ref, slink_ref, sstart_ref,
               tri_ref, tnode_ref, *tail):
        if cam is None:
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             tm_ref) = tail[:7]
            rest = tail[7:]
        else:
            pix_ref = tail[0]
            rest = tail[1:]
        if tri_stream:
            tri_scratch, tri_sem = rest[-2], rest[-1]
            out_refs = rest[:-2]
        else:
            out_refs = rest
        it = iter(out_refs)
        if shade:
            lr_ref, lg_ref, lb_ref = next(it), next(it), next(it)
        if record:
            mid_ref = next(it)
            px_ref = py_ref = pz_ref = cu_ref = cv_ref = None
            if need_p:
                px_ref, py_ref, pz_ref = next(it), next(it), next(it)
            if need_uv:
                cu_ref, cv_ref = next(it), next(it)
        shape = (sub, LANES)
        # per-lane RNG counter base: seed mixed with the global lane id
        row_ids = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        col_ids = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        lane = (jnp.uint32(pl.program_id(0)) * jnp.uint32(sub * LANES)
                + row_ids * jnp.uint32(LANES) + col_ids)
        rng_base = _pcg_hash(lane ^ (seed_ref[0].astype(jnp.uint32)
                                     * jnp.uint32(0x85EBCA6B)))

        def bounce(b, state):
            # `alive` is carried as a f32 mask: Mosaic cannot round-trip i1
            # vectors through the fori_loop carry (i8->i1 trunc unsupported).
            (ox, oy, oz, dx, dy, dz, tm, tr, tg, tb, lr, lg, lb, alive_f) = state
            alive = alive_f > 0.5

            # ---------------- closest hit over baked primitives ------------
            # The carry holds the winning primitive's texture PARAMETERS
            # (kind/c1/c2/scale), not its albedo: textures evaluate once per
            # bounce after the carry resolves, not per candidate row.
            zeros_v = jnp.zeros(shape)
            carry = (jnp.full(shape, BIG),              # t_best
                     zeros_v, zeros_v, zeros_v,          # outward normal
                     jnp.zeros(shape, jnp.int32),        # material kind
                     jnp.zeros(shape, jnp.int32),        # mat id
                     zeros_v, zeros_v, zeros_v,           # texture c1
                     zeros_v, zeros_v, zeros_v,           # texture c2
                     zeros_v,                             # texture scale
                     jnp.zeros(shape, jnp.int32),         # texture kind
                     zeros_v, jnp.ones(shape),            # fuzz, ir
                     zeros_v, zeros_v,                    # u, v
                     zeros_v)                             # is_sphere (uv late)

            def upd(ok, t, nxx, nyy, nzz, k, m, c1, c2, scl, texk, fz, irr,
                    carry, uu=None, vv=None, is_sph=0.0):
                (t_best, nx, ny, nz, kind, mid, c1r, c1g, c1b, c2r, c2g, c2b,
                 scale, tex, fuzz, ir_v, cu, cv, sphf) = carry
                better = ok & (t < t_best)
                t_best = jnp.where(better, t, t_best)
                nx = jnp.where(better, nxx, nx)
                ny = jnp.where(better, nyy, ny)
                nz = jnp.where(better, nzz, nz)
                kind = jnp.where(better, k, kind)
                mid = jnp.where(better, m, mid)
                c1r = jnp.where(better, c1[0], c1r)
                c1g = jnp.where(better, c1[1], c1g)
                c1b = jnp.where(better, c1[2], c1b)
                c2r = jnp.where(better, c2[0], c2r)
                c2g = jnp.where(better, c2[1], c2g)
                c2b = jnp.where(better, c2[2], c2b)
                scale = jnp.where(better, scl, scale)
                tex = jnp.where(better, texk, tex)
                fuzz = jnp.where(better, fz, fuzz)
                ir_v = jnp.where(better, irr, ir_v)
                if need_uv and uu is not None:
                    cu = jnp.where(better, uu, cu)
                    cv = jnp.where(better, vv, cv)
                if need_uv:
                    sphf = jnp.where(better, is_sph, sphf)
                return (t_best, nx, ny, nz, kind, mid, c1r, c1g, c1b,
                        c2r, c2g, c2b, scale, tex, fuzz, ir_v, cu, cv, sphf)

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
                if need_uv:
                    # uv from rect coords (reference aarect.h uv; matches
                    # engine.intersect._rect_record)
                    uu = (pa - prim["a0"]) / max(prim["a1"] - prim["a0"], _EPS)
                    vv = (pb - prim["b0"]) / max(prim["b1"] - prim["b0"], _EPS)
                else:
                    uu = vv = None
                carry = upd(ok, t, jnp.full(shape, n3[0]), jnp.full(shape, n3[1]),
                            jnp.full(shape, n3[2]), prim["kind"], prim["mat"],
                            prim["c1"], prim["c2"], prim["scale"], prim["texk"],
                            prim["fuzz"], prim["ir"], carry, uu, vv)

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
                carry = upd(ok, t, nwx, nobj_y, nwz, prim["kind"], prim["mat"],
                            prim["c1"], prim["c2"], prim["scale"], prim["texk"],
                            prim["fuzz"], prim["ir"], carry)

            # shared slab-test reciprocals for the packet walks
            if n_sph_nodes > 0 or n_tri_nodes > 0:
                def inv_safe(v):
                    return 1.0 / jnp.where(jnp.abs(v) < _EPS,
                                           jnp.where(v >= 0, _EPS, -_EPS), v)

                ivx = inv_safe(dx)
                ivy = inv_safe(dy)
                ivz = inv_safe(dz)

            def packet_walk(read_node, read_link, read_start, leaf_fn, carry):
                """Threaded-BVH walk in PACKET form — the TPU-native answer
                to per-ray pointer chasing (reference `bvh.h:348-436`): the
                whole (SUB, 128) tile walks with ONE scalar node cursor; node
                bounds are scalar VMEM reads (via reader lambdas so the node
                arrays may be row-major (M, C) or transposed (C, M)), the
                slab test is vector math over the tile, and a `jnp.any`
                reduction decides descend vs skip (hit_link vs miss_link;
                preorder links only move forward, so the walk terminates)."""
                def wcond(state):
                    return state[0] >= 0

                def wbody(state):
                    node = state[0]
                    carry = state[1:]
                    lo_x = read_node(node, 0)
                    lo_y = read_node(node, 1)
                    lo_z = read_node(node, 2)
                    hi_x = read_node(node, 3)
                    hi_y = read_node(node, 4)
                    hi_z = read_node(node, 5)
                    tx0 = (lo_x - ox) * ivx
                    tx1 = (hi_x - ox) * ivx
                    ty0 = (lo_y - oy) * ivy
                    ty1 = (hi_y - oy) * ivy
                    tz0 = (lo_z - oz) * ivz
                    tz1 = (hi_z - oz) * ivz
                    tn = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1))
                    tf = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
                    hit_box = (tf >= jnp.maximum(tn, t_min)) & (tn <= carry[0])
                    any_hit = jnp.any(hit_box)
                    base = read_start(node)
                    carry = jax.lax.cond(
                        any_hit & (base >= 0),
                        lambda c: leaf_fn(base, hit_box, c),
                        lambda c: c, carry)
                    nxt = jnp.where(any_hit, read_link(node, 0),
                                    read_link(node, 1))
                    return (nxt, *carry)

                state = jax.lax.while_loop(wcond, wbody,
                                           (jnp.int32(0), *carry))
                return state[1:]

            def sphere_candidate(row, box_mask, carry):
                """One sphere row (dynamic index) against the whole tile.
                box_mask: the enclosing leaf's slab mask (None = dense loop).
                All-zero leaf-pad rows are rejected by radius != 0."""
                c0x = sph_ref[row, 0]
                c0y = sph_ref[row, 1]
                c0z = sph_ref[row, 2]
                c1x = sph_ref[row, 3]
                c1y = sph_ref[row, 4]
                c1z = sph_ref[row, 5]
                tt0 = sph_ref[row, 6]
                tt1 = sph_ref[row, 7]
                rad = sph_ref[row, 8]
                k_f = sph_ref[row, 9]
                a1r = sph_ref[row, 10]
                a1g = sph_ref[row, 11]
                a1b = sph_ref[row, 12]
                a2r = sph_ref[row, 13]
                a2g = sph_ref[row, 14]
                a2b = sph_ref[row, 15]
                csc = sph_ref[row, _SPH_SCALE]
                fz = sph_ref[row, _SPH_FUZZ]
                irr = sph_ref[row, _SPH_IR]
                texk = sph_ref[row, _SPH_TEXK]
                m_id = sph_ref[row, _SPH_MAT]
                uoff = sph_ref[row, _SPH_UOFF]

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
                has = (disc > 0.0) & (jnp.abs(rad) > 0.0)
                t = jnp.where(has & (near >= t_min), near,
                              jnp.where(has & (far >= t_min), far, BIG))
                ok = t < BIG * 0.5
                if box_mask is not None:
                    ok = ok & box_mask
                px = ox + t * dx
                py = oy + t * dy
                pz = oz + t * dz
                inv_r = 1.0 / jnp.where(jnp.abs(rad) < _EPS, 1.0, rad)
                nxx = (px - cx) * inv_r
                nyy = (py - cy) * inv_r
                nzz = (pz - cz) * inv_r
                # sphere uv is computed AFTER the carry resolves (it needs
                # atan2/acos polys — once per bounce, not per row); the
                # is_sph carry flag marks the winner as a sphere, and its
                # rotate_y uv phase rides the (otherwise unused) cu slot
                return upd(ok, t, nxx, nyy, nzz, k_f.astype(jnp.int32),
                           m_id.astype(jnp.int32), (a1r, a1g, a1b),
                           (a2r, a2g, a2b), csc, texk.astype(jnp.int32),
                           fz, irr, carry, uoff + zeros_v, zeros_v, 1.0)

            if n_sph_nodes > 0:
                # sphere-heavy scenes: packet-walk the sphere BVH
                def sph_leaf(base, box_mask, carry):
                    for kk in range(sph_leaf_k):
                        carry = sphere_candidate(base + kk, box_mask, carry)
                    return carry

                carry = packet_walk(lambda n, c: snode_ref[n, c],
                                    lambda n, c: slink_ref[n, c],
                                    lambda n: sstart_ref[n, 0],
                                    sph_leaf, carry)
            elif n_sphere_rows > 0:
                # few spheres: dense candidate loop over all rows
                carry = jax.lax.fori_loop(
                    0, n_sphere_rows,
                    lambda i, c: sphere_candidate(i, None, c), carry)

            # triangles: packet walk over the threaded flat BVH.  Small
            # meshes read candidate rows straight from the VMEM-resident
            # table; big meshes (tri_stream) keep the table in HBM and DMA
            # the visited leaf's contiguous row block into a scratch buffer
            # — 100k-triangle tables (~51 MB lane-padded) can never live in
            # VMEM (~16 MB/core).
            if n_tri_nodes > 0:
                def tri_candidate(read, box_mask, carry):
                    """Moller-Trumbore (reference triangle.h:120-178) for one
                    candidate row via `read(col)` scalar loads.  All-zero
                    leaf-pad rows fail the |det| > 1e-7 test."""
                    v0x = read(_TRI_V0)
                    v0y = read(_TRI_V0 + 1)
                    v0z = read(_TRI_V0 + 2)
                    e1x = read(_TRI_E1)
                    e1y = read(_TRI_E1 + 1)
                    e1z = read(_TRI_E1 + 2)
                    e2x = read(_TRI_E2)
                    e2y = read(_TRI_E2 + 1)
                    e2z = read(_TRI_E2 + 2)
                    hx = dy * e2z - dz * e2y
                    hy = dz * e2x - dx * e2z
                    hz = dx * e2y - dy * e2x
                    a = e1x * hx + e1y * hy + e1z * hz
                    f = 1.0 / jnp.where(jnp.abs(a) < 1e-7, 1e-7, a)
                    sx = ox - v0x
                    sy = oy - v0y
                    sz = oz - v0z
                    ub = f * (sx * hx + sy * hy + sz * hz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    vb = f * (dx * qx + dy * qy + dz * qz)
                    t = f * (e2x * qx + e2y * qy + e2z * qz)
                    ok = (box_mask
                          & (jnp.abs(a) > 1e-7)
                          & (ub >= 0.0) & (ub <= 1.0)
                          & (vb >= 0.0) & (ub + vb <= 1.0)
                          & (t >= t_min))
                    wb = 1.0 - ub - vb
                    # vertex-normal interpolation (rows hold the face
                    # normal replicated when the mesh has none)
                    nxx = (wb * read(_TRI_N0) + ub * read(_TRI_N1)
                           + vb * read(_TRI_N2))
                    nyy = (wb * read(_TRI_N0 + 1) + ub * read(_TRI_N1 + 1)
                           + vb * read(_TRI_N2 + 1))
                    nzz = (wb * read(_TRI_N0 + 2) + ub * read(_TRI_N1 + 2)
                           + vb * read(_TRI_N2 + 2))
                    if need_uv:
                        uu = (wb * read(_TRI_UV0) + ub * read(_TRI_UV1)
                              + vb * read(_TRI_UV2))
                        vv = (wb * read(_TRI_UV0 + 1) + ub * read(_TRI_UV1 + 1)
                              + vb * read(_TRI_UV2 + 1))
                    else:
                        uu = vv = None
                    return upd(
                        ok, t, nxx, nyy, nzz,
                        read(_TRI_KIND).astype(jnp.int32),
                        read(_TRI_MAT).astype(jnp.int32),
                        (read(_TRI_C1), read(_TRI_C1 + 1), read(_TRI_C1 + 2)),
                        (read(_TRI_C2), read(_TRI_C2 + 1), read(_TRI_C2 + 2)),
                        read(_TRI_SCALE),
                        read(_TRI_TEXK).astype(jnp.int32),
                        read(_TRI_FUZZ), read(_TRI_IR), carry, uu, vv)

                if tri_stream:
                    _dbg = _TRI_DEBUG

                    def tri_leaf(base, box_mask, carry):
                        if _dbg == "nodes":      # walk only (perf debug)
                            return carry
                        if _dbg != "nodma":
                            copy = pltpu.make_async_copy(
                                tri_ref.at[pl.ds(base, tri_leaf_k)],
                                tri_scratch, tri_sem)
                            copy.start()
                            copy.wait()
                        if _dbg == "dma":        # DMA only (perf debug)
                            return carry
                        n_cand = 1 if _dbg == "cand1" else tri_leaf_k
                        for kk in range(n_cand):
                            carry = tri_candidate(
                                lambda col, kk=kk: tri_scratch[kk, col],
                                box_mask, carry)
                        return carry
                else:
                    def tri_leaf(base, box_mask, carry):
                        for kk in range(tri_leaf_k):
                            carry = tri_candidate(
                                lambda col, kk=kk: tri_ref[base + kk, col],
                                box_mask, carry)
                        return carry

                # fused node array (M, 9): bounds cols 0-5, threaded links
                # cols 6-7 and leaf start col 8 as exactly-representable
                # floats (node/row counts are far below 2^24) — one 512 B
                # VMEM row per node instead of three
                carry = packet_walk(lambda n, c: tnode_ref[n, c],
                                    lambda n, c: tnode_ref[n, 6 + c]
                                    .astype(jnp.int32),
                                    lambda n: tnode_ref[n, 8]
                                    .astype(jnp.int32),
                                    tri_leaf, carry)

            (t_best, nx, ny, nz, kind, mid, c1r, c1g, c1b, c2r, c2g, c2b,
             scale, texk, fuzz, ir_v, cu, cv, sphf) = carry

            salt0 = b * jnp.int32(32)
            draw = rng_base + jnp.uint32(salt0) * jnp.uint32(0x68E31DA4)

            # -------- constant media (reference constant_medium.h:34-70) ----
            # For each medium boundary (unrolled python loop), compute its
            # [enter, exit] interval clipped by the closest solid hit, sample
            # an exponential free path, and keep the nearest scatter event.
            # Salts 16.._MAX_MEDIA+15 of this bounce's draw window feed the
            # free-path uniforms (scatter sampling uses 0..7).
            media = list(bake.sphere_media) + list(bake.box_media)
            if media:
                d_len = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                inv_dlen = 1.0 / jnp.maximum(d_len, 1e-30)
                m_t = jnp.full(shape, BIG)
                m_sel = [zeros_v] * 10  # c1 rgb, c2 rgb, scale, kind, mid, texk
                for im, m in enumerate(media):
                    if "c0" in m:  # sphere boundary: full quadratic interval
                        denom = m["t1"] - m["t0"]
                        denom = denom if abs(denom) > 1e-12 else 1.0
                        frac = (tm - m["t0"]) * (1.0 / denom)
                        cx = m["c0"][0] + frac * (m["c1"][0] - m["c0"][0])
                        cy = m["c0"][1] + frac * (m["c1"][1] - m["c0"][1])
                        cz = m["c0"][2] + frac * (m["c1"][2] - m["c0"][2])
                        ocx = ox - cx
                        ocy = oy - cy
                        ocz = oz - cz
                        a = dx * dx + dy * dy + dz * dz
                        hb = ocx * dx + ocy * dy + ocz * dz
                        cc = (ocx * ocx + ocy * ocy + ocz * ocz
                              - m["radius"] * m["radius"])
                        disc = hb * hb - a * cc
                        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                        inv_a = 1.0 / jnp.maximum(a, _EPS)
                        lo = (-hb - sq) * inv_a
                        hi = (-hb + sq) * inv_a
                        exists = disc > 0.0
                    else:  # box boundary: transformed slab interval
                        c, s = m["cos"], m["sin"]
                        offx, offy, offz = m["off"]
                        ox_t = ox - offx
                        oy_t = oy - offy
                        oz_t = oz - offz
                        ox2 = c * ox_t - s * oz_t
                        oz2 = s * ox_t + c * oz_t
                        dx2 = c * dx - s * dz
                        dz2 = s * dx + c * dz

                        def minv(v):
                            return 1.0 / jnp.where(
                                jnp.abs(v) < _EPS,
                                jnp.where(v >= 0, _EPS, -_EPS), v)

                        blo, bhi = m["bmin"], m["bmax"]
                        ivx2, ivy2, ivz2 = minv(dx2), minv(dy), minv(dz2)
                        tx0 = (blo[0] - ox2) * ivx2
                        tx1 = (bhi[0] - ox2) * ivx2
                        ty0 = (blo[1] - oy_t) * ivy2
                        ty1 = (bhi[1] - oy_t) * ivy2
                        tz0 = (blo[2] - oz2) * ivz2
                        tz1 = (bhi[2] - oz2) * ivz2
                        lo = jnp.maximum(jnp.maximum(
                            jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                            jnp.minimum(tz0, tz1))
                        hi = jnp.minimum(jnp.minimum(
                            jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                            jnp.maximum(tz0, tz1))
                        exists = hi > lo
                    enter = jnp.maximum(lo, t_min)
                    exit_ = jnp.minimum(hi, t_best)
                    seg = (exit_ - enter) * d_len
                    u_fp = jnp.maximum(_uniform(draw, 16 + im), 1e-12)
                    hit_dist = m["nid"] * jnp.log(u_fp)
                    t_m = enter + hit_dist * inv_dlen
                    ok_m = exists & (exit_ > enter) & (hit_dist <= seg)
                    better_m = ok_m & (t_m < m_t)
                    m_t = jnp.where(better_m, t_m, m_t)
                    vals = (m["c1"][0], m["c1"][1], m["c1"][2],
                            m["c2"][0], m["c2"][1], m["c2"][2], m["scale"],
                            float(m["kind"]), float(m["mat"]),
                            float(m["texk"]))
                    m_sel = [jnp.where(better_m, v, cur)
                             for v, cur in zip(vals, m_sel)]
                med_win = m_t < t_best
                t_best = jnp.where(med_win, m_t, t_best)
                c1r = jnp.where(med_win, m_sel[0], c1r)
                c1g = jnp.where(med_win, m_sel[1], c1g)
                c1b = jnp.where(med_win, m_sel[2], c1b)
                c2r = jnp.where(med_win, m_sel[3], c2r)
                c2g = jnp.where(med_win, m_sel[4], c2g)
                c2b = jnp.where(med_win, m_sel[5], c2b)
                scale = jnp.where(med_win, m_sel[6], scale)
                kind = jnp.where(med_win, m_sel[7].astype(jnp.int32), kind)
                mid = jnp.where(med_win, m_sel[8].astype(jnp.int32), mid)
                texk = jnp.where(med_win, m_sel[9].astype(jnp.int32), texk)
                # arbitrary medium normal (constant_medium.h:63-64)
                nx = jnp.where(med_win, 1.0, nx)
                ny = jnp.where(med_win, 0.0, ny)
                nz = jnp.where(med_win, 0.0, nz)
                if need_uv:
                    sphf = jnp.where(med_win, 0.0, sphf)
                    cu = jnp.where(med_win, 0.0, cu)
                    cv = jnp.where(med_win, 0.0, cv)

            hit = alive & (t_best < BIG * 0.5)
            miss = alive & ~(t_best < BIG * 0.5)

            # sphere uv (get_sphere_uv, sphere.h:19-32) from the pre-flip
            # outward normal — polynomial atan2/acos, once per bounce
            if need_uv and n_sphere_rows > 0:
                ncy = jnp.clip(-ny, -1.0, 1.0)
                theta = _acos_poly(ncy)
                phi = _atan2_poly(-nz, nx) + math.pi
                # cu holds the winner's rotate_y uv phase (see
                # sphere_candidate) — add and wrap to [0, 1)
                su = (phi * (1.0 / (2.0 * math.pi)) + cu) % 1.0
                sv = theta * (1.0 / math.pi)
                cu = jnp.where(sphf > 0.5, su, cu)
                cv = jnp.where(sphf > 0.5, sv, cv)

            # set_face_normal + normalize
            front = (dx * nx + dy * ny + dz * nz) < 0.0
            flip = jnp.where(front, 1.0, -1.0)
            nlen = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
            nx = nx * flip * nlen
            ny = ny * flip * nlen
            nz = nz * flip * nlen

            px = ox + t_best * dx
            py = oy + t_best * dy
            pz = oz + t_best * dz

            is_light = kind == st.DIFFUSE_LIGHT
            if shade:
                # deferred texture evaluation (once per bounce, shared helper)
                ar, ag, ab = _deferred_albedo(
                    tex_kinds, texk, scale, c1r, c1g, c1b, c2r, c2g, c2b,
                    px, py, pz)

                # background on miss
                bgr, bgg, bgb = bake.background
                lr = lr + jnp.where(miss, tr * bgr, 0.0)
                lg = lg + jnp.where(miss, tg * bgg, 0.0)
                lb = lb + jnp.where(miss, tb * bgb, 0.0)

                # emission (diffuse_light emits its texture color)
                lit = hit & is_light
                lr = lr + jnp.where(lit, tr * ar, 0.0)
                lg = lg + jnp.where(lit, tg * ag, 0.0)
                lb = lb + jnp.where(lit, tb * ab, 0.0)

            # ---------------- scatter --------------------------------------
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

            if shade:
                # throughput *= attenuation (dielectric attenuates by 1)
                tr = jnp.where(cont & ~is_diel, tr * ar, tr)
                tg = jnp.where(cont & ~is_diel, tg * ag, tg)
                tb = jnp.where(cont & ~is_diel, tb * ab, tb)

            if shade and rr_start > 0:
                # russian roulette (see integrator.trace): from bounce
                # rr_start, continue w.p. p = clip(max throughput, .05, 1),
                # survivors reweighted by 1/p.  On the megakernel this is the
                # big depth-50 win: the while_loop's all-dead early exit fires
                # as soon as the tile's tail paths are rouletted away.
                p = jnp.clip(jnp.maximum(tr, jnp.maximum(tg, tb)), 0.05, 1.0)
                survive = (b < rr_start) | (_uniform(draw, 8) < p)
                boost = (b >= rr_start) & survive & cont
                inv_p = jnp.where(boost, 1.0 / p, 1.0)
                tr = tr * inv_p
                tg = tg * inv_p
                tb = tb * inv_p
                cont = cont & survive

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
                if need_uv:
                    cu_ref[pl.ds(b, 1)] = cu[None]
                    cv_ref[pl.ds(b, 1)] = cv[None]
            ox = jnp.where(hit, px, ox)
            oy = jnp.where(hit, py, oy)
            oz = jnp.where(hit, pz, oz)
            dx = jnp.where(hit, newdx, dx)
            dy = jnp.where(hit, newdy, dy)
            dz = jnp.where(hit, newdz, dz)
            return (ox, oy, oz, dx, dy, dz, tm, tr, tg, tb, lr, lg, lb,
                    jnp.where(cont, 1.0, 0.0))

        if record:
            # the early-exited bounces never write: pre-zero the packed
            # mask/mat plane so phase-2 shading sees hit=cont=miss=0 there
            mid_ref[...] = jnp.zeros(mid_ref.shape, jnp.int32)

        ones = jnp.ones(shape)
        zeros = jnp.zeros(shape)
        if cam is None:
            rays0 = (ox_ref[:], oy_ref[:], oz_ref[:],
                     dx_ref[:], dy_ref[:], dz_ref[:], tm_ref[:])
        else:
            # ---- in-kernel thin-lens camera (reference camera.h:49-58) ----
            (corg, cllc, chor, cver, cuv, cvv, clr, ct0, ct1,
             img_h, img_w) = cam
            ri = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            pix = (pix_ref[0] + pl.program_id(0) * (sub * LANES)
                   + ri * LANES + ci)
            pix = jnp.minimum(pix, img_h * img_w - 1)  # pad: edge-duplicate
            # i32 //,% by the constant width via f32 reciprocal + exact
            # correction (pixels < 2^24 are f32-exact; Mosaic has no i32 div)
            r_row = (pix.astype(jnp.float32) * (1.0 / img_w)).astype(jnp.int32)
            r_row = r_row - (r_row * img_w > pix).astype(jnp.int32)
            r_row = r_row + ((r_row + 1) * img_w <= pix).astype(jnp.int32)
            c_col = pix - r_row * img_w
            r_row = jnp.minimum(r_row, img_h - 1)
            # camera draw window: far outside every bounce's b*32 salt window
            cdraw = rng_base + jnp.uint32(0x7F4A7C15) * jnp.uint32(0x68E31DA4)
            inv_w = 1.0 / max(img_w - 1, 1)
            inv_h = 1.0 / max(img_h - 1, 1)
            su = (c_col.astype(jnp.float32) + _uniform(cdraw, 0)) * inv_w
            sv = ((img_h - 1 - r_row).astype(jnp.float32)
                  + _uniform(cdraw, 1)) * inv_h
            if clr != 0.0:
                theta = (2.0 * math.pi) * _uniform(cdraw, 2)
                rr = clr * jnp.sqrt(_uniform(cdraw, 3))
                rdx = rr * jnp.cos(theta)
                rdy = rr * jnp.sin(theta)
                offx = cuv[0] * rdx + cvv[0] * rdy
                offy = cuv[1] * rdx + cvv[1] * rdy
                offz = cuv[2] * rdx + cvv[2] * rdy
            else:
                offx = offy = offz = zeros
            ox0 = corg[0] + offx
            oy0 = corg[1] + offy
            oz0 = corg[2] + offz
            dx0 = cllc[0] + su * chor[0] + sv * cver[0] - ox0
            dy0 = cllc[1] + su * chor[1] + sv * cver[1] - oy0
            dz0 = cllc[2] + su * chor[2] + sv * cver[2] - oz0
            if ct1 != ct0:
                tm0 = ct0 + (ct1 - ct0) * _uniform(cdraw, 4)
            else:
                tm0 = jnp.full(shape, ct0)
            rays0 = (ox0, oy0, oz0, dx0, dy0, dz0, tm0)

        state = (*rays0, ones, ones, ones, zeros, zeros, zeros, ones)

        if record and max_depth <= 16:
            # STATIC depth unroll: every per-bounce plane store then has a
            # static offset.  The while_loop form stores at a loop-carried
            # index, which v5e measured at 2.7x the forward kernel (621 vs
            # 1,673 Mrays/s — the round-3 record-walk store tax); the
            # per-bounce cond keeps the all-dead early exit.
            for b in range(max_depth):
                state = jax.lax.cond(jnp.any(state[-1] > 0.5),
                                     functools.partial(bounce, b),
                                     lambda s: s, state)
        else:
            # early exit: the whole tile stops as soon as every lane is dead
            # (the reference breaks per-thread, render.h:60-79; at depth-50
            # defaults most lanes die within ~8 bounces)
            def w_cond(bs):
                return (bs[0] < max_depth) & jnp.any(bs[-1] > 0.5)

            def w_body(bs):
                b = bs[0]
                return (b + 1, *bounce(b, bs[1:]))

            state = jax.lax.while_loop(w_cond, w_body,
                                       (jnp.int32(0), *state))[1:]
        if shade:
            lr_ref[:] = state[10]
            lg_ref[:] = state[11]
            lb_ref[:] = state[12]

    return kernel


@functools.partial(jax.jit, static_argnames=("bake_key", "max_depth", "t_min",
                                             "interpret", "record", "need_p",
                                             "need_uv", "shade", "cam", "rows",
                                             "rr_start", "sub"))
def _run(bake_key, seed, sph_table, sph_nodes, sph_links, sph_start,
         tri_table, tri_nodes,
         ox, oy, oz, dx, dy, dz, tm,
         max_depth, t_min, interpret, record=False, need_p=True,
         need_uv=False, shade=None, cam=None, pix_base=None, rows=None,
         rr_start=0, sub=SUB):
    bake = _BAKES[bake_key]
    if rows is None:
        rows = ox.shape[0]
    grid = (rows // sub,)
    if shade is None:
        shade = not record
    kernel = _make_kernel(bake, max_depth, t_min,
                          record=record, need_p=need_p, need_uv=need_uv,
                          shade=shade, cam=cam, rr_start=rr_start,
                          sub=sub)
    ray_spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = []
    out_shape = []
    if shade:
        out_specs += [ray_spec, ray_spec, ray_spec]
        out_shape += [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 3
    if record:
        rec_spec = pl.BlockSpec((max_depth, sub, LANES), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        rec_shape = (max_depth, rows, LANES)
        n_rec = 1 + (3 if need_p else 0) + (2 if need_uv else 0)
        out_specs += [rec_spec] * n_rec
        out_shape += (
            [jax.ShapeDtypeStruct(rec_shape, jnp.int32)]
            + [jax.ShapeDtypeStruct(rec_shape, jnp.float32)] * (n_rec - 1)
        )
    def whole(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                            memory_space=pltpu.VMEM)

    if bake.tri_stream:
        # big mesh: table stays in HBM; the walk DMAs one leaf block at a
        # time into the scratch buffer
        tri_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch_shapes = [pltpu.VMEM((bake.tri_leaf_k, LANES), jnp.float32),
                          pltpu.SemaphoreType.DMA(())]
    else:
        tri_spec = whole(tri_table)
        scratch_shapes = []

    if cam is None:
        tail_specs = [ray_spec] * 7
        tail_args = (ox, oy, oz, dx, dy, dz, tm)
    else:
        tail_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]  # pix_base (1,)
        tail_args = (pix_base,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            whole(sph_table), whole(sph_nodes), whole(sph_links),
            whole(sph_start),
            tri_spec, whole(tri_nodes),
            *tail_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(seed, sph_table, sph_nodes, sph_links, sph_start,
      tri_table, tri_nodes, *tail_args)
    return out


def _make_hit_kernel(bake: SceneBake, t_min: float, sub: int):
    """PURE closest-hit kernel for the sorted wavefront (engine/wavefront.py).

    One bounce, intersection only: no shading, no scatter, no RNG.  The
    triangle tier reads the packed GEOMETRY-ONLY rows (see _bake_tri_packed)
    — ROWS_PER_LEAF dynamic-sublane vector loads per visited leaf, then
    static-lane extracts per candidate (v5e-measured: the denormalized
    40-col candidate paid ~290 ns in chained scalar loads; geometry-only
    extracts out of a loaded vector register pipeline) — and carries only
    (t, slot, barycentric u, v).  The winner's normals/uv/material resolve
    OUTSIDE the kernel from the scene tables by slot id (XLA gathers are
    cheap at wave width; Mosaic has no gathers at all).

    Outputs (per (sub, 128) block): packed i32 [mat | hit<<16 | miss<<18 |
    front<<19 | is_tri<<20 | is_sph<<21], p xyz, uv (barycentrics for
    triangle winners, final uv for rect/sphere), outward-faced normal
    (non-triangle winners only), slot (f32 triangle slot id).
    Constant media are NOT supported here (no RNG): the router falls back
    to the full-depth megakernel for media scenes.
    """
    assert not bake.sphere_media and not bake.box_media, \
        "hit kernel is RNG-free; media scenes use the megakernel paths"
    assert len(bake.sph_nodes) == 0 or len(bake.sph_hit_nodes) > 0, \
        "sphere-BVH scenes need the hit-tier sphere nodes (bake_scene)"
    n_sphere_rows = len(bake.sphere_table)
    n_hit_nodes = len(bake.hit_nodes)
    n_sph_hit = len(bake.sph_hit_nodes)
    sph_leaf_k = bake.sph_leaf_k
    rows_per_leaf = bake.hit_rows_per_leaf

    def kernel(sph_ref, shnode_ref, hnode_ref, geom_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
               alive_ref,
               pk_ref, px_ref, py_ref, pz_ref, cu_ref, cv_ref,
               nx_ref, ny_ref, nz_ref, sl_ref):
        shape = (sub, LANES)
        zeros = jnp.zeros(shape)
        pk_ref[...] = jnp.zeros(shape, jnp.int32)
        for r in (px_ref, py_ref, pz_ref, cu_ref, cv_ref,
                  nx_ref, ny_ref, nz_ref, sl_ref):
            r[...] = zeros
        alive0 = alive_ref[:] > 0.5

        @pl.when(jnp.any(alive0))
        def _():
            ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
            dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
            tm = tm_ref[:]

            # ---- non-triangle candidates (lean carry: t, n, mat, uv) ----
            t2 = jnp.full(shape, BIG)
            nx = jnp.zeros(shape)
            ny = jnp.zeros(shape)
            nz = jnp.zeros(shape)
            mat = jnp.zeros(shape, jnp.int32)
            uu = jnp.zeros(shape)
            vv = jnp.zeros(shape)
            sphf = jnp.zeros(shape)

            def take(better, t, nxx, nyy, nzz, m, u_, v_, sp_):
                nonlocal t2, nx, ny, nz, mat, uu, vv, sphf
                t2 = jnp.where(better, t, t2)
                nx = jnp.where(better, nxx, nx)
                ny = jnp.where(better, nyy, ny)
                nz = jnp.where(better, nzz, nz)
                mat = jnp.where(better, m, mat)
                uu = jnp.where(better, u_, uu)
                vv = jnp.where(better, v_, vv)
                sphf = jnp.where(better, sp_, sphf)

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
                ru = (pa - prim["a0"]) / max(prim["a1"] - prim["a0"], _EPS)
                rv = (pb - prim["b0"]) / max(prim["b1"] - prim["b0"], _EPS)
                take(ok & (t < t2), t, jnp.full(shape, n3[0]),
                     jnp.full(shape, n3[1]), jnp.full(shape, n3[2]),
                     prim["mat"], ru, rv, 0.0)

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

                ivx, ivy, ivz = inv(dx2), inv(dy), inv(dz2)
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
                nwx = c * nobj_x + s * nobj_z
                nwz = -s * nobj_x + c * nobj_z
                # per-face uv like the reference's six rects (box.h:14-27;
                # mirrors engine.intersect._box_record)
                pxo = ox2 + t * dx2
                pyo = oy_t + t * dy
                pzo = oz2 + t * dz2
                ex = max(hi[0] - lo[0], _EPS)
                ey = max(hi[1] - lo[1], _EPS)
                ez = max(hi[2] - lo[2], _EPS)
                ua = (pxo - lo[0]) / ex
                ub_ = (pyo - lo[1]) / ey
                uc = (pzo - lo[2]) / ez
                bu = jnp.where(is_x, ub_, ua)
                bv = jnp.where(is_x | is_y, uc, ub_)
                take(ok & (t < t2), t, nwx, nobj_y, nwz, prim["mat"],
                     bu, bv, 0.0)

            def sph_cand(srow, box_mask, t2c, nxc, nyc, nzc, matc, uuc,
                         vvc, sphc):
                """One sphere row (static OR dynamic index) against the
                tile; carry-passing so the packet walk can thread it."""
                c0x = sph_ref[srow, 0]
                c0y = sph_ref[srow, 1]
                c0z = sph_ref[srow, 2]
                c1x = sph_ref[srow, 3]
                c1y = sph_ref[srow, 4]
                c1z = sph_ref[srow, 5]
                tt0 = sph_ref[srow, 6]
                tt1 = sph_ref[srow, 7]
                rad = sph_ref[srow, 8]
                m_id = sph_ref[srow, _SPH_MAT]
                uoff = sph_ref[srow, _SPH_UOFF]
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
                has = (disc > 0.0) & (jnp.abs(rad) > 0.0)
                t = jnp.where(has & (near >= t_min), near,
                              jnp.where(has & (far >= t_min), far, BIG))
                better = t < t2c
                if box_mask is not None:
                    better = better & box_mask
                px = ox + t * dx
                py = oy + t * dy
                pz = oz + t * dz
                inv_r = 1.0 / jnp.where(jnp.abs(rad) < _EPS, 1.0, rad)
                return (jnp.where(better, t, t2c),
                        jnp.where(better, (px - cx) * inv_r, nxc),
                        jnp.where(better, (py - cy) * inv_r, nyc),
                        jnp.where(better, (pz - cz) * inv_r, nzc),
                        jnp.where(better, m_id, matc),
                        jnp.where(better, uoff + zeros, uuc),
                        jnp.where(better, zeros, vvc),
                        jnp.where(better, 1.0, sphc))

            if n_sph_hit > 0:
                # sphere-heavy scenes (big_scene1): octant-ordered packet
                # walk over the leaf-contiguous sphere table — without this
                # tier supports_hit was False and the whole scene class lost
                # the sorted-wavefront/regen route (round-5 addition)
                def s_inv(v):
                    return 1.0 / jnp.where(
                        jnp.abs(v) < _EPS,
                        jnp.where(v >= 0, _EPS, -_EPS), v)

                s_ivx, s_ivy, s_ivz = s_inv(dx), s_inv(dy), s_inv(dz)
                s_oct = (((jnp.sum(dx) < 0).astype(jnp.int32) << 2)
                         | ((jnp.sum(dy) < 0).astype(jnp.int32) << 1)
                         | (jnp.sum(dz) < 0).astype(jnp.int32))

                def s_leaf(rstart, box_mask, carry):
                    for kk in range(sph_leaf_k):
                        carry = sph_cand(rstart + kk, box_mask, *carry)
                    return carry

                def s_cond(state):
                    return state[0] >= 0

                def s_body(state):
                    node = state[0]
                    carry = state[1:]
                    nrow = shnode_ref[pl.ds(node, 1), :]
                    tx0 = (nrow[0, 0] - ox) * s_ivx
                    ty0 = (nrow[0, 1] - oy) * s_ivy
                    tz0 = (nrow[0, 2] - oz) * s_ivz
                    tx1 = (nrow[0, 3] - ox) * s_ivx
                    ty1 = (nrow[0, 4] - oy) * s_ivy
                    tz1 = (nrow[0, 5] - oz) * s_ivz
                    tn = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1))
                    tf = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
                    hit_box = (tf >= jnp.maximum(tn, t_min)) & (tn <= carry[0])
                    any_hit = jnp.any(hit_box)
                    rstart = nrow[0, 6].astype(jnp.int32)
                    carry = jax.lax.cond(
                        any_hit & (rstart >= 0),
                        lambda c: s_leaf(rstart, hit_box, c),
                        lambda c: c, carry)

                    def s_pick(col0):
                        r = nrow[0, col0]
                        for o_ in range(1, 8):
                            r = jnp.where(s_oct == o_,
                                          nrow[0, col0 + 2 * o_], r)
                        return r.astype(jnp.int32)

                    nxt = jnp.where(any_hit, s_pick(7), s_pick(8))
                    return (nxt, *carry)

                st0 = (jnp.int32(0), t2, nx, ny, nz,
                       mat.astype(jnp.float32), uu, vv, sphf)
                out_s = jax.lax.while_loop(s_cond, s_body, st0)
                t2, nx, ny, nz = out_s[1:5]
                mat = out_s[5].astype(jnp.int32)
                uu, vv, sphf = out_s[6:9]
            else:
                for row in range(n_sphere_rows):
                    out_d = sph_cand(row, None, t2, nx, ny, nz,
                                     mat.astype(jnp.float32), uu, vv, sphf)
                    t2, nx, ny, nz = out_d[0:4]
                    mat = out_d[4].astype(jnp.int32)
                    uu, vv, sphf = out_d[5:8]

            # ---- triangle tier: packet walk of the packed-geometry BVH ----
            t1 = jnp.full(shape, BIG)
            slotf = jnp.zeros(shape)
            ub_c = jnp.zeros(shape)
            vb_c = jnp.zeros(shape)
            if n_hit_nodes > 0:
                def inv_safe(v):
                    return 1.0 / jnp.where(jnp.abs(v) < _EPS,
                                           jnp.where(v >= 0, _EPS, -_EPS), v)

                ivx = inv_safe(dx)
                ivy = inv_safe(dy)
                ivz = inv_safe(dz)
                # the tile's majority direction octant picks which of the 8
                # near-first threadings to follow (the driver sorts rays by
                # octant, so packets are octant-pure; a mixed packet follows
                # the majority's ordering, which only costs pruning)
                oct_t = (((jnp.sum(dx) < 0).astype(jnp.int32) << 2)
                         | ((jnp.sum(dy) < 0).astype(jnp.int32) << 1)
                         | (jnp.sum(dz) < 0).astype(jnp.int32))

                _dbg = _HIT_DEBUG

                # Per-row bounding boxes live in the node record's spare
                # lanes (see _bake_tri_packed).  Gating each row's
                # candidates behind cond(any(row_hit)) was measured a LOSS
                # on v5e (backpack config 5: 4.17 -> 3.63 Mrays/s): the
                # divergent packet unions intersect nearly every visited
                # row, so the per-row any() + branch overhead exceeds the
                # skipped vector work — same verdict as the round-3
                # per-candidate gate, amortization notwithstanding.  The
                # bake keeps the columns (free: rows lane-pad anyway);
                # flip to True to re-measure on future hardware.
                has_rowbb = False

                def row_cands(rows, rr_list, base_slot, mask, carry):
                    # candidates are computed INDEPENDENTLY and min-combined
                    # as a binary tree: a serial where-chain makes every
                    # candidate wait on the previous one's select latency
                    # (the VPU serial-chain bound, docs/PERF.md roofline);
                    # the tree keeps ~leaf_k tests in flight
                    cands = [carry]
                    for rr, kk2 in ((r, k) for r in rr_list
                                    for k in range(_HIT_PACK)):
                        cc = kk2 * 9
                        v0x = rows[rr, cc + 0]
                        v0y = rows[rr, cc + 1]
                        v0z = rows[rr, cc + 2]
                        e1x = rows[rr, cc + 3]
                        e1y = rows[rr, cc + 4]
                        e1z = rows[rr, cc + 5]
                        e2x = rows[rr, cc + 6]
                        e2y = rows[rr, cc + 7]
                        e2z = rows[rr, cc + 8]
                        hx = dy * e2z - dz * e2y
                        hy = dz * e2x - dx * e2z
                        hz = dx * e2y - dy * e2x
                        a = e1x * hx + e1y * hy + e1z * hz
                        f = 1.0 / jnp.where(jnp.abs(a) < 1e-7, 1e-7, a)
                        sx = ox - v0x
                        sy = oy - v0y
                        sz = oz - v0z
                        ub = f * (sx * hx + sy * hy + sz * hz)
                        qx = sy * e1z - sz * e1y
                        qy = sz * e1x - sx * e1z
                        qz = sx * e1y - sy * e1x
                        vb = f * (dx * qx + dy * qy + dz * qz)
                        t = f * (e2x * qx + e2y * qy + e2z * qz)
                        ok = (mask
                              & (jnp.abs(a) > 1e-7)
                              & (ub >= 0.0) & (ub <= 1.0)
                              & (vb >= 0.0) & (ub + vb <= 1.0)
                              & (t >= t_min))
                        cands.append((jnp.where(ok, t, BIG),
                                      base_slot + float(rr * _HIT_PACK + kk2),
                                      ub, vb))

                    while len(cands) > 1:
                        nxt = []
                        for i in range(0, len(cands) - 1, 2):
                            ta, sa, ua, va = cands[i]
                            tb, sb, ubb, vbb = cands[i + 1]
                            bet = tb < ta
                            nxt.append((jnp.where(bet, tb, ta),
                                        jnp.where(bet, sb, sa),
                                        jnp.where(bet, ubb, ua),
                                        jnp.where(bet, vbb, va)))
                        if len(cands) % 2:
                            nxt.append(cands[-1])
                        cands = nxt
                    return cands[0]

                def leaf(nrow, rstart, box_mask, carry):
                    if _dbg == "nodes":      # walk only (perf debug)
                        return carry
                    rows = geom_ref[pl.ds(rstart, rows_per_leaf), :]
                    base_slot = rstart.astype(jnp.float32) * float(_HIT_PACK)
                    if not has_rowbb:
                        return row_cands(rows, range(rows_per_leaf),
                                         base_slot, box_mask, carry)
                    for rr in range(rows_per_leaf):
                        c0 = 23 + 6 * rr
                        rx0 = (nrow[0, c0 + 0] - ox) * ivx
                        ry0 = (nrow[0, c0 + 1] - oy) * ivy
                        rz0 = (nrow[0, c0 + 2] - oz) * ivz
                        rx1 = (nrow[0, c0 + 3] - ox) * ivx
                        ry1 = (nrow[0, c0 + 4] - oy) * ivy
                        rz1 = (nrow[0, c0 + 5] - oz) * ivz
                        rtn = jnp.maximum(
                            jnp.maximum(jnp.minimum(rx0, rx1),
                                        jnp.minimum(ry0, ry1)),
                            jnp.minimum(rz0, rz1))
                        rtf = jnp.minimum(
                            jnp.minimum(jnp.maximum(rx0, rx1),
                                        jnp.maximum(ry0, ry1)),
                            jnp.maximum(rz0, rz1))
                        limit = jnp.minimum(carry[0], t2)
                        row_hit = (box_mask
                                   & (rtf >= jnp.maximum(rtn, t_min))
                                   & (rtn <= limit))
                        carry = jax.lax.cond(
                            jnp.any(row_hit),
                            lambda c, rh=row_hit, rr=rr: row_cands(
                                rows, (rr,), base_slot, rh, c),
                            lambda c: c, carry)
                    return carry

                def wcond(state):
                    return state[0] >= 0

                def wbody(state):
                    node = state[0]
                    carry = state[1:]
                    # node records pack _HIT_NODE_PACK per 128-lane row
                    # (lane padding makes rows cost 512 B regardless of
                    # width); the row loads in ONE dynamic-sublane vector
                    # load and the record selects by scalar where-chain —
                    # a dynamic LANE offset would not lower in Mosaic
                    nrow = hnode_ref[pl.ds(node // _HIT_NODE_PACK, 1), :]
                    nsub = node % _HIT_NODE_PACK

                    def nfield(f):
                        r = nrow[0, f]
                        for q in range(1, _HIT_NODE_PACK):
                            r = jnp.where(nsub == q,
                                          nrow[0, _HIT_NODE_COLS * q + f], r)
                        return r

                    tx0 = (nfield(0) - ox) * ivx
                    ty0 = (nfield(1) - oy) * ivy
                    tz0 = (nfield(2) - oz) * ivz
                    tx1 = (nfield(3) - ox) * ivx
                    ty1 = (nfield(4) - oy) * ivy
                    tz1 = (nfield(5) - oz) * ivz
                    tn = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1))
                    tf = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
                    # prune by the non-tri closest hit too (t2 is fixed
                    # during the walk — tighter than BIG from the start)
                    limit = jnp.minimum(carry[0], t2)
                    hit_box = (tf >= jnp.maximum(tn, t_min)) & (tn <= limit)
                    any_hit = jnp.any(hit_box)
                    rstart = nfield(6).astype(jnp.int32)
                    carry = jax.lax.cond(
                        any_hit & (rstart >= 0),
                        lambda c: leaf(nrow, rstart, hit_box, c),
                        lambda c: c, carry)

                    def pick(col0):
                        r = nfield(col0)
                        for o_ in range(1, 8):
                            r = jnp.where(oct_t == o_, nfield(col0 + 2 * o_),
                                          r)
                        return r.astype(jnp.int32)

                    nxt = jnp.where(any_hit, pick(7), pick(8))
                    return (nxt, *carry)

                out = jax.lax.while_loop(
                    wcond, wbody, (jnp.int32(0), t1, slotf, ub_c, vb_c))
                t1, slotf, ub_c, vb_c = out[1:]

            # ---- merge + finalize -------------------------------------
            tri_win = t1 < t2
            t_best = jnp.where(tri_win, t1, t2)
            hit = alive0 & (t_best < BIG * 0.5)
            miss = alive0 & ~(t_best < BIG * 0.5)

            # sphere uv (polynomial atan2/acos) for sphere winners, from
            # the pre-flip outward normal (get_sphere_uv, sphere.h:19-32)
            sph_win = ~tri_win & (sphf > 0.5)
            if n_sphere_rows > 0:
                ncy = jnp.clip(-ny, -1.0, 1.0)
                theta = _acos_poly(ncy)
                phi = _atan2_poly(-nz, nx) + math.pi
                su = (phi * (1.0 / (2.0 * math.pi)) + uu) % 1.0
                sv = theta * (1.0 / math.pi)
                uu = jnp.where(sph_win, su, uu)
                vv = jnp.where(sph_win, sv, vv)

            # set_face_normal for the non-tri winner (tri winners resolve
            # outside the kernel, where vertex normals live)
            front = (dx * nx + dy * ny + dz * nz) < 0.0
            flip = jnp.where(front, 1.0, -1.0)
            nlen = jax.lax.rsqrt(
                jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
            nx = nx * flip * nlen
            ny = ny * flip * nlen
            nz = nz * flip * nlen

            pk_ref[...] = jnp.where(
                hit | miss,
                (mat
                 | (hit.astype(jnp.int32) << 16)
                 | (miss.astype(jnp.int32) << 18)
                 | (front.astype(jnp.int32) << 19)
                 | (tri_win.astype(jnp.int32) << 20)
                 | (sph_win.astype(jnp.int32) << 21)),
                0)
            px_ref[...] = ox + t_best * dx
            py_ref[...] = oy + t_best * dy
            pz_ref[...] = oz + t_best * dz
            cu_ref[...] = jnp.where(tri_win, ub_c, uu)
            cv_ref[...] = jnp.where(tri_win, vb_c, vv)
            nx_ref[...] = nx
            ny_ref[...] = ny
            nz_ref[...] = nz
            sl_ref[...] = slotf

    return kernel


@functools.partial(jax.jit, static_argnames=("bake_key", "t_min",
                                             "interpret", "sub"))
def _run_hit(bake_key, sph_table, sph_hit_nodes, hit_nodes, tri_geom,
             ox, oy, oz, dx, dy, dz, tm, alive,
             t_min, interpret, sub=STEP_SUB):
    bake = _BAKES[bake_key]
    rows = ox.shape[0]
    kernel = _make_hit_kernel(bake, t_min, sub)
    ray_spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def whole(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(rows // sub,),
        in_specs=[whole(sph_table), whole(sph_hit_nodes), whole(hit_nodes),
                  whole(tri_geom), *([ray_spec] * 8)],
        out_specs=[ray_spec] * 10,
        out_shape=([jax.ShapeDtypeStruct((rows, LANES), jnp.int32)]
                   + [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 9),
        interpret=interpret,
    )(sph_table, sph_hit_nodes, hit_nodes, tri_geom,
      ox, oy, oz, dx, dy, dz, tm, alive)
    return out


def chunk_seed(key) -> jax.Array:
    """One threefry draw per chunk -> int32 scalar base for `wave_seed`."""
    return jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)


def wave_seed(base, *idx) -> jax.Array:
    """Per-wave kernel seed by SCALAR ARITHMETIC on loop indices.

    The kernel's seed is an SMEM scalar operand.  Deriving it per map
    iteration from a dynamic-slice or a threefry call stalls the grid
    pipeline ~20x (v5e-measured: 194 -> 9 Mrays/s e2e) — the scalar must
    round-trip HBM->SMEM with a sync per call.  Plain i32 add/mul on the loop
    indices stays on the scalar path (even a scalar bitcast breaks it).
    Distinct (s, bid, ...) give distinct seeds (prime multipliers, indices
    far below them); the kernel's PCG hash (seed * 0x85EBCA6B ^ lane, then
    pcg) decorrelates the streams."""
    s = jnp.asarray(base, jnp.int32)
    multipliers = (7919, 104729, 1299709, 15485863)
    assert len(idx) <= len(multipliers)
    for m, i in zip(multipliers, idx):
        s = s + jnp.asarray(i, jnp.int32) * jnp.int32(m)
    return s


def _cam_tuple(camera, img_h: int, img_w: int) -> tuple:
    """Static (hashable) camera constants for the in-kernel ray generator.

    The camera is fixed per compiled renderer, so its thin-lens basis bakes
    into the kernel as immediates (reference `camera.h:18-47` precomputes the
    same values once on the host).
    """
    def f3(a):
        v = np.asarray(a, np.float64).reshape(3)
        return (float(v[0]), float(v[1]), float(v[2]))

    return (f3(camera.origin), f3(camera.lower_left_corner),
            f3(camera.horizontal), f3(camera.vertical),
            f3(camera.u), f3(camera.v),
            float(np.asarray(camera.lens_radius)),
            float(np.asarray(camera.time0)), float(np.asarray(camera.time1)),
            int(img_h), int(img_w))


# Bakes are static (hashable) jit args via an interning table keyed by
# CONTENT digest: identical scenes share one entry (and one compiled
# program), and a key can never alias a different scene (the round-1 id()
# scheme could after gc).  Entries live as long as the process — the same
# lifetime as the jit cache entries that reference them.
_BAKES: dict = {}


class PallasTracer:
    """Scene-specialized megakernel tracer with the `trace` call signature."""

    def __init__(self, scene: st.Scene):
        if not supports_scene(scene):
            raise ValueError("scene uses features outside the pallas kernel set")
        self.bake = bake_scene(scene)
        self.key = ("bake", self.bake.digest)
        _BAKES.setdefault(self.key, self.bake)

        def pad1(a, cols, dtype):
            return jnp.asarray(a if len(a) else np.zeros((1, cols), dtype))

        self.sph_table = pad1(self.bake.sphere_table, 24, np.float32)
        self.sph_nodes = pad1(self.bake.sph_nodes, 6, np.float32)
        self.sph_links = pad1(self.bake.sph_links, 2, np.int32)
        self.sph_start = (jnp.asarray(self.bake.sph_start)
                          if len(self.bake.sph_start)
                          else jnp.full((1, 1), -1, jnp.int32))
        self.tri_table = pad1(self.bake.tri_table, _TRI_COLS, np.float32)
        if self.bake.tri_stream:
            # streamed leaves DMA row blocks out of the HBM-resident
            # table; Mosaic requires the copied slice to cover whole
            # (1,128) lane tiles, so pad the 40 data columns up to one
            # full tile (the padded memref occupies the same HBM
            # either way)
            self.tri_table = jnp.pad(
                self.tri_table, ((0, 0), (0, LANES - _TRI_COLS)))
        # fused (M, 9) node array: bounds | hit/miss links | leaf start as
        # exactly-representable f32 (counts far below 2^24) — 512 B/node of
        # VMEM instead of three lane-padded arrays at 1536 B/node
        if len(self.bake.tri_nodes):
            fused = np.concatenate(
                [np.asarray(self.bake.tri_nodes, np.float32),
                 np.asarray(self.bake.tri_links, np.float32),
                 np.asarray(self.bake.tri_start, np.float32)], axis=1)
        else:
            fused = np.full((1, 9), -1.0, np.float32)
        self.tri_nodes = jnp.asarray(fused)
        self.n_tri_nodes = len(self.bake.tri_nodes)
        self.n_sph_nodes = len(self.bake.sph_nodes)
        # hit-tier arrays (the pure closest-hit kernel, _make_hit_kernel)
        self.tri_geom = (jnp.asarray(self.bake.tri_geom)
                         if len(self.bake.tri_geom)
                         else jnp.zeros((1, LANES), jnp.float32))
        self.hit_nodes = (jnp.asarray(self.bake.hit_nodes)
                          if len(self.bake.hit_nodes)
                          else jnp.full((1, _HIT_NODE_PACK * _HIT_NODE_COLS),
                                        -1.0, jnp.float32))
        self.tri_perm = (jnp.asarray(self.bake.tri_perm)
                         if len(self.bake.tri_perm)
                         else jnp.full((1,), -1, jnp.int32))
        self.sph_hit_nodes = (jnp.asarray(self.bake.sph_hit_nodes)
                              if len(self.bake.sph_hit_nodes)
                              else jnp.full((1, 23), -1.0, jnp.float32))
        # hit tier requires: no media (the kernel is RNG-free) AND the
        # packed bake actually fit VMEM — _bake_tri_packed's escalation loop
        # caps at rows_per_leaf=64 even when still over budget, so an
        # oversized mesh (~>300k tris) must fall back to the streamed
        # megakernel walk instead of shipping a pallas_call that cannot fit
        # in ~16 MB VMEM.  Sphere-BVH scenes (big_scene1) use the hit-tier
        # sphere packet walk (round 5); small sphere sets the dense loop.
        hit_fits = ((self.tri_geom.shape[0] + self.hit_nodes.shape[0]
                     + self.sph_table.shape[0]
                     + self.sph_hit_nodes.shape[0]) * 512
                    <= _HIT_VMEM_BUDGET)
        self.supports_hit = (not self.bake.sphere_media
                             and not self.bake.box_media
                             and (self.n_sph_nodes == 0
                                  or len(self.bake.sph_hit_nodes) > 0)
                             and hit_fits)
        # world AABB for the sorted-wavefront driver's morton keys: the
        # TRIANGLE bounds when a mesh exists (a huge ground sphere would
        # otherwise stretch the quantization grid until the mesh collapses
        # into one cell), else the union of sphere bounds.  Only packet
        # coherence depends on this, never correctness.
        if self.n_tri_nodes:
            self.world_lo = np.asarray(self.bake.tri_nodes[0, :3])
            self.world_hi = np.asarray(self.bake.tri_nodes[0, 3:6])
        elif len(self.bake.sphere_table):
            tb = self.bake.sphere_table
            c0, c1 = tb[:, 0:3], tb[:, 3:6]
            r = np.abs(tb[:, 8:9])
            self.world_lo = (np.minimum(c0, c1) - r).min(0)
            self.world_hi = (np.maximum(c0, c1) + r).max(0)
        else:
            self.world_lo = np.full(3, -1.0, np.float32)
            self.world_hi = np.full(3, 1.0, np.float32)
        # phase-2 shading reads hit points only for position-dependent
        # textures (checker + perlin family) and uv only for image textures
        # — see walk()
        host = _host_scene(scene)
        by_class = _used_tex_kinds_by_class(host)
        used_kinds = set().union(*by_class.values())
        self.need_p = bool(used_kinds & {st.TEX_CHECKER, st.TEX_NOISE,
                                         st.TEX_TURB, st.TEX_MARBLE})
        self.need_uv = bool(used_kinds & {st.TEX_IMAGE})

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

    def __call__(self, scene, o, d, tm, key, max_depth=50, t_min=0.001,
                 rr_start=0):
        """Matches engine.integrator.trace's signature (scene arg unused —
        the bake is closed over)."""
        interpret = jax.default_backend() != "tpu"
        n, seed, args = self._tile_args(o, d, tm, key)
        lr, lg, lb = _run(self.key, seed, self.sph_table, self.sph_nodes,
                          self.sph_links, self.sph_start, self.tri_table,
                          self.tri_nodes,
                          *args, max_depth=max_depth, t_min=t_min,
                          interpret=interpret, rr_start=rr_start)
        out = jnp.stack([lr.reshape(-1), lg.reshape(-1), lb.reshape(-1)], axis=-1)
        return out[:n]

    def trace_pixels(self, camera, img_h, img_w, pix_base, n, seed,
                     max_depth=50, t_min=0.001, rr_start=0, sub=SUB):
        """Forward radiance for pixels [pix_base, pix_base+n) with the camera
        rays generated IN-KERNEL (jitter + thin lens + shutter time from the
        kernel PCG stream) — no XLA-side ray planes at all.

        pix_base and seed may be traced, but MUST be scalar arithmetic on the
        enclosing loop's indices (`wave_seed`), never a per-iteration
        dynamic-slice or threefry output: a kernel whose SMEM scalar operand
        needs a per-iteration HBM round-trip stalls the grid pipeline ~20x
        (measured on v5e: 194 -> 9 Mrays/s)."""
        interpret = jax.default_backend() != "tpu"
        cam = _cam_tuple(camera, img_h, img_w)
        rows = -(-(-(-n // LANES)) // sub) * sub
        pb = jnp.asarray(pix_base, jnp.int32).reshape(1)
        seed = jnp.asarray(seed, jnp.int32).reshape(1)
        lr, lg, lb = _run(
            self.key, seed, self.sph_table, self.sph_nodes, self.sph_links,
            self.sph_start, self.tri_table, self.tri_nodes,
            None, None, None, None, None, None, None,
            max_depth=max_depth, t_min=t_min, interpret=interpret,
            cam=cam, pix_base=pb, rows=rows, rr_start=rr_start, sub=sub)
        out = jnp.stack([lr.reshape(-1), lg.reshape(-1), lb.reshape(-1)],
                        axis=-1)
        return out[:n]

    def walk_packed_pixels(self, camera, img_h, img_w, pix_base, n, seed,
                           max_depth=50, t_min=0.001, shade=False):
        """Record-mode walk with in-kernel camera rays -> RAW record planes
        ((D, rows, LANES) each; crop with `.reshape(D, -1)[:, :n]`).
        shade=True additionally returns in-kernel radiance planes first
        ((rows, LANES) x3) — the fused forward.  Seed rules: see
        trace_pixels."""
        interpret = jax.default_backend() != "tpu"
        cam = _cam_tuple(camera, img_h, img_w)
        rows = -(-(-(-n // LANES)) // SUB) * SUB
        pb = jnp.asarray(pix_base, jnp.int32).reshape(1)
        seed = jnp.asarray(seed, jnp.int32).reshape(1)
        return _run(
            self.key, seed, self.sph_table, self.sph_nodes, self.sph_links,
            self.sph_start, self.tri_table, self.tri_nodes,
            None, None, None, None, None, None, None,
            max_depth=max_depth, t_min=t_min, interpret=interpret,
            record=True, shade=shade, need_p=self.need_p,
            need_uv=self.need_uv, cam=cam, pix_base=pb, rows=rows)

    def hit(self, o, d, tm, alive, t_min=0.001, sub=STEP_SUB):
        """ONE closest-hit query via the pure hit kernel (no shading, no
        scatter, no RNG) — the wavefront driver's intersector.

        Returns (packed (N,) i32, p (N, 3), u, v, normal (N, 3), slot (N,))
        — see `_make_hit_kernel` for the field semantics.  Requires
        `supports_hit` (no media, dense sphere loop)."""
        assert self.supports_hit
        interpret = jax.default_backend() != "tpu"
        n = o.shape[0]
        tile = sub * LANES
        rows = -(-n // tile) * sub
        pad = rows * LANES - n
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
            tm = jnp.concatenate([tm, jnp.zeros(pad, tm.dtype)])
            alive = jnp.concatenate([alive, jnp.zeros(pad, bool)])
        args = [a.reshape(rows, LANES) for a in
                (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tm,
                 alive.astype(jnp.float32))]
        out = _run_hit(self.key, self.sph_table, self.sph_hit_nodes,
                       self.hit_nodes, self.tri_geom, *args, t_min=t_min,
                       interpret=interpret, sub=sub)
        flat = [a.reshape(-1)[:n] for a in out]
        packed = flat[0]
        p = jnp.stack(flat[1:4], axis=-1)
        normal = jnp.stack(flat[6:9], axis=-1)
        return packed, p, flat[4], flat[5], normal, flat[9]

    def fused_packed(self, o, d, tm, key, max_depth=50, t_min=0.001):
        """Shade AND record in one kernel pass: (radiance (n, 3), planes).

        The fused differentiable forward (engine/fused_diff.py): radiance is
        the primal output, the raw TILE-PADDED record planes
        ((D, rows, LANES) each) are the custom-VJP residual the closed-form
        XLA adjoint consumes — they never round-trip through XLA autodiff.
        """
        interpret = jax.default_backend() != "tpu"
        n, seed, args = self._tile_args(o, d, tm, key)
        out = _run(
            self.key, seed, self.sph_table, self.sph_nodes, self.sph_links,
            self.sph_start, self.tri_table, self.tri_nodes,
            *args,
            max_depth=max_depth, t_min=t_min, interpret=interpret,
            record=True, shade=True, need_p=self.need_p, need_uv=self.need_uv,
        )
        lr, lg, lb = out[:3]
        rad = jnp.stack([lr.reshape(-1), lg.reshape(-1), lb.reshape(-1)],
                        axis=-1)[:n]
        return rad, tuple(out[3:])

    def walk_packed(self, o, d, tm, key, max_depth=50, t_min=0.001):
        """Phase-1 detached path walk -> tuple of RAW record planes.

        Returns (packed (D, N) i32, *extra) where packed holds mat_id in the
        low 16 bits and hit/cont/miss in bits 16-18; extra is (px, py, pz)
        when the scene needs hit points and (u, v) when it needs uv.  Keeping
        the walk's residual in this compact form (instead of unpacked bool
        planes) is what makes the differentiable path fast: the outer
        spp/wave scans store ONE i32 plane per wave and the checkpointed
        phase-2 (engine.integrator.shade_packed) re-derives the masks in the
        backward pass.
        """
        interpret = jax.default_backend() != "tpu"
        n, seed, args = self._tile_args(o, d, tm, key)
        out = _run(
            self.key, seed, self.sph_table, self.sph_nodes, self.sph_links,
            self.sph_start, self.tri_table, self.tri_nodes,
            *args,
            max_depth=max_depth, t_min=t_min, interpret=interpret, record=True,
            need_p=self.need_p, need_uv=self.need_uv,
        )
        flat = lambda a: a.reshape(max_depth, -1)[:, :n]
        return tuple(flat(a) for a in out)

    def walk(self, o, d, tm, key, max_depth=50, t_min=0.001):
        """Phase-1 detached path walk -> engine.integrator.BounceData.

        The kernel records (mat_id, masks) per bounce, plus hit points when
        any position-dependent texture (checker/perlin) is used and uv when
        image textures are.  Feed the result to
        `engine.integrator.shade_radiance` for the differentiable phase 2.
        (The fast differentiable path uses `walk_packed` + `shade_packed`
        instead — see there.)
        """
        from ..engine.integrator import unpack_walk

        planes = self.walk_packed(o, d, tm, key, max_depth=max_depth,
                                  t_min=t_min)
        return unpack_walk(planes, self.need_p, self.need_uv)
