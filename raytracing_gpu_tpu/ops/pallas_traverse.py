"""Pallas TPU kernel: BVH traversal with the scene resident in VMEM.

The XLA while-loop traversal (accel/traverse.py) advances the whole ray batch
one node per step, paying an HBM gather + full-batch select every step.  This
kernel moves the flat BVH (node bounds, threaded links, leaf ids) and the
triangle soup into VMEM once per ray tile, then runs the threaded-link walk
over a (TILE,) ray vector with on-chip data only — the per-step cost is pure
VPU arithmetic + VMEM gathers.

Fits: a 100k-triangle mesh is ~50k nodes (2.4 MB bounds+links) + 3.6 MB of
triangle vertices — inside the ~16 MB VMEM budget, which covers every
reference scene (BASELINE config 5 is the 100k-tri backpack).

The kernel is forward-only and detached (geometry carries no gradients by
design — engine/diff.py); the caller wires it through the same candidate
interface as `accel.traverse.traverse_triangles`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
_TRI_EPS = 1e-7
_EPS_DIV = 1e-12

# ray tile per grid step; multiple of the f32 lane tile (8, 128)
TILE = 1024


def _traverse_kernel(
    # inputs (VMEM)
    o_ref,          # (TILE, 3) ray origins
    d_ref,          # (TILE, 3) ray directions
    node_min_ref,   # (M, 3)
    node_max_ref,   # (M, 3)
    hit_link_ref,   # (M, 1) int32
    miss_link_ref,  # (M, 1) int32
    leaf_ref,       # (M, K) int32
    v0_ref,         # (T, 3)
    e1_ref,         # (T, 3)
    e2_ref,         # (T, 3)
    # outputs (VMEM)
    t_out_ref,      # (TILE, 1)
    idx_out_ref,    # (TILE, 1) int32
    *,
    max_steps: int,
    t_min: float,
):
    ox = o_ref[:, 0]
    oy = o_ref[:, 1]
    oz = o_ref[:, 2]
    dx = d_ref[:, 0]
    dy = d_ref[:, 1]
    dz = d_ref[:, 2]

    def safe_inv(v):
        return 1.0 / jnp.where(jnp.abs(v) < _EPS_DIV,
                               jnp.where(v >= 0, _EPS_DIV, -_EPS_DIV), v)

    ix = safe_inv(dx)
    iy = safe_inv(dy)
    iz = safe_inv(dz)

    k = leaf_ref.shape[1]

    def body(state):
        step, node, t_best, i_best = state
        nid = jnp.maximum(node, 0)
        # VMEM gathers of node data
        n_lo_x = node_min_ref[nid, 0]
        n_lo_y = node_min_ref[nid, 1]
        n_lo_z = node_min_ref[nid, 2]
        n_hi_x = node_max_ref[nid, 0]
        n_hi_y = node_max_ref[nid, 1]
        n_hi_z = node_max_ref[nid, 2]

        tx0 = (n_lo_x - ox) * ix
        tx1 = (n_hi_x - ox) * ix
        ty0 = (n_lo_y - oy) * iy
        ty1 = (n_hi_y - oy) * iy
        tz0 = (n_lo_z - oz) * iz
        tz1 = (n_hi_z - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                         jnp.minimum(tz0, tz1))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                         jnp.maximum(tz0, tz1))
        live = node >= 0
        hit_box = live & (tf >= jnp.maximum(tn, t_min)) & (tn <= t_best)

        # leaf primitive tests, K triangles per step (Moller-Trumbore)
        for kk in range(k):
            pid = leaf_ref[nid, kk]
            valid = hit_box & (pid >= 0)
            pid = jnp.maximum(pid, 0)
            v0x = v0_ref[pid, 0]
            v0y = v0_ref[pid, 1]
            v0z = v0_ref[pid, 2]
            e1x = e1_ref[pid, 0]
            e1y = e1_ref[pid, 1]
            e1z = e1_ref[pid, 2]
            e2x = e2_ref[pid, 0]
            e2y = e2_ref[pid, 1]
            e2z = e2_ref[pid, 2]
            # h = d x e2
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            a = e1x * hx + e1y * hy + e1z * hz
            f = 1.0 / jnp.where(jnp.abs(a) < _TRI_EPS, _TRI_EPS, a)
            sx = ox - v0x
            sy = oy - v0y
            sz = oz - v0z
            u = f * (sx * hx + sy * hy + sz * hz)
            # q = s x e1
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = f * (dx * qx + dy * qy + dz * qz)
            t = f * (e2x * qx + e2y * qy + e2z * qz)
            ok = (
                valid
                & (jnp.abs(a) > _TRI_EPS)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t >= jnp.maximum(t_min, _TRI_EPS)) & (t < t_best)
            )
            t_best = jnp.where(ok, t, t_best)
            i_best = jnp.where(ok, pid, i_best)

        nxt = jnp.where(hit_box, hit_link_ref[nid, 0], miss_link_ref[nid, 0])
        node = jnp.where(live, nxt, -1)
        return step + 1, node, t_best, i_best

    def cond(state):
        step, node, _, _ = state
        return (step < max_steps) & jnp.any(node >= 0)

    n = ox.shape[0]
    state = (
        jnp.int32(0),
        jnp.zeros(n, jnp.int32),
        jnp.full(n, BIG, jnp.float32),
        jnp.full(n, -1, jnp.int32),
    )
    _, _, t_best, i_best = jax.lax.while_loop(cond, body, state)
    t_out_ref[:, 0] = jnp.where(i_best >= 0, t_best, BIG)
    idx_out_ref[:, 0] = jnp.maximum(i_best, 0)


@functools.partial(jax.jit, static_argnames=("t_min", "max_steps", "interpret"))
def traverse_triangles_pallas(bvh, triangles, o, d, t_min: float = 0.001,
                              max_steps: int = 100000, interpret: bool = False):
    """(t, idx) closest triangle for each ray via the VMEM-resident kernel.

    o, d: (N, 3) with N a multiple of TILE (callers pad).  Returns t = BIG on
    miss (idx clamped to 0), matching accel.traverse.traverse_triangles.
    """
    n = o.shape[0]
    assert n % TILE == 0, f"ray count {n} not a multiple of {TILE}"
    grid = (n // TILE,)

    m = bvh.node_min.shape[0]
    kernel = functools.partial(_traverse_kernel, max_steps=max_steps, t_min=t_min)
    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bvh.leaf_prims.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(triangles.v0.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(triangles.e1.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(triangles.e2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        o, d,
        bvh.node_min, bvh.node_max,
        bvh.hit_link[:, None], bvh.miss_link[:, None], bvh.leaf_prims,
        triangles.v0, triangles.e1, triangles.e2,
    )
    return jax.lax.stop_gradient(t[:, 0]), idx[:, 0]
