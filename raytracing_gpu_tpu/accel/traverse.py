"""Stackless BVH traversal on device (XLA while-loop form).

Counterpart of the reference's single-ray stackless walk (`bvh.h:348-436`):
here the *whole ray batch* shares one `lax.while_loop`; each step advances
every ray's int32 node cursor by one threaded link (hit_link on AABB hit,
miss_link otherwise) and tests the <=K primitives of leaf nodes as one
vectorized gather+intersect.  The loop runs until every cursor is -1 —
per-step work is gathers + fused vector math, which is the shape the VPU
wants.  Traversal outputs are detached from autodiff (geometry gradients are
out of scope per the north star; see engine/diff.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..core import vec

BIG = 1e30  # plain float: also used as an argument default
_EPS_DIV = 1e-12
_TRI_EPS = 1e-7


def _safe_inv(d: Array) -> Array:
    return 1.0 / jnp.where(jnp.abs(d) < _EPS_DIV,
                           jnp.where(d >= 0, _EPS_DIV, -_EPS_DIV), d)


def _traverse(bvh, leaf_test, o, d, t_min, t_max):
    """Generic threaded-link traversal.

    leaf_test(prim_ids (N, K), t_best (N,)) -> t (N, K) candidate hits
    (BIG = miss; ids < 0 already masked by caller contract).
    Returns (t_best (N,), idx_best (N,)) with BIG / -1 for miss.
    """
    n = o.shape[0]
    inv = _safe_inv(d)  # (N, 3)

    def cond(state):
        node, _, _ = state
        return jnp.any(node >= 0)

    def body(state):
        node, t_best, i_best = state
        nid = jnp.maximum(node, 0)
        nmin = bvh.node_min[nid]  # (N, 3) gather
        nmax = bvh.node_max[nid]
        t0 = (nmin - o) * inv
        t1 = (nmax - o) * inv
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        live = node >= 0
        hit_box = live & (tf >= jnp.maximum(tn, t_min)) & (tn <= t_best)

        prim_ids = bvh.leaf_prims[nid]  # (N, K) gather
        valid = hit_box[:, None] & (prim_ids >= 0)
        ts = jnp.where(valid, leaf_test(jnp.maximum(prim_ids, 0), t_best), BIG)
        k_best = jnp.argmin(ts, axis=1)
        t_k = jnp.take_along_axis(ts, k_best[:, None], axis=1)[:, 0]
        better = t_k < t_best
        t_best = jnp.where(better, t_k, t_best)
        i_best = jnp.where(
            better, jnp.take_along_axis(prim_ids, k_best[:, None], axis=1)[:, 0],
            i_best,
        )

        nxt = jnp.where(hit_box, bvh.hit_link[nid], bvh.miss_link[nid])
        node = jnp.where(live, nxt, -1)
        return node, t_best, i_best

    node0 = jnp.zeros(n, jnp.int32)
    t_init = jnp.minimum(jnp.full(n, BIG), t_max)
    state = jax.lax.while_loop(cond, body, (node0, t_init, jnp.full(n, -1, jnp.int32)))
    _, t_best, i_best = state
    t_best = jnp.where(i_best >= 0, t_best, BIG)
    return (jax.lax.stop_gradient(t_best),
            jnp.maximum(i_best, 0))  # idx 0 is safe to gather; t=BIG marks miss


def traverse_triangles(scene, o, d, t_min, t_max=BIG):
    """(t, idx) closest triangle via the scene's triangle BVH.

    Leaf test = Moller-Trumbore on gathered triangle data
    (reference `triangle.h:120-160`), K triangles per step.
    """
    tr = scene.triangles
    bvh = scene.tri_bvh
    o_sg, d_sg = jax.lax.stop_gradient((o, d))

    def leaf_test(ids, t_best):
        v0 = tr.v0[ids]            # (N, K, 3)
        e1 = tr.e1[ids]
        e2 = tr.e2[ids]
        dd = d_sg[:, None, :]
        h = vec.cross(dd, e2)
        a = jnp.sum(e1 * h, -1)
        f = 1.0 / jnp.where(jnp.abs(a) < _TRI_EPS, _TRI_EPS, a)
        s = o_sg[:, None, :] - v0
        u = f * jnp.sum(s * h, -1)
        q = vec.cross(s, e1)
        v = f * jnp.sum(dd * q, -1)
        t = f * jnp.sum(e2 * q, -1)
        ok = (
            (jnp.abs(a) > _TRI_EPS)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= jnp.maximum(t_min, _TRI_EPS)) & (t <= t_best[:, None])
        )
        return jnp.where(ok, t, BIG)

    return _traverse(bvh, leaf_test, o_sg, d_sg, t_min, t_max)


def traverse_spheres(scene, o, d, tm, t_min, t_max=BIG):
    """(t, idx) closest non-medium sphere via the scene's sphere BVH.

    Leaf test = the quadratic with correct near/far root fallback
    (reference `sphere.h:35-73`, corrected per SURVEY quirk 1), with
    per-ray-time lerped centers for moving spheres.
    """
    sp = scene.spheres
    bvh = scene.sphere_bvh
    o_sg, d_sg = jax.lax.stop_gradient((o, d))

    def leaf_test(ids, t_best):
        denom = jnp.where(jnp.abs(sp.time1[ids] - sp.time0[ids]) < 1e-12, 1.0,
                          sp.time1[ids] - sp.time0[ids])
        frac = (tm[:, None] - sp.time0[ids]) / denom
        center = sp.center0[ids] + frac[..., None] * (sp.center1[ids] - sp.center0[ids])
        oc = o_sg[:, None, :] - center
        a = vec.length_squared(d_sg)[:, None]
        half_b = jnp.sum(oc * d_sg[:, None, :], -1)
        c = vec.length_squared(oc) - sp.radius[ids] ** 2
        disc = half_b * half_b - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv_a = 1.0 / jnp.maximum(a, _EPS_DIV)
        near = (-half_b - sq) * inv_a
        far = (-half_b + sq) * inv_a
        ok_near = (disc > 0) & (near >= t_min) & (near <= t_best[:, None])
        ok_far = (disc > 0) & (far >= t_min) & (far <= t_best[:, None])
        return jnp.where(ok_near, near, jnp.where(ok_far, far, BIG))

    return _traverse(bvh, leaf_test, o_sg, d_sg, t_min, t_max)
