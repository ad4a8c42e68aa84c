"""Perlin noise: host-built tables, vectorized device evaluation.

Reference `perlin.h` builds 256 random unit gradient vectors plus three
permutation tables on-device with curand (`perlin.h:63-76`) and evaluates
hashed trilinear Hermite-smoothed gradient noise per point (`perlin.h:85-112`)
and an fBm `turb` sum (`perlin.h:114-126`).  Here the tables are built once on
host with numpy and evaluated for whole `(N, 3)` point batches: the 8 corner
lookups become 8 vectorized gathers and the trilinear accumulation is a fused
elementwise expression on the VPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import Array

from .types import PerlinTables

POINT_COUNT = 256


def make_tables(rng: np.random.Generator) -> PerlinTables:
    """Host-side table build (reference `perlin.h:63-76`).

    Gradients are cube samples normalized — the reference's
    `unit_vector(vec3::random(-1, 1))`, not rejection sampling.
    """
    v = rng.uniform(-1.0, 1.0, size=(POINT_COUNT, 3)).astype(np.float32)
    v /= np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    perms = [rng.permutation(POINT_COUNT).astype(np.int32) for _ in range(3)]
    return PerlinTables(
        ranvec=jnp.asarray(v),
        perm_x=jnp.asarray(perms[0]),
        perm_y=jnp.asarray(perms[1]),
        perm_z=jnp.asarray(perms[2]),
    )


def noise(tables: PerlinTables, p: Array) -> Array:
    """Gradient noise at points p (..., 3) -> (...,) in [-1, 1].

    Vectorized form of reference `perlin::noise` (`perlin.h:85-112`) +
    `perlin_interp` (`perlin.h:36-57`).
    """
    pf = jnp.floor(p)
    u = p[..., 0] - pf[..., 0]
    v = p[..., 1] - pf[..., 1]
    w = p[..., 2] - pf[..., 2]
    i = pf[..., 0].astype(jnp.int32)
    j = pf[..., 1].astype(jnp.int32)
    k = pf[..., 2].astype(jnp.int32)

    # Hermite cubic smoothing
    uu = u * u * (3.0 - 2.0 * u)
    vv = v * v * (3.0 - 2.0 * v)
    ww = w * w * (3.0 - 2.0 * w)

    accum = jnp.zeros_like(u)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                idx = (
                    tables.perm_x[(i + di) & 255]
                    ^ tables.perm_y[(j + dj) & 255]
                    ^ tables.perm_z[(k + dk) & 255]
                )
                g = tables.ranvec[idx]  # (..., 3) gather
                weight = (
                    g[..., 0] * (u - di) + g[..., 1] * (v - dj) + g[..., 2] * (w - dk)
                )
                accum = accum + (
                    (di * uu + (1 - di) * (1.0 - uu))
                    * (dj * vv + (1 - dj) * (1.0 - vv))
                    * (dk * ww + (1 - dk) * (1.0 - ww))
                    * weight
                )
    return accum


def turb(tables: PerlinTables, p: Array, depth: int = 7) -> Array:
    """fBm octave sum with |.| (reference `perlin::turb`, `perlin.h:114-126`).

    depth is static so the octave loop unrolls at trace time.
    """
    accum = jnp.zeros(p.shape[:-1], p.dtype)
    weight = 1.0
    q = p
    for _ in range(depth):
        accum = accum + weight * noise(tables, q)
        weight *= 0.5
        q = q * 2.0
    return jnp.abs(accum)
