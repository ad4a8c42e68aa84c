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
) -> Array:
    """Estimate radiance along each ray.  Returns (N, 3).

    Mirrors `color_f` (`render.h:55-81`): at each bounce, find the closest hit;
    on miss add background and terminate; otherwise add emission and continue
    with the scattered ray, or terminate if the material absorbs.
    Depth-exhausted rays contribute nothing further (`render.h:79-80`).
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

    def bounce(state, depth):
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
        o = vec.where(hit_lane, rec.p, o)
        d = vec.where(hit_lane, sc.direction, d)
        return (o, d, tm, throughput, radiance, cont), None

    (_, _, _, _, radiance, _), _ = jax.lax.scan(
        bounce, state, jnp.arange(max_depth)
    )
    return radiance
