"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_gpu_tpu.accel import traverse as xla_traverse
from raytracing_gpu_tpu.ops.pallas_traverse import TILE, traverse_triangles_pallas
from raytracing_gpu_tpu.scene.builder import SceneBuilder

INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture(scope="module")
def tri_scene(np_rng=None):
    rng = np.random.default_rng(7)
    b = SceneBuilder()
    mat = b.lambertian((0.5, 0.5, 0.5))
    for _ in range(200):
        v0 = rng.uniform(-6, 6, 3)
        b.triangle(v0, v0 + rng.uniform(-2, 2, 3), v0 + rng.uniform(-2, 2, 3), mat)
    return b.build(bvh="always")


class TestPallasTraversal:
    def test_matches_xla_traversal(self, tri_scene):
        rng = np.random.default_rng(1)
        n = TILE * 2
        o = jnp.asarray(rng.uniform(-8, 8, (n, 3)), jnp.float32)
        tgt = rng.uniform(-4, 4, (n, 3))
        d = jnp.asarray(tgt - np.asarray(o), jnp.float32)

        t_ref, i_ref = xla_traverse.traverse_triangles(tri_scene, o, d, 0.001)
        t_pal, i_pal = traverse_triangles_pallas(
            tri_scene.tri_bvh, tri_scene.triangles, o, d, t_min=0.001,
            interpret=INTERPRET,
        )
        hit_ref = np.asarray(t_ref) < 1e29
        hit_pal = np.asarray(t_pal) < 1e29
        np.testing.assert_array_equal(hit_ref, hit_pal)
        assert hit_ref.sum() > 50
        np.testing.assert_allclose(np.asarray(t_pal)[hit_pal],
                                   np.asarray(t_ref)[hit_ref], rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(i_pal)[hit_pal],
                                      np.asarray(i_ref)[hit_ref])

    def test_all_miss_tile(self, tri_scene):
        n = TILE
        o = jnp.full((n, 3), 1000.0)
        d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
        t, _ = traverse_triangles_pallas(
            tri_scene.tri_bvh, tri_scene.triangles, o, d, interpret=INTERPRET
        )
        assert np.all(np.asarray(t) >= 1e29)
