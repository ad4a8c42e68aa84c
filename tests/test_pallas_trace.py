"""Pallas megakernel vs XLA wavefront: geometry-exact + statistical oracle.

The kernel uses its own counter-based PCG streams, so depth-1 radiance
(RNG-free: first-hit emission/background) must match the XLA path exactly,
and multi-bounce radiance must agree statistically over many rays.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_gpu_tpu.engine.integrator import trace
from raytracing_gpu_tpu.models import scenes
from raytracing_gpu_tpu.ops.pallas_trace import (
    PallasTracer, supports_forward, supports_scene,
)

KEY = jax.random.PRNGKey(0)
N = 8192  # one kernel tile


def _rays_for(sd, n=N, seed=0):
    """Camera-ish random rays into the scene."""
    rng = np.random.default_rng(seed)
    cam = sd.camera
    u = rng.random(n).astype(np.float32)
    v = rng.random(n).astype(np.float32)
    o, d, tm = cam.get_rays(jax.random.PRNGKey(seed),
                            jnp.asarray(u), jnp.asarray(v))
    return o, d, tm


class TestSupport:
    def test_walk_support_matrix(self):
        expect = {
            "basic": True, "first": True, "cornell_box": True,
            "two_spheres": True, "big_scene1": True,
            "triangle": True, "triangles": True,
            "door": True,             # image texture on triangles: walk mode
            "cornell_smoke": False,   # constant media
            "earth": False,           # image texture on a SPHERE (no atan2)
            "two_perlin_spheres": False,  # perlin textures
        }
        for name, want in expect.items():
            assert supports_scene(scenes.get(name).scene) == want, name

    def test_forward_support_matrix(self):
        expect = {
            "cornell_box": True, "triangle": True, "triangles": True,
            "door": False,  # image texture -> record mode + XLA shade only
        }
        for name, want in expect.items():
            assert supports_forward(scenes.get(name).scene) == want, name


@pytest.mark.parametrize("name", ["basic", "first", "cornell_box", "big_scene1",
                                  "triangle", "triangles"])
class TestOracle:
    def test_depth1_exact(self, name):
        sd = scenes.get(name)
        tracer = PallasTracer(sd.scene)
        o, d, tm = _rays_for(sd)
        r = np.asarray(trace(sd.scene, o, d, tm, KEY, max_depth=1))
        p = np.asarray(tracer(None, o, d, tm, KEY, max_depth=1))
        np.testing.assert_allclose(p, r, rtol=1e-4, atol=1e-5)

    def test_multibounce_statistical(self, name):
        sd = scenes.get(name)
        tracer = PallasTracer(sd.scene)
        o, d, tm = _rays_for(sd)
        # independent RNG streams and high-variance estimators (small bright
        # lights): average both estimators over several seeds before comparing
        r = np.mean([
            np.asarray(trace(sd.scene, o, d, tm, jax.random.PRNGKey(s),
                             max_depth=6)).mean(0) for s in range(3)
        ], axis=0)
        p = np.mean([
            np.asarray(tracer(None, o, d, tm, jax.random.PRNGKey(s),
                              max_depth=6)).mean(0) for s in range(3)
        ], axis=0)
        np.testing.assert_allclose(p, r, rtol=0.1, atol=0.01)


class TestRendererIntegration:
    def test_forced_pallas_render_matches_xla_statistically(self):
        from raytracing_gpu_tpu import RenderSettings
        from raytracing_gpu_tpu.core import rng as rngmod
        from raytracing_gpu_tpu.engine.render import compile_renderer

        sd = scenes.get("basic")
        st = RenderSettings(image_width=64, aspect_ratio=sd.aspect,
                            spp_per_chunk=4, num_chunks=1, max_depth=4,
                            ray_batch=8192)
        key = rngmod.fold(jax.random.PRNGKey(3), 0)
        xla = np.asarray(compile_renderer(sd.scene, sd.camera, st, engine="xla")(key))
        pal = np.asarray(compile_renderer(sd.scene, sd.camera, st, engine="pallas")(key))
        npix = st.image_height * st.image_width
        a = xla[:npix] / st.spp_per_chunk
        b = pal[:npix] / st.spp_per_chunk
        # per-pixel MC noise at 4spp is large; compare image means and
        # correlation instead
        assert abs(a.mean() - b.mean()) < 0.02
        corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
        assert corr > 0.95


class TestMeshWalk:
    def test_door_walk_shade_matches_xla_statistically(self):
        """Image-textured mesh scene via record mode + XLA phase-2 shade
        (the engine="pallas" route for door/cup/backpack)."""
        from raytracing_gpu_tpu import RenderSettings
        from raytracing_gpu_tpu.core import rng as rngmod
        from raytracing_gpu_tpu.engine.render import compile_renderer

        sd = scenes.get("door")
        st = RenderSettings(image_width=64, aspect_ratio=sd.aspect,
                            spp_per_chunk=4, num_chunks=1, max_depth=4,
                            ray_batch=8192)
        key = rngmod.fold(jax.random.PRNGKey(3), 0)
        xla = np.asarray(compile_renderer(sd.scene, sd.camera, st,
                                          engine="xla")(key))
        pal = np.asarray(compile_renderer(sd.scene, sd.camera, st,
                                          engine="pallas")(key))
        npix = st.image_height * st.image_width
        a = xla[:npix] / st.spp_per_chunk
        b = pal[:npix] / st.spp_per_chunk
        assert abs(a.mean() - b.mean()) < 0.02
        corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
        assert corr > 0.95

    def test_walk_records_uv_for_image_textures(self):
        sd = scenes.get("door")
        tracer = PallasTracer(sd.scene)
        assert tracer.need_uv and tracer.n_tri_nodes > 0
        o, d, tm = _rays_for(sd)
        data = tracer.walk(o, d, tm, KEY, max_depth=2)
        hit_uv = np.asarray(data.u)[np.asarray(data.hit)]
        # the door mesh carries real uv coords; some hits must land on it
        assert hit_uv.size and (np.abs(hit_uv) > 1e-6).any()
