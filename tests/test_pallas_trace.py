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
    def test_walk_supports_every_scene(self):
        """Round 2: the kernel covers the FULL scene set in walk mode —
        media, perlin, sphere image-texture uv included."""
        for name in scenes.names():
            assert supports_scene(scenes.get(name).scene), name

    def test_forward_support_matrix(self):
        expect = {
            "cornell_box": True, "triangle": True, "triangles": True,
            "cornell_smoke": True,        # media now shade in-kernel
            "two_perlin_spheres": True,   # hash-gradient perlin in-kernel
            "big_scene1": True,
            "earth": False,  # image texture -> record mode + XLA shade only
            "door": False,
        }
        for name, want in expect.items():
            assert supports_forward(scenes.get(name).scene) == want, name


@pytest.mark.parametrize("name", ["basic", "first", "cornell_box", "big_scene1",
                                  "triangle", "triangles",
                                  "two_perlin_spheres", "cornell_smoke"])
class TestOracle:
    def test_depth1_exact(self, name):
        if name == "cornell_smoke":
            pytest.skip("medium free-path sampling is RNG-dependent at depth 1")
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

    def test_streamed_leaf_dma_matches_resident(self, monkeypatch):
        """HBM-streamed leaf DMA path (big meshes) vs the VMEM-resident
        path: force streaming on the door mesh (2,165 tris) by dropping the
        VMEM budget and require depth-1 exact agreement with the XLA tracer.
        On TPU this is the only kernel path for 100k-triangle scenes."""
        from raytracing_gpu_tpu.ops import pallas_trace as pt

        sd = scenes.get("door")
        o, d, tm = _rays_for(sd)
        r = np.asarray(trace(sd.scene, o, d, tm, KEY, max_depth=1))
        # below the door table's ~1.1 MB row-major footprint (so the bake
        # falls through to streaming) but above its streamed node-side cost
        monkeypatch.setattr(pt, "_TRI_VMEM_BUDGET", 768 * 1024)
        tracer = PallasTracer(sd.scene)
        assert tracer.bake.tri_stream
        p = np.asarray(tracer(None, o, d, tm, KEY, max_depth=1))
        np.testing.assert_allclose(p, r, rtol=1e-4, atol=1e-5)

    def test_walk_records_uv_for_image_textures(self):
        sd = scenes.get("door")
        tracer = PallasTracer(sd.scene)
        assert tracer.need_uv and tracer.n_tri_nodes > 0
        o, d, tm = _rays_for(sd)
        data = tracer.walk(o, d, tm, KEY, max_depth=2)
        hit_uv = np.asarray(data.u)[np.asarray(data.hit)]
        # the door mesh carries real uv coords; some hits must land on it
        assert hit_uv.size and (np.abs(hit_uv) > 1e-6).any()


class TestSphereUV:
    def test_sphere_uv_matches_xla_first_bounce(self):
        """Polynomial atan2/acos sphere uv (Mosaic lowers no inverse trig)
        must match the XLA arctan2/arccos uv to texel precision."""
        from raytracing_gpu_tpu.engine.intersect import closest_hit

        sd = scenes.get("earth")
        tracer = PallasTracer(sd.scene)
        o, d, tm = _rays_for(sd, n=4096, seed=2)
        data = tracer.walk(o, d, tm, KEY, max_depth=2)
        rec = closest_hit(sd.scene, o, d, tm, jax.random.PRNGKey(9))
        hit_k = np.asarray(data.hit[0])
        hit_x = np.asarray(rec.hit)
        np.testing.assert_array_equal(hit_k, hit_x)
        m = hit_k & (np.asarray(rec.mat_id) == np.asarray(data.mat_id[0]))
        assert m.sum() > 100
        du = np.abs(np.asarray(data.u[0]) - np.asarray(rec.u))[m]
        du = np.minimum(du, 1.0 - du)  # u wraps at the atan2 seam
        dv = np.abs(np.asarray(data.v[0]) - np.asarray(rec.v))[m]
        assert du.max() < 1e-4 and dv.max() < 1e-4


class TestMedia:
    def test_smoke_forward_matches_xla_statistically(self):
        """Constant media in-kernel (free-path sampling with the PCG RNG)
        vs the XLA medium pass — independent RNG streams, so statistical."""
        sd = scenes.get("cornell_smoke")
        tracer = PallasTracer(sd.scene)
        o, d, tm = _rays_for(sd, n=4096, seed=1)
        ks = [jax.random.PRNGKey(i) for i in range(4)]
        p = np.mean([np.asarray(tracer(None, o, d, tm, k, max_depth=8))
                     for k in ks], axis=0)
        r = np.mean([np.asarray(trace(sd.scene, o, d, tm, k, max_depth=8))
                     for k in ks], axis=0)
        assert abs(p.mean() - r.mean()) < 0.05 * max(r.mean(), 1e-6)
        corr = np.corrcoef(p.reshape(-1), r.reshape(-1))[0, 1]
        assert corr > 0.85


class TestRussianRoulette:
    def test_kernel_rr_matches_xla_rr_statistically(self):
        """In-kernel RR (megakernel forward) agrees with the XLA engine's RR
        in distribution — same clip(.05,1) survival law, independent RNG."""
        from raytracing_gpu_tpu import RenderSettings
        from raytracing_gpu_tpu.engine.render import compile_renderer

        sd = scenes.get("cornell_box")
        st = RenderSettings(image_width=24, aspect_ratio=1.0, spp_per_chunk=24,
                            num_chunks=1, max_depth=16, ray_batch=576,
                            rr_start=3)
        key = jax.random.PRNGKey(11)
        xla = np.asarray(compile_renderer(sd.scene, sd.camera, st,
                                          engine="xla")(key))
        pal = np.asarray(compile_renderer(sd.scene, sd.camera, st,
                                          engine="pallas")(key))
        npix = st.image_height * st.image_width
        a = xla[:npix] / st.spp_per_chunk
        b = pal[:npix] / st.spp_per_chunk
        assert abs(a.mean() - b.mean()) / a.mean() < 0.1
        corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
        assert corr > 0.9


class TestHitKernel:
    """Pure closest-hit kernel (the sorted-wavefront intersector) vs the XLA
    `closest_hit` oracle: hits are RNG-free, so agreement is exact."""

    @pytest.mark.parametrize("name", ["first", "triangles", "door",
                                      "cornell_box"])
    def test_hit_matches_closest_hit(self, name):
        from raytracing_gpu_tpu.engine.intersect import closest_hit
        from raytracing_gpu_tpu.engine.wavefront import resolve_hit

        sd = scenes.get(name)
        tracer = PallasTracer(sd.scene)
        assert tracer.supports_hit
        o, d, tm = _rays_for(sd, n=4096, seed=5)
        packed, p, u, v, normal, slot = tracer.hit(
            o, d, tm, jnp.ones(o.shape[0], bool))
        rec = resolve_hit(sd.scene, tracer.tri_perm, packed, p, u, v,
                          normal, slot, d)
        ref = closest_hit(sd.scene, o, d, tm, jax.random.PRNGKey(9))
        hk = np.asarray(rec.hit)
        np.testing.assert_array_equal(hk, np.asarray(ref.hit))
        assert hk.sum() > 200
        np.testing.assert_array_equal(np.asarray(rec.mat_id)[hk],
                                      np.asarray(ref.mat_id)[hk])
        np.testing.assert_allclose(np.asarray(rec.p)[hk],
                                   np.asarray(ref.p)[hk],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(rec.normal)[hk],
                                   np.asarray(ref.normal)[hk],
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(rec.front_face)[hk],
                                      np.asarray(ref.front_face)[hk])
        # uv to texel precision (sphere uv uses the polynomial atan2/acos)
        du = np.abs(np.asarray(rec.u) - np.asarray(ref.u))[hk]
        du = np.minimum(du, 1.0 - du)
        dv = np.abs(np.asarray(rec.v) - np.asarray(ref.v))[hk]
        assert du.max() < 1e-3 and dv.max() < 1e-3

    def test_dead_rays_cost_nothing_and_stay_dead(self):
        sd = scenes.get("triangles")
        tracer = PallasTracer(sd.scene)
        o, d, tm = _rays_for(sd, n=2048, seed=5)
        packed, *_ = tracer.hit(o, d, tm, jnp.zeros(o.shape[0], bool))
        assert int(np.asarray(packed).sum()) == 0

    def test_wavefront_renderer_matches_xla_statistically(self):
        from raytracing_gpu_tpu import RenderSettings
        from raytracing_gpu_tpu.core import rng as rngmod
        from raytracing_gpu_tpu.engine.render import render_chunk
        from raytracing_gpu_tpu.engine.wavefront import \
            compile_wavefront_renderer

        sd = scenes.get("triangles")
        st = RenderSettings(image_width=64, aspect_ratio=sd.aspect,
                            spp_per_chunk=4, num_chunks=1, max_depth=4,
                            ray_batch=4096)
        key = rngmod.fold(jax.random.PRNGKey(3), 0)
        xla = np.asarray(render_chunk(sd.scene, sd.camera, st, key))
        wf = np.asarray(compile_wavefront_renderer(sd.scene, sd.camera,
                                                   st)(key))
        npix = st.image_height * st.image_width
        a = xla[:npix] / st.spp_per_chunk
        b = wf[:npix] / st.spp_per_chunk
        assert abs(a.mean() - b.mean()) < 0.02
        corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
        assert corr > 0.95


class TestBigScene1EngineParity:
    def test_first_bounce_exact_vs_xla(self):
        """Per-ray engine-vs-engine net for the 500-sphere BVH scene: the
        record walk's first bounce is RNG-free, so the Pallas sphere-BVH
        packet walk must agree with the XLA `closest_hit` EXACTLY — immune
        to the unreplayable-curand-draw problem that caps the published-image
        correlation at 0.80 (VERDICT r3 weak #6)."""
        from raytracing_gpu_tpu.engine.intersect import closest_hit

        sd = scenes.get("big_scene1")
        tracer = PallasTracer(sd.scene)
        assert tracer.n_sph_nodes > 0  # the sphere BVH is what's under test
        o, d, tm = _rays_for(sd, n=4096, seed=7)
        planes = tracer.walk_packed(o, d, tm, KEY, max_depth=1)
        packed = np.asarray(planes[0])[0]
        ref = closest_hit(sd.scene, o, d, tm, jax.random.PRNGKey(9))
        hit_k = (packed & (1 << 16)) != 0
        np.testing.assert_array_equal(hit_k, np.asarray(ref.hit))
        assert hit_k.sum() > 500
        np.testing.assert_array_equal((packed & 0xFFFF)[hit_k],
                                      np.asarray(ref.mat_id)[hit_k])

    def test_wavefront_rr_statistical_parity(self):
        """RR on an image-textured scene through the wavefront driver (the
        record walk cannot roulette — VERDICT r3): at rr_start=3 the
        estimator must stay unbiased vs full depth."""
        from raytracing_gpu_tpu import RenderSettings
        from raytracing_gpu_tpu.engine.wavefront import \
            compile_wavefront_renderer

        sd = scenes.get("door")
        key = jax.random.PRNGKey(4)
        outs = {}
        for rr in (0, 3):
            st = RenderSettings(image_width=48, aspect_ratio=sd.aspect,
                                spp_per_chunk=8, num_chunks=1, max_depth=8,
                                ray_batch=1296, rr_start=rr)
            npix = st.num_pixels
            outs[rr] = (np.asarray(compile_wavefront_renderer(
                sd.scene, sd.camera, st)(key))[:npix] / 8)
        a, b = outs[0].mean(), outs[3].mean()
        assert abs(a - b) < 0.05 * a + 2e-3, (a, b)
