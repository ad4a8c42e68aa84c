"""Differentiable sorted wavefront (VERDICT r4 #2).

`make_record_trace_wave` records (mat, masks, p, uv) per bounce in pixel
order and `integrator.shade_packed` replays the throughput chain — the
same phase-2 as the megakernel record mode, now fed by the wavefront.
Oracles:

* primal parity: the record+shade primal must match the FORWARD wavefront
  renderer bit-for-bit-ish (identical key schedule, identical scatter
  directions, mask-multiply algebra == where algebra on finite operands);
* finite differences: AD gradients vs central differences on the same
  deterministic estimator (same paths on both sides of the perturbation).
"""

import jax
import numpy as np
import pytest

from raytracing_gpu_tpu import RenderSettings
from raytracing_gpu_tpu.core.camera import Camera
from raytracing_gpu_tpu.engine import diff
from raytracing_gpu_tpu.engine.render import compile_param_renderer
from raytracing_gpu_tpu.engine.wavefront import compile_wavefront_renderer
from raytracing_gpu_tpu.models import scenes
from raytracing_gpu_tpu.scene.builder import BLACK, SceneBuilder


def _mini_cornell():
    b = SceneBuilder(background=BLACK)
    red = b.lambertian((0.65, 0.05, 0.05))
    white = b.lambertian((0.73, 0.73, 0.73))
    green = b.lambertian((0.12, 0.45, 0.15))
    light = b.diffuse_light((15.0, 15.0, 15.0))
    b.rect("yz", 0, 555, 0, 555, 555, green)
    b.rect("yz", 0, 555, 0, 555, 0, red)
    b.rect("xz", 213, 343, 227, 332, 554, light)
    b.rect("xz", 0, 555, 0, 555, 0, white)
    b.rect("xz", 0, 555, 0, 555, 555, white)
    b.rect("xy", 0, 555, 0, 555, 555, white)
    b.box((0, 0, 0), (165, 330, 165), white, rotate_y=15,
          translate=(265, 0, 295))
    cam = Camera.make((278, 278, -800), (278, 278, 0), (0, 1, 0), 40, 1.0,
                      0.0, 10.0)
    return b.build(), cam


def _settings(aspect, width=24, spp=4, depth=4):
    return RenderSettings(image_width=width, aspect_ratio=aspect,
                          spp_per_chunk=spp, num_chunks=1, max_depth=depth,
                          ray_batch=width * width)


class TestDiffWavefront:
    def test_primal_matches_forward_wavefront(self):
        """Record+shade == the forward wavefront's in-loop accumulation,
        on the mesh scene class the route exists for."""
        sd = scenes.get("door")
        st = RenderSettings(image_width=48, aspect_ratio=sd.aspect,
                            spp_per_chunk=4, num_chunks=1, max_depth=4,
                            ray_batch=1296)
        key = jax.random.PRNGKey(6)
        npix = st.num_pixels
        chunk = compile_param_renderer(sd.scene, sd.camera, st,
                                       engine="wavefront")
        assert chunk.engine_name == "wavefront-record"
        params = diff.get_params(sd.scene)
        primal = np.asarray(chunk(params, key))[:npix]
        fwd = np.asarray(compile_wavefront_renderer(
            sd.scene, sd.camera, st)(key))[:npix]
        np.testing.assert_allclose(primal, fwd, rtol=1e-4, atol=1e-5)

    def test_rr_primal_matches_forward_wavefront(self):
        """Detached russian roulette: identical key schedule as the forward
        wavefront's RR, so the record+shade primal matches exactly."""
        sd = scenes.get("door")
        st = RenderSettings(image_width=48, aspect_ratio=sd.aspect,
                            spp_per_chunk=4, num_chunks=1, max_depth=8,
                            ray_batch=1296, rr_start=2)
        key = jax.random.PRNGKey(8)
        npix = st.num_pixels
        chunk = compile_param_renderer(sd.scene, sd.camera, st,
                                       engine="wavefront")
        params = diff.get_params(sd.scene)
        primal = np.asarray(chunk(params, key))[:npix]
        fwd = np.asarray(compile_wavefront_renderer(
            sd.scene, sd.camera, st)(key))[:npix]
        np.testing.assert_allclose(primal, fwd, rtol=1e-4, atol=1e-5)

    def test_rr_grads_match_finite_differences(self):
        """RR survival decisions use BAKED-parameter probabilities, so
        f(params) stays smooth and central differences remain valid."""
        scene, cam = _mini_cornell()
        st = RenderSettings(image_width=24, aspect_ratio=1.0,
                            spp_per_chunk=4, num_chunks=1, max_depth=6,
                            ray_batch=24 * 24, rr_start=2)
        chunk = compile_param_renderer(scene, cam, st, engine="wavefront")
        params = diff.get_params(scene)
        key = jax.random.PRNGKey(13)
        npix = st.num_pixels

        def loss(p):
            return float(chunk(p, key)[:npix].mean())

        grads = jax.grad(lambda p: chunk(p, key)[:npix].mean())(params)
        eps = 2e-3
        for name, idx in [("tex_c1", (0, 0)), ("tex_c1", (3, 2))]:
            ad = float(grads[name][idx])
            p_plus = dict(params)
            p_plus[name] = params[name].at[idx].add(eps)
            p_minus = dict(params)
            p_minus[name] = params[name].at[idx].add(-eps)
            fd = (loss(p_plus) - loss(p_minus)) / (2 * eps)
            assert ad == pytest.approx(fd, rel=5e-2, abs=2e-2), \
                (name, idx, ad, fd)

    def test_grads_match_finite_differences(self):
        scene, cam = _mini_cornell()
        st = _settings(1.0)
        chunk = compile_param_renderer(scene, cam, st, engine="wavefront")
        assert chunk.engine_name == "wavefront-record"
        params = diff.get_params(scene)
        key = jax.random.PRNGKey(42)
        npix = st.num_pixels

        def loss(p):
            return float(chunk(p, key)[:npix].mean())

        grads = jax.grad(lambda p: chunk(p, key)[:npix].mean())(params)
        eps = 2e-3
        # tex ids: 0 red wall, 1 white, 2 green, 3 light (SceneBuilder order)
        checks = [("tex_c1", (0, 0)), ("tex_c1", (2, 1)), ("tex_c1", (3, 2))]
        for name, idx in checks:
            ad = float(grads[name][idx])
            p_plus = dict(params)
            p_plus[name] = params[name].at[idx].add(eps)
            p_minus = dict(params)
            p_minus[name] = params[name].at[idx].add(-eps)
            fd = (loss(p_plus) - loss(p_minus)) / (2 * eps)
            assert ad == pytest.approx(fd, rel=5e-2, abs=2e-2), \
                (name, idx, ad, fd)
        # the scene's albedo gradient must be live (not all-zero)
        assert float(np.abs(np.asarray(grads["tex_c1"])).sum()) > 1e-3
