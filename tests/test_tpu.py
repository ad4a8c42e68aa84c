"""Real-TPU Mosaic tier: `RT_TPU_TESTS=1 pytest tests -m tpu`.

The CPU suite runs the megakernel in interpret mode only; the two Mosaic
lowering regressions of round 1 were caught by hand-run benches.  This tier
compiles and runs both kernel modes (forward shade + record walk) on the real
chip for the feature-heavy scenes: media free-path sampling, hash-gradient
perlin, polynomial sphere uv, the triangle packet walk, and the early-exit
while_loop.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip(f"backend is {jax.default_backend()}, not tpu")
    return jax


def _rays(sd, n, seed):
    import jax

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    u = jax.random.uniform(k1, (n,))
    v = jax.random.uniform(k2, (n,))
    return sd.camera.get_rays(k3, u, v)


@pytest.mark.parametrize("name", ["cornell_box", "cornell_smoke",
                                  "two_perlin_spheres", "big_scene1"])
def test_forward_kernel_compiles_and_is_finite(tpu, name):
    import jax

    from raytracing_gpu_tpu.models import scenes
    from raytracing_gpu_tpu.ops import pallas_trace as pt

    sd = scenes.get(name)
    assert pt.supports_forward(sd.scene)
    tracer = pt.PallasTracer(sd.scene)
    o, d, tm = _rays(sd, 8192, 1)
    out = np.asarray(tracer(None, o, d, tm, jax.random.PRNGKey(5), max_depth=8))
    assert np.all(np.isfinite(out)) and out.shape == (8192, 3)
    assert out.mean() > 0.0


@pytest.mark.parametrize("name", ["earth", "door"])
def test_walk_kernel_compiles_and_shades(tpu, name):
    import jax

    from raytracing_gpu_tpu.engine.integrator import shade_radiance
    from raytracing_gpu_tpu.models import scenes
    from raytracing_gpu_tpu.ops import pallas_trace as pt

    sd = scenes.get(name)
    tracer = pt.PallasTracer(sd.scene)
    o, d, tm = _rays(sd, 8192, 2)

    @jax.jit
    def run(k):
        data = tracer.walk(o, d, tm, k, max_depth=6)
        return shade_radiance(sd.scene, data)

    out = np.asarray(run(jax.random.PRNGKey(7)))
    assert np.all(np.isfinite(out)) and out.mean() > 0.0


def test_differentiable_chunk_on_tpu(tpu):
    import jax
    import jax.numpy as jnp

    from raytracing_gpu_tpu.core.config import RenderSettings
    from raytracing_gpu_tpu.engine import diff
    from raytracing_gpu_tpu.engine.render import compile_param_renderer
    from raytracing_gpu_tpu.models import scenes

    sd = scenes.get("cornell_box")
    st = RenderSettings(image_width=128, aspect_ratio=1.0, spp_per_chunk=2,
                        num_chunks=1, max_depth=4, ray_batch=16384)
    chunk = compile_param_renderer(sd.scene, sd.camera, st)
    params = diff.get_params(sd.scene)
    g = jax.jit(jax.grad(
        lambda p: chunk(p, jax.random.PRNGKey(0)).mean()))(params)
    for name, grad in g.items():
        assert np.all(np.isfinite(np.asarray(grad))), name
    assert np.abs(np.asarray(g["tex_c1"])).max() > 0.0


def test_100k_tri_walk_matches_xla(tpu):
    """Config-5 scale on the real chip: the default big-mesh kernel path at
    its actual 100,352-triangle size (the CPU tier only exercises the
    2,165-tri door mesh with a lowered threshold) against the XLA BVH walk.
    Row-major 51 MB can't fit VMEM, so the bake must pick the streamed-leaf
    DMA mode (fused (M, 9) node array resident, one DMA per visited
    leaf)."""
    import jax

    from raytracing_gpu_tpu.engine.intersect import closest_hit
    from raytracing_gpu_tpu.models import scenes
    from raytracing_gpu_tpu.ops import pallas_trace as pt

    sd = scenes.get("backpack")
    ntri = np.asarray(sd.scene.triangles.v0).shape[0]
    assert ntri == 100352
    tracer = pt.PallasTracer(sd.scene)
    assert tracer.bake.tri_mode == "stream"
    o, d, tm = _rays(sd, 8192, 3)
    k = jax.random.PRNGKey(9)
    planes = tracer.walk_packed(o, d, tm, k, max_depth=4)
    packed = np.asarray(planes[0])
    hit_k = (packed[0] & (1 << 16)) != 0
    rec = closest_hit(sd.scene, o, d, tm, k)
    hit_x = np.asarray(rec.hit)
    # same first-bounce hit set (walk RNG differs only at scatter, not hit)
    np.testing.assert_array_equal(hit_k, hit_x)
    assert hit_k.sum() > 1000
    # mat ids of the first bounce agree on hits
    mid_k = (packed[0] & 0xFFFF)[hit_k]
    mid_x = np.asarray(rec.mat_id)[hit_x]
    np.testing.assert_array_equal(mid_k, mid_x)


def test_fused_diff_chunk_on_tpu(tpu):
    """The hand-VJP fused path (engine/fused_diff.py) on the real chip:
    primal equals the two-phase compile_param_renderer, grads finite+nonzero."""
    import jax
    import jax.numpy as jnp

    from raytracing_gpu_tpu.core.config import RenderSettings
    from raytracing_gpu_tpu.engine import diff
    from raytracing_gpu_tpu.engine.fused_diff import compile_fused_param_renderer
    from raytracing_gpu_tpu.engine.render import compile_param_renderer
    from raytracing_gpu_tpu.models import scenes

    sd = scenes.get("cornell_box")
    st = RenderSettings(image_width=128, aspect_ratio=1.0, spp_per_chunk=2,
                        num_chunks=1, max_depth=4, ray_batch=16384)
    key = jax.random.PRNGKey(3)
    params = diff.get_params(sd.scene)
    ref = compile_param_renderer(sd.scene, sd.camera, st)
    # gen_rays=False shares compile_param_renderer's exact key schedule, so
    # the primal must BIT-match the two-phase path on the same chip
    fus_bits = compile_fused_param_renderer(sd.scene, sd.camera, st,
                                            gen_rays=False)
    a = np.asarray(ref(params, key))
    np.testing.assert_array_equal(a, np.asarray(fus_bits(params, key)))
    # the default TPU path (in-kernel camera rays) draws the SAME sampling
    # distribution from a different RNG stream (fused_diff docstring): check
    # mean radiance agreement at MC-noise level, not per-sample equality
    fus = compile_fused_param_renderer(sd.scene, sd.camera, st)
    b = np.asarray(fus(params, key))
    # 5% relative with a real absolute floor: MC noise of the independent
    # RNG stream does not shrink with scene brightness (ADVICE r3)
    assert abs(a.mean() - b.mean()) < 0.05 * a.mean() + 1e-3
    g = jax.jit(jax.grad(lambda p: fus(p, key).mean()))(params)
    for name, grad in g.items():
        assert np.all(np.isfinite(np.asarray(grad))), name
    assert np.abs(np.asarray(g["tex_c1"])).max() > 0.0


def test_regen_renderer_on_tpu(tpu):
    """Round-5 regenerative wavefront, real Mosaic compile: deterministic,
    statistically consistent with the bounce-synchronous wavefront, and the
    sphere-BVH hit tier (big_scene1) agrees with the XLA oracle on chip."""
    import jax.numpy as jnp

    from raytracing_gpu_tpu import RenderSettings
    from raytracing_gpu_tpu.engine.intersect import closest_hit
    from raytracing_gpu_tpu.engine.wavefront import (
        compile_regen_renderer, compile_wavefront_renderer, pack_attr_table,
        resolve_hit_packed)
    from raytracing_gpu_tpu.models import scenes
    from raytracing_gpu_tpu.ops.pallas_trace import PallasTracer

    jax = tpu
    sd = scenes.get("door")
    st = RenderSettings(image_width=96, aspect_ratio=sd.aspect,
                        spp_per_chunk=32, num_chunks=1, max_depth=6,
                        ray_batch=8192)
    key = jax.random.PRNGKey(3)
    npix = st.num_pixels
    f = compile_regen_renderer(sd.scene, sd.camera, st)
    a = np.asarray(f(key))[:npix] / 32
    a2 = np.asarray(f(key))[:npix] / 32
    np.testing.assert_array_equal(a, a2)
    b = np.asarray(compile_wavefront_renderer(
        sd.scene, sd.camera, st)(key))[:npix] / 32
    assert abs(a.mean() - b.mean()) < 0.02 * max(b.mean(), 1e-3) + 5e-3
    assert np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1] > 0.95

    sd2 = scenes.get("big_scene1")
    tracer = PallasTracer(sd2.scene)
    assert tracer.supports_hit
    o, d, tm = _rays(sd2, 8192, 5)
    packed, p, u, v, normal, slot = tracer.hit(o, d, tm,
                                               jnp.ones(8192, bool))
    attr = pack_attr_table(sd2.scene, tracer.bake.tri_perm)
    rec = resolve_hit_packed(attr, packed, p, u, v, normal, slot, d)
    ref = closest_hit(sd2.scene, o, d, tm, jax.random.PRNGKey(9))
    hk = np.asarray(rec.hit)
    np.testing.assert_array_equal(hk, np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(rec.mat_id)[hk],
                                  np.asarray(ref.mat_id)[hk])
