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
