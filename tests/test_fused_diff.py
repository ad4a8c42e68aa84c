"""Fused (hand-VJP) differentiable chunk vs the two-phase AD path.

The fused renderer (engine/fused_diff.py) must be a drop-in replacement for
compile_param_renderer with engine="pallas": bit-identical primal (same key
schedule, same walk kernel, same shade math) and allclose gradients, across
all three record-plane layouts (solid-only, need_p for checker/perlin,
need_uv+need_p for image atlas scenes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_gpu_tpu.core.config import RenderSettings
from raytracing_gpu_tpu.engine import diff
from raytracing_gpu_tpu.engine.fused_diff import compile_fused_param_renderer
from raytracing_gpu_tpu.engine.render import compile_param_renderer
from raytracing_gpu_tpu.models import scenes


def _settings():
    return RenderSettings(image_width=24, aspect_ratio=1.0, spp_per_chunk=1,
                          num_chunks=1, max_depth=3, ray_batch=576)


# one scene per plane layout: solid (packed plane only), checker (adds p),
# image atlas (adds p + uv)
@pytest.mark.parametrize("name", ["cornell_box", "two_spheres", "earth"])
@pytest.mark.parametrize("save_planes", [True, False])
def test_fused_matches_two_phase(name, save_planes):
    sd = scenes.get(name)
    st = _settings()
    key = jax.random.PRNGKey(11)
    params = diff.get_params(sd.scene)

    ref = compile_param_renderer(sd.scene, sd.camera, st, engine="pallas")
    fus = compile_fused_param_renderer(sd.scene, sd.camera, st,
                                       save_planes=save_planes)

    a = np.asarray(ref(params, key))
    b = np.asarray(fus(params, key))
    np.testing.assert_array_equal(a, b)

    target = jnp.full_like(jnp.asarray(a), 0.25)
    g_ref = jax.grad(lambda p: jnp.mean((ref(p, key) - target) ** 2))(params)
    g_fus = jax.grad(lambda p: jnp.mean((fus(p, key) - target) ** 2))(params)
    for k in g_ref:
        ga, gb = np.asarray(g_ref[k]), np.asarray(g_fus[k])
        np.testing.assert_allclose(gb, ga, rtol=2e-4, atol=1e-7, err_msg=k)


def test_fused_grad_nonzero():
    """The fused path must actually move parameters (not silently zero)."""
    sd = scenes.get("cornell_box")
    st = _settings()
    key = jax.random.PRNGKey(5)
    params = diff.get_params(sd.scene)
    fus = compile_fused_param_renderer(sd.scene, sd.camera, st)
    target = jnp.zeros_like(fus(params, key))
    g = jax.grad(lambda p: jnp.mean((fus(p, key) - target) ** 2))(params)
    assert float(jnp.abs(g["tex_c1"]).max()) > 0.0
