"""Engine-routing matrix: which engine each compile path selects, per scene.

VERDICT r4 #7: the routing decisions in `engine.render.compile_renderer`,
`engine.render.compile_param_renderer` and
`parallel.render.compile_sharded_renderer` are load-bearing (a silent
fallback turns a 4 Mrays/s mesh render into a 0.4 one) but were only
asserted in prose.  Every compiled chunk now carries `engine_name`; this
test enumerates all 13 scenes x (spp, rr) cells and pins the expected
engine, so a routing regression is a test failure, not a perf mystery.

Cells are evaluated with engine="pallas" (the TPU routing, runnable on CPU
via interpret mode; engine="auto" on the CPU test backend always routes
"xla" — asserted separately).
"""

import jax
import pytest

from raytracing_gpu_tpu import RenderSettings
from raytracing_gpu_tpu.engine.render import (compile_param_renderer,
                                              compile_renderer)
from raytracing_gpu_tpu.models import scenes

# scene -> (forward spp>=16, forward spp<16, forward spp>=16 + rr, diff)
EXPECTED = {
    "basic": ("megakernel", "megakernel", "megakernel", "record-walk"),
    "first": ("megakernel", "megakernel", "megakernel", "record-walk"),
    "big_scene1": ("megakernel", "megakernel", "megakernel", "record-walk"),
    "two_spheres": ("megakernel", "megakernel", "megakernel", "record-walk"),
    "two_perlin_spheres": ("megakernel", "megakernel", "megakernel",
                           "record-walk"),
    "earth": ("record-walk", "record-walk", "regen", "record-walk"),
    "cornell_box": ("megakernel", "megakernel", "megakernel", "record-walk"),
    "cornell_smoke": ("megakernel", "megakernel", "megakernel",
                      "record-walk"),
    "triangle": ("megakernel", "megakernel", "megakernel", "record-walk"),
    "triangles": ("megakernel", "megakernel", "megakernel", "record-walk"),
    "door": ("record-walk", "record-walk", "regen", "record-walk"),
    "backpack": ("regen", "wavefront", "regen", "wavefront-record"),
    "cup": ("regen", "wavefront", "regen", "wavefront-record"),
}


def _settings(aspect, spp=16, rr=0):
    return RenderSettings(image_width=64, aspect_ratio=aspect,
                          spp_per_chunk=spp, num_chunks=1, max_depth=4,
                          ray_batch=512, rr_start=rr)


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_forward_routing_matrix(name):
    sd = scenes.get(name)
    exp_f16, exp_f4, exp_f16rr, exp_diff = EXPECTED[name]
    c = compile_renderer(sd.scene, sd.camera, _settings(sd.aspect),
                         engine="pallas")
    assert c.engine_name == exp_f16, f"{name} spp16: {c.engine_name}"
    c = compile_renderer(sd.scene, sd.camera, _settings(sd.aspect, spp=4),
                         engine="pallas")
    assert c.engine_name == exp_f4, f"{name} spp4: {c.engine_name}"
    c = compile_renderer(sd.scene, sd.camera, _settings(sd.aspect, rr=2),
                         engine="pallas")
    assert c.engine_name == exp_f16rr, f"{name} spp16+rr: {c.engine_name}"
    c = compile_param_renderer(sd.scene, sd.camera,
                               _settings(sd.aspect, spp=4), engine="pallas")
    assert c.engine_name == exp_diff, f"{name} diff: {c.engine_name}"


def test_auto_on_cpu_routes_xla():
    sd = scenes.get("cornell_box")
    c = compile_renderer(sd.scene, sd.camera, _settings(sd.aspect),
                         engine="auto")
    assert jax.default_backend() != "tpu"
    assert c.engine_name == "xla"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_routing_wavefront():
    """VERDICT r4 #3: the sharded router must select the sorted wavefront
    for big-mesh scenes instead of silently falling back to the streamed
    record walk."""
    from raytracing_gpu_tpu.parallel.mesh import make_mesh
    from raytracing_gpu_tpu.parallel.render import compile_sharded_renderer

    mesh = make_mesh(n_sp=1, n_dp=8)
    sd = scenes.get("backpack")
    c = compile_sharded_renderer(sd.scene, sd.camera, _settings(sd.aspect),
                                 mesh, engine="pallas")
    assert c.engine_name == "regen"        # spp_local >= 16: per-device regen
    c = compile_sharded_renderer(sd.scene, sd.camera,
                                 _settings(sd.aspect, spp=4), mesh,
                                 engine="pallas")
    assert c.engine_name == "wavefront"    # low spp: bounce-synchronous
    sd = scenes.get("cornell_box")
    c = compile_sharded_renderer(sd.scene, sd.camera, _settings(sd.aspect),
                                 mesh, engine="pallas")
    assert c.engine_name == "megakernel"
    # deep image-texture renders (reference-default depth 50): the record
    # walk exceeds the device watchdog, so the sharded router must also
    # pick the wavefront engines
    sd = scenes.get("door")
    st = RenderSettings(image_width=64, aspect_ratio=sd.aspect,
                        spp_per_chunk=16, num_chunks=1, max_depth=50,
                        ray_batch=512)
    c = compile_sharded_renderer(sd.scene, sd.camera, st, mesh,
                                 engine="pallas")
    assert c.engine_name == "regen"
