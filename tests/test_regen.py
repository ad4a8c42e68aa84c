"""Regenerative wavefront driver (engine/wavefront.compile_regen_renderer).

The regen driver reorders WHEN samples are traced (persistent wave + ray
refill + ring-buffered deposits) but not WHAT is traced: the per-bounce
update is `make_trace_wave`'s `bounce_shade` verbatim.  Parity with the
bounce-synchronous wavefront is therefore statistical (sample jitter keys
fold by loop iteration, not sample index) — same estimator, different
sample ordering — and the deposit-ring/drain machinery is pinned by
determinism and energy-conservation checks at shapes that exercise the
refill tail and ring wraparound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_gpu_tpu import RenderSettings
from raytracing_gpu_tpu.engine.wavefront import (compile_regen_renderer,
                                                 compile_wavefront_renderer,
                                                 pack_attr_table,
                                                 resolve_hit,
                                                 resolve_hit_packed)
from raytracing_gpu_tpu.models import scenes
from raytracing_gpu_tpu.ops.pallas_trace import PallasTracer


@pytest.fixture(scope="module")
def door():
    return scenes.get("door")


@pytest.fixture(scope="module")
def door_tracer(door):
    return PallasTracer(door.scene)


class TestResolvePacked:
    def test_matches_reference_resolve(self, door, door_tracer):
        """The one-gather slot-attribute resolve vs the original 13-gather
        resolve: identical HitRecords on real kernel output."""
        key = jax.random.PRNGKey(2)
        h, w = 48, 64
        px = jnp.arange(h * w) % w
        py = jnp.arange(h * w) // w
        u = px.astype(jnp.float32) / (w - 1)
        v = 1.0 - py.astype(jnp.float32) / (h - 1)
        o, d, tm = door.camera.get_rays(key, u, v)
        alive = jnp.ones((h * w,), bool)
        packed, p, uu, vv, normal, slot = door_tracer.hit(o, d, tm, alive)
        a = resolve_hit(door.scene, door_tracer.tri_perm, packed, p, uu, vv,
                        normal, slot, d)
        attr = pack_attr_table(door.scene, door_tracer.bake.tri_perm)
        b = resolve_hit_packed(attr, packed, p, uu, vv, normal, slot, d)
        hk = np.asarray(a.hit)
        assert hk.sum() > 100
        np.testing.assert_array_equal(hk, np.asarray(b.hit))
        np.testing.assert_array_equal(np.asarray(a.mat_id), np.asarray(b.mat_id))
        np.testing.assert_array_equal(np.asarray(a.front_face),
                                      np.asarray(b.front_face))
        np.testing.assert_allclose(np.asarray(a.normal)[hk],
                                   np.asarray(b.normal)[hk], rtol=2e-5,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(a.u), np.asarray(b.u),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.v), np.asarray(b.v),
                                   rtol=1e-5, atol=1e-6)


class TestRegen:
    def test_matches_wavefront_statistically(self, door, door_tracer):
        st = RenderSettings(image_width=64, aspect_ratio=door.aspect,
                            spp_per_chunk=32, num_chunks=1, max_depth=6,
                            ray_batch=4096)
        key = jax.random.PRNGKey(3)
        npix = st.num_pixels
        a = np.asarray(compile_regen_renderer(
            door.scene, door.camera, st, tracer=door_tracer)(key))[:npix] / 32
        b = np.asarray(compile_wavefront_renderer(
            door.scene, door.camera, st, tracer=door_tracer)(key))[:npix] / 32
        assert abs(a.mean() - b.mean()) < 0.02 * max(a.mean(), 1e-3) + 5e-3
        corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
        assert corr > 0.95

    def test_deterministic(self, door, door_tracer):
        st = RenderSettings(image_width=32, aspect_ratio=door.aspect,
                            spp_per_chunk=16, num_chunks=1, max_depth=4,
                            ray_batch=1024)
        f = compile_regen_renderer(door.scene, door.camera, st,
                                   tracer=door_tracer)
        key = jax.random.PRNGKey(7)
        np.testing.assert_array_equal(np.asarray(f(key)), np.asarray(f(key)))

    def test_stream_exhaustion_tail(self, door, door_tracer):
        """total rays < one wave: the whole render happens in the refill
        tail; every sample must still be traced exactly once."""
        st = RenderSettings(image_width=16, aspect_ratio=1.0,
                            spp_per_chunk=2, num_chunks=1, max_depth=4,
                            ray_batch=4096)
        f = compile_regen_renderer(door.scene, door.camera, st,
                                   tracer=door_tracer, debug_stats=True)
        out, stats = f(jax.random.PRNGKey(1))
        npix = st.num_pixels
        assert int(stats["stream"]) >= npix * 2  # all samples issued
        a = np.asarray(out)[:npix] / 2
        assert np.all(np.isfinite(a)) and a.mean() > 0.01

    def test_rr_statistical_parity(self, door, door_tracer):
        """Per-lane russian roulette in the regen driver stays unbiased."""
        key = jax.random.PRNGKey(4)
        outs = {}
        for rr in (0, 3):
            st = RenderSettings(image_width=48, aspect_ratio=door.aspect,
                                spp_per_chunk=16, num_chunks=1, max_depth=8,
                                ray_batch=1296, rr_start=rr)
            npix = st.num_pixels
            outs[rr] = (np.asarray(compile_regen_renderer(
                door.scene, door.camera, st,
                tracer=door_tracer)(key))[:npix] / 16)
        a, b = outs[0].mean(), outs[3].mean()
        assert abs(a - b) < 0.05 * a + 2e-3, (a, b)


class TestSphereBVHHitTier:
    """Round-5 sphere-BVH packet walk in the pure hit kernel: big_scene1
    (~500 spheres incl. moving) previously reported supports_hit == False
    and lost the whole sorted-wavefront/regen route."""

    def test_big_scene1_hit_matches_closest_hit(self):
        from raytracing_gpu_tpu.engine.intersect import closest_hit

        sd = scenes.get("big_scene1")
        tracer = PallasTracer(sd.scene)
        assert tracer.supports_hit
        assert tracer.bake.sph_hit_nodes.shape[0] > 0
        key = jax.random.PRNGKey(5)
        n = 4096
        px = jax.random.uniform(key, (n,))
        py = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
        o, d, tm = sd.camera.get_rays(key, px, py)
        alive = jnp.ones((n,), bool)
        packed, p, u, v, normal, slot = tracer.hit(o, d, tm, alive)
        attr = pack_attr_table(sd.scene, tracer.bake.tri_perm)
        rec = resolve_hit_packed(attr, packed, p, u, v, normal, slot, d)
        ref = closest_hit(sd.scene, o, d, tm, jax.random.PRNGKey(9))
        hk = np.asarray(rec.hit)
        assert hk.sum() > 1000
        np.testing.assert_array_equal(hk, np.asarray(ref.hit))
        np.testing.assert_array_equal(np.asarray(rec.mat_id)[hk],
                                      np.asarray(ref.mat_id)[hk])
        # many r=0.2 spheres at ~13 units: f32 quadratic cancellation gives
        # mm-scale p (and ~1e-2 normal) differences on BOTH sides
        np.testing.assert_allclose(np.asarray(rec.p)[hk],
                                   np.asarray(ref.p)[hk], atol=5e-3)
        np.testing.assert_allclose(np.asarray(rec.normal)[hk],
                                   np.asarray(ref.normal)[hk], atol=3e-2)

    def test_deep_sphere_bvh_routes_regen(self):
        from raytracing_gpu_tpu.engine.render import compile_renderer

        sd = scenes.get("big_scene1")
        deep = RenderSettings(image_width=64, aspect_ratio=sd.aspect,
                              spp_per_chunk=16, num_chunks=1, max_depth=16,
                              ray_batch=512)
        c = compile_renderer(sd.scene, sd.camera, deep, engine="pallas")
        assert c.engine_name == "regen"
        shallow = RenderSettings(image_width=64, aspect_ratio=sd.aspect,
                                 spp_per_chunk=16, num_chunks=1, max_depth=4,
                                 ray_batch=512)
        c = compile_renderer(sd.scene, sd.camera, shallow, engine="pallas")
        assert c.engine_name == "megakernel"


class TestOversizedMeshFallback:
    def test_huge_mesh_falls_back_to_streamed_megakernel(self):
        """ADVICE r4 (medium): _bake_tri_packed's escalation caps at
        rows_per_leaf=64; a mesh too big for the hit tier's VMEM budget
        must report supports_hit=False and route to the streamed megakernel
        walk instead of shipping an uncompilable pallas_call."""
        import numpy as np

        from raytracing_gpu_tpu.engine.render import compile_renderer
        from raytracing_gpu_tpu.scene.builder import SceneBuilder

        rng_ = np.random.default_rng(0)
        n = 400_000
        v0 = rng_.uniform(-10, 10, (n, 3)).astype(np.float32)
        verts = np.concatenate(
            [v0, v0 + rng_.uniform(-0.05, 0.05, (n, 3)).astype(np.float32),
             v0 + rng_.uniform(-0.05, 0.05, (n, 3)).astype(np.float32)])
        faces = np.arange(3 * n, dtype=np.int64).reshape(3, n).T
        b = SceneBuilder()
        mat = b.lambertian((0.5, 0.5, 0.5))
        b.mesh(verts, faces, mat)
        scene = b.build()
        tracer = PallasTracer(scene)
        assert tracer.bake.tri_stream          # way past the resident budget
        assert not tracer.supports_hit         # hit tier would not fit VMEM
        from raytracing_gpu_tpu.core.camera import Camera

        cam = Camera.make((0, 0, -30), (0, 0, 0), (0, 1, 0), 40, 1.0, 0.0,
                          10.0)
        st = RenderSettings(image_width=32, aspect_ratio=1.0,
                            spp_per_chunk=16, num_chunks=1, max_depth=4,
                            ray_batch=512)
        c = compile_renderer(scene, cam, st, engine="pallas")
        assert c.engine_name == "megakernel"   # streamed walk, not regen


def test_deep_record_walk_routes_regen():
    """Reference-default depth 50 on an image-textured scene must route to
    the wavefront engines: the record walk's linear-depth straggler tax
    exceeded the device watchdog at 100-spp chunks (round-5 measurement)."""
    from raytracing_gpu_tpu.engine.render import compile_renderer

    sd = scenes.get("door")
    deep = RenderSettings(image_width=64, aspect_ratio=sd.aspect,
                          spp_per_chunk=16, num_chunks=1, max_depth=50,
                          ray_batch=512)
    c = compile_renderer(sd.scene, sd.camera, deep, engine="pallas")
    assert c.engine_name == "regen"
    shallow = RenderSettings(image_width=64, aspect_ratio=sd.aspect,
                             spp_per_chunk=16, num_chunks=1, max_depth=8,
                             ray_batch=512)
    c = compile_renderer(sd.scene, sd.camera, shallow, engine="pallas")
    assert c.engine_name == "record-walk"
