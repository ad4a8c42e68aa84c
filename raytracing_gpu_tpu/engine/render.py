"""Render driver: sample chunks, wavefront batches, checkpoint/resume.

Replaces the reference `draw` host loop (`render.h:118-174`).  The reference
launches `no_fb` sequential megakernel passes, dumping each frame buffer as an
8-bit PPM and averaging at the end.  Here each *chunk* (= frame buffer) is one
jitted XLA program that accumulates `spp_per_chunk` jittered samples for every
pixel; chunks accumulate into a float32 partial sum that is checkpointed after
every chunk (exact resume, no precision loss — see SURVEY §5 checkpoint notes).

Within a chunk, pixels are processed in `ray_batch`-sized waves via `lax.map`
(the wavefront analogue of the reference's 8x8 CUDA grid, `render.h:129-130`).

Performance note (TPU-measured): baking the scene into the compiled program as
XLA constants (`compile_renderer`) is ~7x faster than passing it as an
argument — the small primitive/material tables constant-fold into the fused
intersection expressions.  The differentiable path (`compile_param_renderer`)
keeps only the parameter pytree as traced arguments and bakes the geometry.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.camera import Camera
from ..core.config import RenderSettings
from ..scene.types import Scene
from . import film
from .integrator import trace, trace_diff


def _grid_geometry(settings: RenderSettings):
    h, w = settings.image_height, settings.image_width
    npix = h * w
    b = min(settings.ray_batch, _ceil_to(npix, 8))
    npix_pad = _ceil_to(npix, b)
    return h, w, npix, npix_pad, b, npix_pad // b


def _ceil_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def chunk_sums(scene: Scene, camera: Camera, settings: RenderSettings,
               key: jax.Array, trace_fn=trace) -> jax.Array:
    """One sample chunk (traceable body): (npix_pad, 3) float32 radiance sums
    over `spp_per_chunk` samples per pixel (one reference frame buffer,
    `render.h:94-113`)."""
    h, w, npix, npix_pad, b, nb = _grid_geometry(settings)

    flat = jnp.arange(npix_pad, dtype=jnp.int32)
    rows = jnp.minimum(flat // w, h - 1)
    cols = jnp.minimum(flat % w, w - 1)

    inv_w = 1.0 / max(w - 1, 1)
    inv_h = 1.0 / max(h - 1, 1)

    def sample_pass(s, acc):
        ks = rng.fold(key, s)

        def wave(x):
            r, c, bid = x
            kb = rng.fold(ks, bid)
            k_jit, k_cam, k_trace = jax.random.split(kb, 3)
            jit2 = rng.uniform(k_jit, (b, 2))
            # jittered viewport coords; canonical RTOW divides by (dim - 1)
            # (the reference divides by dim — SURVEY quirk 10, corrected here)
            u = (c.astype(jnp.float32) + jit2[:, 0]) * inv_w
            v = ((h - 1 - r).astype(jnp.float32) + jit2[:, 1]) * inv_h
            o, d, tm = camera.get_rays(k_cam, u, v)
            return trace_fn(scene, o, d, tm, k_trace,
                            max_depth=settings.max_depth, t_min=settings.t_min,
                            rr_start=settings.rr_start)

        out = jax.lax.map(
            wave,
            (rows.reshape(nb, b), cols.reshape(nb, b),
             jnp.arange(nb, dtype=jnp.int32)),
        )
        return acc + out.reshape(npix_pad, 3)

    init = jnp.zeros((npix_pad, 3), jnp.float32)
    return jax.lax.fori_loop(0, settings.spp_per_chunk, sample_pass, init)


# Back-compat jitted form with the scene as a traced argument (used by tests
# and anywhere the scene changes per call).  Slower than compile_renderer.
render_chunk = jax.jit(chunk_sums, static_argnames=("settings",))


def _tag(chunk, name: str):
    """Mark a compiled chunk with the engine that will run it (observable
    routing: tests/test_routing.py pins the scene -> engine matrix, and the
    CLI surfaces it)."""
    chunk.engine_name = name
    return chunk


def compile_renderer(scene: Scene, camera: Camera, settings: RenderSettings,
                     engine: str = "auto") -> Callable[[jax.Array], jax.Array]:
    """Scene-specialized forward renderer: key -> (npix_pad, 3) sums.

    The scene/camera are closed over and become XLA constants.  The returned
    callable carries `engine_name` in {"regen", "wavefront", "megakernel",
    "record-walk", "xla"}.

    engine: "auto" uses the Pallas megakernel (ops/pallas_trace.py) when the
    scene's feature set is covered, else the XLA wavefront; "xla"/"pallas"
    force one.
    """
    trace_fn = trace
    if engine in ("auto", "pallas"):
        from ..ops import pallas_trace

        # "auto" only picks pallas on real TPU (interpret mode is for tests)
        on = jax.default_backend() == "tpu" or engine == "pallas"
        if on and pallas_trace.supports_scene(scene):
            tracer = pallas_trace.PallasTracer(scene)
            # sorted-wavefront routing: (a) 100k-triangle class — per-bounce
            # ray reordering keeps the packet walk coherent where the
            # full-depth megakernel diverges to the whole tree (docs/PERF.md
            # round-3 measurement); (b) image-textured scenes WITH russian
            # roulette — the wavefront owns the throughput in XLA, so RR is
            # exact there, while the record-mode walk has no in-kernel
            # throughput to roulette (VERDICT r3 weak #4)
            want_wavefront = tracer.bake.tri_stream or (
                settings.rr_start > 0
                and not pallas_trace.supports_forward(scene))
            # sphere-BVH scenes (big_scene1 class) at depth >= 8: the
            # megakernel's unsorted tiles never all die under stragglers
            # (cost scales ~linearly with depth, measured), while regen's
            # sorted always-full waves hold rate — 2.64 vs 5.30 Mrays/s at
            # depth 16 (docs/PERF.md round 5).  Shallow renders keep the
            # megakernel (11.5 Mrays/s at depth 4).
            deep_sphere_bvh = (len(tracer.bake.sph_hit_nodes) > 0
                               and settings.max_depth >= 8)
            # image-texture scenes at DEEP depth: the record walk pays the
            # same linear-depth straggler tax (a 100-spp door chunk at the
            # reference-default depth 50 exceeded the ~60 s device watchdog
            # and crashed the worker; regen sustains 3.3 Mrays/s there) —
            # shallow renders keep the much faster record walk (~108 at d8)
            deep_record = (not pallas_trace.supports_forward(scene)
                           and settings.max_depth >= 24)
            if ((want_wavefront or deep_sphere_bvh or deep_record)
                    and tracer.supports_hit):
                from .wavefront import (compile_regen_renderer,
                                        compile_wavefront_renderer)

                # regen keeps the wave always-full (glue and kernel cost
                # stop scaling with dead lanes), but its deposit ring is
                # sized ~ (max_depth * ray_batch) / spp pixels — at low spp
                # per chunk the ring approaches the framebuffer and the
                # per-bounce deposit scatter dominates, so the
                # bounce-synchronous driver (one scatter per wave) wins
                if settings.spp_per_chunk >= 16:
                    return _tag(compile_regen_renderer(scene, camera,
                                                       settings,
                                                       tracer=tracer),
                                "regen")
                if want_wavefront or deep_record:
                    return _tag(compile_wavefront_renderer(scene, camera,
                                                           settings,
                                                           tracer=tracer),
                                "wavefront")
                # deep sphere-BVH at low spp: fall through to the megakernel
        if on and pallas_trace.supports_forward(scene):
            # fully in-kernel chunk: camera rays are generated inside the
            # megakernel from the wave's base pixel index (XLA-side ray
            # generation measured ~90-140us per 65k wave — more than the
            # walk itself; tools/roofline.py).  Seeds are scalar arithmetic
            # per wave (see pallas_trace.wave_seed for why).
            tracer = pallas_trace.PallasTracer(scene)
            h, w, npix, npix_pad, b, nb = _grid_geometry(settings)
            spp = settings.spp_per_chunk
            s_idx = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), nb)
            b_idx = jnp.tile(jnp.arange(nb, dtype=jnp.int32), spp)

            @jax.jit
            def chunk(key):
                base = pallas_trace.chunk_seed(key)

                def one(x):
                    s, bid = x
                    seed = pallas_trace.wave_seed(base, s, bid)
                    return tracer.trace_pixels(
                        camera, h, w, bid * b, b, seed,
                        max_depth=settings.max_depth, t_min=settings.t_min,
                        rr_start=settings.rr_start)

                rads = jax.lax.map(one, (s_idx, b_idx))
                return rads.reshape(spp, nb, b, 3).sum(0).reshape(npix_pad, 3)

            return _tag(chunk, "megakernel")
        elif on and pallas_trace.supports_scene(scene):
            # image-textured scenes: kernel walk + XLA shade (the atlas
            # lives in XLA; the walk records mat_id/p/uv per bounce)
            from .integrator import shade_radiance

            tracer = pallas_trace.PallasTracer(scene)

            def trace_fn(scene_p, o, d, tm, k, max_depth, t_min, rr_start=0):
                if rr_start:
                    # the record-mode walk carries no in-kernel throughput
                    # (albedo lives in the XLA atlas), so RR cannot shorten
                    # it — render correctly at full depth instead
                    import warnings
                    warnings.warn("rr_start ignored: image-textured scenes "
                                  "use the record-mode walk (no in-kernel "
                                  "throughput)", stacklevel=2)
                data = tracer.walk(o, d, tm, k, max_depth=max_depth,
                                   t_min=t_min)
                return shade_radiance(scene_p, data)
        elif engine == "pallas":
            raise ValueError("scene not supported by the pallas megakernel")

    name = "xla" if trace_fn is trace else "record-walk"

    @jax.jit
    def chunk(key):
        return chunk_sums(scene, camera, settings, key, trace_fn=trace_fn)

    return _tag(chunk, name)


def compile_param_renderer(scene: Scene, camera: Camera,
                           settings: RenderSettings, engine: str = "auto"):
    """Differentiable renderer: (params, key) -> (npix_pad, 3) sums.

    Geometry is baked as constants; only the parameter pytree
    (engine.diff.get_params) is traced — so gradients are available w.r.t.
    material/texture/emitter parameters at constant-folded speed.

    engine "auto"/"pallas": on TPU, phase 1 (the detached path walk) runs as
    the Pallas megakernel's record mode and only phase 2 (shade/accumulate)
    is XLA autodiff — the backward pass never sees the walk at all.
    """
    from . import diff
    from .integrator import shade_packed

    trace_fn = trace_diff
    if engine in ("auto", "pallas", "wavefront"):
        from ..ops import pallas_trace

        on_tpu = jax.default_backend() == "tpu"
        if pallas_trace.supports_scene(scene) and (
                on_tpu or engine in ("pallas", "wavefront")):
            tracer = pallas_trace.PallasTracer(scene)
            want_wf = (tracer.bake.tri_stream or engine == "wavefront")
            if want_wf and tracer.supports_hit:
                # differentiable big-mesh path (VERDICT r4 #2): the sorted
                # wavefront records (mat, masks, p, uv) per bounce in pixel
                # order and the SAME shade_packed phase-2 replays the
                # throughput chain differentiably — the streamed megakernel
                # record walk this replaces was the 100x-slow round-3 path
                from .wavefront import make_record_trace_wave

                rw = make_record_trace_wave(scene, tracer,
                                            settings.max_depth,
                                            settings.t_min,
                                            rr_start=settings.rr_start)
                sp_fn = partial(shade_packed, need_p=tracer.need_p,
                                need_uv=tracer.need_uv,
                                need_scale=settings.rr_start > 0)

                def trace_fn(scene_p, o, d, tm, k, max_depth, t_min,
                             rr_start=0):
                    # detached RR (baked-probability) is supported HERE,
                    # unlike the megakernel record walk below
                    return sp_fn(scene_p, *rw(o, d, tm, k))

                @jax.jit
                def chunk(params, key):
                    return chunk_sums(diff.set_params(scene, params), camera,
                                      settings, key, trace_fn=trace_fn)

                return _tag(chunk, "wavefront-record")
            # phase-2 over the RAW packed record planes: the outer spp/wave
            # scans save one compact i32 plane per wave as the walk residual
            # and shade_packed re-derives the masks.  Measured on TPU:
            # jax.checkpoint around the shade is 8x SLOWER here (the remat
            # replay inside the triple-nested scan backward defeats fusion),
            # so the shade is differentiated directly — its residuals are
            # kept lean by the mask-multiply form in shade_radiance.
            sp_fn = partial(shade_packed, need_p=tracer.need_p,
                            need_uv=tracer.need_uv)

            def trace_fn(scene_p, o, d, tm, k, max_depth, t_min, rr_start=0):
                assert rr_start == 0, \
                    "russian roulette is not supported on the diff path"
                planes = tracer.walk_packed(o, d, tm, k, max_depth=max_depth,
                                            t_min=t_min)
                return sp_fn(scene_p, *planes)
        elif engine == "pallas":
            raise ValueError("scene not supported by the pallas megakernel")

    name = "xla" if trace_fn is trace_diff else "record-walk"

    @jax.jit
    def chunk(params, key):
        return chunk_sums(diff.set_params(scene, params), camera, settings, key,
                          trace_fn=trace_fn)

    return _tag(chunk, name)


def render_linear(
    scene: Scene,
    camera: Camera,
    settings: RenderSettings,
    seed: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    progress: Optional[Callable[[int, int, float], None]] = None,
    chunk_fn=None,
    timer=None,
) -> np.ndarray:
    """Full render -> (H, W, 3) mean linear radiance.

    The chunk loop is the reference's frame-buffer loop (`render.h:152-162`)
    and the checkpoint grain: with `checkpoint_dir`, float32 partial sums and
    the completed-chunk count are persisted after every chunk and the render
    resumes exactly where it stopped.

    timer: optional `utils.profiling.PhaseTimer`; collects the per-phase
    build (scene bake + compile) / trace (chunk dispatch + fetch) / io
    (checkpoint persist) split — the SURVEY §5 observability gauges replacing
    the reference's aggregate wall clock (`main.cu:39-45`).
    """
    from contextlib import nullcontext

    phase = timer.phase if timer is not None else (lambda _name: nullcontext())
    h, w, npix, npix_pad, _, _ = _grid_geometry(settings)
    key = jax.random.PRNGKey(settings.seed if seed is None else seed)

    sums = np.zeros((npix_pad, 3), np.float32)
    start_chunk = 0
    fp = ""
    if checkpoint_dir is not None:
        from ..utils import checkpoint as ckpt

        fp = ckpt.fingerprint(settings, settings.seed if seed is None else seed,
                              scene)
        state = ckpt.load(checkpoint_dir, expected_shape=(npix_pad, 3), fp=fp)
        if state is not None:
            sums, start_chunk = state

    if chunk_fn is None:
        with phase("build"):
            compiled = compile_renderer(scene, camera, settings)
        from ..utils.profiling import logger

        logger.info("render engine: %s",
                    getattr(compiled, "engine_name", "xla"))
        chunk = lambda _s, _c, _st, k: compiled(k)
    else:
        chunk = chunk_fn
    for c in range(start_chunk, settings.num_chunks):
        t0 = time.perf_counter()
        ck = rng.fold(key, 0x5EED + c)
        with phase("trace"):
            out = chunk(scene, camera, settings, ck)
            sums += np.asarray(jax.block_until_ready(out))
        dt = time.perf_counter() - t0
        if checkpoint_dir is not None:
            with phase("io"):
                ckpt.save(checkpoint_dir, sums, c + 1, fp=fp)
        if progress is not None:
            progress(c + 1, settings.num_chunks, dt)

    return (sums[:npix] / float(settings.rays_per_pixel)).reshape(h, w, 3)


def render(
    scene: Scene,
    camera: Camera,
    settings: RenderSettings,
    seed: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    progress: Optional[Callable[[int, int, float], None]] = None,
) -> np.ndarray:
    """Full render -> (H, W, 3) gamma-2 image in [0, 1) (reference `draw`,
    `render.h:118-174`, minus the PPM/PNG round-trip)."""
    linear = render_linear(scene, camera, settings, seed=seed,
                           checkpoint_dir=checkpoint_dir, progress=progress)
    return film.finalize(linear * settings.rays_per_pixel, settings.rays_per_pixel)
