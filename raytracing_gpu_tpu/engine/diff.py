"""Differentiable rendering: parameter pytree, losses, gradient steps.

The reference has no differentiable path at all — this subsystem is required
by the north star (BASELINE.md): pixel gradients must flow to material albedo,
texture, and emitter parameters and validate against finite differences.

Design: the whole Scene is a pytree, so `jax.grad` works directly; the
*parameter view* below selects the leaves that are meaningfully differentiable
(texture colors — which include emitter radiance via diffuse_light textures —
and the image atlas).  Discrete structure (hit selection, BVH paths,
primitive/material indices) is detached inside the engine
(`intersect.closest_hit`, `materials.scatter`), giving a detached-sampling
estimator: unbiased for shading/emission/texture parameters.

Metal `fuzz` is deliberately NOT a parameter: it only enters through the
scattered *direction* (`material.h:39-56`), and the detached-sampling
estimator stops gradients at direction sampling by design (directions feed
the discrete next-hit selection).  Its pathwise gradient under this estimator
is identically zero, so exposing it would be a false capability — a correct
fuzz derivative needs a path-space estimator (e.g. reparameterized BSDF
sampling with warped-area terms), out of scope for the reference's feature
set.  `tests/test_grad.py::test_every_param_has_gradient` guards that every
exposed parameter receives a nonzero gradient.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from ..scene.types import Scene

ParamDict = Dict[str, jax.Array]


def get_params(scene: Scene) -> ParamDict:
    """Extract the differentiable parameter pytree."""
    return {
        "tex_c1": scene.textures.c1,
        "tex_c2": scene.textures.c2,
        "atlas_data": scene.atlas.data,
    }


def set_params(scene: Scene, params: ParamDict) -> Scene:
    """Write a parameter pytree back into the scene."""
    return scene.replace(
        textures=scene.textures.replace(c1=params["tex_c1"], c2=params["tex_c2"]),
        atlas=scene.atlas.replace(data=params["atlas_data"]),
    )


def l2_image_loss(img: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((img - target) ** 2)


def make_loss_fn(
    scene: Scene,
    render_fn: Callable[[Scene], jax.Array],
    target: jax.Array,
    loss: Callable = l2_image_loss,
) -> Callable[[ParamDict], jax.Array]:
    """Build loss(params) for optimization: params -> scene -> image -> loss."""

    def fn(params: ParamDict) -> jax.Array:
        return loss(render_fn(set_params(scene, params)), target)

    return fn


def value_and_grad(
    scene: Scene,
    render_fn: Callable[[Scene], jax.Array],
    target: jax.Array,
    loss: Callable = l2_image_loss,
):
    """(loss value, parameter gradients) for the current scene parameters."""
    fn = make_loss_fn(scene, render_fn, target, loss)
    return jax.value_and_grad(fn)(get_params(scene))
