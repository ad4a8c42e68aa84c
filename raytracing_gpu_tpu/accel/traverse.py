"""BVH traversal on device (XLA while-loop form).

Placeholder until the flat-BVH build lands (accel/bvh.py): scenes built
without a BVH never call into this module.
"""

from __future__ import annotations


def traverse_triangles(scene, o, d, t_min, t_max):
    raise NotImplementedError("triangle BVH traversal lands with accel/bvh.py")


def traverse_spheres(scene, o, d, tm, t_min, t_max):
    raise NotImplementedError("sphere BVH traversal lands with accel/bvh.py")
