"""Golden-image regression vs the reference's published renders.

The reference's only regression record is its committed PNGs (SURVEY §4):
`images/image16.png` is the door scene render.  Pixel-exact matching against
the reference binary is impossible (curand streams + reference bugs, SURVEY §4
quirks), so these tests assert *statistical/perceptual* agreement on a
downsampled luminance grid — mean energy and coarse structure — which catches
geometry/camera/material regressions while tolerating MC noise.
"""

import os

import numpy as np
import pytest

from raytracing_gpu_tpu import RenderSettings, render
from raytracing_gpu_tpu.models import scenes

REF_IMG = "/root/reference/images"


def _load(path):
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def _downsample(img, grid=(6, 10)):
    h, w, _ = img.shape
    gh, gw = grid
    ys = np.linspace(0, h, gh + 1, dtype=int)
    xs = np.linspace(0, w, gw + 1, dtype=int)
    out = np.zeros((gh, gw))
    lum = img @ np.array([0.299, 0.587, 0.114])
    for i in range(gh):
        for j in range(gw):
            out[i, j] = lum[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    return out


# scene -> (published PNG, spp_per_chunk, chunks, depth, energy tol, min corr)
# The image numbers were identified by a luminance-grid correlation sweep over
# /root/reference/images (e.g. big_scene1 -> image7 at 0.81 while the next
# candidate scores 0.56).  The enclosed emissive cornell scenes need ~128 spp
# and depth 16 before the gamma-space grid stabilizes (gamma-2 of a noisy
# estimate is biased low by Jensen; at 128 spp the cornell grid reaches
# corr 0.99 / energy within 11% of image11).
GOLDEN = {
    "first": ("image6.png", 8, 1, 6, 0.12, 0.90),
    "big_scene1": ("image7.png", 8, 1, 6, 0.15, 0.75),
    "two_spheres": ("image8.png", 8, 1, 6, 0.12, 0.90),
    "two_perlin_spheres": ("image9.png", 8, 1, 6, 0.15, 0.80),
    "earth": ("image10.75.png", 16, 4, 8, 0.15, 0.95),
    "cornell_box": ("image11.png", 32, 4, 16, 0.15, 0.95),
    "cornell_smoke": ("image12.png", 32, 2, 16, 0.15, 0.90),
    "triangles": ("image14.png", 8, 1, 6, 0.12, 0.95),
    "door": ("image16.png", 8, 1, 5, 0.15, 0.85),
}


@pytest.mark.skipif(not os.path.isdir(REF_IMG), reason="reference images absent")
class TestGolden:
    @pytest.mark.parametrize("name", sorted(GOLDEN))
    def test_matches_published_render(self, name):
        img, spp, chunks, depth, energy_tol, min_corr = GOLDEN[name]
        ref = _load(os.path.join(REF_IMG, img))
        sd = scenes.get(name)
        st = RenderSettings(image_width=120, aspect_ratio=sd.aspect,
                            spp_per_chunk=spp, num_chunks=chunks,
                            max_depth=depth, ray_batch=8192)
        ours = render(sd.scene, sd.camera, st, seed=1)

        g_ref = _downsample(ref)
        g_ours = _downsample(ours)
        rel = abs(g_ours.mean() - g_ref.mean()) / max(g_ref.mean(), 1e-6)
        assert rel < energy_tol, f"{name}: energy off by {rel:.3f}"
        corr = np.corrcoef(g_ref.reshape(-1), g_ours.reshape(-1))[0, 1]
        assert corr > min_corr, f"{name}: grid corr {corr:.3f}"
