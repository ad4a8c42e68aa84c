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


@pytest.mark.skipif(not os.path.isdir(REF_IMG), reason="reference images absent")
class TestGolden:
    def test_door_matches_reference_image16(self):
        ref = _load(os.path.join(REF_IMG, "image16.png"))
        sd = scenes.get("door")
        st = RenderSettings(image_width=120, aspect_ratio=sd.aspect,
                            spp_per_chunk=8, num_chunks=1, max_depth=5,
                            ray_batch=8192)
        ours = render(sd.scene, sd.camera, st, seed=1)

        g_ref = _downsample(ref)
        g_ours = _downsample(ours)
        # overall energy within 15%
        assert abs(g_ours.mean() - g_ref.mean()) / g_ref.mean() < 0.15
        # coarse structure: high correlation of the luminance grids
        corr = np.corrcoef(g_ref.reshape(-1), g_ours.reshape(-1))[0, 1]
        assert corr > 0.85
