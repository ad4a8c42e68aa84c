"""Image decode for textures (replaces vendored stb_image, reference
`external/stb_image.h` + `imread`/`make_image`, `texture.h:166-203`)."""

from __future__ import annotations

import numpy as np


def load_image(path: str) -> np.ndarray:
    """Decode an image file -> (H, W, 3) float32 in [0, 1]."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), np.float32)
    return arr / 255.0
