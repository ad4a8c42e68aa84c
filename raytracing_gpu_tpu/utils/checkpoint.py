"""Checkpoint/resume for chunked renders.

The reference's implicit checkpointing is its per-frame-buffer PPM dump
(`render.h:152-162`) merged by `average_images` (`color.h:57-170`) — 8-bit and
manually resumed.  Here: float32 partial sums + completed-chunk count in one
npz, written atomically (tmp + rename), giving exact automatic resume.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

_FILE = "render_state.npz"


def save(directory: str, sums: np.ndarray, chunks_done: int) -> None:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, _FILE)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, sums=sums, chunks_done=np.int64(chunks_done))
    os.replace(tmp, path)


def load(directory: str, expected_shape=None) -> Optional[Tuple[np.ndarray, int]]:
    path = os.path.join(directory, _FILE)
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        sums = data["sums"]
        chunks_done = int(data["chunks_done"])
    if expected_shape is not None and tuple(sums.shape) != tuple(expected_shape):
        return None  # stale checkpoint from different settings
    return sums, chunks_done


def clear(directory: str) -> None:
    path = os.path.join(directory, _FILE)
    if os.path.exists(path):
        os.remove(path)
