"""Image IO — PNG read/write for renders, heightmaps and material maps.

Replaces the reference's present path (fullscreen-triangle draw of the
framebuffer texture, ``quad.vert``/``quad.frag``) and its STB image loads
(``Octree.java:200-227``, ``MaterialTextureGenerator.java:66-96``) with PIL.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def write_png(path: str, color: np.ndarray, flip: bool = True) -> None:
    """Write an (H, W, 3) float image in [0,1].  ``flip`` converts from GL
    row order (row 0 = bottom) to PNG row order (row 0 = top)."""
    img = np.asarray(color)
    img = np.nan_to_num(img, nan=1.0, posinf=1.0, neginf=0.0)
    img = (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
    if flip:
        img = img[::-1]
    Image.fromarray(img).save(path)


def read_png(path: str) -> np.ndarray:
    """(H, W) or (H, W, C) uint8/uint16 array."""
    return np.asarray(Image.open(path))


def read_heightmap(path: str) -> np.ndarray:
    """16-bit single-channel heightmap like stbi_load_16 (Octree.java:208)."""
    img = Image.open(path)
    arr = np.asarray(img)
    if arr.ndim == 3:
        arr = arr[..., 0]
    if arr.dtype == np.uint8:
        arr = arr.astype(np.uint16) * 257
    return arr.astype(np.uint16)
