"""Camera — frustum as four corner direction vectors.

The reference encodes the view frustum as 4 corner *direction* vectors
(l1, l2, r1, r2 with x spread ±1.6 and y spread ±0.9; ``Camera.java:13-18``)
and each pixel's ray direction is a bilinear mix of them
(``svotrace.comp:662-664``).  The reference mutates the corners incrementally
per rotate() call (``Camera.java:76-140``, accumulating float error); here the
corners are a pure function of (pitch, yaw) so renders are reproducible and
jit-friendly.  Composition order matches the reference's incremental update
for the standard mouse-look usage: yaw about world +Y, then pitch about the
camera-right axis — i.e. corners = Ry(yaw) @ Rx(pitch) @ base.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import constants as C


def _ry(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def _rx(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)


@dataclasses.dataclass
class Camera:
    """Position + (pitch, yaw) Euler camera over the world cube [1,2]^3."""

    pos: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.5, 1.5, 2.0], np.float64))
    pitch: float = 0.0
    yaw: float = 0.0
    speed: float = 0.005  # Camera.java:28

    _BASE = np.array([
        [-C.CAMERA_SCALE_Y, -C.CAMERA_SCALE_X, -1.0],  # l1
        [-C.CAMERA_SCALE_Y, +C.CAMERA_SCALE_X, -1.0],  # l2
        [+C.CAMERA_SCALE_Y, -C.CAMERA_SCALE_X, -1.0],  # r1
        [+C.CAMERA_SCALE_Y, +C.CAMERA_SCALE_X, -1.0],  # r2
    ], np.float64)

    def rotate(self, dpitch: float, dyaw: float) -> None:
        """Clamp pitch to ±~90° like Camera.rotate (Camera.java:78-86)."""
        self.pitch = float(np.clip(self.pitch + dpitch,
                                   C.CAMERA_LOWER_LIMIT, C.CAMERA_UPPER_LIMIT))
        self.yaw = float((self.yaw + dyaw) % (2 * np.pi))

    @property
    def rotation(self) -> np.ndarray:
        return _ry(self.yaw) @ _rx(self.pitch)

    @property
    def forward(self) -> np.ndarray:
        """-z view direction (the corner average direction)."""
        return self.rotation @ np.array([0.0, 0.0, -1.0])

    @property
    def right(self) -> np.ndarray:
        return self.rotation @ np.array([1.0, 0.0, 0.0])

    def strafe(self, forward: float, side: float) -> None:
        """Move in the view plane (Camera.strafe, Camera.java:46-50)."""
        self.pos = (self.pos + self.forward * (self.speed * forward)
                    + self.right * (self.speed * side))

    def move_vertical(self, up: float) -> None:
        self.pos = self.pos + np.array([0.0, 1.0, 0.0]) * (self.speed * up)

    def corners(self) -> np.ndarray:
        """(4,3) [l1, l2, r1, r2] corner direction vectors."""
        return (self.rotation @ self._BASE.T).T

    def uniform(self) -> np.ndarray:
        """(5,3): position then 4 corners (cam[5] uniform, svotrace.comp:5-9)."""
        return np.concatenate([self.pos[None, :], self.corners()], axis=0)

    def ray_pick_location(self, depth: float, world_size: int = C.WORLD_SIZE):
        """Un-project the crosshair depth to voxel coords
        (Camera.getRayPickLocation, Camera.java:31-34)."""
        from . import mathutil
        world = self.pos + self.forward * depth
        return mathutil.to_voxel_space(world, world_size)


def pixel_directions(corners: np.ndarray, width: int, height: int):
    """Per-pixel *unnormalized* ray directions, (H, W, 3) float32.

    dir = mix(mix(l1, l2, p.y), mix(r1, r2, p.y), p.x) with
    p = (px + 0.5) / size (svotrace.comp:662-664).  Row 0 is p.y=~0 (the
    *bottom* scanline in GL image coordinates); PNG writers flip.
    """
    l1, l2, r1, r2 = (np.asarray(corners[i], np.float32) for i in range(4))
    px = (np.arange(width, dtype=np.float32) + 0.5) / width
    py = (np.arange(height, dtype=np.float32) + 0.5) / height
    left = l1[None, :] + (l2 - l1)[None, :] * py[:, None]     # (H,3)
    right = r1[None, :] + (r2 - r1)[None, :] * py[:, None]    # (H,3)
    dirs = left[:, None, :] + (right - left)[:, None, :] * px[None, :, None]
    return dirs.astype(np.float32)
