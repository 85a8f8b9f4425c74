"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
(tile-sharded rendering, gradient all-reduce) are exercised without TPU
hardware — the driver separately dry-runs the multichip path.  Must set flags
before JAX initializes.
"""

import os
import sys

# XLA_FLAGS is read lazily at CPU-backend init, so setting it here works even
# though this machine's sitecustomize imports jax at interpreter startup.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The host sitecustomize force-registers the axon TPU backend and overrides
# JAX_PLATFORMS with "axon,cpu" (so env pinning is ignored).  The TPU tunnel
# is single-client — a second process touching it deadlocks both — so tests
# MUST pin CPU via jax.config, which wins over the sitecustomize value.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from svo_raytracer_tpu.core import build_np  # noqa: E402


def make_sphere_voxels(size: int = 32, radius: int | None = None,
                       center=None, value: int = 1) -> np.ndarray:
    """Dense voxel ball, the analog of chunkgen.comp's sampleSphere (:8-16)."""
    if radius is None:
        radius = size // 4
    if center is None:
        center = (size // 2,) * 3
    x, y, z = np.meshgrid(*(np.arange(size),) * 3, indexing="ij")
    dist = np.round(np.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2
                            + (z - center[2]) ** 2) - radius)
    return np.where(dist <= 0, value, 0).astype(np.uint8)


def make_terrain_voxels(size: int = 32, seed: int = 0) -> np.ndarray:
    """Low-frequency pseudo-terrain with several materials — inhomogeneous
    cells, exposed/interior regions, multiple node types."""
    rng = np.random.default_rng(seed)
    coarse = rng.uniform(0.2, 0.8, (4, 4))
    hx = np.linspace(0, 3, size)
    h = coarse[np.clip(hx.astype(int), 0, 3)[:, None],
               np.clip(hx.astype(int), 0, 3)[None, :]]
    heights = (h * size).astype(int)
    x, y, z = np.meshgrid(*(np.arange(size),) * 3, indexing="ij")
    solid = y <= heights[x, z]
    near_surface = y >= heights[x, z] - 3
    mat = np.where(near_surface, 3, 1)
    return np.where(solid, mat, 0).astype(np.uint8)


@pytest.fixture
def sphere_voxels():
    return make_sphere_voxels(32)


@pytest.fixture
def terrain_voxels():
    return make_terrain_voxels(32)


@pytest.fixture
def sphere_tree(sphere_voxels):
    return build_np.build_octree_np(sphere_voxels)


@pytest.fixture
def terrain_tree(terrain_voxels):
    return build_np.build_octree_np(terrain_voxels)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free XLA/tracing caches between test modules: the full suite runs
    ~160 heavy interpret-mode compiles in one process and the CPU
    compiler segfaults near the end once its accumulated state grows
    past ~40 min of compilation (r3: reproducible at the same spot,
    while any subset passes).

    ROOT CAUSE (r5, scripts/repro_cpu_segfault.py): every distinct-shape
    interpret-mode wavefront compile leaks ~40 MB of XLA:CPU executable
    + tracing-cache state that nothing bounds — 80 synthetic compiles
    measured 0.78 -> 3.9 GB RSS still climbing linearly, while the same
    load with jax.clear_caches() every 10 iterations stays flat at
    ~1.4 GB.  The suite's ~160 larger compiles extrapolate past 10 GB
    plus allocator fragmentation, where XLA:CPU dies.  Per-module
    clearing is the correct mitigation (caches are per-module anyway —
    fixtures rebuild scenes), not a workaround for a repo bug; the
    unbounded growth itself is upstream (jax/XLA:CPU keeps every
    compiled executable alive for the process lifetime by design)."""
    yield
    import jax

    jax.clear_caches()
