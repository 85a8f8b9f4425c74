"""Procedural noise — jitted ports of the chunkgen GLSL noise stack.

The reference generates terrain on the GPU with classic 2-D Perlin ``cnoise``
(``src/shaders/chunkgen.comp:49-86``), 3-D simplex ``snoise`` (:95-162) and
2-D Worley ``worley`` (:174-212) — the public-domain stegu/Ashima shader
implementations.  These are elementwise float32 math, so they vectorize
directly onto the VPU over whole voxel grids; XLA fuses the stack into the
terrain composition (:214-226) with no intermediate HBM traffic.

All functions take/return arrays of arbitrary (broadcastable) shape.
"""

from __future__ import annotations

import jax.numpy as jnp

f32 = jnp.float32


def _mod289(x):
    return x - jnp.floor(x * (1.0 / 289.0)) * 289.0


def _permute(x):
    """mod289(((x*34)+10)*x) — chunkgen.comp:33-36."""
    return _mod289(((x * 34.0) + 10.0) * x)


def _permute3d(x):
    """mod(((x*34)+1)*x, 289) — chunkgen.comp:93."""
    return jnp.mod(((x * 34.0) + 1.0) * x, 289.0)


def _taylor_inv_sqrt(r):
    return 1.79284291400159 - 0.85373472095314 * r


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def cnoise(px, py):
    """Classic 2-D Perlin noise (chunkgen.comp:49-86).  Range ~[-1, 1]."""
    px = jnp.asarray(px, f32)
    py = jnp.asarray(py, f32)
    pix, piy = jnp.floor(px), jnp.floor(py)
    pfx, pfy = px - pix, py - piy

    ix = jnp.stack([pix, pix + 1.0, pix, pix + 1.0], axis=-1)
    iy = jnp.stack([piy, piy, piy + 1.0, piy + 1.0], axis=-1)
    fx = jnp.stack([pfx, pfx - 1.0, pfx, pfx - 1.0], axis=-1)
    fy = jnp.stack([pfy, pfy, pfy - 1.0, pfy - 1.0], axis=-1)

    i = _permute(_permute(_mod289(ix)) + _mod289(iy))

    gx = i * (1.0 / 41.0)
    gx = (gx - jnp.floor(gx)) * 2.0 - 1.0  # fract(i/41)*2-1
    gy = jnp.abs(gx) - 0.5
    tx = jnp.floor(gx + 0.5)
    gx = gx - tx

    norm = _taylor_inv_sqrt(gx * gx + gy * gy)
    gx = gx * norm
    gy = gy * norm

    n = gx * fx + gy * fy  # dot(g, f) per corner

    fade_x = _fade(pfx)
    fade_y = _fade(pfy)
    nx0 = n[..., 0] + fade_x * (n[..., 1] - n[..., 0])  # mix along x, y=0
    nx1 = n[..., 2] + fade_x * (n[..., 3] - n[..., 2])  # y=1
    nxy = nx0 + fade_y * (nx1 - nx0)
    return 2.3 * nxy


def snoise(x, y, z):
    """3-D simplex noise (chunkgen.comp:95-162).  Range ~[-1, 1]."""
    x = jnp.asarray(x, f32)
    y = jnp.asarray(y, f32)
    z = jnp.asarray(z, f32)
    C_x, C_y = 1.0 / 6.0, 1.0 / 3.0

    s = (x + y + z) * C_y
    ix = jnp.floor(x + s)
    iy = jnp.floor(y + s)
    iz = jnp.floor(z + s)
    t = (ix + iy + iz) * C_x
    x0 = x - ix + t
    y0 = y - iy + t
    z0 = z - iz + t

    gx = (x0 >= y0).astype(f32)
    gy = (y0 >= z0).astype(f32)
    gz = (z0 >= x0).astype(f32)
    lx, ly, lz = 1.0 - gx, 1.0 - gy, 1.0 - gz
    i1x = jnp.minimum(gx, lz)
    i1y = jnp.minimum(gy, lx)
    i1z = jnp.minimum(gz, ly)
    i2x = jnp.maximum(gx, lz)
    i2y = jnp.maximum(gy, lx)
    i2z = jnp.maximum(gz, ly)

    x1 = x0 - i1x + C_x
    y1 = y0 - i1y + C_x
    z1 = z0 - i1z + C_x
    x2 = x0 - i2x + 2.0 * C_x
    y2 = y0 - i2y + 2.0 * C_x
    z2 = z0 - i2z + 2.0 * C_x
    x3 = x0 - 1.0 + 3.0 * C_x
    y3 = y0 - 1.0 + 3.0 * C_x
    z3 = z0 - 1.0 + 3.0 * C_x

    ix, iy, iz = jnp.mod(ix, 289.0), jnp.mod(iy, 289.0), jnp.mod(iz, 289.0)

    def corner_perm(az, ay, ax):
        return _permute3d(_permute3d(_permute3d(iz + az) + iy + ay) + ix + ax)

    p0 = corner_perm(0.0, 0.0, 0.0)
    p1 = corner_perm(i1z, i1y, i1x)
    p2 = corner_perm(i2z, i2y, i2x)
    p3 = corner_perm(1.0, 1.0, 1.0)

    # gradient construction: N*N points over a square mapped onto an
    # octahedron, ns = n_*D.wyz - D.xzx with D = (0, .5, 1, 2)
    n_ = 1.0 / 7.0
    D_y, D_z = 0.5, 1.0
    ns_x = n_ * 2.0 - 0.0          # D.w*n_ - D.x = 2/7
    ns_y = n_ * D_y - D_z          # = 1/14 - 1
    ns_z = n_ * D_z - 0.0          # = 1/7

    def gradients(p):
        j = p - 49.0 * jnp.floor(p * ns_z * ns_z)
        x_ = jnp.floor(j * ns_z)
        y_ = jnp.floor(j - 7.0 * x_)
        gx_ = x_ * ns_x + ns_y
        gy_ = y_ * ns_x + ns_y
        h = 1.0 - jnp.abs(gx_) - jnp.abs(gy_)
        sx = jnp.floor(gx_) * 2.0 + 1.0
        sy = jnp.floor(gy_) * 2.0 + 1.0
        sh = -(h <= 0.0).astype(f32)
        ax = gx_ + sx * sh
        ay = gy_ + sy * sh
        return ax, ay, h

    g0x, g0y, g0z = gradients(p0)
    g1x, g1y, g1z = gradients(p1)
    g2x, g2y, g2z = gradients(p2)
    g3x, g3y, g3z = gradients(p3)

    def norm3(gx_, gy_, gz_):
        n = _taylor_inv_sqrt(gx_ * gx_ + gy_ * gy_ + gz_ * gz_)
        return gx_ * n, gy_ * n, gz_ * n

    g0x, g0y, g0z = norm3(g0x, g0y, g0z)
    g1x, g1y, g1z = norm3(g1x, g1y, g1z)
    g2x, g2y, g2z = norm3(g2x, g2y, g2z)
    g3x, g3y, g3z = norm3(g3x, g3y, g3z)

    def contrib(gx_, gy_, gz_, cx, cy, cz):
        m = jnp.maximum(0.6 - (cx * cx + cy * cy + cz * cz), 0.0)
        m = m * m
        return m * m * (gx_ * cx + gy_ * cy + gz_ * cz)

    return 42.0 * (contrib(g0x, g0y, g0z, x0, y0, z0)
                   + contrib(g1x, g1y, g1z, x1, y1, z1)
                   + contrib(g2x, g2y, g2z, x2, y2, z2)
                   + contrib(g3x, g3y, g3z, x3, y3, z3))


def _permute_w(x):
    return jnp.mod((34.0 * x + 1.0) * x, 289.0)


def worley(px, py, jitter=1.0, manhattan=False):
    """2-D cellular (Worley) noise returning (F1, F2) (chunkgen.comp:174-212)."""
    px = jnp.asarray(px, f32)
    py = jnp.asarray(py, f32)
    K = 0.142857142857
    Ko = 0.428571428571
    pix = jnp.mod(jnp.floor(px), 289.0)
    piy = jnp.mod(jnp.floor(py), 289.0)
    pfx = px - jnp.floor(px)
    pfy = py - jnp.floor(py)

    oi = jnp.asarray([-1.0, 0.0, 1.0], f32)
    of_ = jnp.asarray([-0.5, 0.5, 1.5], f32)
    pxp = _permute_w(pix[..., None] + oi)  # (..., 3)

    def column(col_idx, dx_base):
        p = _permute_w(pxp[..., col_idx:col_idx + 1] + piy[..., None] + oi)
        ox = (p * K) - jnp.floor(p * K) - Ko
        oy = jnp.mod(jnp.floor(p * K), 7.0) * K - Ko
        dx = pfx[..., None] + dx_base + jitter * ox
        dy = pfy[..., None] - of_ + jitter * oy
        if manhattan:
            return jnp.abs(dx) + jnp.abs(dy)
        return dx * dx + dy * dy

    d1 = column(0, 0.5)
    d2 = column(1, -0.5)
    d3 = column(2, -1.5)

    d1a = jnp.minimum(d1, d2)
    d2 = jnp.maximum(d1, d2)
    d2 = jnp.minimum(d2, d3)
    d1 = jnp.minimum(d1a, d2)
    d2 = jnp.maximum(d1a, d2)

    # sort the three candidates in d1 so F1 = d1[...,0]
    d1x, d1y, d1z = d1[..., 0], d1[..., 1], d1[..., 2]
    d1x, d1y = jnp.minimum(d1x, d1y), jnp.maximum(d1x, d1y)
    d1x, d1z = jnp.minimum(d1x, d1z), jnp.maximum(d1x, d1z)
    d1y = jnp.minimum(d1y, d2[..., 1])
    d1z = jnp.minimum(d1z, d2[..., 2])
    d1y = jnp.minimum(d1y, d1z)
    d1y = jnp.minimum(d1y, d2[..., 0])
    return jnp.sqrt(d1x), jnp.sqrt(d1y)


def sample_perlin_terrain(x, y, z, scale=0.003):
    """The chunkgen terrain composition (chunkgen.comp:214-226): 2-D Perlin
    base height, Worley-ridge F2 added where 3-D simplex is positive; solid
    (material 1) below the surface.  Coordinates in world voxels."""
    x = jnp.asarray(x, f32)
    y = jnp.asarray(y, f32)
    z = jnp.asarray(z, f32)
    px = x * scale
    pz = z * scale
    land = cnoise(px, pz)
    gate = snoise(x * scale * 0.5, y * scale * 0.5, z * scale * 0.5) > 0.0
    _, f2 = worley(px, pz, 1.0, False)
    land = land + jnp.where(gate, f2, 0.0)
    return jnp.where(y * scale > land, 0, 1).astype(jnp.uint8)


def sample_sphere(x, y, z, center=(256, 256, 256), radius=256):
    """chunkgen.comp:8-16."""
    d = jnp.round(jnp.sqrt((x - center[0]) ** 2.0 + (y - center[1]) ** 2.0
                           + (z - center[2]) ** 2.0) - radius)
    return jnp.where(d > 0, 0, 1).astype(jnp.uint8)


def sample_box(x, y, z, lo=256, hi=768):
    """chunkgen.comp:18-26."""
    inside = ((x >= lo) & (x < hi) & (y >= lo) & (y < hi)
              & (z >= lo) & (z < hi))
    return jnp.where(inside, 1, 0).astype(jnp.uint8)
