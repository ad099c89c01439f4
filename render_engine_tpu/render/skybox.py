"""Skybox: cubemap sampling per background pixel.

Replaces the reference's skybox path (CubeMap upload cubemap.rs:57-125, the
mat3(view) + xyww depth trick first_pass_vertex.glsl / render_system.rs:
483-499, and the stencil==0 second-pass draw): instead of rasterizing an
inward cube, background pixels compute their camera ray directly and sample
the cubemap — same result, no geometry, one fused op.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pixel_ray_directions(camera, height: int, width: int) -> jnp.ndarray:
    """World-space ray direction through every pixel center, (H, W, 3)."""
    fwd = camera.direction()
    up0 = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    right = jnp.cross(fwd, up0)
    right = right / jnp.linalg.norm(right)
    up = jnp.cross(right, fwd)
    t = jnp.tan(0.5 * jnp.float32(camera.fov_y))
    x_ndc = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    y_ndc = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    d = (
        fwd[None, None]
        + x_ndc[None, :, None] * (t * camera.aspect) * right[None, None]
        + y_ndc[:, None, None] * t * up[None, None]
    )
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def sample_cubemap(cubemap: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear cubemap sample. ``cubemap``: (6, S, S, 3) faces ordered
    +X, -X, +Y, -Y, +Z, -Z (the GL convention the reference uploads in,
    cubemap.rs:57-125); ``dirs``: (..., 3) unit vectors."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # face selection
    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    )
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-9)

    # per-face (u, v) in [-1, 1] (GL cubemap face orientations)
    u = jnp.where(
        is_x,
        jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    ) / ma
    v = jnp.where(
        is_x,
        -y,
        jnp.where(is_y, jnp.where(y >= 0, z, -z), -y),
    ) / ma

    s = cubemap.shape[1]
    uf = (u * 0.5 + 0.5) * (s - 1)
    vf = (v * 0.5 + 0.5) * (s - 1)
    u0 = jnp.clip(jnp.floor(uf).astype(jnp.int32), 0, s - 1)
    v0 = jnp.clip(jnp.floor(vf).astype(jnp.int32), 0, s - 1)
    u1 = jnp.clip(u0 + 1, 0, s - 1)
    v1 = jnp.clip(v0 + 1, 0, s - 1)
    fu = (uf - u0)[..., None]
    fv = (vf - v0)[..., None]

    c00 = cubemap[face, v0, u0]
    c01 = cubemap[face, v0, u1]
    c10 = cubemap[face, v1, u0]
    c11 = cubemap[face, v1, u1]
    return (
        c00 * (1 - fu) * (1 - fv)
        + c01 * fu * (1 - fv)
        + c10 * (1 - fu) * fv
        + c11 * fu * fv
    )


# ---------------------------------------------------------------------------
# Star-geometry skybox: gather-free background for the space demo
# ---------------------------------------------------------------------------
# Per-pixel cubemap gathers are the single most expensive op on this TPU
# path (XLA lowers generic gathers poorly); a starfield is really N point
# lights at infinity, so we project the N directions and SCATTER 2x2 splats
# into the background — O(N) instead of O(H*W) work, and sharper stars.


import dataclasses
from functools import partial

import jax


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["dirs", "colors"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Starfield:
    dirs: jnp.ndarray  # (N, 3) unit directions
    colors: jnp.ndarray  # (N, 3) linear color


def make_starfield(n_stars: int = 2400, seed: int = 7) -> Starfield:
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n_stars, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    brightness = rng.uniform(0.25, 1.0, (n_stars, 1)).astype(np.float32)
    tint = rng.uniform(0.85, 1.0, (n_stars, 3)).astype(np.float32)
    return Starfield(
        dirs=jnp.asarray(d, jnp.float32),
        colors=jnp.asarray(brightness * tint),
    )


SPACE_BASE_COLOR = (0.004, 0.005, 0.012)


def starfield_background(camera, stars: Starfield, height: int, width: int,
                         base_color=SPACE_BASE_COLOR) -> jnp.ndarray:
    """(H, W, 3) background: deep-space base + scattered star splats."""
    fwd = camera.direction()
    up0 = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    right = jnp.cross(fwd, up0)
    right = right / jnp.linalg.norm(right)
    up = jnp.cross(right, fwd)
    # view-space components
    dx = stars.dirs @ right
    dy = stars.dirs @ up
    dz = stars.dirs @ fwd  # positive = in front
    t = jnp.tan(0.5 * jnp.float32(camera.fov_y))
    safe = jnp.where(dz > 1e-6, dz, 1.0)
    ndc_x = dx / (safe * t * camera.aspect)
    ndc_y = dy / (safe * t)
    px = ((ndc_x * 0.5 + 0.5) * width).astype(jnp.int32)
    py = ((0.5 - ndc_y * 0.5) * height).astype(jnp.int32)
    ok = (dz > 1e-6) & (px >= 0) & (px < width - 1) & (py >= 0) & (
        py < height - 1
    )
    pxs = jnp.where(ok, px, width + 8)  # out-of-range -> dropped
    pys = jnp.where(ok, py, height + 8)

    bg = jnp.broadcast_to(
        jnp.asarray(base_color, jnp.float32), (height, width, 3)
    )
    for oy in (0, 1):  # 2x2 splat
        for ox in (0, 1):
            w_ = 1.0 if (ox == 0 and oy == 0) else 0.45
            bg = bg.at[pys + oy, pxs + ox].max(stars.colors * w_,
                                               mode="drop")
    return bg


def starfield_cubemap(size: int = 256, stars_per_face: int = 400,
                      seed: int = 7) -> jnp.ndarray:
    """Procedural space skybox for the demo (the reference's 6-face space
    textures, space_logic/skybox.rs, are assets we do not copy)."""
    rng = np.random.default_rng(seed)
    faces = np.zeros((6, size, size, 3), np.float32)
    faces[:] = np.array([0.004, 0.005, 0.012])  # deep-space blue-black
    for f in range(6):
        xs = rng.integers(0, size, stars_per_face)
        ys = rng.integers(0, size, stars_per_face)
        brightness = rng.uniform(0.3, 1.0, stars_per_face).astype(np.float32)
        tint = rng.uniform(0.85, 1.0, (stars_per_face, 3)).astype(np.float32)
        faces[f, ys, xs] = brightness[:, None] * tint
    return jnp.asarray(faces)
