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
