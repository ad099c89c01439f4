"""G-buffer: the deferred first-pass render targets as (H, W, C) arrays.

Replaces the reference's G-buffer FBO (gPosition / gNormal / gAlbedoSpec /
gLightPosition texture attachments, prelude/default_render_system.rs:102-108,
frame_buffer.rs) and the stencil buffer: the GLSL first pass tagged skybox /
light-source pixels with sentinel position values (first_pass_frag.glsl:1-2,
80) and the second pass stenciled lit vs background pixels
(render_system.rs:568-588); here an explicit int32 material-id channel plus
the winning-triangle id replace both tricks.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

MATERIAL_BACKGROUND = -1  # no geometry: skybox / clear color pixels


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["depth", "position", "normal", "albedo", "material", "tri_id"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class GBuffer:
    depth: jnp.ndarray  # (H, W) NDC depth, +1 = far/empty
    position: jnp.ndarray  # (H, W, 3) world-space position
    normal: jnp.ndarray  # (H, W, 3) world-space unit normal
    albedo: jnp.ndarray  # (H, W, 3)
    material: jnp.ndarray  # (H, W) int32, MATERIAL_BACKGROUND where empty
    tri_id: jnp.ndarray  # (H, W) int32 winning triangle, -1 where empty

    @property
    def shape(self):
        return self.depth.shape

    def covered(self) -> jnp.ndarray:
        return self.tri_id >= 0


def empty_gbuffer(height: int, width: int) -> GBuffer:
    return GBuffer(
        depth=jnp.ones((height, width), jnp.float32),
        position=jnp.zeros((height, width, 3), jnp.float32),
        normal=jnp.zeros((height, width, 3), jnp.float32),
        albedo=jnp.zeros((height, width, 3), jnp.float32),
        material=jnp.full((height, width), MATERIAL_BACKGROUND, jnp.int32),
        tri_id=jnp.full((height, width), -1, jnp.int32),
    )
