"""Geometry stage: world + model bank -> the frame's screen-space triangles.

Replaces the reference's instance-data sort + glDrawElementsInstanced path
(src/flows/render_flow.rs:603-933 sort_world_section_active_entities /
add_entities, src/exports/rendering.rs:270-386 draw_model_with_sortable_index):
instead of writing per-instance bytes into mapped buffers and issuing draw
calls per (model, sortable) range, we materialize one fixed-budget flat
triangle list for the whole frame:

  1. frustum-cull entities (per-entity AABB test),
  2. pick each entity's level-of-view bank entry by camera distance
     (the ModelId bit-25-31 LoV adjustment, model_definitions.rs:31-49),
  3. expand (entity, model) -> triangles with a cumsum + searchsorted
     "ragged repeat" (static shape, budget ``max_tris``),
  4. transform to clip space on the MXU (one big batched matmul),
  5. emit screen-space vertices + per-triangle attributes for the raster.

Everything is static-shape; triangles beyond the budget are dropped
(counted, so callers can grow the budget — the same budgeted-conservatism
contract as the reference's fixed buffer sizes,
default_render_system.rs:77-84).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from render_engine_tpu.ecs import registry as R
from render_engine_tpu.ecs.world import World
from render_engine_tpu.math import transforms as T
from render_engine_tpu.models.bank import ModelBank
from render_engine_tpu.world import culling


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "xy", "z", "inv_w", "world_pos", "normal", "uv",
        "material", "entity", "valid", "transparent", "total_requested",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class TriangleBatch:
    """The frame's triangles in screen space (budgeted to T rows)."""

    xy: jnp.ndarray  # (T, 3, 2) pixel coords (x right, y down)
    z: jnp.ndarray  # (T, 3) NDC depth in [-1, 1]
    inv_w: jnp.ndarray  # (T, 3) 1/clip_w for perspective correction
    world_pos: jnp.ndarray  # (T, 3, 3)
    normal: jnp.ndarray  # (T, 3, 3) world-space, unnormalized per-vertex
    uv: jnp.ndarray  # (T, 3, 2)
    material: jnp.ndarray  # (T,) int32
    entity: jnp.ndarray  # (T,) int32 source entity
    valid: jnp.ndarray  # (T,) bool
    transparent: jnp.ndarray  # (T,) bool — forward-pass triangles
    total_requested: jnp.ndarray  # scalar int32: pre-budget triangle count

    @property
    def budget(self) -> int:
        return self.xy.shape[0]


def build_triangle_batch(
    world: World,
    bank: ModelBank,
    camera,
    *,
    max_tris: int,
    instance_mask: jnp.ndarray | None = None,
    apply_lov: bool = True,
    proj_view: jnp.ndarray | None = None,
) -> TriangleBatch:
    """Cull, LoV-select, and expand instances into screen triangles.

    ``instance_mask`` restricts which entities are considered (e.g. a shadow
    pass over one light's neighborhood); default = all alive.
    ``proj_view`` overrides the camera matrix (light cameras for shadows).
    """
    cap = world.capacity
    pv = camera.proj_view() if proj_view is None else proj_view
    planes = T.frustum_planes(pv)

    vis = world.alive & (world["model_id"] >= 0)
    if instance_mask is not None:
        vis = vis & instance_mask
    vis = vis & culling.aabb_in_frustum(
        planes, world["aabb_min"], world["aabb_max"]
    )

    # level-of-view selection by camera distance (entity-center distance —
    # the reference used section-center distance, render_flow.rs:872-933)
    mid = world["model_id"]
    if apply_lov:
        dist = jnp.linalg.norm(
            world["position"] - camera.position[None], axis=-1
        )
        mid = bank.lov_model_id(mid, dist, camera.draw_distance)
    mid_safe = jnp.clip(mid, 0, bank.num_models - 1)

    # ragged expansion: entity -> its triangle rows
    counts = jnp.where(vis, bank.tri_count[mid_safe], 0)
    offsets = jnp.cumsum(counts)  # inclusive
    starts = offsets - counts
    total = offsets[cap - 1] if cap > 0 else jnp.int32(0)

    t_ids = jnp.arange(max_tris, dtype=jnp.int32)
    ent = jnp.searchsorted(offsets, t_ids, side="right").astype(jnp.int32)
    ent = jnp.clip(ent, 0, cap - 1)
    valid = t_ids < total
    tri_within = t_ids - starts[ent]
    tri_idx = bank.tri_offset[mid_safe[ent]] + tri_within
    tri_idx = jnp.clip(tri_idx, 0, bank.num_triangles - 1)

    # gather model-space geometry
    tv = bank.tri_v[tri_idx]  # (T, 3)
    v_obj = bank.vertices[tv]  # (T, 3, 3)
    n_obj = bank.normals[tv]
    uv = bank.uvs[tv]
    material = bank.tri_material[tri_idx]

    # object -> world (per-entity TRS) ----------------------------------
    m = world["transform"][ent]  # (T, 4, 4)
    w_pos = T.apply_transform(m, v_obj)  # (T, 3, 3)
    # normal transform for TRS: n' = R @ (n / scale) (inverse-transpose of
    # R S without a matrix inverse)
    scale = world["scale"][ent]  # (T, 3)
    rot = T.quat_to_matrix(world["orientation"][ent])  # (T, 3, 3)
    safe_scale = jnp.where(jnp.abs(scale) > 1e-12, scale, 1.0)
    w_nrm = jnp.einsum("tij,tnj->tni", rot, n_obj / safe_scale[:, None, :])

    # world -> clip (MXU) -------------------------------------------------
    ones = jnp.ones(w_pos.shape[:-1] + (1,), jnp.float32)
    homo = jnp.concatenate([w_pos, ones], axis=-1)  # (T, 3, 4)
    clip = jnp.einsum("ij,tnj->tni", pv, homo)  # (T, 3, 4)
    w = clip[..., 3]
    # near-plane reject: any vertex behind the near plane drops the
    # triangle (v0 limitation — no near clipping; fine for scenes where the
    # camera stays out of geometry; the frustum AABB cull already removed
    # most cases)
    valid = valid & jnp.all(w > 1e-6, axis=-1)
    inv_w = 1.0 / jnp.where(jnp.abs(w) > 1e-9, w, 1.0)
    ndc = clip[..., :3] * inv_w[..., None]  # (T, 3, 3)

    # viewport transform (y down, pixel centers at integer + 0.5)
    width = jnp.float32(0.0)  # placeholder replaced below by caller dims
    del width
    xy_ndc = ndc[..., :2]
    z = ndc[..., 2]
    valid = valid & jnp.all(jnp.isfinite(xy_ndc), axis=(-2, -1))

    # transparency routing: material alpha < 1 or entity FLAG_TRANSPARENT
    ent_flags = world["flags"][ent]
    transparent = (bank.mat_alpha[material] < 1.0) | (
        (ent_flags & R.FLAG_TRANSPARENT) != 0
    )

    return TriangleBatch(
        xy=xy_ndc,  # NDC here; to_screen() converts once dims are known
        z=z,
        inv_w=inv_w,
        world_pos=w_pos,
        normal=w_nrm,
        uv=uv,
        material=material,
        entity=ent,
        valid=valid,
        transparent=transparent,
        total_requested=total,
    )


def to_screen(batch: TriangleBatch, width: int, height: int) -> TriangleBatch:
    """Convert NDC xy to pixel coordinates for a target of (height, width)."""
    x = (batch.xy[..., 0] * 0.5 + 0.5) * jnp.float32(width)
    y = (0.5 - batch.xy[..., 1] * 0.5) * jnp.float32(height)
    return dataclasses.replace(batch, xy=jnp.stack([x, y], axis=-1))
