"""Collision detection: grid candidate windows + vectorized AABB tests.

TPU-native port of the reference's handle_collisions
(src/flows/logic_flow.rs:454-655): bucket moved entities by section, find
related entities via the tree, apply a camera-distance cutoff, AABB-intersect,
then invoke per-type collision callbacks with (self, other) asymmetry. Here:

  * candidate search  ->  ``grid.neighbor_candidates`` (27-cell windows over
    the sorted key index) — static shapes, one gather.
  * the 200-unit camera-distance cutoff (logic_flow.rs:553)  ->
    ``camera_cutoff`` mask.
  * per-pair callbacks  ->  per *query* entity: each moved+collidable entity
    learns the index of its first colliding neighbor (optionally filtered by
    the other's type), and the type's vectorized collision callback runs
    under that mask. Both members of a moved-moved pair are queries, so both
    sides get their callback — the reference's self/other asymmetry.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from render_engine_tpu.ecs import registry as R
from render_engine_tpu.ecs.world import World
from render_engine_tpu.math import aabb as A
from render_engine_tpu.world import grid as G

CAMERA_CUTOFF = 200.0  # same constant as logic_flow.rs collision cutoff


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["query", "query_valid", "cand", "cand_type", "hit",
                 "query_dropped", "cell_dropped"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class CollisionResult:
    """Compact candidate table over a fixed QUERY budget: ``query``
    int32[Q] entity ids actually checked this frame, ``cand`` int32[Q, K]
    neighbor ids, ``cand_type`` int32[Q, K] their type ids (carried from
    the packed candidate rows so callers need no re-gather), ``hit``
    bool[Q, K]. Queries are compacted (lowest entity index first) so the
    per-frame gather cost scales with the query budget, not the world
    capacity — the analogue of the reference only testing *moved* entities
    (logic_flow.rs:537-654)."""

    query: jnp.ndarray
    query_valid: jnp.ndarray
    cand: jnp.ndarray
    cand_type: jnp.ndarray
    hit: jnp.ndarray
    query_dropped: jnp.ndarray  # int32 scalar: queries beyond the budget
    cell_dropped: jnp.ndarray  # int32 scalar: neighbors beyond cell budget

    def any_hit(self) -> jnp.ndarray:
        """bool[CAP] scattered back to entity space (capacity from ids)."""
        raise NotImplementedError("use first_hit_of_type")

    def first_hit_of_type(self, world: World, type_index: int
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(other_idx int32[CAP], mask bool[CAP]): first colliding neighbor
        whose type is ``type_index`` (or any type if ``type_index < 0``),
        scattered back to full entity space."""
        ok = self.hit
        if type_index >= 0:
            ok = ok & (self.cand_type == type_index)
        has_q = jnp.any(ok, axis=-1) & self.query_valid
        first = jnp.argmax(ok, axis=-1)
        other_q = jnp.take_along_axis(self.cand, first[:, None], axis=-1)[:, 0]
        cap = world.capacity
        dest = jnp.where(self.query_valid, self.query, cap)
        other = jnp.full(cap, -1, jnp.int32).at[dest].set(other_q,
                                                          mode="drop")
        has = jnp.zeros(cap, bool).at[dest].set(has_q, mode="drop")
        return other, has


def find_collisions(
    world: World,
    grid: G.GridIndex,
    camera_position: jnp.ndarray,
    query_mask: jnp.ndarray,
    per_cell_budget: int = 8,
    query_budget: int = 1024,
) -> CollisionResult:
    """AABB-overlap candidates for entities in ``query_mask`` (typically
    moved & CanCauseCollisions, plus the user entity when
    UserAlwaysCausesCollisions is set — logic_flow.rs:454-537), compacted
    to at most ``query_budget`` queries (overflow drops highest indices)."""
    cfg = world.config
    # camera cutoff (logic_flow.rs: collisions only near the camera)
    near_cam = (
        jnp.sum((world["position"] - camera_position[None]) ** 2, axis=-1)
        <= jnp.float32(CAMERA_CUTOFF) ** 2
    )
    q = query_mask & near_cam

    cap = world.capacity
    qb = min(query_budget, cap)
    key = jnp.where(q, jnp.arange(cap, dtype=jnp.int32), cap)
    qidx = jnp.sort(key)[:qb]
    qvalid = qidx < cap
    qidx = jnp.clip(qidx, 0, cap - 1)

    # packed candidate rows: [entity, alive, type, aabb_min, aabb_max] as
    # f32 (ids/capacities stay far below 2^24, so the f32 round-trip is
    # exact). ONE row gather replaces five scalar-memory gathers — see
    # grid.neighbor_candidate_rows.
    mn, mx = world["aabb_min"], world["aabb_max"]
    table = jnp.concatenate(
        [
            jnp.arange(cap, dtype=jnp.float32)[:, None],
            world.alive.astype(jnp.float32)[:, None],
            world["type_id"].astype(jnp.float32)[:, None],
            mn, mx,
        ],
        axis=1,
    )  # (CAP, 9)
    rows, valid, cell_dropped = G.neighbor_candidate_rows(
        grid, grid.keys[qidx], cfg, table[grid.perm], per_cell_budget
    )  # (Q, K, 9)
    # channel-leading view: per-channel [..., c] slices of the (Q, K, 9)
    # rows are LANE-selects (measured 0.7 ms of cross-lane shuffles at
    # (1024, 216)); one transpose up front makes every channel a cheap
    # (Q, K) plane with K in the lane dim
    ch = jnp.moveaxis(rows, -1, 0)  # (9, Q, K)
    cand = ch[0].astype(jnp.int32)
    alive_c = ch[1] > 0.5
    ctype = ch[2].astype(jnp.int32)
    valid = valid & (cand != qidx[:, None]) & alive_c & qvalid[:, None]

    # AABB intersect per axis on (Q, K) planes (A.intersects over a
    # trailing vec3 would re-pad the lane dim)
    qmn, qmx = mn[qidx], mx[qidx]  # (Q, 3)
    hit = valid
    for a in range(3):
        hit = hit & (qmn[:, a:a + 1] <= ch[6 + a]) \
                  & (ch[3 + a] <= qmx[:, a:a + 1])
    query_dropped = jnp.maximum(jnp.sum(q.astype(jnp.int32)) - qb, 0)
    return CollisionResult(query=qidx, query_valid=qvalid, cand=cand,
                           cand_type=ctype, hit=hit,
                           query_dropped=query_dropped,
                           cell_dropped=cell_dropped)


def collision_query_mask(world: World, moved: jnp.ndarray) -> jnp.ndarray:
    """Which entities initiate collision checks this frame."""
    collidable = world.flag_set(R.FLAG_COLLIDABLE)
    always_user = world.flag_set(R.FLAG_USER_ALWAYS_COLLIDES)
    return (moved & collidable) | (always_user & collidable)
