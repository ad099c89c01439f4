"""The jitted world tick — LogicFlow::execute_logic as one pure function.

Stage order mirrors the reference frame (src/flows/pipeline.rs:212-276 and
src/flows/logic_flow.rs:181-265):

  1. visibility-gated active mask (logic sphere UNION render frustum,
     pipeline.rs:222-229) plus AlwaysExecuteLogic overrides
     (logic_flow.rs:801-837), minus static entities
  2. user-input logic (camera/ship, logic_flow.rs:165)
  3. kinematics integration (update_positions, :308-448)
  4. out-of-bounds handling (:271-301)
  5. transform/AABB refresh for moved entities (entity_change_helpers
     batched refresh)
  6. grid rebuild + collision detection and per-type collision callbacks
     (handle_collisions, :454-655)
  7. per-type entity logic + random logic (update_logic, :662-734)
  8. apply the frame's accumulated ChangeSet (update_bounding_box_tree ->
     apply_change, :742-773), including spawns/despawns
  9. second transform refresh for logic-dirtied entities
 10. camera hard-snapped to the user entity (:257-258)

Everything is static-shape; the returned step function jits and vmaps/shards
cleanly (the entity axis is the sharding axis for multi-chip, see
render_engine_tpu/parallel/).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from render_engine_tpu.ecs import changes as C
from render_engine_tpu.ecs import registry as R
from render_engine_tpu.ecs.world import World
from render_engine_tpu.logic import collision as COL
from render_engine_tpu.logic import kinematics as K
from render_engine_tpu.logic.types import EntityType, InputState
from render_engine_tpu.world import culling
from render_engine_tpu.world import grid as G


def _accepts_other_type(fn) -> bool:
    """Trace-time check: does this user callback take ``other_type=``?

    ``**kwargs`` callbacks count as accepting it (they receive the keyword
    without error); uninspectable callables fall back to the slow
    ``world["type_id"][other_idx]`` gather path — wrap them in a plain
    ``def`` with an explicit ``other_type=`` parameter to get the fast
    contact-row type channel."""
    import inspect

    try:
        params = inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False
    if "other_type" in params:
        return True
    return any(p.kind is inspect.Parameter.VAR_KEYWORD
               for p in params.values())


# fixed key order of the step's budget-overflow counters — the engine's
# jit boundary ships them as ONE stacked i32 vector (every extra output
# buffer is its own handle in the dispatch protocol; see
# InputState.pack_with_dt's measurement note) and unpacks by this order
STEP_DROP_KEYS = (
    "collision_cell_dropped",
    "collision_large_dropped",
    "collision_pair_dropped",
    "collision_query_dropped",
    "oob_killed",
    "spawn_dropped",
)


def pack_drop_stats(stats: dict) -> jnp.ndarray:
    """Stack the step's counter dict into one (len(STEP_DROP_KEYS),) i32
    vector (traced; the jit-boundary half of the one-buffer wire)."""
    return jnp.stack([stats[k].astype(jnp.int32) for k in STEP_DROP_KEYS])


def unpack_drop_stats(vec) -> dict:
    """Host-side inverse of ``pack_drop_stats`` (reads the vector back)."""
    import numpy as np

    vals = np.asarray(vec)
    return {k: int(vals[i]) for i, k in enumerate(STEP_DROP_KEYS)}


def make_step(
    types: Sequence[EntityType],
    *,
    logic_radius: float | None = None,
    spawn_budget: int = 0,
    collision_budget: int = 8,
    collision_pairs: int = 4,
    collision_large_budget: int = 8,
    with_stats: bool = False,
):
    """Build the world tick for a closed set of entity types.

    ``logic_radius``: the LogicFrustumCuller sphere radius (defaults to the
    camera draw distance at call time when None).
    ``collision_pairs``: how many simultaneous colliding neighbors each
    entity delivers callbacks for (the reference fires per PAIR,
    logic_flow.rs:537-655; overflow past this static budget is counted in
    ``collision_pair_dropped``).
    ``with_stats``: also return a small dict of budget-overflow counters
    (collision query/cell drops, spawn backpressure, OOB kills) — the
    analogue of the reference's soft-error prints (mapped_buffer.rs:171).
    """
    types = tuple(types)

    def step(world: World, camera, inputs: InputState, dt,
             model_aabb_min, model_aabb_max):
        dt = jnp.float32(dt)
        rng = jax.random.key(inputs.rng_seed)

        # 0. clear per-frame markers (pipeline.rs:268-276 dirty-flag reset)
        flags0 = world["flags"] & ~(R.FLAG_HAS_MOVED | R.FLAG_HAS_ROTATED)
        world = world.replace(flags=flags0)

        # 1. active mask: (frustum | near sphere | AlwaysExecuteLogic),
        #    excluding static entities
        radius = camera.draw_distance if logic_radius is None else logic_radius
        vis = culling.visible_mask(world, camera, logic_radius=radius)
        active = (vis | world.flag_set(R.FLAG_ALWAYS_LOGIC)) & ~world.flag_set(
            R.FLAG_STATIC
        )

        cs = C.empty_changeset(world, spawn_budget=spawn_budget)

        # 2. user input logic
        for t in types:
            if t.user_input is not None:
                cs, camera = t.user_input(world, camera, inputs, dt, cs)

        # 3. kinematics
        world, moved, rotated = K.integrate(world, dt, active)

        # 4. out of bounds: policy pass, then per-type user callbacks (the
        #    reference's OutOfBoundsLogic fns, logic_components.rs:15-18 via
        #    entity_change_helpers.rs:325-351 — mark/delete first, custom
        #    handling second)
        world, kill_oob, oob = K.handle_out_of_bounds(world, {}, types)
        for t in types:
            if t.out_of_bounds_logic is not None:
                cs = t.out_of_bounds_logic(world, oob & world.of_type(t.index),
                                           cs)

        # 5. refresh transforms for kinematically dirty entities
        world = K.refresh_transforms(
            world, model_aabb_min, model_aabb_max, moved | rotated
        )

        # 6. collisions
        stats = {
            "collision_query_dropped": jnp.int32(0),
            "collision_cell_dropped": jnp.int32(0),
            "collision_pair_dropped": jnp.int32(0),
            "collision_large_dropped": jnp.int32(0),
            "spawn_dropped": jnp.int32(0),
            "oob_killed": jnp.sum(kill_oob.astype(jnp.int32)),
        }
        has_collision = any(
            t.collision is not None or t.random_collision is not None
            for t in types
        )
        if has_collision:
            grid = G.build_grid(world)
            qmask = COL.collision_query_mask(world, moved)
            colres = COL.find_collisions(
                world, grid, camera.position, qmask,
                per_cell_budget=collision_budget,
                large_budget=collision_large_budget,
            )
            stats["collision_query_dropped"] = colres.query_dropped
            stats["collision_cell_dropped"] = colres.cell_dropped
            stats["collision_large_dropped"] = colres.large_dropped
            pairs = max(1, collision_pairs)
            others, hitm, otypes, pair_dropped = colres.hits_topk(
                world, pairs)
            stats["collision_pair_dropped"] = pair_dropped
            # per-PAIR delivery (logic_flow.rs:537-655): slot j carries each
            # entity's j-th simultaneous contact; empty slots mask to no-ops.
            # Callbacks accepting other_type= get the contact's type id
            # pre-compacted from the candidate rows (no scalar-memory
            # re-gather; see types.py collision contract).
            for t in types:
                if t.collision is not None:
                    wants = _accepts_other_type(t.collision)
                    for j in range(pairs):
                        tmask = hitm[:, j] & world.of_type(t.index)
                        if wants:
                            cs = t.collision(world, others[:, j], tmask, cs,
                                             other_type=otypes[:, j])
                        else:
                            cs = t.collision(world, others[:, j], tmask, cs)
                if t.random_collision is not None:
                    wants = _accepts_other_type(t.random_collision)
                    for j in range(pairs):
                        tmask = hitm[:, j] & world.of_type(t.index)
                        rng, sub = jax.random.split(rng)
                        if wants:
                            cs = t.random_collision(
                                world, others[:, j], tmask, sub, cs,
                                other_type=otypes[:, j])
                        else:
                            cs = t.random_collision(world, others[:, j],
                                                    tmask, sub, cs)

        # 7. per-type logic
        for t in types:
            tmask = active & world.of_type(t.index)
            if t.logic is not None:
                cs = t.logic(world, dt, tmask, cs)
            if t.random_logic is not None:
                rng, sub = jax.random.split(rng)
                cs = t.random_logic(world, dt, tmask, sub, cs)

        # 8. apply everything (+ out-of-bounds deletions)
        cs = C.with_despawn(cs, kill_oob)
        logic_dirty = jnp.zeros(world.capacity, bool)
        for name in ("position", "orientation", "scale"):
            if name in cs.updates:
                logic_dirty = logic_dirty | cs.updates[name][1]
        alive_before = world.alive
        world = C.apply_changeset(world, cs)

        # 9. refresh transforms for logic-dirtied + freshly spawned entities
        #    (exact mask: slots that became alive this frame are the spawns)
        if cs.spawns is not None:
            landed = world.alive & ~alive_before
            logic_dirty = logic_dirty | landed
            stats["spawn_dropped"] = jnp.maximum(
                cs.spawns.count - jnp.sum(landed.astype(jnp.int32)), 0)
        world = K.refresh_transforms(
            world, model_aabb_min, model_aabb_max, logic_dirty
        )

        # 10. camera follows the user entity
        has_user = world.flag_set(R.FLAG_USER)
        uidx = jnp.argmax(has_user)
        user_pos = world["position"][uidx]
        camera = dataclasses.replace(
            camera,
            position=jnp.where(jnp.any(has_user), user_pos, camera.position),
        )
        if with_stats:
            return world, camera, stats
        return world, camera

    return step
