"""EntityTransformBuilder: serializable entity-spawn specifications.

Port of the reference's EntityTransformationBuilder (src/exports/
entity_transformer.rs:13-192): a declarative spec of translation / velocity /
acceleration / rotation(+velocity,+acceleration) / scale plus static /
collision / light flags, applied at spawn time to write components, compose
the TRS matrix, and insert into the world. Serializable so AddEntity can
live inside recorded history (:12) — here the spec flattens to plain numpy
kwargs, which is exactly what both the host spawn path
(ecs.world.spawn_host) and the in-step spawn queue (ecs.changes.queue_spawn)
consume, so a spec can ride the replay log unchanged.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from render_engine_tpu.ecs import registry as R


@dataclasses.dataclass
class EntityTransformBuilder:
    translation: tuple = (0.0, 0.0, 0.0)
    velocity: tuple | None = None
    acceleration: tuple | None = None
    rotation_axis: tuple | None = None  # axis-angle, reference style
    rotation_angle: float = 0.0
    rotation_velocity: tuple | None = None  # rotvec rate (axis * rad/s)
    rotation_acceleration: tuple | None = None
    scale: tuple = (1.0, 1.0, 1.0)
    is_static: bool = False
    causes_collisions: bool = False
    always_execute_logic: bool = False
    transparent: bool = False
    light_type: int | None = None  # R.SORTABLE_{DIRECTIONAL,POINT,SPOT}

    # ----------------------------------------------------------------- chain
    def with_translation(self, x, y, z):
        self.translation = (x, y, z)
        return self

    def with_velocity(self, x, y, z):
        self.velocity = (x, y, z)
        return self

    def with_acceleration(self, x, y, z):
        self.acceleration = (x, y, z)
        return self

    def with_rotation(self, axis, angle):
        self.rotation_axis, self.rotation_angle = tuple(axis), float(angle)
        return self

    def with_rotation_velocity(self, rotvec):
        self.rotation_velocity = tuple(rotvec)
        return self

    def with_scale(self, x, y=None, z=None):
        self.scale = (x, y if y is not None else x, z if z is not None else x)
        return self

    def static(self, yes=True):
        self.is_static = yes
        return self

    def collidable(self, yes=True):
        self.causes_collisions = yes
        return self

    def always_logic(self, yes=True):
        self.always_execute_logic = yes
        return self

    def as_light(self, sortable_index: int):
        self.light_type = int(sortable_index)
        return self

    # -------------------------------------------------------------- applies
    def spawn_kwargs(self, count: int = 1, model_id: int | None = None,
                     type_id: int | None = None, **extra) -> dict:
        """Flatten to component kwargs for spawn_host / queue_spawn
        (apply_choices, entity_transformer.rs:55-143). Broadcasts the spec
        over ``count`` instances; ``extra`` adds custom components."""
        from render_engine_tpu.math import transforms as T
        import jax.numpy as jnp

        kw: dict = {}

        def rep(v, width):
            return np.broadcast_to(
                np.asarray(v, np.float32), (count, width)
            ).copy()

        kw["position"] = rep(self.translation, 3)
        if self.velocity is not None:
            kw["velocity"] = rep(self.velocity, 3)
        if self.acceleration is not None:
            kw["acceleration"] = rep(self.acceleration, 3)
        if self.rotation_axis is not None:
            q = np.asarray(
                T.quat_from_axis_angle(
                    jnp.asarray(self.rotation_axis, jnp.float32),
                    jnp.float32(self.rotation_angle),
                )
            )
            kw["orientation"] = np.broadcast_to(q, (count, 4)).copy()
        if self.rotation_velocity is not None:
            kw["ang_vel"] = rep(self.rotation_velocity, 3)
        if self.rotation_acceleration is not None:
            kw["ang_acc"] = rep(self.rotation_acceleration, 3)
        kw["scale"] = rep(self.scale, 3)

        flags = 0
        if self.is_static:
            flags |= int(R.FLAG_STATIC)
        if self.causes_collisions:
            flags |= int(R.FLAG_COLLIDABLE)
        if self.always_execute_logic:
            flags |= int(R.FLAG_ALWAYS_LOGIC)
        if self.transparent:
            flags |= int(R.FLAG_TRANSPARENT)
        if flags:
            kw["flags"] = np.full(count, flags, np.uint32)
        if self.light_type is not None:
            kw["sortable"] = np.full(count, self.light_type, np.int32)
        if model_id is not None:
            kw["model_id"] = np.full(count, model_id, np.int32)
        if type_id is not None:
            kw["type_id"] = np.full(count, type_id, np.int32)
        kw.update(extra)
        return kw

    # ---------------------------------------------------------- serialization
    def serialize(self) -> dict:
        """Plain-dict form (the Serialize derive) for embedding in logs."""
        return dataclasses.asdict(self)

    @staticmethod
    def deserialize(d: dict) -> "EntityTransformBuilder":
        return EntityTransformBuilder(**d)
