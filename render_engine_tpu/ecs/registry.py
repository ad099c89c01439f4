"""Component registry: names -> array slots, shapes, dtypes, defaults.

Mirrors the reference's component registration (ecs.rs:61-135: at most 32
registered component types, each assigned a bit in the per-entity bitset;
registration happens once before the game runs, logic_flow.rs:78-115). Here a
component is a named fixed-shape jnp array column; the registry is an
immutable, hashable description created before tracing, so the jitted step
specializes on the full component set (custom user components included —
the analogue of registering ``AngleRelativeSun`` at instance time,
reference src/space_logic/solar_system/asteroid.rs:87).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

MAX_COMPONENTS = 32  # same budget as the reference's u32 bitset (ecs.rs:57)


@dataclasses.dataclass(frozen=True)
class ComponentSpec:
    name: str
    shape: tuple  # per-entity shape, () for scalar
    dtype: str  # numpy dtype name, e.g. "float32"
    default: float = 0.0  # fill value for unwritten slots


# --- builtin components -----------------------------------------------------
# The reference registers 18 builtin types (logic_flow.rs:78-115). Their SoA
# equivalents; light data (LightInformation, light_components.rs:4-38) is
# split into flat arrays so the lighting kernel can gather without structs.
BUILTIN_COMPONENTS: tuple[ComponentSpec, ...] = (
    ComponentSpec("position", (3,), "float32"),
    ComponentSpec("velocity", (3,), "float32"),
    ComponentSpec("acceleration", (3,), "float32"),
    ComponentSpec("orientation", (4,), "float32"),  # quat (w,x,y,z); Rotation
    ComponentSpec("ang_vel", (3,), "float32"),  # rotvec rate; VelocityRotation
    ComponentSpec("ang_acc", (3,), "float32"),  # AccelerationRotation
    ComponentSpec("scale", (3,), "float32", 1.0),
    ComponentSpec("transform", (4, 4), "float32"),  # TransformationMatrix
    ComponentSpec("aabb_min", (3,), "float32"),  # StaticAABB lo
    ComponentSpec("aabb_max", (3,), "float32"),  # StaticAABB hi
    ComponentSpec("model_id", (), "int32", -1),  # ModelId
    ComponentSpec("type_id", (), "int32", -1),  # TypeIdentifier
    ComponentSpec("sortable", (), "int32", 0),  # sortable bucket 0..3
    ComponentSpec("flags", (), "uint32", 0),  # marker components, see below
    ComponentSpec("light_diffuse", (3,), "float32"),
    ComponentSpec("light_specular", (3,), "float32"),
    ComponentSpec("light_ambient", (3,), "float32"),
    ComponentSpec("light_atten", (2,), "float32"),  # (linear, quadratic)
    ComponentSpec("light_cutoff", (2,), "float32"),  # (cos inner, cos outer)
    ComponentSpec("light_direction", (3,), "float32"),
    ComponentSpec("light_radius", (), "float32"),
    ComponentSpec("light_fov", (), "float32"),
    ComponentSpec("parent", (), "int32", -1),  # ParentEntity / owned edges
    # referenced (NON-owning) entity edges, ecs.rs:70-71,150-181: a small
    # fixed set of read-only entity ids per owner (-1 = empty slot). Unlike
    # ``parent``, referenced entities do NOT cascade deletion.
    ComponentSpec("ref_edges", (4,), "int32", -1),
)

MAX_REF_EDGES = 4  # per-entity referenced-entity budget

# --- flag bits (marker components, reference logic_components.rs:52-65 and
# movement_components.rs HasMoved/HasRotated) -------------------------------
FLAG_STATIC = jnp.uint32(1 << 0)  # MakeObjectStatic / static sections
FLAG_COLLIDABLE = jnp.uint32(1 << 1)  # CanCauseCollisions
FLAG_ALWAYS_LOGIC = jnp.uint32(1 << 2)  # AlwaysExecuteLogic
FLAG_OUT_OF_BOUNDS = jnp.uint32(1 << 3)  # IsOutOfBounds marker
FLAG_HAS_MOVED = jnp.uint32(1 << 4)
FLAG_HAS_ROTATED = jnp.uint32(1 << 5)
FLAG_USER = jnp.uint32(1 << 6)  # the dedicated user entity (ecs.rs:136-142)
FLAG_DELETE_ON_OOB = jnp.uint32(1 << 7)  # out-of-bounds policy: delete
FLAG_TRANSPARENT = jnp.uint32(1 << 8)  # drawn in the forward transparency pass
FLAG_EMISSIVE = jnp.uint32(1 << 9)  # light-source draw bucket (unlit)
FLAG_USER_ALWAYS_COLLIDES = jnp.uint32(1 << 10)  # UserAlwaysCausesCollisions

# sortable buckets (reference light_components.rs:30-38, sorted_entities.rs)
SORTABLE_DEFAULT = 0
SORTABLE_DIRECTIONAL = 1
SORTABLE_POINT = 2
SORTABLE_SPOT = 3


class ComponentRegistry:
    """Immutable component table. Hashable so it can be a jit static arg."""

    def __init__(self, custom: tuple[ComponentSpec, ...] = ()):
        specs = BUILTIN_COMPONENTS + tuple(custom)
        if len(specs) > MAX_COMPONENTS:
            raise ValueError(
                f"{len(specs)} components exceeds the {MAX_COMPONENTS} budget"
            )
        names = [s.name for s in specs]
        if len(set(names)) != len(names):
            raise ValueError("duplicate component names")
        self._specs = specs
        self._slot = {s.name: i for i, s in enumerate(specs)}

    @property
    def specs(self) -> tuple[ComponentSpec, ...]:
        return self._specs

    def slot(self, name: str) -> int:
        return self._slot[name]

    def bit(self, name: str) -> int:
        """The comp_mask bit for a component (ecs.rs bitset analogue)."""
        return 1 << self._slot[name]

    def bits(self, *names: str) -> int:
        out = 0
        for n in names:
            out |= self.bit(n)
        return out

    def __contains__(self, name: str) -> bool:
        return name in self._slot

    def __hash__(self):
        return hash(self._specs)

    def __eq__(self, other):
        return isinstance(other, ComponentRegistry) and self._specs == other._specs
