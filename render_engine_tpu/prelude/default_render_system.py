"""The default deferred render-system set.

Mirrors prelude/default_render_system.rs:30-231: the canonical pipeline the
demo uses — a lit deferred system over all models, an unlit light-source
system (the 6x-brightness star path, render_system_setup.rs:57-77), and the
built-in defaults: 5 LoV bands at 10/15/20/25/30% of draw distance
(create_level_of_views :239-256) and the MaxNumLights budgets
(:162-205) carried by RenderSettings.
"""

from __future__ import annotations

from render_engine_tpu.models.bank import ModelBank
from render_engine_tpu.render.render_system import (
    RenderSystem,
    RenderSystemBuilder,
)

EMISSIVE_BOOST_DEFAULT = 6.0  # the demo's star brightness multiplier


def default_render_systems(
    bank: ModelBank,
    *,
    emissive_models: tuple = (),
    emissive_boost: float = EMISSIVE_BOOST_DEFAULT,
) -> tuple[RenderSystem, ...]:
    """One lit deferred system over every bank model (minus any routed to
    the unlit emissive system)."""
    all_models = tuple(range(bank.num_models))
    lit_models = tuple(m for m in all_models if m not in set(emissive_models))
    systems = []
    if lit_models:
        systems.append(
            RenderSystemBuilder("default").with_models(*lit_models).build()
        )
    if emissive_models:
        systems.append(
            RenderSystemBuilder("light_sources")
            .with_models(*emissive_models)
            .with_lighting(False)
            .with_emissive_boost(emissive_boost)
            .build()
        )
    return tuple(systems)
