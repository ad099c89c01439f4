"""EntityTransformBuilder tests (entity_transformer.rs parity)."""

import jax.numpy as jnp
import numpy as np

from render_engine_tpu.ecs import registry as R
from render_engine_tpu.ecs import world as W
from render_engine_tpu.ecs.transform_builder import EntityTransformBuilder
from render_engine_tpu.logic import kinematics as K
from render_engine_tpu.prelude import default_render_systems
from render_engine_tpu.models import primitives
from render_engine_tpu.models.bank import ModelBankBuilder


class TestTransformBuilder:
    def test_spawn_kwargs_apply(self):
        b = (EntityTransformBuilder()
             .with_translation(1.0, 2.0, 3.0)
             .with_velocity(0.5, 0.0, 0.0)
             .with_rotation((0, 1, 0), np.pi / 2)
             .with_scale(2.0)
             .collidable()
             .static())
        kw = b.spawn_kwargs(count=2, model_id=0, type_id=7)
        cfg = W.WorldConfig(capacity=8)
        w = W.create_world(cfg)
        w, idx = W.spawn_host(w, 2, **kw)
        np.testing.assert_allclose(w["position"][0], [1, 2, 3])
        np.testing.assert_allclose(w["scale"][1], [2, 2, 2])
        assert bool(w.flag_set(R.FLAG_STATIC)[0])
        assert bool(w.flag_set(R.FLAG_COLLIDABLE)[1])
        assert int(w["type_id"][0]) == 7
        # the TRS matrix composes after refresh (apply_choices analogue)
        bank_mn = jnp.full((1, 3), -0.5)
        bank_mx = jnp.full((1, 3), 0.5)
        w = K.refresh_transforms(w, bank_mn, bank_mx, jnp.asarray(w.alive))
        m = np.asarray(K.world_transforms(w, np.array([0]))[0])
        np.testing.assert_allclose(m[:3, 3], [1, 2, 3], atol=1e-6)
        # rotated pi/2 about y with scale 2: x-axis column -> -z * 2
        np.testing.assert_allclose(m[:3, 0], [0, 0, -2], atol=1e-5)

    def test_serialize_roundtrip(self):
        b = (EntityTransformBuilder().with_translation(4, 5, 6)
             .as_light(R.SORTABLE_POINT))
        d = b.serialize()
        b2 = EntityTransformBuilder.deserialize(d)
        kw1 = b.spawn_kwargs()
        kw2 = b2.spawn_kwargs()
        for k in kw1:
            np.testing.assert_array_equal(kw1[k], kw2[k])


class TestPrelude:
    def test_default_systems(self):
        bb = ModelBankBuilder()
        a = bb.add_model("a", primitives.cube(1.0))
        b = bb.add_model("b", primitives.cube(1.0))
        bank = bb.finalize()
        systems = default_render_systems(bank, emissive_models=(b,))
        assert len(systems) == 2
        assert systems[0].model_ids == (a,)
        assert systems[1].model_ids == (b,)
        assert not systems[1].lit and systems[1].emissive_boost == 6.0
