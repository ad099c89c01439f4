"""Isolate TPU replay divergence with ONE engine build (tunnel compiles are
slow): same-fn rerun, then a second jit instance of the same function."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from render_engine_tpu.demo.space_scene import build_space_engine
from render_engine_tpu.ecs import world as W
from render_engine_tpu.logic.types import InputState, KEY_W
from render_engine_tpu.utils.hashing import world_hash


def main():
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    eng = build_space_engine(width=128, height=32, capacity=128,
                             num_asteroids=40, max_tris=2048)
    print(f"built {time.time()-t0:.0f}s", flush=True)
    base = eng.history.baseline_world

    def run(step_fn, nframes=3):
        # the one-buffer boundary wire (round 5): camera crosses as its
        # serialized vector, inputs+dt as ONE packed f32 vector
        world = W.restore(eng.world_config, base)
        camera = eng.history.restore_camera(eng.camera)
        camv = np.asarray(camera.serialize(), np.float32)
        hs = []
        for i in range(nframes):
            inputs = InputState.idle(i).with_keys(KEY_W)
            world, camv, _stats = step_fn(world, camv,
                                          inputs.pack_with_dt(1 / 30))
            hs.append(world_hash(world)[:12])
        return hs

    t0 = time.time()
    h1 = run(eng._step)
    print(f"run1 {time.time()-t0:.0f}s", h1, flush=True)
    h2 = run(eng._step)
    print("same-jit rerun equal:", h1 == h2, h2, flush=True)

    # a SECOND jit instance of the same python function, on the same wire
    bank = eng.bank
    cam_template = eng._cam_template
    from render_engine_tpu.logic.step import make_step, pack_drop_stats

    step2 = make_step(tuple(eng.config.entity_types),
                      logic_radius=eng.config.logic_radius,
                      spawn_budget=eng.config.spawn_budget,
                      collision_budget=eng.config.collision_budget,
                      with_stats=True)

    def step2_packed(w, camv, packed):
        cam = cam_template.apply_serialized(camv)
        inp, dt = InputState.unpack_with_dt(packed)
        w, cam, stats = step2(w, cam, inp, dt, bank.aabb_min, bank.aabb_max)
        return w, cam.serialize(), pack_drop_stats(stats)

    f2 = jax.jit(step2_packed)
    t0 = time.time()
    h3 = run(f2)
    print(f"fresh-jit {time.time()-t0:.0f}s equal:", h1 == h3, h3, flush=True)


if __name__ == "__main__":
    main()
