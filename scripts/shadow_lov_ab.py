"""Shadow-LoV quality A/B: render the staged penumbra close-up at
shadow_lov_bias 2 (default) vs 3 and save both stills + a difference
summary into debug_out/ (the same reviewable-tradeoff contract as
scripts/pcf_quality_ab.py, VERDICT r4 #9).

shadow_lov_bias coarsens ONLY the shadow pass's geometry (the reference's
shadow_render_system_lov, render_thread.rs:97-104): the camera still sees
full-detail models; silhouettes in the 1024^2 depth map drop LoV bands.
The candidate win is the shadow batch-build + binning cost at a smaller
shadow_max_tris budget (bias 3 roughly halves the light-frustum request).

Runs anywhere (CPU forces interpret-mode kernels; identical math).
Usage: python scripts/shadow_lov_ab.py
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if os.environ.get("SHADOW_AB_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from render_engine_tpu.demo.space_scene import build_space_engine
    from render_engine_tpu.ecs import world as W
    from render_engine_tpu.logic import kinematics as K
    from render_engine_tpu.logic.types import InputState
    from render_engine_tpu.math.camera import CameraBuilder
    from render_engine_tpu.render.frame import to_srgb_u8
    from render_engine_tpu.utils.png import encode_png

    os.makedirs("debug_out", exist_ok=True)
    imgs = {}
    for bias in (2, 3):
        eng = build_space_engine(width=640, height=360, capacity=512,
                                 num_asteroids=120, max_tris=16384,
                                 shadow_lov_bias=bias,
                                 shadow_tile_budget=1.0,
                                 shadow_update_interval=1)
        eng.config.record_history = False
        # the pcf_quality_ab staging: occluder on star A's spot axis at
        # t=25, fat receiver at t=55, camera off +x looking back — a soft
        # shadow edge crosses real pixels (the wide spawn view differs by
        # <0.01% and would hide the comparison)
        sp = np.array([1000.0, 984.2, 932.6])
        cp = np.array([1026.0, 996.0, 915.0])
        d = sp - cp
        yaw = math.degrees(math.atan2(d[2], d[0]))
        pitch = math.degrees(math.atan2(d[1], math.hypot(d[0], d[2])))
        cam = (CameraBuilder()
               .with_position(*cp)
               .with_yaw_pitch_degrees(yaw, pitch)
               .with_fov_degrees(60.0).with_aspect(640 / 360)
               .with_near_far(0.1, 400.0)
               .with_draw_distance(400.0).build())
        rock = eng.bank.model_index("asteroid")
        eng.world, _ = W.spawn_host(
            eng.world, 2,
            position=np.array([[1000.0, 992.8, 903.9],
                               [1000.0, 984.2, 932.6]], np.float32),
            model_id=np.array([rock, rock], np.int32),
            scale=np.array([[1.5, 1.5, 1.5], [6.0, 6.0, 6.0]], np.float32))
        eng.world = K.refresh_transforms(
            eng.world, eng.bank.aabb_min, eng.bank.aabb_max,
            jnp.asarray(eng.world.alive))
        # rendered frames so the round-robin maps the lights (shadow maps
        # only update inside the RENDER programs), then the detached view
        for i in range(6):
            eng.frame(InputState.idle(i), 1 / 60, render=True)
        img = eng.render_only(cam)
        arr = np.asarray(to_srgb_u8(img))
        imgs[bias] = arr
        path = f"debug_out/shadow_lov_{bias}.png"
        with open(path, "wb") as f:
            f.write(encode_png(arr))
        print(f"wrote {path}", flush=True)

    diff = np.abs(imgs[2].astype(np.int16) - imgs[3].astype(np.int16))
    frac = float((diff.max(axis=-1) > 4).mean())
    print(f"pixels differing by >4/255: {frac:.3%} "
          f"(max {int(diff.max())}/255) — coarser-silhouette shadow edges "
          "are the whole visual cost; see the two PNGs side by side")


if __name__ == "__main__":
    main()
