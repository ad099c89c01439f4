"""Frame composition: world -> final (H, W, 3) image.

The RenderFlow + RenderSystem::draw orchestration (src/flows/render_flow.rs:
247-335, src/render_system/render_system.rs:410-595) as one pure function:
opaque G-buffer pass, deferred lighting, skybox for background pixels, then
a forward transparency pass blended over the lit image (the reference draws
transparency after lighting in the first pass target,
render_system.rs:501)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from render_engine_tpu.ecs.world import World
from render_engine_tpu.models.bank import ModelBank
from render_engine_tpu.render import lighting as L
from render_engine_tpu.render import skybox as SB
from render_engine_tpu.render.geometry import build_triangle_batch, to_screen
from render_engine_tpu.render.raster_jnp import (
    RasterConfig,
    rasterize_depth_winner,
    render_gbuffer,
    resolve_gbuffer,
)


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    width: int = 800
    height: int = 600
    max_tris: int = 16384
    raster: RasterConfig = RasterConfig()
    max_dir_lights: int = 4
    max_point_lights: int = 64
    max_spot_lights: int = 16
    clear_color: tuple = (0.0, 0.0, 0.0)
    # raster backend: "auto" = Pallas kernel on TPU, jnp elsewhere
    backend: str = "auto"

    def __hash__(self):
        return hash((self.width, self.height, self.max_tris,
                     tuple(dataclasses.astuple(self.raster)),
                     self.max_dir_lights, self.max_point_lights,
                     self.max_spot_lights, self.clear_color, self.backend))


def pick_rasterizer(backend: str = "auto"):
    """Select the depth/winner rasterizer implementation."""
    import jax

    from render_engine_tpu.render.raster_pallas import (
        rasterize_depth_winner_pallas,
    )

    if backend == "pallas":
        return rasterize_depth_winner_pallas
    if backend == "jnp":
        return rasterize_depth_winner
    return (
        rasterize_depth_winner_pallas
        if jax.default_backend() == "tpu"
        else rasterize_depth_winner
    )


def render_frame(
    world: World,
    camera,
    bank: ModelBank,
    settings: RenderSettings,
    *,
    cubemap: Optional[jnp.ndarray] = None,
    atlas=None,
    shadow_state=None,
    shadow_factor=None,
) -> jnp.ndarray:
    """Deferred-render one frame. Returns float32 (H, W, 3) linear color.

    ``shadow_state``: a shadows.ShadowState whose maps PCF-attenuate the
    matching lights; ``shadow_factor`` overrides it with a custom callback.
    """
    h, w = settings.height, settings.width
    rasterizer = pick_rasterizer(settings.backend)

    batch = build_triangle_batch(
        world, bank, camera, max_tris=settings.max_tris
    )
    batch = to_screen(batch, w, h)

    # --- raster: opaque + transparent layers ----------------------------
    from render_engine_tpu.render.raster_pallas import (
        rasterize_depth_winner_pallas,
        render_gbuffers_pallas,
    )

    extras = t_extras = None
    if rasterizer is rasterize_depth_winner_pallas:
        # fused path: ONE binning + ONE raster launch + one-hot MXU resolve
        gbuf, extras, t_gbuf, t_extras = render_gbuffers_pallas(
            batch, bank, h, w, settings.raster,
            proj_view=camera.proj_view(),
        )
        if atlas is not None:
            from render_engine_tpu.render.textures import sample_atlas

            def texture(g, ex):
                layer = bank.mat_texture[
                    jnp.clip(g.material, 0, bank.mat_texture.shape[0] - 1)]
                tex = sample_atlas(atlas, layer, ex["uv"])
                return dataclasses.replace(
                    g,
                    albedo=jnp.where((layer >= 0)[..., None], tex, g.albedo),
                )

            gbuf = texture(gbuf, extras)
            t_gbuf = texture(t_gbuf, t_extras)
    else:
        depth, winner = rasterizer(batch, h, w, settings.raster,
                                   ~batch.transparent)
        t_depth, t_winner = rasterizer(batch, h, w, settings.raster,
                                       batch.transparent)
        gbuf = resolve_gbuffer(batch, bank, depth, winner, atlas=atlas)
        t_gbuf = resolve_gbuffer(batch, bank, t_depth, t_winner, atlas=atlas)

    # --- lights (visible-light upload analogue) -------------------------
    lights = L.extract_lights(
        world,
        max_dir=settings.max_dir_lights,
        max_point=settings.max_point_lights,
        max_spot=settings.max_spot_lights,
    )

    if shadow_factor is None and shadow_state is not None:
        from render_engine_tpu.render.shadows import make_shadow_factor

        shadow_factor = make_shadow_factor(
            shadow_state, world,
            {"dir": lights.dir_entity, "spot": lights.sp_entity},
        )

    # --- background: starfield splats, cubemap, or clear color ----------
    if isinstance(cubemap, SB.Starfield):
        background = SB.starfield_background(camera, cubemap, h, w)
    elif cubemap is not None:
        dirs = SB.pixel_ray_directions(camera, h, w)
        background = SB.sample_cubemap(cubemap, dirs)
    else:
        background = jnp.broadcast_to(
            jnp.asarray(settings.clear_color, jnp.float32), (h, w, 3)
        )

    color = L.shade(
        gbuf, lights, bank, camera.position,
        background=background, shadow_factor=shadow_factor,
        emissive_image=None if extras is None else extras["emissive"],
    )

    # --- transparency: single-layer forward pass over the lit image -----
    t_lit = L.shade(
        gbuf=t_gbuf, lights=lights, bank=bank,
        camera_position=camera.position, background=color,
        shadow_factor=shadow_factor,
        emissive_image=None if t_extras is None else t_extras["emissive"],
    )
    if t_extras is not None:
        alpha = t_extras["alpha"][..., None]
    else:
        mat = jnp.clip(t_gbuf.material, 0, bank.mat_alpha.shape[0] - 1)
        alpha = bank.mat_alpha[mat][..., None]
    in_front = t_gbuf.covered() & (t_gbuf.depth <= gbuf.depth)
    color = jnp.where(
        in_front[..., None], alpha * t_lit + (1.0 - alpha) * color, color
    )

    return jnp.clip(color, 0.0, 1.0)


def to_srgb_u8(color: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB 8-bit for PNG dumps."""
    c = jnp.clip(color, 0.0, 1.0)
    srgb = jnp.where(
        c <= 0.0031308, 12.92 * c, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055
    )
    return (srgb * 255.0 + 0.5).astype(jnp.uint8)
