"""Deferred lighting: fused Blinn-Phong over the G-buffer x light arrays.

Port of the reference's second pass (render_engine_assets/shaders/
second_pass_frag.glsl:20-139 semantics): directional / point / spot
accumulation with ambient+diffuse+specular terms, distance attenuation
(1 / (1 + linear*d + quadratic*d^2)), spot smooth cutoffs, and the
no-light-cutoff diffuse floor so geometry outside every light's reach stays
faintly visible. The stencil==0xFF lit-pixel selection becomes a material-id
test; light-source (emissive) pixels bypass lighting exactly like the
reference's sentinel-tagged star pixels (first_pass_frag.glsl:80,
render_system_setup.rs 6x skybox brightness for suns).

Light upload (reference render_system.rs:681-845 uploads visible lights into
std140 uniform arrays with per-frame stability) becomes ``extract_lights``:
deterministic fixed-budget gathers from the world's light buckets.

Shadow hooks: ``shadow_factor`` per (pixel, shadow-mapped light) multiplies
the diffuse+specular terms; see render/shadows.py for the PCF implementation.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from render_engine_tpu.ecs import registry as R
from render_engine_tpu.ecs.world import World
from render_engine_tpu.render.gbuffer import GBuffer

# Default Blinn-Phong exponent = the reference's hardcoded 64.0
# (second_pass_frag.glsl:66,87,110). Materials override it per MTL ``Ns``
# (models/bank.py mat_shininess); scenes where every material agrees keep
# the exponent as a compile-time constant on all paths.
from render_engine_tpu.models.bank import DEFAULT_SHININESS

SHININESS = DEFAULT_SHININESS
DIFFUSE_FLOOR = 0.08  # the no-light-cutoff diffuse floor


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "dir_direction", "dir_diffuse", "dir_specular", "dir_ambient",
        "dir_count", "dir_entity",
        "pt_position", "pt_diffuse", "pt_specular", "pt_ambient",
        "pt_atten", "pt_radius", "pt_count", "pt_entity",
        "sp_position", "sp_direction", "sp_diffuse", "sp_specular",
        "sp_ambient", "sp_atten", "sp_cutoff", "sp_count", "sp_entity",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class LightArrays:
    """Fixed-budget per-type light arrays (the MaxNumLights uniform blocks,
    prelude/default_render_system.rs:162-205)."""

    dir_direction: jnp.ndarray  # (ND, 3)
    dir_diffuse: jnp.ndarray  # (ND, 3)
    dir_specular: jnp.ndarray
    dir_ambient: jnp.ndarray
    dir_count: jnp.ndarray  # int32 scalar
    dir_entity: jnp.ndarray  # (ND,) source entity id (-1 empty)
    pt_position: jnp.ndarray  # (NP, 3)
    pt_diffuse: jnp.ndarray
    pt_specular: jnp.ndarray
    pt_ambient: jnp.ndarray
    pt_atten: jnp.ndarray  # (NP, 2) linear, quadratic
    pt_radius: jnp.ndarray  # (NP,)
    pt_count: jnp.ndarray
    pt_entity: jnp.ndarray
    sp_position: jnp.ndarray  # (NS, 3)
    sp_direction: jnp.ndarray
    sp_diffuse: jnp.ndarray
    sp_specular: jnp.ndarray
    sp_ambient: jnp.ndarray
    sp_atten: jnp.ndarray
    sp_cutoff: jnp.ndarray  # (NS, 2) cos inner, cos outer
    sp_count: jnp.ndarray
    sp_entity: jnp.ndarray


def _select_bucket(world: World, bucket: int, budget: int,
                   mask: jnp.ndarray | None):
    """Deterministic fixed-budget selection of a light bucket's entities:
    lowest entity index first (stable across frames, the analogue of the
    reference's previous-frame-stable light upload)."""
    m = world.sortable_mask(bucket)
    if mask is not None:
        m = m & mask
    cap = world.capacity
    key = jnp.where(m, jnp.arange(cap, dtype=jnp.int32), cap)
    idx = jnp.sort(key)[:budget]
    valid = idx < cap
    idx = jnp.clip(idx, 0, cap - 1)
    return idx, valid, jnp.sum(m.astype(jnp.int32)).clip(0, budget)


def extract_lights(
    world: World,
    *,
    max_dir: int = 4,
    max_point: int = 256,
    max_spot: int = 16,
    visible_mask: jnp.ndarray | None = None,
) -> LightArrays:
    def zeros(n, c=3):
        return jnp.zeros((n, c), jnp.float32)

    di, dv, dc = _select_bucket(world, R.SORTABLE_DIRECTIONAL, max_dir,
                                visible_mask)
    pi, pv, pc = _select_bucket(world, R.SORTABLE_POINT, max_point,
                                visible_mask)
    si, sv, sc = _select_bucket(world, R.SORTABLE_SPOT, max_spot,
                                visible_mask)

    def g(name, idx, valid, c=None):
        a = world[name][idx]
        v = valid.reshape(valid.shape + (1,) * (a.ndim - 1))
        return jnp.where(v, a, 0.0)

    return LightArrays(
        dir_direction=g("light_direction", di, dv),
        dir_diffuse=g("light_diffuse", di, dv),
        dir_specular=g("light_specular", di, dv),
        dir_ambient=g("light_ambient", di, dv),
        dir_count=dc,
        dir_entity=jnp.where(dv, di, -1),
        pt_position=g("position", pi, pv),
        pt_diffuse=g("light_diffuse", pi, pv),
        pt_specular=g("light_specular", pi, pv),
        pt_ambient=g("light_ambient", pi, pv),
        pt_atten=g("light_atten", pi, pv),
        pt_radius=g("light_radius", pi, pv),
        pt_count=pc,
        pt_entity=jnp.where(pv, pi, -1),
        sp_position=g("position", si, sv),
        sp_direction=g("light_direction", si, sv),
        sp_diffuse=g("light_diffuse", si, sv),
        sp_specular=g("light_specular", si, sv),
        sp_ambient=g("light_ambient", si, sv),
        sp_atten=g("light_atten", si, sv),
        sp_cutoff=g("light_cutoff", si, sv),
        sp_count=sc,
        sp_entity=jnp.where(sv, si, -1),
    )


def _blinn_phong(n, view_dir, light_dir, albedo, diffuse, specular, ambient,
                 spec_strength=1.0, shininess=SHININESS):
    """Core BRDF terms (second_pass_frag.glsl:58-139 semantics).
    All inputs broadcast to (..., 3). ``spec_strength``: per-pixel material
    specular multiplier (the gAlbedoSpec alpha channel). ``shininess``:
    the specular exponent — a Python float (compile-time constant) or a
    broadcastable per-pixel array in varying-Ns scenes."""
    ndl = jnp.maximum(jnp.sum(n * light_dir, axis=-1, keepdims=True), 0.0)
    h = light_dir + view_dir
    hlen = jnp.linalg.norm(h, axis=-1, keepdims=True)
    h = h / jnp.where(hlen > 1e-9, hlen, 1.0)
    ndh = jnp.maximum(jnp.sum(n * h, axis=-1, keepdims=True), 0.0)
    spec = jnp.where(ndl > 0.0, ndh ** shininess, 0.0) * spec_strength
    return ambient * albedo + diffuse * ndl * albedo + specular * spec


def shade(
    gbuf: GBuffer,
    lights: LightArrays,
    bank,
    camera_position: jnp.ndarray,
    *,
    background: jnp.ndarray | None = None,
    shadow_factor=None,
    light_chunk: int = 8,
    emissive_image: jnp.ndarray | None = None,
    specular_image: jnp.ndarray | None = None,
    shininess_image: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Lit color (H, W, 3). ``background``: (H, W, 3) for empty pixels
    (skybox sample or clear color). ``shadow_factor``: optional callable
    (kind, slot_index, world_pos (H,W,3)) -> (H,W,1) in [0,1].
    ``emissive_image``: per-pixel emissive strengths (H, W), replacing the
    material-table gather when the resolve already folded materials in.
    ``shininess_image``: per-pixel specular exponents (H, W) for
    varying-Ns scenes; None = per-material gather (or the scene's single
    compile-time exponent when all materials agree)."""
    h, w = gbuf.shape
    n = gbuf.normal
    pos = gbuf.position
    albedo = gbuf.albedo
    vd = camera_position[None, None, :] - pos
    vlen = jnp.linalg.norm(vd, axis=-1, keepdims=True)
    view_dir = vd / jnp.where(vlen > 1e-9, vlen, 1.0)

    color = jnp.zeros((h, w, 3), jnp.float32)

    # per-material specular strength (gAlbedoSpec.a) + exponent (MTL Ns).
    # Uniform-Ns scenes keep the exponent a Python float so the pow
    # strength-reduces at compile time on every path.
    uni_shin = bank.uniform_shininess() if bank is not None else SHININESS
    if specular_image is not None:
        spec_k = specular_image[..., None]
    else:
        mat_s = jnp.clip(gbuf.material, 0, bank.mat_specular.shape[0] - 1)
        spec_k = bank.mat_specular_eff[mat_s][..., None]
    if shininess_image is not None:
        shin = shininess_image[..., None]
    elif uni_shin is not None:
        shin = uni_shin
    else:
        mat_s = jnp.clip(gbuf.material, 0, bank.mat_specular.shape[0] - 1)
        shin = bank.mat_shininess_eff[mat_s][..., None]

    def sf(kind, i):
        if shadow_factor is None:
            return 1.0
        return shadow_factor(kind, i, pos)

    # directional lights (unrolled; budget is tiny)
    nd = lights.dir_direction.shape[0]
    for i in range(nd):
        on = (i < lights.dir_count).astype(jnp.float32)
        ld = -lights.dir_direction[i]
        llen = jnp.linalg.norm(ld)
        ld = ld / jnp.where(llen > 1e-9, llen, 1.0)
        c = _blinn_phong(
            n, view_dir, ld[None, None, :], albedo,
            lights.dir_diffuse[i], lights.dir_specular[i],
            lights.dir_ambient[i], spec_k, shin,
        )
        color = color + on * c * sf("dir", i)

    # point lights. The first few unroll so cube-shadow factors can apply
    # (callbacks need a static light index); the rest chunk-scan.
    np_ = lights.pt_position.shape[0]
    n_head = min(4, np_) if shadow_factor is not None else 0
    for i in range(n_head):
        on = (i < lights.pt_count).astype(jnp.float32)
        lv = lights.pt_position[i][None, None, :] - pos
        dist = jnp.linalg.norm(lv, axis=-1, keepdims=True)
        ld = lv / jnp.where(dist > 1e-9, dist, 1.0)
        atten = 1.0 / (
            1.0
            + lights.pt_atten[i, 0] * dist
            + lights.pt_atten[i, 1] * dist * dist
        )
        # influence radius bounds the point light's reach
        # (LightInformation.radius, light_components.rs:13)
        rad = lights.pt_radius[i]
        atten = jnp.where((rad > 0.0) & (dist > rad), 0.0, atten)
        c = _blinn_phong(
            n, view_dir, ld, albedo,
            lights.pt_diffuse[i], lights.pt_specular[i],
            lights.pt_ambient[i], spec_k, shin,
        )
        color = color + on * c * atten * sf("point", i)

    np_tail = np_ - n_head
    if np_tail > 0:
        np_ = np_tail
        n_chunks = -(-np_ // light_chunk)
        pad = n_chunks * light_chunk - np_

        def padc(a):
            if pad:
                return jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]
                )
            return a

        h0 = n_head
        pt_pos = padc(lights.pt_position[h0:]).reshape(
            n_chunks, light_chunk, 3)
        pt_dif = padc(lights.pt_diffuse[h0:]).reshape(
            n_chunks, light_chunk, 3)
        pt_spe = padc(lights.pt_specular[h0:]).reshape(
            n_chunks, light_chunk, 3)
        pt_amb = padc(lights.pt_ambient[h0:]).reshape(
            n_chunks, light_chunk, 3)
        pt_att = padc(lights.pt_atten[h0:]).reshape(n_chunks, light_chunk, 2)
        pt_rad = padc(lights.pt_radius[h0:]).reshape(n_chunks, light_chunk)
        pt_ids = (h0 + jnp.arange(n_chunks * light_chunk)).reshape(
            n_chunks, light_chunk
        )

        def chunk_body(acc, xs):
            cpos, cdif, cspe, camb, catt, crad, cids = xs
            # (H, W, C, 3) light vectors
            lv = cpos[None, None, :, :] - pos[:, :, None, :]
            d = jnp.linalg.norm(lv, axis=-1, keepdims=True)
            ld = lv / jnp.where(d > 1e-9, d, 1.0)
            atten = 1.0 / (
                1.0
                + catt[None, None, :, 0:1] * d
                + catt[None, None, :, 1:2] * d * d
            )
            crad_b = crad[None, None, :, None]
            atten = jnp.where((crad_b > 0.0) & (d > crad_b), 0.0, atten)
            on = (cids < lights.pt_count).astype(jnp.float32)[
                None, None, :, None
            ]
            c = _blinn_phong(
                n[:, :, None, :], view_dir[:, :, None, :], ld,
                albedo[:, :, None, :],
                cdif[None, None], cspe[None, None], camb[None, None],
                spec_k[:, :, None, :],
                shin if isinstance(shin, float) else shin[:, :, None, :],
            )
            return acc + jnp.sum(c * atten * on, axis=2), None

        color_pt, _ = jax.lax.scan(
            chunk_body, jnp.zeros((h, w, 3), jnp.float32),
            (pt_pos, pt_dif, pt_spe, pt_amb, pt_att, pt_rad, pt_ids),
        )
        color = color + color_pt

    # spot lights (unrolled small budget with smooth cutoff)
    ns = lights.sp_position.shape[0]
    for i in range(ns):
        on = (i < lights.sp_count).astype(jnp.float32)
        lv = lights.sp_position[i][None, None, :] - pos
        d = jnp.linalg.norm(lv, axis=-1, keepdims=True)
        ld = lv / jnp.where(d > 1e-9, d, 1.0)
        sd = lights.sp_direction[i]
        slen = jnp.linalg.norm(sd)
        sd = sd / jnp.where(slen > 1e-9, slen, 1.0)
        cos_theta = jnp.sum(ld * (-sd)[None, None, :], axis=-1, keepdims=True)
        inner, outer = lights.sp_cutoff[i, 0], lights.sp_cutoff[i, 1]
        eps = jnp.maximum(inner - outer, 1e-6)
        intensity = jnp.clip((cos_theta - outer) / eps, 0.0, 1.0)
        atten = 1.0 / (
            1.0
            + lights.sp_atten[i, 0] * d
            + lights.sp_atten[i, 1] * d * d
        )
        c = _blinn_phong(
            n, view_dir, ld, albedo,
            lights.sp_diffuse[i], lights.sp_specular[i],
            lights.sp_ambient[i], spec_k, shin,
        )
        color = color + on * c * intensity * atten * sf("spot", i)

    # diffuse floor: never pitch black (second_pass_frag.glsl no-light floor)
    color = jnp.maximum(color, DIFFUSE_FLOOR * albedo)

    # emissive materials bypass lighting (the light-source stencil path)
    if emissive_image is not None:
        emissive = emissive_image[..., None]
    else:
        mat = jnp.clip(gbuf.material, 0, bank.mat_emissive.shape[0] - 1)
        emissive = bank.mat_emissive[mat][..., None]
    color = jnp.where(emissive > 0.0, albedo * emissive, color)

    # background pixels
    covered = gbuf.covered()[..., None]
    if background is None:
        background = jnp.zeros((h, w, 3), jnp.float32)
    return jnp.where(covered, color, background)
