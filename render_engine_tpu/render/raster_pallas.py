"""Pallas TPU kernel for the rasterizer's tile loop.

Same contract as raster_jnp.rasterize_depth_winner (bit-compatible winner
selection: nearest depth, first-seen wins ties in stable binning order), but
the per-tile candidate march runs as a Pallas kernel:

  * grid = one program per 8x128 screen tile — a tile IS one VPU register
    shape, so every edge-function/depth op is a single vector op;
  * candidate triangle data is pre-gathered per tile (XLA gather) and
    streamed through VMEM blocks; the inner fori_loop reads per-candidate
    scalars from SMEM;
  * depth/winner accumulate in registers across the loop — zero HBM traffic
    until the final store.

Binning (bbox -> tile pairs -> sort -> windows) is shared with the jnp
version: XLA's device sort is already speed-of-light for that stage.

The kernel runs in interpret mode off-TPU so CPU tests exercise the same
code path.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from render_engine_tpu.render.geometry import TriangleBatch
from render_engine_tpu.render.raster_jnp import RasterConfig, _bin_triangles


def _tile_kernel(
    tiles_x: int,
    tile_h: int,
    tile_w: int,
    tile_budget: int,
    two_pass: bool,
    data_ref,  # SMEM (1, n_cand, 10): x0 y0 x1 y1 x2 y2 z0 z1 z2 classf
    ids_ref,  # SMEM (1, 1, n_cand) int32 global tri ids
    counts_ref,  # SMEM (1, 1, 2) int32: (this tile's window count, global)
    depth_ref,  # VMEM (1, tile_h, tile_w) f32
    winner_ref,  # VMEM (1, tile_h, tile_w) int32
    t_depth_ref=None,  # two_pass: transparent-layer outputs
    t_winner_ref=None,
):
    t = pl.program_id(0)
    oy = (t // tiles_x) * tile_h
    ox = (t % tiles_x) * tile_w
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(
            jnp.float32
        )
        + oy.astype(jnp.float32)
        + 0.5
    )
    px = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(
            jnp.float32
        )
        + ox.astype(jnp.float32)
        + 0.5
    )

    def body(k, carry):
        x0 = data_ref[0, k, 0]
        y0 = data_ref[0, k, 1]
        x1 = data_ref[0, k, 2]
        y1 = data_ref[0, k, 3]
        x2 = data_ref[0, k, 4]
        y2 = data_ref[0, k, 5]
        z0 = data_ref[0, k, 6]
        z1 = data_ref[0, k, 7]
        z2 = data_ref[0, k, 8]
        cls = data_ref[0, k, 9]  # 0 invalid, 1 opaque, 2 transparent
        tid = ids_ref[0, 0, k]

        l0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        l1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
        l2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        area = l0 + l1 + l2
        inside = ((l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0)) | (
            (l0 <= 0.0) & (l1 <= 0.0) & (l2 <= 0.0)
        )
        nz = jnp.abs(area) > 1e-9
        inside = inside & nz & (cls > 0.0)
        inv_area = 1.0 / jnp.where(nz, area, 1.0)
        d = (l0 * z0 + l1 * z1 + l2 * z2) * inv_area
        inside = inside & (d >= -1.0) & (d <= 1.0)
        if two_pass:
            best_d, best_t, best_td, best_tt = carry
            do = jnp.where(inside & (cls < 1.5), d, jnp.inf)
            upd = do < best_d
            best_d = jnp.where(upd, do, best_d)
            best_t = jnp.where(upd, tid, best_t)
            dt_ = jnp.where(inside & (cls > 1.5), d, jnp.inf)
            updt = dt_ < best_td
            best_td = jnp.where(updt, dt_, best_td)
            best_tt = jnp.where(updt, tid, best_tt)
            return best_d, best_t, best_td, best_tt
        best_d, best_t = carry
        d = jnp.where(inside, d, jnp.inf)
        upd = d < best_d
        return jnp.where(upd, d, best_d), jnp.where(upd, tid, best_t)

    inf = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)
    neg = jnp.full((tile_h, tile_w), -1, jnp.int32)
    init = (inf, neg, inf, neg) if two_pass else (inf, neg)
    # dynamic trip counts: only march candidates that actually exist — the
    # occupancy win that makes sparse tiles nearly free
    n_tile = counts_ref[0, 0, 0]
    n_glob = counts_ref[0, 0, 1]
    carry = jax.lax.fori_loop(0, n_tile, body, init)

    def gbody(k, c):
        return body(tile_budget + k, c)

    carry = jax.lax.fori_loop(0, n_glob, gbody, carry)
    if two_pass:
        best_d, best_t, best_td, best_tt = carry
        t_depth_ref[0] = jnp.where(best_tt >= 0, best_td, 1.0)
        t_winner_ref[0] = best_tt
    else:
        best_d, best_t = carry
    depth_ref[0] = jnp.where(best_t >= 0, best_d, 1.0)
    winner_ref[0] = best_t


def _prepare_candidates(batch, cfg, tiles_x, tiles_y, tri_class):
    """Bin once + pre-gather candidate scalars. ``tri_class``: (T,) f32
    candidate class per triangle (0 excluded, 1 opaque, 2 transparent)."""
    nt = tiles_x * tiles_y
    tile_cand, global_list, _ = _bin_triangles(batch, cfg, tiles_x, tiles_y)
    cand = jnp.concatenate(
        [tile_cand,
         jnp.broadcast_to(global_list[None], (nt, cfg.global_budget))],
        axis=1,
    )  # (NT, K)
    safe = jnp.clip(cand, 0, batch.budget - 1)
    x = batch.xy[..., 0][safe]  # (NT, K, 3)
    y = batch.xy[..., 1][safe]
    z = batch.z[safe]
    clsf = jnp.where(cand >= 0, tri_class[safe], 0.0)[..., None]
    data = jnp.concatenate(
        [
            x[..., 0:1], y[..., 0:1],
            x[..., 1:2], y[..., 1:2],
            x[..., 2:3], y[..., 2:3],
            z, clsf,
        ],
        axis=-1,
    )  # (NT, K, 10)
    ids = jnp.where(cand >= 0, cand, -1)[:, None, :]  # (NT, 1, K)
    n_tile = jnp.sum(tile_cand >= 0, axis=1, dtype=jnp.int32)  # (NT,)
    n_glob = jnp.sum(global_list >= 0, dtype=jnp.int32)
    counts = jnp.stack(
        [n_tile, jnp.broadcast_to(n_glob, n_tile.shape)], axis=-1
    )[:, None, :]  # (NT, 1, 2)
    return data, ids, counts


def _launch(batch, height, width, cfg, tri_class, two_pass, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    th, tw = cfg.tile_h, cfg.tile_w
    tiles_x = -(-width // tw)
    tiles_y = -(-height // th)
    nt = tiles_x * tiles_y

    data, ids, counts = _prepare_candidates(batch, cfg, tiles_x, tiles_y,
                                            tri_class)
    k = data.shape[1]
    kernel = functools.partial(_tile_kernel, tiles_x, th, tw,
                               cfg.tile_budget, two_pass)
    n_out = 4 if two_pass else 2
    out_dtypes = [jnp.float32, jnp.int32] * (n_out // 2)
    outs = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, k, 10), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, tw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, th, tw), dt) for dt in out_dtypes
        ],
        interpret=interpret,
    )(data, ids, counts)

    def untile(a):
        a = a.reshape(tiles_y, tiles_x, th, tw)
        a = jnp.transpose(a, (0, 2, 1, 3)).reshape(tiles_y * th, tiles_x * tw)
        return a[:height, :width]

    return tuple(untile(o) for o in outs)


def rasterize_depth_winner_pallas(
    batch: TriangleBatch,
    height: int,
    width: int,
    cfg: RasterConfig = RasterConfig(),
    tri_mask: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for raster_jnp.rasterize_depth_winner."""
    if tri_mask is not None:
        batch = dataclasses.replace(batch, valid=batch.valid & tri_mask)
    tri_class = batch.valid.astype(jnp.float32)
    depth, winner = _launch(batch, height, width, cfg, tri_class,
                            two_pass=False, interpret=interpret)
    return depth, winner


def rasterize_two_pass_pallas(
    batch: TriangleBatch,
    height: int,
    width: int,
    cfg: RasterConfig = RasterConfig(),
    interpret: bool | None = None,
):
    """Opaque + transparent layers from ONE binning and ONE kernel launch.

    Returns (depth, winner, t_depth, t_winner). Matches two separate
    rasterize calls up to exact-depth ties between triangles of different
    classes (candidate order differs; winners on exact ties may too).
    """
    tri_class = jnp.where(
        batch.valid,
        jnp.where(batch.transparent, 2.0, 1.0),
        0.0,
    ).astype(jnp.float32)
    return _launch(batch, height, width, cfg, tri_class, two_pass=True,
                   interpret=interpret)
