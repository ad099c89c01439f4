"""Texture atlas: shelf-packed fixed-size layers with per-texture UV
rects + bilinear sampling.

Replaces the reference's GL_TEXTURE_2D_ARRAY stack (texture_array.rs:12-263):
images smaller than the layer size SHARE layers via shelf packing — the
README's "minimize waste of GPU resources" feature (the reference picks the
least-wasteful array per image, texture_array.rs:224-256; packing sub-rects
into shared layers wastes strictly less). Each texture id resolves to
(layer, pixel rect); UV coordinates rescale into the rect
(``SuccessWithResize`` semantics, :122-186). Solid colors become
1x1-equivalent materials that skip sampling entirely (mat_texture < 0); the
6 named error colors (helper_constructs.rs:2-12) become the magenta error
material.

Sampling happens in the G-buffer resolve (per covered pixel, one bilinear
gather) — the first-pass fragment shader's texture path
(first_pass_frag.glsl:14-37 unpack + sample).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["layers", "tex_layer", "uv_rect", "bilin_rows"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class TextureAtlas:
    layers: jnp.ndarray  # (L, S, S, 3) f32 linear color
    tex_layer: jnp.ndarray  # (T,) int32: which layer holds texture t
    # (T, 4) f32 [u_scale_px, v_scale_px, u_off_px, v_off_px]: texture t
    # occupies the pixel rect [off, off + scale] of its layer; sampling
    # maps wrapped model UVs into the rect, so bilinear taps never carry
    # weight outside it (shelf packing cannot bleed across neighbors)
    uv_rect: jnp.ndarray
    # (L*S*S, 16): per texel the 2x2 bilinear footprint [c00 c01 c10 c11]
    # rgb (edge-clamped), padded to an aligned 64-byte row. The fused frame
    # path samples with ONE contiguous row gather per pixel + an
    # elementwise bilinear mix — the same vector-memory-vs-scalar-memory
    # trade as the PCF neighborhood stack.
    bilin_rows: jnp.ndarray

    @property
    def size(self) -> int:
        return self.layers.shape[1]

    @property
    def num_textures(self) -> int:
        return self.tex_layer.shape[0]

    def wasted_fraction(self) -> float:
        """Fraction of allocated layer texels no texture occupies — the
        README "minimize waste" metric, exposed for tests/diagnostics."""
        import numpy as _np

        total = self.layers.shape[0] * self.size * self.size
        rect = _np.asarray(self.uv_rect)
        used = ((rect[:, 0] + 1.0) * (rect[:, 1] + 1.0)).sum()
        return float(1.0 - used / total)


class TextureAtlasBuilder:
    def __init__(self, layer_size: int = 256):
        self.size = layer_size
        self._imgs: list[np.ndarray] = []
        self._error_layers: dict = {}

    # the reference's six NAMED error colors, one per texture role
    # (helper_constructs.rs:2-12); each becomes a color/black checkerboard
    # layer shared across every material that fails that role. "emissive"
    # is this build's extra role beyond the reference's five (map_Ke) and
    # gets its own color (orange — not in the reference palette).
    ERROR_COLORS = {
        "diffuse": (0.0, 0.0, 1.0),
        "dissolve": (0.0, 1.0, 0.0),
        "normal": (0.0, 1.0, 1.0),
        "shininess": (1.0, 0.0, 0.0),
        "specular": (1.0, 0.0, 1.0),
        "storage": (1.0, 1.0, 0.0),
        "emissive": (1.0, 0.5, 0.0),
    }

    def error_texture(self, kind: str = "diffuse") -> int:
        """The loud checkerboard layer for missing or unloadable texture
        files of the given role — the reference's named error textures
        (render_system/helper_constructs.rs:2-12). One shared layer per
        role, created on first use."""
        color = self.ERROR_COLORS.get(kind, (1.0, 0.0, 1.0))
        if kind not in self._error_layers:
            self._error_layers[kind] = self.add_checkerboard(
                a=color, b=(0.0, 0.0, 0.0), cells=8)
        return self._error_layers[kind]

    def add_image_file(self, path: str, kind: str = "diffuse") -> int:
        """Load ``path`` into a layer; a missing or unreadable file returns
        the role's error texture (loudly, via warnings) instead of crashing
        the build — the reference falls back to its error textures the same
        way (helper_constructs.rs:2-12)."""
        try:
            return self.add_image(load_image(path))
        except (OSError, ValueError) as exc:
            import warnings

            warnings.warn(
                f"texture {path!r} failed to load ({exc}); using the "
                f"{kind!r} error texture", stacklevel=2)
            return self.error_texture(kind)

    def add_image(self, img: np.ndarray) -> int:
        """Register an (h, w, 3) float or uint8 image; returns the texture
        id. Larger images are downscaled by integer striding; placement
        into shared layers happens at finalize (shelf packing)."""
        img = np.asarray(img)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        s = self.size
        h, w = img.shape[:2]
        # integer downscale if needed
        sy = max(1, -(-h // s))
        sx = max(1, -(-w // s))
        img = np.ascontiguousarray(img[::sy, ::sx, :3].astype(np.float32))
        self._imgs.append(img)
        return len(self._imgs) - 1

    def add_checkerboard(self, a=(1, 1, 1), b=(0, 0, 0), cells=8) -> int:
        s = self.size
        yy, xx = np.mgrid[0:s, 0:s]
        mask = ((yy * cells // s) + (xx * cells // s)) % 2
        img = np.where(mask[..., None] > 0, np.asarray(b, np.float32),
                       np.asarray(a, np.float32))
        return self.add_image(img)

    def finalize(self) -> TextureAtlas | None:
        """Shelf-pack every registered image into shared (S, S) layers
        (first-fit decreasing by height) and build the sampling tables.
        The reference minimizes waste by choosing the least-wasteful
        texture array per image (texture_array.rs:224-256); packing
        sub-rects into shared layers wastes strictly less, and
        ``wasted_fraction()`` reports what remains."""
        if not self._imgs:
            return None
        s = self.size
        t = len(self._imgs)
        order = sorted(range(t), key=lambda i: -self._imgs[i].shape[0])
        layers: list[np.ndarray] = []
        shelves: list[list] = []  # per layer: [y, shelf_h, x_cursor] rows
        tex_layer = np.zeros(t, np.int32)
        uv_rect = np.zeros((t, 4), np.float32)
        for i in order:
            img = self._imgs[i]
            h, w = img.shape[:2]
            placed = None
            for li, rows in enumerate(shelves):
                for row in rows:
                    if row[1] >= h and row[2] + w <= s:
                        placed = (li, row[2], row[0])
                        row[2] += w
                        break
                if placed:
                    break
                y_next = rows[-1][0] + rows[-1][1]
                if y_next + h <= s:
                    rows.append([y_next, h, w])
                    placed = (li, 0, y_next)
                    break
            if placed is None:
                layers.append(np.zeros((s, s, 3), np.float32))
                shelves.append([[0, h, w]])
                placed = (len(layers) - 1, 0, 0)
            li, x, y = placed
            layers[li][y:y + h, x:x + w] = img
            tex_layer[i] = li
            uv_rect[i] = [w - 1, h - 1, x, y]
        stack = np.stack(layers)  # (L, S, S, 3)
        # 2x2 bilinear footprints via edge-clamped shifts (no gathers)
        length = stack.shape[0]
        right = stack[:, :, np.minimum(np.arange(s) + 1, s - 1)]
        down = stack[:, np.minimum(np.arange(s) + 1, s - 1)]
        downright = down[:, :, np.minimum(np.arange(s) + 1, s - 1)]
        rows = np.concatenate(
            [stack, right, down, downright,
             np.zeros(stack.shape[:3] + (4,), np.float32)],
            axis=-1,
        ).reshape(length * s * s, 16)
        return TextureAtlas(
            layers=jnp.asarray(stack),
            tex_layer=jnp.asarray(tex_layer),
            uv_rect=jnp.asarray(uv_rect),
            bilin_rows=jnp.asarray(rows),
        )


def sample_atlas(atlas: TextureAtlas, texture: jnp.ndarray,
                 uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample. ``texture``: (...,) int32 texture ids (clipped);
    ``uv``: (..., 2) in [0,1] model space (wrapped), mapped into the
    texture's packed layer rect."""
    s = atlas.size
    t = jnp.clip(texture, 0, atlas.num_textures - 1)
    lay = atlas.tex_layer[t]
    rect = atlas.uv_rect[t]  # (..., 4) [u_scale, v_scale, u_off, v_off]
    u = rect[..., 2] + jnp.mod(uv[..., 0], 1.0) * rect[..., 0]
    v = rect[..., 3] + (1.0 - jnp.mod(uv[..., 1], 1.0)) * rect[..., 1]
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, s - 1)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, s - 1)
    u1 = jnp.clip(u0 + 1, 0, s - 1)
    v1 = jnp.clip(v0 + 1, 0, s - 1)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    c00 = atlas.layers[lay, v0, u0]
    c01 = atlas.layers[lay, v0, u1]
    c10 = atlas.layers[lay, v1, u0]
    c11 = atlas.layers[lay, v1, u1]
    return (
        c00 * (1 - fu) * (1 - fv)
        + c01 * fu * (1 - fv)
        + c10 * (1 - fu) * fv
        + c11 * fu * fv
    )


# ---------------------------------------------------------------------------
# minimal image loading (the stb_image replacement): PPM (P6) and
# non-interlaced 8-bit RGB/RGBA PNG
# ---------------------------------------------------------------------------
def sample_atlas_rows(atlas: TextureAtlas, layer_f: jnp.ndarray,
                      uv: jnp.ndarray, uv_rect: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample via the precomputed 2x2-footprint rows — matches
    ``sample_atlas`` bit-for-bit (same coordinate math, same edge clamp)
    but costs ONE row gather per pixel. ``layer_f``: (...,) f32 ABSOLUTE
    layer ids (<0 = untextured, clipped); ``uv_rect``: (..., 4) per-pixel
    [u_scale, v_scale, u_off, v_off] in layer pixels (carried per triangle
    through the packed attribute table)."""
    s = atlas.size
    lay = jnp.clip(layer_f, 0.0, atlas.layers.shape[0] - 1.0)
    u = uv_rect[..., 2] + jnp.mod(uv[..., 0], 1.0) * uv_rect[..., 0]
    v = uv_rect[..., 3] + (1.0 - jnp.mod(uv[..., 1], 1.0)) * uv_rect[..., 1]
    u0 = jnp.clip(jnp.floor(u), 0.0, s - 1.0)
    v0 = jnp.clip(jnp.floor(v), 0.0, s - 1.0)
    flat = (lay * (s * s) + v0 * s + u0).astype(jnp.int32)
    r = atlas.bilin_rows[flat]  # (..., 16) one contiguous row gather
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    return (
        r[..., 0:3] * (1 - fu) * (1 - fv)
        + r[..., 3:6] * fu * (1 - fv)
        + r[..., 6:9] * (1 - fu) * fv
        + r[..., 9:12] * fu * fv
    )


def load_image(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"P6":
        return _load_ppm(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return _load_png(data)
    raise ValueError(f"unsupported image format: {path}")


def _load_ppm(data: bytes) -> np.ndarray:
    parts = []
    idx = 2
    while len(parts) < 3:
        while idx < len(data) and data[idx : idx + 1].isspace():
            idx += 1
        if data[idx : idx + 1] == b"#":
            while data[idx : idx + 1] != b"\n":
                idx += 1
            continue
        start = idx
        while not data[idx : idx + 1].isspace():
            idx += 1
        parts.append(int(data[start:idx]))
    idx += 1
    w, h, _maxv = parts
    return np.frombuffer(data, np.uint8, w * h * 3, idx).reshape(h, w, 3)


def _load_png(data: bytes) -> np.ndarray:
    import struct
    import zlib

    pos = 8
    idat = b""
    w = h = None
    bit_depth = color_type = None
    while pos < len(data):
        ln = struct.unpack(">I", data[pos : pos + 4])[0]
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
            if bit_depth != 8 or color_type not in (2, 6):
                raise ValueError("only 8-bit RGB/RGBA PNGs supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    ch = 3 if color_type == 2 else 4
    raw = zlib.decompress(idat)
    stride = w * ch
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1).copy()
        if ft == 0:
            pass
        elif ft == 1:
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ft == 2:
            line = (line.astype(np.int32) + prev) % 256
            line = line.astype(np.uint8)
        elif ft == 3:
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((int(a) + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pr = a if abs(p - a) <= min(abs(p - b), abs(p - c)) else (
                    b if abs(p - b) <= abs(p - c) else c)
                line[x] = (line[x] + pr) & 0xFF
        out[y] = line
        prev = out[y]
    img = out.reshape(h, w, ch)
    return img[..., :3]
