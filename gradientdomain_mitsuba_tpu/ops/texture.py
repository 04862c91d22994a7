"""Texture evaluation: bitmap (bilinear, wrap) + checkerboard.

TPU-native replacement for Mitsuba's texture plugins + mipmap machinery
(src/textures/{bitmap,checkerboard}.cpp, include/mitsuba/render/mipmap.h):
all bitmaps live in one padded stack [T, Hmax, Wmax, 3] in HBM; lookups are
gathers + bilinear weights (trilinear mipmapping is a later perf/quality
pass — renders are supersampled anyway).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

TEX_BITMAP = 0
TEX_CHECKERBOARD = 1


class TextureTable(NamedTuple):
    kind: np.ndarray       # [T] i32
    color0: np.ndarray     # [T, 3] checkerboard color0 / bitmap scale
    color1: np.ndarray     # [T, 3]
    uv_scale: np.ndarray   # [T, 2]
    uv_offset: np.ndarray  # [T, 2]
    image: np.ndarray      # [T, Hmax, Wmax, 3] (1x1 dummy rows allowed)
    img_size: np.ndarray   # [T, 2] (h, w) actual size


def empty_table() -> TextureTable:
    return TextureTable(
        kind=np.zeros(1, np.int32),
        color0=np.ones((1, 3), np.float32),
        color1=np.ones((1, 3), np.float32),
        uv_scale=np.ones((1, 2), np.float32),
        uv_offset=np.zeros((1, 2), np.float32),
        image=np.ones((1, 1, 1, 3), np.float32),
        img_size=np.ones((1, 2), np.int32))


def build_table(nodes, base_dir) -> TextureTable:
    """Texture plugin nodes -> stacked table (host side)."""
    import os
    from ..scene.ir import spectrum_value
    if not nodes:
        return empty_table()
    kinds, c0s, c1s, scales, offsets, images = [], [], [], [], [], []
    for node in nodes:
        us = float(node.get("uscale", 1.0))
        vs = float(node.get("vscale", 1.0))
        uo = float(node.get("uoffset", 0.0))
        vo = float(node.get("voffset", 0.0))
        scales.append((us, vs))
        offsets.append((uo, vo))
        if node.type == "checkerboard":
            kinds.append(TEX_CHECKERBOARD)
            c0s.append(spectrum_value(node.get("color0"), (0.4,) * 3))
            c1s.append(spectrum_value(node.get("color1"), (0.2,) * 3))
            images.append(np.ones((1, 1, 3), np.float32))
        elif node.type == "bitmap":
            kinds.append(TEX_BITMAP)
            c0s.append(np.ones(3, np.float32))  # scale
            c1s.append(np.zeros(3, np.float32))
            path = os.path.join(base_dir, node.get("filename"))
            if path.lower().endswith(".exr"):
                from ..utils import exr
                img = exr.read_rgb(path)
            else:
                from PIL import Image
                raw = np.asarray(Image.open(path).convert("RGB"),
                                 np.float32) / 255.0
                gamma = float(node.get("gamma", -1.0))
                if gamma == -1.0:
                    img = np.where(raw <= 0.04045, raw / 12.92,
                                   ((raw + 0.055) / 1.055) ** 2.4)
                else:
                    img = raw ** gamma
            images.append(img.astype(np.float32))
        else:
            # unsupported texture type: constant grey stand-in
            kinds.append(TEX_CHECKERBOARD)
            c0s.append(np.full(3, 0.5, np.float32))
            c1s.append(np.full(3, 0.5, np.float32))
            images.append(np.ones((1, 1, 3), np.float32))
    hmax = max(i.shape[0] for i in images)
    wmax = max(i.shape[1] for i in images)
    stack = np.zeros((len(images), hmax, wmax, 3), np.float32)
    sizes = np.zeros((len(images), 2), np.int32)
    for i, img in enumerate(images):
        stack[i, :img.shape[0], :img.shape[1]] = img
        sizes[i] = (img.shape[0], img.shape[1])
    return TextureTable(
        kind=np.asarray(kinds, np.int32),
        color0=np.stack(c0s).astype(np.float32),
        color1=np.stack(c1s).astype(np.float32),
        uv_scale=np.asarray(scales, np.float32),
        uv_offset=np.asarray(offsets, np.float32),
        image=stack, img_size=sizes)


def eval_texture(tex: TextureTable, tex_id, uv):
    """Evaluate textures for a batch: tex_id [N] (>=0), uv [N, 2]."""
    tid = jnp.maximum(tex_id, 0)
    scale = tex.uv_scale[tid]
    off = tex.uv_offset[tid]
    u = uv[..., 0] * scale[..., 0] + off[..., 0]
    v = uv[..., 1] * scale[..., 1] + off[..., 1]

    # checkerboard (Mitsuba: floor(u)+floor(v) parity over [0,1] cells)
    iu = jnp.floor(u * 2.0).astype(jnp.int32)
    iv = jnp.floor(v * 2.0).astype(jnp.int32)
    even = ((iu + iv) % 2) == 0
    checker = jnp.where(even[..., None], tex.color0[tid], tex.color1[tid])

    # bitmap: bilinear, wrap addressing; v flipped (uv origin bottom-left,
    # image row 0 at top — Mitsuba bitmap convention)
    h = tex.img_size[tid, 0].astype(jnp.float32)
    w = tex.img_size[tid, 1].astype(jnp.float32)
    x = (u % 1.0) * w - 0.5
    y = ((1.0 - v) % 1.0) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    hi = tex.img_size[tid, 0]
    wi_ = tex.img_size[tid, 1]
    x0i = jnp.mod(x0.astype(jnp.int32), wi_)
    x1i = jnp.mod(x0i + 1, wi_)
    y0i = jnp.mod(y0.astype(jnp.int32), hi)
    y1i = jnp.mod(y0i + 1, hi)
    c00 = tex.image[tid, y0i, x0i]
    c01 = tex.image[tid, y0i, x1i]
    c10 = tex.image[tid, y1i, x0i]
    c11 = tex.image[tid, y1i, x1i]
    bmp = (c00 * (1 - fx) * (1 - fy) + c01 * fx * (1 - fy) +
           c10 * (1 - fx) * fy + c11 * fx * fy) * tex.color0[tid]

    return jnp.where((tex.kind[tid] == TEX_CHECKERBOARD)[..., None],
                     checker, bmp)


def resolve_albedo(scene, mid, uv):
    """Material reflectance with texture override where bound."""
    row = scene.materials.packed[mid]
    refl = row[..., 2:5]
    tex_id = row[..., 20].astype(jnp.int32)
    has_tex = tex_id >= 0
    tex_val = eval_texture(scene.textures, tex_id, uv)
    return jnp.where(has_tex[..., None], tex_val, refl)
