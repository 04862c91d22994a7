"""Film accumulation: reconstruction-filtered scatter-add splatting.

TPU-native replacement for ImageBlock::put + Film::put
(src/librender/imageblock.cpp, film.cpp, src/rfilters/*.cpp).  Instead of
per-tile bordered blocks merged under a mutex, samples scatter-add into
full-resolution framebuffers with a weight channel; XLA lowers .at[].add to
a single fused scatter.  Gradient buffers always use box filtering (the
gradients live on the pixel lattice — gpt_wr.cpp semantics).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

FILTERS = {"box": 0, "tent": 1, "gaussian": 2, "mitchell": 3,
           "catmullrom": 4, "lanczos": 5}
# filter radius in pixels (Mitsuba defaults)
RADII = {0: 0.5, 1: 1.0, 2: 2.0, 3: 2.0, 4: 2.0, 5: 3.0}


def filter_weight(kind: int, x):
    """1D filter weight at offset x (pixels)."""
    ax = jnp.abs(x)
    if kind == 0:      # box
        return jnp.where(ax <= 0.5, 1.0, 0.0)
    if kind == 1:      # tent
        return jnp.maximum(0.0, 1.0 - ax)
    if kind == 2:      # gaussian, stddev 0.5, radius 2 (gaussian.cpp)
        sigma = 0.5
        a = jnp.exp(-0.5 * (x / sigma) ** 2)
        b = float(np.exp(-0.5 * (2.0 / sigma) ** 2))
        return jnp.maximum(0.0, a - b)
    if kind in (3, 4):  # mitchell-netravali (B,C) / catmull-rom
        B, C = (1 / 3, 1 / 3) if kind == 3 else (0.0, 0.5)
        ax2, ax3 = ax * ax, ax * ax * ax
        w1 = ((12 - 9 * B - 6 * C) * ax3 + (-18 + 12 * B + 6 * C) * ax2 +
              (6 - 2 * B)) / 6
        w2 = ((-B - 6 * C) * ax3 + (6 * B + 30 * C) * ax2 +
              (-12 * B - 48 * C) * ax + (8 * B + 24 * C)) / 6
        return jnp.where(ax < 1, w1, jnp.where(ax < 2, w2, 0.0))
    if kind == 5:      # lanczos sinc, 3 lobes
        def sinc(v):
            v = jnp.abs(v) * jnp.pi
            return jnp.where(v < 1e-5, 1.0, jnp.sin(v) / v)
        return jnp.where(ax < 3.0, sinc(ax) * sinc(ax / 3.0), 0.0)
    raise ValueError(kind)


def splat(fb, wb, pos, value, filter_kind: int):
    """Scatter-add filtered samples.

    fb: [H, W, C] framebuffer; wb: [H, W] weight accumulator;
    pos: [N, 2] continuous film position; value: [N, C].
    Returns updated (fb, wb).  Footprint is static per filter kind.
    """
    H, W = fb.shape[0], fb.shape[1]
    radius = RADII[filter_kind]
    n_taps = max(1, int(np.ceil(2 * radius)))
    x, y = pos[..., 0], pos[..., 1]
    # leftmost pixel whose center is inside the filter support
    x0 = jnp.floor(x - radius + 0.5).astype(jnp.int32)
    y0 = jnp.floor(y - radius + 0.5).astype(jnp.int32)
    for dy in range(n_taps):
        py = y0 + dy
        wy = filter_weight(filter_kind, py.astype(jnp.float32) + 0.5 - y)
        for dx in range(n_taps):
            px = x0 + dx
            wx = filter_weight(filter_kind, px.astype(jnp.float32) + 0.5 - x)
            w = wx * wy
            inside = (px >= 0) & (px < W) & (py >= 0) & (py < H)
            w = jnp.where(inside, w, 0.0)
            pxc = jnp.clip(px, 0, W - 1)
            pyc = jnp.clip(py, 0, H - 1)
            fb = fb.at[pyc, pxc].add(value * w[..., None])
            wb = wb.at[pyc, pxc].add(w)
    return fb, wb


def splat_unfiltered(fb, pos, value):
    """Raw box splat WITHOUT weight tracking — for gradient/light-image
    buffers where each sample belongs to exactly one lattice cell and
    normalization is by sample count."""
    H, W = fb.shape[0], fb.shape[1]
    px = jnp.clip(pos[..., 0].astype(jnp.int32), 0, W - 1)
    py = jnp.clip(pos[..., 1].astype(jnp.int32), 0, H - 1)
    inside = ((pos[..., 0] >= 0) & (pos[..., 0] < W) &
              (pos[..., 1] >= 0) & (pos[..., 1] < H))
    return fb.at[py, px].add(value * inside[..., None])


def develop(fb, wb):
    """Normalize by accumulated filter weights (Film::develop)."""
    return fb / jnp.maximum(wb, 1e-12)[..., None]
