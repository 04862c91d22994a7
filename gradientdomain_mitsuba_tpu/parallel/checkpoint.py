"""Checkpoint / resume for long renders.

The reference has no true checkpointing — `mitsuba -r <sec>` merely flushes
partial films (src/mitsuba/mitsuba.cpp); a crash restarts from zero.  Here
the counter-based RNG makes checkpointing EXACT: the accumulated raw
buffers + the next sample index fully determine the remaining work, and a
resumed render is bit-identical to an uninterrupted one (SURVEY.md §6.4).
Checkpoints are .npz files keyed by (seed, resolution, integrator).
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np


def _flatten(state: dict):
    return {k: np.asarray(v) for k, v in state.items()}


def save(path: str, state: dict, done: int, seed: int, meta: dict):
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp, __done=done, __seed=seed,
        **{f"m_{k}": v for k, v in meta.items()},
        **{f"b_{k}": v for k, v in _flatten(state).items()})
    os.replace(tmp, path)


def load(path: str):
    """Returns (state dict, done, seed, meta) or None if absent."""
    if not os.path.exists(path):
        return None
    z = np.load(path, allow_pickle=False)
    state = {k[2:]: z[k] for k in z.files if k.startswith("b_")}
    meta = {k[2:]: z[k] for k in z.files if k.startswith("m_")}
    return state, int(z["__done"]), int(z["__seed"]), meta


def render_accumulate(tracer, scene, seed: int, spp: int, chunk: int = 64,
                      checkpoint_path: Optional[str] = None,
                      resume: bool = False, log=None, progress=None):
    """Drive tracer.render_chunk with optional checkpointing.

    The tracer must expose render_chunk(scene, seed, start, n) -> pytree of
    accumulation buffers (raw sums).  Returns (state dict, spp).
    """
    import jax

    # one upfront device transfer — otherwise every chunk dispatch
    # re-uploads the whole (numpy) scene pytree through the jit boundary
    scene = jax.device_put(scene)

    state = None
    done = 0
    if resume and checkpoint_path:
        ck = load(checkpoint_path)
        if ck is not None:
            state, done, ck_seed, meta = ck
            if ck_seed != seed:
                raise ValueError(
                    f"checkpoint seed {ck_seed} != requested {seed}")
            if log:
                log(f"[checkpoint] resumed at sample {done}/{spp}")
    while done < spp:
        n = min(chunk, spp - done)
        out = tracer.render_chunk(scene, seed, done, n)
        if isinstance(out, dict):
            out_np = {k: np.asarray(v) for k, v in out.items()}
        else:
            out_np = {str(i): np.asarray(v)
                      for i, v in enumerate(jax.tree.leaves(out))}
        state = out_np if state is None else \
            {k: state[k] + out_np[k] for k in out_np}
        done += n
        if progress:
            progress(state, done)
        if checkpoint_path:
            save(checkpoint_path, state, done, seed,
                 {"spp": spp, "time": time.time()})
    return state, spp
