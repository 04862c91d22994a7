"""Scene-level intersection wrappers: traversal + hit-record fill.

TPU-native replacement for Scene::rayIntersect + Shape::fillIntersectionRecord
(src/librender/scene.cpp, shape.cpp, trimesh.cpp): traversal returns
(t, u, v, prim); this module gathers vertex attributes and material/emitter
ids into the flat Intersection record used by every integrator.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.records import Intersection
from . import intersect as isec


BRUTE_FORCE_MAX_TRIS = 2048


def choose_intersector(settings, n_tris: int):
    """Brute force beats the stack machine for small scenes (the whole tri
    soup vectorizes on the VPU with zero divergence); BVH beyond that."""
    if n_tris <= BRUTE_FORCE_MAX_TRIS:
        chunk = min(1024, max(64, n_tris))

        def closest(o, d, mint, maxt, tris, bvharr):
            return isec.intersect_brute(o, d, mint, maxt, tris, chunk=chunk)

        def occl(o, d, mint, maxt, tris, bvharr):
            return isec.occluded_brute(o, d, mint, maxt, tris, chunk=chunk)
        return closest, occl
    return (isec.make_bvh_intersector(settings.stack_depth),
            isec.make_bvh_occluder(settings.stack_depth))


def fill_intersection(scene, o, d, hit) -> Intersection:
    """Gather shading data for Hit records (invalid lanes get safe zeros)."""
    g = scene.geom
    prim = jnp.maximum(hit.prim, 0)
    idx = g.indices[prim]
    p0 = g.positions[idx[..., 0]]
    p1 = g.positions[idx[..., 1]]
    p2 = g.positions[idx[..., 2]]
    n0 = g.normals[idx[..., 0]]
    n1 = g.normals[idx[..., 1]]
    n2 = g.normals[idx[..., 2]]
    t0 = g.uvs[idx[..., 0]]
    t1 = g.uvs[idx[..., 1]]
    t2 = g.uvs[idx[..., 2]]

    u = hit.u[..., None]
    v = hit.v[..., None]
    p = p0 * (1 - u - v) + p1 * u + p2 * v
    ng = m.normalize(jnp.cross(p1 - p0, p2 - p0))

    shape = g.tri_shape[prim]
    use_face_n = g.shape_use_face_normals[shape]
    ns = m.normalize(n0 * (1 - u - v) + n1 * u + n2 * v)
    # degenerate shading normals fall back to geometric
    ns_ok = m.squared_length(ns) > 0.5
    ns = jnp.where((use_face_n | ~ns_ok)[..., None], ng, ns)
    uv = t0 * (1 - u - v) + t1 * u + t2 * v

    return Intersection(
        valid=hit.valid,
        t=hit.t,
        p=p,
        ng=ng,
        ns=ns,
        uv=uv,
        prim_id=jnp.where(hit.valid, hit.prim, -1),
        shape_id=jnp.where(hit.valid, shape, -1),
        bsdf_id=jnp.where(hit.valid, g.shape_bsdf[shape], -1),
        emitter_id=jnp.where(hit.valid, g.shape_emitter[shape], -1),
    )


def material_params(scene, has_textures: bool, bsdf_id, uv):
    """Gather BSDF params, resolving reflectance textures when present
    (has_textures is STATIC so untextured scenes skip the gathers)."""
    from . import bsdf as bsdf_ops
    mid = jnp.maximum(bsdf_id, 0)
    if has_textures:
        from .texture import resolve_albedo
        return bsdf_ops.gather_params(scene.materials, mid,
                                      albedo_override=resolve_albedo(
                                          scene, mid, uv))
    return bsdf_ops.gather_params(scene.materials, mid)


def offset_ray_origin(p, ng, d, eps):
    """Spawn-point offset along the geometric normal, signed toward the ray
    direction (replaces Mitsuba's Epsilon-scaled mint handling)."""
    sign = jnp.sign(m.dot(ng, d, keepdims=True))
    return p + ng * sign * eps
