"""Sensor (camera) sampling: perspective + thinlens.

TPU-native replacement for PerspectiveCamera::sampleRayDifferential and
ThinLens (src/sensors/{perspective,thinlens}.cpp).  Positions are in
CONTINUOUS film coordinates (pixels); matrices follow Mitsuba's
cameraToSample convention (built in scene/scene.py _build_sensor).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core import warp


def sample_ray(camera, width, height, pos_film, u_aperture):
    """Generate camera rays.

    pos_film: [N, 2] continuous film position in pixels.
    u_aperture: [N, 2] lens samples (ignored when aperture_radius == 0).
    Returns (o_world [N,3], d_world [N,3]).
    """
    s = jnp.stack([pos_film[..., 0] / width, pos_film[..., 1] / height],
                  axis=-1)
    near = m.transform_point(
        camera.sample_to_camera,
        jnp.concatenate([s, jnp.zeros(s.shape[:-1] + (1,))], axis=-1))
    d_cam = m.normalize(near)
    o_cam = jnp.zeros_like(d_cam)

    # thinlens: offset origin on the aperture disk, refocus through the
    # focal plane (thinlens.cpp sampleRay)
    aperture = camera.aperture_radius
    lens = warp.square_to_uniform_disk_concentric(u_aperture) * aperture
    o_lens = jnp.stack(
        [lens[..., 0], lens[..., 1], jnp.zeros_like(lens[..., 0])], axis=-1)
    t_focus = camera.focus_distance / jnp.maximum(d_cam[..., 2:3], 1e-9)
    p_focus = d_cam * t_focus
    d_lens = m.normalize(p_focus - o_lens)
    use_lens = aperture > 0.0
    o_cam = jnp.where(use_lens, o_lens, o_cam)
    d_cam = jnp.where(use_lens, d_lens, d_cam)

    # orthographic (src/sensors/orthographic.cpp): origin on the film
    # plane, direction along +z; world extent comes from toWorld scale
    is_ortho = camera.ortho > 0.0
    o_ortho = jnp.concatenate(
        [near[..., 0:2], jnp.zeros_like(near[..., 2:3])], axis=-1)
    d_ortho = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), d_cam.shape)
    o_cam = jnp.where(is_ortho, o_ortho, o_cam)
    d_cam = jnp.where(is_ortho, d_ortho, d_cam)

    o_w = m.transform_point(camera.to_world, o_cam)
    d_w = m.normalize(m.transform_vector(camera.to_world, d_cam))
    return o_w, d_w


def importance_sample_direct(camera, width, height, p_world):
    """Project a world point to the film and compute sensor importance —
    needed by BDPT's t=1 (light tracing) connections
    (perspective.cpp sampleDirect/evalDirection semantics).

    Returns (film_pos [N,2] pixels, importance_weight [N] = W_e/pdf terms
    folded: We * G-to-directional conversion, valid [N]).
    """
    p_cam = m.transform_point(camera.world_to_camera, p_world)
    z = p_cam[..., 2]
    s = m.transform_point(camera.camera_to_sample, p_cam)
    in_frustum = ((z > 1e-6) & (s[..., 0] >= 0) & (s[..., 0] < 1) &
                  (s[..., 1] >= 0) & (s[..., 1] < 1))
    film = jnp.stack([s[..., 0] * width, s[..., 1] * height], axis=-1)

    # importance: We(p) = 1 / (A_image * cos^4 theta) in directional measure;
    # the connection kernel multiplies by the geometry term itself.
    d_cam = m.normalize(p_cam)
    cos_theta = d_cam[..., 2]
    # image-plane area at z=1 in camera space:
    x0 = m.transform_point(camera.sample_to_camera,
                           jnp.array([0.0, 0.0, 0.0]))
    x1 = m.transform_point(camera.sample_to_camera,
                           jnp.array([1.0, 1.0, 0.0]))
    x0 = x0 / x0[..., 2:3]
    x1 = x1 / x1[..., 2:3]
    image_area = jnp.abs((x1[..., 0] - x0[..., 0]) *
                         (x1[..., 1] - x0[..., 1]))
    we = 1.0 / jnp.maximum(image_area * cos_theta ** 4, 1e-12)
    # orthographic: parallel projection, constant importance per area
    x0o = m.transform_point(camera.sample_to_camera,
                            jnp.array([0.0, 0.0, 0.0]))
    x1o = m.transform_point(camera.sample_to_camera,
                            jnp.array([1.0, 1.0, 0.0]))
    area_o = jnp.abs((x1o[..., 0] - x0o[..., 0]) *
                     (x1o[..., 1] - x0o[..., 1]))
    we = jnp.where(camera.ortho > 0.0,
                   1.0 / jnp.maximum(area_o, 1e-12), we)
    return film, jnp.where(in_frustum, we, 0.0), in_frustum
