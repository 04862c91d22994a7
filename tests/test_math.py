import jax.numpy as jnp
import numpy as np

from gradientdomain_mitsuba_tpu.core import math as m


def test_build_frame_orthonormal():
    rs = np.random.RandomState(0)
    n = rs.normal(size=(1000, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.asarray(n, jnp.float32)
    s, t = m.build_frame(n)
    assert np.allclose(np.asarray(m.dot(s, t)), 0, atol=1e-5)
    assert np.allclose(np.asarray(m.dot(s, n)), 0, atol=1e-5)
    assert np.allclose(np.asarray(m.dot(t, n)), 0, atol=1e-5)
    assert np.allclose(np.asarray(m.length(s)), 1, atol=1e-5)
    # right-handed: cross(s, t) == n
    assert np.allclose(np.asarray(m.cross(s, t)), np.asarray(n), atol=1e-5)


def test_local_world_roundtrip():
    rs = np.random.RandomState(1)
    n = rs.normal(size=(100, 3)); n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = rs.normal(size=(100, 3)); v /= np.linalg.norm(v, axis=-1, keepdims=True)
    n = jnp.asarray(n, jnp.float32); v = jnp.asarray(v, jnp.float32)
    s, t = m.build_frame(n)
    lv = m.to_local(v, s, t, n)
    wv = m.to_world(lv, s, t, n)
    assert np.allclose(np.asarray(wv), np.asarray(v), atol=1e-5)


def test_lookat_matches_mitsuba_convention():
    mat = m.np_look_at([0, 0, 0], [0, 0, 1], [0, 1, 0])
    # +z forward, +y up; "left" = cross(up, dir) = (-1? ...) check handedness:
    d = mat[:3, 2]
    assert np.allclose(d, [0, 0, 1])
    up = mat[:3, 1]
    assert np.allclose(up, [0, 1, 0])


def test_transform_point_vector():
    mat = m.np_translate([1, 2, 3]) @ m.np_scale([2, 2, 2])
    p = jnp.array([[1.0, 0.0, 0.0]])
    tp = m.transform_point(jnp.asarray(mat, jnp.float32), p)
    assert np.allclose(np.asarray(tp), [[3, 2, 3]], atol=1e-5)
    tv = m.transform_vector(jnp.asarray(mat, jnp.float32), p)
    assert np.allclose(np.asarray(tv), [[2, 0, 0]], atol=1e-5)


def test_reflect_refract_local():
    wi = jnp.array([[0.3, 0.4, np.sqrt(1 - 0.25)]], jnp.float32)
    r = m.reflect_local(wi)
    assert np.allclose(np.asarray(r), [[-0.3, -0.4, float(wi[0, 2])]], atol=1e-6)
