"""BVH traversal vs brute-force ground truth (reference analog:
test_kdtree.cpp — kd-tree vs linear scan)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradientdomain_mitsuba_tpu.ops import intersect as isec
from gradientdomain_mitsuba_tpu.scene import bvh as bvh_mod
from gradientdomain_mitsuba_tpu.ops.intersect import BVHArrays, TriSoup


def _random_soup(n_tris, seed=0, spread=10.0):
    rs = np.random.RandomState(seed)
    base = rs.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    v0 = base
    v1 = base + rs.normal(0, 1.0, (n_tris, 3)).astype(np.float32)
    v2 = base + rs.normal(0, 1.0, (n_tris, 3)).astype(np.float32)
    return v0, v1, v2


def _build(v0, v1, v2):
    tree = bvh_mod.build(v0, v1, v2)
    o = tree.prim_order
    tris = TriSoup(v0=jnp.asarray(v0[o]), e1=jnp.asarray((v1 - v0)[o]),
                   e2=jnp.asarray((v2 - v0)[o]),
                   orig_id=jnp.asarray(o, jnp.int32))
    arr = BVHArrays(
        child0_min=jnp.asarray(tree.child0_min),
        child0_max=jnp.asarray(tree.child0_max),
        child1_min=jnp.asarray(tree.child1_min),
        child1_max=jnp.asarray(tree.child1_max),
        child0=jnp.asarray(tree.child0), child1=jnp.asarray(tree.child1))
    return tris, arr, tree


def _random_rays(n, seed=1, spread=12.0):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("n_tris", [7, 200, 3000])
def test_bvh_matches_brute(n_tris):
    v0, v1, v2 = _random_soup(n_tris)
    tris, arr, tree = _build(v0, v1, v2)
    o, d = _random_rays(512)
    mint = jnp.zeros(512)
    maxt = jnp.full(512, 1e30)

    brute = isec.intersect_brute(o, d, mint, maxt, tris)
    f = jax.jit(isec.make_bvh_intersector(2 * tree.depth + 4))
    hit = f(o, d, mint, maxt, tris, arr)

    np.testing.assert_array_equal(np.asarray(hit.valid), np.asarray(brute.valid))
    m = np.asarray(brute.valid)
    np.testing.assert_allclose(
        np.asarray(hit.t)[m], np.asarray(brute.t)[m], rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(hit.prim)[m], np.asarray(brute.prim)[m])


def test_bvh_occluder_matches():
    v0, v1, v2 = _random_soup(500, seed=3)
    tris, arr, tree = _build(v0, v1, v2)
    o, d = _random_rays(512, seed=4)
    mint = jnp.zeros(512)
    maxt = jnp.full(512, 8.0)  # finite shadow-ray length
    brute = isec.occluded_brute(o, d, mint, maxt, tris)
    f = jax.jit(isec.make_bvh_occluder(2 * tree.depth + 4))
    occ = f(o, d, mint, maxt, tris, arr)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(brute))


def test_maxt_respected():
    v0 = np.array([[0, -1, -1]], np.float32)
    v1 = np.array([[0, 3, -1]], np.float32)
    v2 = np.array([[0, -1, 3]], np.float32)
    tris, arr, tree = _build(v0, v1, v2)
    o = jnp.array([[-2.0, 0, 0], [-2.0, 0, 0]])
    d = jnp.array([[1.0, 0, 0], [1.0, 0, 0]])
    f = isec.make_bvh_intersector(8)
    hit = f(o, d, jnp.zeros(2), jnp.array([1.0, 5.0]), tris, arr)
    assert not bool(hit.valid[0])  # tri at t=2 beyond maxt=1
    assert bool(hit.valid[1]) and abs(float(hit.t[1]) - 2.0) < 1e-5


def test_native_builder_matches_brute():
    """The C++ binned-SAH builder (native/bvh_builder.cpp) must produce a
    BVH whose traversal results equal brute force, like the numpy one."""
    v0, v1, v2 = _random_soup(3000, seed=11)
    tree = bvh_mod.build(v0, v1, v2, use_native=True)
    o = tree.prim_order
    tris = TriSoup(v0=jnp.asarray(v0[o]), e1=jnp.asarray((v1 - v0)[o]),
                   e2=jnp.asarray((v2 - v0)[o]),
                   orig_id=jnp.asarray(o, jnp.int32))
    arr = BVHArrays(
        child0_min=jnp.asarray(tree.child0_min),
        child0_max=jnp.asarray(tree.child0_max),
        child1_min=jnp.asarray(tree.child1_min),
        child1_max=jnp.asarray(tree.child1_max),
        child0=jnp.asarray(tree.child0), child1=jnp.asarray(tree.child1))
    o_r, d_r = _random_rays(512, seed=12)
    mint = jnp.zeros(512)
    maxt = jnp.full(512, 1e30)
    brute = isec.intersect_brute(o_r, d_r, mint, maxt, tris)
    f = jax.jit(isec.make_bvh_intersector(2 * tree.depth + 4))
    hit = f(o_r, d_r, mint, maxt, tris, arr)
    np.testing.assert_array_equal(np.asarray(hit.valid),
                                  np.asarray(brute.valid))
    m = np.asarray(brute.valid)
    np.testing.assert_allclose(np.asarray(hit.t)[m],
                               np.asarray(brute.t)[m], rtol=1e-5)
