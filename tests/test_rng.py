"""Statistical quality + determinism of the counter-based RNG."""
import jax.numpy as jnp
import numpy as np

from gradientdomain_mitsuba_tpu.core import rng


def test_determinism_and_replay():
    a = rng.uniform_float(1, 7, 3, 5)
    b = rng.uniform_float(1, 7, 3, 5)
    assert float(a) == float(b)
    # different counters -> different values
    assert float(rng.uniform_float(1, 7, 3, 6)) != float(a)
    assert float(rng.uniform_float(1, 8, 3, 5)) != float(a)
    assert float(rng.uniform_float(2, 7, 3, 5)) != float(a)


def test_range():
    n = 1 << 16
    u = rng.uniform_float(0, jnp.arange(n), 0, 0)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() < 1.0


def _chi2_uniform(u, bins=64):
    counts, _ = np.histogram(u, bins=bins, range=(0.0, 1.0))
    expected = len(u) / bins
    return np.sum((counts - expected) ** 2 / expected), bins - 1


def test_uniformity_over_pixels():
    """Varying pixel_id at fixed dim must be uniform."""
    n = 1 << 18
    u = np.asarray(rng.uniform_float(3, jnp.arange(n), 0, 2))
    chi2, dof = _chi2_uniform(u)
    # 99.9% quantile of chi2(63) ~ 103.4
    assert chi2 < 110.0, chi2


def test_uniformity_over_dims():
    n = 1 << 18
    u = np.asarray(rng.uniform_float(3, 11, 0, jnp.arange(n)))
    chi2, dof = _chi2_uniform(u)
    assert chi2 < 110.0, chi2


def test_no_correlation_neighbor_pixels():
    """Adjacent pixel ids must be decorrelated (critical: shift mapping uses
    neighboring pixels with the same sample index)."""
    n = 1 << 16
    u0 = np.asarray(rng.uniform_float(3, jnp.arange(n) * 2, 5, 9))
    u1 = np.asarray(rng.uniform_float(3, jnp.arange(n) * 2 + 1, 5, 9))
    corr = np.corrcoef(u0, u1)[0, 1]
    assert abs(corr) < 0.02, corr


def test_2d_stratification_free():
    """Mean/var of uniform pairs."""
    n = 1 << 16
    uv = np.asarray(rng.uniform_2d(0, jnp.arange(n), 1, 4))
    assert abs(uv.mean() - 0.5) < 0.01
    assert abs(uv.var() - 1.0 / 12.0) < 0.005


def test_sobol02_elementary_intervals():
    """(0,2)-sequence property: for spp=16, each pixel's 16 scrambled
    points hit every base-2 elementary interval of area 1/16 exactly
    once (XOR scrambling preserves this)."""
    import numpy as np
    from gradientdomain_mitsuba_tpu.core import rng
    spp = 16
    for pix in (0, 7, 12345):
        pts = np.asarray(rng.sobol02_2d(3, pix, np.arange(spp), 40, spp))
        for (nx, ny) in [(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)]:
            cx = np.floor(pts[:, 0] * nx).astype(int)
            cy = np.floor(pts[:, 1] * ny).astype(int)
            cells = cx * ny + cy
            assert sorted(cells) == list(range(spp)), (nx, ny, pix)


def test_sobol02_decorrelated_across_pixels_and_dims():
    import numpy as np
    from gradientdomain_mitsuba_tpu.core import rng
    a = np.asarray(rng.sobol02_2d(3, 0, np.arange(64), 8, 64))
    b = np.asarray(rng.sobol02_2d(3, 1, np.arange(64), 8, 64))
    c = np.asarray(rng.sobol02_2d(3, 0, np.arange(64), 10, 64))
    assert not np.allclose(a, b) and not np.allclose(a, c)
    # mean of a low-discrepancy set is very close to 1/2
    assert abs(a.mean() - 0.5) < 0.02


def test_make_sampler_ld_selects_sobol():
    import numpy as np
    from gradientdomain_mitsuba_tpu.core import rng
    u1, u2 = rng.make_sampler("ldsampler", 16)
    pts = np.asarray(u2(3, 5, np.arange(16), 40))
    cx = np.floor(pts[:, 0] * 4).astype(int)
    cy = np.floor(pts[:, 1] * 4).astype(int)
    assert sorted(cx * 4 + cy) == list(range(16))
    v = np.asarray(u1(3, 5, np.arange(16), 0))
    assert sorted(np.floor(v * 16).astype(int)) == list(range(16))


class TestHalton:
    def test_range_and_mean(self):
        import jax.numpy as jnp
        from gradientdomain_mitsuba_tpu.core.rng import halton_float
        pix = jnp.zeros(1, jnp.uint32)
        us = np.array([
            float(halton_float(0, pix, jnp.uint32(i), 3)[0])
            for i in range(128)])
        assert (us >= 0).all() and (us < 1).all()
        assert abs(us.mean() - 0.5) < 0.05

    def test_base2_is_van_der_corput(self):
        """dim % 64 == 0 -> base 2: the first 2^k samples (mod the
        rotation) hit every 1/2^k stratum exactly once."""
        import jax.numpy as jnp
        from gradientdomain_mitsuba_tpu.core.rng import halton_float
        pix = jnp.zeros(1, jnp.uint32)
        us = np.array([
            float(halton_float(7, pix, jnp.uint32(i), 0)[0])
            for i in range(16)])
        strata = np.sort((us * 16).astype(int))
        np.testing.assert_array_equal(strata, np.arange(16))

    def test_2d_low_discrepancy(self):
        """16 (2,3)-Halton points in a 4x4 grid: no bin holds > 3."""
        import jax.numpy as jnp
        from gradientdomain_mitsuba_tpu.core.rng import halton_2d
        pix = jnp.zeros(1, jnp.uint32)
        pts = np.array([
            np.asarray(halton_2d(1, pix, jnp.uint32(i), 0))[0]
            for i in range(16)])
        binned = (pts * 4).astype(int)
        counts = np.zeros((4, 4), int)
        for b in binned:
            counts[b[0], b[1]] += 1
        assert counts.max() <= 3, counts

    def test_pixel_decorrelation(self):
        import jax.numpy as jnp
        from gradientdomain_mitsuba_tpu.core.rng import halton_float
        pix = jnp.arange(1000, dtype=jnp.uint32)
        u = np.asarray(halton_float(0, pix, jnp.uint32(5), 9))
        # same sample index, many pixels: rotations spread uniformly
        assert abs(u.mean() - 0.5) < 0.05
        assert u.std() > 0.2

    def test_sampler_registry(self):
        from gradientdomain_mitsuba_tpu.core.rng import (
            halton_2d, halton_float, make_sampler)
        u1, u2 = make_sampler("halton", 16)
        assert u1 is halton_float and u2 is halton_2d
        u1, u2 = make_sampler("hammersley", 16)
        assert u1 is halton_float
