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
