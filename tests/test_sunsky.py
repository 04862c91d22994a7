"""Preetham sun/sky/sunsky bake (scene/sunsky.py vs src/emitters/
{sun,sky,sunsky}.cpp): model properties that hold regardless of the
exact spectral pipeline, plus end-to-end rendering through the shared
envmap machinery."""
import os
import tempfile

import numpy as np

from gradientdomain_mitsuba_tpu.scene import sunsky


SUN_DIR = np.array([0.3, 0.75, 0.2])
SUN_DIR = SUN_DIR / np.linalg.norm(SUN_DIR)


def test_solar_direction_passthrough():
    d = sunsky.solar_direction({"sunDirection": (2.0, 2.0, 1.0)})
    np.testing.assert_allclose(d, np.array([2, 2, 1]) / 3.0, atol=1e-12)


def test_solar_direction_from_time():
    """Defaults (Tokyo, 2010-07-10 15:00 JST): sun up and west of south."""
    d = sunsky.solar_direction({})
    assert abs(np.linalg.norm(d) - 1) < 1e-9
    assert d[1] > 0.3, d  # well above the horizon mid-afternoon in July


def test_sky_grid_basic_properties():
    env = sunsky.sky_radiance_grid(64, 3.0, SUN_DIR)
    assert env.shape == (64, 128, 3)
    assert np.isfinite(env).all()
    assert (env >= 0).all()
    lum = env @ np.array([0.2126, 0.7152, 0.0722])
    # circumsolar brightening: texel nearest the sun beats the texel 90
    # degrees away at the same zenith angle
    tt = (np.arange(64) + 0.5) / 64 * np.pi
    pp = (np.arange(128) + 0.5) / 128 * 2 * np.pi
    TT, PP = np.meshgrid(tt, pp, indexing="ij")
    d = np.stack([np.sin(TT) * np.cos(PP), np.cos(TT),
                  np.sin(TT) * np.sin(PP)], -1)
    cg = d @ SUN_DIR
    near = lum[cg > 0.995].mean()
    far = lum[(np.abs(cg) < 0.1) & (TT < np.pi / 2)].mean()
    assert near > 2 * far, (near, far)
    # plausible daytime sky magnitude in W/(sr m^2): zenith luminance
    # O(1e4 cd/m^2) -> O(10) radiance
    assert 0.1 < lum[cg > 0.995].max() < 1e4


def test_turbidity_monotonic():
    """Preetham model behavior vs turbidity (A_Y = 0.1787T - 1.463 rises
    with T): the away-from-sun horizon DIMS relative to the zenith, and
    the zenith itself brightens (Y_z grows with T).  Measured away from
    the sun (azimuth ~180 deg) to avoid the circumsolar glow confound."""
    sun = np.array([0.95, 0.3, 0.0])
    sun = sun / np.linalg.norm(sun)
    lum_w = np.array([0.2126, 0.7152, 0.0722])

    def stats(T):
        lum = sunsky.sky_radiance_grid(32, T, sun) @ lum_w
        zen = lum[0:2, :].mean()
        hor_away = lum[14:16, 28:36].mean()
        return zen, hor_away / zen
    zen_lo, r_lo = stats(2.0)
    zen_hi, r_hi = stats(8.0)
    assert r_hi < r_lo, (r_hi, r_lo)
    assert zen_hi > zen_lo, (zen_hi, zen_lo)


def test_sun_disk_energy_conserving():
    """Painted disk power == L*Omega independent of grid resolution."""
    L, omega = sunsky.sun_direct_radiance(3.0, np.arccos(SUN_DIR[1]))
    for H in (32, 128):
        env = sunsky.add_sun_disk(np.zeros((H, 2 * H, 3), np.float32),
                                  SUN_DIR, 3.0)
        tt = (np.arange(H) + 0.5) / H * np.pi
        texel_sa = (2 * np.pi / (2 * H)) * (np.pi / H) * np.sin(tt)
        power = (env * texel_sa[:, None, None]).sum(axis=(0, 1))
        np.testing.assert_allclose(power, L * omega, rtol=1e-4)


def test_sunsky_bake_has_disk_over_sky():
    sky = sunsky.bake("sky", {"sunDirection": tuple(SUN_DIR)})
    both = sunsky.bake("sunsky", {"sunDirection": tuple(SUN_DIR)})
    assert both.max() > 50 * sky.max()
    # away from the disk the two agree exactly
    diff = np.abs(both - sky)
    assert (diff > 0).mean() < 0.001


def test_sunsky_scene_renders():
    xml = """<scene version="0.5.0">
      <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="60"/>
        <transform name="toWorld">
          <lookat origin="0 1 -4" target="0 1 4" up="0 1 0"/>
        </transform>
        <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="24"/><integer name="height" value="24"/>
          <rfilter type="box"/>
        </film>
      </sensor>
      <emitter type="sunsky">
        <vector name="sunDirection" x="0.3" y="0.75" z="0.2"/>
        <integer name="resolution" value="128"/>
      </emitter>
      <shape type="rectangle">
        <transform name="toWorld">
          <rotate x="1" angle="-90"/><scale value="10"/>
        </transform>
        <bsdf type="diffuse"><rgb name="reflectance" value="0.5 0.5 0.5"/></bsdf>
      </shape>
    </scene>"""
    from gradientdomain_mitsuba_tpu.scene import scene as sc
    from gradientdomain_mitsuba_tpu.models.path import PathTracer
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.xml")
        with open(p, "w") as f:
            f.write(xml)
        scene, st = sc.load_scene(p)
    img = PathTracer(scene, st).render(scene, seed=0, spp=8)
    assert np.isfinite(img).all()
    # upper half sees the sky directly, lower half the sunlit floor;
    # both must be lit
    assert img[:8].mean() > 0.5     # sky region
    assert img[16:].mean() > 0.05   # floor lit by sun+sky
