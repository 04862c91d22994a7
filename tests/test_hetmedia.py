"""Heterogeneous (density-grid) media: .vol I/O, trilinear density
lookup, and the delta/ratio-tracking estimators vs analytic references
(src/medium/heterogeneous.cpp, src/volume/gridvolume.cpp analogs)."""
import os
import struct
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from gradientdomain_mitsuba_tpu.scene import media as media_mod
from gradientdomain_mitsuba_tpu.scene import scene as sc
from gradientdomain_mitsuba_tpu.ops import medium as med_ops
from gradientdomain_mitsuba_tpu.core import rng
from gradientdomain_mitsuba_tpu.models.volpath import VolPathTracer


def write_vol(path, data, bbox=((0, 0, 0), (1, 1, 1))):
    """data [nz, ny, nx] float32 -> Mitsuba .vol v3."""
    nz, ny, nx = data.shape
    with open(path, "wb") as f:
        f.write(b"VOL")
        f.write(bytes([3]))
        f.write(struct.pack("<5i", 1, nx, ny, nz, 1))
        f.write(struct.pack("<6f", *bbox[0], *bbox[1]))
        data.astype("<f4").tofile(f)


def test_vol_roundtrip(tmp_path):
    data = np.random.RandomState(0).rand(4, 3, 5).astype(np.float32)
    p = str(tmp_path / "d.vol")
    write_vol(p, data, bbox=((-1, -2, -3), (1, 2, 3)))
    out, bbox = media_mod.load_vol(p)
    np.testing.assert_allclose(out, data, rtol=1e-6)
    np.testing.assert_allclose(bbox, [[-1, -2, -3], [1, 2, 3]])


def _slab_scene(tmp_path, data, scale=1.0, albedo=(0.0, 0.0, 0.0),
                bbox=((-1, -1, -1), (1, 1, 1)), integrator="volpath",
                g=0.0):
    """Null-bounded cube [-1,1]^3 at the origin filled with a density
    grid; emitter plane behind it, camera in front."""
    vol = str(tmp_path / "d.vol")
    write_vol(vol, data, bbox=bbox)
    xml = f"""<scene version="0.5.0">
  <integrator type="{integrator}"><integer name="maxDepth" value="6"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <transform name="toWorld">
      <lookat origin="0 0 5" target="0 0 0" up="0 1 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="24"/><integer name="height" value="24"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="cube">
    <bsdf type="null"/>
    <medium name="interior" type="heterogeneous">
      <float name="scale" value="{scale}"/>
      <rgb name="albedo" value="{albedo[0]} {albedo[1]} {albedo[2]}"/>
      <volume name="density" type="gridvolume">
        <string name="filename" value="{vol}"/>
      </volume>
      <phase type="hg"><float name="g" value="{g}"/></phase>
    </medium>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <scale value="4"/><translate z="-2"/>
    </transform>
    <emitter type="area"><rgb name="radiance" value="3 3 3"/></emitter>
  </shape>
</scene>"""
    p = str(tmp_path / "s.xml")
    with open(p, "w") as f:
        f.write(xml)
    return sc.load_scene(p)


def test_density_trilinear(tmp_path):
    """density_at reproduces grid values at texel centers and
    interpolates between them; outside the volume -> 0."""
    data = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    scene, st = _slab_scene(tmp_path, data)
    assert st.has_het_media
    media = scene.media
    mid = jnp.zeros(5, jnp.int32)
    # cube [-1,1]^3; grid space [0,1]^3 maps to it via the medium/bbox
    # transform. corners (texel centers at the cube corners):
    pts = jnp.asarray([
        [-1.0, -1.0, -1.0],   # q=(0,0,0) -> data[0,0,0] = 0
        [1.0, -1.0, -1.0],    # q=(1,0,0) -> data[0,0,1] = 1
        [-1.0, 1.0, 1.0],     # q=(0,1,1) -> data[1,1,0] = 6
        [0.0, 0.0, 0.0],      # center -> mean = 3.5
        [3.0, 0.0, 0.0],      # outside -> 0
    ])
    d = np.asarray(med_ops.density_at(media, mid, pts))
    np.testing.assert_allclose(d, [0.0, 1.0, 6.0, 3.5, 0.0], atol=1e-5)


def test_constant_grid_matches_homogeneous(tmp_path):
    """A constant-density grid medium must agree with the analytic
    homogeneous sampler in expectation (same sigma_t/albedo)."""
    sigma = 0.8
    albedo = (0.6, 0.6, 0.6)
    data = np.ones((2, 2, 2), np.float32)
    scene_h, st_h = _slab_scene(tmp_path, data, scale=sigma,
                                albedo=albedo)
    img_het = VolPathTracer(scene_h, st_h).render(scene_h, seed=0,
                                                  spp=48)
    # homogeneous analog via sigmaS/sigmaA
    ss = tuple(sigma * a for a in albedo)
    sa = tuple(sigma * (1 - a) for a in albedo)
    xml = f"""<scene version="0.5.0">
  <integrator type="volpath"><integer name="maxDepth" value="6"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <transform name="toWorld">
      <lookat origin="0 0 5" target="0 0 0" up="0 1 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="24"/><integer name="height" value="24"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="cube">
    <bsdf type="null"/>
    <medium name="interior" type="homogeneous">
      <rgb name="sigmaS" value="{ss[0]} {ss[1]} {ss[2]}"/>
      <rgb name="sigmaA" value="{sa[0]} {sa[1]} {sa[2]}"/>
      <phase type="hg"><float name="g" value="0.0"/></phase>
    </medium>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <scale value="4"/><translate z="-2"/>
    </transform>
    <emitter type="area"><rgb name="radiance" value="3 3 3"/></emitter>
  </shape>
</scene>"""
    p = str(tmp_path / "h.xml")
    with open(p, "w") as f:
        f.write(xml)
    scene_o, st_o = sc.load_scene(p)
    img_hom = VolPathTracer(scene_o, st_o).render(scene_o, seed=1,
                                                  spp=48)
    assert np.isfinite(img_het).all() and np.isfinite(img_hom).all()
    a = img_het[6:18, 6:18].mean((0, 1))
    b = img_hom[6:18, 6:18].mean((0, 1))
    assert b.min() > 0.1, b  # guard against a vacuously-black scene
    np.testing.assert_allclose(a, b, rtol=0.08)


def test_ramp_density_beer_lambert(tmp_path):
    """Absorption-only linear density ramp along the view axis: center
    pixels read radiance * exp(-scale * integral of density).  The ramp
    runs along z over the cube depth 2, density 0 -> 1 => integral = 1."""
    nz = 16
    # .vol is z-major [nz, ny, nx]; camera looks along -z from z=5, so
    # the ray enters at z=+1 (grid q_z=1) and exits at z=-1 (q_z=0)
    ramp = np.linspace(0.0, 1.0, nz, dtype=np.float32)
    data = np.tile(ramp[:, None, None], (1, 2, 2))
    scale = 1.3
    scene, st = _slab_scene(tmp_path, data, scale=scale)
    img = VolPathTracer(scene, st).render(scene, seed=0, spp=96)
    assert np.isfinite(img).all()
    c = img[10:14, 10:14].mean((0, 1))
    expect = 3.0 * np.exp(-scale * 1.0)
    np.testing.assert_allclose(c, expect, rtol=0.12)


def test_scattering_het_furnace(tmp_path):
    """Purely scattering blob in a constant environment leaves the field
    constant — validates tracking weights + attenuated NEE together."""
    rs = np.random.RandomState(3)
    data = rs.rand(6, 6, 6).astype(np.float32)
    vol = str(tmp_path / "d.vol")
    write_vol(vol, data)
    xml = f"""<scene version="0.5.0">
  <integrator type="volpath"><integer name="maxDepth" value="-1"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <transform name="toWorld">
      <lookat origin="0 0 5" target="0 0 0" up="0 1 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="16"/><integer name="height" value="16"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="cube">
    <transform name="toWorld"><scale value="1.2"/></transform>
    <bsdf type="null"/>
    <medium name="interior" type="heterogeneous">
      <float name="scale" value="1.5"/>
      <rgb name="albedo" value="1 1 1"/>
      <volume name="density" type="gridvolume">
        <string name="filename" value="{vol}"/>
      </volume>
    </medium>
  </shape>
  <emitter type="constant"><rgb name="radiance" value="1.5 1.5 1.5"/></emitter>
</scene>"""
    p = str(tmp_path / "s.xml")
    with open(p, "w") as f:
        f.write(xml)
    scene, st = sc.load_scene(p)
    img = VolPathTracer(scene, st).render(scene, seed=0, spp=48)
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img.mean((0, 1)), 1.5, rtol=0.04)
