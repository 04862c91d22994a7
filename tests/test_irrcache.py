"""Irradiance caching (src/integrators/irrcache analog): the lattice
cache + Ward interpolation must reproduce the path tracer's image up to
the cache's smoothing bias, and the final-gather mode of trace_rays must
exclude direct light exactly."""
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from gradientdomain_mitsuba_tpu.scene import scene as sc
from gradientdomain_mitsuba_tpu.models.path import PathTracer
from gradientdomain_mitsuba_tpu.models.irrcache import IrrCacheTracer

BOX = """<scene version="0.5.0">
  <integrator type="irrcache">
    <integer name="maxDepth" value="4"/>
    <integer name="resolution" value="4"/>
    <integer name="gatherSamples" value="128"/>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="60"/>
    <transform name="toWorld">
      <lookat origin="0 0 3.5" target="0 0 0" up="0 1 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="32"/><integer name="height" value="32"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="rectangle">
    <transform name="toWorld"><scale value="2"/><translate z="-2"/></transform>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.7 0.7 0.7"/></bsdf>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <rotate y="1" angle="90"/><scale value="2"/><translate x="-2"/>
    </transform>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.8 0.2 0.2"/></bsdf>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <rotate y="1" angle="-90"/><scale value="2"/><translate x="2"/>
    </transform>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.2 0.8 0.2"/></bsdf>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <rotate x="1" angle="90"/><scale value="0.6"/><translate y="1.98"/>
    </transform>
    <emitter type="area"><rgb name="radiance" value="12 12 12"/></emitter>
  </shape>
</scene>"""


def _load():
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.xml")
        with open(p, "w") as f:
            f.write(BOX)
        return sc.load_scene(p, {})


def test_final_gather_excludes_direct():
    """trace_rays(direct_at_first=False) must return 0 for a ray aimed
    straight at an emitter with maxDepth=1."""
    import copy
    import jax
    scene, st = _load()
    scene = jax.device_put(scene)
    st2 = copy.deepcopy(st)
    st2.max_depth = 1
    tr = PathTracer(scene, st2)
    o = jnp.asarray([[0.1, 0.0, 0.07]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])  # up toward the area light
    ids = jnp.zeros(1, jnp.uint32)
    L_with = np.asarray(tr.trace_rays(scene, 0, 0, ids, o, d))
    L_without = np.asarray(tr.trace_rays(scene, 0, 0, ids, o, d,
                                         direct_at_first=False))
    assert L_with.sum() > 1.0          # sees the emitter
    assert L_without.sum() == 0.0      # final gather drops it


def test_irrcache_matches_path():
    scene, st = _load()
    ref = np.asarray(PathTracer(scene, st).render(scene, seed=5, spp=192))

    tr = IrrCacheTracer(scene, st)
    assert tr._all_diffuse
    img = np.asarray(tr.render(scene, seed=1, spp=16))

    assert np.isfinite(img).all() and img.min() >= 0.0
    # block means: cache bias stays within a few percent on a smooth
    # diffuse box (8x8 blocks of 4x4 pixels)
    rb = ref.reshape(8, 4, 8, 4, 3).mean((1, 3))
    ib = img.reshape(8, 4, 8, 4, 3).mean((1, 3))
    scale = np.abs(rb).max()
    err = np.abs(ib - rb).max() / scale
    assert err < 0.15, err
    # and the cache actually contributed: indirect on the back wall
    # (color bleeding from the red/green walls) is present
    assert img[16, 4:10, 0].mean() > img[16, 4:10, 1].mean()  # red side


def test_irrcache_rerender_refreshes_cache():
    """Two renders with different seeds must not reuse a stale cache
    (the cache is a traced argument, not a captured constant)."""
    scene, st = _load()
    tr = IrrCacheTracer(scene, st)
    a = np.asarray(tr.render(scene, seed=1, spp=4))
    b = np.asarray(tr.render(scene, seed=2, spp=4))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert not np.allclose(a, b)  # different seeds -> different images
