"""MLT (src/integrators/mlt/mlt.cpp analog): parallel-chain Kelemen
chains over the FULL BDPT strategy family must reproduce the BDPT image
in expectation — PSS-driven eye AND light subpaths, light-image splats
riding the chains, and the b-normalized Metropolis estimator are
exercised end to end."""
import os
import tempfile

import numpy as np

from gradientdomain_mitsuba_tpu.scene import scene as sc
from gradientdomain_mitsuba_tpu.models.bdpt import BDPTracer
from gradientdomain_mitsuba_tpu.models.mlt import MLTracer

XML = """<scene version="0.5.0">
  <integrator type="mlt">
    <integer name="maxDepth" value="3"/>
    <integer name="chains" value="2048"/>
    <float name="pLarge" value="0.4"/>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <transform name="toWorld">
      <lookat origin="0 0 5" target="0 0 0" up="0 1 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="$width"/>
      <integer name="height" value="$height"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="rectangle">
    <transform name="toWorld">
      <scale value="3"/><translate z="-1"/>
    </transform>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.7 0.5 0.3"/></bsdf>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <rotate x="1" angle="130"/><scale value="0.8"/><translate y="2" z="2"/>
    </transform>
    <emitter type="area"><rgb name="radiance" value="8 8 8"/></emitter>
  </shape>
</scene>"""


def _load(size):
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.xml")
        with open(p, "w") as f:
            f.write(XML)
        return sc.load_scene(p, {"width": str(size), "height": str(size)})


def test_mutation_kernels_are_fixed_coordinate_subsets():
    """Every small-step mutation must touch exactly one of the five
    allowed FIXED coordinate subsets (all / eye / light / lens-manifold
    / caustic-manifold) — state-independence of the subset is what keeps
    each kernel symmetric — and all five kinds must occur."""
    import jax.numpy as jnp
    from gradientdomain_mitsuba_tpu.core.rng import DimAllocator as DA

    scene, st = _load(8)
    st.integrator = "mlt"
    tr = MLTracer(scene, st)
    C, D = 512, tr.n_dims
    u = np.asarray(tr._fresh(7, 0, C))
    up = np.asarray(tr._mutate_small(7, 3, jnp.asarray(u)))
    changed = u != up  # kept dims move by +-mag in (1/1024, 1/64]

    dims = np.arange(D)
    is_eye = dims < tr.eye_span
    masks = {
        "all": np.ones(D, bool),
        "eye": is_eye,
        "light": ~is_eye,
        "lens_manifold": dims < DA.NUM_CAMERA_DIMS,
        "caustic_manifold": ~is_eye & (dims < tr.eye_span + DA.NUM_BOUNCE_DIMS),
    }
    counts = dict.fromkeys(masks, 0)
    for c in range(C):
        hit = [k for k, m in masks.items() if (changed[c] == m).all()]
        assert hit, f"chain {c} changed an unknown subset: {changed[c]}"
        counts[hit[0]] += 1
    assert all(v > 0 for v in counts.values()), counts
    # manifold kernels freeze every bounce coordinate of both subpaths
    bounce = dims >= DA.NUM_CAMERA_DIMS
    lens_rows = (changed == masks["lens_manifold"]).all(1)
    assert not changed[np.ix_(lens_rows, bounce)].any()


def test_mlt_matches_bdpt_in_expectation():
    size = 16
    scene, st = _load(size)
    st.integrator = "bdpt"
    ref = BDPTracer(scene, st).render(scene, seed=3, spp=128)
    ref = np.asarray(ref)

    st.integrator = "mlt"
    tr = MLTracer(scene, st)
    img = np.asarray(tr.render(scene, seed=1, spp=256))

    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    # global mean must agree tightly (b-normalized estimator)
    np.testing.assert_allclose(img.mean(), ref.mean(), rtol=0.08)
    # 4x4 block means: structure agrees within MLT noise
    rb = ref.reshape(4, 4, 4, 4, 3).mean((1, 3, 4))
    ib = img.reshape(4, 4, 4, 4, 3).mean((1, 3, 4))
    scale = np.abs(rb).max()
    assert np.abs(ib - rb).max() / scale < 0.25, \
        np.abs(ib - rb).max() / scale

    assert tr.last_b > 0
