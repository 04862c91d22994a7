"""Woven-cloth (irawan) BSDF: weave structure, energy, reciprocity,
sampling consistency, end-to-end render.

Reference behavior: src/bsdfs/irawan.{h,cpp} (pattern-tiled yarn
segments, kd + per-segment specular, cosine sampling).  The specular
lobe here is the re-derived bent-cylinder von Mises form documented in
ops/irawan.py.
"""
import os
import textwrap

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _params(n, cloth=None, kd=(0.3, 0.3, 0.3), ks=(0.4, 0.4, 0.4)):
    import jax.numpy as jnp
    from gradientdomain_mitsuba_tpu.ops.bsdf import MatParams
    from gradientdomain_mitsuba_tpu.scene.materials import IRAWAN
    z = jnp.zeros(n, jnp.float32)
    v3 = lambda c: jnp.broadcast_to(jnp.asarray(c, jnp.float32), (n, 3))
    return MatParams(
        kind=jnp.full(n, IRAWAN, jnp.int32),
        twosided=jnp.zeros(n, bool),
        reflectance=v3(kd), specular=v3(ks), transmittance=v3((1, 1, 1)),
        alpha=z + 10.0, eta=v3((1.345,) * 3), k=v3((0, 0, 0)),
        dist=jnp.zeros(n, jnp.int32), fdr_int=z,
        spec_weight=z, alpha_v=z + 10.0, opacity=z + 1.0,
        cloth=cloth)


def _feat(n, u=0.2, v=0.1, axis=(1.0, 0.0), kappa=40.0, inten=1.0):
    import jax.numpy as jnp
    f = np.tile(np.array([u, v, axis[0], axis[1], kappa, inten],
                         np.float32), (n, 1))
    return jnp.asarray(f)


def test_reciprocity():
    """f/cos_o must be symmetric under wi <-> wo (the lobe is built on
    the half vector, so the model is reciprocal by construction)."""
    import jax.numpy as jnp
    from gradientdomain_mitsuba_tpu.ops.irawan import eval_cloth
    rng = np.random.default_rng(0)
    n = 64
    def hemi(r):
        d = r.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d[:, 2] = np.abs(d[:, 2]) + 1e-3
        return d / np.linalg.norm(d, axis=-1, keepdims=True)
    wi = jnp.asarray(hemi(rng))
    wo = jnp.asarray(hemi(rng))
    p = _params(n, cloth=_feat(n))
    f_io = np.asarray(eval_cloth(p, wi, wo)) / \
        np.maximum(np.asarray(wo)[:, 2:3], 1e-6)
    f_oi = np.asarray(eval_cloth(p, wo, wi)) / \
        np.maximum(np.asarray(wi)[:, 2:3], 1e-6)
    np.testing.assert_allclose(f_io, f_oi, rtol=2e-3, atol=1e-5)


def test_energy_bounded():
    """White-furnace bound: hemispherical albedo of eval stays below 1
    for default kd/ks at non-grazing incidence."""
    import jax.numpy as jnp
    from gradientdomain_mitsuba_tpu.ops.irawan import eval_cloth
    # cosine-weighted MC integration of f*cos over the hemisphere
    rng = np.random.default_rng(1)
    n = 20000
    u = rng.random((n, 2)).astype(np.float32)
    r = np.sqrt(u[:, 0])
    phi = 2 * np.pi * u[:, 1]
    wo = np.stack([r * np.cos(phi), r * np.sin(phi),
                   np.sqrt(np.maximum(1 - u[:, 0], 0.0))], -1)
    wi = np.tile(np.array([0.3, 0.1, 0.95], np.float32), (n, 1))
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    p = _params(n, cloth=_feat(n, kappa=40.0, inten=1.3))
    f = np.asarray(eval_cloth(p, jnp.asarray(wi), jnp.asarray(wo)))
    # E[f*cos/pdf], pdf = cos/pi  ->  pi * E[f_times_cos / cos] ... the
    # eval already returns f*cos, so the estimator is mean(f*cos)/mean?
    # Use pdf directly: albedo = mean(eval / pdf)
    pdf = np.maximum(wo[:, 2] / np.pi, 1e-6)[:, None]
    albedo = (f / pdf).mean(0)
    assert np.all(albedo < 1.0), albedo
    assert np.all(albedo > 0.05), albedo


def test_anisotropy_follows_yarn_axis():
    """Rotating the yarn axis by 90 deg moves the specular peak: the
    bent-cylinder normal tilts along the yarn, so a grazing-tilted wo
    aligned with the tilt direction sees a brighter lobe."""
    import jax.numpy as jnp
    from gradientdomain_mitsuba_tpu.ops.irawan import eval_cloth
    n = 1
    wi = jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
    # wo tilted toward +x; segment bent with arc angle u=0.4
    wo = jnp.asarray(np.array([[np.sin(0.75), 0.0, np.cos(0.75)]],
                              np.float32))
    p_x = _params(n, kd=(0, 0, 0),
                  cloth=_feat(n, u=0.4, v=0.0, axis=(1.0, 0.0),
                              kappa=60.0))
    p_y = _params(n, kd=(0, 0, 0),
                  cloth=_feat(n, u=0.4, v=0.0, axis=(0.0, 1.0),
                              kappa=60.0))
    f_x = float(np.asarray(eval_cloth(p_x, wi, wo)).sum())
    f_y = float(np.asarray(eval_cloth(p_y, wi, wo)).sum())
    # axis +x tilts the normal toward +x -> specular peak toward +x
    assert f_x > 3.0 * f_y, (f_x, f_y)


def test_sampling_matches_quadrature():
    """sample() weight estimator must integrate to the same albedo as
    direct quadrature of eval (sampling consistency: E[w] = albedo)."""
    import jax.numpy as jnp
    from gradientdomain_mitsuba_tpu.ops import bsdf as bsdf_ops
    from gradientdomain_mitsuba_tpu.scene.materials import IRAWAN
    from gradientdomain_mitsuba_tpu.ops.irawan import eval_cloth
    n = 30000
    rng = np.random.default_rng(2)
    wi = np.tile(np.array([0.4, -0.2, 0.89], np.float32), (n, 1))
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    p = _params(n, cloth=_feat(n, u=0.3, v=0.2, kappa=25.0))
    u2 = jnp.asarray(rng.random((n, 2)).astype(np.float32))
    uc = jnp.asarray(rng.random(n).astype(np.float32))
    s = bsdf_ops.sample(p, jnp.asarray(wi), u2, uc,
                        kinds=frozenset({IRAWAN}))
    est = np.asarray(s.weight * s.valid[..., None]).mean(0)
    # quadrature reference by cosine MC with independent directions
    u = rng.random((n, 2)).astype(np.float32)
    r = np.sqrt(u[:, 0])
    phi = 2 * np.pi * u[:, 1]
    wo = np.stack([r * np.cos(phi), r * np.sin(phi),
                   np.sqrt(np.maximum(1 - u[:, 0], 0.0))], -1)
    f = np.asarray(eval_cloth(p, jnp.asarray(wi), jnp.asarray(wo)))
    pdf = np.maximum(wo[:, 2] / np.pi, 1e-6)[:, None]
    ref = (f / pdf).mean(0)
    np.testing.assert_allclose(est, ref, rtol=0.05)


def test_scene_renders_with_pattern(tmp_path):
    """End-to-end: denim-preset cloth floor under an area light renders
    finite, non-zero, with visible pattern variation (the twill grid
    modulates the specular)."""
    xml = textwrap.dedent("""\
        <scene version="0.5.0">
          <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
          <sensor type="perspective">
            <float name="fov" value="45"/>
            <transform name="toWorld">
              <lookat origin="0, 1.2, 2.2" target="0, 0, 0" up="0, 1, 0"/>
            </transform>
            <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
            <film type="hdrfilm">
              <integer name="width" value="24"/><integer name="height" value="24"/>
              <rfilter type="box"/>
            </film>
          </sensor>
          <shape type="rectangle">
            <transform name="toWorld">
              <rotate x="1" angle="-90"/><scale value="2"/>
            </transform>
            <bsdf type="irawan">
              <string name="filename" value="cotton_denim.wif"/>
              <float name="repeatU" value="6"/>
              <float name="repeatV" value="6"/>
            </bsdf>
          </shape>
          <shape type="rectangle">
            <transform name="toWorld">
              <rotate x="1" angle="90"/>
              <translate x="0" y="2.5" z="0"/>
            </transform>
            <emitter type="area"><rgb name="radiance" value="6, 6, 6"/></emitter>
          </shape>
        </scene>
    """)
    p = tmp_path / "cloth.xml"
    p.write_text(xml)
    from gradientdomain_mitsuba_tpu.models.path import PathTracer
    from gradientdomain_mitsuba_tpu.scene import scene as sc
    from gradientdomain_mitsuba_tpu.scene.materials import IRAWAN
    scene, st = sc.load_scene(str(p))
    assert int(st.has_textures) & 16
    assert IRAWAN in set(int(k) for k in np.asarray(scene.materials.kind))
    img = np.asarray(PathTracer(scene, st).render(scene, seed=0, spp=8))
    assert np.isfinite(img).all()
    lum = img.mean(-1)
    hit = lum > 0
    assert hit.mean() > 0.3
    # denim kd is blue-dominant
    mean = img.reshape(-1, 3)[lum.reshape(-1) > 0].mean(0)
    assert mean[2] > mean[0]


def test_bdpt_matches_path_on_cloth(tmp_path):
    """BDPT strategy re-evals must include the cloth SPECULAR term
    (SubPath.aux yarn azimuth, round-3 fix): bdpt and path estimate the
    same integral on a woven-cloth scene.  Before the fix the s>=1
    connection strategies evaluated diffuse-only cloth, biasing BDPT
    low on specular-heavy views."""
    xml = textwrap.dedent("""\
        <scene version="0.5.0">
          <integrator type="bdpt"><integer name="maxDepth" value="3"/></integrator>
          <sensor type="perspective">
            <float name="fov" value="45"/>
            <transform name="toWorld">
              <lookat origin="0, 1.2, 2.2" target="0, 0, 0" up="0, 1, 0"/>
            </transform>
            <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
            <film type="hdrfilm">
              <integer name="width" value="20"/><integer name="height" value="20"/>
              <rfilter type="box"/>
            </film>
          </sensor>
          <shape type="rectangle">
            <transform name="toWorld">
              <rotate x="1" angle="-90"/><scale value="2"/>
            </transform>
            <bsdf type="irawan">
              <string name="filename" value="cotton_denim.wif"/>
              <float name="repeatU" value="6"/>
              <float name="repeatV" value="6"/>
            </bsdf>
          </shape>
          <shape type="rectangle">
            <transform name="toWorld">
              <rotate x="1" angle="90"/>
              <translate x="0" y="2.5" z="0"/>
            </transform>
            <emitter type="area"><rgb name="radiance" value="6, 6, 6"/></emitter>
          </shape>
        </scene>
    """)
    p = tmp_path / "cloth_bdpt.xml"
    p.write_text(xml)
    from gradientdomain_mitsuba_tpu.models.bdpt import BDPTracer
    from gradientdomain_mitsuba_tpu.models.path import PathTracer
    from gradientdomain_mitsuba_tpu.scene import scene as sc
    scene, st = sc.load_scene(str(p))
    b = BDPTracer(scene, st)
    assert b.has_cloth
    img = np.asarray(b.render(scene, seed=0, spp=48, chunk=8))
    ref = np.asarray(PathTracer(scene, st).render(scene, seed=9, spp=512))
    assert np.isfinite(img).all()
    ratio = img.mean() / ref.mean()
    assert abs(ratio - 1) < 0.04, ratio
