"""Integrator factory: XML `type` string -> tracer instance.

The analog of PluginManager::createObject for the integrator family
(src/libcore/plugin.cpp): one registry instead of dlopen'd plugins.
`gpt`/`gbdpt` are constructed here too but their multi-buffer render
protocol is driven by the CLI/reconstruction layer.
"""
from __future__ import annotations


def make_integrator(scene, settings):
    t = settings.integrator
    if t == "gpt":
        from .gpt import GPTracer
        return GPTracer(scene, settings)
    if t == "gbdpt":
        from .gbdpt import GBDPTracer
        return GBDPTracer(scene, settings)
    if t == "bdpt":
        from .bdpt import BDPTracer
        return BDPTracer(scene, settings)
    if t in ("volpath", "volpath_simple"):
        from .volpath import VolPathTracer
        return VolPathTracer(scene, settings)
    if t == "pssmlt":
        from .pssmlt import PSSMLTracer
        return PSSMLTracer(scene, settings)
    if t == "mlt":
        from .mlt import MLTracer
        return MLTracer(scene, settings)
    if t == "irrcache":
        from .irrcache import IrrCacheTracer
        return IrrCacheTracer(scene, settings)
    if t == "erpt":
        from .erpt import ERPTracer
        return ERPTracer(scene, settings)
    if t in ("sppm", "ppm", "photonmapper"):
        from .sppm import SPPMTracer
        return SPPMTracer(scene, settings)
    if t == "vpl":
        from .vpl import VPLTracer
        return VPLTracer(scene, settings)
    if t == "adaptive":
        from .adaptive import AdaptiveTracer
        return AdaptiveTracer(scene, settings)
    if t == "multichannel":
        from .multichannel import MultiChannelIntegrator
        return MultiChannelIntegrator(scene, settings)
    if t == "direct":
        from .direct import DirectIntegrator
        return DirectIntegrator(scene, settings)
    if t == "ao":
        from .direct import AOIntegrator
        return AOIntegrator(scene, settings)
    if t == "field":
        from .direct import FieldIntegrator
        return FieldIntegrator(scene, settings)
    if getattr(settings, "has_sss", False):
        # <subsurface>-carrying scene: the path tracer variant that
        # preprocesses the dipole irradiance cache (dipole.cpp).  As in
        # the reference, bidirectional integrators ignore subsurface —
        # only the path family routes here.
        from .sss import DipoleTracer
        return DipoleTracer(scene, settings)
    from .path import PathTracer
    return PathTracer(scene, settings)


KNOWN = ("path", "direct", "ao", "bdpt", "field", "volpath",
         "volpath_simple", "pssmlt", "mlt", "erpt", "irrcache",
         "sppm", "ppm",
         "photonmapper", "adaptive", "multichannel", "vpl", "gpt",
         "gbdpt")
