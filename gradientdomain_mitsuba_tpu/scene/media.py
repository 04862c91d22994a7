"""Participating-media tables: medium plugins -> flat device arrays.

TPU-native replacement for the reference's Medium/PhaseFunction plugin
hierarchy (src/medium/homogeneous.cpp, src/phase/{isotropic,hg,
rayleigh}.cpp): media become rows of a small SoA table gathered per lane
by the volumetric wavefront (models/volpath.py, ops/medium.py).

Homogeneous media only — the heterogeneous/gridvolume family
(src/medium/heterogeneous.cpp) raises a clear error for now.
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np

from .ir import Plugin, spectrum_value

PHASE_ISOTROPIC = 0
PHASE_HG = 1
PHASE_RAYLEIGH = 2

# named scattering materials (subset of Mitsuba's materialdata.h lookup,
# data/ior-style presets used by <string name="material">): sigmaS,
# sigmaA per mm at unit scale
_MATERIALS = {
    # (sigma_s rgb, sigma_a rgb) — Jensen et al. 2001 measurements as
    # shipped in Mitsuba's materialdata.h (values in 1/mm)
    "skimmilk": ((0.70, 1.22, 1.90), (0.0014, 0.0025, 0.0142)),
    "wholemilk": ((2.55, 3.21, 3.77), (0.0011, 0.0024, 0.014)),
    "skin1": ((0.74, 0.88, 1.01), (0.032, 0.17, 0.48)),
    "skin2": ((1.09, 1.59, 1.79), (0.013, 0.070, 0.145)),
    "marble": ((2.19, 2.62, 3.00), (0.0021, 0.0041, 0.0071)),
    "ketchup": ((0.18, 0.07, 0.03), (0.061, 0.97, 1.45)),
}


class MediumTable(NamedTuple):
    """[M]-row medium table; M >= 1 (row 0 is a vacuum dummy when the
    scene has no media so gathers always compile)."""
    sigma_s: np.ndarray    # [M, 3]
    sigma_a: np.ndarray    # [M, 3]
    sigma_t: np.ndarray    # [M, 3]
    phase_kind: np.ndarray  # [M] i32 (PHASE_*)
    g: np.ndarray          # [M] HG asymmetry


def vacuum_table() -> MediumTable:
    z = np.zeros((1, 3), np.float32)
    return MediumTable(sigma_s=z, sigma_a=z, sigma_t=z,
                       phase_kind=np.zeros(1, np.int32),
                       g=np.zeros(1, np.float32))


class MediaBuilder:
    """Deduplicating builder: the same <medium> Plugin object (shared via
    <ref>) maps to one table row."""

    def __init__(self):
        self.rows: List[Tuple] = []
        self._by_node: dict = {}

    def from_plugin(self, node: Plugin) -> int:
        key = id(node)
        if key in self._by_node:
            return self._by_node[key]
        if node.type not in ("homogeneous",):
            raise ValueError(
                f"medium type '{node.type}' not supported (homogeneous "
                f"only; heterogeneous/gridvolume is future work)")
        scale = float(node.get("scale", 1.0))
        mat = node.get("material")
        if mat is not None:
            if mat not in _MATERIALS:
                raise ValueError(f"unknown medium material '{mat}'")
            sigma_s, sigma_a = (np.asarray(v, np.float32)
                                for v in _MATERIALS[mat])
        else:
            sigma_t = spectrum_value(node.get("sigmaT"))
            albedo = spectrum_value(node.get("albedo"))
            if sigma_t is not None:
                albedo = albedo if albedo is not None else np.full(
                    3, 0.75, np.float32)
                sigma_s = sigma_t * albedo
                sigma_a = sigma_t - sigma_s
            else:
                sigma_s = spectrum_value(node.get("sigmaS"), (1.0,) * 3)
                sigma_a = spectrum_value(node.get("sigmaA"), (0.0,) * 3)
        sigma_s = sigma_s * scale
        sigma_a = sigma_a * scale

        phase = node.child("phase")
        if phase is None:
            for v in node.props.values():
                if isinstance(v, Plugin) and v.kind == "phase":
                    phase = v
                    break
        kind, g = PHASE_ISOTROPIC, 0.0
        if phase is not None:
            if phase.type == "isotropic":
                kind = PHASE_ISOTROPIC
            elif phase.type == "hg":
                kind, g = PHASE_HG, float(phase.get("g", 0.0))
            elif phase.type == "rayleigh":
                kind = PHASE_RAYLEIGH
            else:
                raise ValueError(
                    f"phase type '{phase.type}' not supported "
                    f"(isotropic/hg/rayleigh)")
        mid = len(self.rows)
        self.rows.append((sigma_s, sigma_a, kind, g))
        self._by_node[key] = mid
        return mid

    def finalize(self) -> MediumTable:
        if not self.rows:
            return vacuum_table()
        ss = np.stack([r[0] for r in self.rows]).astype(np.float32)
        sa = np.stack([r[1] for r in self.rows]).astype(np.float32)
        return MediumTable(
            sigma_s=ss, sigma_a=sa, sigma_t=ss + sa,
            phase_kind=np.asarray([r[2] for r in self.rows], np.int32),
            g=np.asarray([r[3] for r in self.rows], np.float32))


def medium_node(plugin: Plugin, name: str):
    """Find a named medium attachment (<medium name="interior" ...> or
    <ref name="interior" id=...>) on a shape/sensor Plugin."""
    v = plugin.get(name)
    if isinstance(v, Plugin) and v.kind == "medium":
        return v
    return None


def unnamed_medium(plugin: Plugin):
    """First unnamed medium child (sensor <ref id="fog"/> pattern)."""
    for c in plugin.children:
        if c.kind == "medium":
            return c
    return None
