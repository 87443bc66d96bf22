"""fvOptions (finite-volume options) — the used subset.

Reference: OpenFOAM's fv::optionList hooks in every equation of the solver
(UEqn.H:31 fvOptions(rho,U), YEEqn.H:55/77, pEqn.H:37). The FM cases ship
none ("No finite volume options present" — golden log), so this implements
the types relevant to fire modelling:

  radiation                  fv::radiation — couples radiation->Sh into the
                             energy equation. The solver already adds Sh
                             when constant/radiationProperties activates a
                             model; the option marks h as radiation-coupled
                             for solvers without built-in coupling (no-op
                             here beyond validation).
  scalarSemiImplicitSource   per-cellZone explicit/implicit volumetric
                             sources Su + Sp·ψ for scalar fields
                             (h, k, species).
  vectorSemiImplicitSource   same for U.
  fixedTemperatureConstraint clamps T toward a (possibly time-varying)
                             temperature inside a cellZone.

TPU design: every option compiles to a per-cell masked source array baked
at construction (cellZone → 0/1 mask); applying an option is one fused
multiply-add in the owning equation — no runtime dispatch.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from ..config import small
import numpy as np

from ..io.foamdict import FoamDict, parse_file

__all__ = ["FvOptions"]


@dataclass
class _SemiImplicitSource:
    name: str
    mask: np.ndarray  # [nC] 0/1 zone mask
    volume_mode: str  # absolute | specific
    zone_volume: float
    # per-field (Su, Sp) pairs
    sources: Dict[str, Tuple[float, float]] = field(default_factory=dict)


@dataclass
class _FixedTemperature:
    name: str
    mask: np.ndarray
    T_target: float


class FvOptions:
    """Parsed system/fvOptions; apply hooks per equation."""

    def __init__(self, case_dir: str, geom, cell_zones=None):
        self.geom = geom
        self.semi: List[_SemiImplicitSource] = []
        self.fixed_T: List[_FixedTemperature] = []
        self.radiation = False
        path = os.path.join(case_dir, "system", "fvOptions")
        if not os.path.isfile(path):
            path = os.path.join(case_dir, "constant", "fvOptions")
        if not os.path.isfile(path):
            return
        d = parse_file(path, case_dir=case_dir)
        zones = cell_zones or {}
        for name, od in d.subdicts():
            if name == "FoamFile":
                continue
            kind = od.get_word("type", "")
            if kind == "radiation":
                self.radiation = True
                continue
            mask = np.zeros(geom.n_cells)
            sel = od.get_word("selectionMode", "all")
            if sel == "cellZone":
                zname = str(od.lookup("cellZone", ""))
                zone = zones.get(zname)
                if zone is None:
                    continue
                mask[np.asarray(zone)] = 1.0
            else:
                mask[:] = 1.0
            zvol = float((mask * np.asarray(geom.V)).sum())
            if kind in ("scalarSemiImplicitSource", "vectorSemiImplicitSource"):
                src = _SemiImplicitSource(
                    name, mask,
                    od.get_word("volumeMode", "absolute"), zvol,
                )
                inj = od.get_dict("injectionRateSuSp", FoamDict())
                for fname in inj:
                    v = inj.lookup(fname, None)
                    # entries: field (Su Sp); vector: ((ux uy uz) Sp)
                    if isinstance(v, list) and len(v) >= 2:
                        src.sources[fname] = (v[0], float(v[1]))
                self.semi.append(src)
            elif kind == "fixedTemperatureConstraint":
                self.fixed_T.append(
                    _FixedTemperature(
                        name, mask, od.get_scalar("temperature", 298.15)
                    )
                )

    @property
    def active(self) -> bool:
        return bool(self.semi or self.fixed_T or self.radiation)

    # ------------------------------------------------------------------
    def source(self, fname: str, psi_i, dtype):
        """(Su[W or kg/... per m³], Sp[1/s]) explicit/implicit volumetric
        source pair for field `fname`; zeros when no option touches it.
        volumeMode absolute divides the dict rate by the zone volume
        (fv::SemiImplicitSource 'absolute' semantics)."""
        nC = self.geom.n_cells
        is_vec = hasattr(psi_i, "ndim") and psi_i.ndim == 2
        Su = jnp.zeros((nC, 3) if is_vec else nC, dtype)
        Sp = jnp.zeros(nC, dtype)
        for s in self.semi:
            if fname not in s.sources:
                continue
            su_raw, sp_raw = s.sources[fname]
            scale = 1.0 / max(s.zone_volume, small()) if (
                s.volume_mode == "absolute"
            ) else 1.0
            m = jnp.asarray(s.mask, dtype)
            if is_vec:
                su_v = jnp.asarray(np.asarray(su_raw, float), dtype)
                Su = Su + m[:, None] * su_v[None, :] * scale
            else:
                Su = Su + m * float(su_raw) * scale
            Sp = Sp + m * float(sp_raw) * scale
        return Su, Sp

    def constrain_T(self, T_i):
        """fixedTemperatureConstraint: hard clamp inside the zones."""
        out = T_i
        for c in self.fixed_T:
            m = jnp.asarray(c.mask, T_i.dtype)
            out = out * (1.0 - m) + m * c.T_target
        return out
