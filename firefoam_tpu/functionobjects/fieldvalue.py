"""Function objects: volFieldValue, fieldMinMax, faceZonesIntegration, probes.

TPU-native re-design of the reference's runtime post-processing
(cases/steckler/system/controlDict functions block — volFieldValue HRR
volIntegrate + fieldMinMax; lib/functionObjects/faceZonesIntegration for
faceZone flux integrals; stock probes/patchProbes used by pyrolysis1D and
wallFireSpread2D). Each object computes its reductions INSIDE the jitted
step (they are cheap device reductions appended to the step log) and
formats/writes files on host at write time — the io_callback-free analogue
of the reference's master-only writes (SURVEY §2.11).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..io.foamdict import FoamDict

__all__ = ["FunctionObjects", "make_function_objects"]


@dataclass
class _FO:
    name: str
    kind: str
    fields: List[str]
    params: dict
    rows: list = field(default_factory=list)


def _volfield(state, solver, name):
    """Resolve a named volume field from the state pytree (cell values)."""
    if name == "Qdot":
        return state["Qdot"]
    if name in state and hasattr(state[name], "i"):
        return state[name].i
    if name in ("T", "U", "p", "p_rgh", "k", "hs", "rho"):
        return state[name].i
    if name in solver.species:
        return state["Y"].i[:, solver.gas.index(name)]
    return None


class FunctionObjects:
    """All enabled function objects of a case."""

    def __init__(self, solver, fos: List[_FO], out_dir: Optional[str] = None):
        self.solver = solver
        self.fos = fos
        root = getattr(solver.case, "root", ".")
        if out_dir is None:
            out_dir = os.path.join(root, "postProcessing")
            if not os.access(root, os.W_OK):
                # read-only case mounts (e.g. /root/reference): divert to /tmp
                import hashlib

                tag = hashlib.md5(root.encode()).hexdigest()[:8]
                out_dir = os.path.join(
                    "/tmp", "firefoam_tpu_post", os.path.basename(root) + "_" + tag
                )
        self.out_dir = out_dir

    # ------------------------------------------------------- traced part
    def compute(self, state) -> Dict[str, jnp.ndarray]:
        """Device-side reductions, merged into the step log (jit-traced)."""
        out: Dict[str, jnp.ndarray] = {}
        g = self.solver.geom
        for fo in self.fos:
            for fname in fo.fields:
                v = _volfield(state, self.solver, fname)
                if v is None:
                    continue
                tag = f"fo_{fo.name}_{fname}"
                if fo.kind == "volFieldValue":
                    op = fo.params.get("operation", "volIntegrate")
                    if op == "volIntegrate":
                        out[tag] = g.rsum(v * g.V)
                    elif op == "volAverage":
                        out[tag] = g.rsum(v * g.V) / g.rsum(g.V)
                    elif op == "max":
                        out[tag] = g.rmax(v)
                    elif op == "min":
                        out[tag] = g.rmin(v)
                elif fo.kind == "fieldMinMax":
                    m = jnp.linalg.norm(v, axis=-1) if v.ndim == 2 else v
                    out[tag + "_min"] = g.rmin(m)
                    out[tag + "_max"] = g.rmax(m)
                elif fo.kind == "probes":
                    cells = fo.params["cells"]
                    out[tag] = v[jnp.asarray(cells)]
                elif fo.kind == "faceZonesIntegration":
                    # per-zone flip-signed integral of the surface field
                    # (faceZonesIntegration.C:258-283 calcFaceZonesIntegral)
                    sv = state.get(fname)
                    if sv is None or not hasattr(sv, "i"):
                        continue
                    for zname, slots, signs, bslots, bsigns in fo.params.get(
                        "zone_slots", ()
                    ):
                        tot = jnp.sum(
                            sv.i[jnp.asarray(slots)] * jnp.asarray(signs, sv.i.dtype)
                        )
                        if len(bslots):
                            tot = tot + jnp.sum(
                                sv.b[jnp.asarray(bslots)]
                                * jnp.asarray(bsigns, sv.b.dtype)
                            )
                        out[f"{tag}_{zname}"] = tot
        return out

    # --------------------------------------------------------- host part
    def record(self, t: float, log: Dict[str, np.ndarray]):
        for fo in self.fos:
            row = [t]
            hit = False
            for k, v in log.items():
                if k.startswith(f"fo_{fo.name}_"):
                    row.extend(np.atleast_1d(np.asarray(v)).tolist())
                    hit = True
            if hit:
                fo.rows.append(row)

    def write(self, start_time: str = "0"):
        for fo in self.fos:
            if not fo.rows:
                continue
            d = os.path.join(self.out_dir, fo.name, start_time)
            os.makedirs(d, exist_ok=True)
            fname = {
                "volFieldValue": "volFieldValue.dat",
                "fieldMinMax": "fieldMinMax.dat",
                "probes": "probes.dat",
                "faceZonesIntegration": "faceZonesIntegration.dat",
            }.get(fo.kind, fo.kind + ".dat")
            from ..io.master import is_master

            if not is_master():
                return
            with open(os.path.join(d, fname), "w") as f:
                f.write(f"# {fo.kind} {fo.name}: fields {' '.join(fo.fields)}\n")
                for row in fo.rows:
                    f.write("\t".join(f"{x:.8g}" for x in row) + "\n")


def make_function_objects(solver, control_dict: FoamDict) -> FunctionObjects:
    fns = control_dict.get_dict("functions", FoamDict())
    fos: List[_FO] = []
    for name, d in fns.subdicts():
        if not isinstance(d, FoamDict) or not d.get_bool("enabled", True):
            continue
        kind = d.get_word("type", "")
        flds = [str(x) for x in d.get_list("fields", [])]
        params: dict = {}
        if kind == "volFieldValue":
            op = d.lookup("operation", "volIntegrate")
            params["operation"] = str(op)
        elif kind in ("probes", "patchProbes"):
            locs = d.get_list("probeLocations", [])
            if d.found("region") and str(d.lookup("region")) != "region0":
                continue  # region probes handled by the region models
            cells = []
            C = np.asarray(solver.geom.C)
            for p in locs:
                cells.append(int(np.argmin(np.sum((C - np.asarray(p, float)) ** 2, 1))))
            params["cells"] = np.asarray(cells, np.int64)
            kind = "probes"
        elif kind == "faceZonesIntegration":
            zones = [str(z) for z in d.get_list("faceZones", [])]
            params["zones"] = zones
            # resolve each zone to internal-face storage slots + flip signs
            g = solver.geom
            zone_slots = []
            # zone faces on boundary patches (other than empty) contribute
            # flip-signed too (reference calcFaceZonesIntegral includes
            # non-processor/non-empty patch faces)
            skip = np.zeros(g.n_boundary, bool)
            for p in g.patches:
                if p.ptype in ("empty", "processor"):
                    skip[p.slice] = True
            for z in zones:
                fz = solver.cm.face_zones.get(z)
                if fz is None:
                    continue
                f = np.asarray(fz.faces)
                flip = np.asarray(fz.flip) if getattr(fz, "flip", None) is not None else np.zeros(f.shape[0], bool)
                signs = np.where(flip, -1.0, 1.0)
                keep = f < g.n_internal_real
                bf = f[~keep] - g.n_internal_real
                bsigns = signs[~keep][~skip[bf]]
                bf = bf[~skip[bf]]
                zone_slots.append(
                    (z, g.face_perm[f[keep]], signs[keep], bf, bsigns)
                )
            params["zone_slots"] = tuple(zone_slots)
        elif kind == "fieldMinMax":
            pass
        else:
            continue  # unsupported type: ignore gracefully
        fos.append(_FO(name=name, kind=kind, fields=flds, params=params))
    return FunctionObjects(solver, fos)
