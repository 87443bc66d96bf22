"""Stock injection submodels beyond cone/patch/sprinkler families.

Reference: packages/lagrangian/intermediateNew/submodels/Kinematic/
InjectionModel/{ManualInjection,CellZoneInjection,FieldActivatedInjection,
KinematicLookupTableInjection,ConeNozzleInjection,InflationInjection,
NoInjection}. Each follows the InjectionModel contract: parcelsToInject /
volumeToInject over (time0, time1], positions+velocity+diameter per parcel.

TPU design: one-shot models (Manual/CellZone) burst their full parcel list in
the step that crosses SOI — capacity equals the list length and the burst is
a masked write into the SoA pool, so the jit graph is shape-static. The
conditional model (FieldActivated) evaluates its gate per injector position
each step inside the graph.
"""

from __future__ import annotations

import math
import re
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import INT_DTYPE, small
from ..io.foamdict import FoamDict
from .injection import (
    ConeInjection,
    InjectorBase,
    _constant_profile,
    _make_size_sampler,
)

_PI = math.pi


def read_vector_field_file(path: str) -> np.ndarray:
    """Parse an OpenFOAM vectorField file (positionsFile): a bare list of
    '(x y z)' entries, optionally preceded by a FoamFile header and count."""
    txt = open(path).read()
    txt = re.sub(r"/\*.*?\*/", "", txt, flags=re.S)
    txt = re.sub(r"//.*", "", txt)
    txt = re.sub(r"FoamFile\s*\{[^}]*\}", "", txt)
    vecs = re.findall(
        r"\(\s*([0-9eE+.\-]+)\s+([0-9eE+.\-]+)\s+([0-9eE+.\-]+)\s*\)", txt
    )
    return np.asarray(vecs, float)


class _BurstInjector(InjectorBase):
    """Common one-shot machinery: all parcels fire in the step crossing SOI."""

    def __init__(self, name, soi, positions, cells, U0, mass_total, size_d,
                 dtype):
        super().__init__(name, soi, 0.0)
        self.dtype = dtype
        self.positions = np.asarray(positions, float)
        self.cells = np.asarray(cells, np.int64)
        self.U0 = np.asarray(U0, float)
        self.mass_total = float(mass_total)
        self.size_sampler = _make_size_sampler(size_d)
        self.n = len(self.positions)

    def capacity_for_dt(self, dt_max: float) -> int:
        return max(1, self.n)

    def inject(self, st: Dict, key, t, dt, gas) -> Tuple[Dict, Dict]:
        dtp = self.dtype
        fire = (st["n_inj"] == 0) & (t + dt > self.soi)
        cap = self.max_per_step
        idx = jnp.arange(cap, dtype=INT_DTYPE)
        valid = fire & (idx < self.n)
        pos = np.zeros((cap, 3))
        pos[: self.n] = self.positions[:cap]
        cells = np.zeros(cap, np.int64)
        cells[: self.n] = self.cells[:cap]
        dia = self.size_sampler(key, cap).astype(dtp)
        mass_per = self.mass_total / max(self.n, 1)
        st = dict(st)
        st["n_inj"] = st["n_inj"] + jnp.where(fire, self.n, 0).astype(INT_DTYPE)
        cand = {
            "x": jnp.asarray(pos, dtp),
            "U": jnp.broadcast_to(jnp.asarray(self.U0, dtp), (cap, 3)),
            "d": dia,
            "cell": jnp.asarray(cells, INT_DTYPE),
            "valid": valid,
            "mass": jnp.where(valid, mass_per, 0.0),
        }
        return st, cand


class ManualInjection(_BurstInjector):
    """ManualInjection.H:30-38: parcels at positionsFile positions, all at
    SOI, diameters from the size distribution, velocity U0."""

    def __init__(self, name: str, d: FoamDict, walk, case, dtype):
        pf = str(d.lookup("positionsFile"))
        import os

        path = os.path.join(case.root, "constant", pf)
        positions = read_vector_field_file(path)
        cells = np.array([walk.find_cell_host(p) for p in positions])
        keep = cells >= 0
        super().__init__(
            name,
            d.get_scalar("SOI", 0.0),
            positions[keep],
            cells[keep],
            d.get_vector("U0"),
            d.get_scalar("massTotal", 0.0),
            d.get_dict("sizeDistribution"),
            dtype,
        )


class CellZoneInjection(_BurstInjector):
    """CellZoneInjection.H:33-40: numberDensity·V(zone) randomly-placed
    parcels in the cellZone, all at SOI, velocity U0."""

    def __init__(self, name: str, d: FoamDict, walk, case, geom, cell_zones,
                 dtype, seed=12):
        zone_name = str(d.lookup("cellZone"))
        zone = cell_zones.get(zone_name)
        if zone is None:
            raise ValueError(f"{name}: cellZone '{zone_name}' not found")
        zone = np.asarray(zone)
        V = np.asarray(geom.V)[zone]
        n_density = d.get_scalar("numberDensity")
        n = max(1, int(round(n_density * V.sum())))
        rng = np.random.default_rng(seed)
        # sample cells ∝ volume, uniform position within each cell's bbox
        # (CellZoneInjection::setPositions uses barycentric tet sampling;
        # box sampling matches to cell-size accuracy on hex meshes)
        pick = rng.choice(len(zone), size=n, p=V / V.sum())
        C = np.asarray(geom.C)[zone[pick]]
        h = (V[pick] ** (1.0 / 3.0))[:, None]
        positions = C + (rng.random((n, 3)) - 0.5) * h * 0.98
        super().__init__(
            name,
            d.get_scalar("SOI", 0.0),
            positions,
            zone[pick],
            d.get_vector("U0"),
            d.get_scalar("massTotal", 0.0),
            d.get_dict("sizeDistribution"),
            dtype,
        )


class FieldActivatedInjection(InjectorBase):
    """FieldActivatedInjection.H:33-43: injects parcelsPerInjector at each
    positionsFile position whenever factor·referenceField[cell] >
    thresholdField[cell], capped at nParcelsPerInjector per injector."""

    def __init__(self, name: str, d: FoamDict, walk, case, dtype):
        super().__init__(name, d.get_scalar("SOI", 0.0), 1e30)
        self.dtype = dtype
        import os

        pf = str(d.lookup("positionsFile"))
        positions = read_vector_field_file(os.path.join(case.root, "constant", pf))
        cells = np.array([walk.find_cell_host(p) for p in positions])
        keep = cells >= 0
        self.positions = positions[keep]
        self.cells = cells[keep]
        self.n_pos = len(self.positions)
        self.factor = d.get_scalar("factor", 1.0)
        self.ref_field = d.get_word("referenceField", "p")
        self.thr_field = d.get_word("thresholdField", "pMin")
        self.per_injector = d.get_int("nParcelsPerInjector", 1)
        self.U0 = np.asarray(d.get_vector("U0"), float)
        self.mass_total = d.get_scalar("massTotal", 0.0)
        self.size_sampler = _make_size_sampler(d.get_dict("sizeDistribution"))

    def capacity_for_dt(self, dt_max: float) -> int:
        return max(1, self.n_pos)

    def init_state(self) -> Dict:
        st = super().init_state()
        st["fired"] = jnp.zeros(self.n_pos, INT_DTYPE)
        return st

    def inject(self, st: Dict, key, t, dt, gas) -> Tuple[Dict, Dict]:
        dtp = self.dtype
        cells = jnp.asarray(self.cells, INT_DTYPE)
        ref = gas.get(self.ref_field, gas.get("p"))
        thr = gas.get(self.thr_field)
        if thr is None:
            gate = jnp.zeros(self.n_pos, bool)
        else:
            gate = self.factor * ref[cells] > thr[cells]
        can = (st["fired"] < self.per_injector) & gate & (t >= self.soi)
        n_new = jnp.sum(can).astype(INT_DTYPE)
        dia = self.size_sampler(key, self.n_pos).astype(dtp)
        mass_per = self.mass_total / max(self.n_pos * self.per_injector, 1)
        st = dict(st)
        st["fired"] = st["fired"] + can.astype(INT_DTYPE)
        st["n_inj"] = st["n_inj"] + n_new
        cand = {
            "x": jnp.asarray(self.positions, dtp),
            "U": jnp.broadcast_to(jnp.asarray(self.U0, dtp), (self.n_pos, 3)),
            "d": dia,
            "cell": cells,
            "valid": can,
            "mass": jnp.where(can, mass_per, 0.0),
        }
        return st, cand


class KinematicLookupTableInjection(InjectorBase):
    """KinematicLookupTableInjection.H:33-45: per-injector (x, U, d, rho,
    mDot) rows from the kinematicParcelInjectionData table in constant/,
    steady injection over the duration."""

    def __init__(self, name: str, d: FoamDict, walk, case, dtype):
        soi = d.get_scalar("SOI", 0.0)
        dur = d.get_scalar("duration")
        super().__init__(name, soi, dur)
        self.dtype = dtype
        import os

        fname = str(d.lookup("inputFile"))
        rows = self._read_table(os.path.join(case.root, "constant", fname))
        self.positions = np.asarray([r[0] for r in rows])
        self.U_rows = np.asarray([r[1] for r in rows])
        self.d_rows = np.asarray([r[2] for r in rows])
        self.rho_rows = np.asarray([r[3] for r in rows])
        self.mdot_rows = np.asarray([r[4] for r in rows])
        self.cells = np.array([walk.find_cell_host(p) for p in self.positions])
        self.pps = d.get_scalar("parcelsPerSecond")
        self.n_pos = len(rows)

    @staticmethod
    def _read_table(path: str):
        """Rows: ((x y z) (ux uy uz) d rho mDot)."""
        txt = open(path).read()
        txt = re.sub(r"/\*.*?\*/", "", txt, flags=re.S)
        txt = re.sub(r"//.*", "", txt)
        txt = re.sub(r"FoamFile\s*\{[^}]*\}", "", txt)
        num = r"[0-9eE+.\-]+"
        pat = re.compile(
            r"\(\s*\(\s*(%s)\s+(%s)\s+(%s)\s*\)\s*"
            r"\(\s*(%s)\s+(%s)\s+(%s)\s*\)\s*"
            r"(%s)\s+(%s)\s+(%s)\s*\)" % ((num,) * 9)
        )
        rows = []
        for m in pat.finditer(txt):
            v = [float(x) for x in m.groups()]
            rows.append((v[0:3], v[3:6], v[6], v[7], v[8]))
        if not rows:
            raise ValueError(f"no kinematicParcelInjectionData rows in {path}")
        return rows

    def capacity_for_dt(self, dt_max: float) -> int:
        return max(self.n_pos, int(math.ceil(self.pps * dt_max)) + 1)

    def inject(self, st: Dict, key, t, dt, gas) -> Tuple[Dict, Dict]:
        dtp = self.dtype
        cap = self.max_per_step
        el0 = jnp.clip(t - self.soi, 0.0, self.duration)
        el1 = jnp.clip(t + dt - self.soi, 0.0, self.duration)
        want = jnp.floor(el1 * self.pps).astype(INT_DTYPE) - st["n_inj"]
        n_new = jnp.clip(want, 0, cap)
        idx = jnp.arange(cap, dtype=INT_DTYPE)
        valid = idx < n_new
        row = (st["n_inj"] + idx) % self.n_pos
        # per-row mass rate share over the firing window
        mdot = jnp.asarray(self.mdot_rows, dtp)[row]
        owed = st["m_owed"] + jnp.sum(jnp.asarray(self.mdot_rows, dtp)) * (el1 - el0)
        w = mdot / jnp.maximum(jnp.sum(jnp.where(valid, mdot, 0.0)), small())
        st = {
            "n_inj": st["n_inj"] + n_new,
            "m_owed": jnp.where(n_new > 0, 0.0, owed),
        }
        cand = {
            "x": jnp.asarray(self.positions, dtp)[row],
            "U": jnp.asarray(self.U_rows, dtp)[row],
            "d": jnp.asarray(self.d_rows, dtp)[row],
            "cell": jnp.asarray(self.cells, INT_DTYPE)[row],
            "valid": valid,
            "mass": jnp.where(valid, owed * w, 0.0),
        }
        return st, cand


def _parse_nested(path: str):
    """Parse an OpenFOAM parcel-injection-data file into nested float
    lists (comments/FoamFile headers stripped, list-size counts dropped)."""
    txt = open(path).read()
    txt = re.sub(r"/\*.*?\*/", "", txt, flags=re.S)
    txt = re.sub(r"//.*", "", txt)
    txt = re.sub(r"FoamFile\s*\{[^}]*\}", "", txt)
    stack = [[]]
    for tok in re.findall(r"[()]|[^\s();]+", txt):
        if tok == "(":
            stack.append([])
        elif tok == ")":
            v = stack.pop()
            stack[-1].append(v)
        else:
            try:
                stack[-1].append(float(tok))
            except ValueError:
                pass  # words (class names, identifiers)
    return stack[0]


def _find_rows(tree, min_scalars: int):
    """Locate injection rows: lists starting with two 3-vectors followed
    by >= min_scalars scalars ((x y z) (ux uy uz) d rho mDot [T cp] ...)."""

    def is_vec3(v):
        return isinstance(v, list) and len(v) == 3 and all(
            isinstance(e, float) for e in v
        )

    rows = []

    def visit(node):
        if not isinstance(node, list):
            return
        if (
            len(node) >= 2 + min_scalars
            and is_vec3(node[0])
            and is_vec3(node[1])
            and all(isinstance(e, float) for e in node[2 : 2 + min_scalars])
        ):
            rows.append(node)
            return
        for e in node:
            visit(e)

    visit(tree)
    return rows


class ThermoLookupTableInjection(KinematicLookupTableInjection):
    """ThermoLookupTableInjection.H:33-45: kinematic lookup-table rows
    extended with per-parcel T and cp
    (thermoParcelInjectionDataIO.C: ((x) (U) d rho mDot T cp)). T and cp
    seed the injected parcel temperature and heat capacity (reference
    setParcelProperties → ThermoParcel T_/Cp_); with heat transfer on,
    cp thereafter follows the liquid property law cp(T) — the same
    composition-model update the reference's ReactingParcel applies."""

    @staticmethod
    def _read_table(path: str):
        rows = [
            r
            for r in _find_rows(_parse_nested(path), 5)
            if len(r) >= 7
            and isinstance(r[5], float)
            and isinstance(r[6], float)
        ]
        if not rows:
            raise ValueError(f"no thermoParcelInjectionData rows in {path}")
        return [(r[0], r[1], r[2], r[3], r[4], r[5], r[6]) for r in rows]

    def __init__(self, name: str, d: FoamDict, walk, case, dtype):
        super().__init__(name, d, walk, case, dtype)
        import os

        fname = str(d.lookup("inputFile"))
        rows = self._read_table(os.path.join(case.root, "constant", fname))
        self.T_rows = np.asarray([r[5] for r in rows])
        self.cp_rows = np.asarray([r[6] for r in rows])

    def inject(self, st, key, t, dt, gas):
        st, cand = super().inject(st, key, t, dt, gas)
        # reconstruct the row indices the parent drew (it already advanced
        # n_inj by the number of valid candidates)
        idx = jnp.arange(cand["valid"].shape[0], dtype=INT_DTYPE)
        row = (st["n_inj"] - jnp.sum(cand["valid"].astype(INT_DTYPE)) + idx) % self.n_pos
        cand = dict(cand)
        cand["T"] = jnp.asarray(self.T_rows, self.dtype)[row]
        cand["cp"] = jnp.asarray(self.cp_rows, self.dtype)[row]
        return st, cand


class ReactingLookupTableInjection(ThermoLookupTableInjection):
    """ReactingLookupTableInjection.H:33-45: thermo rows + a per-parcel
    composition list (reactingParcelInjectionDataIO.C:
    ((x) (U) d rho mDot T cp (Y...))). Y is the phase-mixture split in
    the composition dict's phase order (gas, liquid, solid — filtered to
    the phases present); the cloud seeds the per-parcel n-phase ledger
    (mv/ms lanes, lagrangian/devolatilisation.py) from it."""

    @staticmethod
    def _read_table(path: str):
        rows = [
            r
            for r in _find_rows(_parse_nested(path), 5)
            if len(r) >= 8
            and isinstance(r[5], float)
            and isinstance(r[6], float)
        ]
        if not rows:
            raise ValueError(
                f"no reactingParcelInjectionData rows in {path}"
            )
        out = []
        for r in rows:
            lists = [e for e in r[7:] if isinstance(e, list)]
            Y = lists[0] if lists else [1.0]
            out.append((r[0], r[1], r[2], r[3], r[4], r[5], r[6], Y))
        return out

    def __init__(self, name: str, d: FoamDict, walk, case, dtype):
        super().__init__(name, d, walk, case, dtype)
        import os

        fname = str(d.lookup("inputFile"))
        rows = self._read_table(os.path.join(case.root, "constant", fname))
        nY = max(len(r[7]) for r in rows)
        Y = np.zeros((len(rows), nY))
        for i, r in enumerate(rows):
            Y[i, : len(r[7])] = r[7]
        s = Y.sum(1, keepdims=True)
        self.Y_rows = Y / np.maximum(s, 1e-300)

    def inject(self, st, key, t, dt, gas):
        st, cand = super().inject(st, key, t, dt, gas)
        idx = jnp.arange(cand["valid"].shape[0], dtype=INT_DTYPE)
        row = (st["n_inj"] - jnp.sum(cand["valid"].astype(INT_DTYPE)) + idx) % self.n_pos
        cand = dict(cand)
        cand["Yphase"] = jnp.asarray(self.Y_rows, self.dtype)[row]
        return st, cand


class ReactingMultiphaseLookupTableInjection(ReactingLookupTableInjection):
    """ReactingMultiphaseLookupTableInjection.H:33-45: reacting rows +
    within-phase component splits
    (reactingMultiphaseParcelInjectionDataIO.C:
    ((x) (U) d rho mDot T cp (Y) (YGas) (YLiquid) (YSolid)))."""

    @staticmethod
    def _read_table(path: str):
        rows = [
            r
            for r in _find_rows(_parse_nested(path), 5)
            if len(r) >= 8
            and isinstance(r[5], float)
            and isinstance(r[6], float)
        ]
        if not rows:
            raise ValueError(
                f"no reactingMultiphaseParcelInjectionData rows in {path}"
            )
        out = []
        for r in rows:
            lists = [e for e in r[7:] if isinstance(e, list)]
            while len(lists) < 4:
                lists.append([1.0])
            out.append(tuple(r[:7]) + tuple(lists[:4]))
        return out

    def __init__(self, name: str, d: FoamDict, walk, case, dtype):
        super().__init__(name, d, walk, case, dtype)
        import os

        fname = str(d.lookup("inputFile"))
        rows = self._read_table(os.path.join(case.root, "constant", fname))

        def pack(col):
            nW = max(len(r[col]) for r in rows)
            M = np.zeros((len(rows), nW))
            for i, r in enumerate(rows):
                M[i, : len(r[col])] = r[col]
            s = M.sum(1, keepdims=True)
            return M / np.maximum(s, 1e-300)

        self.Ygas_rows = pack(8)
        self.Yliq_rows = pack(9)
        self.Ysol_rows = pack(10)

    def inject(self, st, key, t, dt, gas):
        st, cand = super().inject(st, key, t, dt, gas)
        idx = jnp.arange(cand["valid"].shape[0], dtype=INT_DTYPE)
        row = (st["n_inj"] - jnp.sum(cand["valid"].astype(INT_DTYPE)) + idx) % self.n_pos
        cand = dict(cand)
        cand["YGas"] = jnp.asarray(self.Ygas_rows, self.dtype)[row]
        cand["YLiquid"] = jnp.asarray(self.Yliq_rows, self.dtype)[row]
        cand["YSolid"] = jnp.asarray(self.Ysol_rows, self.dtype)[row]
        return st, cand


class ConeNozzleInjection(ConeInjection):
    """ConeNozzleInjection.H:33-57: cone spray from a disc nozzle — like
    ConeInjection but a single position with disc-sampled start points
    (outerDiameter/innerDiameter) and flow-rate-based velocity
    (Umag = mdot/(rho·Cd·A) for the flowRateAndDischarge option)."""

    def __init__(self, name: str, d: FoamDict, walk, dtype):
        dd = FoamDict(d)
        pos = d.get_vector("position")
        axis = d.get_vector("direction")
        dd["positionAxis"] = [[list(pos), list(axis)]]
        if not d.found("Umag"):
            # flowRateAndDischarge: U = ṁ/(ρ·Cd·A_outer)
            do = d.get_scalar("outerDiameter")
            di = d.get_scalar("innerDiameter", 0.0)
            A = _PI / 4.0 * (do**2 - di**2)
            Cd = _constant_profile(d, "Cd") if d.found("Cd") else 0.9
            rho_l = d.get_scalar("rhoInjection", 1000.0)
            mdot = d.get_scalar("massTotal", 0.0) / max(
                d.get_scalar("duration"), small()
            )
            dd["Umag"] = mdot / (rho_l * Cd * A)
        super().__init__(name, dd, walk, dtype)
        self.outer_d = d.get_scalar("outerDiameter")
        self.inner_d = d.get_scalar("innerDiameter", 0.0)

    def inject(self, st, key, t, dt, gas):
        key, kd = jax.random.split(key)
        st, cand = super().inject(st, key, t, dt, gas)
        # spread start positions over the nozzle disc
        dtp = self.dtype
        cap = cand["x"].shape[0]
        k1, k2 = jax.random.split(kd)
        r = jnp.sqrt(
            jax.random.uniform(k1, (cap,), dtype=dtp)
            * ((self.outer_d / 2) ** 2 - (self.inner_d / 2) ** 2)
            + (self.inner_d / 2) ** 2
        )
        beta = jax.random.uniform(k2, (cap,), dtype=dtp) * 2 * _PI
        e1 = jnp.asarray(self.frames[0, 0], dtp)
        e2 = jnp.asarray(self.frames[0, 1], dtp)
        offs = r[:, None] * (jnp.cos(beta)[:, None] * e1 + jnp.sin(beta)[:, None] * e2)
        cand = dict(cand)
        cand["x"] = cand["x"] + offs
        return st, cand


class NoInjection(InjectorBase):
    """NoInjection.H: place-holder, injects nothing."""

    def __init__(self, name: str, d: FoamDict, dtype):
        super().__init__(name, 0.0, 0.0)
        self.dtype = dtype

    def capacity_for_dt(self, dt_max: float) -> int:
        return 1

    def inject(self, st, key, t, dt, gas):
        dtp = self.dtype
        cand = {
            "x": jnp.zeros((1, 3), dtp),
            "U": jnp.zeros((1, 3), dtp),
            "d": jnp.full((1,), 1e-6, dtp),
            "cell": jnp.zeros((1,), INT_DTYPE),
            "valid": jnp.zeros((1,), bool),
            "mass": jnp.zeros((1,), dtp),
        }
        return st, cand


class InflationInjection(InjectorBase):
    """InflationInjection.H:33-47 (used subset): parcels appear in the
    'generation' cellZone at a volume flow rate given by the flowRate
    TimeFunction1, with diameters growing from dSeed toward the size
    distribution at growthRate. The full model seeds from EXISTING parcels;
    this reproduces the injection-rate contract (volume accounting +
    growth-limited initial diameters), which is what the solver couples to."""

    def __init__(self, name: str, d: FoamDict, walk, case, geom, cell_zones,
                 dtype, seed=13):
        soi = d.get_scalar("SOI", 0.0)
        dur = d.get_scalar("duration")
        super().__init__(name, soi, dur)
        self.dtype = dtype
        zone_name = str(d.lookup("generationCellZone", d.lookup("cellZone", "")))
        zone = cell_zones.get(zone_name)
        if zone is None:
            raise ValueError(f"{name}: cellZone '{zone_name}' not found")
        zone = np.asarray(zone)
        self.zone = zone
        self.flow_rate = _constant_profile(d, "flowRate")  # m³/s
        self.growth_rate = _constant_profile(d, "growthRate")  # m/s
        self.d_seed = d.get_scalar("dSeed", 1e-4)
        self.pps = d.get_scalar("parcelsPerSecond", 1000.0)
        self.size_sampler = _make_size_sampler(d.get_dict("sizeDistribution"))
        rng = np.random.default_rng(seed)
        V = np.asarray(geom.V)[zone]
        n_prep = 4096
        pick = rng.choice(len(zone), size=n_prep, p=V / V.sum())
        C = np.asarray(geom.C)[zone[pick]]
        h = (V[pick] ** (1.0 / 3.0))[:, None]
        self.prep_pos = C + (rng.random((n_prep, 3)) - 0.5) * h * 0.98
        self.prep_cells = zone[pick]
        self.rho_ref = d.get_scalar("rhoInjection", 1000.0)

    def capacity_for_dt(self, dt_max: float) -> int:
        return max(1, int(math.ceil(self.pps * dt_max)) + 1)

    def inject(self, st: Dict, key, t, dt, gas) -> Tuple[Dict, Dict]:
        dtp = self.dtype
        cap = self.max_per_step
        el0 = jnp.clip(t - self.soi, 0.0, self.duration)
        el1 = jnp.clip(t + dt - self.soi, 0.0, self.duration)
        want = jnp.floor(el1 * self.pps).astype(INT_DTYPE) - st["n_inj"]
        n_new = jnp.clip(want, 0, cap)
        vol_new = self.flow_rate * (el1 - el0)
        idx = jnp.arange(cap, dtype=INT_DTYPE)
        valid = idx < n_new
        row = (st["n_inj"] + idx) % self.prep_pos.shape[0]
        ks = jax.random.split(key, 2)
        d_tgt = self.size_sampler(ks[0], cap).astype(dtp)
        # growth-limited: d = min(dSeed + growthRate·age_since_SOI, d_target)
        dia = jnp.minimum(self.d_seed + self.growth_rate * el1, d_tgt)
        owed = st["m_owed"] + vol_new * self.rho_ref
        mass_per = jnp.where(n_new > 0, owed / jnp.maximum(n_new, 1), 0.0)
        st = {
            "n_inj": st["n_inj"] + n_new,
            "m_owed": jnp.where(n_new > 0, 0.0, owed),
        }
        cand = {
            "x": jnp.asarray(self.prep_pos, dtp)[row],
            "U": jnp.zeros((cap, 3), dtp),
            "d": dia,
            "cell": jnp.asarray(self.prep_cells, INT_DTYPE)[row],
            "valid": valid,
            "mass": jnp.where(valid, mass_per, 0.0),
        }
        return st, cand
