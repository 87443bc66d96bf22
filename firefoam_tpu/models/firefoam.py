"""The fireFoam solver: buoyant reacting LES with PIMPLE pressure coupling.

TPU-native re-design of the reference solver loop (solver/fireFoam.C:51-141):
one `State` pytree, one jit-compiled `step(state) → (state, log)` containing
rhoEqn → PIMPLE{ UEqn, YEEqn (species+energy), nCorr×pEqn, kEqn } with
adaptive Δt, matching the equation set of:
  solver/rhoEqn.H:32-46   continuity
  solver/UEqn.H:1-34      momentum with buoyancy flux reconstruction
  solver/YEEqn.H:1-119    multivariate species + sensible-enthalpy energy
  solver/pEqn.H:1-60      p_rgh PISO corrector with hydrostatic splitting
  solver/phrghEqn.H:1-62  hydrostatic initialisation
  solver/setMultiRegionDeltaT.H:34-63  Courant-limited Δt growth

Spray/film/pyrolysis sources enter through the `sources` hook (zero for the
steckler gas slice: film=none, pyrolysis=none, cloud inactive per
cases/steckler/constant/reactingCloud1Properties 'active false').
Radiation: coupled through radiation.Sh (fvDOM module); falls back to an
optically-thin radiant-fraction sink when fvDOM is disabled.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..combustion.edm import EddyDissipationModel
from ..config import real_dtype, small
from ..io import Case, read_field_file
from ..io.foamdict import FoamDict, expand_env
from ..mesh import build_case_mesh
from ..ops import MeshGeometry, SurfaceField, VolField
from ..ops import bcs as bcmod
from ..ops import fvc, fvm
from ..ops.bcs import FieldBCs, make_field_bcs, initial_boundary
from ..solvers.linear import solve_scalar
from ..thermo import GasThermo, SingleStepReaction
from ..turbulence.kEqn import KEqnLES

__all__ = ["FireFoamSolver"]


def spalding_utau(mag_up, mag_grad_u, nuw, y, kappa=0.41, E=9.8):
    """u_τ from Spalding's unified wall law by Newton iteration
    (nutUSpaldingWallFunctionFvPatchScalarField::calcUTau)."""
    tiny = jnp.finfo(jnp.asarray(mag_up).dtype).tiny * 1e6
    ut = jnp.sqrt(nuw * mag_grad_u)
    # the reference caps at 10 Newton steps with a 1% step-change exit;
    # a fixed 30 steps is jit-friendly and strictly tighter
    for _ in range(30):
        ut_s = jnp.maximum(ut, tiny)
        kuu = jnp.minimum(kappa * mag_up / ut_s, 50.0)
        fkuu = jnp.exp(kuu) - 1.0 - kuu * (1.0 + 0.5 * kuu)
        f = -ut_s * y / nuw + mag_up / ut_s + 1.0 / E * (fkuu - kuu ** 3 / 6.0)
        df = y / nuw + mag_up / ut_s ** 2 + 1.0 / E * kuu * fkuu / ut_s
        ut = jnp.maximum(ut_s + f / jnp.maximum(df, tiny), 0.0)
    return ut


def _solver_controls(fv_solution: FoamDict, *names: str) -> dict:
    """Look up solver controls, trying name variants in order (cases differ:
    steckler has Ux/Uy/Uz entries, wallFireSpread2D a single U entry)."""
    solvers = fv_solution.get_dict("solvers")
    d = None
    for name in names:
        d = solvers.lookup(name, None)
        if d is not None:
            break
    if d is None:
        raise KeyError(f"none of {names} found in fvSolution solvers")
    solver = str(d.lookup("solver"))
    return {
        "solver": solver,
        "tolerance": d.get_scalar("tolerance", 1e-6),
        "relTol": d.get_scalar("relTol", 0.0),
        "maxIter": int(d.get_scalar("maxIter", 1000)),
        "preconditioner": str(d.lookup("preconditioner", "") or ""),
        "smoother": str(d.lookup("smoother", "") or ""),
        "nSweeps": int(d.get_scalar("nSweeps", 1)),
    }


@dataclass
class Controls:
    dt0: float
    end_time: float
    adjust: bool
    max_co: float
    max_dt: float
    write_interval: float
    adjustable_write: bool
    n_correctors: int
    n_outer: int
    momentum_predictor: bool
    hydrostatic_init: bool
    n_hydrostatic: int


class FireFoamSolver:
    """Host-side case setup + jitted step factory (the flagship model)."""

    def __init__(self, case_dir: str, dtype=None, radiation=None,
                 local=None, enable_cloud=True):
        """local: a parallel.localize.LocalContext — builds this instance
        over ONE partition's extended geometry for the explicit-SPMD step
        (parallel/spmd_step.py); all geometry-derived constants then come
        out partition-local and the step traces with ppermute/psum
        collectives inside."""
        self.dtype = dtype or real_dtype()
        self._local = local
        self.case = Case(case_dir)
        if local is not None:
            self.cm = local.cm
            self.geom = local.geom
        else:
            self.cm = build_case_mesh(case_dir)
            self.geom = MeshGeometry.from_polymesh(self.cm.mesh, dtype=self.dtype)
        g = self.geom

        # ---- thermo / chemistry ----
        tp = self.case.constant("thermophysicalProperties")
        self.fuel = tp.get_word("fuel", "C3H8")
        self.inert = tp.get_word("inertSpecie", "N2")
        rx_path = expand_env(str(tp.lookup("foamChemistryFile")), case_dir)
        th_path = expand_env(str(tp.lookup("foamChemistryThermoFile")), case_dir)
        from ..io.foamdict import parse_file

        rx = parse_file(rx_path, case_dir=case_dir)
        self.species: List[str] = [str(s) for s in rx.get_list("species")]
        self.gas = GasThermo.from_dict(parse_file(th_path, case_dir=case_dir), self.species)
        # additional thermo flags (solver/readAdditionalThermo.H:32-59):
        # lewisNo scales the molecular part of the species diffusivity,
        # constD+DM replaces it outright, XEff is the combustion efficiency
        # (read by the reference solver; no consumer in its fire loop)
        self.lewis_no = tp.get_scalar("lewisNo", 1.0)
        self.const_D = tp.get_bool("constD", False)
        _dm = tp.lookup("DM", 0.0)
        self.DM = float(_dm[-1]) if isinstance(_dm, list) else float(_dm or 0.0)
        self.x_eff = tp.get_scalar("XEff", 1.0)
        self.reaction = SingleStepReaction.from_case(rx, self.gas, self.fuel, self.inert)
        self.combustion = EddyDissipationModel.from_case(
            self.case.constant("combustionProperties"), self.reaction
        )
        if self.combustion.variant == "eddyDissipationIgnModel":
            # pilot heat field dQI masked to the 'igniter' cellZone
            # (eddyDissipationIgnModel::correct)
            try:
                dqi_f, _ = self._read_field("dQI")
                nC_g = g.n_cells if local is None else local.global_geom.n_cells
                mask = np.zeros(nC_g)
                zone = self.cm.sets.cell_zones.get("igniter")
                if zone is not None:
                    mask[np.asarray(zone)] = 1.0
                if local is not None:
                    mask = local.lz.cells(mask)[local.p]
                self.combustion.ign_dQI = np.asarray(dqi_f.i) * mask
            except Exception:
                pass

        # ---- turbulence ----
        self.turb = KEqnLES.from_case(
            g,
            self.case.constant("turbulenceProperties"),
            les_props=(
                self.case.constant("LESProperties")
                if self.case.has_constant("LESProperties")
                else None
            ),
        )

        # ---- radiation (fvDOM/P1, selected from constant/radiationProperties) ----
        rad_props = (
            self.case.constant("radiationProperties")
            if self.case.has_constant("radiationProperties")
            else FoamDict()
        )
        self.rad_on = bool(rad_props) and rad_props.get_bool("radiation", False)
        if radiation is True or (radiation is None and self.rad_on):
            from ..radiation import make_radiation

            self.radiation = (
                make_radiation(rad_props, g, self.case) if self.rad_on else None
            )
        elif radiation is False:
            self.radiation = None
        else:
            self.radiation = radiation
        if self.radiation is not None and hasattr(self.radiation, "ae_model"):
            # spSootRadFracEmission needs the reaction + SGS dissipation for
            # its strain-rate/flamelet table lookup
            self.radiation.reaction = self.reaction
            self.radiation.epsilon_fn = lambda st: self.turb.epsilon(st["k"].i)
        # soot model owned by the radiation model (radiationModel.C:222-225)
        from ..radiation.soot import make_soot_model

        self.soot = make_soot_model(rad_props, self.reaction)
        # optically-thin fallback radiant fraction (constRadFractionEmission
        # EhrrCoeff — cases/steckler/constant/radiationProperties)
        aec = rad_props.get_dict("constRadFractionEmissionCoeffs", FoamDict())
        self.ehrr = aec.get_scalar("Ehrr2", aec.get_scalar("EhrrCoeff", 0.2))

        # ---- gravity / reference values ----
        gdict = self.case.constant("g")
        self.g_vec = np.asarray(gdict.get_vector("value"))
        href = self.case.constant("hRef").get_scalar("value", 0.0) if self.case.has_constant("hRef") else 0.0
        mag_g = np.linalg.norm(self.g_vec)
        gh_ref = -float(mag_g) * float(href)  # OpenFOAM: ghRef = −|g|·hRef
        self.gh = jnp.asarray(np.asarray(g.C) @ self.g_vec - gh_ref, self.dtype)
        self.ghf_i = jnp.asarray(np.asarray(g.Cf) @ self.g_vec - gh_ref, self.dtype)
        self.ghf_b = jnp.asarray(np.asarray(g.b_Cf) @ self.g_vec - gh_ref, self.dtype)
        self.p_ref = (
            self.case.constant("pRef").get_scalar("value", 101325.0)
            if self.case.has_constant("pRef")
            else 101325.0
        )

        # ---- controls ----
        cd = self.case.control_dict
        pimple = self.case.fv_solution.get_dict("PIMPLE")
        self.ctl = Controls(
            dt0=cd.get_scalar("deltaT"),
            end_time=cd.get_scalar("endTime"),
            adjust=cd.get_bool("adjustTimeStep", False),
            max_co=cd.get_scalar("maxCo", 1.0),
            max_dt=cd.get_scalar("maxDeltaT", 1e6),
            write_interval=cd.get_scalar("writeInterval", 1.0),
            adjustable_write=str(cd.lookup("writeControl", "timeStep")) == "adjustableRunTime",
            n_correctors=pimple.get_int("nCorrectors", 2),
            n_outer=pimple.get_int("nOuterCorrectors", 1),
            momentum_predictor=pimple.get_bool("momentumPredictor", True),
            hydrostatic_init=pimple.get_bool("hydrostaticInitialization", False),
            n_hydrostatic=pimple.get_int("nHydrostaticCorrectors", 5),
        )
        self.fv_solution = self.case.fv_solution
        # ---- laplacian scheme (fvSchemes laplacianSchemes default):
        # 'Gauss linear uncorrected' (all five reference cases — exact on
        # their orthogonal block meshes) | '... corrected' | '... limited α'.
        # corrected/limited engage the deferred non-orthogonal correction
        # (fvm.laplacian corr=fvc.non_orth_correction) on every implicit
        # laplacian in the step.
        self.lap_limiter: Optional[float] = None
        try:
            lsch = self.case.fv_schemes.get_dict("laplacianSchemes").lookup(
                "default", ""
            )
            toks = [str(t) for t in lsch] if isinstance(lsch, list) else [str(lsch)]
            if "corrected" in toks:
                self.lap_limiter = 1.0
            elif "limited" in toks:
                i = toks.index("limited")
                self.lap_limiter = (
                    float(toks[i + 1]) if i + 1 < len(toks) else 1.0
                )
        except Exception:
            pass
        self.turb.lap_limiter = self.lap_limiter
        # ---- div schemes (fvSchemes divSchemes): the reference cases vary
        # per-case — steckler/singleBox/detailedSprinklerInjection use
        # 'Gauss LUST grad(U)' for div(phi,U) while pyrolysis1D and
        # wallFireSpread2D use 'Gauss filteredLinear2V 0.2 0.05'; div(phi,k)
        # is 'Gauss limitedLinear 1' everywhere. Honour the dict instead of
        # hardcoding (unknown schemes on these keys raise — no silent
        # substitution).
        self.u_div_scheme = self._parse_div_scheme("div(phi,U)", ("LUST",))
        self.turb.div_scheme = self._parse_div_scheme(
            "div(phi,k)", ("limitedLinear", 1.0)
        )
        # ---- AMG hierarchy for the pressure solve (the GAMG role) ----
        # used when the case dict selects GAMG, when FIREFOAM_TPU_AMG=1, or
        # automatically above 50k cells where diagonal-PCG's O(√n) iteration
        # growth loses to the near-mesh-independent V-cycle (VERDICT: golden
        # log DICPCG does 18-25 iters; diag-PCG needs 67-84 at 9k cells and
        # grows with n).
        # wavefront LDU schedule for OpenFOAM-exact DIC-PCG / symGaussSeidel
        # (solvers/dic.py) — built once per mesh from the original face order.
        # Default: on for f64 (the reference-matching fidelity path), off for
        # f32 (the TPU perf path keeps the flat Krylov/AMG solvers — the
        # level-scheduled triangular sweeps serialize ~60 steps per
        # application, a poor fit for the MXU). FIREFOAM_TPU_EXACT_SOLVERS
        # overrides either way.
        _ex = os.environ.get("FIREFOAM_TPU_EXACT_SOLVERS", "")
        if local is not None:
            # the explicit-SPMD path runs the flat psum-Krylov solvers; the
            # wavefront LDU schedule is a global-topology object
            self._ldu = None
        elif _ex == "1" or (_ex != "0" and self.dtype == jnp.float64):
            from ..solvers.dic import build_schedule

            _nIr = self.cm.mesh.n_internal_faces
            self._ldu = build_schedule(
                np.asarray(self.cm.mesh.owner[:_nIr]),
                np.asarray(self.cm.mesh.neighbour),
                g.n_cells,
                perm=g.face_perm,
            )
        else:
            self._ldu = None

        # cells adjacent to wall patches (BertExt's nearWallCells gate)
        _nw = np.zeros(g.n_cells, bool)
        _bv = np.asarray(getattr(g, "b_valid", None) if local is not None else None) \
            if local is not None else None
        for pch in g.patches:
            if "wall" in (pch.ptype or "").lower():
                o = np.asarray(g.b_own)[pch.slice]
                if _bv is not None:
                    o = o[_bv[pch.slice] > 0]
                _nw[o] = True
        self._near_wall_mask = jnp.asarray(_nw)

        # lattice geometric multigrid (the GAMG role on structured DIA
        # meshes): mesh-independent p_rgh iterations — 14 vs 124 diag-CG
        # at 500k cells. Auto above the small-mesh crossover where the
        # flat/fused CG's fewer-kernels-per-iteration still wins.
        self.gmg = None
        gmg_env = os.environ.get("FIREFOAM_TPU_GMG", "auto")
        if (
            gmg_env != "0"
            and local is None
            and getattr(g, "layout", "seg") == "dia"
            and (gmg_env == "1" or g.n_cells >= 50000)
        ):
            from ..solvers.gmg import LatticeMG

            # level-schedule knob: a larger dense coarsest (solved by one
            # Newton-Schulz-inverse matmul — MXU work) trades away the
            # smallest V-cycle levels, whose many tiny kernels are
            # dispatch-latency-bound at mid mesh sizes
            self.gmg = LatticeMG.build(
                g.offsets, g.n_cells,
                n_coarsest=int(
                    os.environ.get("FIREFOAM_TPU_GMG_COARSEST", "64")
                ),
            )
        # sharded lattice multigrid inside the EXPLICIT-SPMD step (the
        # reference's GAMG-under-decomposePar production configuration,
        # cases/steckler/system/fvSolution:63-71 + decompose.sh:2-4):
        # when the partitioner decomposed a cuboid lattice in z-slabs,
        # p_rgh dispatches to parallel/sharded_gmg.py — mesh-independent
        # iterations with one ring-ppermute plane halo per matvec, vs the
        # flat psum-Krylov's O(sqrt n) iteration cliff at pod scale.
        self._sgmg = None
        if local is not None and gmg_env != "0":
            sl = local.slab_info()
            n_glob = self.cm.mesh.n_cells
            if sl is not None and (gmg_env == "1" or n_glob >= 50000):
                from ..parallel.sharded_gmg import ShardedLatticeMG

                dims, n_parts, maps = sl
                mg = ShardedLatticeMG.build(dims, n_parts,
                                            axis_name=local.axis)
                if mg is not None:
                    self._sgmg = (
                        mg,
                        {a: jnp.asarray(ix) for a, ix in maps.items()},
                    )
        # index-pair (lane-preserving) multigrid — the GAMG role for
        # UNSTRUCTURED meshes on the hybrid layout (solvers/pairmg.py):
        # pairs cells along lane offsets so every V-cycle level keeps the
        # roll/shift + banded-rest fast paths (pairwise agglomeration AMG
        # collapses the lane structure and serializes — docs/PERF.md).
        # Mesh-independent p_rgh iterations vs the flat CG's 41-90 at
        # 117k castellated cells.
        self.pairmg = None
        pmg_env = os.environ.get("FIREFOAM_TPU_PAIRMG", "auto")
        if (
            pmg_env != "0"
            and local is None
            and getattr(g, "layout", "seg") == "hybrid"
            and (pmg_env == "1" or g.n_cells >= 50000)
        ):
            from ..solvers.pairmg import PairMG

            self.pairmg = PairMG.from_geom(g)
        self.amg = None
        try:
            _pc = _solver_controls(self.fv_solution, "p_rgh")
            amg_env = os.environ.get("FIREFOAM_TPU_AMG", "")
            # small DIA meshes on the f32 TPU path solve p_rgh fastest with
            # the whole-solve fused Pallas CG (one VMEM-resident kernel —
            # measured 477 vs 399 M cell-updates/s on steckler against the
            # V-cycle); AMG's near-mesh-independent iterations win past the
            # crossover where the extra CG iterations outgrow the V-cycle
            pallas_p = False
            if getattr(g, "layout", "seg") == "dia" and self.dtype != jnp.float64:
                from ..solvers import pallas_cg as _pcg_mod

                pallas_p = _pcg_mod.enabled("dia", g.n_cells)
            # fused whole-solve CG serves p_rgh from ~50k cells up to the
            # VMEM cap (one launch per solve — the V-cycle's many small
            # level kernels are dispatch-latency-bound there); AMG remains
            # the path for meshes past the fused VMEM cap and for CPU/f64
            want_amg = (
                amg_env == "1"
                or (amg_env != "0" and g.n_cells >= 50000 and not pallas_p)
                or (
                    amg_env != "0"
                    and not pallas_p
                    and (_pc["solver"] == "GAMG" or self._ldu is None)
                )
            )
            # hybrid-layout meshes: the AMG hierarchy's own matvecs are
            # still segment_sum-serialized on TPU (~12 ms/level-0 apply at
            # 117k), which makes the V-cycle SLOWER than flat CG through
            # the layout's banded primitives; keep flat Krylov until the
            # hierarchy runs on per-level banded plans (env =1 overrides)
            if getattr(g, "layout", "seg") == "hybrid" and amg_env != "1":
                want_amg = False
        except KeyError:
            want_amg = False
        if local is not None or self.gmg is not None:
            want_amg = False
        if want_amg:
            from ..solvers.amg import AMGHierarchy

            self.amg = AMGHierarchy.build(
                np.asarray(g.own), np.asarray(g.nei),
                np.asarray(g.magSf), g.n_cells,
            )
        # equation relaxation (fvMatrix::relax — applied only when an
        # `relaxationFactors { equations { ... } }` entry names the field;
        # relax(1) still enforces diagonal dominance, so absence ≠ 1.0)
        rf = self.fv_solution.get_dict("relaxationFactors", FoamDict())
        self._eq_relax = rf.get_dict("equations", None)

        # ---- Lagrangian spray cloud (solver/createClouds.H:1-9) ----
        self.cloud = None
        if not enable_cloud:
            pass
        elif self.case.has_constant("reactingCloud1Properties"):
            props = self.case.constant("reactingCloud1Properties")
            if props.get_dict("solution").get_bool("active", True):
                from ..lagrangian.cloud import ReactingCloud
                from ..lagrangian.tracking import WalkMesh

                if local is not None:
                    # partition-local tracking mesh + migration identity;
                    # injector tables stay GLOBAL (built over walk_g) and
                    # are remapped at injection time
                    walk = local.walk_local(self.dtype)
                    part = local.part_info()
                    inj_walk = local.walk_g
                else:
                    walk = WalkMesh.from_polymesh(self.cm.mesh, dtype=self.dtype)
                    part = inj_walk = None
                self.cloud = ReactingCloud(
                    "reactingCloud1", props, walk, g, self.case, self.gas,
                    self.g_vec, dt_max=min(self.ctl.max_dt, 0.1), dtype=self.dtype,
                    cell_zones=getattr(self.cm.sets, "cell_zones", None),
                    part=part, inj_walk=inj_walk,
                )

        # ---- additional controls + pyrolysis regions ----
        ac = (
            self.case.constant("additionalControls")
            if self.case.has_constant("additionalControls")
            else FoamDict()
        )
        self.solve_primary = ac.get_bool("solvePrimaryRegion", True)
        self.solve_pyrolysis = ac.get_bool("solvePyrolysisRegion", True)
        self.max_di = cd.get_scalar("maxDi", 10.0)
        self.pyrolysis = None
        if self.solve_pyrolysis and self.case.has_constant("pyrolysisZones"):
            from ..regionmodels.pyrolysis import PyrolysisCollection

            coll = PyrolysisCollection(case_dir, self.cm, self.dtype)
            if coll.zones:
                if local is not None:
                    raise NotImplementedError(
                        "explicit-SPMD path: pyrolysis regions not yet localized"
                    )
                self.pyrolysis = coll

        # ---- surface film region (constant/surfaceFilmProperties) ----
        self.film = None
        self._film_maps = None
        if self.case.has_constant("surfaceFilmProperties"):
            sfp = self.case.constant("surfaceFilmProperties")
            if (
                sfp.get_bool("active", False)
                and sfp.get_word("surfaceFilmModel", "none") != "none"
            ):
                if local is not None:
                    raise NotImplementedError(
                        "explicit-SPMD path: film region not yet localized"
                    )
                self._build_film(sfp)

        # ---- fields & BCs ----
        self.t0_name = self.case.start_time()
        self.t0 = float(self.t0_name)
        self._read_initial_fields()
        if self.pyrolysis is not None:
            self._init_pyro_coupling()
        # emissivityMode solidRadiation/pyrolysisModel on IDefault patches
        # (greyDiffusiveRadiationFire / FF BC variants): wall ε for those
        # faces tracks the coupled pyrolysis zone's surface emissivity
        # (radiationCoupledBaseFF.C SOLIDRADIATION/PYROLYSISMODELE — the
        # mapped neighbour-region 'emissivity' field of
        # greyDiffusiveRadiationFire...C:246-275)
        if (
            self.radiation is not None
            and self.pyrolysis is not None
            and getattr(self.radiation, "solid_eps_mask", None) is not None
            and (
                self.radiation.solid_eps_mask.any()
                or self.radiation.solid_abs_mask.any()
            )
        ):
            self.radiation.solid_eps_fn = self._solid_wall_emissivity

        # ---- function objects + rti probes (controlDict functions,
        # lib/rtiProbes) ----
        from ..functionobjects.fieldvalue import make_function_objects
        from ..functionobjects.rtis import RtiProbes

        # fvOptions (system/fvOptions — "No finite volume options present"
        # in every shipped case; parsed when the file exists)
        from .fvoptions import FvOptions

        self.fv_options = FvOptions(
            case_dir, g,
            getattr(self.cm.sets, "cell_zones", None) if local is None else None,
        )
        if not self.fv_options.active:
            self.fv_options = None
        elif local is not None:
            raise NotImplementedError(
                "explicit-SPMD path: fvOptions zones not yet localized"
            )

        self.function_objects = make_function_objects(self, cd)
        self.rtis = RtiProbes.try_from_case(self, case_dir)
        # cell-wise 5-link RTI fields (solver/rti.H, constant/rtiProperties)
        from ..functionobjects.rtilinks import RTILinks

        self.rti_links = RTILinks(self.case, g.n_cells, self.dtype)

    # ------------------------------------------------------------------
    def _read_field(self, name: str, default_name: Optional[str] = None):
        # startFrom latestTime/startTime: prefer the start-time directory,
        # falling back to 0/ for fields not written there
        t0 = self.t0_name
        if t0 != "0" and self.case.has_field(name, t0):
            ff = self.case.field(name, t0)
        elif self.case.has_field(name):
            ff = self.case.field(name)
        elif default_name is not None:
            ff = self.case.field_or_default(name, default_name)
        else:
            raise FileNotFoundError(f"0/{name}")
        g = self.geom
        if self._local is not None:
            # read against the GLOBAL mesh, scatter onto this partition's
            # extended layout (halo filled so pointwise consistency holds),
            # and build the BC set against the LOCAL patch layout
            L = self._local
            gg = L.global_geom
            i_g = np.asarray(ff.internal_array(gg.n_cells), np.float64)
            b_g = np.asarray(initial_boundary(ff, gg, self.dtype))
            i_l = jnp.asarray(L.lz.cells(i_g)[L.p], self.dtype)
            b_l = jnp.asarray(L.lz.bfaces(b_g)[L.p], self.dtype)
            return VolField(i_l, b_l), make_field_bcs(ff, g)
        internal = jnp.asarray(ff.internal_array(g.n_cells), self.dtype)
        boundary = initial_boundary(ff, g, self.dtype)
        return VolField(internal, boundary), make_field_bcs(ff, g)

    def _read_initial_fields(self):
        g = self.geom
        dt = self.dtype
        self.U, self.U_bcs = self._read_field("U")
        self.T, self.T_bcs = self._read_field("T")
        self.p_rgh, self.p_rgh_bcs = self._read_field("p_rgh")
        self.p, self.p_bcs = self._read_field("p")
        self.k, self.k_bcs = self._read_field("k")
        self.alphat, self.alphat_bcs = self._read_field("alphat")
        self.nut, self.nut_bcs = self._read_field("nut")
        self._has_film_alphat_wf = self.film is not None and any(
            b.kind == "alphatFilmWallFunction" for b in self.alphat_bcs.bcs
        )

        Yi, Yb, self.Y_bcs = [], [], []
        for sp in self.species:
            f, b = self._read_field(sp, default_name="Ydefault")
            Yi.append(f.i)
            Yb.append(f.b)
            self.Y_bcs.append(b)
        # the inert specie is never solved: Y_inert = 1 − ΣY everywhere,
        # including patch values (its 0/ file typically doesn't exist and
        # Ydefault would leave the boundary mixture unnormalised)
        inert = self.species.index(self.inert)
        Yi[inert] = jnp.maximum(1.0 - sum(Yi[s] for s in range(len(Yi)) if s != inert), 0.0)
        Yb[inert] = jnp.maximum(1.0 - sum(Yb[s] for s in range(len(Yb)) if s != inert), 0.0)
        self.Y = VolField(jnp.stack(Yi, axis=1), jnp.stack(Yb, axis=1))

    # ------------------------------------------------------------------
    def initial_state(self) -> Dict:
        """Build the State pytree: thermo init + hydrostatic initialisation."""
        g = self.geom
        dt = self.dtype
        Y, T, p = self.Y, self.T, self.p

        # totalFlowRateAdvectiveDiffusive inlets start as zeroGradient (the
        # mixed fraction is 0 at phi = 0), so the initial FACE composition is
        # the cell mixture, not the file's 'value' — this sets the burner
        # rho_b the first flowRateInletVelocity update divides by: air gives
        # U_b = mdot/(rho_air·A) and the full 0.03 kg/s jet from step 0
        # (golden log Courant 0.054 at step 1)
        tfrad_patches = {
            pch.name
            for bcs in self.Y_bcs
            for bc, pch in zip(bcs.bcs, g.patches)
            if bc.kind == "totalFlowRateAdvectiveDiffusive"
        }
        Yb = Y.b
        for pch in g.patches:
            if pch.name in tfrad_patches:
                # every specie (inert included) → cell mixture, so the face
                # stays a normalised air composition
                Yb = Yb.at[pch.slice, :].set(g.cell_to_boundary(Y.i)[pch.slice, :])
        Y = VolField(Y.i, Yb)

        psi_i = self.gas.psi(T.i, Y.i)
        psi_b = self.gas.psi(T.b, Y.b)
        rho = VolField(psi_i * p.i, psi_b * p.b)
        hs = VolField(self.gas.hs(T.i, Y.i), self.gas.hs(T.b, Y.b))
        mu = VolField(self.gas.mu(T.i, Y.i), self.gas.mu(T.b, Y.b))
        alpha = VolField(self.gas.alpha(T.i, Y.i), self.gas.alpha(T.b, Y.b))

        # phi = rho * (U_f & Sf)
        rho_f = fvc.interpolate(g, rho)
        uflux = fvc.flux(g, self.U)
        phi = SurfaceField(rho_f.i * uflux.i, rho_f.b * uflux.b)

        state = {
            "t": jnp.asarray(self.t0, dt),
            "dt": jnp.asarray(self.ctl.dt0, dt),
            "U": self.U,
            "p_rgh": self.p_rgh,
            "p": p,
            "p_old_i": p.i,
            "rho": rho,
            "rho_old_i": rho.i,
            "Y": Y,
            "hs": hs,
            "T": T,
            "psi": VolField(psi_i, psi_b),
            "mu": mu,
            "alpha": alpha,
            "k": self.k,
            "nut": VolField(self.turb.nut(self.k.i), self.turb.nut_b(self.k.b)),
            "alphat": self.alphat,
            "phi": phi,
            "Qdot": jnp.zeros(g.n_cells, dt),
            "ph_rgh_b": jnp.zeros(g.n_boundary, dt),
            # boundary phi the species equations saw LAST step (lagged
            # refValue gate of totalFlowRateAdvectiveDiffusive)
            "_phi_b_prev": jnp.zeros(g.n_boundary, dt),
            "dpdt": jnp.zeros(g.n_cells, dt),
            "K_old_i": 0.5 * jnp.sum(self.U.i * self.U.i, axis=1),
        }
        if self.radiation is not None:
            state["rad"] = self.radiation.initial_state()
        if self.combustion.stream_rad_fracs:
            state["localRadFrac"] = jnp.zeros(g.n_cells, dt)
        if self.cloud is not None:
            state["cloud"] = self.cloud.initial_state()
            if self.cloud.cfg.radiation:
                nb = self.cloud.cfg.n_bands
                z = jnp.zeros((nb, g.n_cells), dt)
                state["cloud_rad"] = {"ap": z, "sigmap": z, "asy": z, "Ep": z}
        if self.pyrolysis is not None:
            state["pyro"] = self.pyrolysis.initial_state()
        if self.film is not None:
            state["film"] = self.film.initial_state()
            if self.cloud is not None and self.film.drip_enabled:
                state["film_drip_b"] = jnp.zeros((g.n_boundary,), dt)
                state["film_U_b"] = jnp.zeros((g.n_boundary, 3), dt)
            if self._has_film_alphat_wf:
                state["film_evap_b"] = jnp.zeros((g.n_boundary,), dt)
        if self.rtis is not None and self.rtis.n > 0:
            state["rtis"] = self.rtis.initial_state()
        if self.rti_links.active:
            state["rti_links"] = self.rti_links.initial_state()
        # phrghEqn.H runs only at t = 0 (reference guards on runTime == 0)
        if self.ctl.hydrostatic_init and self.t0 == 0.0:
            state = self._hydrostatic_init(state)
        # old-TIME snapshots for the pressure equation's ddt/ddtCorr terms
        state["psi_old_i"] = state["psi"].i
        state["p_rgh_old_i"] = state["p_rgh"].i
        state["phi_old_i"] = state["phi"].i
        state["rhoU_old_i"] = state["rho"].i[:, None] * state["U"].i
        # the reference updates Δt at the TOP of the loop (fireFoam.C:78-82),
        # so the first step already runs with the grown/write-landed dt:
        # replicate setInitialDeltaT.H then one loop-top update here (our
        # step() updates dt at the end, which matches all later steps).
        if self.ctl.adjust:
            co = self.courant(state)
            state["dt"] = jnp.where(
                co > 1e-15,
                jnp.minimum(
                    self.ctl.max_co * state["dt"] / jnp.maximum(co, small()),
                    self.ctl.max_dt,
                ),
                state["dt"],
            )
            state["dt"] = self.new_dt(state)
        # previous-step dt for the reference-timed Courant log line (the
        # first print is 0/0 in the reference since phi starts 0)
        state["_dt_prev"] = state["dt"]
        return state

    # ------------------------------------------------------------------
    def _phrgh_fixed_mask(self, dtp):
        """[n_boundary] 1.0 where ph_rgh is a fixed-value patch. Prefers the
        0/ph_rgh(.orig) file's own BC types (phrghEqn.H MUST_READ)."""
        g = self.geom
        kinds = None
        for nm in ("ph_rgh", "ph_rgh.orig"):
            try:
                if self.case.has_field(nm):
                    ff = self.case.field(nm)
                    kinds = {}
                    for pname in ff.boundary:
                        sub = ff.boundary.get_dict(pname, None)
                        if isinstance(sub, FoamDict):
                            kinds[pname] = sub.get_word("type", "")
                    break
            except Exception:
                kinds = None
        f_list = []
        for bc, pch in zip(self.p_rgh_bcs.bcs, g.patches):
            if kinds is not None and pch.name in kinds:
                is_fixed = kinds[pch.name] in (
                    "fixedValue", "totalPressure", "uniformFixedValue"
                )
            else:
                is_fixed = bc.kind in (
                    "prghTotalHydrostaticPressure", "fixedValue", "totalPressure"
                )
            f_list.append(jnp.full((pch.n,), 1.0 if is_fixed else 0.0, dtp))
        return jnp.concatenate(f_list)

    def _hydrostatic_init(self, state: Dict) -> Dict:
        """solver/phrghEqn.H: iterate lap(rho_f, ph_rgh) = div(phig) so the
        initial pressure field is in hydrostatic balance."""
        g = self.geom
        dtp = self.dtype
        ph = VolField(jnp.zeros(g.n_cells, dtp), jnp.zeros(g.n_boundary, dtp))
        # ph_rgh BCs: fixed 0 on open boundaries (where p_rgh has a value BC),
        # zero-gradient on walls — reuse the p_rgh BC kinds
        Y, T = state["Y"], state["T"]
        p = state["p"]
        for it in range(self.ctl.n_hydrostatic):
            psi_i = self.gas.psi(T.i, Y.i)
            psi_b = self.gas.psi(T.b, Y.b)
            rho = VolField(psi_i * p.i, psi_b * p.b)
            rho_f = fvc.interpolate(g, rho)
            sg_rho = fvc.sn_grad(g, rho)
            phig = SurfaceField(
                -rho_f.i * self.ghf_i * sg_rho.i * g.magSf,
                -rho_f.b * self.ghf_b * sg_rho.b * g.b_magSf,
            )
            rhs = fvc.surface_sum(g, phig)  # div(phig)·V
            # mixed BCs: ph_rgh has its OWN boundary file (phrghEqn.H reads
            # 0/ph_rgh MUST_READ — steckler ships 0/ph_rgh.orig: top
            # fixedValue 0, everything else fixedFluxPressure). Where the
            # file exists use its patch types verbatim; otherwise infer from
            # the p_rgh kinds. Gradient patches get constrainPressure
            # semantics — snGrad(ph_rgh) = phig/(ρ_f·A) so the boundary
            # buoyancy flux cancels.
            f = self._phrgh_fixed_mask(dtp)
            rv = jnp.zeros(g.n_boundary, dtp)
            rg = phig.b / (rho_f.b * g.b_magSf)
            gic, gbc = fvm.mixed_gradient_coeffs(rv, rg, f, g.b_dc)
            m = -fvm.laplacian(g, rho_f, ph, gic, gbc, corr=self._lap_corr(ph))
            m = fvm.FvMatrix(
                g, m.diag, m.lower, m.upper, m.source - rhs, m.internal_coeffs, m.boundary_coeffs, m.psi
            )
            ctl = _solver_controls(self.fv_solution, "ph_rgh", "p_rgh")
            res = solve_scalar(
                m, ph.i, solver=ctl["solver"], tol=ctl["tolerance"],
                rel_tol=ctl["relTol"], sched=self._ldu,
                preconditioner=ctl["preconditioner"],
            )
            ph_b = f * 0.0 + (1.0 - f) * (g.cell_to_boundary(res.x) + rg / g.b_dc)
            ph = VolField(res.x, ph_b)
            p = VolField(
                ph.i + rho.i * self.gh + self.p_ref,
                ph.b + rho.b * self.ghf_b + self.p_ref,
            )
        state = dict(state)
        state["p"] = VolField(p.i, state["p"].b)
        # oldTime copies refresh at the init too — otherwise step 0 sees a
        # spurious dpdt = (p_hydrostatic − p_file)/dt in the energy equation
        state["p_old_i"] = p.i
        state["p_rgh"] = VolField(ph.i, ph.b)
        state["ph_rgh_b"] = ph.b
        psi_i = self.gas.psi(T.i, Y.i)
        state["rho"] = VolField(psi_i * p.i, state["rho"].b)
        state["rho_old_i"] = state["rho"].i
        state["psi"] = VolField(psi_i, state["psi"].b)
        return state

    # ------------------------------------------------------------------
    def _ctx(self, state: Dict, overrides=None) -> dict:
        alpha_eff_b = state["alphat"].b + state["alpha"].b
        cp_b = self.gas.cp(state["T"].b, state["Y"].b)
        return {
            "phi": state["phi"],
            "rho": state["rho"],
            "U": state["U"],
            "t": state["t"],
            "alphaEff_b": alpha_eff_b,
            "kappaEff_b": alpha_eff_b * cp_b,  # turbulenceModel::kappaEff
            "ph_rgh_b": state["ph_rgh_b"],
            "phi_prev_b": state.get("_phi_b_prev"),
            "overrides": overrides or {},
        }

    # ------------------------------------------------------------------
    def courant(self, state: Dict) -> jnp.ndarray:
        """compressibleCourantNo: 0.5·max(Σ|φ| / (ρ V))·Δt."""
        g = self.geom
        sum_phi = g.cell_sum_unsigned(jnp.abs(state["phi"].i), jnp.abs(state["phi"].b))
        return 0.5 * g.rmax(sum_phi / (state["rho"].i * g.V)) * state["dt"]

    def courant_mean(self, state: Dict) -> jnp.ndarray:
        """compressibleCourantNo meanCoNum: 0.5·(ΣsumPhi/ρ)/ΣV·Δt."""
        g = self.geom
        sum_phi = g.cell_sum_unsigned(jnp.abs(state["phi"].i), jnp.abs(state["phi"].b))
        return (
            0.5 * g.rsum(sum_phi / state["rho"].i) / g.rsum(g.V) * state["dt"]
        )

    def _adjust_write_dt(self, t, dt):
        """Time::adjustDeltaT (adjustableRunTime): shrink/stretch dt so an
        integer number of steps lands exactly on the next write time —
        nSteps = floor(max(timeToNextWrite/dt, 1) + 0.99)."""
        if not self.ctl.adjustable_write:
            return dt
        interval = self.ctl.write_interval
        t_next = (jnp.floor((t - self.t0) / interval + 1e-9) + 1.0) * interval + self.t0
        remain = jnp.maximum(t_next - t, 1e-12)
        n = jnp.floor(jnp.maximum(remain / dt, 1.0) + 0.99)
        return remain / n

    def new_dt(self, state: Dict) -> jnp.ndarray:
        """Next-step Δt, matching the reference's DOUBLE growth: the solver
        includes BOTH setMultiRegionDeltaT.H (min over fluid Courant / solid
        diffusion / film Courant factors, capped 1.2) AND the stock
        setDeltaT.H (fluid-Courant factor min(f, 1+0.1f, 1.2)) back to back
        (solver/fireFoam.C:78-82), each via Time::setDeltaT which re-lands
        on the adjustable write time. This is what produces the golden log's
        0.05 → 0.0666667 → 0.093333 sequence."""
        co = self.courant(state)
        small = 1e-15
        t_fluid = self.ctl.max_co / (co + small)
        fact = jnp.minimum(t_fluid, 1.2)
        if self.pyrolysis is not None:
            di = self.pyrolysis.diffusion_number(state["pyro"], state["dt"])
            fact = jnp.minimum(fact, self.max_di / (di + small))
        if self.film is not None and "film" in state:
            co_f = self.film.courant(state["film"], state["dt"])
            fact = jnp.minimum(fact, self.ctl.max_co / (co_f + small))
        # setMultiRegionDeltaT.H
        dt = jnp.minimum(fact * state["dt"], self.ctl.max_dt)
        dt = self._adjust_write_dt(state["t"], dt)
        # stock setDeltaT.H (damped growth on the fluid Courant factor)
        fact2 = jnp.minimum(jnp.minimum(t_fluid, 1.0 + 0.1 * t_fluid), 1.2)
        dt = jnp.minimum(fact2 * dt, self.ctl.max_dt)
        dt = self._adjust_write_dt(state["t"], dt)
        return dt

    # ------------------------------------------------------------------
    def _init_pyro_coupling(self):
        """Per-zone gas-coupling constants: patch-local face scatter maps and
        the fuel-equivalence factor hocPyr/qFuel used by
        flowRateInletVelocityPyrolysisCoupled (lib/fvPatchFieldsPyrolysis/
        flowRateInletVelocityPyrolysisCoupled/...C:100-127,
        hocChar = 32.8e6 W/kg hard-coded there)."""
        self._pyro_maps = {}
        for z in self.pyrolysis.zones:
            entries = []
            bidx_all = np.asarray(z.region.prim_bidx)
            for pname in z.region.coupled_patches:
                try:
                    patch = self.geom.patch(pname)
                except KeyError:
                    continue
                rows = np.nonzero(
                    (bidx_all >= patch.start) & (bidx_all < patch.start + patch.n)
                )[0]
                if rows.size == 0:
                    continue
                loc = bidx_all[rows] - patch.start
                # fuel-equivalence: read hocSolid from the gas U BC on the patch
                scale = 1.0
                ub = next((b for b in self.U_bcs.bcs if b.patch == pname), None)
                hoc_solid = ub.params.get("hocSolid") if ub is not None else None
                if hoc_solid is not None and z.chem.reactions:
                    rx = z.chem.reactions[0]
                    rho_v = float(z.thermo.rho_s[rx.lhs])
                    rho_c = float(z.thermo.rho_s[rx.rhs_solid]) if rx.rhs_solid >= 0 else 0.0
                    hoc_char = 32.8e6
                    hoc_pyr = (float(hoc_solid) * rho_v - hoc_char * rho_c) / max(
                        rho_v - rho_c, small()
                    )
                    scale = hoc_pyr / self.reaction.q_fuel()
                entries.append((patch, rows, loc, scale))
            if entries:
                self._pyro_maps[z.region_name] = entries

    def _solid_wall_emissivity(self, state: Dict) -> jnp.ndarray:
        """Per-boundary-face emissivity with pyrolysis-coupled faces set to
        the zone's current surface emissivity (composition-weighted solid ε,
        radiationCoupledBaseFF.C PYROLYSISMODELE/SOLIDRADIATION: the wall ε
        seen by fvDOM is the solid region's, not a dictionary constant)."""
        eps = self.radiation.emissivity
        for z, zst in zip(self.pyrolysis.zones, state["pyro"]):
            bidx = jnp.asarray(z.region.prim_bidx)
            eps = eps.at[bidx].set(z.thermo.emissivity(zst["Y"][:, 0]))
        return eps

    def _evolve_pyrolysis(self, state: Dict, log, srcs=None) -> Tuple[Dict, Dict]:
        """pyrolysis.evolve() (fireFoam.C:92-95) + gas-side BC overrides."""
        g = self.geom
        q_conv: Dict = {}
        qr: Dict = {}
        for z in self.pyrolysis.zones:
            if z.bc_exposed.kind == "coupled" and self.solve_primary:
                bidx = jnp.asarray(z.region.prim_bidx)
                T_b = state["T"].b[bidx]
                Y_b = state["Y"].b[bidx]
                cp_b = self.gas.cp(T_b, Y_b)
                kappa_eff = (state["alpha"].b[bidx] + state["alphat"].b[bidx]) * cp_b
                q_conv[z.region_name] = {
                    "kDelta": kappa_eff * g.b_dc[bidx],
                    "T_nbr": state["T"].i[g.b_own[bidx]],
                }
                if getattr(z, "char_oxi", False) and "O2" in self.species:
                    # O2 diffusive supply for char oxidation
                    # (reactingOneDim21CharOxi::updateCharOxi: αΔ·O2·|Sf|)
                    o2 = self.gas.index("O2")
                    q_conv[z.region_name]["O2_nbr"] = state["Y"].i[
                        g.b_own[bidx], o2
                    ]
                    q_conv[z.region_name]["alphaDelta_O2"] = (
                        state["alpha"].b[bidx] * g.b_dc[bidx]
                    )
                if self.radiation is not None:
                    qr[z.region_name] = self.radiation.qin_boundary(state["rad"])[bidx]
        pstates, pouts = self.pyrolysis.evolve(
            state["pyro"], state["dt"], q_conv or None, qr or None
        )
        state = dict(state)
        state["pyro"] = pstates

        ov: Dict = {}
        total_mlr = 0.0
        for z, out in zip(self.pyrolysis.zones, pouts):
            m = self._pyro_maps.get(z.region_name)
            log[f"pyro_{z.region_name}_T_max"] = out["T_max"]
            log[f"pyro_{z.region_name}_mlr"] = jnp.sum(out["phiGas"])
            if m is None or not self.solve_primary:
                continue
            dtp = self.dtype
            # char oxidation gas exchange: O2 consumed from / CO2 returned
            # to the wall-adjacent cells (reactingOneDim21CharOxi phiO2_/
            # phiCO2_ — volumetric-source formulation of the patch fluxes)
            if (
                srcs is not None
                and getattr(z, "char_oxi", False)
                and "O2" in self.species
                and "CO2" in self.species
            ):
                bidx = jnp.asarray(z.region.prim_bidx)
                own = g.b_own[bidx]
                inv_v = 1.0 / g.V[own]
                sy = dict(srcs.get("SY", {}))
                o2, co2 = self.gas.index("O2"), self.gas.index("CO2")
                add_o2 = jnp.zeros((g.n_cells,), dtp).at[own].add(
                    out["phiO2"] * inv_v
                )
                add_co2 = jnp.zeros((g.n_cells,), dtp).at[own].add(
                    out["phiCO2"] * inv_v
                )
                sy[o2] = sy.get(o2, 0.0) + add_o2
                sy[co2] = sy.get(co2, 0.0) + add_co2
                srcs["SY"] = sy
                # net mass exchange (CO2 out-gassing minus O2 uptake)
                srcs["Srho"] = srcs["Srho"] + add_o2 + add_co2
                log[f"pyro_{z.region_name}_charOxiQdot"] = out["charOxiQdot"]
            for patch, rows, loc, scale in m:
                rows_j = jnp.asarray(rows)
                T_patch = jnp.zeros((patch.n,), dtp).at[loc].set(
                    out["T_surface"][rows_j]
                )
                mdot = jnp.zeros((patch.n,), dtp).at[loc].set(
                    out["phiGas"][rows_j] * scale
                )
                ov[("T", patch.name, "value")] = T_patch
                ov[("U", patch.name, "mdot")] = mdot
        return state, ov

    # ------------------------------------------------------------------
    def _build_film(self, sfp):
        """Construct the thermoSingleLayer film region over the faceZones
        named by the film extrudeToRegionMeshDict (solver/
        createSurfaceFilmModel.H; cases/singleBox/system/
        extrudeToRegionMeshDictFilm)."""
        from ..regionmodels.film import ThermoSingleLayerFilm
        from ..regionmodels.surfmesh import FilmMesh

        region = sfp.get_word("regionName", "filmRegion")
        faces: List[int] = []
        for d in self.cm.extrude_dicts:
            if d.get_word("region", "") != region:
                continue
            for z in d.get_list("faceZones", []):
                zn = str(z)
                fz = self.cm.face_zones.get(zn)
                if fz is not None:
                    faces.extend(int(f) for f in fz.faces)
                else:
                    try:
                        pp = next(p for p in self.cm.mesh.patches if p.name == zn)
                        faces.extend(range(pp.start, pp.start + pp.n_faces))
                    except StopIteration:
                        pass
        if not faces:
            return
        fm = FilmMesh.from_faces(self.cm.mesh, sorted(set(faces)), self.dtype)
        self.film = ThermoSingleLayerFilm(fm, sfp, self.g_vec, self.dtype)
        bidx = np.asarray(fm.prim_bidx)
        keep = bidx >= 0
        self._film_maps = {
            "bidx": jnp.asarray(bidx[keep]),
            "rows": jnp.asarray(np.nonzero(keep)[0]),
            "cells": jnp.asarray(np.asarray(fm.prim_cells)[keep]),
        }
        if self.cloud is not None:
            # parcels hitting film faces interact via the splash model
            b_code = np.array(self.cloud.b_code)
            from ..lagrangian.tracking import INTERACT_FILM

            b_code[bidx[keep]] = INTERACT_FILM
            self.cloud.b_code = jnp.asarray(b_code)
            # film → cloud drip re-injection (surfaceFilm().inject —
            # KinematicCloud.C:186; film drippingInjectionCoeffs)
            if self.film.drip_enabled:
                from ..lagrangian.injection import FilmDripInjection

                self.cloud.injectors.append(
                    FilmDripInjection(
                        "filmDrip",
                        self.geom,
                        bidx[keep],
                        self.film.drip_d_min,
                        self.film.drip_d_max,
                        self.film.particles_per_parcel,
                        self.g_vec,
                        dtype=self.dtype,
                    )
                )

    def _evolve_film(self, state: Dict, srcs: Dict, log) -> Tuple[Dict, Dict]:
        """surfaceFilm.evolve() (fireFoam.C:90) + gas-side sources."""
        g = self.geom
        fm = self.film.fm
        m = self._film_maps
        bidx, rows, cells = m["bidx"], m["rows"], m["cells"]
        dt = state["dt"]
        T, Y = state["T"], state["Y"]
        nF = fm.n_faces
        dtp = self.dtype

        def to_film(arr_b):
            out = jnp.zeros((nF,), dtp)
            return out.at[rows].set(arr_b[bidx])

        # spray impingement captured by the cloud this step [kg per face]
        mass_imp = jnp.zeros((nF,), dtp)
        h_imp = jnp.zeros((nF,), dtp)
        if "filmMass" in srcs:
            mass_imp = to_film(srcs["filmMass"]) / (fm.area * dt)
            h_imp = to_film(srcs["filmEnthalpy"]) / (fm.area * dt)
        cp_b = self.gas.cp(T.b, Y.b)
        kappa_eff_b = (state["alpha"].b + state["alphat"].b) * cp_b
        htc = to_film(kappa_eff_b * g.b_dc)
        inp = {
            "mass_imp": mass_imp,
            "h_imp": h_imp,
            "T_gas": state["T"].i[cells],
            "U_gas": state["U"].i[cells],
            "rho_gas": state["rho"].i[cells],
            "Yv_gas": Y.i[cells, self.gas.index("H2O")] if "H2O" in self.species else jnp.zeros_like(htc),
            "p_gas": state["p"].i[cells],
            "htc_gas": htc,
            "T_wall": to_film(T.b),
        }
        if self.radiation is not None:
            inp["qr"] = to_film(self.radiation.qin_boundary(state["rad"]))
        fstate, out = self.film.evolve(state["film"], dt, inp)
        state = dict(state)
        state["film"] = fstate
        # dripped-mass flux + film surface velocity per gas boundary face,
        # consumed by the cloud's FilmDripInjection next step
        if self.cloud is not None and self.film.drip_enabled:
            fd = jnp.zeros((g.n_boundary,), dtp).at[bidx].set(out["drip"][rows])
            fU = jnp.zeros((g.n_boundary, 3), dtp).at[bidx].set(fstate["U"][rows])
            state["film_drip_b"] = fd
            state["film_U_b"] = fU
        if self._has_film_alphat_wf:
            state["film_evap_b"] = (
                jnp.zeros((g.n_boundary,), dtp).at[bidx].set(out["m_evap"][rows])
            )
        # gas sources: evaporated H2O + heat exchange (film.Srho/Sh —
        # surfaceFilmModel.H:147-243)
        import jax as _jax

        area_per_v = fm.area / g.V[cells]
        srho = jnp.zeros((g.n_cells,), dtp).at[cells].add(out["m_evap"] * area_per_v)
        hv = self.gas.hs_species(fstate["T"])[:, self.gas.index("H2O")] if "H2O" in self.species else 0.0
        sh = jnp.zeros((g.n_cells,), dtp).at[cells].add(
            (out["m_evap"] * hv - out["q_gas"]) * area_per_v
        )
        srcs = dict(srcs)
        srcs["Srho"] = srcs["Srho"] + srho
        srcs["SYv"] = srcs["SYv"] + srho
        srcs["Sh"] = srcs["Sh"] + sh
        log["film_mass"] = out["mass"]
        log["film_evap"] = fstate["evaporatedMass"]
        log["film_coverage"] = jnp.mean(out["alpha"])
        return state, srcs

    # ------------------------------------------------------------------
    def _film_bc_overrides(self, state: Dict, ov: Dict) -> Dict:
        """filmPyrolysisTemperature/VelocityCoupled wet/dry switching
        (lib/regionCoupling/derivedFvPatchFields): gas wall T = α·T_film +
        (1−α)·T_pyrolysis (dry fallback: current wall value); gas wall
        U = U_film (FM fork pins Up = UFilm)."""
        m = self._film_maps
        g = self.geom
        dtp = self.dtype
        bidx, rows = m["bidx"], m["rows"]
        fstate = state["film"]
        alpha_b = jnp.zeros((g.n_boundary,), dtp).at[bidx].set(
            self.film.alpha(fstate["delta"])[rows]
        )
        Tf_b = jnp.zeros((g.n_boundary,), dtp).at[bidx].set(fstate["T"][rows])
        Uf_b = jnp.zeros((g.n_boundary, 3), dtp).at[bidx].set(fstate["U"][rows])
        ov = dict(ov)
        delta_b = jnp.zeros((g.n_boundary,), dtp).at[bidx].set(
            fstate["delta"][rows]
        )
        for bc in self.T_bcs.bcs:
            if bc.kind == "filmPyrolysisTemperatureCoupled":
                p = g.patch(bc.patch)
                sl = p.slice
                base = ov.get(("T", p.name, "value"))
                T_dry = base if base is not None else state["T"].b[sl]
                ov[("T", p.name, "value")] = (
                    alpha_b[sl] * Tf_b[sl] + (1.0 - alpha_b[sl]) * T_dry
                )
            elif bc.kind == "compressible::rollPaperTwoZoneST":
                # fluid branch of rollPaperTwoZoneSTFvPatchScalarField::
                # updateCoeffs (lib/regionCoupling/derivedFvPatchFields/
                # rollPaperTwoZoneST/...C:720-786): wetness ratio from the
                # film thickness between the dry/wet thresholds, Twet is
                # the film T clamped to [298.15, 378.4] K, Tdry is the
                # pyrolysis surface T (Tsurface), fixedValue
                # Twall = ratio·(Twet − Tdry) + Tdry
                p = g.patch(bc.patch)
                sl = p.slice
                base = ov.get(("T", p.name, "value"))
                T_dry = base if base is not None else state["T"].b[sl]
                d_dry = float(bc.params.get("filmDeltaDry", 0.0))
                d_wet = float(bc.params.get("filmDeltaWet", 2e-4))
                ratio = jnp.clip(
                    (delta_b[sl] - d_dry) / max(d_wet - d_dry, 1e-12), 0.0, 1.0
                )
                T_wet = jnp.clip(Tf_b[sl], 298.15, 378.4)
                ov[("T", p.name, "value")] = ratio * (T_wet - T_dry) + T_dry
        for bc in self.U_bcs.bcs:
            if bc.kind != "filmPyrolysisVelocityCoupled":
                continue
            p = g.patch(bc.patch)
            ov[("U", p.name, "value")] = Uf_b[p.slice]
        return ov

    # ------------------------------------------------------------------
    def _apply_wall_functions(self, state: Dict) -> Dict:
        """Fire wall functions (lib/fvPatchFields — SURVEY §2.9):
        alphatFireWallFunction sets the gas-side turbulent thermal
        diffusivity on burning walls from the QcWallFunction flame-heat-flux
        correlation (alphatFireWallFunctionFvPatchScalarField.C:218-249):
          qwL = −α_w·Cp_w·∂T/∂n  (laminar flux INTO the wall)
          ṁ″ = −φ_w/|Sf|·2.5·1000 [g/m²/s fuel-equivalent]
          qw = ṁ″<0.1 ? clamp(qwL,0,QcThr)/QcThr·QcFlame
                       : QcFlame·(ṁ″/10)/(e^{ṁ″/10}−1)
          alphat_w = min(1, qw/(Cp_w·(−∂T/∂n)) − α_w)
        """
        g = self.geom
        has_fire_wf = any(
            b.kind in ("alphatFireWallFunction", "alphatFilmWallFunction")
            for b in self.alphat_bcs.bcs
        )
        if not has_fire_wf:
            return state
        state = dict(state)
        T, Y = state["T"], state["Y"]
        alphat_b = state["alphat"].b
        tiny = jnp.finfo(self.dtype).tiny * 1e6
        for bc, p in zip(self.alphat_bcs.bcs, g.patches):
            if bc.kind == "alphatFilmWallFunction" and self.film is not None:
                alphat_b = alphat_b.at[p.slice].set(
                    self._alphat_film_wf(state, bc, p)
                )
                continue
            if bc.kind != "alphatFireWallFunction":
                continue
            sl = p.slice
            cp_w = self.gas.cp(T.b[sl], Y.b[sl])
            alpha_w = state["alpha"].b[sl]
            grad_tw = g.b_dc[sl] * (T.b[sl] - g.cell_to_boundary(T.i)[sl])
            qwl = -alpha_w * cp_w * grad_tw
            fmf = -state["phi"].b[sl] / g.b_magSf[sl] * 2.5 * 1000.0
            qc_flame = float(bc.params.get("QcFlame", 20000.0))
            qc_thr = float(bc.params.get("QcThreshold", 2000.0))
            expn = jnp.minimum(fmf / 10.0, 50.0)
            qw = jnp.where(
                fmf < 0.1,
                jnp.clip(qwl, 0.0, qc_thr) / qc_thr * qc_flame,
                qc_flame * (fmf / 10.0) / jnp.maximum(jnp.expm1(expn), tiny),
            )
            a_eff = qw / cp_w / jnp.maximum(-grad_tw, tiny)
            a_t = jnp.minimum(1.0, a_eff - alpha_w)
            a_t = jnp.where(qwl <= tiny, 0.0, a_t)
            alphat_b = alphat_b.at[sl].set(a_t)
        state["alphat"] = VolField(state["alphat"].i, alphat_b)
        return state

    # ------------------------------------------------------------------
    def _nut_wall_functions(self, state: Dict, k_new, nut_b) -> jnp.ndarray:
        """nut wall-function family (SURVEY §2.9):

        * nutkWallFunction — log-law from k: y⁺ = Cμ^¼√k·y/ν,
          νt = ν·(y⁺κ/ln(Ey⁺) − 1) above the laminar y⁺ (stock OpenFOAM).
        * nutUSpaldingWallFunction — u_τ from Spalding's unified law by
          Newton iteration; νt = u_τ²/|∂U/∂n| − ν.
        * nutUSpaldingBlowingWallFunction — same u_τ with a transpiration
          attenuation min(1, (ṁ″/hOCp)/(e^{ṁ″/hOCp}−1)), ṁ″ the
          pyrolysate flux in g/m²/s (lib/fvPatchFields/nutUSpaldingBlowing-
          WallFunction/...C:41-74).
        * nutFireWallFunction — νt = αt·ν/α, consuming the fire-corrected
          alphat (lib/fvPatchFields/nutFireWallFunction/...C:62-80).
        """
        g = self.geom
        kinds = {
            "nutkWallFunction",
            "nutUSpaldingWallFunction",
            "nutUSpaldingBlowingWallFunction",
            "nutFireWallFunction",
        }
        if not any(b.kind in kinds for b in self.nut_bcs.bcs):
            return nut_b
        kappa, E, cmu25 = 0.41, 9.8, 0.09 ** 0.25
        # yPlusLam: fixed point of y⁺ = ln(E y⁺)/κ
        ypl = 11.0
        for _ in range(10):
            ypl = np.log(E * ypl) / kappa
        U, rho, mu = state["U"], state["rho"], state["mu"]
        tiny = jnp.finfo(self.dtype).tiny * 1e6

        for bc, p in zip(self.nut_bcs.bcs, g.patches):
            if bc.kind not in kinds:
                continue
            sl = p.slice
            nuw = mu.b[sl] / rho.b[sl]
            y = 1.0 / g.b_dc[sl]
            if bc.kind == "nutkWallFunction":
                yp = cmu25 * jnp.sqrt(jnp.maximum(g.cell_to_boundary(k_new.i)[sl], 0.0)) * y / nuw
                val = jnp.where(
                    yp > ypl,
                    nuw * (yp * kappa / jnp.log(jnp.maximum(E * yp, 1.0 + 1e-12)) - 1.0),
                    0.0,
                )
            elif bc.kind == "nutFireWallFunction":
                val = state["alphat"].b[sl] * nuw / jnp.maximum(
                    state["alpha"].b[sl], tiny
                )
            else:  # nutUSpalding[Blowing]
                du = g.cell_to_boundary(U.i)[sl] - U.b[sl]
                mag_up = jnp.linalg.norm(du, axis=1)
                mag_grad = mag_up * g.b_dc[sl]
                ut = spalding_utau(mag_up, mag_grad, nuw, y, kappa, E)
                val = ut ** 2 / jnp.maximum(mag_grad, tiny)
                if bc.kind == "nutUSpaldingBlowingWallFunction":
                    h_ocp = float(bc.params.get("hOCp", 10.0))
                    r_phi = float(bc.params.get("rPhi", 2.5))
                    fmf = -state["phi"].b[sl] / g.b_magSf[sl] * r_phi * 1000.0
                    x = fmf / h_ocp
                    atten = jnp.minimum(
                        1.0,
                        (x + 1e-15)
                        / (jnp.expm1(jnp.clip(x, -50.0, 50.0)) + 1e-15),
                    )
                    val = val * atten
                val = val - nuw
            nut_b = nut_b.at[sl].set(jnp.maximum(val, 0.0))
        return nut_b

    # ------------------------------------------------------------------
    def _alphat_film_wf(self, state: Dict, bc, p) -> jnp.ndarray:
        """alphatFilmWallFunction (packages/regionModels/surfaceFilmModels/
        derivedFvPatchFields/wallFunctions/alphatFilmWallFunction/...C:
        updateCoeffs): gas-side turbulent thermal diffusivity over an
        evaporating film —
          u_τ = Cμ^0.25·√k,  y⁺ = y·u_τ/ν_w,  m* = ṁ_film/(y·u_τ)
          factor = m*/(e^{min(y⁺,y⁺crit)·m*·Pr}·(y⁺/y⁺crit)^{m*·Prt/κ} − 1)
          alphat = max(Δ⁻¹·ρ_w·u_τ·factor − α_w, 0)"""
        g = self.geom
        sl = p.slice
        T, Y = state["T"], state["Y"]
        Cmu = float(bc.params.get("Cmu", 0.09))
        kappa_k = float(bc.params.get("kappa", 0.41))
        Prt = float(bc.params.get("Prt", 0.85))
        yplus_crit = float(bc.params.get("yPlusCrit", 11.05))
        k_c = g.cell_to_boundary(state["k"].i)[sl]
        rho_w = state["rho"].b[sl]
        mu_w = state["mu"].b[sl]
        alpha_w = state["alpha"].b[sl]
        y = 1.0 / g.b_dc[sl]
        u_tau = Cmu**0.25 * jnp.sqrt(jnp.maximum(k_c, 0.0))
        y_plus = y * u_tau / jnp.maximum(mu_w / rho_w, 1e-30)
        Pr = mu_w / jnp.maximum(alpha_w, 1e-30)
        # film evaporation mass flux on this patch
        mdot_b = state.get("film_evap_b")
        if mdot_b is None:
            mdot_b = jnp.zeros((g.n_boundary,), self.dtype)
        m_star = mdot_b[sl] / jnp.maximum(y * u_tau, 1e-30)
        exp_lo = jnp.exp(jnp.minimum(y_plus * m_star * Pr, 50.0))
        exp_hi = jnp.exp(jnp.minimum(yplus_crit * m_star * Pr, 50.0))
        pow_term = (jnp.maximum(y_plus / yplus_crit, 1e-30)) ** (
            m_star * Prt / kappa_k
        )
        factor = jnp.where(
            y_plus > yplus_crit,
            m_star / jnp.maximum(exp_hi * pow_term - 1.0, 1e-30),
            m_star / jnp.maximum(exp_lo - 1.0, 1e-30),
        )
        alpha_eff = g.b_dc[sl] * rho_w * u_tau * factor
        return jnp.maximum(alpha_eff - alpha_w, 0.0)

    # ------------------------------------------------------------------
    def _evolve_cloud(self, state: Dict, log) -> Tuple[Dict, Dict]:
        """parcels.evolve() (fireFoam.C:88) → per-volume gas sources.

        Source conversion follows the explicit sourceTerms schemes
        (reactingCloud1Properties solution.sourceTerms): S = c·Trans/(V·Δt).
        """
        g = self.geom
        zeros = {
            "Srho": jnp.zeros(g.n_cells, self.dtype),
            "SU": jnp.zeros((g.n_cells, 3), self.dtype),
            "SYv": jnp.zeros(g.n_cells, self.dtype),
            "Sh": jnp.zeros(g.n_cells, self.dtype),
        }
        if self.cloud is None:
            return state, zeros
        Y, T = state["Y"], state["T"]
        gas_ctx = {
            "t": state["t"],
            "rho": state["rho"].i,
            "U": state["U"].i,
            "T": T.i,
            "p": state["p"].i,
            "mu": state["mu"].i,
            "kappa": self.gas.kappa(T.i, Y.i),
            "cp": self.gas.cp(T.i, Y.i),
            "Yv": Y.i[:, self.cloud.vapour_index],
            "W": 8314.47 / self.gas.R(Y.i),
        }
        if self.cloud.multi_liq:
            # per-component carrier vapour fractions for the per-component
            # evaporation driving force (LiquidEvaporation.C Xc per liquid)
            gas_ctx["YvC"] = Y.i[:, jnp.asarray(self.cloud.vapour_indices)]
        if self.cloud.forces.needs_curl():
            gu = fvc.grad(g, state["U"])  # [nC,3,3], gu[c,i,j] = dU_j/dx_i
            gas_ctx["curlU"] = jnp.stack(
                [
                    gu[:, 1, 2] - gu[:, 2, 1],
                    gu[:, 2, 0] - gu[:, 0, 2],
                    gu[:, 0, 1] - gu[:, 1, 0],
                ],
                axis=1,
            )
        if self.cloud.forces.needs_ddt():
            # DUc/Dt ≈ ∂U/∂t + (U·∇)U from the stored old-time velocity
            gu = fvc.grad(g, state["U"])
            conv = jnp.einsum("cd,cde->ce", state["U"].i, gu)
            if "rhoU_old_i" in state:
                u_old = state["rhoU_old_i"] / jnp.maximum(
                    state["rho_old_i"], small()
                )[:, None]
                gas_ctx["DUDt"] = (state["U"].i - u_old) / state["dt"] + conv
            else:
                gas_ctx["DUDt"] = conv
        if self.film is not None and "film" in state:
            # film thickness per boundary face → splash wet/dry regimes
            m = self._film_maps
            fd = jnp.zeros((g.n_boundary,), self.dtype)
            gas_ctx["film_delta_b"] = fd.at[m["bidx"]].set(
                state["film"]["delta"][m["rows"]]
            )
        if self.cloud.cfg.radiation and self.radiation is not None and "rad" in state:
            # stale per-band incident radiation for the parcel heating term
            # (ThermoCloud::radCalc reads fvdomModel_.GLambda)
            gas_ctx["G_bands"] = self.radiation.G_bands(state["rad"])
        if "film_drip_b" in state:
            # previous step's film drip feeds FilmDripInjection
            gas_ctx["film_drip_b"] = state["film_drip_b"]
            gas_ctx["film_U_b"] = state["film_U_b"]
        cst, src = self.cloud.evolve(state["cloud"], gas_ctx, state["dt"])
        state = dict(state)
        state["cloud"] = cst
        if "cloud_rad" in src:
            # spray aDisp/sigmap/Ep enter the next fvDOM solve
            # (radiativeIntensityRay.C:296-303)
            state["cloud_rad"] = src["cloud_rad"]
        inv_vdt = 1.0 / (g.V * state["dt"])
        cfg = self.cloud.cfg
        out = {
            # sync: under SPMD the parcel scatters only fill owned cells
            # (parcels migrate to their owner before physics), so the halo
            # slots of the source fields must be refreshed before the gas
            # equations read them (identity on the global geometry)
            "Srho": g.sync(cfg.relax_rho * src["rhoTrans"] * inv_vdt),
            "SU": g.sync(cfg.relax_U * src["UTrans"] * inv_vdt[:, None]),
            "SYv": g.sync(cfg.relax_Yi * src["rhoTrans"] * inv_vdt),
            "Sh": g.sync(cfg.relax_h * src["hsTrans"] * inv_vdt),
            "filmMass": src["filmMass"],
            "filmEnthalpy": src["filmEnthalpy"],
        }
        if "pcTrans" in src:
            # per-component evaporation: each liquid's mass enters its OWN
            # carrier species (ReactingParcel per-component dMassPC ->
            # parcels.SYi, YEEqn.H:52), replacing the fixed-split SYv route
            pc = src["pcTrans"]  # [nLiq, nC]
            out["SYv"] = jnp.zeros_like(out["SYv"])
            sy = dict(out.get("SY", {}))
            for i, si in enumerate(self.cloud.vapour_indices):
                sy[si] = sy.get(si, 0.0) + g.sync(
                    cfg.relax_Yi * pc[i] * inv_vdt
                )
            out["SY"] = sy
        if "dvTrans" in src and self.cloud.devol is not None:
            # devolatilised volatiles: continuity + their OWN species
            # (parcels.Srho + SYi, YEEqn.H:52 — distinct from the
            # evaporation split over vapour_indices)
            dv = src["dvTrans"]  # [nVol, nC]
            out["Srho"] = out["Srho"] + g.sync(
                cfg.relax_rho * jnp.sum(dv, axis=0) * inv_vdt
            )
            sy = dict(out.get("SY", {}))
            for i, si in enumerate(self.cloud.devol.gas_indices):
                sy[si] = sy.get(si, 0.0) + g.sync(
                    cfg.relax_Yi * dv[i] * inv_vdt
                )
            out["SY"] = sy
        info = self.cloud.info(cst)
        log["cloud_nParcels"] = info["nParcels"]
        log["cloud_mass"] = info["massInSystem"]
        return state, out

    # ------------------------------------------------------------------
    def _eqn_relax_factor(self, name: str) -> Optional[float]:
        """relaxationFactors.equations lookup (regex keys); None = no
        relax() call at all (OpenFOAM fvMatrix::relax() no-ops when
        mesh.relaxEquation(name) is false)."""
        if self._eq_relax is None:
            return None
        v = self._eq_relax.lookup(name, None)
        return None if v is None else float(v)

    # ------------------------------------------------------------------
    def _parse_div_scheme(self, key: str, default: tuple) -> tuple:
        """fvSchemes.divSchemes[key] → scheme tuple: ('LUST',) |
        ('linear',) | ('upwind',) | ('limitedLinear'|'limitedLinear01', k) |
        ('filteredLinear2'|'filteredLinear2V', k, l). Unknown schemes raise
        (no silent substitution)."""
        try:
            v = self.case.fv_schemes.get_dict("divSchemes").lookup(key, None)
        except Exception:
            v = None
        if v is None:
            return default
        toks = [str(t) for t in v] if isinstance(v, list) else [str(v)]
        if toks and toks[0] == "Gauss":
            toks = toks[1:]
        if not toks:
            return default
        name = toks[0]
        if name == "LUST":
            return ("LUST",)
        if name in ("linear", "upwind"):
            return (name,)
        if name in ("limitedLinear", "limitedLinearV", "limitedLinear01"):
            k = float(toks[1]) if len(toks) > 1 else 1.0
            return ("limitedLinear01" if name.endswith("01") else "limitedLinear", k)
        if name in ("filteredLinear2", "filteredLinear2V"):
            k = float(toks[1]) if len(toks) > 1 else 1.0
            l = float(toks[2]) if len(toks) > 2 else 0.0
            return ("filteredLinear2", k, l)
        raise NotImplementedError(f"divSchemes {key}: scheme '{name}'")

    def _div_weights(self, scheme: tuple, phi, psi, grad_psi=None):
        """Per-face interpolation weights for a parsed div scheme (the
        non-deferred-correction family; LUST is handled at the call site)."""
        g = self.geom
        name = scheme[0]
        if name == "linear":
            return g.w
        if name == "upwind":
            return fvm.upwind_weights(g, phi.i)
        if name in ("limitedLinear", "limitedLinear01"):
            return fvm.limited_linear_weights(
                g, phi.i, psi, k=scheme[1], bound01=name.endswith("01")
            )
        if name == "filteredLinear2":
            lim = fvm.filtered_linear2_limiter(
                g, psi, grad_psi, k=scheme[1], l=scheme[2]
            )
            return fvm.limiter_weights(g, phi.i, lim)
        raise NotImplementedError(f"div scheme '{name}'")

    # ------------------------------------------------------------------
    # equation pieces (all traced inside step)
    # ------------------------------------------------------------------
    def _u_eqn(self, state, log, srcs):
        g = self.geom
        U, rho, phi, mu = state["U"], state["rho"], state["phi"], state["mu"]
        mu_eff = VolField(mu.i + rho.i * state["nut"].i, mu.b + rho.b * state["nut"].b)
        ctx = self._ctx(state, srcs.get("_ov"))

        rv, rg, f = bcmod.resolve(self.U_bcs, g, U, ctx)
        vic, vbc = fvm.mixed_value_coeffs(rv, rg, f, g.b_dc)
        gic, gbc = fvm.mixed_gradient_coeffs(rv, rg, f, g.b_dc)

        gradU = fvc.grad(g, U)
        mu_eff_f = SurfaceField(fvc.interpolate(g, mu_eff).i, mu_eff.b)

        if self.u_div_scheme[0] == "LUST":
            conv = fvm.lust_div(g, phi, U, vic, vbc, gradU)
        else:
            w_u = self._div_weights(self.u_div_scheme, phi, U, gradU)
            conv = fvm.div(g, phi, U, w_u, vic, vbc)
        m = (
            fvm.ddt(g, rho.i, U, U.i, state["rho_old_i"], state["dt"])
            + conv
            - fvm.laplacian(g, mu_eff_f, U, gic, gbc, corr=self._lap_corr(U))
        )
        # explicit part of divDevRhoReff: −div(muEff·dev2(∇Uᵀ))
        div_tau = self.turb.div_dev_rho_reff(U, mu_eff, gradU)
        m = m.add_source(div_tau + srcs["SU"])  # + parcels.SU(U) (UEqn.H:9)
        if self.fv_options is not None and self.fv_options.active:
            # fvOptions(rho, U) (UEqn.H:31)
            su_o, sp_o = self.fv_options.source("U", U.i, self.dtype)
            m = fvm.FvMatrix(
                g, m.diag - sp_o * g.V, m.lower, m.upper,
                m.source + su_o * g.V[:, None], m.internal_coeffs,
                m.boundary_coeffs, m.psi,
            )

        # UEqn.relax() happens BEFORE the buoyancy source enters (UEqn.H:13
        # relaxes tUEqn; buoyancy joins at the solve(UEqn == ...) )
        rf = self._eqn_relax_factor("U")
        if rf is not None:
            m = m.relax(rf)

        # buoyancy + pressure-gradient source (UEqn.H:22-31):
        # reconstruct((−ghf·snGrad(rho) − snGrad(p_rgh))·magSf).
        # OpenFOAM solves `UEqn == reconstruct(...)` — the == builds a
        # TEMPORARY matrix, so the named UEqn (whose A()/H() the pEqn
        # consumes) never contains this source: buoyancy reaches the pEqn
        # only through phig. Keep the solve matrix separate or HbyA
        # double-counts buoyancy and the plume over-accelerates.
        sg_rho = fvc.sn_grad(g, rho)
        sg_p = fvc.sn_grad(g, state["p_rgh"])
        face_src = SurfaceField(
            (-self.ghf_i * sg_rho.i - sg_p.i) * g.magSf,
            (-self.ghf_b * sg_rho.b - sg_p.b) * g.b_magSf,
        )
        recon_src = fvc.reconstruct(g, face_src)
        if os.environ.get("FIREFOAM_TPU_DEBUG_U"):
            log["dbg_ay_src_pred"] = recon_src[:, 1] / rho.i
            log["dbg_rho_pred"] = rho.i
        m_solve = m.add_source(recon_src)

        # one vmapped solve over the 3 components (same matrix, 3 RHS) —
        # a single while_loop in the graph instead of three
        ctl = _solver_controls(self.fv_solution, "Ux", "U")
        fn = self._lin_fn(ctl, n_comp=3)

        dtot, b = m_solve.totals()

        def solve_c(x0, d, bb):
            return fn(lambda x: m_solve.matvec(x, d), x0, bb, d, m_solve)

        res = jax.vmap(solve_c, in_axes=(1, 1, 1), out_axes=0)(U.i, dtot, b)
        for c, comp in enumerate("xyz"):
            log[f"U{comp}_res0"] = res.initial_residual[c]
            log[f"U{comp}_iters"] = res.n_iterations[c]
        U_new = VolField(res.x.T, U.b)
        U_new = bcmod.apply_coeffs(g, U_new, rv, rg, f)
        # the resolved coefficients are reused by pEqn.H:46's
        # U.correctBoundaryConditions() — OpenFOAM's updateCoeffs runs once
        # per step (at this assembly), so flowRateInletVelocity's value is
        # fixed with THIS moment's rho_b for the whole step
        return U_new, m, (rv, rg, f)

    def _p_rgh_fused(self) -> bool:
        """Whether p_rgh solves take the fused whole-solve Pallas CG.

        Crossover measured on v5e: below ~50k cells the flat XLA CG wins
        (477 vs 265 M CUPS at steckler's 9k); above it the flat path is
        dispatch-latency-bound (190 us/iter at 500k vs ~50 us of HBM
        traffic) and the single-launch VMEM-resident kernel takes over."""
        from ..solvers import pallas_cg

        g = self.geom
        return (
            self._local is None
            and self.dtype != jnp.float64
            and getattr(g, "layout", "seg") == "dia"
            and g.n_cells >= 50000
            and pallas_cg.enabled(g.layout, g.n_cells)
        )

    def _lin_fn(self, ctl, n_comp: int = 1):
        """fn(matvec, x0, b, diag, m) → SolverResult, honouring the case's
        fvSolution exactly: PCG+DIC and smoothSolver+symGaussSeidel run the
        OpenFOAM-exact wavefront implementations (solvers/dic.py) so the
        iteration counts and the left-over error modes track the golden
        log's; anything else falls back to the generic Krylov solvers."""
        from ..solvers.dic import dic_pcg, sgs_solve
        from ..solvers.linear import bicgstab, jacobi_smooth, pcg

        sol, pre, smo = ctl["solver"], ctl["preconditioner"], ctl["smoother"]
        tol, rel, mx = ctl["tolerance"], ctl["relTol"], ctl["maxIter"]
        if self._ldu is None:
            sol = {"smoothSolver": "smoothSolver"}.get(sol, sol)
            pre, smo = "", ""
        if sol == "PCG" and pre == "DIC":
            return lambda mv, x0, b, d, m: dic_pcg(
                self._ldu, mv, d, m.upper, b, x0, tol, rel, mx
            )
        if sol == "smoothSolver" and smo.endswith("GaussSeidel"):
            return lambda mv, x0, b, d, m: sgs_solve(
                self._ldu, mv, d, m.lower, m.upper, b, x0,
                tol, rel, mx, ctl["nSweeps"],
            )
        mx2 = mx if sol != "smoothSolver" else max(mx, 200)
        from ..solvers import pallas_cg

        g = self.geom
        # Fused-kernel VMEM accounting: a small vmapped solve keeps n_comp
        # whole Krylov states resident at once (flat batch — charge
        # n_comp x 1.4x); past pallas_cg.grid_threshold() the kernel
        # switches to grid-over-batch (one folded row per program), so the
        # per-program budget is the single-row cost and only n_cells counts
        if n_comp == 1 or g.n_cells * n_comp > pallas_cg.grid_threshold():
            eff_cells = g.n_cells
        else:
            eff_cells = int(g.n_cells * n_comp * 1.4)
        if pallas_cg.enabled(g.layout, eff_cells) and self.dtype != jnp.float64:
            # fused whole-solve pallas kernels: the entire Krylov/smoother
            # loop runs in one kernel with all vectors VMEM-resident (one
            # launch per solve instead of ~10 per iteration)
            interp = pallas_cg.interpret_mode()
            if sol in ("PCG", "GAMG"):
                kern, kmx = pallas_cg.dia_pcg, mx2
            elif sol == "smoothSolver":
                # pallas max_iter counts sweeps; jacobi_smooth counts
                # 4-sweep check rounds
                kern, kmx = pallas_cg.dia_smooth, mx2 * 4
            else:
                kern, kmx = pallas_cg.dia_bicgstab, mx2
            return lambda mv, x0, b, d, m: kern(
                d, m.upper, m.lower, b, x0, g.offsets, g.n_cells,
                tol=tol, rel_tol=rel, max_iter=kmx, interpret=interp,
            )
        base = {"PCG": pcg, "GAMG": pcg, "smoothSolver": jacobi_smooth}.get(
            sol, bicgstab
        )
        sfn, dfn, mfn = g.solver_reducers()

        def _flat(mv, x0, b, d, m):
            res = base(
                mv, x0, b, d, tol=tol, rel_tol=rel, max_iter=mx2,
                sum_fn=sfn, dot_fn=dfn, mean_fn=mfn,
            )
            return res._replace(x=g.sync(res.x))

        return _flat

    def _multivariate_weights(self, state):
        """div(phi,Yi_h) Gauss multivariateSelection — ONE shared convection
        weight field for all species AND the energy equation, built from the
        elementwise MIN limiter over every field in the multivariate table
        (all Y with limitedLinear01, hs with limitedLinear), exactly as
        multivariateSelectionScheme's ctor does (weights_ = λ·linear +
        (1−λ)·upwind with λ = min over fields); consumed by YEEqn.H:1-10
        mvConvection for both Yi and hs."""
        g = self.geom
        phi_i = state["phi"].i
        Y = state["Y"]
        lim = None
        for s in range(len(self.species)):
            l = fvm.limited_linear_limiter(
                g, phi_i, VolField(Y.i[:, s], Y.b[:, s]), k=1.0, bound01=True
            )
            lim = l if lim is None else jnp.minimum(lim, l)
        l_h = fvm.limited_linear_limiter(g, phi_i, state["hs"], k=1.0)
        lim = jnp.minimum(lim, l_h)
        return fvm.limiter_weights(g, phi_i, lim)

    def _y_eqns(self, state, log, srcs, w_mv):
        """Species transport with EDM source (YEEqn.H:27-77)."""
        g = self.geom
        rho, phi = state["rho"], state["phi"]
        Y = state["Y"]
        dt = state["dt"]

        eps = self.turb.epsilon(state["k"].i)
        spray_rho = None
        if self.cloud is not None and "cloud" in state:
            c = state["cloud"]
            vol = (
                c["nP"] * (jnp.pi / 6.0) * c["d"] ** 3
                * c["alive"].astype(rho.i.dtype)
            )
            spray_rho = (
                1000.0 * jnp.zeros_like(rho.i).at[c["cell"]].add(vol) / g.V
            )
        rates = self.combustion.rates(
            rho.i, Y.i, state["k"].i, eps, state["alpha"].i, self.turb.delta,
            dt, T=state["T"].i, p=state["p"].i, spray_rho=spray_rho,
            near_wall=self._near_wall_mask, t=state["t"],
            nu=state["mu"].i / rho.i, nut=state["nut"].i,
        )
        w_fuel = rates["w_fuel"]
        qdot = self.combustion.qdot(rates)
        if "localRadFrac" in rates:
            # consumed by localFuelRadFractionEmission (ECont = lrf·Qdot)
            state["localRadFrac"] = rates["localRadFrac"]

        # species effective diffusivity dEff (solver/YEEqn.H:12-25 +
        # readAdditionalThermo.H:32-48): alphaEff by default; non-unity
        # Lewis number gives alphat + alpha/Le; constD replaces the
        # molecular part with DM·rho (energy keeps alphaEff — the
        # reference's own "FIXME: species uses dEff and energy uses
        # alphaEff" asymmetry)
        if self.const_D:
            alpha_eff = VolField(
                state["alphat"].i + self.DM * state["rho"].i,
                state["alphat"].b + self.DM * state["rho"].b,
            )
        elif self.lewis_no != 1.0:
            alpha_eff = VolField(
                state["alphat"].i + state["alpha"].i / self.lewis_no,
                state["alphat"].b + state["alpha"].b / self.lewis_no,
            )
        else:
            alpha_eff = VolField(
                state["alphat"].i + state["alpha"].i,
                state["alphat"].b + state["alpha"].b,
            )
        alpha_eff_f = SurfaceField(fvc.interpolate(g, alpha_eff).i, alpha_eff.b)
        ctx = self._ctx(state, srcs.get("_ov"))
        ctl = _solver_controls(self.fv_solution, "Yi")

        inert_idx = self.gas.index(self.inert)
        solved = [s for s in range(len(self.species)) if s != inert_idx]

        # per-species BC coefficients + sources resolved in Python (static
        # BC kinds), stacked along a leading species axis
        rvs, rgs, fs, srcss = [], [], [], []
        for s in solved:
            Ys = VolField(Y.i[:, s], Y.b[:, s])
            rv, rg, f = bcmod.resolve(self.Y_bcs[s], g, Ys, ctx)
            rvs.append(rv)
            rgs.append(rg)
            fs.append(f)
            src_s = self.combustion.R(rates, s)
            if self.cloud is not None:
                # parcels.SYi (YEEqn.H:52): evaporated mass split over the
                # liquid components' vapour species (SingleMixtureFraction
                # multi-liquid → Raoult-weighted fractions; single → 1.0)
                for vi, vf in zip(
                    self.cloud.vapour_indices, self.cloud.vapour_fracs
                ):
                    if s == vi:
                        src_s = src_s + vf * srcs["SYv"]
            extra = srcs.get("SY", {}).get(s)  # per-species sources (e.g.
            if extra is not None:  # char-oxidation O2 sink / CO2 return)
                src_s = src_s + extra
            srcss.append(src_s)
        rv_s = jnp.stack(rvs)
        rg_s = jnp.stack(rgs)
        f_s = jnp.stack(fs)
        src_s = jnp.stack(srcss)
        Yi_s = Y.i[:, jnp.asarray(solved)].T
        Yb_s = Y.b[:, jnp.asarray(solved)].T

        fn = self._lin_fn(ctl, n_comp=len(solved))
        rho_old = state["rho_old_i"]
        # YiEqn.relax(): all solved species share one factor in practice
        # (regex keys); None = no relax call
        rfs = {self._eqn_relax_factor(self.species[s]) for s in solved}
        relax_f = rfs.pop() if len(rfs) == 1 else None

        def assemble_solve(ys_i, ys_b, rv, rg, f, src):
            # one species: assemble + solve (vmapped over species)
            Ysf = VolField(ys_i, ys_b)
            vic, vbc = fvm.mixed_value_coeffs(rv, rg, f, g.b_dc)
            gic, gbc = fvm.mixed_gradient_coeffs(rv, rg, f, g.b_dc)
            m = (
                fvm.ddt(g, rho.i, Ysf, ys_i, rho_old, dt)
                + fvm.div(g, phi, Ysf, w_mv, vic, vbc)
                - fvm.laplacian(g, alpha_eff_f, Ysf, gic, gbc, corr=self._lap_corr(Ysf))
            )
            m = m.add_source(src)
            if relax_f is not None:
                m = m.relax(relax_f)  # YiEqn.relax() (YEEqn.H:56)
            dtot, b = m.totals()
            return fn(lambda x: m.matvec(x, dtot), ys_i, b, dtot, m)

        res = jax.vmap(assemble_solve)(Yi_s, Yb_s, rv_s, rg_s, f_s, src_s)

        new_cols_i = [None] * len(self.species)
        new_cols_b = [None] * len(self.species)
        for k, s in enumerate(solved):
            yi = jnp.maximum(res.x[k], 0.0)
            ys_new = bcmod.evaluate(
                self.Y_bcs[s], g, VolField(yi, Y.b[:, s]), ctx
            )
            new_cols_i[s] = ys_new.i
            new_cols_b[s] = ys_new.b
            log[f"{self.species[s]}_res0"] = res.initial_residual[k]
            log[f"{self.species[s]}_iters"] = res.n_iterations[k]

        # inert specie: Yt bookkeeping (YEEqn.H:62-66)
        others_i = sum(c for i, c in enumerate(new_cols_i) if i != inert_idx)
        others_b = sum(c for i, c in enumerate(new_cols_b) if i != inert_idx)
        new_cols_i[inert_idx] = jnp.maximum(1.0 - others_i, 0.0)
        new_cols_b[inert_idx] = jnp.maximum(1.0 - others_b, 0.0)
        Y_new = VolField(jnp.stack(new_cols_i, axis=1), jnp.stack(new_cols_b, axis=1))
        return Y_new, qdot

    def _hs_bcs_from_T(self, state, Y_new, ov=None):
        """Derive sensible-enthalpy mixed BC coefficients from T's BCs
        (fixedEnergy/gradientEnergy behaviour)."""
        g = self.geom
        ctx = self._ctx(state, ov)
        rvT, rgT, fT = bcmod.resolve(self.T_bcs, g, state["T"], ctx)
        # mixedEnergy mapping: refValue = hs(T_ref, Y_b); refGrad =
        # Cpv·∂T/∂n + Δc·(hs(T_w) − hs(T_cell)) (mixedEnergyFvPatchScalar-
        # Field::updateCoeffs — the Δc term keeps the energy gradient
        # consistent with the nonlinear hs(T) map)
        hs_ref = self.gas.hs(jnp.maximum(rvT, 10.0), Y_new.b)
        cp_b = self.gas.cp(state["T"].b, Y_new.b)
        hs_w = self.gas.hs(state["T"].b, Y_new.b)
        hs_c = self.gas.hs(g.cell_to_boundary(state["T"].i), Y_new.b)
        rg = cp_b * rgT + g.b_dc * (hs_w - hs_c)
        return hs_ref, rg, fT

    def _e_eqn(self, state, Y_new, qdot, log, srcs, w_mv):
        """Sensible-enthalpy energy equation (YEEqn.H:84-118)."""
        g = self.geom
        rho, phi, hs, U = state["rho"], state["phi"], state["hs"], state["U"]
        dt = state["dt"]
        alpha_eff = VolField(
            state["alphat"].i + state["alpha"].i, state["alphat"].b + state["alpha"].b
        )
        alpha_eff_f = SurfaceField(fvc.interpolate(g, alpha_eff).i, alpha_eff.b)

        rv, rg, f = self._hs_bcs_from_T(state, Y_new, srcs.get("_ov"))
        vic, vbc = fvm.mixed_value_coeffs(rv, rg, f, g.b_dc)
        gic, gbc = fvm.mixed_gradient_coeffs(rv, rg, f, g.b_dc)
        w = w_mv  # shared multivariate convection weights (YEEqn.H:1-10)

        # kinetic-energy and dpdt terms (explicit)
        K = VolField(0.5 * jnp.sum(U.i * U.i, axis=1), 0.5 * jnp.sum(U.b * U.b, axis=1))
        ddtK = (rho.i * K.i - state["rho_old_i"] * state["K_old_i"]) / dt
        divK = fvc.div_flux_psi(g, phi, fvc.interpolate(g, K))

        # radiation coupling
        if self.radiation is not None:
            sh_rad = self.radiation.Sh(state, self.gas)
        else:
            sh_rad = -self.ehrr * qdot  # optically-thin fallback

        m = (
            fvm.ddt(g, rho.i, hs, hs.i, state["rho_old_i"], dt)
            + fvm.div(g, phi, hs, w, vic, vbc)
            - fvm.laplacian(g, alpha_eff_f, hs, gic, gbc, corr=self._lap_corr(hs))
        )
        m = m.add_source(
            qdot + sh_rad + srcs["Sh"] + state["dpdt"] - ddtK - divK
        )  # + parcels.Sh (YEEqn.H:99)
        if self.fv_options is not None and self.fv_options.active:
            # fvOptions(rho, h) (YEEqn.H:101): Su + Sp·h semi-implicit
            su_o, sp_o = self.fv_options.source("h", hs.i, self.dtype)
            m = fvm.FvMatrix(
                g, m.diag - sp_o * g.V, m.lower, m.upper,
                m.source + su_o * g.V, m.internal_coeffs, m.boundary_coeffs,
                m.psi,
            )
        rf = self._eqn_relax_factor("h")
        if rf is not None:
            m = m.relax(rf)  # EEqn.relax() (YEEqn.H:107)

        ctl = _solver_controls(self.fv_solution, "h", "hs")
        res = solve_scalar(
            m, hs.i, solver=ctl["solver"], tol=ctl["tolerance"],
            rel_tol=ctl["relTol"], max_iter=ctl["maxIter"],
            sched=self._ldu, preconditioner=ctl["preconditioner"],
            smoother=ctl["smoother"], n_sweeps=ctl["nSweeps"],
        )
        log["h_res0"] = res.initial_residual
        log["h_iters"] = res.n_iterations

        # thermo.correct(): T(hs), boundary values, transport props
        T_i = self.gas.T_from_hs(res.x, Y_new.i, state["T"].i)
        hs_b = f * rv + (1.0 - f) * (g.cell_to_boundary(res.x) + rg / g.b_dc)
        T_b = self.gas.T_from_hs(hs_b, Y_new.b, state["T"].b)
        T_new = VolField(T_i, T_b)
        hs_new = VolField(res.x, hs_b)
        psi_new = VolField(self.gas.psi(T_i, Y_new.i), self.gas.psi(T_b, Y_new.b))
        mu_new = VolField(self.gas.mu(T_i, Y_new.i), self.gas.mu(T_b, Y_new.b))
        alpha_new = VolField(self.gas.alpha(T_i, Y_new.i), self.gas.alpha(T_b, Y_new.b))
        return hs_new, T_new, psi_new, mu_new, alpha_new

    def _p_eqn(self, state, u_matrix, final, srcs=None, ubc_coeffs=None):
        """PISO pressure corrector (solver/pEqn.H). `final` may be a traced
        0/1 index selecting p_rgh vs p_rghFinal solver controls; returns the
        updated fields plus a residual/continuity info dict (the corrector
        loop is a lax.scan — one compiled body for all correctors)."""
        g = self.geom
        dt = state["dt"]
        psi, p_rgh = state["psi"], state["p_rgh"]
        rho = VolField(psi.i * state["p"].i, psi.b * state["p"].b)  # thermo.rho()

        rAU = 1.0 / u_matrix.A()
        rho_rAU_f = fvc.interpolate(g, VolField(rho.i * rAU, rho.b * g.cell_to_boundary(rAU)))
        # pEqn.H is re-included per corrector, so UEqn.H() is evaluated with
        # the CURRENT U (post-predictor for corrector 1, post-corrector after)
        # — re-bind the matrix psi to this corrector's U before taking H
        m_h = fvm.FvMatrix(
            g, u_matrix.diag, u_matrix.lower, u_matrix.upper, u_matrix.source,
            u_matrix.internal_coeffs, u_matrix.boundary_coeffs, state["U"],
        )
        HbyA_i = rAU[:, None] * m_h.H()
        # constrainHbyA sees the CURRENT U boundary: OpenFOAM updates U's
        # inlet BCs during UEqn assembly (fvMatrix ctor updateCoeffs), so
        # the burner flux is live from step 0's pEqn — the golden log's
        # step-1 Courant 0.054 is that jet. The one-step fuel delay comes
        # from the species BC's lagged refValue instead (see
        # ops/bcs.py:_total_flow_rate_adv_diff).
        #
        # flowRateInletVelocity patches are RE-METERED against THIS
        # corrector's thermo rho_b: the pEqn's rho = thermo.rho() update
        # (pEqn.H:1) runs after the YEqn/thermo pass, so a stale UEqn-time
        # U_b times the new rho_b would inject rho_new/rho_old × ṁ for one
        # whole step — +55% fuel mass the step after the burner turns
        # fuel-rich (air→C3H8 ≈ 1.15→1.78). The golden log's per-step fuel
        # inventory (ΔgAverage(C3H8) = 3.31e-5/step = exactly ṁ·Δt) shows
        # the reference's flux stays metered through that transition.
        U_b_eff = state["U"].b
        metered = []  # [(slice, u_met)] for the post-solve U_b carry
        for bc in self.U_bcs.bcs:
            if bc.kind != "flowRateInletVelocity":
                continue
            pch = next(p for p in g.patches if p.name == bc.patch)
            sl = pch.slice
            from ..ops.bcs import _interp_table

            if "massFlowRate_table" in bc.params:
                mdot = _interp_table(bc.params["massFlowRate_table"], state["t"])
            else:
                mdot = jnp.asarray(
                    bc.params.get("massFlowRate", 0.0), self.dtype
                )
            A = g.bsum(g.b_magSf, sl)
            n = g.b_Sf[sl] / g.b_magSf[sl, None]
            u_met = -n * (mdot / (rho.b[sl] * A))[:, None]
            U_b_eff = U_b_eff.at[sl].set(u_met)
            metered.append((sl, u_met))
        HbyA = VolField(HbyA_i, U_b_eff)

        sg_rho = fvc.sn_grad(g, rho)
        phig = SurfaceField(
            -rho_rAU_f.i * self.ghf_i * sg_rho.i * g.magSf,
            -rho_rAU_f.b * self.ghf_b * sg_rho.b * g.b_magSf,
        )
        # fvc::flux(rho*HbyA): interpolate the PRODUCT field (pEqn.H:13)
        rhoHbyA = VolField(rho.i[:, None] * HbyA.i, rho.b[:, None] * HbyA.b)
        hflux = fvc.flux(g, rhoHbyA)
        # rhorAUf*fvc::ddtCorr(rho, U, phi) — Euler ddtPhiCorr from old-time
        # fields: coeff·(phi_old − (interp(rho_old·U_old)&Sf))/dt with
        # coeff = 1 − min(|phi_old − flux(rho_old·U_old)|/(|phi_old|+ε), 1)
        ddt_corr_i = jnp.zeros_like(hflux.i)
        if "phi_old_i" in state:
            phi_old = state["phi_old_i"]
            rhoU_old = state["rhoU_old_i"]
            flux_old = fvc.flux(
                g, VolField(rhoU_old, jnp.zeros_like(rhoHbyA.b))
            ).i
            diff = phi_old - flux_old
            coeff = 1.0 - jnp.minimum(
                jnp.abs(diff) / (jnp.abs(phi_old) + small()), 1.0
            )
            ddt_corr_i = rho_rAU_f.i * coeff * diff / dt
        phi_hbya = SurfaceField(
            hflux.i + ddt_corr_i + phig.i, hflux.b + phig.b
        )

        # constrainPressure: fixedFluxPressure gradients so flux matches U_b
        u_flux_b = rho.b * jnp.einsum("fd,fd->f", g.b_Sf, U_b_eff)
        grad_override = (phi_hbya.b - u_flux_b) / (rho_rAU_f.b * g.b_magSf)
        overrides = dict(srcs.get("_ov") or {}) if srcs is not None else {}
        for bc, pch in zip(self.p_rgh_bcs.bcs, g.patches):
            if bc.kind == "fixedFluxPressure":
                overrides[("p_rgh", pch.name, "gradient")] = grad_override[pch.slice]
        ctx = self._ctx(state, overrides)
        ctx["_field"] = "p_rgh"

        rv, rg, f = bcmod.resolve(self.p_rgh_bcs, g, p_rgh, ctx)
        gic, gbc = fvm.mixed_gradient_coeffs(rv, rg, f, g.b_dc)
        m_lap = fvm.laplacian(g, rho_rAU_f, p_rgh, gic, gbc, corr=self._lap_corr(p_rgh))

        # p_rghEqn (pEqn.H:26-38):
        #   fvm::ddt(psi, p_rgh) + fvc::ddt(psi,rho)·gh + fvc::ddt(psi)·pRef
        #   + fvc::div(phiHbyA) − fvm::laplacian(rhorAUf, p_rgh) = Srho
        # with old-TIME values (not corrector iterates) in every ddt.
        psi_old = state.get("psi_old_i", psi.i)
        rho_old = state["rho_old_i"]
        p_rgh_old = state.get("p_rgh_old_i", p_rgh.i)
        m = -m_lap
        m = fvm.FvMatrix(
            g,
            m.diag + psi.i * g.V / dt,
            m.lower,
            m.upper,
            m.source
            + psi.i * g.V / dt * p_rgh_old
            - (self.gh * (psi.i * rho.i - psi_old * rho_old) / dt) * g.V
            - (self.p_ref * (psi.i - psi_old) / dt) * g.V
            - fvc.surface_sum(g, phi_hbya)
            + (srcs["Srho"] * g.V if srcs is not None else 0.0),
            m.internal_coeffs,
            m.boundary_coeffs,
            m.psi,
        )
        # corr-dependent tolerances enter as traced scalars so every
        # corrector shares ONE compiled body (p_rgh vs p_rghFinal controls)
        c0 = _solver_controls(self.fv_solution, "p_rgh")
        c1 = _solver_controls(self.fv_solution, "p_rghFinal", "p_rgh")
        tols = jnp.asarray([c0["tolerance"], c1["tolerance"]], self.dtype)
        rels = jnp.asarray([c0["relTol"], c1["relTol"]], self.dtype)
        sel = int(final) if isinstance(final, bool) else final
        from ..solvers.linear import pcg

        dtot, b = m.totals()
        # solver priority: the OpenFOAM-exact DIC-PCG comes FIRST on the
        # f64 fidelity path. The stopping rule (relTol 0.01) leaves a
        # smooth-mode pressure error ~κ× the residual; that leftover acts
        # as a body force seeding the reference's domain-wide early flow
        # (golden log mean Co 0.0185 after one step). An AMG solve at the
        # same stated tolerance kills exactly those modes and produces a
        # quieter — different — flow field, so AMG is the perf path only.
        if (
            os.environ.get("FIREFOAM_TPU_P64_PRGH") == "1"
            and self.dtype != jnp.float64
        ):
            # mixed precision: the p_rgh solve (the step's stiffest system,
            # condition grows with 1/dt·psi vs laplacian contrast) in f64
            # while the rest of the step stays f32 — the candidate policy
            # for tight-tolerance runs (docs/PERF.md precision policy)
            f8 = jnp.float64
            up64 = m.upper.astype(f8)
            lo64 = m.lower.astype(f8)
            d64 = dtot.astype(f8)

            def mv64(x):
                x = g.sync(x)
                y = d64 * x
                y = y + g.face_to_both_sum(
                    up64 * g.gather_nei(x), lo64 * g.gather_own(x)
                )
                return y

            sfn, dfn, mfn = g.solver_reducers()
            res = pcg(
                mv64, p_rgh.i.astype(f8), b.astype(f8), d64,
                tol=tols[sel].astype(f8), rel_tol=rels[sel].astype(f8),
                sum_fn=sfn, dot_fn=dfn, mean_fn=mfn,
            )
            res = res._replace(x=g.sync(res.x).astype(self.dtype))
        elif (
            self._ldu is not None
            and c0["solver"] == "PCG"
            and c0["preconditioner"] == "DIC"
        ):
            from ..solvers.dic import dic_pcg

            res = dic_pcg(
                self._ldu, lambda x: m.matvec(x, dtot), dtot, m.upper, b,
                p_rgh.i, tol=tols[sel], rel_tol=rels[sel],
                max_iter=c0["maxIter"],
            )
        elif self.gmg is not None:
            # lattice geometric multigrid (solvers/gmg.py): the GAMG-role
            # preconditioner — mesh-independent iterations (14 vs 124
            # diag-CG at 500k), reduction-free Chebyshev V-cycle
            from ..solvers.gmg import gmg_pcg

            res = gmg_pcg(
                self.gmg, dtot, m.lower, m.upper, b, p_rgh.i,
                tol=tols[sel], rel_tol=rels[sel],
            )
        elif self._sgmg is not None:
            # sharded lattice multigrid (parallel/sharded_gmg.py): the
            # GAMG role INSIDE the explicit-SPMD step. The slab partition
            # makes owned slots a [nz_p, ny, nx] sub-lattice; the six DIA
            # coupling planes gather from the local face arrays through
            # the precomputed slab maps (sentinel -> appended zero), and
            # the solve's only cross-shard traffic is the per-matvec
            # z-plane ring + psum dot products.
            from ..parallel.sharded_gmg import sharded_gmg_pcg

            mg, maps = self._sgmg
            nz_p, ny_, nx_ = mg.shapes[0]
            n_own = g.n_own_slots
            zpad = jnp.zeros((1,), dtot.dtype)
            ue = jnp.concatenate([m.upper, zpad])
            le = jnp.concatenate([m.lower, zpad])
            offd = {}
            for a in (0, 1, 2):
                ix = maps[a]
                offd["u%d" % a] = ue[ix].reshape(nz_p, ny_, nx_)
                offd["l%d" % a] = le[ix].reshape(nz_p, ny_, nx_)
            shape3 = (nz_p, ny_, nx_)
            r3 = sharded_gmg_pcg(
                mg, dtot[:n_own].reshape(shape3), offd,
                b[:n_own].reshape(shape3),
                p_rgh.i[:n_own].reshape(shape3),
                tol=tols[sel], rel_tol=rels[sel], max_iter=c0["maxIter"],
            )
            x_ext = g.sync(
                jnp.concatenate([r3.x.reshape(-1), p_rgh.i[n_own:]])
            )
            res = r3._replace(x=x_ext)
        elif self.pairmg is not None:
            # index-pair lane-preserving multigrid (solvers/pairmg.py):
            # the GAMG role on unstructured hybrid-layout meshes —
            # mesh-independent iterations with every level on the
            # roll/shift + banded-rest fast paths
            from ..solvers.pairmg import pairmg_pcg

            res = pairmg_pcg(
                self.pairmg, lambda x: m.matvec(x, dtot), dtot, m.upper,
                b, p_rgh.i, tol=tols[sel], rel_tol=rels[sel],
                max_iter=c0["maxIter"],
            )
        elif self.amg is not None:
            from ..solvers.amg import amg_pcg

            res = amg_pcg(
                self.amg, dtot, m.lower, m.upper, b, p_rgh.i,
                tol=tols[sel], rel_tol=rels[sel],
            )
        elif self._p_rgh_fused():
            # fused whole-solve Pallas CG: past ~50k cells the flat XLA
            # CG's per-iteration dispatch latency dominates (190 us/iter
            # measured at 500k vs ~50 us of HBM traffic); the fused kernel
            # runs the entire solve VMEM-resident in ONE launch. Below the
            # crossover the flat path stays (477 vs 265 M CUPS at 9k).
            from ..solvers import pallas_cg

            res = pallas_cg.dia_pcg(
                dtot, m.upper, m.lower, b, p_rgh.i, g.offsets, g.n_cells,
                tol=tols[sel], rel_tol=rels[sel],
                max_iter=c0["maxIter"],
                interpret=pallas_cg.interpret_mode(),
            )
        else:
            # flat XLA diagonal-CG: measured FASTER than both the AMG
            # V-cycle (399 M CUPS) and the fused Pallas CG (265 M) for
            # p_rgh on small DIA meshes — 477 M CUPS on steckler. The
            # Pallas whole-solve kernels still serve the smoothSolver/
            # PBiCGStab systems via solve_scalar.
            sfn, dfn, mfn = g.solver_reducers()
            res = pcg(
                lambda x: m.matvec(x, dtot), p_rgh.i, b, dtot,
                tol=tols[sel], rel_tol=rels[sel],
                sum_fn=sfn, dot_fn=dfn, mean_fn=mfn,
            )
            res = res._replace(x=g.sync(res.x))
        info = {"res0": res.initial_residual, "iters": res.n_iterations}
        if os.environ.get("FIREFOAM_TPU_DEBUG_U"):
            info["dbg_Uy_hbya"] = HbyA.i[:, 1]

        # boundary update + flux reconstruction
        p_rgh_b = f * rv + (1.0 - f) * (g.cell_to_boundary(res.x) + rg / g.b_dc)
        p_rgh_new = VolField(res.x, p_rgh_b)
        lap_flux = fvm.FvMatrix(
            g, m_lap.diag, m_lap.lower, m_lap.upper, m_lap.source,
            m_lap.internal_coeffs, m_lap.boundary_coeffs, p_rgh_new
        ).flux()
        phi_new = SurfaceField(phi_hbya.i - lap_flux.i, phi_hbya.b - lap_flux.b)

        # velocity correction
        corr_flux = SurfaceField(
            (phig.i - lap_flux.i) / rho_rAU_f.i, (phig.b - lap_flux.b) / rho_rAU_f.b
        )
        U_new_i = HbyA.i + rAU[:, None] * fvc.reconstruct(g, corr_flux)
        # U.correctBoundaryConditions() (pEqn.H:46) re-applies the UEqn-time
        # coefficients — updateCoeffs is once-per-step in OpenFOAM
        U_new = VolField(U_new_i, state["U"].b)
        if ubc_coeffs is not None:
            U_new = bcmod.apply_coeffs(g, U_new, *ubc_coeffs)
        else:
            ctxU = self._ctx(state, (srcs or {}).get("_ov"))
            ctxU["phi"] = phi_new
            U_new = bcmod.evaluate(self.U_bcs, g, U_new, ctxU)
        # carry the re-metered inlet U_b so the stored boundary flux and
        # next step's Courant/YEqn see exactly ṁ (see U_b_eff above)
        if metered:
            ub = U_new.b
            for sl, u_met in metered:
                ub = ub.at[sl].set(u_met)
            U_new = VolField(U_new.i, ub)

        # p = p_rgh + rho·gh + pRef (boundary too; rho = thermo.rho() from
        # the corrector start, pEqn.H:52)
        p_new = VolField(
            p_rgh_new.i + rho.i * self.gh + self.p_ref,
            p_rgh_new.b + rho.b * self.ghf_b + self.p_ref,
        )
        psi_new = state["psi"]

        # rhoEqn.H after the p update: the CARRIED rho is the conservative
        # continuity solution, not thermo.rho() (pEqn.H:55); the next
        # corrector re-aligns via rho = thermo.rho().
        srho = srcs["Srho"] if srcs is not None else 0.0
        rho_cont = state["rho_old_i"] - dt * (fvc.div_flux(g, phi_new) - srho)
        rho_new = VolField(rho_cont, psi_new.b * p_new.b)

        # compressibleContinuityErrs.H: compare against thermo.rho()
        thermo_rho = psi_new.i * p_new.i
        total_mass = g.rsum(rho_cont * g.V)
        info["cont_local"] = g.rsum(jnp.abs(rho_cont - thermo_rho) * g.V) / total_mass
        info["cont_global"] = g.rsum((rho_cont - thermo_rho) * g.V) / total_mass
        return p_rgh_new, p_new, rho_new, phi_new, U_new, info

    # ------------------------------------------------------------------
    def step(self, state: Dict) -> Tuple[Dict, Dict]:
        """One full time step (the jit target)."""
        g = self.geom
        log: Dict[str, jnp.ndarray] = {}
        state = dict(state)
        dt = state["dt"]

        # ---- solid-only cases (additionalControls solvePrimaryRegion
        # false — pyrolysis1D): evolve regions and advance time ----
        if not self.solve_primary:
            if self.pyrolysis is not None:
                state, _ = self._evolve_pyrolysis(state, log)
            state["t"] = state["t"] + dt
            if self.ctl.adjust:
                state["dt"] = self.new_dt(state)
            return state, log

        # the reference prints Courant BEFORE setDeltaT (fireFoam.C:78), i.e.
        # with the PREVIOUS step's dt; our dt was already advanced at the end
        # of the previous step, so rescale for a like-for-like log line
        dt_prev = state.get("_dt_prev", dt)
        log["CoNum"] = self.courant(state) * (dt_prev / dt)
        log["CoMean"] = self.courant_mean(state) * (dt_prev / dt)
        state["_dt_prev"] = dt
        # boundary phi the species equations are about to see — becomes the
        # lagged refValue gate for the NEXT step's species inlet BCs
        phi_b_species = state["phi"].b

        # ---- parcels.evolve() (fireFoam.C:88) ----
        # (named scopes label the phases in jax.profiler traces — the
        # reference's only timers are per-step ExecutionTime prints)
        with jax.named_scope("lagrangian"):
            state, srcs = self._evolve_cloud(state, log)

        # ---- surface film (fireFoam.C:90) ----
        if self.film is not None:
            with jax.named_scope("surfaceFilm"):
                state, srcs = self._evolve_film(state, srcs, log)

        # ---- pyrolysis regions (fireFoam.C:92-95) ----
        ov: Dict = {}
        if self.pyrolysis is not None:
            with jax.named_scope("pyrolysis"):
                state, ov = self._evolve_pyrolysis(state, log, srcs)
        if self.film is not None:
            ov = self._film_bc_overrides(state, ov)
        srcs["_ov"] = ov

        # ---- rhoEqn (diagonal, + parcels.Srho — rhoEqn.H:40) ----
        rho_i = (
            state["rho_old_i"]
            - dt * fvc.div_flux(g, state["phi"])
            + dt * srcs["Srho"]
        )
        state["rho"] = VolField(rho_i, state["rho"].b)

        for outer in range(self.ctl.n_outer):
            # ---- momentum predictor ----
            with jax.named_scope("UEqn"):
                U_new, u_matrix, ubc_coeffs = self._u_eqn(state, log, srcs)
            if os.environ.get("FIREFOAM_TPU_DEBUG_U"):
                log["dbg_Uy_start"] = state["U"].i[:, 1]
                log["dbg_Uy_pred"] = U_new.i[:, 1]
            state["U"] = U_new

            # ---- species + energy (one shared multivariate convection
            # weight field, frozen before the Yi solves — YEEqn.H:1-10) ----
            with jax.named_scope("YEqn"):
                w_mv = self._multivariate_weights(state)
                Y_new, qdot = self._y_eqns(state, log, srcs, w_mv)
            state["Qdot"] = qdot

            # ---- radiation field solve (fvDOM), first step + every
            # solverFreq steps, after combustion updates Qdot (YEEqn.H:80) ----
            if self.radiation is not None:
                with jax.named_scope("radiation"):
                    state["rad"] = self.radiation.maybe_correct(state, self.gas)
            with jax.named_scope("EEqn"):
                hs_new, T_new, psi_new, mu_new, alpha_new = self._e_eqn(
                    state, Y_new, qdot, log, srcs, w_mv
                )
            state["Y"] = Y_new
            state["hs"] = hs_new
            state["T"] = T_new
            state["psi"] = psi_new
            state["mu"] = mu_new
            state["alpha"] = alpha_new
            # Foam::min/max(GeometricField) include the boundary field — the
            # golden log's min/max(T) tracks baffle FACE values early on
            log["T_min"] = jnp.minimum(g.rmin(T_new.i), g.bmin(T_new.b))
            log["T_max"] = jnp.maximum(g.rmax(T_new.i), g.bmax(T_new.b))

            # ---- pressure correctors (single scanned body) ----
            n_corr = self.ctl.n_correctors
            base_state = dict(state)

            def corr_body(carry, corr):
                st2 = dict(base_state)
                (st2["p_rgh"], st2["p"], st2["rho"], st2["phi"], st2["U"]) = carry
                sel = jnp.where(corr == n_corr - 1, 1, 0)
                *fields, info = self._p_eqn(st2, u_matrix, sel, srcs, ubc_coeffs)
                if os.environ.get("FIREFOAM_TPU_DEBUG_U"):
                    info["dbg_Uy_corr"] = fields[4].i[:, 1]
                return tuple(fields), info

            carry0 = (state["p_rgh"], state["p"], state["rho"], state["phi"], state["U"])
            with jax.named_scope("pEqn"):
                carry, infos = jax.lax.scan(
                    corr_body, carry0, jnp.arange(n_corr, dtype=jnp.int32)
                )
            (state["p_rgh"], state["p"], state["rho"], state["phi"], state["U"]) = carry
            for c in range(n_corr):
                log[f"p_rgh_res0_{c}"] = infos["res0"][c]
                log[f"p_rgh_iters_{c}"] = infos["iters"][c]
                log[f"cont_local_{c}"] = infos["cont_local"][c]
                log[f"cont_global_{c}"] = infos["cont_global"][c]
                if "dbg_Uy_corr" in infos:
                    log[f"dbg_Uy_corr_{c}"] = infos["dbg_Uy_corr"][c]
                    log[f"dbg_Uy_hbya_{c}"] = infos["dbg_Uy_hbya"][c]

            state["dpdt"] = (state["p"].i - state["p_old_i"]) / dt

            # ---- turbulence ----
            ctx = self._ctx(state, srcs.get("_ov"))
            ctl_k = _solver_controls(self.fv_solution, "k", "kFinal")
            ctl_k["sched"] = self._ldu
            with jax.named_scope("kEqn"):
                k_new, nut_i, res_k = self.turb.correct(
                    state["k"], self.k_bcs, state["U"], state["rho"],
                    state["rho_old_i"], state["phi"], state["mu"], dt, ctx, ctl_k,
                )
            state["k"] = k_new
            nut_b = self.turb.nut_b(k_new.b)
            state["nut"] = VolField(nut_i, nut_b)
            # alphat = rho·nut/Prt (+ wall functions on baffles)
            state["alphat"] = VolField(
                state["rho"].i * nut_i / self.turb.Prt,
                state["rho"].b * nut_b / self.turb.Prt,
            )
            state = self._apply_wall_functions(state)
            # nut wall functions (nutk/nutUSpalding[Blowing]/nutFire) follow
            # the alphat pass — nutFire consumes the fire-corrected alphat
            nut_b = self._nut_wall_functions(state, k_new, nut_b)
            state["nut"] = VolField(nut_i, nut_b)
            alphat_b = state["alphat"].b
            for bc, p in zip(self.alphat_bcs.bcs, g.patches):
                if bc.kind == "compressible::alphatWallFunction":
                    alphat_b = alphat_b.at[p.slice].set(
                        state["rho"].b[p.slice] * nut_b[p.slice] / self.turb.Prt
                    )
            state["alphat"] = VolField(state["alphat"].i, alphat_b)
            log["k_res0"] = res_k.initial_residual
            log["k_iters"] = res_k.n_iterations

        # ---- advance time, choose next dt ----
        state["rhoU_old_i"] = state["rho"].i[:, None] * state["U"].i
        state["rho_old_i"] = state["rho"].i
        state["p_old_i"] = state["p"].i
        state["psi_old_i"] = state["psi"].i
        state["p_rgh_old_i"] = state["p_rgh"].i
        state["phi_old_i"] = state["phi"].i
        state["K_old_i"] = 0.5 * jnp.sum(state["U"].i * state["U"].i, axis=1)
        state["_phi_b_prev"] = phi_b_species
        # rti link probes (solver/rti.H — before time advance, current fields)
        if "rtis" in state and self.rtis is not None:
            state["rtis"] = self.rtis.advance(state["rtis"], state)
        if "rti_links" in state:
            state["rti_links"] = self.rti_links.advance(
                state["rti_links"], state["T"].i, state["U"].i, state["t"], dt
            )
        state["t"] = state["t"] + dt
        if self.ctl.adjust:
            state["dt"] = self.new_dt(state)
        log["Qdot_total"] = g.rsum(state["Qdot"] * g.V)
        log["Qdot_max"] = g.rmax(state["Qdot"])
        for pch in g.patches:
            if pch.name == "burner":
                log["burner_influx"] = -g.bsum(state["phi"].b, pch.slice)
                log["burner_rho_b"] = g.bmean(state["rho"].b, pch.slice)
                log["burner_Yfuel_b"] = jnp.mean(
                    state["Y"].b[pch.slice, self.reaction.fuel_index]
                ) if self.reaction is not None else jnp.asarray(0.0)
        log["HRR"] = log["Qdot_total"] / 1e3  # kW
        log["k_max"] = g.rmax(state["k"].i)
        log["T_max_int"] = g.rmax(state["T"].i)
        log["T_max_b"] = g.bmax(state["T"].b)
        log["U_max"] = g.rmax(jnp.linalg.norm(state["U"].i, axis=1))
        # flame heights from mixture fraction (infoOutput.H:34-57) — the
        # reference appends these to outFlameHeight every step
        if self.reaction is not None and float(np.linalg.norm(self.g_vec)) > 0:
            from ..functionobjects.infofields import flame_heights

            log.update(flame_heights(self, state))
        # golden-log diffables: species min/gAverage/max (YEEqn.H:72-77),
        # the dt used this step and the post-increment time
        # one batched reduction per statistic instead of 3·nSpecies
        # slice+reduce kernels (dynamic-slice_reduce fusions measured in
        # the 500k profile)
        y_min = g.rminc(state["Y"].i)
        y_ave = g.rmeanc(state["Y"].i)
        y_max = g.rmaxc(state["Y"].i)
        for s, sp in enumerate(self.species):
            log[f"Y_{sp}_min"] = y_min[s]
            log[f"Y_{sp}_ave"] = y_ave[s]
            log[f"Y_{sp}_max"] = y_max[s]
        log["t"] = state["t"]
        log["dt"] = dt
        log.update(self.function_objects.compute(state))
        return state, log

    # ------------------------------------------------------------------
    def _lap_corr(self, psi) -> Optional[jnp.ndarray]:
        """Deferred non-orthogonal laplacian correction per the fvSchemes
        laplacianSchemes default (None under 'uncorrected' — the shipped
        cases' orthogonal block meshes need none)."""
        if self.lap_limiter is None:
            return None
        lim = None if self.lap_limiter >= 1.0 else self.lap_limiter
        return fvc.non_orth_correction(self.geom, psi, limiter=lim)

    # ------------------------------------------------------------------
    def make_step(self):
        return jax.jit(self.step)

    def make_step_hoisted(self, example_state):
        """jitted step with every closure constant hoisted to an argument.

        Plain jit embeds the geometry/BC/thermo arrays as HLO literals —
        at 500k cells that is ~900 MB of MLIR text (e.g. a single
        tensor<1500000x3xf64> literal is 72 MB), which overflows
        remote-compile transports and bloats compile time. Tracing the
        step to a jaxpr exposes those arrays as `consts`; evaluating the
        jaxpr with the consts passed as jit ARGUMENTS makes them ordinary
        device-resident parameters instead. (jax.closure_convert is not
        usable here: it hoists only differentiable float consts.)"""
        closed = jax.make_jaxpr(lambda st: self.step(st))(example_state)
        out_tree = jax.tree.structure(
            jax.eval_shape(lambda st: self.step(st), example_state)
        )
        # Device-resident consts on the DEFAULT-backend device, explicitly:
        # solver setup runs under a CPU-staging context, so many consts are
        # CPU-committed jax arrays — jnp.asarray keeps that commitment, and
        # mixed-device jit args drag execution through the CPU PJRT client
        # with a ~120 ms D2H dispatch per affected buffer per step
        # (measured: 2.4 s/step of CPU-client time vs 122 ms of real TPU
        # work at 500k cells). device_put pins everything together.
        dev = jax.devices()[0]
        consts = [jax.device_put(c, dev) for c in closed.consts]
        jaxpr = closed.jaxpr

        @jax.jit
        def run(consts, flat_args):
            return jax.core.eval_jaxpr(jaxpr, consts, *flat_args)

        def step(st):
            flat, _ = jax.tree.flatten(st)
            return jax.tree.unflatten(out_tree, run(consts, flat))

        return step

    def make_chunk(self, n: int):
        """n full time steps fused into ONE jitted lax.scan call.

        The whole step — including adjustable-Δt control — is in-graph, so
        chaining steps needs no host round trip. This is the TPU-deployment
        hot loop: per-call dispatch (pytree flatten + transfer of ~hundreds
        of leaves) costs O(100 µs) on a tunneled device, comparable to the
        9k-cell step itself. Returns (final_state, stacked_logs[n])."""

        def chunk(state):
            def body(st, _):
                st2, log = self.step(st)
                return st2, log

            return jax.lax.scan(body, state, xs=None, length=n)

        return jax.jit(chunk)

    def make_chunk_hoisted(self, n: int, example_state):
        """make_chunk with closure constants hoisted to jit arguments —
        see make_step_hoisted; required for >100k-cell meshes on
        remote-compile transports."""

        def chunk(state):
            def body(st, _):
                return self.step(st)

            return jax.lax.scan(body, state, xs=None, length=n)

        closed = jax.make_jaxpr(chunk)(example_state)
        out_tree = jax.tree.structure(jax.eval_shape(chunk, example_state))
        # device_put, NOT jnp.asarray: setup runs under CPU staging, so the
        # consts are CPU-committed — asarray keeps that commitment and every
        # chunk call pays a CPU-client dispatch per buffer (measured 315 ms
        # vs 136 ms per step at 500k cells). Same fix as make_step_hoisted.
        dev = jax.devices()[0]
        consts = [jax.device_put(c, dev) for c in closed.consts]
        jaxpr = closed.jaxpr

        @jax.jit
        def run(consts, flat_args):
            return jax.core.eval_jaxpr(jaxpr, consts, *flat_args)

        def fn(st):
            flat, _ = jax.tree.flatten(st)
            return jax.tree.unflatten(out_tree, run(consts, flat))

        return fn
