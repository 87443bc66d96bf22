"""Reacting spray cloud — fixed-capacity SoA parcels, fully jit-compiled.

TPU-native re-design of the reference cloud stack (KinematicCloud →
ThermoCloud → ReactingCloud, packages/lagrangian/intermediateNew/clouds/
Templates/*): instead of linked parcel lists with per-parcel virtual calls,
the cloud is one struct-of-arrays pytree with a static capacity and an alive
mask. One `evolve(state, gas, dt)` performs (mirroring
KinematicCloud::solve/evolveCloud, KinematicCloud.C:91-245):

  1. injection (bounded candidate batches scattered into free slots),
  2. NSUB substeps of { ballistic move + containment walk + physics calc },
  3. source accumulation into per-cell arrays (rhoTrans/UTrans/UCoeff/
     hsTrans/hsCoeff — KinematicCloud.H:467-515, ThermoCloud.H:362-388,
     ReactingCloud.H:245-260) via segment-sums.

Physics per substep (= the reference parcel calc chain,
ReactingParcel.C:389-607 / ThermoParcel.C:137-255 / KinematicParcel.C:96-226):
  - sphere drag (Schiller-Naumann CdRe) + gravity/buoyancy, Euler
    (drag-implicit) velocity integration,
  - Ranz-Marshall heat transfer (+ Bird evaporative-shielding correction),
    analytic temperature integration,
  - liquid evaporation/boiling (LiquidEvaporationBoil behaviour): Spalding
    mass transfer below boiling, heat-balance-limited rate at the boiling
    point; evaporated mass enters the carrier H2O species.

Wall interaction is applied inside the walk (tracking.py). Film handoff
(absorb) records mass/enthalpy per boundary face for the surface-film region
model.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import INT_DTYPE, real_dtype, small
from ..io.foamdict import FoamDict
from .injection import make_injector
from .liquids import liquid_by_name
from .tracking import (
    INTERACT_ESCAPE,
    INTERACT_FILM,
    INTERACT_NONE,
    INTERACT_REBOUND,
    INTERACT_STICK,
    WalkMesh,
)

__all__ = ["ReactingCloud"]

_PI = math.pi


def _sphere_mass(rho_l, d):
    return rho_l * _PI / 6.0 * d**3


@dataclass
class CloudConfig:
    active: bool
    coupled: bool
    capacity: int
    n_sub: int
    walk_steps: int
    # constantProperties
    rho0: float
    T0: float
    cp0: float
    T_min: float
    Tvap: float
    Tbp: float
    Pr: float
    eps0: float  # epsilon0 (radiative emissivity)
    f0: float  # scattering factor
    min_mass: float
    # submodel switches
    drag: bool
    gravity_on: bool
    heat_transfer: bool
    bird_correction: bool
    phase_change: bool
    # source relaxation (sourceTerms schemes <field> explicit <coeff>)
    relax_rho: float
    relax_U: float
    relax_Yi: float
    relax_h: float
    # radiation (ThermoCloud.C:59-130: radiation switch + constRad/diaBanded
    # particle radiative properties, coupledRadiation parcel heating)
    radiation: bool = False
    coupled_radiation: bool = True
    n_bands: int = 1
    # integrationSchemes (reference solution.integrationSchemes: per-
    # quantity Euler | analytical — IntegrationScheme/Euler.H, Analytical.H)
    scheme_U: str = "Euler"
    scheme_T: str = "analytical"


class ReactingCloud:
    """Host-side cloud model built from constant/<name>Properties."""

    def __init__(
        self,
        name: str,
        props: FoamDict,
        walk: WalkMesh,
        geom,
        case,
        gas,
        g_vec,
        dt_max: float,
        dtype=None,
        capacity: Optional[int] = None,
        cell_zones=None,
        part=None,
        inj_walk: Optional[WalkMesh] = None,
    ):
        self.name = name
        self.dtype = dtype or real_dtype()
        self.walk = walk
        # SPMD partition identity (parallel.localize.PartInfo): when set,
        # `walk` is the partition-local WalkMesh, injector setup uses the
        # GLOBAL walk (inj_walk) so injector cell tables are global ids
        # remapped at injection time, and evolve() migrates parcels that
        # walked into halo slots (the reference's switchProcessor handoff,
        # KinematicParcel.C:330-333)
        self.part = part
        self.geom = geom
        self.gas = gas
        self.g = jnp.asarray(np.asarray(g_vec, float), self.dtype)

        sol = props.get_dict("solution")
        cp = props.get_dict("constantProperties")
        sub = props.get_dict("subModels")

        schemes = sol.get_dict("sourceTerms", FoamDict()).get_dict("schemes", FoamDict())

        def relax(key):
            v = schemes.lookup(key, None)
            if isinstance(v, list) and len(v) >= 2:
                return float(v[-1])
            return 1.0

        forces = sub.get_dict("particleForces", FoamDict())
        from .forces import ParticleForces

        self.forces = ParticleForces.from_dict(forces)
        htm = sub.get_word("heatTransferModel", "none")
        pcm = sub.get_word("phaseChangeModel", "none")
        ht_coeffs = sub.get_dict("RanzMarshallCoeffs", None) or sub.get_dict(
            "ranzMarshallCoeffs", FoamDict()
        )

        # composition: singlePhaseMixture (one liquid) or the
        # SingleMixtureFraction liquid phase (several liquids with fixed
        # mass fractions — submodels/Reacting/CompositionModel)
        comp = sub.get_dict("singlePhaseMixtureCoeffs", None)
        if comp is None:
            comp = sub.get_dict("singleMixtureFractionCoeffs", FoamDict())
        from .devolatilisation import (
            Devolatilisation,
            PhaseLedger,
            parse_phases,
        )

        ph_map = parse_phases(comp)
        liq_entries = list(ph_map.get("liquid", []))  # (name, fraction)
        if not liq_entries:
            liq_entries = [("H2O", 1.0)]
        if len(liq_entries) == 1:
            self.liquid = liquid_by_name(liq_entries[0][0])
        else:
            from .liquids import LiquidMixture

            self.liquid = LiquidMixture(
                [n for n, _ in liq_entries], [f for _, f in liq_entries]
            )
        # vapour destination species + fixed split of evaporated mass
        # (Raoult-weighted at T0; per-species YEqn sources use this split)
        self.vapour_names = [n for n, _ in liq_entries if n in gas.species]
        self.vapour_indices = tuple(gas.index(n) for n in self.vapour_names)
        if hasattr(self.liquid, "vapour_split") and len(self.vapour_indices) > 1:
            import numpy as _np

            split = _np.asarray(
                self.liquid.vapour_split(jnp.asarray(float(cp.get_scalar("T0", 300.0))))
            ).reshape(-1)
            self.vapour_fracs = tuple(float(x) for x in split)
        else:
            self.vapour_fracs = (1.0,) * len(self.vapour_indices)
        self.vapour_index = self.vapour_indices[0] if self.vapour_indices else gas.index("H2O")
        # per-parcel multi-component liquid evaporation (ReactingParcel's
        # per-parcel Y over the liquid phase + LiquidEvaporation's
        # per-component vapour pressures, ReactingParcel.C:389-607): active
        # when the mixture has >1 component and each maps to a carrier
        # species; parcels then carry a "Yl" lane and components deplete
        # at their own Raoult rates
        self.n_liq = len(getattr(self.liquid, "components", (None,)))
        self.multi_liq = (
            self.n_liq > 1 and len(self.vapour_indices) == self.n_liq
        )

        # ---- n-phase ledger + devolatilisation (ReactingMultiphase) ----
        # (reference phaseProperties gas/liquid/solid bookkeeping +
        # DevolatilisationModel submodels; surfaceReactionModel ships only
        # NoSurfaceReaction in the reference, so 'none' is the full surface)
        self.ledger = PhaseLedger.from_phases(ph_map)
        self.devol = Devolatilisation.from_dict(sub, cp, gas)
        self.surface_reaction = sub.get_word("surfaceReactionModel", "none")
        self._liq_frac0 = (
            float(self.ledger.liquid_frac) if self.ledger is not None else 1.0
        )
        if self.devol is not None:
            led = self.ledger
            fr = []
            for n in self.devol.names:
                f = 0.0
                if led is not None:
                    for nm, ff in zip(led.gas_names, led.gas_fracs):
                        if nm == n:
                            f = float(ff)
                fr.append(f)
            # volatile fractions of TOTAL particle mass, volatileData order
            self._vol_frac0 = np.asarray(fr)

        self.cfg = CloudConfig(
            active=sol.get_bool("active", True),
            coupled=sol.get_bool("coupled", True),
            capacity=0,
            n_sub=4,
            walk_steps=5,
            rho0=cp.get_scalar("rho0", 1000.0),
            T0=cp.get_scalar("T0", 300.0),
            cp0=cp.get_scalar("Cp0", 4187.0),
            T_min=cp.get_scalar("TMin", 200.0),
            Tvap=cp.get_scalar("Tvap", 273.0),
            Tbp=cp.get_scalar("Tbp", 373.0),
            Pr=cp.get_scalar("Pr", 0.7),
            eps0=cp.get_scalar("epsilon0", 1.0),
            f0=cp.get_scalar("f0", 0.5),
            min_mass=cp.get_scalar("minParticleMass", 1e-15),
            drag=self.forces.drag_model is not None,
            gravity_on="gravity" in forces or forces.found("gravity"),
            heat_transfer=htm != "none",
            bird_correction=ht_coeffs.get_bool("BirdCorrection", False),
            phase_change=pcm != "none",
            relax_rho=relax("rho"),
            relax_U=relax("U"),
            relax_Yi=relax("Yi"),
            relax_h=relax("h"),
            radiation=sub.get_bool("radiation", False),
            coupled_radiation=sub.get_bool("coupledRadiation", True),
            n_bands=sub.get_int("nBands", 1),
            scheme_U=sol.get_dict("integrationSchemes", FoamDict()).get_word(
                "U", "Euler"
            ),
            scheme_T=sol.get_dict("integrationSchemes", FoamDict()).get_word(
                "T", "analytical"
            ),
        )

        # particle radiative properties (ThermoCloud.C:70-107): constRad =
        # diameter-independent efficiencies; diaBanded = per-diameter tables
        # of absorption/scattering efficiency + asymmetry factor per band
        self.rad_prop = sub.get_word("radiationProperty", "constRad")
        rpc = sub.get_dict(self.rad_prop + "Coeffs", FoamDict())
        nb = self.cfg.n_bands
        if self.cfg.radiation and self.rad_prop == "diaBanded":
            dia = [float(x) for x in rpc.get_list("diaList")]
            qabs = _nested(rpc.lookup("absEfficiency", []), nb)
            qsct = _nested(rpc.lookup("sctEfficiency", []), nb)
            asyf = _nested(rpc.lookup("asymmetryFactor", []), nb)
            self.rad_dia = np.asarray(dia)
            self.rad_qabs = np.asarray(qabs)  # [nDia, nBands]
            self.rad_qsct = np.asarray(qsct)
            self.rad_asy = np.asarray(asyf)
        else:
            self.rad_dia = None
            self.rad_qabs = np.full((1, nb), rpc.get_scalar("absEfficiency", 0.5))
            self.rad_qsct = np.full((1, nb), rpc.get_scalar("sctEfficiency", 0.5))
            self.rad_asy = np.zeros((1, nb))

        # injectors
        inj_dict = sub.get_dict("injectionModels", FoamDict())
        self.injectors = []
        for iname, idict in inj_dict.subdicts():
            self.injectors.append(
                make_injector(
                    iname, idict, inj_walk or walk, case, self.dtype,
                    geom=geom, cell_zones=cell_zones,
                )
            )
        for inj in self.injectors:
            inj.max_per_step = inj.capacity_for_dt(dt_max)

        # Courant-derived track substeps (KinematicParcel.C:295 maxCo —
        # VERDICT 'weak #12'): the jit graph needs STATIC counts, so the
        # worst case is sized host-side from the fastest injector and the
        # smallest cell: a parcel must not cross more than ~maxCo cells per
        # physics substep, and the containment walk needs enough hops to
        # resolve every face crossing of one ballistic move.
        max_co = sol.get_scalar("maxCo", 0.3)
        u_est = 0.0
        for inj in self.injectors:
            for attr in ("umag", "u_max", "U_max", "umax"):
                v = getattr(inj, attr, None)
                if v is not None:
                    try:
                        u_est = max(u_est, float(v))
                    except (TypeError, ValueError):
                        pass
        if u_est <= 0.0:
            u_est = 20.0  # sprinkler-class default when tables hide U
        dx_min = float(np.asarray(geom.V).min()) ** (1.0 / 3.0)
        n_sub = int(np.clip(math.ceil(u_est * dt_max / (max_co * dx_min) / 8.0), 4, 64))
        walk_steps = int(np.clip(math.ceil(u_est * (dt_max / n_sub) / dx_min) + 3, 5, 24))
        self.cfg.n_sub = n_sub
        self.cfg.walk_steps = walk_steps

        # stochastic collision: SuppressionCollision gates combustion of
        # this cloud's parcels by another cloud's spray coverage
        scm = sub.get_word("stochasticCollisionModel", "none")
        if scm == "SuppressionCollision":
            from .suppression import SuppressionCollision

            self.suppression = SuppressionCollision.from_dict(sub)
        else:
            self.suppression = None

        # deterministic DEM collisions (CollisionModel/PairCollision):
        # spring-slider-dashpot pair + wall forces, parcel omega/records
        # state under st["pc"] (single-partition — no shipped case uses it)
        from .paircollision import PairCollision

        self.pair_collision = PairCollision.from_dict(sub, cp, geom)

        # cloud function objects: ParticleCollectorFmg (lib/
        # additionalCloudFunctionObjects — SURVEY §2.10)
        from .collector import make_collectors
        from .cloudfunctions import make_cloud_functions
        from .mppic import MPPIC

        self.collectors = make_collectors(props)
        self.cloud_functions = make_cloud_functions(props, geom)
        # MPPIC dense-phase corrections (packing/damping/isotropy); None
        # unless the cloud dict selects at least one model
        self.mppic = MPPIC.from_dict(sub, self.cfg.rho0)

        # patch interaction (submodels/Kinematic/PatchInteractionModel):
        # the whole family compiles down to per-boundary-face interaction
        # codes + restitution, consumed by the tracking walk.
        #   standardWallInteraction: one type (+e) for every wall patch
        #     (StandardWallInteraction.C:94-150)
        #   localInteraction: per-patch {type, e} entries by patch name
        #     (LocalInteraction.C patchData lookup)
        #   multiInteraction: ordered sub-models, first defined wins per
        #     patch (MultiInteraction.H:33-60 'oneInteractionOnly true')
        #   rebound: every patch rebounds with elasticity e (Rebound.C)
        #   none/noInteraction: parcel halts at the patch — mapped to stick
        b_code, b_e = self._parse_patch_interaction(sub, geom)
        self.film_patches: List[str] = []
        sfm = sub.get_word("surfaceFilmModel", "none")
        self.has_film_handoff = sfm != "none"
        # Bai-Gosman splash parameters (thermoSurfaceFilmCoeffs — reference
        # ThermoSurfaceFilmMeredith.C / steckler reactingCloud1Properties)
        tsf = sub.get_dict("thermoSurfaceFilmCoeffs", FoamDict())
        self.splash_on = tsf.get_word("interactionType", "absorb").startswith("splash")
        self.splash_delta_wet = tsf.get_scalar("deltaWet", 2e-4)
        self.splash_Adry = tsf.get_scalar("Adry", 2630.0)
        self.splash_Awet = tsf.get_scalar("Awet", 1320.0)
        self.b_code = jnp.asarray(b_code, INT_DTYPE)
        self.b_e = jnp.asarray(b_e, self.dtype)  # rebound elasticity

        # capacity: generous default = what all injectors can make in ~2000 steps
        if capacity is None:
            per_step = sum(i.max_per_step for i in self.injectors) or 1
            capacity = int(min(max(4096, per_step * 2048), 262144))
        self.cfg.capacity = capacity

    # ------------------------------------------------------------------
    @staticmethod
    def _parse_patch_interaction(sub, geom):
        """PatchInteractionModel family → (b_code[int64], b_e[float]) per
        boundary face. See the docstring at the call site."""
        code_of = {
            "escape": INTERACT_ESCAPE,
            "stick": INTERACT_STICK,
            "rebound": INTERACT_REBOUND,
            "none": INTERACT_STICK,
        }
        b_code = np.zeros(geom.n_boundary, np.int64)
        b_e = np.ones(geom.n_boundary, float)

        def default_codes():
            for p in geom.patches:
                if p.ptype in ("wall",):
                    b_code[p.slice] = INTERACT_REBOUND
                elif p.ptype in ("patch", "inlet", "outlet"):
                    b_code[p.slice] = INTERACT_ESCAPE
                else:
                    b_code[p.slice] = INTERACT_REBOUND

        def apply_model(pim, coeffs):
            if pim == "standardWallInteraction":
                it = coeffs.get_word("type", "rebound")
                e = coeffs.get_scalar("e", 1.0)
                for p in geom.patches:
                    if p.ptype in ("wall",):
                        b_code[p.slice] = code_of.get(it, INTERACT_REBOUND)
                        b_e[p.slice] = e
            elif pim in ("localInteraction", "LocalInteraction"):
                pd = coeffs.get_dict("patches", FoamDict())
                for pname, entry in pd.subdicts():
                    it = entry.get_word("type", "rebound")
                    e = entry.get_scalar("e", 1.0)
                    import re as _re

                    for p in geom.patches:
                        if p.name == pname or _re.fullmatch(pname, p.name):
                            b_code[p.slice] = code_of.get(it, INTERACT_REBOUND)
                            b_e[p.slice] = e
            elif pim in ("rebound", "Rebound"):
                e = coeffs.get_scalar("e", 1.0)
                b_code[:] = INTERACT_REBOUND
                b_e[:] = e
            elif pim in ("none", "noInteraction", "NoInteraction"):
                b_code[:] = INTERACT_STICK

        default_codes()
        pim = sub.get_word("patchInteractionModel", "standardWallInteraction")
        if pim in ("multiInteraction", "MultiInteraction"):
            mc = sub.get_dict("multiInteractionCoeffs", FoamDict())
            # first-listed model wins per patch ('oneInteractionOnly true'):
            # apply in reverse so earlier entries overwrite later ones
            for mname, entry in reversed(list(mc.subdicts())):
                inner = entry.get_word("patchInteractionModel", mname)
                apply_model(
                    inner,
                    entry.get_dict(inner + "Coeffs", entry),
                )
        else:
            apply_model(pim, sub.get_dict(pim + "Coeffs", FoamDict()))
        return b_code, b_e

    # ------------------------------------------------------------------
    def set_film_patches(self, names: List[str]):
        """Mark film-covered patches: parcels hitting them are absorbed."""
        b_code = np.array(self.b_code)  # writable copy
        for n in names:
            b_code[self.geom.patch(n).slice] = INTERACT_FILM
        self.b_code = jnp.asarray(b_code, INT_DTYPE)
        self.film_patches = list(names)

    # ------------------------------------------------------------------
    def initial_state(self, seed: int = 7) -> Dict:
        cap = self.cfg.capacity
        dtp = self.dtype
        st = {
            "x": jnp.zeros((cap, 3), dtp),
            "U": jnp.zeros((cap, 3), dtp),
            "d": jnp.full((cap,), 1e-4, dtp),
            "T": jnp.full((cap,), self.cfg.T0, dtp),
            # per-parcel heat capacity (ThermoParcel::Cp_): seeded from
            # constantProperties Cp0 or the lookup-table cp column
            # (thermoParcelInjectionData.H:78, setParcelProperties);
            # consumed on the constant-property heat paths — with the
            # liquid law active cp follows cp(T) like the reference's
            # composition-model update (ReactingParcel.C calc)
            "cp0": jnp.full((cap,), self.cfg.cp0, dtp),
            "nP": jnp.zeros((cap,), dtp),  # particles per parcel
            "cell": jnp.zeros((cap,), INT_DTYPE),
            "alive": jnp.zeros((cap,), bool),
            "age": jnp.zeros((cap,), dtp),
            # reacting-multiphase combustion gate (−1 = suppressed) and
            # parcel type id — consumed by SuppressionCollision
            "canCombust": jnp.ones((cap,), jnp.int32),
            "typeId": jnp.zeros((cap,), jnp.int32),
            "rng": jax.random.PRNGKey(seed),
            # n-phase ledger lanes (per-PARTICLE volatile / solid masses)
            **(
                {
                    "mv": jnp.zeros((cap, self.devol.n_vol), dtp),
                    "mv0": jnp.zeros((cap, self.devol.n_vol), dtp),
                }
                if self.devol is not None
                else {}
            ),
            **(
                {"ms": jnp.zeros((cap,), dtp)}
                if self.ledger is not None
                else {}
            ),
            # per-parcel liquid composition lanes (ReactingParcel Y_ over
            # the liquid phase — components deplete independently)
            **(
                {
                    "Yl": jnp.tile(
                        jnp.asarray(self.liquid.Y, dtp)[None, :], (cap, 1)
                    )
                }
                if self.multi_liq
                else {}
            ),
            "inj": [inj.init_state() for inj in self.injectors],
            "coll": [c.init_state(dtp) for c in self.collectors],
            "cfo": [
                f.init_state(
                    self.cfg.capacity,
                    self.geom.n_boundary
                    if hasattr(f, "post_patch")
                    else self.geom.n_cells,
                    dtp,
                )
                for f in self.cloud_functions
            ],
        }
        if self.pair_collision is not None:
            st["pc"] = self.pair_collision.init_state(cap, dtp)
        return st

    # ------------------------------------------------------------------
    def _mass(self, st) -> jnp.ndarray:
        rho_l = (
            self.liquid.rho_Y(101325.0, st["T"], st["Yl"])
            if self.multi_liq
            else self.liquid.rho(101325.0, st["T"])
        )
        return jnp.where(st["alive"], st["nP"] * _sphere_mass(rho_l, st["d"]), 0.0)

    # ------------------------------------------------------------------
    def _inject(self, st: Dict, t, dt, gas) -> Dict:
        if not self.injectors:
            return st
        st = dict(st)
        key, *keys = jax.random.split(st["rng"], len(self.injectors) + 1)
        st["rng"] = key
        inj_states = []
        for inj, istate, k in zip(self.injectors, st["inj"], keys):
            istate, cand = inj.inject(istate, k, t, dt, gas)
            inj_states.append(istate)
            st = self._scatter_new(st, cand)
        st["inj"] = inj_states
        return st

    def _scatter_new(self, st: Dict, cand: Dict) -> Dict:
        """Place candidate parcels into free slots (drop on overflow)."""
        cap = self.cfg.capacity
        if self.part is not None:
            # injector cell ids are GLOBAL (every partition runs the same
            # injection with the same replicated RNG); keep only the
            # parcels whose cell this partition owns
            cand = dict(cand)
            loc = self.part.cell_map[cand["cell"]]
            cand["valid"] = cand["valid"] & (loc >= 0)
            cand["cell"] = jnp.maximum(loc, 0)
        m = cand["valid"].shape[0]
        # free slots first: argsort(alive) puts False (free) lanes first
        free = jnp.argsort(st["alive"].astype(jnp.int32), stable=True)[:m]
        slot_free = ~st["alive"][free]
        ok = cand["valid"] & slot_free
        tgt = free

        # per-parcel injection temperature: the thermo/reacting
        # LookupTableInjection variants supply T per table row
        # (thermoParcelInjectionData.H:75, set in setParcelProperties);
        # every other injector seeds the cloud's T0
        T_new = cand.get("T", jnp.full((m,), self.cfg.T0, self.dtype))
        yl = None
        if self.multi_liq:
            # per-parcel liquid split (reactingMultiphaseParcelInjectionData
            # YLiquid_); other injectors seed the frozen mixture composition
            yl = cand.get("YLiquid")
            if yl is None:
                yl = jnp.tile(
                    jnp.asarray(self.liquid.Y, self.dtype)[None, :], (m, 1)
                )
            else:
                K = self.n_liq
                if yl.shape[1] < K:
                    yl = jnp.concatenate(
                        [yl, jnp.zeros((m, K - yl.shape[1]), self.dtype)], 1
                    )
                yl = yl[:, :K]
                yl = yl / jnp.maximum(jnp.sum(yl, 1, keepdims=True), small())
            rho_l = self.liquid.rho_Y(101325.0, T_new, yl)
        else:
            rho_l = self.liquid.rho(101325.0, T_new)
        nP = cand["mass"] / jnp.maximum(_sphere_mass(rho_l, cand["d"]), small())

        def put(a, v):
            return a.at[tgt].set(jnp.where(_bmask(ok, v), v, a[tgt]))

        st = dict(st)
        st["x"] = put(st["x"], cand["x"])
        st["U"] = put(st["U"], cand["U"])
        st["d"] = put(st["d"], cand["d"])
        st["T"] = put(st["T"], T_new)
        # per-parcel cp from the thermo/reacting lookup tables
        # (thermoParcelInjectionData cp column); cloud Cp0 otherwise
        st["cp0"] = put(
            st["cp0"],
            cand.get("cp", jnp.full((m,), self.cfg.cp0, self.dtype)),
        )
        if yl is not None:
            st["Yl"] = put(st["Yl"], yl)
        st["nP"] = put(st["nP"], nP)
        st["cell"] = st["cell"].at[tgt].set(jnp.where(ok, cand["cell"], st["cell"][tgt]))
        st["alive"] = st["alive"].at[tgt].set(ok | st["alive"][tgt])
        st["age"] = put(st["age"], jnp.zeros((m,), self.dtype))
        st["canCombust"] = st["canCombust"].at[tgt].set(
            jnp.where(ok, 1, st["canCombust"][tgt])
        )
        st["typeId"] = st["typeId"].at[tgt].set(
            jnp.where(ok, 0, st["typeId"][tgt])
        )
        # n-phase ledger: split the seeded particle mass by the composition
        # phases' Y0 (the liquid core carries fraction _liq_frac0; volatile
        # and solid content ride on top, constantVolume bookkeeping)
        if self.devol is not None or self.ledger is not None:
            m1l = _sphere_mass(rho_l, cand["d"])
            lf = max(self._liq_frac0, 1e-12)
            # per-parcel phase split: the reacting LookupTableInjection
            # variants supply Yphase (phase-mixture fractions in the
            # composition's gas/liquid/solid order,
            # reactingParcelInjectionData.H Y_) and optionally YGas
            # (within-gas-phase split). The ledger lanes carry volatile
            # and solid mass RELATIVE to the liquid sphere mass m1l.
            yph = cand.get("Yphase")
            if yph is not None and self.ledger is not None:
                ng = len(self.ledger.gas_names)
                # phase column order mirrors the composition dict: gas
                # (when declared), liquid, solid
                col_gas = 0 if ng else None
                col_liq = 1 if ng else 0
                col_sol = col_liq + 1
                W = yph.shape[1]
                ygas = yph[:, col_gas] if (ng and W > col_gas) else jnp.zeros(m, self.dtype)
                yliq = yph[:, col_liq] if W > col_liq else jnp.ones(m, self.dtype)
                ysol = yph[:, col_sol] if W > col_sol else jnp.zeros(m, self.dtype)
                yliq = jnp.maximum(yliq, 1e-12)
                if self.devol is not None:
                    within = cand.get("YGas")
                    if within is None:
                        gf = np.asarray(self.ledger.gas_fracs, float)
                        within = jnp.asarray(
                            gf / max(gf.sum(), 1e-300), self.dtype
                        )[None, :]
                    mv_new = (
                        m1l[:, None] * (ygas / yliq)[:, None]
                        * within[:, : self.devol.n_vol]
                    )
                    st["mv"] = put(st["mv"], mv_new)
                    st["mv0"] = put(st["mv0"], mv_new)
                st["ms"] = put(st["ms"], m1l * ysol / yliq)
            else:
                if self.devol is not None:
                    mv_new = m1l[:, None] * jnp.asarray(
                        self._vol_frac0 / lf, self.dtype
                    )[None, :]
                    st["mv"] = put(st["mv"], mv_new)
                    st["mv0"] = put(st["mv0"], mv_new)
                if self.ledger is not None:
                    st["ms"] = put(
                        st["ms"], m1l * (self.ledger.solid_frac / lf)
                    )
        # relocalise injected parcels from their seed cell (sprinkler offset)
        x, U, cell, alive, hit, code = self.walk.walk(
            st["x"], st["U"], st["cell"], st["alive"], self.b_code, self.b_e,
            n_steps=max(self.cfg.walk_steps, 8),
        )
        st.update(x=x, U=U, cell=cell, alive=alive)
        return st

    # ------------------------------------------------------------------
    def _calc(self, st: Dict, gas: Dict, dt_sub, src: Dict) -> Tuple[Dict, Dict]:
        """One physics substep on all alive parcels + source accumulation."""
        cfg = self.cfg
        alive = st["alive"]
        c = st["cell"]
        mask = alive

        # carrier values at the parcel cell (interpolationSchemes 'cell')
        rho_c = gas["rho"][c]
        U_c = gas["U"][c]
        T_c = gas["T"][c]
        p_c = gas["p"][c]
        mu_c = gas["mu"][c]
        kappa_c = gas["kappa"][c]
        cp_c = gas["cp"][c]

        T_p = jnp.maximum(st["T"], cfg.T_min)
        d = jnp.maximum(st["d"], 1e-9)
        # bulk liquid properties: per-parcel composition-weighted when the
        # mixture tracks per-parcel lanes (reference composition model
        # re-evaluation each calc, ReactingParcel.C)
        if self.multi_liq:
            rho_l = self.liquid.rho_Y(p_c, T_p, st["Yl"])
            cp_l = self.liquid.cp_Y(p_c, T_p, st["Yl"])
        else:
            rho_l = self.liquid.rho(p_c, T_p)
            cp_l = self.liquid.cp(p_c, T_p)
        m1 = _sphere_mass(rho_l, d)  # single-particle mass
        mass0 = st["nP"] * m1

        Urel = U_c - st["U"]
        magUr = jnp.sqrt(jnp.sum(Urel * Urel, axis=1))
        Re = jnp.maximum(rho_c * magUr * d / mu_c, 1e-6)
        Pr_c = jnp.maximum(mu_c * cp_c / kappa_c, 1e-6)

        # ---- phase change (LiquidEvaporationBoil behaviour) -------------
        dm1 = jnp.zeros_like(d)  # evaporated mass per particle this substep
        dm_k = None  # per-component evaporated mass [N, K] (multi-liquid)
        hl_evap = jnp.zeros_like(d)
        if cfg.phase_change and self.multi_liq:
            # per-component LiquidEvaporation(Boil): every liquid
            # evaporates against its OWN saturation pressure, diffusivity
            # and latent heat (LiquidEvaporation.C calculate loop over
            # liquids; ReactingParcel.C:389-607 calcPhaseChange) — the
            # parcel's Yl lane drifts as volatile components deplete first
            Yl = st["Yl"]
            Wk = jnp.asarray(self.liquid.comp_W(), self.dtype)
            pvk = self.liquid.comp_pv(p_c, T_p)  # [N, K]
            Dk = self.liquid.comp_D(p_c, T_p)
            hlk = self.liquid.comp_hl(p_c, T_p)
            xk = self.liquid.x_Y(Yl)  # liquid mole fractions (Raoult)
            RR = 8314.47
            Ts = (T_p + 2.0 * T_c) / 3.0  # two-thirds film temperature
            Cs_k = xk * pvk / (RR * Ts)[:, None]
            YvC = gas["YvC"][c]  # [N, K] carrier vapour mass fractions
            W_mix = gas["W"][c]
            Xv_k = YvC * W_mix[:, None] / Wk[None, :]
            Cinf_k = Xv_k * (p_c / (RR * T_c))[:, None]
            Sc_k = mu_c[:, None] / jnp.maximum(rho_c[:, None] * Dk, 1e-30)
            Sh_k = 2.0 + 0.6 * jnp.sqrt(Re)[:, None] * Sc_k ** (1.0 / 3.0)
            kc_k = Sh_k * Dk / d[:, None]
            dmdt_k = jnp.maximum(
                _PI * (d**2)[:, None] * kc_k * (Cs_k - Cinf_k)
                * Wk[None, :],
                0.0,
            )
            # boiling: heat-balance-limited TOTAL rate split over
            # components by Raoult volatility x·pv·W (the boil branch)
            wk = jnp.maximum(xk * pvk * Wk[None, :], 0.0)
            wk = wk / jnp.maximum(jnp.sum(wk, 1, keepdims=True), small())
            hl_mix = jnp.sum(wk * hlk, axis=1)
            Nu0 = 2.0 + 0.6 * jnp.sqrt(Re) * Pr_c ** (1.0 / 3.0)
            htc0 = Nu0 * kappa_c / d
            dm_dt_boil = jnp.maximum(
                htc0 * _PI * d**2 * (T_c - T_p), 0.0
            ) / jnp.maximum(hl_mix, small())
            boiling = T_p >= cfg.Tbp - 1e-6
            dmdt_tot = jnp.sum(dmdt_k, axis=1)
            dmdt_k = jnp.where(
                (boiling & (dm_dt_boil > dmdt_tot))[:, None],
                dm_dt_boil[:, None] * wk,
                dmdt_k,
            )
            dmdt_k = jnp.where((T_p > cfg.Tvap)[:, None], dmdt_k, 0.0)
            # per-component availability: a lane can't give more than the
            # component mass it holds
            dm_k = jnp.clip(dmdt_k * dt_sub, 0.0, Yl * m1[:, None])
            dm1 = jnp.sum(dm_k, axis=1)
            # effective latent heat of what ACTUALLY evaporated
            hl_evap = jnp.sum(dm_k * hlk, axis=1) / jnp.maximum(
                dm1, small()
            )
            hl_evap = jnp.where(dm1 > small(), hl_evap, hl_mix)
        elif cfg.phase_change:
            pv = self.liquid.pv(p_c, T_p)
            Dab = self.liquid.D(p_c, T_p)
            Sc = mu_c / jnp.maximum(rho_c * Dab, 1e-30)
            Sh = 2.0 + 0.6 * jnp.sqrt(Re) * Sc ** (1.0 / 3.0)
            # molar concentration driving force (reference LiquidEvaporation):
            # Cs = pSat/(R Ts), Cinf = Xv p/(R Tc)
            Rgas = 8314.47 / self.liquid.W
            RR = 8314.47
            Ts = (T_p + 2.0 * T_c) / 3.0  # two-thirds rule film temperature
            Cs = pv / (RR * Ts)
            Yv = gas["Yv"][c]
            W_mix = gas["W"][c]
            Xv = Yv * W_mix / self.liquid.W
            Cinf = Xv * p_c / (RR * T_c)
            kc = Sh * Dab / d
            dm_dt_evap = jnp.maximum(_PI * d**2 * kc * (Cs - Cinf) * self.liquid.W, 0.0)
            # boiling: heat-balance-limited (all convective heat → latent)
            hl = self.liquid.hl(p_c, T_p)
            Nu0 = 2.0 + 0.6 * jnp.sqrt(Re) * Pr_c ** (1.0 / 3.0)
            htc0 = Nu0 * kappa_c / d
            dm_dt_boil = jnp.maximum(htc0 * _PI * d**2 * (T_c - T_p), 0.0) / hl
            boiling = T_p >= cfg.Tbp - 1e-6
            dm_dt = jnp.where(boiling, jnp.maximum(dm_dt_evap, dm_dt_boil), dm_dt_evap)
            dm_dt = jnp.where(T_p > cfg.Tvap, dm_dt, 0.0)
            dm1 = jnp.clip(dm_dt * dt_sub, 0.0, m1)
            hl_evap = hl

        m1_new = jnp.maximum(m1 - dm1, 0.0)
        evap_all = m1_new * st["nP"] <= cfg.min_mass
        d_new = jnp.maximum((6.0 * m1_new / (_PI * rho_l)) ** (1.0 / 3.0), 1e-9)

        # ---- devolatilisation (ReactingMultiphaseParcel calc chain) ------
        # volatile ledger mass evolves into the carrier; suppression's
        # canCombust == −1 inhibits it; all-volatiles-evolved flips the
        # parcel combustion-ready (canCombust = 1)
        dmv = None
        dmv_tot = jnp.zeros_like(d)
        if self.devol is not None:
            gate = mask & (jnp.sum(st["mv0"], axis=1) > 0.0)
            dmv, can_new = self.devol.calculate(
                dt_sub, T_p, st["mv"], st["mv0"], st["canCombust"], gate
            )
            dmv_tot = jnp.sum(dmv, axis=1)

        # ---- particle radiative efficiencies + heating -------------------
        # (ThermoParcel::calcHeatTransfer radiation branch + ThermoCloud::
        # radCalc — s = kG/4 − σ·kEmm·T⁴ added to the analytic T solve)
        s_rad = jnp.zeros_like(d)
        if cfg.radiation:
            QAbs, QSct, gAsy = self._rad_efficiencies(d)  # [N, nBands] each
            Gb = gas.get("G_bands")  # [nBands, nC] from fvDOM (stale)
            if Gb is not None and cfg.coupled_radiation:
                G_par = Gb[:, c].T  # [N, nBands]
                kG = jnp.sum(QAbs * G_par, axis=1)
                # Kirchhoff emission: QEmm = QAbs with equal band fractions
                # (the reference's getQEmmFrac is an unimplemented stub —
                # ThermoCloudI.H:627-631 returns zeros; we use the
                # energy-consistent closure instead)
                kEmm = jnp.sum(QAbs, axis=1) / max(cfg.n_bands, 1)
                s_rad = 0.25 * kG - 5.670367e-8 * kEmm * T_p**4

        # ---- heat transfer (Ranz-Marshall, analytic T integration) ------
        T_new = T_p
        q_conv1 = jnp.zeros_like(d)  # heat gained by one particle from gas
        if cfg.heat_transfer:
            Nu = 2.0 + 0.6 * jnp.sqrt(Re) * Pr_c ** (1.0 / 3.0)
            htc = Nu * kappa_c / d
            if cfg.bird_correction and cfg.phase_change:
                # Bird et al. evaporative shielding: beta/(e^beta - 1)
                beta = jnp.clip(
                    (dm1 / jnp.maximum(dt_sub, small()))
                    * cp_l
                    / jnp.maximum(htc * _PI * d**2, 1e-30),
                    0.0,
                    50.0,
                )
                corr = jnp.where(beta > 1e-7, beta / jnp.expm1(beta), 1.0)
                htc = htc * corr
            A = _PI * d**2
            # latent-heat sink of what evaporated (dm-weighted per
            # component under multi-liquid lanes)
            hl = hl_evap if cfg.phase_change else 0.0
            mcp = jnp.maximum(m1_new * cp_l, 1e-30)
            beta_T = htc * A / mcp
            # effective bath temperature incl. latent-heat sink and the
            # radiative surface flux s_rad (ThermoParcel.C:295-319 ap += s/htc)
            T_eff = (
                T_c
                - (dm1 / jnp.maximum(dt_sub, small())) * hl / jnp.maximum(htc * A, 1e-30)
                + s_rad / jnp.maximum(htc, 1e-30)
            )
            if cfg.scheme_T.lower().startswith("euler"):
                # IntegrationScheme/Euler.H: implicit single step
                T_new = (T_p + beta_T * dt_sub * T_eff) / (1.0 + beta_T * dt_sub)
            else:  # analytical (Analytical.H — exact exponential relaxation)
                T_new = T_eff + (T_p - T_eff) * jnp.exp(-beta_T * dt_sub)
            T_new = jnp.clip(T_new, cfg.T_min, cfg.Tbp)
            # convective-only heat from the gas (the radiative part comes
            # from the radiation field, not the carrier enthalpy — dhsTrans
            # in the reference is Sph·(Tres.average − Tc), convective only)
            q_conv1 = (
                m1_new * cp_l * (T_new - T_p) + dm1 * hl - s_rad * A * dt_sub
            )
        if self.devol is not None and self.devol.L_devol != 0.0:
            # latent heat of devolatilisation drawn from the particle
            # (Sh −= dMassTot·LDevol/dt, ReactingMultiphaseParcel.C:566)
            cp_here = cp_l if cfg.heat_transfer else st["cp0"]
            T_new = T_new - dmv_tot * self.devol.L_devol / jnp.maximum(
                m1_new * cp_here, small()
            )
            T_new = jnp.maximum(T_new, cfg.T_min)
        T_new = jnp.where(mask, T_new, T_p)

        # ---- momentum (particle force list, drag-implicit Euler) --------
        # forceSuSp composition (ParticleForceList): implicit Σ Sp·(Uc−Up)
        # from the drag model, explicit Σ Su from lift/pressureGradient/
        # virtualMass, plus gravity-buoyancy. The default sphereDrag path
        # reduces to exactly the original Schiller-Naumann update.
        U_new = st["U"]
        if cfg.drag:
            fr = self.forces
            m1n = _sphere_mass(rho_l, d_new)
            if fr.drag_model in (None, "sphereDrag"):
                # unit-mass fast path, bitwise-identical to the original
                # Schiller-Naumann update (SphereDragForce.C)
                from .forces import _sphere_cdre

                tau_inv = 0.75 * mu_c * _sphere_cdre(Re) / (rho_l * d_new**2)
            else:
                sp = fr.drag_sp(
                    Re, mu_c, rho_l, d_new, m1n,
                    alpha_c=gas.get("alphac"),
                    y=st.get("distort_y"),
                )
                tau_inv = sp / jnp.maximum(m1n, small())
            g_eff = self.g[None, :] * (1.0 - rho_c / rho_l)[:, None] if cfg.gravity_on else 0.0
            su = jnp.zeros_like(U_new)
            if fr.lift_model is not None and "curlU" in gas:
                su = su + fr.lift_su(
                    st["U"], U_c, gas["curlU"][c], Re, mu_c, rho_c, rho_l,
                    d_new, m1n, g=np.asarray(self.g),
                )
            if (fr.pressure_gradient or fr.virtual_mass) and "DUDt" in gas:
                su = su + fr.pgrad_su(gas["DUDt"][c], rho_c, rho_l, m1n)
            if fr.has_body_forces():
                hdgh = gas["HdotGradH"][c] if "HdotGradH" in gas else None
                su = su + fr.body_su(st["x"], st["U"], m1n, rho_c, rho_l, hdgh)
            m_eff = m1n + fr.mass_add(m1n, rho_c, rho_l)
            if cfg.scheme_U.lower().startswith("anal"):
                # Analytical.H: exact relaxation toward the effective bath
                # U_eff = Uc + (Su/m + g)/τ⁻¹
                ti = jnp.maximum(tau_inv, small())
                U_eff = (
                    U_c
                    + (su / jnp.maximum(m_eff, small())[:, None] + g_eff)
                    / ti[:, None]
                )
                U_new = U_eff + (st["U"] - U_eff) * jnp.exp(-dt_sub * ti)[:, None]
            else:  # Euler (drag-implicit)
                U_new = (
                    st["U"]
                    + dt_sub * (tau_inv[:, None] * U_c + su / jnp.maximum(m_eff, small())[:, None] + g_eff)
                ) / (1.0 + dt_sub * tau_inv)[:, None]
        elif cfg.gravity_on or self.forces.has_body_forces():
            acc = (
                self.g[None, :] * (1.0 - rho_c / rho_l)[:, None]
                if cfg.gravity_on
                else 0.0
            )
            if self.forces.has_body_forces():
                m1n = _sphere_mass(rho_l, d_new)
                hdgh = gas["HdotGradH"][c] if "HdotGradH" in gas else None
                acc = acc + self.forces.body_su(
                    st["x"], st["U"], m1n, rho_c, rho_l, hdgh
                ) / jnp.maximum(m1n, small())[:, None]
            U_new = st["U"] + dt_sub * acc

        # ---- source accumulation (per-cell segment sums) -----------------
        nP = st["nP"]
        w = jnp.where(mask, nP, 0.0)
        nC = self.geom.n_cells
        seg = lambda v: jax.ops.segment_sum(v, c, num_segments=nC)
        dm = w * dm1  # mass to carrier
        if self.cfg.coupled:
            src = dict(src)
            src["rhoTrans"] = src["rhoTrans"] + seg(dm)
            # momentum: drag impulse on the gas = −m ΔU_drag; evaporated mass
            # carries its own momentum into the carrier
            dU = U_new - st["U"]
            g_eff_v = (
                self.g[None, :] * (1.0 - rho_c / rho_l)[:, None]
                if cfg.gravity_on
                else jnp.zeros_like(U_new)
            )
            dU_drag = dU - dt_sub * g_eff_v
            mom = -(w * m1_new)[:, None] * dU_drag + (dm)[:, None] * st["U"]
            src["UTrans"] = src["UTrans"] + seg(mom)
            # energy: gas loses convective heat, gains vapour enthalpy
            if dm_k is not None:
                # per-component: each lane's mass enters its OWN carrier
                # species with that species' enthalpy (parcels.SYi per
                # liquid, YEEqn.H:52)
                dmw_k = w[:, None] * dm_k
                src["pcTrans"] = src["pcTrans"] + jnp.stack(
                    [seg(dmw_k[:, i]) for i in range(self.n_liq)]
                )
                hs_all_v = self.gas.hs_species(T_new)
                q = -w * q_conv1 + sum(
                    dmw_k[:, i] * hs_all_v[:, vi]
                    for i, vi in enumerate(self.vapour_indices)
                )
            else:
                hv = self.gas.hs_species(T_new)[:, self.vapour_index]
                q = -w * q_conv1 + dm * hv
            src["hsTrans"] = src["hsTrans"] + seg(q)
            if dmv is not None:
                # devolatilised mass → per-volatile carrier species, its
                # momentum at the parcel velocity, its enthalpy at Tp
                hs_all = self.gas.hs_species(T_new)
                dv = w[:, None] * dmv  # parcel-level mass per volatile
                dv_tot = w * dmv_tot
                src["dvTrans"] = src["dvTrans"] + jnp.stack(
                    [seg(dv[:, i]) for i in range(self.devol.n_vol)]
                )
                src["UTrans"] = src["UTrans"] + seg(
                    dv_tot[:, None] * st["U"]
                )
                q_dv = sum(
                    dv[:, i] * hs_all[:, si]
                    for i, si in enumerate(self.devol.gas_indices)
                )
                src["hsTrans"] = src["hsTrans"] + seg(q_dv)

        # ---- spray radiation accumulators (ThermoCloud::radCalc:
        # radAreaP/radAreaPSc/radAreaPT4/radAreaPScAsy per band) ----------
        if cfg.radiation:
            Ap = 0.25 * _PI * d_new**2  # projected area
            QAbs, QSct, gAsy = self._rad_efficiencies(d_new)
            wA = jnp.where(mask, nP * Ap, 0.0) * dt_sub  # time-weighted
            segb = lambda v: jax.vmap(
                lambda col: jax.ops.segment_sum(col, c, num_segments=nC)
            )(v.T)  # [N, nB] -> [nB, nC]
            src = dict(src)
            src["radAp"] = src["radAp"] + segb(wA[:, None] * QAbs)
            src["radSigp"] = src["radSigp"] + segb(wA[:, None] * QSct)
            src["radAsy"] = src["radAsy"] + segb(wA[:, None] * QSct * gAsy)
            # emission ∝ particle SURFACE (4·Ap)·σ·QEmm·emFrac·T⁴, energy-
            # consistent with the parcel sink above (QEmm = QAbs, equal
            # band fractions)
            src["radEpT4"] = src["radEpT4"] + segb(
                (4.0 * wA * T_new**4 / max(cfg.n_bands, 1))[:, None] * QAbs
            )

        # ---- commit parcel updates --------------------------------------
        st = dict(st)
        if dmv is not None:
            st["mv"] = st["mv"] - dmv
            st["canCombust"] = can_new
        if dm_k is not None:
            # composition drift: remaining component masses renormalise;
            # fully-evaporated parcels keep their last valid composition
            # (they die via evap_all — guards NaN-free masked math)
            mk_new = jnp.maximum(st["Yl"] * m1[:, None] - dm_k, 0.0)
            tot = jnp.sum(mk_new, axis=1, keepdims=True)
            Yl_new = jnp.where(
                tot > small(), mk_new / jnp.maximum(tot, small()), st["Yl"]
            )
            st["Yl"] = jnp.where(mask[:, None], Yl_new, st["Yl"])
        st["T"] = jnp.where(mask, T_new, st["T"])
        st["U"] = jnp.where(mask[:, None], U_new, st["U"])
        st["d"] = jnp.where(mask, d_new, st["d"])
        st["alive"] = st["alive"] & ~(mask & evap_all)
        st["age"] = st["age"] + jnp.where(mask, dt_sub, 0.0)
        return st, src

    # ------------------------------------------------------------------
    def _rad_efficiencies(self, d):
        """Per-parcel per-band (QAbs, QSct, g): constRad constants or
        diaBanded linear interpolation in particle diameter with endpoint
        extrapolation (ThermoCloud::getQAbsQSct, ThermoCloudI.H:647-720)."""
        nb = self.cfg.n_bands
        dtp = self.dtype
        if self.rad_dia is None or len(self.rad_dia) == 1:
            one = jnp.ones(d.shape + (1,), dtp)
            return (
                one * jnp.asarray(self.rad_qabs[0], dtp),
                one * jnp.asarray(self.rad_qsct[0], dtp),
                one * jnp.asarray(self.rad_asy[0], dtp),
            )
        dia = jnp.asarray(self.rad_dia, dtp)

        def interp(tab):
            tabj = jnp.asarray(tab, dtp)  # [nDia, nB]
            return jax.vmap(
                lambda col: jnp.interp(d, dia, col), in_axes=1, out_axes=1
            )(tabj)

        return interp(self.rad_qabs), interp(self.rad_qsct), interp(self.rad_asy)

    # ------------------------------------------------------------------
    def vDotSweep(self, st) -> jnp.ndarray:
        """Per-cell swept volume rate Σ np·π/4·d²·|U| / V [1/s] — the
        suppression-probability driver (kinematicCloud::vDotSweep consumed
        by SuppressionCollision.C:collide)."""
        magU = jnp.sqrt(jnp.sum(st["U"] ** 2, axis=1))
        v = jnp.where(st["alive"], st["nP"] * 0.25 * _PI * st["d"] ** 2 * magU, 0.0)
        return (
            jax.ops.segment_sum(v, st["cell"], num_segments=self.geom.n_cells)
            / self.geom.V
        )

    # ------------------------------------------------------------------
    def _film_interaction(self, st, src, code, hit, mass_before, T_hit,
                          film_delta_b, gas):
        """Parcel → film handoff with Bai-Gosman splashing (reference
        lib/splashingModels/ThermoSurfaceFilmNew/ThermoSurfaceFilmMeredith.C
        :333-460 via ThermoSurfaceFilm):

          La = ρσd/μ²;  Wec = A·La^(−0.183)  (A = Adry dry / Awet wet)
          dry (δ<deltaWet): We<Wec → absorb, else splash
          wet: We<1 absorb; 1≤We<20 bounce; 20≤We<Wec absorb (spread);
               ≥Wec splash
          splash: mRatio of the mass continues as ONE secondary parcel with
          a truncated-exponential diameter (dBar = 6^{-1/3}(mRatio/Ns)^{1/3}d,
          Ns = a0(We/Wec−1)) and energy-budget speed (EKs balance,
          :529-575); the rest is absorbed by the film. The geometric
          reflection already happened in the walk."""
        hit_film = (code == INTERACT_FILM) & (hit >= 0) & st["alive"]
        if not self.has_film_handoff:
            return st, src
        bidx = jnp.maximum(hit, 0)
        p_atm = 101325.0
        cp_l = self.liquid.cp(p_atm, T_hit)
        h_rel = cp_l * (T_hit - 298.15)

        if not self.splash_on or film_delta_b is None:
            # pure absorb
            absorb = hit_film
            m_abs = jnp.where(absorb, mass_before, 0.0)
            st = dict(st)
            st["alive"] = st["alive"] & ~absorb
            src = dict(src)
            src["filmMass"] = src["filmMass"] + jax.ops.segment_sum(
                m_abs, bidx, num_segments=self.geom.n_boundary
            )
            src["filmEnthalpy"] = src["filmEnthalpy"] + jax.ops.segment_sum(
                m_abs * h_rel, bidx, num_segments=self.geom.n_boundary
            )
            return st, src

        d = jnp.maximum(st["d"], 1e-9)
        rho_l = self.liquid.rho(p_atm, T_hit)
        sigma = jnp.maximum(self.liquid.sigma(p_atm, T_hit), 1e-6)
        mu_l = self.liquid.mu(p_atm, T_hit)
        magU = jnp.sqrt(jnp.sum(st["U"] ** 2, axis=1))
        We = rho_l * d * magU**2 / sigma
        La = rho_l * sigma * d / mu_l**2
        delta = film_delta_b[bidx]
        wet = delta > self.splash_delta_wet
        Wec = jnp.where(wet, self.splash_Awet, self.splash_Adry) * La ** (-0.183)

        splash = hit_film & (We >= Wec)
        bounce = hit_film & wet & (We >= 1.0) & (We < 20.0) & ~splash
        absorb = hit_film & ~splash & ~bounce

        # ---- splash secondary parcel ----
        key, sub = jax.random.split(st["rng"])
        y1, y2 = jax.random.uniform(sub, (2,) + d.shape)
        m_ratio = 0.2 + 0.6 * y1  # wetSplashRatio range (dry uses the same)
        Ns = jnp.maximum(5.0 * (We / jnp.maximum(Wec, 1e-6) - 1.0), 1e-3)
        d_bar = (m_ratio / Ns) ** (1.0 / 3.0) * d / 6.0 ** (1.0 / 3.0) + 1e-12
        d_min, d_max = 8e-5, 1.6e-3
        K = jnp.exp(-d_min / d_bar) - jnp.exp(-d_max / d_bar)
        d_new = jnp.maximum(
            d_min, -d_bar * jnp.log(jnp.maximum(jnp.exp(-d_min / d_bar) - y2 * K, 1e-30))
        )
        m = mass_before
        m_splash = m_ratio * m
        # energy budget → splashed speed (parcelsPerSplash = 1)
        np_old = st["nP"]
        ek_in = 0.5 * m * magU**2
        e_sig_in = np_old * sigma * _PI * d**2
        np_new = m_splash / jnp.maximum(_sphere_mass(rho_l, d_new), small())
        e_sig_sec = np_new * sigma * _PI * d_new**2
        e_d = jnp.maximum(0.8 * ek_in, 0.75 * Wec / 12.0 * _PI * sigma * d**2 * np_old)
        eks = ek_in + e_sig_in - e_sig_sec - e_d
        # EKs ≤ 0 → total absorb instead of splash
        no_energy = splash & (eks <= 0.0)
        splash = splash & (eks > 0.0)
        absorb = absorb | no_energy
        u_mag_new = jnp.sqrt(jnp.maximum(eks, 0.0) / jnp.maximum(m_splash, small()))
        u_dir = st["U"] / jnp.maximum(magU, 1e-12)[:, None]

        st = dict(st)
        st["alive"] = st["alive"] & ~absorb
        st["d"] = jnp.where(splash, d_new, st["d"])
        st["nP"] = jnp.where(splash, np_new, st["nP"])
        st["U"] = jnp.where(splash[:, None], u_dir * u_mag_new[:, None], st["U"])
        st["rng"] = key
        # film receives absorbed mass + the non-splashed fraction
        m_to_film = jnp.where(absorb, m, 0.0) + jnp.where(splash, m - m_splash, 0.0)
        src = dict(src)
        src["filmMass"] = src["filmMass"] + jax.ops.segment_sum(
            m_to_film, bidx, num_segments=self.geom.n_boundary
        )
        src["filmEnthalpy"] = src["filmEnthalpy"] + jax.ops.segment_sum(
            m_to_film * h_rel, bidx, num_segments=self.geom.n_boundary
        )
        return st, src

    # ------------------------------------------------------------------
    def evolve(self, st: Dict, gas: Dict, dt) -> Tuple[Dict, Dict]:
        """One gas-step evolution. `gas` holds per-cell carrier arrays:
        rho,U,T,p,mu,kappa,cp,Yv,W. Returns (state, sources)."""
        nC = self.geom.n_cells
        dtp = self.dtype
        src = {
            "rhoTrans": jnp.zeros(nC, dtp),
            "UTrans": jnp.zeros((nC, 3), dtp),
            "hsTrans": jnp.zeros(nC, dtp),
            "filmMass": jnp.zeros(self.geom.n_boundary, dtp),
            "filmEnthalpy": jnp.zeros(self.geom.n_boundary, dtp),
            "escapedMass": jnp.zeros((), dtp),
        }
        if self.devol is not None:
            # per-volatile devolatilised mass to the carrier [nVol, nC]
            src["dvTrans"] = jnp.zeros((self.devol.n_vol, nC), dtp)
        if self.multi_liq:
            # per-component evaporated mass [nLiq, nC] — routed to each
            # component's own carrier species by the solver
            src["pcTrans"] = jnp.zeros((self.n_liq, nC), dtp)
        if self.cfg.radiation:
            nb = self.cfg.n_bands
            for k in ("radAp", "radSigp", "radAsy", "radEpT4"):
                src[k] = jnp.zeros((nb, nC), dtp)
        if not self.cfg.active:
            return st, src

        st = self._inject(st, gas["t"], dt, gas)

        # stochastic collision (KinematicCloud.C:205): SuppressionCollision
        # driven by the suppressing cloud's per-cell swept-volume rate
        if self.suppression is not None and gas.get("vDotSweep_sup") is not None:
            st = self.suppression.collide(st, gas["vDotSweep_sup"], dt)

        # cloud function object preEvolve (VoidFraction zeroes θ each step)
        if self.cloud_functions:
            st = dict(st)
            st["cfo"] = [
                f.reset(fst) if hasattr(f, "reset") else fst
                for f, fst in zip(self.cloud_functions, st["cfo"])
            ]

        dt_sub = dt / self.cfg.n_sub
        for _ in range(self.cfg.n_sub):
            # ballistic move + containment walk (wall interactions inside)
            mass_before = self._mass(st)
            hit_T = st["T"]
            x_pre = st["x"]
            if self.pair_collision is not None:
                # DEM sub-cycled contact forces + motion (PairCollision::
                # collide); x advances inside the sub-cycles so the springs
                # resolve — the ballistic pre-move is subsumed
                stc, pc = self.pair_collision.collide(
                    st, st["pc"], self.cfg.rho0, dt_sub
                )
                st = dict(st)
                st.update({k: stc[k] for k in ("x", "U")})
                st["pc"] = pc
                x = st["x"]
            else:
                x = st["x"] + jnp.where(
                    st["alive"][:, None], st["U"] * dt_sub, 0.0
                )
            x, U, cell, alive, hit, code = self.walk.walk(
                x, st["U"], st["cell"], st["alive"], self.b_code, self.b_e,
                n_steps=self.cfg.walk_steps,
            )
            died = st["alive"] & ~alive
            st = dict(st)
            st.update(x=x, U=U, cell=cell, alive=alive)
            # particle collectors: segment-crossing accumulation
            if self.collectors:
                cstates = []
                key, *ckeys = jax.random.split(st["rng"], len(self.collectors) + 1)
                st["rng"] = key
                for c, cst, ck in zip(self.collectors, st["coll"], ckeys):
                    cst, caught = c.collect(
                        cst, x_pre, st["x"], mass_before, st["d"], st["U"],
                        st["alive"], dt_sub, key=ck,
                    )
                    if (c.remove_collected or c.fixed_mass_remove
                            or c.cont_mass_remove):
                        st["alive"] = st["alive"] & ~caught
                    cstates.append(cst)
                st["coll"] = cstates
            # escaped-mass bookkeeping
            esc = died & (code == INTERACT_ESCAPE)
            src["escapedMass"] = src["escapedMass"] + jnp.sum(
                jnp.where(esc, mass_before, 0.0)
            )
            # cloud function objects: postPatch on wall strikes
            if self.cloud_functions:
                b_normal = self.geom.b_Sf / self.geom.b_magSf[:, None]
                hit_mask = hit >= 0
                hit_c = jnp.maximum(hit, 0)
                cfos = []
                for f, fst in zip(self.cloud_functions, st["cfo"]):
                    if hasattr(f, "post_patch"):
                        fst = f.post_patch(
                            fst, st, hit_c, hit_mask, mass_before, U, b_normal
                        )
                    cfos.append(fst)
                st["cfo"] = cfos
            # film interaction (absorb / Bai-Gosman splash)
            st, src = self._film_interaction(
                st, src, code, hit, mass_before, hit_T,
                gas.get("film_delta_b"), gas,
            )
            # SPMD parcel migration (the reference's switchProcessor
            # handoff): the walk stopped in a halo slot for any parcel
            # that left this partition — hand it to the owner BEFORE the
            # physics so sources accumulate on owned cells only
            if self.part is not None:
                from ..parallel.parcels import exchange_parcels

                pi = self.part
                in_halo = st["alive"] & (st["cell"] >= pi.n_own)
                hslot = jnp.maximum(st["cell"] - pi.n_own, 0)
                dest = jnp.where(in_halo, pi.halo_owner[hslot], -1).astype(jnp.int32)
                soa_keys = ("x", "U", "d", "T", "nP", "cell", "age",
                            "canCombust", "typeId", "cp0") + tuple(
                    k for k in ("mv", "mv0", "ms", "Yl") if k in st
                )
                soa = {k: st[k] for k in soa_keys}
                soa["cell"] = jnp.where(
                    in_halo, pi.halo_local[hslot], st["cell"]
                ).astype(st["cell"].dtype)
                soa, alive2, n_over = exchange_parcels(
                    soa, st["alive"], dest, pi.n_parts, pi.cap_send, pi.axis
                )
                st = dict(st)
                st.update(soa)
                st["alive"] = alive2
                src["migrOverflow"] = src.get(
                    "migrOverflow", jnp.zeros((), jnp.int32)
                ) + n_over
            # physics + gas-side sources
            st, src = self._calc(st, gas, dt_sub, src)
            # cloud function objects: postMove (void fraction, tracks, trap)
            if self.cloud_functions:
                cfos = []
                for f, fst in zip(self.cloud_functions, st["cfo"]):
                    if hasattr(f, "post_move"):
                        fst, st = f.post_move(fst, st, dt_sub, dt, gas, self.geom)
                    cfos.append(fst)
                st = dict(st)
                st["cfo"] = cfos

        # MPPIC dense-phase corrections at step end (MPPICCloud::motion:
        # damping → packing → isotropy on the settled positions)
        if self.mppic is not None:
            st = dict(st)
            key, sub_key = jax.random.split(st["rng"])
            st["rng"] = key
            st = self.mppic.apply(st, self.geom, dt, sub_key)

        if self.cfg.radiation:
            # time-averaged dispersed-phase radiation fields for the RTE
            # (ThermoCloud::ap/sigmap/Ep — ThermoCloudI.H:377-492: the dt
            # accumulation divides by the flow Δt; V division here)
            Vdt = self.geom.V[None, :] * jnp.maximum(dt, small())
            src["cloud_rad"] = {
                "ap": src.pop("radAp") / Vdt,
                "sigmap": src.pop("radSigp") / Vdt,
                "asy": src.pop("radAsy") / Vdt,
                "Ep": 5.670367e-8 * src.pop("radEpT4") / Vdt,
            }
        return st, src

    # ------------------------------------------------------------------
    def write_sprinkler_logs(self, st: Dict, out_dir: str):
        """Per-sprinkler master log files (DetailedSprinklerInjection.H:
        154-156 filePtr_, .C:469,567: each head logs its link temperature,
        activation time and flow): postProcessing/sprinklers/<injector>.dat
        with one row per head."""
        import os

        rows_written = False
        for inj, ist in zip(self.injectors, st["inj"]):
            if "Te" not in ist:
                continue  # not an RTI-linked sprinkler model
            d = os.path.join(out_dir, "sprinklers")
            os.makedirs(d, exist_ok=True)
            Te = np.asarray(ist["Te"])
            t_act = np.asarray(ist["t_act"])
            Q = getattr(inj, "Q", 0.0)
            pos = getattr(inj, "positions", np.zeros((Te.shape[0], 3)))
            with open(os.path.join(d, f"{inj.name}.dat"), "w") as f:
                f.write(f"# sprinkler injector {inj.name}\n")
                f.write("# head x y z Tlink[K] tAct[s] activated Q[m3/s]\n")
                for i in range(Te.shape[0]):
                    act = t_act[i] >= 0.0
                    f.write(
                        f"{i}\t{pos[i][0]:.6g}\t{pos[i][1]:.6g}\t"
                        f"{pos[i][2]:.6g}\t{Te[i]:.6g}\t"
                        f"{t_act[i] if act else -1:.6g}\t{int(act)}\t"
                        f"{(Q if act else 0.0):.6g}\n"
                    )
            rows_written = True
        return rows_written

    def write_collectors(self, st: Dict, out_dir: str):
        """Per-collector dat files: bin masses, mean velocity, dv50
        (reference ParticleCollectorFmg master-only log files)."""
        import os

        for c, cst in zip(self.collectors, st["coll"]):
            s = c.summarise(cst)
            d = os.path.join(out_dir, c.name)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "collector.dat"), "w") as f:
                f.write(f"# particleCollector {c.name} mode={c.mode}\n")
                f.write(f"# collection time {s['time']:.8g} s, dv50 {s['dv50']:.8g} m\n")
                f.write("# bin mass[kg] meanVel[m/s]\n")
                for i, (m, v) in enumerate(zip(s["mass"], s["velocity"])):
                    f.write(f"{i}\t{m:.8g}\t{v:.8g}\n")

    # ------------------------------------------------------------------
    def info(self, st: Dict) -> Dict:
        m = self._mass(st)
        red = self.part.preduce if self.part is not None else (lambda v: v)
        mx = (
            (lambda v: jax.lax.pmax(v, self.part.axis))
            if self.part is not None
            else (lambda v: v)
        )
        return {
            "nParcels": red(jnp.sum(st["alive"].astype(jnp.int32))),
            "massInSystem": red(jnp.sum(m)),
            "Dmax": mx(jnp.max(jnp.where(st["alive"], st["d"], 0.0))),
            "D32": red(jnp.sum(jnp.where(st["alive"], st["nP"] * st["d"] ** 3, 0.0)))
            / jnp.maximum(
                red(jnp.sum(jnp.where(st["alive"], st["nP"] * st["d"] ** 2, 0.0))),
                small(),
            ),
        }


def _bmask(mask, v):
    """Broadcast a [N] bool mask against v of shape [N] or [N,3]."""
    if v.ndim == 2:
        return mask[:, None]
    return mask


def _nested(v, nb):
    """Parse a List<List<scalar>> dict entry into [nDia][nBands] floats."""
    rows = []
    for row in v if isinstance(v, list) else []:
        if isinstance(row, list):
            rows.append([float(x) for x in row])
        else:
            rows.append([float(row)] * nb)
    return rows or [[0.5] * nb]
