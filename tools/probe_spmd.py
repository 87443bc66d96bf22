"""Probe harness for the explicit-SPMD path: trace an arbitrary
per-instance function over the stacked-consts mechanism and report where
NaNs first appear in the step. Usage: python tools/probe_spmd.py [stage]"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ.setdefault("FIREFOAM_TPU_DTYPE", "float64")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax._src import core as jcore
from jax.sharding import Mesh, PartitionSpec as P

from firefoam_tpu.parallel.spmd_step import SpmdFireFoam
from firefoam_tpu.parallel.sharded import shard_map_compat


def run_spmd(sp, fn_of_solver, state_global):
    """Trace fn(solver, local_state) per instance, stack consts, run under
    shard_map; returns the (replicated or stacked) outputs."""
    stl = sp.scatter_state(state_global)
    flat0, in_tree = jax.tree.flatten(jax.tree.map(lambda x: x[0], stl))
    cell = {}
    jprs = []
    for p, solver in enumerate(sp.locals):
        def flat_fn(*flat, _s=solver):
            st = jax.tree.unflatten(in_tree, flat)
            out = fn_of_solver(_s, st)
            fo, ot = jax.tree.flatten(out)
            cell["tree"] = ot
            return fo

        flat_p = [jnp.asarray(np.asarray(x)[p]) for x in jax.tree.leaves(stl)]
        with jcore.extend_axis_env_nd([(sp.axis, sp.n_devices)]):
            jprs.append(jax.make_jaxpr(flat_fn)(*flat_p))
    consts = [
        jnp.stack([j.consts[i] for j in jprs]) for i in range(len(jprs[0].consts))
    ]
    nc = len(consts)
    jaxpr = jprs[0].jaxpr

    def body(*args):
        cs = [c[0] for c in args[:nc]]
        st = [x[0] for x in args[nc:]]
        outs = jcore.eval_jaxpr(jaxpr, cs, *st)
        return tuple(o[None] for o in outs)

    n_out = len(jaxpr.outvars)
    f = shard_map_compat(
        body,
        mesh=sp.mesh,
        in_specs=(P(sp.axis),) * (nc + len(flat0)),
        out_specs=(P(sp.axis),) * n_out,
    )
    outs = jax.jit(f)(*consts, *jax.tree.leaves(stl))
    return jax.tree.unflatten(cell["tree"], outs)


def main():
    sp = SpmdFireFoam("/root/reference/cases/steckler", 8)
    st0 = sp.ref.initial_state()

    def probe(s, st):
        log = {}
        st = dict(st)
        st2, srcs = s._evolve_cloud(st, log)
        srcs["_ov"] = {}
        g = s.geom
        dt = st["dt"]
        import firefoam_tpu.ops.fvc as fvc
        from firefoam_tpu.ops import VolField

        rho_i = (
            st["rho_old_i"] - dt * fvc.div_flux(g, st["phi"]) + dt * srcs["Srho"]
        )
        st2["rho"] = VolField(rho_i, st["rho"].b)
        U_new, m, coeffs = s._u_eqn(st2, log, srcs)
        dtot = m.diag_total()
        b = m.rhs_total()
        x0 = st2["U"].i
        Ax = jax.vmap(lambda xc, dc: m.matvec(xc, dc), in_axes=(1, 1))(x0, dtot)
        w = g.cell_w
        nan_at = lambda a: jnp.sum(
            jnp.any(~jnp.isfinite(jnp.atleast_2d(a.T)), axis=-1)
            * (w if a.shape[0] == w.shape[0] else 1.0)
        )
        bv = g.b_valid
        out = {
            "nan_b": jnp.sum(~jnp.isfinite(b) * w[:, None]),
            "nan_src": jnp.sum(~jnp.isfinite(m.source) * w[:, None]),
        }
        for pch in g.patches:
            sl = pch.slice
            out[f"nanbc_{pch.name}"] = jnp.sum(
                ~jnp.isfinite(m.boundary_coeffs[sl]) * bv[sl][:, None]
            ) + 1000 * jnp.sum(
                ~jnp.isfinite(m.internal_coeffs[sl]) * bv[sl][:, None]
            )
        return out

    out = run_spmd(sp, probe, st0)
    for k, v in out.items():
        print(k, np.asarray(v).ravel())


if __name__ == "__main__":
    main()
