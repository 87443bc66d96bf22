"""Cell-wise RTI link fields (solver/rti.H / createRTI.H)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from firefoam_tpu.functionobjects.rtilinks import RTILinks  # noqa: E402


class _Case:
    def __init__(self, d):
        self._d = d

    def has_constant(self, name):
        return name == "rtiProperties"

    def constant(self, name):
        return self._d


class _Dict(dict):
    def get_bool(self, k, default=False):
        return bool(self.get(k, default))

    def get_scalar(self, k, default=0.0):
        return float(self.get(k, default))


def test_link_heats_and_records_first_activation():
    d = _Dict(active=True, RTI1=50.0, C1=0.0, Tact1=330.0,
              RTI2=200.0, C2=0.0, Tact2=330.0)
    rl = RTILinks(_Case(d), n_cells=4, dtype=jnp.float64)
    assert rl.active
    st = rl.initial_state()
    T = jnp.asarray([500.0, 298.15, 298.15, 298.15])
    U = jnp.zeros((4, 3)).at[0, 1].set(4.0)  # 2 m^0.5/s sqrt-speed at cell 0
    t, dt = 0.0, 0.5
    t_fire1 = None
    for k in range(200):
        t += dt
        st = rl.advance(st, T, U, t, dt)
        if t_fire1 is None and float(st["dTe"][0, 0]) + 298.15 >= 330.0:
            t_fire1 = t
    f = rl.fields(st)
    # link 1 (low RTI) activates; its tAct records the FIRST crossing time
    assert float(f["tAct1"][0]) == pytest.approx(t_fire1, abs=dt)
    # quiescent cells never activate
    assert (np.asarray(f["tAct1"])[1:] == 1e3).all()
    # higher-RTI link 2 lags link 1
    assert float(f["Tlink2"][0]) < float(f["Tlink1"][0])
    # tAct is monotone-stable: advancing further never changes the record
    rec = float(f["tAct1"][0])
    for _ in range(20):
        t += dt
        st = rl.advance(st, T, U, t, dt)
    assert float(rl.fields(st)["tAct1"][0]) == rec


def test_c_coefficient_slows_response():
    d = _Dict(active=True, RTI1=50.0, C1=0.0, Tact1=1000.0,
              RTI2=50.0, C2=2.0, Tact2=1000.0)
    rl = RTILinks(_Case(d), n_cells=1, dtype=jnp.float64)
    st = rl.initial_state()
    T = jnp.asarray([400.0])
    U = jnp.ones((1, 3))
    t = 0.0
    for _ in range(50):
        t += 0.5
        st = rl.advance(st, T, U, t, 0.5)
    f = rl.fields(st)
    assert float(f["Tlink2"][0]) < float(f["Tlink1"][0])  # conduction loss

def test_inactive_without_dict():
    class NoCase:
        def has_constant(self, name):
            return False

    rl = RTILinks(NoCase(), 4, jnp.float64)
    assert not rl.active
