"""PairCollision DEM: spring-slider-dashpot pair + wall forces.

Reference: packages/lagrangian/intermediateNew/submodels/Kinematic/
CollisionModel/PairCollision/ (PairSpringSliderDashpot.C:evaluatePair,
WallSpringSliderDashpot.C:evaluateWall). Analytic two-ball / ball-wall
behaviour checks.
"""

import jax.numpy as jnp
import numpy as np

from firefoam_tpu.io import parse_string
from firefoam_tpu.lagrangian.paircollision import PairCollision


class _NoWallGeom:
    patches = []


def _model(extra="", geom=None, alpha=0.12, mu=0.52):
    sub = parse_string(
        f"""
collisionModel pairCollision;
pairCollisionCoeffs
{{
    nSubCycles 40;
    pairModelCoeffs
    {{ alpha {alpha}; b 1.5; mu {mu}; cohesionEnergyDensity 0;
       useEquivalentSize false; }}
    wallModelCoeffs {{ alpha {alpha}; b 1.5; mu {mu}; }}
    {extra}
}}
"""
    )
    cp = parse_string("youngsModulus 1e6; poissonsRatio 0.35;")
    return PairCollision.from_dict(sub, cp, geom or _NoWallGeom())


def _two_ball_state(U0=1.0, offset=0.0):
    cap = 4
    st = {
        "x": jnp.asarray(
            [
                [0.0, 0.0, 0.0],
                [0.0025, offset, 0.0],
                [10.0, 10.0, 10.0],
                [11.0, 11.0, 11.0],
            ]
        ),
        "U": jnp.asarray(
            [[U0, 0.0, 0.0], [-U0, 0.0, 0.0], [0.0] * 3, [0.0] * 3]
        ),
        "d": jnp.full((cap,), 2e-3),
        "nP": jnp.ones((cap,)),
        "alive": jnp.asarray([True, True, False, False]),
    }
    return st


def test_none_accepted():
    sub = parse_string("collisionModel none;")
    cp = parse_string("youngsModulus 1e6; poissonsRatio 0.35;")
    assert PairCollision.from_dict(sub, cp, _NoWallGeom()) is None


def test_head_on_collision_momentum_and_restitution():
    pc = _model()
    st = _two_ball_state(U0=1.0)
    cst = pc.init_state(4, jnp.float64)
    rho = 1000.0
    m = rho * np.pi / 6.0 * (2e-3) ** 3
    p_before = m * (1.0) + m * (-1.0)
    # run until the balls separate
    for _ in range(12):
        st, cst = pc.collide(st, cst, rho, 2e-4)
    U = np.asarray(st["U"])
    # rebound: both reversed
    assert U[0, 0] < 0.0 and U[1, 0] > 0.0
    # momentum conserved exactly (equal/opposite pair forces)
    np.testing.assert_allclose(m * U[0, 0] + m * U[1, 0], p_before, atol=1e-12)
    # dashpot dissipates: restitution < 1
    e = abs(U[0, 0]) / 1.0
    assert 0.2 < e < 1.0
    # dead parcels untouched
    np.testing.assert_allclose(U[2:], 0.0, atol=0.0)


def test_higher_alpha_dissipates_more():
    rs = []
    for alpha in (0.05, 0.6):
        pc = _model(alpha=alpha)
        st = _two_ball_state(U0=1.0)
        cst = pc.init_state(4, jnp.float64)
        for _ in range(12):
            st, cst = pc.collide(st, cst, 1000.0, 2e-4)
        rs.append(abs(float(st["U"][0, 0])))
    assert rs[1] < rs[0]  # stronger dashpot → lower restitution


def test_oblique_collision_friction_torque():
    """Offset impact: tangential slider spins the balls up and the
    tangential impulse obeys the Coulomb cap."""
    pc = _model(mu=0.5)
    st = _two_ball_state(U0=1.0, offset=1.2e-3)
    cst = pc.init_state(4, jnp.float64)
    for _ in range(12):
        st, cst = pc.collide(st, cst, 1000.0, 2e-4)
    om = np.asarray(cst["omega"])
    assert np.abs(om[0]).max() > 0.0  # friction produced spin
    # spin is about z (impact plane x-y)
    assert abs(om[0, 2]) > 10.0 * max(abs(om[0, 0]), abs(om[0, 1]))


def test_wall_bounce():
    class _WallGeom:
        class _P:
            ptype = "wall"
            slice = slice(0, 4)

        patches = [_P()]
        # 4 boundary faces of a floor at y=0, outward normal -y
        b_Sf = np.tile(np.asarray([[0.0, -1.0, 0.0]]), (4, 1)) * 0.25
        b_Cf = np.asarray(
            [[0.25, 0.0, 0.25], [0.75, 0.0, 0.25],
             [0.25, 0.0, 0.75], [0.75, 0.0, 0.75]]
        )

    pc = _model(geom=_WallGeom())
    assert pc.wall_point.shape[0] == 1
    np.testing.assert_allclose(pc.wall_normal[0], [0.0, 1.0, 0.0], atol=1e-12)
    cap = 2
    st = {
        "x": jnp.asarray([[0.5, 1.1e-3, 0.5], [5.0, 5.0, 5.0]]),
        "U": jnp.asarray([[0.0, -0.5, 0.0], [0.0, 0.0, 0.0]]),
        "d": jnp.full((cap,), 2e-3),
        "nP": jnp.ones((cap,)),
        "alive": jnp.asarray([True, False]),
    }
    cst = pc.init_state(cap, jnp.float64)
    for _ in range(20):
        st, cst = pc.collide(st, cst, 1000.0, 2e-4)
    U = np.asarray(st["U"])
    assert U[0, 1] > 0.0  # bounced back up
    assert abs(U[0, 1]) < 0.5  # with dissipation
