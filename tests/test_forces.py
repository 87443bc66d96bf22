"""Particle force family (lagrangian/forces.py) vs hand-evaluated reference
formulas (packages/lagrangian/intermediateNew/submodels/Kinematic/
ParticleForces)."""

import numpy as np
import jax.numpy as jnp
import pytest

from firefoam_tpu.io.foamdict import parse_string
from firefoam_tpu.lagrangian.forces import ParticleForces, _sphere_cdre


def _forces(body: str) -> ParticleForces:
    d = parse_string("particleForces\n{\n%s\n}\n" % body)
    return ParticleForces.from_dict(d.get_dict("particleForces"))


def test_parse_default_sphere_gravity():
    f = _forces("sphereDrag;\ngravity;")
    assert f.drag_model == "sphereDrag"
    assert f.gravity and f.lift_model is None and not f.virtual_mass


def test_sphere_cdre_branches():
    # SphereDragForce.C: 24(1+Re^{2/3}/6) below Re=1000, 0.424·Re above
    assert float(_sphere_cdre(jnp.asarray(1.0))) == pytest.approx(24.0 * (1 + 1 / 6))
    assert float(_sphere_cdre(jnp.asarray(2000.0))) == pytest.approx(0.424 * 2000)


def test_nonsphere_drag_haider_levenspiel():
    f = _forces("nonSphereDrag\n{\n    phi 0.8;\n}")
    phi = 0.8
    a = np.exp(2.3288 - 6.4581 * phi + 2.4486 * phi**2)
    b = 0.0964 + 0.5565 * phi
    c = np.exp(4.9050 - 13.8944 * phi + 18.4222 * phi**2 - 10.2599 * phi**3)
    dd = np.exp(1.4681 + 12.2584 * phi - 20.7322 * phi**2 + 15.8855 * phi**3)
    Re, mu, rho_p, dp, m = 50.0, 1.8e-5, 1000.0, 1e-3, 5e-7
    cdre = 24.0 * (1.0 + a * Re**b) + Re * c / (1.0 + dd / Re)
    want = m * 0.75 * mu * cdre / (rho_p * dp**2)
    got = float(f.drag_sp(jnp.asarray(Re), mu, rho_p, dp, m))
    assert got == pytest.approx(want, rel=1e-10)


def test_wenyu_drag_alpha_correction():
    f = _forces("WenYuDrag\n{\n    alphac alpha;\n}")
    Re, mu, rho_p, dp, m, ac = 10.0, 1.8e-5, 1000.0, 1e-3, 5e-7, 0.9
    cdre = 24.0 * (1.0 + 0.15 * (ac * Re) ** 0.687)
    want = m * 0.75 * mu * cdre * ac ** (-2.65) / (rho_p * ac * dp**2)
    got = float(
        f.drag_sp(jnp.asarray(Re), mu, rho_p, dp, m, alpha_c=jnp.asarray(ac))
    )
    assert got == pytest.approx(want, rel=1e-10)


def test_ergun_wenyu_branches():
    f = _forces("ErgunWenYuDrag\n{\n    alphac alpha;\n}")
    Re, mu, rho_p, dp, m = 10.0, 1.8e-5, 1000.0, 1e-3, 5e-7
    # dense branch (alpha_c < 0.8): Ergun
    ac = 0.5
    want = m * (150.0 * (1 - ac) / ac + 1.75 * Re) * mu / (ac * rho_p * dp**2)
    got = float(f.drag_sp(jnp.asarray(Re), mu, rho_p, dp, m, alpha_c=jnp.asarray(ac)))
    assert got == pytest.approx(want, rel=1e-10)
    # dilute branch: WenYu
    ac = 0.95
    cdre = 24.0 * (1.0 + 0.15 * (ac * Re) ** 0.687)
    want = m * 0.75 * mu * cdre * ac ** (-2.65) / (rho_p * ac * dp**2)
    got = float(f.drag_sp(jnp.asarray(Re), mu, rho_p, dp, m, alpha_c=jnp.asarray(ac)))
    assert got == pytest.approx(want, rel=1e-10)


def test_distorted_sphere_y_clamp():
    f = _forces("distortedSphereDrag;")
    Re, mu, rho_p, dp, m = 50.0, 1.8e-5, 1000.0, 1e-3, 5e-7
    base = m * 0.75 * mu * float(_sphere_cdre(jnp.asarray(Re))) / (rho_p * dp**2)
    # y clamped to [0,1]; y=2 behaves as disk y=1 (1+2.632)
    got = float(f.drag_sp(jnp.asarray(Re), mu, rho_p, dp, m, y=jnp.asarray(2.0)))
    assert got == pytest.approx(base * 3.632, rel=1e-10)


def test_saffman_mei_lift_direction_and_magnitude():
    f = _forces("SaffmanMeiLift;")
    # shear flow: curl Uc = (0,0,w); relative velocity along x → lift along y
    N = 1
    U_p = jnp.zeros((N, 3))
    U_c = jnp.asarray([[1.0, 0.0, 0.0]])
    curl = jnp.asarray([[0.0, 0.0, 2.0]])
    Re, mu, rho_c, rho_p, d, m = (
        jnp.asarray([10.0]), jnp.asarray([1.8e-5]), jnp.asarray([1.2]),
        1000.0, jnp.asarray([1e-3]), jnp.asarray([5e-7]),
    )
    su = np.asarray(f.lift_su(U_p, U_c, curl, Re, mu, rho_c, rho_p, d, m))
    # (Uc-Up) x curl = (1,0,0)x(0,0,2) = (0,-2,0): lift along -y, Cl > 0
    assert su[0, 0] == 0.0 and su[0, 2] == 0.0
    assert su[0, 1] < 0.0
    # magnitude per LiftForce.C: m/rho_p * rho_c * Cl * |(Uc-Up) x curlUc|
    Rew = 1.2 * 2.0 * (1e-3) ** 2 / 1.8e-5
    beta = 0.5 * Rew / 10.0
    alpha = 0.3314 * np.sqrt(beta)
    ffac = (1 - alpha) * np.exp(-0.1 * 10.0) + alpha
    Cl = 3.0 / (2 * np.pi * np.sqrt(Rew)) * 6.46 * ffac
    want = 5e-7 / 1000.0 * 1.2 * Cl * 2.0
    assert abs(su[0, 1]) == pytest.approx(want, rel=1e-6)


def test_pressure_gradient_and_virtual_mass():
    f = _forces("pressureGradient\n{\n    U U;\n}\nvirtualMass\n{\n    Cvm 0.5;\n}")
    assert f.pressure_gradient and f.virtual_mass and f.Cvm == 0.5
    DUDt = jnp.asarray([[2.0, 0.0, 0.0]])
    m, rho_c, rho_p = jnp.asarray([1e-6]), jnp.asarray([1.2]), 1000.0
    su = np.asarray(f.pgrad_su(DUDt, rho_c, rho_p, m))
    # PressureGradientForce + Cvm x same: (1 + 0.5)·m·rho_c/rho_p·DUDt
    assert su[0, 0] == pytest.approx(1.5 * 1e-6 * 1.2 / 1000.0 * 2.0, rel=1e-12)
    madd = float(f.mass_add(m, rho_c, rho_p)[0])
    assert madd == pytest.approx(1e-6 * 1.2 / 1000.0 * 0.5, rel=1e-12)


def test_tomiyama_lift_eo_branches():
    f = _forces("TomiyamaLift\n{\n    sigma 0.07;\n}")
    assert f.lift_params["sigma"] == pytest.approx(0.07)
    N = 1
    U_p = jnp.zeros((N, 3))
    U_c = jnp.asarray([[1.0, 0.0, 0.0]])
    curl = jnp.asarray([[0.0, 0.0, 1.0]])
    args = (jnp.asarray([10.0]), jnp.asarray([1.8e-5]), jnp.asarray([1.2]))
    # small bubble: Eod<=4 branch gives Cl>0; big: Eod>10 gives Cl=-0.27
    su_small = np.asarray(f.lift_su(U_p, U_c, curl, *args, 1000.0,
                                    jnp.asarray([1e-4]), jnp.asarray([5e-7]),
                                    g=np.asarray([0.0, -9.81, 0.0])))
    su_big = np.asarray(f.lift_su(U_p, U_c, curl, *args, 1000.0,
                                  jnp.asarray([3e-2]), jnp.asarray([5e-7]),
                                  g=np.asarray([0.0, -9.81, 0.0])))
    assert np.sign(su_small[0, 1]) != np.sign(su_big[0, 1])


def test_inert_models_accepted():
    f = _forces("sphereDrag;\ngravity;\nparamagnetic\n{\n    magneticSusceptibility 1e-5;\n}\nSRF;")
    assert "paramagnetic" in f.inert and "SRF" in f.inert
    assert f.drag_model == "sphereDrag"


def test_srf_centrifugal_coriolis():
    """SRFForce.C:calcNonCoupled — Su = m(1−ρc/ρp)(2(U×ω) + ω×(r×ω))."""
    f = _forces("SRF\n{\n    omega (0 0 2.0);\n    origin (0 0 0);\n}")
    assert f.srf is not None
    x = jnp.asarray([[1.0, 0.0, 0.0]])
    U = jnp.zeros((1, 3))
    m = jnp.asarray([2.0])
    su = np.asarray(f.body_su(x, U, m, jnp.asarray([1.0]), jnp.asarray([1000.0])))
    # centrifugal: ω×(r×ω) = ω²·r_perp = 4·x̂, buoyancy factor (1−1e-3)
    np.testing.assert_allclose(su[0], [2.0 * (1 - 1e-3) * 4.0, 0.0, 0.0],
                               rtol=1e-12)
    # Coriolis: U = +ŷ, 2(U×ω) = 2·(ŷ×2ẑ) = 4x̂
    su2 = np.asarray(
        f.body_su(x, jnp.asarray([[0.0, 1.0, 0.0]]), m,
                  jnp.asarray([1.0]), jnp.asarray([1000.0]))
    )
    np.testing.assert_allclose(
        su2[0, 0], 2.0 * (1 - 1e-3) * (4.0 + 4.0), rtol=1e-12
    )


def test_non_inertial_frame_linear_acceleration():
    """NonInertialFrameForce.C — Su = m(−W + r×ω̇ + 2(U×ω) + ω×(r×ω))."""
    f = _forces(
        "nonInertialFrame\n{\n    linearAcceleration (0 5 0);\n"
        "    angularVelocity (0 0 0);\n    angularAcceleration (0 0 0);\n"
        "    centreOfRotation (0 0 0);\n}"
    )
    assert f.nif is not None
    su = np.asarray(
        f.body_su(jnp.zeros((1, 3)), jnp.zeros((1, 3)), jnp.asarray([3.0]),
                  jnp.asarray([1.0]), jnp.asarray([1000.0]))
    )
    np.testing.assert_allclose(su[0], [0.0, -15.0, 0.0], rtol=1e-12)


def test_paramagnetic_force():
    """ParamagneticForce.C — Su = m·3μ0/ρp·χ/(χ+3)·(H·∇H)."""
    chi = 1e-5
    f = _forces(
        "paramagnetic\n{\n    magneticSusceptibility %g;\n}" % chi
    )
    assert f.para is not None and f.para["chi"] == pytest.approx(chi)
    hdgh = jnp.asarray([[1e8, 0.0, 0.0]])
    m = jnp.asarray([2.0])
    su = np.asarray(
        f.body_su(jnp.zeros((1, 3)), jnp.zeros((1, 3)), m,
                  jnp.asarray([1.0]), jnp.asarray([500.0]), hdgh)
    )
    mu0 = 4e-7 * np.pi
    expect = 2.0 * 3.0 * mu0 / 500.0 * chi / (chi + 3.0) * 1e8
    np.testing.assert_allclose(su[0], [expect, 0.0, 0.0], rtol=1e-12)
