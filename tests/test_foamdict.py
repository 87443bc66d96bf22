"""Tests for the OpenFOAM dictionary parser against real reference case files."""

import os

import numpy as np
import pytest

from firefoam_tpu.io import Case, parse_file, parse_string, read_field_file
from firefoam_tpu.io.foamdict import Dimensions, String

from conftest import reference_case


def test_basic_entries():
    d = parse_string(
        """
        application fireFoam;
        endTime 2;
        deltaT 5e-02;
        adjustTimeStep yes;
        maxCo 0.9;
        g (0 -9.81 0);
        """
    )
    assert d.get_word("application") == "fireFoam"
    assert d.get_scalar("endTime") == 2.0
    assert d.get_scalar("deltaT") == 0.05
    assert d.get_bool("adjustTimeStep") is True
    assert d.get_vector("g") == (0.0, -9.81, 0.0)


def test_comments_and_nesting():
    d = parse_string(
        """
        /* block comment { ( */
        outer
        {
            inner { a 1; } // line comment ;
            b (1 2 (3 4));
        }
        """
    )
    assert d.get_dict("outer").get_dict("inner").get_scalar("a") == 1
    assert d.get_dict("outer")["b"] == [1, 2, [3, 4]]


def test_word_with_parens_and_templates():
    d = parse_string(
        """
        div(phi,U)      Gauss LUST grad(U);
        div(((rho*nuEff)*dev2(T(grad(U))))) Gauss linear;
        combustionModel  eddyDissipationModel<psiThermoCombustion,gasHThermoPhysics>;
        """
    )
    assert d["div(phi,U)"] == ["Gauss", "LUST", "grad(U)"]
    assert d["div(((rho*nuEff)*dev2(T(grad(U)))))"] == ["Gauss", "linear"]
    assert (
        d.get_word("combustionModel")
        == "eddyDissipationModel<psiThermoCombustion,gasHThermoPhysics>"
    )


def test_regex_keys_and_macro():
    d = parse_string(
        """
        solvers
        {
            "rho.*" { solver PCG; tolerance 1e-6; }
            p_rgh   { solver PCG; relTol 0.01; }
            p_rghFinal { $p_rgh; relTol 0.0; }
            "U.*"   { solver smoothSolver; maxIter 10; }
            "(Yi|h|k).*" { $U; tolerance 1e-8; }
        }
        """
    )
    sol = d.get_dict("solvers")
    assert sol.lookup("rho").get_word("solver") == "PCG"
    assert sol.lookup("rhoFinal").get_scalar("tolerance") == 1e-6
    final = sol.lookup("p_rghFinal")
    assert final.get_word("solver") == "PCG"
    assert final.get_scalar("relTol") == 0.0
    assert sol.lookup("p_rgh").get_scalar("relTol") == 0.01
    yk = sol.lookup("h")
    assert yk.get_word("solver") == "smoothSolver"
    assert yk.get_scalar("tolerance") == 1e-8
    assert yk.get_int("maxIter") == 10


def test_dimensions_and_dimensioned_scalar():
    d = parse_string(
        """
        dimensions [0 2 -2 0 0 0 0];
        nu nu [0 2 -1 0 0 0 0] 1.5e-05;
        a  [ 0 -1 0 0 0 0 0 ] 0.01;
        """
    )
    assert d["dimensions"] == Dimensions((0, 2, -2, 0, 0, 0, 0))
    assert d.get_scalar("nu") == 1.5e-05
    assert d.get_scalar("a") == 0.01


def test_table_entry():
    d = parse_string(
        """
        massFlowRate    table
        3
        (
            (0 0.03)
            (60 0.03)
            (100 0.03)
        );
        """
    )
    v = d["massFlowRate"]
    assert v[0] == "table"
    assert v[-1] == [[0, 0.03], [60, 0.03], [100, 0.03]]


def test_steckler_control_dict():
    case = reference_case("steckler")
    cd = parse_file(os.path.join(case, "system", "controlDict"), case_dir=case)
    assert cd.get_word("application") == "fireFoam"
    assert cd.get_scalar("endTime") == 2
    assert cd.get_scalar("maxCo") == 0.9
    assert cd.get_bool("runTimeModifiable") is True
    fns = cd.get_dict("functions")
    assert fns.get_dict("HRR").get_word("operation") == "volIntegrate"
    assert fns.get_dict("fieldMinMax").get_list("fields") == ["T", "Qdot", "qrflamelet"]


def test_steckler_fv_schemes_and_solution():
    case = reference_case("steckler")
    fs = parse_file(os.path.join(case, "system", "fvSchemes"), case_dir=case)
    div = fs.get_dict("divSchemes")
    assert div["div(phi,U)"] == ["Gauss", "LUST", "grad(U)"]
    mv = div["div(phi,Yi_h)"]
    # multivariateSelection sub-dictionary
    assert mv[0] == "Gauss"
    assert mv[1] == "multivariateSelection"
    assert mv[2]["O2"] == ["limitedLinear01", 1]

    sol = parse_file(os.path.join(case, "system", "fvSolution"), case_dir=case)
    solvers = sol.get_dict("solvers")
    assert solvers.lookup("p_rghFinal").get_scalar("relTol") == 0.0
    assert solvers.lookup("p_rghFinal").get_word("preconditioner") == "DIC"
    assert solvers.lookup("Uz").get_word("smoother") == "symGaussSeidel"
    pimple = sol.get_dict("PIMPLE")
    assert pimple.get_int("nCorrectors") == 2
    assert pimple.get_bool("momentumPredictor") is True


def test_steckler_thermo_and_reactions():
    case = reference_case("steckler")
    tp = parse_file(
        os.path.join(case, "constant", "thermophysicalProperties"), case_dir=case
    )
    tt = tp.get_dict("thermoType")
    assert tt.get_word("mixture") == "singleStepReactingMixture"
    assert tp.get_word("inertSpecie") == "N2"
    rx = parse_file(os.path.join(case, "constant", "reactions"), case_dir=case)
    assert rx.get_list("species") == ["O2", "H2O", "C3H8", "CO2", "N2"]
    r = rx.get_dict("reactions").get_dict("propaneReaction")
    assert isinstance(r.lookup("reaction"), String)
    assert "C3H8" in str(r.lookup("reaction"))

    th = parse_file(
        os.path.join(case, "constant", "thermo.compressibleGas"), case_dir=case
    )
    o2 = th.get_dict("O2")
    assert o2.get_dict("specie").get_scalar("molWeight") == pytest.approx(31.9988)
    coeffs = o2.get_dict("thermodynamics").get_list("highCpCoeffs")
    assert len(coeffs) == 7
    assert coeffs[0] == pytest.approx(3.69758)


def test_steckler_field_files():
    case = reference_case("steckler")
    T = read_field_file(os.path.join(case, "0", "T"), case_dir=case)
    assert T.foam_class == "volScalarField"
    assert T.internal_uniform and T.internal == pytest.approx(298.15)
    assert T.dimensions == Dimensions((0, 0, 0, 1, 0, 0, 0))
    base = T.boundary.get_dict("base")
    assert base.get_word("type") == "fixedValue"
    arr = T.internal_array(10)
    assert arr.shape == (10,) and np.all(arr == pytest.approx(298.15))

    U = read_field_file(os.path.join(case, "0", "U"), case_dir=case)
    assert U.is_vector
    burner = U.boundary.get_dict("burner")
    assert burner.get_word("type") == "flowRateInletVelocity"
    mfr = burner["massFlowRate"]
    assert mfr[0] == "table" and mfr[-1][0] == [0, 0.03]
    assert U.internal_array(5).shape == (5, 3)


def test_include_directive(tmp_path):
    inc = tmp_path / "inc"
    inc.write_text("included 42;\n")
    main = tmp_path / "main"
    main.write_text('a 1;\n#include "inc"\nb 2;\n')
    d = parse_file(str(main))
    assert d.get_scalar("included") == 42
    assert d.get_scalar("a") == 1 and d.get_scalar("b") == 2


def test_case_wrapper():
    case = Case(reference_case("steckler"))
    assert case.control_dict.get_word("application") == "fireFoam"
    assert case.fv_solution.get_dict("PIMPLE").get_int("nCorrectors") == 2
    assert case.has_field("T")
    f = case.field_or_default("qr_nonexistent", "Ydefault")
    assert f.name == "qr_nonexistent"


def test_field_writer_roundtrip(tmp_path):
    """OpenFOAM-format writer output re-parses through our own reader."""
    import numpy as np
    from firefoam_tpu.io.writer import write_field
    from firefoam_tpu.io.fields import read_field_file
    from firefoam_tpu.ops.geometry import PatchInfo

    patches = (PatchInfo("walls", "wall", 0, 3), PatchInfo("fb", "empty", 3, 2))
    vals = np.linspace(300.0, 400.0, 10)
    bvals = np.arange(5.0) + 300.0
    p = tmp_path / "T"
    write_field(str(p), "T", vals, bvals, patches, "0.5")
    ff = read_field_file(str(p))
    np.testing.assert_allclose(ff.internal_array(10), vals, rtol=1e-7)
    # vector field
    vec = np.stack([vals, vals * 0, -vals], axis=1)
    bvec = np.stack([bvals, bvals, bvals], axis=1)
    pv = tmp_path / "U"
    write_field(str(pv), "U", vec, bvec, patches, "0.5")
    ff = read_field_file(str(pv))
    np.testing.assert_allclose(ff.internal_array(10), vec, rtol=1e-7)
