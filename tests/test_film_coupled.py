"""End-to-end film↔solver coupling on a synthetic box fire with a spray:
the cone spray wets the floor film, the film evaporates into the gas
(reference solver loop order fireFoam.C:88-95: parcels → film → gas)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.models.firefoam import FireFoamSolver
from firefoam_tpu.utils.synthcase import write_box_fire_case


@pytest.fixture(scope="module")
def film_case(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("filmcase") / "box")
    case = write_box_fire_case(root, n=(6, 6, 6), end_time=0.1, dt=0.005)

    # film over the 'base' wall patch
    with open(f"{case}/constant/surfaceFilmProperties", "w") as f:
        f.write(
            """FoamFile { version 2.0; format ascii; class dictionary; object surfaceFilmProperties; }
active true;
surfaceFilmModel thermoSingleLayer;
regionName filmRegion;
thermoSingleLayerCoeffs
{
    filmThermoModel liquid;
    liquid H2O;
    deltaWet 0.0002;
    Tmin 200; Tmax 500;
    laminarCoeffs { Cf 0.005; }
}
"""
        )
    with open(f"{case}/system/extrudeToRegionMeshDictFilm", "w") as f:
        f.write(
            """FoamFile { version 2.0; format ascii; class dictionary; object extrudeToRegionMeshDict; }
region filmRegion;
faceZones ( base );
oneD false;
extrudeModel linearNormal;
nLayers 1;
adaptMesh false;
linearNormalCoeffs { thickness 0.001; }
"""
        )
    with open(f"{case}/mesh.sh", "w") as f:
        f.write("blockMesh\nextrudeToRegionMesh -dict system/extrudeToRegionMeshDictFilm\n")

    # downward spray cloud onto the floor
    with open(f"{case}/constant/reactingCloud1Properties", "w") as f:
        f.write(
            """FoamFile { version 2.0; format ascii; class dictionary; object reactingCloud1Properties; }
solution
{
    active true; coupled true; transient yes;
    sourceTerms { schemes { rho explicit 1; U explicit 1; Yi explicit 1; h explicit 1; } }
}
constantProperties
{
    rho0 1000; T0 300; Cp0 4187; TMin 200; Tvap 273; Tbp 373; Pr 0.7;
    epsilon0 1; f0 0.5; minParticleMass 1e-15;
}
subModels
{
    particleForces { sphereDrag; gravity; }
    injectionModels
    {
        spray1
        {
            type coneInjection;
            SOI 0.0; duration 100.0;
            positionAxis ( (( 0.5 0.9 0.5 ) ( 0 -1 0 )) );
            massTotal 10.0;
            parcelsPerSecond 3000;
            parcelBasisType mass;
            flowRateProfile constant 0.1;
            Umag constant 5.0;
            thetaInner constant 0;
            thetaOuter constant 20;
            sizeDistribution
            { type uniform; uniformDistribution { minValue 0.0009; maxValue 0.0011; } }
        }
    }
    patchInteractionModel standardWallInteraction;
    heatTransferModel RanzMarshall;
    compositionModel singlePhaseMixture;
    phaseChangeModel liquidEvaporationBoil;
    surfaceFilmModel thermoSurfaceFilm;
    standardWallInteractionCoeffs { type escape; }
    RanzMarshallCoeffs { BirdCorrection true; }
    singlePhaseMixtureCoeffs { phases ( liquid { H2O 1; } ); }
    thermoSurfaceFilmCoeffs
    { interactionType splashBai; deltaWet 0.0002; Adry 2630; Awet 1320; }
}
"""
        )
    return case


def test_spray_wets_film(film_case):
    solver = FireFoamSolver(film_case, radiation=False)
    assert solver.film is not None and solver.cloud is not None
    assert solver.film.fm.n_faces == 36  # 6×6 base faces
    state = solver.initial_state()
    step = solver.make_step()
    film_mass = 0.0
    for i in range(40):
        state, log = step(state)
        film_mass = float(log["film_mass"])
    # spray reached the floor and built a film
    assert int(log["cloud_nParcels"]) > 0
    assert film_mass > 0.0
    assert float(state["film"]["delta"].max()) > 0.0
    # gas stays physical
    Y = np.asarray(state["Y"].i)
    assert Y.min() >= 0.0 and Y.max() <= 1.0 + 1e-10
    assert np.all(np.isfinite(np.asarray(state["U"].i)))
    # H2O appears in the gas once the film/droplets evaporate (burner heats)
    # — at least the coupling ran without NaNs; evaporation grows with T
    assert float(state["film"]["T"].max()) < 500.1
