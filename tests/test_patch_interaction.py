"""PatchInteractionModel family parsing → per-face codes/elasticity
(reference: packages/lagrangian/intermediateNew/submodels/Kinematic/
PatchInteractionModel/{StandardWallInteraction,LocalInteraction,
MultiInteraction,Rebound,NoInteraction})."""

import numpy as np

from firefoam_tpu.io import parse_string
from firefoam_tpu.lagrangian.cloud import ReactingCloud
from firefoam_tpu.lagrangian.tracking import (
    INTERACT_ESCAPE,
    INTERACT_REBOUND,
    INTERACT_STICK,
)
from firefoam_tpu.ops import MeshGeometry

from test_lagrangian import small_mesh


def _codes(body: str):
    mesh = small_mesh()
    geom = MeshGeometry.from_polymesh(mesh)
    sub = parse_string(body)
    b_code, b_e = ReactingCloud._parse_patch_interaction(sub, geom)
    by_patch = {}
    for p in geom.patches:
        by_patch[p.name] = (int(b_code[p.slice][0]), float(b_e[p.slice][0]))
    return by_patch


def test_standard_wall_interaction_escape_with_e():
    c = _codes(
        "patchInteractionModel standardWallInteraction;\n"
        "standardWallInteractionCoeffs { type stick; e 0.7; }"
    )
    # walls get the configured type; open patches escape
    assert c["base"][0] == INTERACT_STICK and c["sides"][0] == INTERACT_STICK
    assert c["base"][1] == 0.7
    assert c["top"][0] == INTERACT_ESCAPE


def test_local_interaction_per_patch():
    c = _codes(
        "patchInteractionModel localInteraction;\n"
        "localInteractionCoeffs { patches {\n"
        "  base  { type rebound; e 0.4; }\n"
        "  sides { type escape; }\n"
        "} }"
    )
    assert c["base"] == (INTERACT_REBOUND, 0.4)
    assert c["sides"][0] == INTERACT_ESCAPE
    # unlisted patches keep the default by patch type
    assert c["top"][0] == INTERACT_ESCAPE


def test_local_interaction_regex_patch():
    c = _codes(
        "patchInteractionModel localInteraction;\n"
        'localInteractionCoeffs { patches { "(base|sides)" { type stick; } } }'
    )
    assert c["base"][0] == INTERACT_STICK and c["sides"][0] == INTERACT_STICK


def test_rebound_everywhere():
    c = _codes("patchInteractionModel rebound;\nreboundCoeffs { e 0.9; }")
    for name in ("top", "base", "sides"):
        assert c[name] == (INTERACT_REBOUND, 0.9)


def test_multi_interaction_first_wins():
    c = _codes(
        "patchInteractionModel multiInteraction;\n"
        "multiInteractionCoeffs {\n"
        "  oneInteractionOnly true;\n"
        "  model1 { patchInteractionModel localInteraction;\n"
        "           localInteractionCoeffs { patches { base { type escape; } } } }\n"
        "  model2 { patchInteractionModel standardWallInteraction;\n"
        "           standardWallInteractionCoeffs { type stick; } }\n"
        "}"
    )
    # model1 claims 'base' (escape); model2 covers remaining walls (stick)
    assert c["base"][0] == INTERACT_ESCAPE
    assert c["sides"][0] == INTERACT_STICK


def test_no_interaction_halts():
    c = _codes("patchInteractionModel none;")
    for name in ("top", "base", "sides"):
        assert c[name][0] == INTERACT_STICK
