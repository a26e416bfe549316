"""Mixed (two-space) assembly + Taylor-Hood Stokes (beyond the reference).

Validates integrate_mixed_bilinear_form against a NumPy per-element loop
oracle, checks the discrete div-compatibility identity B 1_u-components,
and pins the manufactured Stokes convergence rates (P2-P1: O(h^3)
velocity, O(h^2) pressure).
"""

import math
import subprocess
import sys
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem


def div_form(test_p, trial_u):
    div = jnp.trace(trial_u.v_grad, axis1=-2, axis2=-1)
    q_vals = test_p.v[..., 0]
    return -(q_vals[..., :, None] * div[..., None, :])


def test_mixed_form_matches_numpy_oracle():
    """B[q, u] = -∫ q div u vs an independent per-element P1xP1 loop."""
    mesh = fem.MeshTri(fem.unit_square(n=3))
    Vp = fem.Basis(mesh, fem.ElementTri(1, 2))
    Vu = fem.VectorBasis(mesh, fem.ElementTri(1, 2))
    B = np.asarray(Vp.integrate_mixed_bilinear_form(Vu, div_form))

    verts = np.asarray(mesh["vertices", "coordinates"])
    tris = np.asarray(mesh["cells", "vertices"])
    n = len(verts)
    B_ref = np.zeros((n, 2 * n))
    gref = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
    for tri in tris:
        p = verts[tri]
        J = np.stack([p[1] - p[0], p[2] - p[0]], axis=1)
        area = abs(np.linalg.det(J)) / 2
        g = gref @ np.linalg.inv(J)  # (3, 2)
        # -∫ q_i div(phi_j e_c): q integrates to area/3 per vertex; div of
        # (phi_j e_c) is g[j, c] (constant)
        for i in range(3):
            for j in range(3):
                for c in range(2):
                    B_ref[tri[i], 2 * tri[j] + c] -= area / 3 * g[j, c]
    np.testing.assert_allclose(B, B_ref, atol=1e-13)


def test_mixed_form_validation():
    mesh = fem.MeshTri(fem.unit_square(n=2))
    mesh2 = fem.MeshTri(fem.unit_square(n=3))
    Vp = fem.Basis(mesh, fem.ElementTri(1, 2))
    with pytest.raises(ValueError, match="same mesh"):
        Vp.integrate_mixed_bilinear_form(
            fem.VectorBasis(mesh2, fem.ElementTri(1, 2)), div_form
        )
    with pytest.raises(ValueError, match="integration orders"):
        Vp.integrate_mixed_bilinear_form(
            fem.VectorBasis(mesh, fem.ElementTri(1, 4)), div_form
        )


def test_stokes_taylor_hood_convergence():
    """Drive the Stokes example; the printed rates must hit TH theory."""
    examples = pathlib.Path(__file__).resolve().parent.parent / "examples"
    out = subprocess.run(
        [sys.executable, "example_stokes.py"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(examples),
        env={
            **__import__("os").environ,
            "JAX_PLATFORMS": "cpu",
            "JAX_PLATFORM_NAME": "cpu",
            "FEM_LEVELS": "3",
        },
    )
    assert out.returncode == 0, out.stderr[-2000:]
    last = [l for l in out.stdout.splitlines() if "rates" in l][-1]
    u_rate = float(last.split("rates u")[1].split()[0])
    p_rate = float(last.split(" p ")[-1])
    assert u_rate > 2.7, last
    assert p_rate > 1.7, last
