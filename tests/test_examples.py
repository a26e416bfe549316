"""Example scripts stay runnable (tiny configs, subprocess smoke runs).

The 29 subprocess runs dominate the suite's wall clock (~7 of ~15 min), so
the default run covers one example per code-path family (VPINN training,
3D vector elasticity, mixed/Stokes, adaptive DFN, Newton, eigen, FEM
convergence pipeline, the benchmark geometry); set FEM_TEST_ALL_EXAMPLES=1
to smoke-run every script (CI-nightly / pre-release mode). Per-path
coverage is NOT lost in the default run: every solver/basis family the
remaining examples exercise has dedicated unit tests.
"""

import os
import pathlib
import subprocess
import sys

import pytest

ALL_EXAMPLES = bool(int(os.environ.get("FEM_TEST_ALL_EXAMPLES", "0")))

# one per code-path family; always run
CORE_EXAMPLES = {
    "example_weak.py",            # VPINN training core
    "example_elasticity_3d.py",   # VectorBasis + 3D tet tier + RBM solve
    "example_stokes.py",          # mixed two-space assembly + saddle solve
    "example_adaptive_dfn.py",    # adaptive refinement + fracture network
    "example_nonlinear.py",       # Newton tier
    "example_eigenmodes.py",      # eigen tier
    "example_weak_convergence.py",# FEM convergence pipeline + pslg meshing
    "example_seven_fractures_fem.py",  # the benchmark geometry end-to-end
}

full_only = pytest.mark.skipif(
    not ALL_EXAMPLES,
    reason="representative example subset (FEM_TEST_ALL_EXAMPLES=1 for all)",
)


def _param(name):
    return name if name in CORE_EXAMPLES else pytest.param(name, marks=full_only)

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def run_example(name, env_extra, timeout=600):
    env = dict(os.environ)
    env.update(
        {
            "JAX_PLATFORMS": "cpu",
            "JAX_PLATFORM_NAME": "cpu",
            "FEM_EPOCHS": "3",
            "FEM_REFINEMENTS": "2",
            "FEM_LEVELS": "2",
            "FEM_H": "0.5",
            "FEM_STEPS": "4",
        }
    )
    env.update(env_extra)
    result = subprocess.run(
        [sys.executable, str(EXAMPLES / name)],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=str(EXAMPLES),
        env=env,
    )
    assert result.returncode == 0, (
        f"{name} failed\nstdout:\n{result.stdout[-2000:]}\n"
        f"stderr:\n{result.stderr[-2000:]}"
    )
    return result.stdout


@pytest.mark.parametrize(
    "name",
    [
        _param("example_weak.py"),
        _param("example_elasticity.py"),
        _param("example_poisson_3d.py"),
        _param("example_vpinn_3d.py"),
        _param("example_heat.py"),
        _param("example_wave.py"),
        _param("example_elasticity_3d.py"),
        _param("example_stokes.py"),
        _param("example_adaptive.py"),
        _param("example_adaptive_3d.py"),
        _param("example_adaptive_dfn.py"),
        _param("example_mixed_bc.py"),
        _param("example_nonlinear.py"),
        _param("example_nonlinear_heat.py"),
        _param("example_nonlinear_dfn.py"),
        _param("example_eigenmodes.py"),
        _param("example_weak_convergence.py"),
        _param("example_jump.py"),
        _param("example_loss_is_error.py"),
        _param("example_weak_plus_posterri.py"),
        _param("example_int_weak_plus_posterri.py"),
        _param("example_exponetial.py"),
        _param("example_patches.py"),
        _param("example_fractures_fem.py"),
        _param("example_seven_fractures_vpinn.py"),
        _param("example_seven_fractures_fem.py"),
        _param("example_refined_precision.py"),
    ],
)
def test_example_runs(name):
    out = run_example(name, {})
    assert "error" in out.lower() or "loss" in out.lower() or "dofs" in out.lower()


@full_only
def test_fracture_vpinn_and_convergence_pipeline():
    env = {"FEM_LEVELS": "2", "FEM_EPOCHS": "3", "FEM_H": "0.5"}
    run_example("example_fracture_vpinns.py", env)
    # convergence pair + comparison (pickles written into examples/)
    run_example("example_fractures_fem_convergence.py", env)
    run_example("example_fractures_nn_convergence.py", env)
    out = run_example("compare_convergence.py", env)
    assert "decay rate" in out
