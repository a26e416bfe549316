"""Example scripts stay runnable (tiny configs, subprocess smoke runs)."""

import os
import pathlib
import subprocess
import sys

import pytest

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
        "example_weak.py",
        "example_elasticity.py",
        "example_poisson_3d.py",
        "example_vpinn_3d.py",
        "example_heat.py",
        "example_elasticity_3d.py",
        "example_stokes.py",
        "example_adaptive.py",
        "example_adaptive_3d.py",
        "example_adaptive_dfn.py",
        "example_mixed_bc.py",
        "example_nonlinear.py",
        "example_nonlinear_heat.py",
        "example_nonlinear_dfn.py",
        "example_eigenmodes.py",
        "example_weak_convergence.py",
        "example_jump.py",
        "example_loss_is_error.py",
        "example_weak_plus_posterri.py",
        "example_int_weak_plus_posterri.py",
        "example_exponetial.py",
        "example_patches.py",
        "example_fractures_fem.py",
        "example_seven_fractures_vpinn.py",
        "example_seven_fractures_fem.py",
    ],
)
def test_example_runs(name):
    out = run_example(name, {})
    assert "error" in out.lower() or "loss" in out.lower() or "dofs" in out.lower()


def test_fracture_vpinn_and_convergence_pipeline():
    env = {"FEM_LEVELS": "2", "FEM_EPOCHS": "3", "FEM_H": "0.5"}
    run_example("example_fracture_vpinns.py", env)
    # convergence pair + comparison (pickles written into examples/)
    run_example("example_fractures_fem_convergence.py", env)
    run_example("example_fractures_nn_convergence.py", env)
    out = run_example("compare_convergence.py", env)
    assert "decay rate" in out
