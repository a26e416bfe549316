"""Fully row-sharded BSR solve (parallel.sharded_bsr).

Doctrine: cross-implementation consistency vs the single-device compiled
solver (same aggblock policy -> iteration parity), plus the multi-chip
scaling invariant the round-2 path lacked — per-device memory for every
O(n) table is n/n_shards (+ cell halo), asserted on the plan itself.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.parallel import (
    get_bsr_shard_plan,
    make_device_mesh,
    sharded_bsr_solver,
    solve_pcg_sharded_bsr,
)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_device_mesh(8)


def a_form(b):
    return b.v_grad @ jnp.matrix_transpose(b.v_grad)


def l_form(b):
    x = b.integration_points[..., 0:1]
    y = b.integration_points[..., 1:2]
    return 2 * math.pi**2 * jnp.sin(math.pi * x) * jnp.sin(math.pi * y) * b.v


def test_sharded_solver_matches_compiled_at_1e5_dofs(eight_devices):
    """>=1e5 DOFs through the one-jit sharded assemble+solve: iteration
    parity with the single-device compiled_bsr_solver (same aggregate
    policy) and machine-precision solution agreement."""
    mesh = fem.MeshTri(fem.rectangle(320, 320))
    V = fem.Basis(mesh, fem.ElementTri(1, 3))
    assert V.n_dofs >= 100_000

    u1, info1 = V.compiled_solver(a_form, l_form, tol=1e-8)()
    u8, (it, res, conv) = sharded_bsr_solver(
        V, a_form, l_form, device_mesh=eight_devices, tol=1e-8
    )()
    assert bool(conv)
    assert int(it) == int(info1.iterations)
    np.testing.assert_allclose(
        np.asarray(u8), np.asarray(u1), atol=1e-9 * float(jnp.abs(u1).max())
    )


def test_shard_plan_memory_is_proportional(eight_devices):
    """Every O(n) per-device table scales with n/n_shards: values, smoother
    blocks, coarse rows, halo cells. This is the invariant the round-2
    replicated-preconditioner path violated."""
    mesh = fem.MeshTri(fem.rectangle(320, 320))
    V = fem.Basis(mesh, fem.ElementTri(1, 3))
    plan = get_bsr_shard_plan(V, 8)
    st = plan.st

    # per-device value slice vs the single-device total (tier padding and
    # shard alignment allow a modest constant factor)
    assert plan.n_values_local <= 1.35 * st.n_values / 8 + 64 * 64
    # smoother blocks: exactly 1/8 of the padded system
    assert plan.ns_local == (plan.nb_pad * st.block // plan.gs) // 8
    # coarse-inverse rows: exactly 1/8 of the coarse level
    assert plan.nc_local == plan.nc // 8
    # halo-duplicated cells: boundary/volume overhead, bounded well below 2x
    assert plan.T_max * 8 <= 1.5 * mesh.n_cells
    # every block row is owned by exactly one shard
    assert plan.rps * 8 == plan.nb_pad


def test_sharded_solver_on_dfn(eight_devices):
    """The fracture-network path (trace rows spill to tier 2) through the
    sharded solver: hybrid tiering must partition the heavy rows by owner
    and still agree with the single-device answer."""
    from pytorch_fem_solver_tpu.utils import build_benchmark_network

    mesh = build_benchmark_network(h=0.3)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))

    u1, info1 = V.compiled_solver(a_form, lambda b: b.v, tol=1e-10)()
    plan = get_bsr_shard_plan(V, 8)
    assert plan.st.heavy_rows.shape[0] > 0 or plan.nh_max == 0

    u8, (it, res, conv) = sharded_bsr_solver(
        V, a_form, lambda b: b.v, device_mesh=eight_devices, tol=1e-10
    )()
    assert bool(conv)
    assert abs(int(it) - int(info1.iterations)) <= 2
    np.testing.assert_allclose(
        np.asarray(u8), np.asarray(u1),
        atol=1e-8 * max(float(jnp.abs(u1).max()), 1e-30),
    )


def test_legacy_entrypoint_on_new_core(eight_devices):
    """solve_pcg_sharded_bsr (precomputed local matrices) rides the same
    sharded core; two_level matches the single-device iterative solve and
    jacobi still converges."""
    mesh = fem.MeshTri(fem.unit_square(max_area=0.5**13))
    V = fem.Basis(mesh, fem.ElementTri(1, 3))
    local = V.integrate_bilinear_form_local(a_form)

    # NOT the sin*sin load: on the structured unit_square mesh that rhs is
    # an exact discrete eigenvector and Jacobi-CG (scaled identity on a
    # uniform grid) converges in 2 iterations, which would invert the
    # two_level-beats-jacobi assertion below
    def generic_load(b_):
        x = b_.integration_points[..., 0:1]
        y = b_.integration_points[..., 1:2]
        return (x * x + jnp.exp(y)) * b_.v

    b = V.integrate_linear_form(generic_load)

    u_ref = V.solve_iterative(local, b, tol=1e-12)
    u, info = solve_pcg_sharded_bsr(
        V, local, b, eight_devices, tol=1e-12, return_info=True
    )
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-10)

    u_j, info_j = solve_pcg_sharded_bsr(
        V, local, b, eight_devices, tol=1e-10, precondition="jacobi",
        return_info=True,
    )
    assert bool(info_j.converged)
    np.testing.assert_allclose(np.asarray(u_j), np.asarray(u_ref), atol=1e-8)
    # the strong preconditioner must actually help
    assert int(info.iterations) < int(info_j.iterations)
