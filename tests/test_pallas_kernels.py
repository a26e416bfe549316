"""Pallas element kernels: exact agreement with the generic assembly path."""

import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.ops.pallas_kernels import (
    coords_to_soa,
    p1_local_stiffness_load,
)


def test_p1_kernel_matches_generic_assembly():
    mesh = fem.MeshTri(fem.unit_square(n=7))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    stiff_ref = np.asarray(
        V.integrate_bilinear_form_local(
            lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
        )
    )
    load_ref = np.asarray(V.integrate_linear_form_local(lambda b: b.v))[..., 0]

    coords = mesh["cells", "coordinates"]
    stiff, load, areas = p1_local_stiffness_load(coords, use_pallas=False)
    np.testing.assert_allclose(np.asarray(stiff), stiff_ref, atol=1e-13)
    np.testing.assert_allclose(np.asarray(load), load_ref, atol=1e-15)
    assert abs(float(areas.sum()) - 1.0) < 1e-12

    # pallas path in interpreter mode == fallback bit-for-bit
    stiff_p, load_p, areas_p = p1_local_stiffness_load(
        coords, use_pallas=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(stiff_p), np.asarray(stiff))
    np.testing.assert_array_equal(np.asarray(load_p), np.asarray(load))


def test_p1_kernel_with_fracture_scale():
    mesh = fem.MeshTri(fem.unit_square(n=4))
    coords = mesh["cells", "coordinates"]
    scale = jnp.full((mesh.n_cells,), 2.5)
    stiff1, load1, _ = p1_local_stiffness_load(coords, use_pallas=False)
    stiff2, load2, _ = p1_local_stiffness_load(coords, scale, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(stiff2), 2.5 * np.asarray(stiff1), atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(load2), 2.5 * np.asarray(load1), atol=1e-14
    )


def test_soa_padding_contributes_nothing():
    mesh = fem.MeshTri(fem.unit_square(n=3))  # 18 cells -> heavy padding
    coords = mesh["cells", "coordinates"]
    soa = coords_to_soa(coords)
    assert soa.shape[1] % 2048 == 0
    # run the heavily padded input through the ACTUAL pallas kernel
    # (interpret mode compiles the same kernel body on CPU): padded lanes
    # carry scale 0 and a unit padding triangle, so the real lanes must be
    # bit-identical to the unpadded fallback
    stiff, load, areas = p1_local_stiffness_load(
        coords, use_pallas=True, interpret=True
    )
    stiff_ref, load_ref, areas_ref = p1_local_stiffness_load(
        coords, use_pallas=False
    )
    assert stiff.shape[0] == mesh.n_cells
    np.testing.assert_array_equal(np.asarray(stiff), np.asarray(stiff_ref))
    np.testing.assert_array_equal(np.asarray(load), np.asarray(load_ref))
    np.testing.assert_array_equal(np.asarray(areas), np.asarray(areas_ref))
    assert np.isfinite(np.asarray(stiff)).all()
    assert abs(float(areas.sum()) - 1.0) < 1e-12


def test_p1_3d_kernel_matches_network_tangential_assembly():
    """Intrinsic (cotangent) 3D kernel == tangential-gradient assembly on a
    fracture network, including a deliberately anisotropic chart."""
    from pytorch_fem_solver_tpu.mesh.dfn import build_fracture_network
    from pytorch_fem_solver_tpu.ops.pallas_kernels import (
        p1_local_stiffness_load_3d,
    )

    f1 = [[-1, 0, 0], [1, 0, 0], [1, 1, 0], [-1, 1, 0]]
    f2 = [[0, 0, -1], [0, 0, 1], [0, 1, 1], [0, 1, -1]]
    net = build_fracture_network([f1, f2], h=0.3)
    V = fem.FractureNetworkBasis(net, fem.ElementTri(1, 2))
    stiff_ref = np.asarray(
        V.integrate_bilinear_form_local(
            lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
        )
    )
    load_ref = np.asarray(V.integrate_linear_form_local(lambda b: b.v))[..., 0]

    coords3d = net["cells", "coordinates_3d"]
    stiff, load, areas = p1_local_stiffness_load_3d(coords3d, use_pallas=False)
    np.testing.assert_allclose(np.asarray(stiff), stiff_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(load), load_ref, atol=1e-14)

    # interpret-mode pallas == fallback bit-for-bit
    stiff_p, load_p, areas_p = p1_local_stiffness_load_3d(
        coords3d, use_pallas=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(stiff_p), np.asarray(stiff))
    np.testing.assert_array_equal(np.asarray(load_p), np.asarray(load))
    np.testing.assert_array_equal(np.asarray(areas_p), np.asarray(areas))


def test_p1_3d_kernel_anisotropic_chart():
    """A stretched (non-isometric) 2D chart: the intrinsic kernel must match
    the (J^T J)^{-1} tangential assembly, where the flat 2D formula would
    be wrong."""
    from pytorch_fem_solver_tpu.ops.pallas_kernels import (
        p1_local_stiffness_load_3d,
    )

    tri = fem.unit_square(n=4)
    # chart maps the unit square onto a 3x1 tilted rectangle in 3D
    anchors = [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    corners = [[0, 0, 0], [3, 0, 0], [0, 1, 1]]
    mesh = fem.FractureNetworkMesh([tri], [corners], anchor_vertices_2d=[anchors])
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))

    stiff_ref = np.asarray(
        V.integrate_bilinear_form_local(
            lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
        )
    )
    coords3d = mesh["cells", "coordinates_3d"]
    stiff, load, areas = p1_local_stiffness_load_3d(coords3d, use_pallas=False)
    np.testing.assert_allclose(np.asarray(stiff), stiff_ref, atol=1e-12)
    # total area of the mapped rectangle: |J column cross| = 3*sqrt(2)
    assert abs(float(areas.sum()) - 3.0 * np.sqrt(2.0)) < 1e-10


def test_p1_3d_kernel_on_plain_2d_mesh():
    from pytorch_fem_solver_tpu.ops.pallas_kernels import (
        p1_local_stiffness_load_3d,
    )

    mesh = fem.MeshTri(fem.unit_square(n=6))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    stiff_ref = np.asarray(
        V.integrate_bilinear_form_local(
            lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
        )
    )
    stiff, load, areas = p1_local_stiffness_load_3d(
        mesh["cells", "coordinates"], use_pallas=False
    )
    np.testing.assert_allclose(np.asarray(stiff), stiff_ref, atol=1e-13)
    assert abs(float(areas.sum()) - 1.0) < 1e-12
