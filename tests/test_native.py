"""Native C++ structure kernels: byte-identical to the NumPy fallbacks.

The native library (`native/src/fem_native.cpp`, built at first import with
the system g++) is a transparent accelerator: every consumer keeps a NumPy
path with identical outputs. These tests pin that equivalence, plus the
fallback behavior when the library is disabled.
"""

import numpy as np
import pytest

from pytorch_fem_solver_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def keys_cases():
    rng = np.random.default_rng(7)
    return [
        rng.integers(0, 50, size=1000),  # heavy duplicates
        rng.integers(0, 10**12, size=1000),  # wide keys, few active bytes
        np.zeros(17, dtype=np.int64),  # constant
        np.arange(100)[::-1].copy(),  # reversed
        np.array([5], dtype=np.int64),  # single
        rng.integers(-(10**9), 10**9, size=512),  # negative keys
    ]


def test_radix_argsort_matches_numpy_stable():
    for keys in keys_cases():
        got = native.radix_argsort(keys)
        want = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(got, want)


def test_sort_unique_matches_numpy():
    for keys in keys_cases():
        order, uniq, inverse, counts = native.sort_unique(keys)
        w_uniq, w_inv, w_cnt = np.unique(
            keys, return_inverse=True, return_counts=True
        )
        np.testing.assert_array_equal(uniq, w_uniq)
        np.testing.assert_array_equal(inverse, w_inv.reshape(-1))
        np.testing.assert_array_equal(counts, w_cnt)
        np.testing.assert_array_equal(order, np.argsort(keys, kind="stable"))


def test_unique_edges_matches_numpy_on_real_mesh():
    import pytorch_fem_solver_tpu as fem
    from pytorch_fem_solver_tpu.mesh.topology import TRI_EDGE_PERMUTATIONS

    tri = fem.unit_square(max_area=0.5**8)
    cells = np.asarray(tri["triangles"], dtype=np.int64)
    nv = np.asarray(tri["vertices"]).shape[0]

    edges, inverse, counts, order = native.unique_edges(cells, nv)

    flat = np.sort(cells[:, TRI_EDGE_PERMUTATIONS].reshape(-1, 2), axis=1)
    w_edges, w_inv, w_cnt = np.unique(
        flat, axis=0, return_inverse=True, return_counts=True
    )
    np.testing.assert_array_equal(edges, w_edges)
    np.testing.assert_array_equal(inverse, w_inv.reshape(-1))
    np.testing.assert_array_equal(counts, w_cnt)
    np.testing.assert_array_equal(order, np.argsort(w_inv.reshape(-1), kind="stable"))


def test_unique_edges_rejects_nonmanifold():
    # three triangles sharing edge (0, 1)
    cells = np.array([[0, 1, 2], [0, 1, 3], [0, 1, 4]], dtype=np.int64)
    with pytest.raises(ValueError, match="non-manifold"):
        native.unique_edges(cells, 5)


def test_topology_same_with_and_without_native(monkeypatch):
    import pytorch_fem_solver_tpu as fem
    from pytorch_fem_solver_tpu.mesh import topology

    tri = fem.unit_square(n=13)
    with_native = topology.build_tri_topology(
        tri["vertices"], tri["triangles"], tri.get("vertex_markers")
    )
    import pytorch_fem_solver_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", True)
    without = topology.build_tri_topology(
        tri["vertices"], tri["triangles"], tri.get("vertex_markers")
    )
    assert with_native.keys() == without.keys()
    for key in with_native:
        np.testing.assert_array_equal(
            np.asarray(with_native[key]), np.asarray(without[key]), err_msg=key
        )


def test_bsr_pair_ranks_matches_numpy_fallback():
    """Native fused pair-rank kernel == the NumPy fallback, byte for byte,
    across tri/tet/P2/vector bases and an all-Dirichlet edge case."""
    import pytorch_fem_solver_tpu as fem
    import pytorch_fem_solver_tpu.native as nat
    from pytorch_fem_solver_tpu.element import ElementTet
    from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube
    from pytorch_fem_solver_tpu.ops.bsr import build_bsr_structure

    if not nat.available():
        pytest.skip("native library unavailable")

    cases = [
        (fem.MeshTri(fem.unit_square(n=7)), fem.ElementTri(1, 2), fem.Basis),
        (fem.MeshTri(fem.unit_square(n=5)), fem.ElementTri(2, 2), fem.Basis),
        (MeshTet(unit_cube(3)), ElementTet(1, 2), fem.Basis),
        (
            fem.MeshTri(fem.unit_square(n=5)),
            fem.ElementTri(1, 2),
            fem.VectorBasis,
        ),
        # all-Dirichlet: a single-quad mesh has no interior vertices
        (fem.MeshTri(fem.unit_square(n=1)), fem.ElementTri(1, 2), fem.Basis),
    ]
    for mesh, el, cls in cases:
        V = cls(mesh, el)
        inner = np.asarray(V._basis_parameters["inner_dofs"])
        coords = np.asarray(V._coords4global_dofs)[inner]
        args = (V._global_dofs4elements, V.n_dofs, inner, coords)
        st_nat = build_bsr_structure(*args, max_b=8)
        real = nat.bsr_pair_ranks
        nat.bsr_pair_ranks = lambda *a, **k: None
        try:
            st_np = build_bsr_structure(*args, max_b=8)
        finally:
            nat.bsr_pair_ranks = real
        for name in (
            "bcols",
            "entry_slot",
            "entry_slot_sym",
            "bcols2",
            "heavy_rows",
            "tpartner",
        ):
            a = np.asarray(getattr(st_nat, name))
            b = np.asarray(getattr(st_np, name))
            assert a.shape == b.shape and np.array_equal(a, b), (
                cls.__name__,
                el.polynomial_order,
                name,
            )


def test_tet_face_edge_keys_matches_numpy_fallback():
    import pytorch_fem_solver_tpu.native as nat
    from pytorch_fem_solver_tpu.mesh.topology import build_tet_topology
    from pytorch_fem_solver_tpu.mesh import unit_cube

    if not nat.available():
        pytest.skip("native library unavailable")
    t = unit_cube(3)
    verts, tets = np.asarray(t["vertices"]), np.asarray(t["tetrahedra"])
    topo_nat = build_tet_topology(verts, tets)
    real = nat.tet_face_edge_keys
    nat.tet_face_edge_keys = lambda *a, **k: None
    try:
        topo_np = build_tet_topology(verts, tets)
    finally:
        nat.tet_face_edge_keys = real
    assert topo_nat.keys() == topo_np.keys()
    for k in topo_nat:
        assert np.array_equal(
            np.asarray(topo_nat[k]), np.asarray(topo_np[k])
        ), k
