"""Pallas TPU kernels for the element-integration hot path.

The BASELINE north star (/root/repo/BASELINE.json) calls for the reference's
per-element quadrature math to become "static arrays feeding a Pallas batched
element stiffness/mass/load kernel". This module implements that kernel for
P1 triangles in structure-of-arrays layout:

* inputs  (8, T): x0, y0, x1, y1, x2, y2, scale (fracture area factor), pad
* outputs (16, T): 9 stiffness entries (row-major 3x3), 3 load entries
  (f=1 load: area/3 each), area, det, 2 pad rows

SoA puts the cell axis on the 128-lane dimension, so every operation is a
full-width VPU op — no wasted lanes, no cross-lane reductions (the (T, 3, 3)
AoS layout XLA gets from the generic path uses 9 of 128 lanes).

Every kernel has an XLA fallback (same math, AoS layout) used on CPU and as
a correctness oracle in tests.

Measured wiring verdict (round 2, tools/exp_element_assembly.py, h=0.03,
214,988 cells): the kernel computes local stiffness+load in 349 µs vs the
generic path's 392 µs, but the downstream BSR scatter dominates assembly
(17.8 ms either way) — production assembly keeps the generic closure path;
these kernels serve workloads that want raw local matrices directly (see
docs/performance.md for the full numbers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: number of input / output component rows in the SoA layout
IN_ROWS = 8
OUT_ROWS = 16
LANE_BLOCK = 2048


def _p1_kernel(in_ref, out_ref):
    """Per-lane P1 stiffness/load/measure computation."""
    x0 = in_ref[0:1, :]
    y0 = in_ref[1:2, :]
    x1 = in_ref[2:3, :]
    y1 = in_ref[3:4, :]
    x2 = in_ref[4:5, :]
    y2 = in_ref[5:6, :]
    scale = in_ref[6:7, :]

    ux1 = x1 - x0
    uy1 = y1 - y0
    ux2 = x2 - x0
    uy2 = y2 - y0

    det = ux1 * uy2 - ux2 * uy1
    inv_det = 1.0 / det
    area = 0.5 * det * scale

    # P1 shape gradients: g1 = (uy1-uy2, ux2-ux1)/det, g2 = (uy2,-ux2)/det,
    # g3 = (-uy1, ux1)/det
    g1x = (uy1 - uy2) * inv_det
    g1y = (ux2 - ux1) * inv_det
    g2x = uy2 * inv_det
    g2y = -ux2 * inv_det
    g3x = -uy1 * inv_det
    g3y = ux1 * inv_det

    s11 = area * (g1x * g1x + g1y * g1y)
    s12 = area * (g1x * g2x + g1y * g2y)
    s13 = area * (g1x * g3x + g1y * g3y)
    s22 = area * (g2x * g2x + g2y * g2y)
    s23 = area * (g2x * g3x + g2y * g3y)
    s33 = area * (g3x * g3x + g3y * g3y)

    out_ref[0:1, :] = s11
    out_ref[1:2, :] = s12
    out_ref[2:3, :] = s13
    out_ref[3:4, :] = s12
    out_ref[4:5, :] = s22
    out_ref[5:6, :] = s23
    out_ref[6:7, :] = s13
    out_ref[7:8, :] = s23
    out_ref[8:9, :] = s33
    load = area * (1.0 / 3.0)
    out_ref[9:10, :] = load
    out_ref[10:11, :] = load
    out_ref[11:12, :] = load
    out_ref[12:13, :] = area
    out_ref[13:14, :] = det
    out_ref[14:15, :] = jnp.zeros_like(det)
    out_ref[15:16, :] = jnp.zeros_like(det)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _p1_pallas(soa, interpret=False):
    t_pad = soa.shape[1]
    grid = (t_pad // LANE_BLOCK,)
    return pl.pallas_call(
        _p1_kernel,
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, t_pad), soa.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (IN_ROWS, LANE_BLOCK),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (OUT_ROWS, LANE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(soa)


def coords_to_soa(cell_coords, scale=None):
    """(T, 3, 2) cell coordinates (+ optional (T,) scale) -> padded (8, T_pad)."""
    T = cell_coords.shape[0]
    t_pad = ((T + LANE_BLOCK - 1) // LANE_BLOCK) * LANE_BLOCK
    soa = jnp.zeros((IN_ROWS, t_pad), dtype=cell_coords.dtype)
    flat = cell_coords.reshape(T, 6)  # x0 y0 x1 y1 x2 y2
    soa = soa.at[:6, :T].set(flat.T)
    if scale is None:
        soa = soa.at[6, :T].set(1.0)
    else:
        soa = soa.at[6, :T].set(scale.reshape(-1))
    # padding cells: unit triangle to keep det nonzero
    if t_pad > T:
        soa = soa.at[2, T:].set(1.0)  # x1 = 1
        soa = soa.at[5, T:].set(1.0)  # y2 = 1
        soa = soa.at[6, T:].set(0.0)  # scale 0 -> zero contributions
    return soa


def p1_local_stiffness_load(cell_coords, scale=None, *, use_pallas=None,
                            interpret=False):
    """P1 local stiffness (T, 3, 3), load (T, 3) for f=1, and areas (T,).

    ``use_pallas`` defaults to True on TPU backends (the axon plugin also
    reports "tpu"), False elsewhere; the
    XLA fallback computes identical math from the same SoA layout.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    T = cell_coords.shape[0]
    soa = coords_to_soa(cell_coords, scale)
    if use_pallas:
        out = _p1_pallas(soa, interpret=interpret)
    else:
        out = _p1_xla(soa)
    stiff = out[:9, :T].T.reshape(T, 3, 3)
    load = out[9:12, :T].T
    areas = out[12, :T]
    return stiff, load, areas


@jax.jit
def _p1_xla(soa):
    """XLA fallback with the exact kernel math (oracle for tests)."""

    class _Ref:
        def __init__(self, arr):
            self.arr = arr

        def __getitem__(self, idx):
            return self.arr[idx]

    out = jnp.zeros((OUT_ROWS, soa.shape[1]), dtype=soa.dtype)

    class _Out:
        def __init__(self):
            self.arr = out

        def __setitem__(self, idx, value):
            self.arr = self.arr.at[idx].set(value)

    o = _Out()
    _p1_kernel(_Ref(soa), o)
    return o.arr


# -- intrinsic 3D variant (embedded fracture triangles) ----------------------

#: 3D SoA input rows: x0 y0 z0 x1 y1 z1 x2 y2 z2 + 7 pad
IN_ROWS_3D = 16


def _p1_kernel_3d(in_ref, out_ref):
    """Intrinsic P1 stiffness of an embedded triangle, any ambient dim.

    Uses the cotangent formula S_ij = (e_i . e_j) / (4A) with e_i the edge
    vector opposite vertex i — mathematically identical to integrating the
    tangential gradients ``grad2^T (J^T J)^{-1} grad2`` of an affine chart
    (reference fracture_basis.py:15-26), but needing only the lifted 3D
    vertex coordinates. Exact for isometric AND anisotropic charts.
    """
    p = [
        (in_ref[3 * i + 0 : 3 * i + 1, :],
         in_ref[3 * i + 1 : 3 * i + 2, :],
         in_ref[3 * i + 2 : 3 * i + 3, :])
        for i in range(3)
    ]

    def sub(a, b):
        return (a[0] - b[0], a[1] - b[1], a[2] - b[2])

    def dot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    e0 = sub(p[2], p[1])  # opposite vertex 0
    e1 = sub(p[0], p[2])  # opposite vertex 1
    e2 = sub(p[1], p[0])  # opposite vertex 2

    # area from the cross product of two edges
    u, v = e2, sub(p[2], p[0])
    cx = u[1] * v[2] - u[2] * v[1]
    cy = u[2] * v[0] - u[0] * v[2]
    cz = u[0] * v[1] - u[1] * v[0]
    area = 0.5 * jnp.sqrt(cx * cx + cy * cy + cz * cz)
    inv4a = 0.25 / area

    s00 = dot3(e0, e0) * inv4a
    s01 = dot3(e0, e1) * inv4a
    s02 = dot3(e0, e2) * inv4a
    s11 = dot3(e1, e1) * inv4a
    s12 = dot3(e1, e2) * inv4a
    s22 = dot3(e2, e2) * inv4a

    out_ref[0:1, :] = s00
    out_ref[1:2, :] = s01
    out_ref[2:3, :] = s02
    out_ref[3:4, :] = s01
    out_ref[4:5, :] = s11
    out_ref[5:6, :] = s12
    out_ref[6:7, :] = s02
    out_ref[7:8, :] = s12
    out_ref[8:9, :] = s22
    load = area * (1.0 / 3.0)
    out_ref[9:10, :] = load
    out_ref[10:11, :] = load
    out_ref[11:12, :] = load
    out_ref[12:13, :] = area
    out_ref[13:14, :] = jnp.zeros_like(area)
    out_ref[14:15, :] = jnp.zeros_like(area)
    out_ref[15:16, :] = jnp.zeros_like(area)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _p1_pallas_3d(soa, interpret=False):
    t_pad = soa.shape[1]
    grid = (t_pad // LANE_BLOCK,)
    return pl.pallas_call(
        _p1_kernel_3d,
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, t_pad), soa.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (IN_ROWS_3D, LANE_BLOCK),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (OUT_ROWS, LANE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(soa)


def coords_to_soa_3d(cell_coords3d):
    """(T, 3, 3) lifted cell coordinates -> padded (16, T_pad) SoA."""
    T = cell_coords3d.shape[0]
    t_pad = ((T + LANE_BLOCK - 1) // LANE_BLOCK) * LANE_BLOCK
    soa = jnp.zeros((IN_ROWS_3D, t_pad), dtype=cell_coords3d.dtype)
    flat = cell_coords3d.reshape(T, 9)
    soa = soa.at[:9, :T].set(flat.T)
    # padding cells: unit triangle in the xy plane (nonzero area; their
    # outputs are sliced away)
    if t_pad > T:
        soa = soa.at[3, T:].set(1.0)  # x1 = 1
        soa = soa.at[7, T:].set(1.0)  # y2 = 1
    return soa


@jax.jit
def _p1_xla_3d(soa):
    """XLA fallback with the exact 3D kernel math (oracle for tests)."""

    class _Ref:
        def __init__(self, arr):
            self.arr = arr

        def __getitem__(self, idx):
            return self.arr[idx]

    out = jnp.zeros((OUT_ROWS, soa.shape[1]), dtype=soa.dtype)

    class _Out:
        def __init__(self):
            self.arr = out

        def __setitem__(self, idx, value):
            self.arr = self.arr.at[idx].set(value)

    o = _Out()
    _p1_kernel_3d(_Ref(soa), o)
    return o.arr


def p1_local_stiffness_load_3d(cell_coords3d, *, use_pallas=None,
                               interpret=False):
    """Intrinsic P1 local stiffness (T, 3, 3), f=1 load (T, 3), areas (T,)
    of embedded triangles given their (T, 3, 3) lifted vertex coordinates.

    Matches ``integrate_bilinear_form_local(grad . grad)`` on any fracture
    basis (tangential gradients) to roundoff; pads 2D meshes with z = 0.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    T = cell_coords3d.shape[0]
    if cell_coords3d.shape[-1] == 2:
        cell_coords3d = jnp.concatenate(
            [cell_coords3d, jnp.zeros_like(cell_coords3d[..., :1])], axis=-1
        )
    soa = coords_to_soa_3d(cell_coords3d)
    if use_pallas:
        out = _p1_pallas_3d(soa, interpret=interpret)
    else:
        out = _p1_xla_3d(soa)
    stiff = out[:9, :T].T.reshape(T, 3, 3)
    load = out[9:12, :T].T
    areas = out[12, :T]
    return stiff, load, areas
