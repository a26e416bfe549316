"""Shared problem definitions for the example workloads.

The reference repeats these in every script (rhs/exact/forms for the sine
Poisson problem, H1 norms, the 2-fracture manufactured solution, plotting);
here they are factored once. Examples stay standalone entry points.
"""

from __future__ import annotations

import math
import os
import pathlib
import sys

# examples are standalone scripts: make the repo root importable
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

# examples default to float64 on CPU (reference parity:
# torch.set_default_dtype(torch.float64)); run on TPU with FEM_EXAMPLES_TPU=1
if not os.environ.get("FEM_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

def env_flag(name: str, default: bool = False) -> bool:
    """Truthy env parse: '0'/'false'/'no'/'' disable (bool("0") is True!)."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() not in ("", "0", "false", "no", "off")


SHOW_PLOTS = env_flag("FEM_SHOW_PLOTS")

PI = math.pi


def boundary_constrain(inputs):
    """Strong homogeneous Dirichlet modifier on the unit square."""
    x, y = inputs[..., 0:1], inputs[..., 1:2]
    return x * (x - 1) * y * (y - 1)


def rhs(x, y):
    return 2.0 * PI**2 * jnp.sin(PI * x) * jnp.sin(PI * y)


def exact(x, y):
    return jnp.sin(PI * x) * jnp.sin(PI * y)


def exact_dx(x, y):
    return PI * jnp.cos(PI * x) * jnp.sin(PI * y)


def exact_dy(x, y):
    return PI * jnp.sin(PI * x) * jnp.cos(PI * y)


def split_xy(points):
    return points[..., 0:1], points[..., 1:2]


def stiffness_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def load_form(basis):
    x, y = split_xy(basis.integration_points)
    return rhs(x, y) * basis.v


def residual_form(basis, gradient):
    """Weak residual of the sine Poisson problem against the test basis."""
    pts = basis.integration_points
    x, y = split_xy(pts)
    grad = gradient(pts)
    return rhs(x, y) * basis.v - (basis.v_grad @ jnp.matrix_transpose(grad))


def h1_exact(basis):
    x, y = split_xy(basis.integration_points)
    return exact(x, y) ** 2 + exact_dx(x, y) ** 2 + exact_dy(x, y) ** 2


def h1_norm(basis, neural_network, gradient):
    pts = basis.integration_points
    x, y = split_xy(pts)
    dx, dy = jnp.split(gradient(pts), 2, axis=-1)
    return (
        (exact(x, y) - neural_network(pts)) ** 2
        + (exact_dx(x, y) - dx) ** 2
        + (exact_dy(x, y) - dy) ** 2
    )


def h1_error_of_fields(basis, uh, uh_grad):
    """H1 error of interpolated FEM fields vs the sine exact solution."""
    x, y = split_xy(basis.integration_points)
    return (
        (uh - exact(x, y)) ** 2
        + (uh_grad[..., 0:1] - exact_dx(x, y)) ** 2
        + (uh_grad[..., 1:2] - exact_dy(x, y)) ** 2
    )


def make_edge_jump(V, V_edges):
    """A-posteriori edge term: ``jump(_, normals, edge_size, net)`` plus the
    mesh sizes (h_T, h_E, n_E) — the reference's h_E (⟦∇u·n⟧)^2 estimator
    (/root/reference/examples/example_jump.py:75-88), built once from the
    two-sided edge-trace interpolator."""
    _, interp_to_edges_grad = V.interpolate(V_edges)
    h_T = V.mesh["cells", "length"]
    h_E = V.mesh["interior_edges", "length"][..., None, :, :]
    n_E = V.mesh["interior_edges", "normals"][..., None, :, :]

    def jump(_, normals, edge_size, net):
        grad = interp_to_edges_grad(net)
        return (
            edge_size
            * (
                (grad[:, 0] * normals).sum(-1, keepdims=True)
                + (grad[:, 1] * -normals).sum(-1, keepdims=True)
            )
            ** 2
        )

    return jump, h_T, h_E, n_E


def dfn_boundary_modifier(pts):
    """Vanishes exactly on both fractures' outer boundaries, not the trace."""
    x, y, z = pts[..., 0:1], pts[..., 1:2], pts[..., 2:3]
    return y * (1 - y) * (x**2 - 1) * (z**2 - 1)


def tangential_projector(basis):
    """P = J (J^T J)^{-1} J^T per cell: projects ambient gradients in-plane."""
    cell_frac = basis.mesh["cells", "fracture"][:, 0]
    jac = basis.mesh["fracture_map", "jacobian"][cell_frac][:, None]
    inv = basis.mesh["fracture_map", "inv_jacobian"][cell_frac][:, None]
    return jac @ inv  # (T, 1, 3, 3), symmetric


def maybe_show(plt):
    if SHOW_PLOTS:
        plt.show()


def plot_cellwise(basis, values, label):
    """PolyCollection plot of per-cell values (parity with example_weak.py:181-201)."""
    import matplotlib

    if not SHOW_PLOTS:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from matplotlib.collections import PolyCollection

    fig, axis = plt.subplots()
    c4e = np.asarray(basis.mesh["cells", "coordinates"])
    collection = PolyCollection(
        c4e, array=np.asarray(values).reshape(-1), cmap="viridis",
        edgecolors="black", linewidths=0.2,
    )
    axis.add_collection(collection)
    axis.autoscale_view()
    axis.set_xlabel("x")
    axis.set_ylabel("y")
    fig.colorbar(collection, ax=axis, label=label)
    fig.tight_layout()
    return fig, axis, plt


# ---------------------------------------------------------------------------
# two-fracture DFN manufactured problem (example_fractures_fem.py:31-230)
# ---------------------------------------------------------------------------


def two_fracture_geometry():
    f1 = [[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [-1.0, 1.0, 0.0]]
    f2 = [[0.0, 0.0, -1.0], [0.0, 0.0, 1.0], [0.0, 1.0, 1.0], [0.0, 1.0, -1.0]]
    return [f1, f2]


def dfn_rhs(c):
    """Pointwise rhs valid on both fracture planes (z=0 and x=0)."""
    x, y, z = c[..., 0:1], c[..., 1:2], c[..., 2:3]
    return (
        6.0 * (y - y**2) * jnp.abs(x)
        - 2.0 * (jnp.abs(x) ** 3 - jnp.abs(x))
        - 6.0 * (y - y**2) * jnp.abs(z)
        + 2.0 * (jnp.abs(z) ** 3 - jnp.abs(z))
    )


def dfn_exact(c):
    x, y, z = c[..., 0:1], c[..., 1:2], c[..., 2:3]
    return -y * (1 - y) * jnp.abs(x) * (x**2 - 1) + y * (1 - y) * jnp.abs(z) * (
        z**2 - 1
    )


def dfn_exact_grad(c):
    x, y, z = c[..., 0:1], c[..., 1:2], c[..., 2:3]
    dx = -y * (1 - y) * (jnp.sign(x) * (x**2 - 1) + 2 * x * jnp.abs(x))
    dy = -(1 - 2 * y) * jnp.abs(x) * (x**2 - 1) + (1 - 2 * y) * jnp.abs(z) * (
        z**2 - 1
    )
    dz = y * (1 - y) * (jnp.sign(z) * (z**2 - 1) + 2 * z * jnp.abs(z))
    return jnp.concatenate([dx, dy, dz], axis=-1)


def dfn_h1_error(basis, uh, uh_grad):
    e = dfn_exact(basis.integration_points)
    g = dfn_exact_grad(basis.integration_points)
    return (uh - e) ** 2 + ((uh_grad - g) ** 2).sum(-1, keepdims=True)


def dfn_h1_exact(basis):
    e = dfn_exact(basis.integration_points)
    g = dfn_exact_grad(basis.integration_points)
    return e**2 + (g**2).sum(-1, keepdims=True)
