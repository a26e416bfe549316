"""Vector-valued Lagrange basis (beyond the reference: elasticity-type PDEs).

The reference framework is scalar-only (``torch_fem/basis/basis.py`` assembles
one DOF per node). ``VectorBasis`` lifts any scalar :class:`Basis` to
``n_components`` coupled components with an *interleaved* DOF layout
(node-major, component-minor): DOF of (node i, component c) is
``i * n_components + c``.

Why interleaved (a TPU-first choice): the solver path reorders DOFs spatially
and blocks them 8-wide (``ops.bsr``). With components interleaved, the
components of one node always land in the same 8-block, so the block-Jacobi /
aggregate-block smoothers capture the full inter-component coupling of each
node (the elasticity off-diagonal) at zero extra cost, and the rigid-body-mode
coarse space (``ops.precondition.elasticity_rbm_modes``) stays a pure
reshape-transfer over contiguous aggregates.

Shape convention (extends the scalar ``(..., T, q, n_loc, ...)`` convention):

* ``v``:       ``(q, n_vloc, nc)``    — vector shape functions φ_i e_c
* ``v_grad``:  ``(T, 1|q, n_vloc, nc, d)`` — per-DOF Jacobians
* closures contract the trailing component/space axes down to the scalar
  layout: bilinear integrands ``(T, q, n_vloc, n_vloc)``, linear integrands
  ``(T, q, n_vloc, 1)`` — so every assembly/solve/preconditioner path
  (scatter assembly, BSR/ELL, symmetric canonical pairs) is reused unchanged.

``n_vloc = n_loc * nc``. Works for P1, P2 and P3 elements.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import config
from .basis import Basis
from .abstract_basis import register_basis_pytree


@register_basis_pytree
class VectorBasis(Basis):
    """``n_components``-valued Lagrange basis on mesh cells.

    Dirichlet nodes clamp every component by default; pass
    ``dirichlet_components`` to constrain a subset (e.g. ``(1,)`` for a
    roller boundary fixing only the y-component at marked nodes).
    """

    def __init__(
        self,
        mesh,
        element,
        n_components: Optional[int] = None,
        dirichlet_components: Optional[tuple] = None,
    ):
        if n_components is None:
            n_components = int(
                np.asarray(mesh["vertices", "coordinates"]).shape[-1]
            )
        self.n_components = int(n_components)
        if self.n_components < 1:
            raise ValueError(f"n_components must be >= 1, got {n_components}")
        if dirichlet_components is not None:
            bad = [
                c for c in dirichlet_components
                if not 0 <= int(c) < self.n_components
            ]
            if bad:
                raise ValueError(
                    f"dirichlet_components {bad} out of range for "
                    f"{self.n_components} components"
                )
        self._dirichlet_components = (
            None
            if dirichlet_components is None
            else tuple(int(c) for c in dirichlet_components)
        )
        super().__init__(mesh, element)

        # lift the scalar shape tables to vector-valued ones: each scalar
        # local function φ_l becomes nc functions φ_l e_c with value vector
        # δ_{cC} φ_l and Jacobian δ_{cC} ∇φ_l
        nc = self.n_components
        eye = jnp.eye(nc, dtype=self.v.dtype)
        q, n_loc, _ = self.v.shape
        self.v = jnp.einsum("qlo,cC->qlcC", self.v, eye).reshape(
            q, n_loc * nc, nc
        )
        t, qg, _, d = self.v_grad.shape
        self.v_grad = jnp.einsum(
            "tqld,cC->tqlcCd", self.v_grad, eye.astype(self.v_grad.dtype)
        ).reshape(t, qg, n_loc * nc, nc, d)

    # -- DOF lifting --------------------------------------------------------

    def _compute_dofs(self, mesh, element):
        coords_s, dofs_s, marks_s, _ = super()._compute_dofs(mesh, element)
        nc = self.n_components

        coords_s = np.asarray(coords_s)
        dofs_s = np.asarray(dofs_s)
        marks_s = np.asarray(marks_s).reshape(-1)

        # interleaved layout: DOF(node i, comp c) = i*nc + c
        coords_v = np.repeat(coords_s, nc, axis=0)
        dofs_v = (
            dofs_s[..., None].astype(np.int64) * nc + np.arange(nc)
        ).reshape(dofs_s.shape[0], -1)
        if self._dirichlet_components is None:
            marks_v = np.repeat(marks_s, nc)
        else:
            comp_mask = np.zeros(nc, dtype=marks_s.dtype)
            comp_mask[list(self._dirichlet_components)] = 1
            marks_v = (marks_s[:, None] * comp_mask[None, :]).reshape(-1)

        coords_4_global_dofs = jnp.asarray(
            coords_v, dtype=config.default_dtype()
        )
        global_dofs_4_elements = jnp.asarray(
            dofs_v, dtype=config.index_dtype()
        )
        nodes_4_boundary_dofs = jnp.asarray(
            marks_v.reshape(-1, 1), dtype=config.index_dtype()
        )
        coords_4_elements = coords_4_global_dofs[global_dofs_4_elements]
        return (
            coords_4_global_dofs,
            global_dofs_4_elements,
            nodes_4_boundary_dofs,
            coords_4_elements,
        )

    # -- interpolation ------------------------------------------------------

    def interpolate(self, basis, tensor: Optional[jnp.ndarray] = None):
        """Evaluate a DOF vector at this basis's quadrature points.

        Returns ``(values, jacobian)`` with shapes ``(T, q, 1, nc)`` and
        ``(T, q, 1, nc, d)``. Only self-interpolation is implemented for
        vector fields (edge traces of vector fields are not needed by any
        current workload).
        """
        if basis is not self:
            raise NotImplementedError(
                "VectorBasis only interpolates onto itself"
            )
        if tensor is None:
            raise NotImplementedError(
                "VectorBasis.interpolate requires a DOF vector"
            )
        dof_idx = self._global_dofs4elements[..., None, :]  # (T, 1, n_vloc)
        values = tensor[dof_idx]  # (T, 1, n_vloc, 1)
        u = (values * self.v).sum(-2, keepdims=True)  # (T, q, 1, nc)
        # (T, q, 1, nc, d): contract the n_vloc axis of the per-DOF Jacobians
        u_grad = (values[..., None] * self.v_grad).sum(-3, keepdims=True)
        return u, u_grad
