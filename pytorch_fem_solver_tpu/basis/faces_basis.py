"""Triangle-quadrature bases over the faces of a 3D tetrahedral mesh.

3D counterparts of the 2D edge bases (``interior_edges_basis.py``); the
reference library is 2D-only (its facet machinery stops at
``torch_fem/basis/interior_edges_basis.py``). Faces play the role edges play
in 2D: ``InteriorFacesBasis`` carries the quadrature for jump / flux-jump
functionals (two-sided traces via ``Basis.interpolate``), and
``BoundaryFacesBasis`` assembles Neumann/Robin surface terms and boundary
flux functionals. Both inherit the whole facet implementation through the
``facet_group`` attribute; only the element differs — faces are 2D charts
embedded in R^3, so they require :class:`ElementTriSurface` (Gram-determinant
measure, pseudo-inverse map).
"""

from __future__ import annotations

from .abstract_basis import register_basis_pytree
from .interior_edges_basis import InteriorEdgesBasis
from ..element.element_tri import ElementTriSurface


@register_basis_pytree
class InteriorFacesBasis(InteriorEdgesBasis):
    """P1-P3 basis on interior faces (triangle charts embedded in the 3D mesh).

    ``mesh["interior_faces", "normals"]`` holds the unit normals oriented
    from the first adjacent cell toward the second — the orientation jump
    estimators contract against.
    """

    facet_group = "interior_faces"

    def __init__(self, mesh, element):
        if not isinstance(element, ElementTriSurface):
            raise TypeError(
                "face bases integrate over 2D charts embedded in R^3 and "
                "need the Gram-determinant measure: pass "
                "ElementTriSurface(1, q), not "
                f"{type(element).__name__}"
            )
        super().__init__(mesh, element)


@register_basis_pytree
class BoundaryFacesBasis(InteriorFacesBasis):
    """P1 quadrature basis over the boundary faces of a 3D mesh.

    Linear forms assemble Neumann/Robin surface terms into the global
    vertex DOF vector; ``integrate_functional`` gives surface functionals
    (e.g. total outward flux). Combine with partial ``vertex_markers`` and
    ``dirichlet_lift`` for mixed boundary conditions, exactly like the 2D
    ``BoundaryEdgesBasis``.
    """

    facet_group = "boundary_faces"
