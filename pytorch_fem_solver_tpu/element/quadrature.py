"""Gaussian quadrature rules on the reference triangle and segment.

Static host-side tables (NumPy float64). The convention matches the reference
library (/root/reference/torch_fem/element/element_tri.py:77-130 and
element_line.py:21-43): weights are *normalized* so they sum to one and the
integral weight is ``reference_element_measure * weight * |det J|``.

Triangle rules are the classical symmetric (Dunavant) rules on the reference
triangle with vertices (0,0), (1,0), (0,1); segment rules are Gauss-Legendre
on [-1, 1].
"""

from __future__ import annotations

import numpy as np

__all__ = ["triangle_rule", "line_rule", "TRI_RULE_ORDERS", "LINE_RULE_ORDERS"]


def _tri_rules() -> dict[int, tuple[np.ndarray, np.ndarray]]:
    rules: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    # degree 1: centroid rule
    rules[1] = (
        np.array([[1.0 / 3.0, 1.0 / 3.0]]),
        np.array([1.0]),
    )

    # degree 2: 3-point symmetric rule
    rules[2] = (
        np.array([[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]]),
        np.array([1 / 3, 1 / 3, 1 / 3]),
    )

    # degree 3: 4-point rule (centroid + 3 symmetric points)
    rules[3] = (
        np.array([[1 / 3, 1 / 3], [0.6, 0.2], [0.2, 0.6], [0.2, 0.2]]),
        np.array([-9 / 16, 25 / 48, 25 / 48, 25 / 48]),
    )

    # degree 4: 6-point Dunavant rule
    a1, a2 = 0.816847572980459, 0.091576213509771
    b1, b2 = 0.108103018168070, 0.445948490915965
    w1, w2 = 0.109951743655322, 0.223381589678011
    rules[4] = (
        np.array(
            [[a1, a2], [a2, a1], [a2, a2], [b1, b2], [b2, b1], [b2, b2]]
        ),
        np.array([w1, w1, w1, w2, w2, w2]),
    )

    # degree 5: 7-point Dunavant rule (extension beyond the reference's max
    # order 4; useful for P2 mass matrices and error functionals)
    c = 1.0 / 3.0
    g1 = (6.0 - np.sqrt(15.0)) / 21.0
    g2 = (6.0 + np.sqrt(15.0)) / 21.0
    w0 = 9.0 / 40.0
    wg1 = (155.0 - np.sqrt(15.0)) / 1200.0
    wg2 = (155.0 + np.sqrt(15.0)) / 1200.0
    rules[5] = (
        np.array(
            [
                [c, c],
                [g1, g1],
                [1 - 2 * g1, g1],
                [g1, 1 - 2 * g1],
                [g2, g2],
                [1 - 2 * g2, g2],
                [g2, 1 - 2 * g2],
            ]
        ),
        np.array([w0, wg1, wg1, wg1, wg2, wg2, wg2]),
    )

    return rules


def _line_rules() -> dict[int, tuple[np.ndarray, np.ndarray]]:
    rules: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    # 1-point (midpoint) rule, exact for degree 1
    rules[1] = (np.array([[0.0]]), np.array([1.0]))

    # 2-point Gauss-Legendre, exact for degree 3 (the reference labels this
    # "integration_order 2", element_line.py:23-29 — we keep that labelling)
    s = 1.0 / np.sqrt(3.0)
    rules[2] = (np.array([[-s], [s]]), np.array([0.5, 0.5]))

    # 3-point Gauss-Legendre, exact for degree 5
    t = np.sqrt(3.0 / 5.0)
    rules[3] = (np.array([[0.0], [-t], [t]]), np.array([8 / 18, 5 / 18, 5 / 18]))

    # 4-point Gauss-Legendre (extension)
    p1 = np.sqrt(3.0 / 7.0 - 2.0 / 7.0 * np.sqrt(6.0 / 5.0))
    p2 = np.sqrt(3.0 / 7.0 + 2.0 / 7.0 * np.sqrt(6.0 / 5.0))
    w1 = (18.0 + np.sqrt(30.0)) / 36.0 / 2.0
    w2 = (18.0 - np.sqrt(30.0)) / 36.0 / 2.0
    rules[4] = (
        np.array([[-p2], [-p1], [p1], [p2]]),
        np.array([w2, w1, w1, w2]),
    )

    return rules


_TRI_RULES = _tri_rules()
_LINE_RULES = _line_rules()
TRI_RULE_ORDERS = tuple(sorted(_TRI_RULES))
LINE_RULE_ORDERS = tuple(sorted(_LINE_RULES))


def triangle_rule(order: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (nodes (n_q, 2), normalized weights (n_q,)) on the ref triangle."""
    if order not in _TRI_RULES:
        raise NotImplementedError(
            f"Triangle integration order {order} not implemented "
            f"(available: {TRI_RULE_ORDERS})"
        )
    nodes, weights = _TRI_RULES[order]
    return nodes.copy(), weights.copy()


def line_rule(order: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (nodes (n_q, 1), normalized weights (n_q,)) on [-1, 1]."""
    if order not in _LINE_RULES:
        raise NotImplementedError(
            f"Line integration order {order} not implemented "
            f"(available: {LINE_RULE_ORDERS})"
        )
    nodes, weights = _LINE_RULES[order]
    return nodes.copy(), weights.copy()
