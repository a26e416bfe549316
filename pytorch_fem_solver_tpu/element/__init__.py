"""Reference elements: shape functions, quadrature, affine-map algebra."""

from .abstract_element import AbstractElement
from .element_line import ElementLine
from .element_tri import ElementTri
from .quadrature import line_rule, triangle_rule

__all__ = [
    "AbstractElement",
    "ElementLine",
    "ElementTri",
    "line_rule",
    "triangle_rule",
]
