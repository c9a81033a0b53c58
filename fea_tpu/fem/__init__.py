from .elasticity import element_stiffness, plane_strain_stiffness
from .problem import StaticProblem, SolveResult
from .solver import pcg_solve

__all__ = [
    "element_stiffness",
    "plane_strain_stiffness",
    "StaticProblem",
    "SolveResult",
    "pcg_solve",
]
