from .scoring import DEFAULT_SYS, BOUNDARY_GAP_EXTEND, resolve_scoring, Scoring
from .api import perform_alignment

__all__ = [
    "DEFAULT_SYS",
    "BOUNDARY_GAP_EXTEND",
    "resolve_scoring",
    "Scoring",
    "perform_alignment",
]
