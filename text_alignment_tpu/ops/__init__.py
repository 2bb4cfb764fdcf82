from . import oracle
from . import device
from .projections import (
    moving_avg_filter,
    calculate_peak_prominence,
    find_peak_locations,
)

__all__ = [
    "oracle",
    "device",
    "moving_avg_filter",
    "calculate_peak_prominence",
    "find_peak_locations",
]
