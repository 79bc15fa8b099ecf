"""Earth-metric conveniences (S2Earth [spec]): radians ↔ meters/km on
the mean-radius sphere, plus the level picker queries actually need
("cells no wider than X meters").

The engine's geometry is unit-sphere radians throughout (kernels,
regions, distjoin, knn); this module is the ONLY place a physical
Earth radius appears, so unit mistakes can't creep into kernels. The
radius is S2Earth's mean radius (6371.01 km, IUGG).
"""

from __future__ import annotations

from . import kernels as K

EARTH_RADIUS_METERS = 6_371_010.0
EARTH_RADIUS_KM = EARTH_RADIUS_METERS / 1000.0


def meters_to_radians(m: float) -> float:
    return m / EARTH_RADIUS_METERS


def radians_to_meters(rad: float) -> float:
    return rad * EARTH_RADIUS_METERS


def km_to_radians(km: float) -> float:
    return km * 1000.0 / EARTH_RADIUS_METERS


def radians_to_km(rad: float) -> float:
    return rad * EARTH_RADIUS_METERS / 1000.0


def level_for_meters(m: float) -> int:
    """Finest S2 level whose min cell width is >= m meters — the level
    at which a 3x3 neighbor stencil certifies an m-meter radius
    (distjoin's contract) and the natural tile size for an m-meter
    query. Clamped to [0, 30]."""
    lvl = K.min_width_max_level(meters_to_radians(m))
    return max(0, min(30, lvl))


def meters_for_level(level: int) -> float:
    """Min cell width of `level` in meters (the inverse view)."""
    return radians_to_meters(K.K_MIN_WIDTH_DERIV / (1 << level))
