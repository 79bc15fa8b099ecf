"""Deterministic demo region set (FIXTURES.md F2 coverage checklist).

Used by __spark_entry__ queries, fixtures generation, and tests. The
shapes exercise: small + large caps, a rect at a pole, an
antimeridian-crossing rect, a convex triangle, a concave quad, and a
polygon with a hole. Boundaries are chosen away from any sf0.01 sample
point by ≥1e-6 rad (asserted at fixture-gen time) so float-boundary
ties cannot flip oracle comparisons.
"""

from __future__ import annotations

import math

from .regions import Cap, Polygon, Polyline, Rect


def demo_regions() -> list:
    return [
        # 1: mid-size cap over central Europe
        Cap.from_latlng_radius(1, 48.1, 11.3, 18.0),
        # 2: large cap in the southern Pacific
        Cap.from_latlng_radius(2, -33.7, -151.2, 25.0),
        # 3: rect over North America
        Rect.from_degrees(3, 24.0, 49.5, -125.5, -66.5),
        # 4: antimeridian-crossing rect (lng wraps: 165 → -165)
        Rect.from_degrees(4, -47.0, -12.0, 165.0, -165.0),
        # 5: polar-band rect (touches the north pole)
        Rect.from_degrees(5, 78.0, 90.0, -180.0, 180.0),
        # 6: convex spherical triangle over South America (CCW)
        Polygon.from_degrees(6, [(0, [(-30.0, -75.0), (-30.0, -35.0), (5.0, -55.0)])]),
        # 7: concave quad over Africa
        Polygon.from_degrees(7, [(0, [(-20.0, 5.0), (-20.0, 45.0), (15.0, 25.0),
                                      (-5.0, 25.0)])]),
        # 8: square over Asia with a square hole (hole loop = depth 1)
        Polygon.from_degrees(8, [
            (0, [(20.0, 70.0), (20.0, 110.0), (50.0, 110.0), (50.0, 70.0)]),
            (1, [(30.0, 82.0), (30.0, 98.0), (42.0, 98.0), (42.0, 82.0)]),
        ]),
    ]


# A tiny cap (< one level-30 cell) — coverer edge case, used in tests only.
def tiny_cap() -> Cap:
    return Cap.from_latlng_radius(99, 10.0, 10.0, 1e-9)


def demo_region_union() -> "RegionUnion":
    """Region 10: union of the southern-Pacific cap (2), the
    antimeridian rect (4) and the South-America triangle (6) — cap 2
    and rect 4 overlap near lng -165, so a point inside BOTH members
    still yields one union row (the dedup semantics the gate pins).
    Kept out of demo_regions() so existing gates/fixtures stay
    byte-stable; its own gate is pip_union_equi."""
    from .regions import RegionUnion
    regs = {r.region_id: r for r in demo_regions()}
    return RegionUnion(10, [regs[2], regs[4], regs[6]])


def demo_hull_points() -> list:
    """40 deterministic LCG (lat, lng) degree points in a ~20° disc
    over South America — the input set for the region-11 convex hull."""
    out = []
    for i in range(40):
        # two LCG steps: a single (i*a + c) never wraps the modulus for
        # small i, which collapsed the disc to ±0.5° in the first cut
        h1 = (i * 48271 + 12345) % 2147483647
        h1 = (h1 * 69621 + 7) % 2147483647
        h2 = (h1 * 48271 + 331) % 2147483647
        r = 20.0 * math.sqrt(h1 / 2147483647)
        th = 2 * math.pi * (h2 / 2147483647)
        out.append((-15.0 + r * math.cos(th), -55.0 + r * math.sin(th)))
    return out


def demo_hull_polygon() -> Polygon:
    """Region 11: spherical convex hull of demo_hull_points as a CCW
    polygon (S2ConvexHullQuery [spec] — the hull itself is pinned by
    an independent gift-wrapping twin in tests/test_cell_geometry.py;
    the pip gate then verifies containment against the independent
    scalar PIP oracle, the same split as the coverer gates). Kept out
    of demo_regions() so earlier gates/fixtures stay byte-stable."""
    from .regions import convex_hull_polygon
    pts = demo_hull_points()
    return convex_hull_polygon(11, [p[0] for p in pts],
                               [p[1] for p in pts])


def demo_polyline() -> Polyline:
    """Region 9: a 4-vertex 'road' across Europe with a 3° buffer —
    the polyline-buffer query (pages within r of a road). Kept out of
    demo_regions() so the round-1 gates/fixtures stay byte-stable; its
    own gate is pip_polyline_equi."""
    return Polyline.from_degrees(
        9, [(43.0, -8.0), (47.5, 2.0), (48.5, 12.0), (52.0, 21.0)], 3.0)
