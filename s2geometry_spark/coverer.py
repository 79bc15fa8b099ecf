"""Region coverer (SURVEY.md §2.1 A29, lifecycle E2′).

Semantics follow ``S2RegionCoverer.swift :: getCovering`` [spec]: start
from the 6 face cells, best-first subdivide the candidate that
intersects the region, keep cells where ``region.may_intersect(cell)``,
mark terminal when ``region.contains_cell(cell)`` (those become
``is_interior`` rows that skip the exact post-filter — the interior
short-circuit of §4.1) or when ``max_level`` is reached, and stop
subdividing once the output budget ``max_cells`` would be exceeded.

Implementation is deliberately NOT a port of the reference's candidate
priority machinery: the conservative cell tests come from bounding-cap
distance bounds (regions.py), and the priority is simply (level asc,
id) — coarsest first — which preserves the only properties the engine
needs (covering ⊇ region, interior ⊆ region, |covering| ≤ max_cells)
while staying ~80 lines of driver-side Python. Regions are ≤10^4 rows
vs 10^12 pages, so coverer cost is immaterial at scale.
"""

from __future__ import annotations

import heapq

import numpy as np

from . import kernels as K

FACE_CELL_IDS = [(f << 61) | (1 << 60) for f in range(6)]


def covering(region, max_cells: int = 64, min_level: int = 0,
             max_level: int = 30) -> list:
    """Best-first covering. Returns list of (cell_id, level, is_interior).

    Invariants (tested in tests/test_coverer.py):
      * union(cells) ⊇ region (every region point is in some cell)
      * is_interior cells ⊆ region
      * len ≤ max(max_cells, 6) and all levels in [min_level, max_level]
    """
    heap = []  # (level, cell_id) — pop coarsest first
    out = []
    for fid in FACE_CELL_IDS:
        if region.may_intersect_cell(fid):
            heapq.heappush(heap, (0, fid))
    while heap:
        lvl, cid = heapq.heappop(heap)
        interior = lvl >= min_level and region.contains_cell(cid)
        if interior or lvl >= max_level:
            out.append((cid, lvl, interior))
            continue
        # would subdividing still fit the budget? 4 children replace 1.
        if lvl >= min_level and len(out) + len(heap) + 4 > max_cells:
            out.append((cid, lvl, False))
            continue
        kids = K.children(np.array([cid], dtype=np.uint64))[0]
        # A cell is exactly the union of its 4 children, so children that
        # fail the conservative may_intersect test are provably disjoint
        # from the region and can be dropped — including all four (the
        # parent's own test was just looser).
        for k in kids:
            if region.may_intersect_cell(int(k)):
                heapq.heappush(heap, (lvl + 1, int(k)))
    return out


def uniform_covering(region, level: int) -> list:
    """All level-`level` cells that may intersect the region.

    The equi-join covering (SURVEY B6): every cell has the same level,
    so `pages.cell_l{level} == covering.cell_id` is a hash join with no
    range predicate. Implemented as the best-first covering driven to
    exactly `level` with an unlimited budget.
    """
    cells = covering(region, max_cells=2 ** 62, min_level=level, max_level=level)
    return [(cid, lvl, interior) for cid, lvl, interior in cells]


def covering_rows(region, max_cells: int = 64, min_level: int = 0,
                  max_level: int = 30, uniform_level: int | None = None):
    """Covering as join-ready dict rows (the `coverings` table, §1.2).

    Emits signed int64 cell ids plus signed-flip order keys for BETWEEN
    range joins (SURVEY §2.2).
    """
    if uniform_level is not None:
        cells = uniform_covering(region, uniform_level)
    else:
        cells = covering(region, max_cells, min_level, max_level)
    rows = []
    for cid, lvl, interior in cells:
        arr = np.array([cid], dtype=np.uint64)
        rows.append({
            "region_id": region.region_id,
            "cell_id": int(K.uint64_to_signed(arr)[0]),
            "level": lvl,
            "range_min_key": int(K.signed_order_key(K.range_min(arr))[0]),
            "range_max_key": int(K.signed_order_key(K.range_max(arr))[0]),
            "is_interior": bool(interior),
        })
    return rows
