"""Region coverer (SURVEY.md §2.1 A29, lifecycle E2′).

Semantics follow ``S2RegionCoverer.swift :: getCovering`` [spec]: start
from the 6 face cells, subdivide cells that intersect the region, keep
cells where ``region.may_intersect(cell)``, mark terminal when
``region.contains_cell(cell)`` (those become ``is_interior`` rows that
skip the exact post-filter — the interior short-circuit of §4.1) or
when ``max_level`` is reached, and stop subdividing once the output
budget ``max_cells`` would be exceeded.

Implementation is deliberately NOT a port of the reference's per-cell
best-first priority queue: the conservative cell tests come from
bounding-cap distance bounds (regions.py) and subdivision is
level-synchronous so each round is one *vectorized* numpy region test
over the whole frontier. This preserves the only properties the engine
needs (covering ⊇ region, interior ⊆ region, |covering| ≤ max_cells,
cells disjoint). Regions are ≤10^4 rows vs 10^12 pages, so coverer
cost is driver-side and immaterial at scale.
"""

from __future__ import annotations

import numpy as np

from . import kernels as K

FACE_CELL_IDS = [(f << 61) | (1 << 60) for f in range(6)]


def covering(region, max_cells: int = 64, min_level: int = 0,
             max_level: int = 30) -> list:
    """Level-synchronous vectorized covering.

    Returns list of (cell_id, level, is_interior). Each round tests the
    whole frontier with ONE vectorized region call (numpy over cell
    centers — regions.py may_intersect_cells/contains_cells), so the
    coverer costs ~max_level numpy calls instead of per-cell Python.
    Cells whose children all fail may_intersect are dropped (a cell is
    exactly the union of its children). When subdividing the frontier
    would exceed max_cells, the remaining frontier is emitted as-is.

    Invariants (tested in tests/test_coverer.py):
      * union(cells) ⊇ region
      * is_interior cells ⊆ region
      * len ≤ max(max_cells, 6); levels in [min_level, max_level]
      * cells pairwise disjoint (each cell emitted XOR subdivided)
    """
    frontier = np.array(FACE_CELL_IDS, dtype=np.uint64)
    frontier = frontier[region.may_intersect_cells(frontier)]
    out = []
    lvl = 0
    while len(frontier):
        if lvl >= min_level:
            interior = region.contains_cells(frontier)
            out.extend((int(c), lvl, True) for c in frontier[interior])
            frontier = frontier[~interior]
            if not len(frontier):
                break
        if lvl >= max_level or (lvl >= min_level
                                and len(out) + 4 * len(frontier) > max_cells):
            out.extend((int(c), lvl, False) for c in frontier)
            break
        kids = K.children(frontier).ravel()
        frontier = kids[region.may_intersect_cells(kids)]
        lvl += 1
    return out


def uniform_covering(region, level: int) -> list:
    """All level-`level` cells that may intersect the region.

    The equi-join covering (SURVEY B6): every cell has the same level,
    so `pages.cell_l{level} == covering.cell_id` is a hash join with no
    range predicate.
    """
    return covering(region, max_cells=2 ** 62, min_level=level, max_level=level)


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
