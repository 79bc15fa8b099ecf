"""S2CellUnion algebra — SURVEY.md A30/A31.

A cell union is a normalized array of uint64 S2CellIds: sorted in
unsigned id order, no cell contained in another, no 4 sibling cells
left unmerged (they collapse to the parent). Normalized unions make
region algebra a 1-D interval problem via rangeMin/rangeMax
(S2CellUnion.swift :: normalize, contains, intersects, expand [spec]).

Engine use: coverer outputs and kNN rims are unions; at scale the
exploded (region_id, cell_id) form joins against pages, and these
driver-side helpers keep those dimension tables minimal.
"""

from __future__ import annotations

import numpy as np

from . import kernels as K


def normalize(ids) -> np.ndarray:
    """Sort, drop contained cells, merge complete sibling quartets.

    S2CellUnion.swift :: normalize [spec]. Idempotent. O(n log n) sort
    + linear passes; unions are dimension-table sized (<= 10^5), never
    the fact side.
    """
    out = np.unique(np.asarray(ids, dtype=np.uint64))  # sorted unsigned
    if out.size == 0:
        return out
    # drop contained cells. NOTE: an id sorts at the CENTER of its
    # leaf range (trailing marker bit), so a parent appears AFTER its
    # first-half descendants — containment must be checked in both
    # directions while scanning (exactly the reference's loop:
    # skip ids the stack top contains, pop stack ids the new id
    # contains).
    rmin, rmax = K.range_min(out), K.range_max(out)
    stack: list[int] = []   # indexes into out
    for i in range(out.size):
        if stack and rmin[stack[-1]] <= out[i] <= rmax[stack[-1]]:
            continue        # contained in an already-kept ancestor
        while stack and rmin[i] <= out[stack[-1]] <= rmax[i]:
            stack.pop()     # new id is an ancestor of kept ids
        stack.append(i)
    out = out[np.array(stack, dtype=np.int64)]
    # merge sibling quartets bottom-up until fixpoint
    while True:
        if out.size < 4:
            return out
        lvl = K.level(out)
        par = K.parent(np.where(lvl > 0, out, out), np.maximum(lvl, 1) - 1)
        par[lvl == 0] = out[lvl == 0]  # faces have no parent
        merged = False
        keep = np.ones(out.size, dtype=bool)
        new = []
        i = 0
        while i < out.size:
            if (lvl[i] > 0 and i + 3 < out.size
                    and np.all(par[i:i + 4] == par[i])
                    and np.all(lvl[i:i + 4] == lvl[i])):
                new.append(par[i])
                merged = True
                i += 4
            else:
                new.append(out[i])
                i += 1
        out = np.array(new, dtype=np.uint64)
        if not merged:
            return out


def is_normalized(ids) -> bool:
    u = np.asarray(ids, dtype=np.uint64)
    return u.size == normalize(u).size and bool(np.all(normalize(u) == u))


def union_contains_ids(union_ids, query_ids) -> np.ndarray:
    """bool per query id: is it contained in the (normalized) union?
    Binary search on rangeMax — the 1-D interval trick (A13/A14)."""
    u = np.asarray(union_ids, dtype=np.uint64)
    q = np.asarray(query_ids, dtype=np.uint64)
    if u.size == 0:
        return np.zeros(q.shape, dtype=bool)
    rmin, rmax = K.range_min(u), K.range_max(u)
    idx = np.searchsorted(rmax, q, side="left")
    idx = np.clip(idx, 0, u.size - 1)
    return (rmin[idx] <= q) & (q <= rmax[idx])


def unions_intersect(a_ids, b_ids) -> bool:
    """Do two normalized unions share any point? Merge-scan on the
    disjoint leaf-id intervals."""
    a = np.asarray(a_ids, dtype=np.uint64)
    b = np.asarray(b_ids, dtype=np.uint64)
    if a.size == 0 or b.size == 0:
        return False
    ai = bi = 0
    amin, amax = K.range_min(a), K.range_max(a)
    bmin, bmax = K.range_min(b), K.range_max(b)
    while ai < a.size and bi < b.size:
        if amax[ai] < bmin[bi]:
            ai += 1
        elif bmax[bi] < amin[ai]:
            bi += 1
        else:
            return True
    return False


def intersect(a_ids, b_ids) -> np.ndarray:
    """Normalized intersection of two normalized unions: for each
    overlapping pair keep the deeper (smaller-range) cell — exact
    because normalized unions' cells are nested-or-disjoint."""
    a = np.asarray(a_ids, dtype=np.uint64)
    b = np.asarray(b_ids, dtype=np.uint64)
    out = []
    ai = bi = 0
    amin, amax = K.range_min(a), K.range_max(a)
    bmin, bmax = K.range_min(b), K.range_max(b)
    while ai < a.size and bi < b.size:
        if amax[ai] < bmin[bi]:
            ai += 1
        elif bmax[bi] < amin[ai]:
            bi += 1
        else:
            if amax[ai] - amin[ai] <= bmax[bi] - bmin[bi]:
                out.append(a[ai])
                ai += 1
            else:
                out.append(b[bi])
                bi += 1
    return normalize(np.array(out, dtype=np.uint64)) if out else \
        np.array([], dtype=np.uint64)


def union(a_ids, b_ids) -> np.ndarray:
    return normalize(np.concatenate([
        np.asarray(a_ids, dtype=np.uint64),
        np.asarray(b_ids, dtype=np.uint64)]))


def expand(ids) -> np.ndarray:
    """Buffer the union by one rim of same-level neighbors per cell
    (S2CellUnion.swift :: expand [spec], specialized to each cell's own
    level — the kNN-rim use case; arbitrary-level rims are composed by
    first normalizing to that level)."""
    u = np.asarray(ids, dtype=np.uint64)
    if u.size == 0:
        return u
    rings = K.all_neighbors(u)
    return normalize(np.concatenate([u] + [r for r in rings]))
