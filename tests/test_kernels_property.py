"""Property-based kernel tests (hypothesis) — SURVEY.md §5.2 extension.

These complement the fixed-grid + seeded-random oracle tests in
test_kernels.py with adversarially-shrunk random inputs: hypothesis
hunts the boundary cases (poles, antimeridian, face edges, level
extremes) that fixed seeds can miss.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from s2geometry_spark import kernels as K
from s2geometry_spark import unions as U
import tests.oracle_s2 as O

lat_deg = st.floats(min_value=-90.0, max_value=90.0,
                    allow_nan=False, allow_infinity=False)
lng_deg = st.floats(min_value=-180.0, max_value=180.0,
                    allow_nan=False, allow_infinity=False)
levels = st.integers(min_value=0, max_value=30)


@settings(max_examples=300, deadline=None)
@given(lat_deg, lng_deg)
def test_cell_id_matches_scalar_oracle(lat, lng):
    got = int(K.latlng_degrees_to_cell_id(
        np.array([lat]), np.array([lng]))[0])
    assert got == O.latlng_degrees_to_cell_id(lat, lng)


@settings(max_examples=200, deadline=None)
@given(lat_deg, lng_deg, levels)
def test_parent_range_level_algebra(lat, lng, lvl):
    leaf = K.latlng_degrees_to_cell_id(np.array([lat]), np.array([lng]))
    p = K.parent(leaf, lvl)
    assert int(K.level(p)[0]) == lvl
    assert int(K.range_min(p)[0]) <= int(leaf[0]) <= int(K.range_max(p)[0])
    if lvl < 30:
        kids = K.children(p)[0]
        assert all(int(K.parent(np.array([c], dtype=np.uint64), lvl)[0])
                   == int(p[0]) for c in kids)
        # children partition the parent's leaf range
        rmins = sorted(int(K.range_min(np.array([c], dtype=np.uint64))[0])
                       for c in kids)
        assert rmins[0] == int(K.range_min(p)[0])


@settings(max_examples=150, deadline=None)
@given(lat_deg, lng_deg, st.integers(min_value=0, max_value=29))
def test_token_round_trip_and_neighbor_symmetry(lat, lng, lvl):
    cell = K.parent(K.latlng_degrees_to_cell_id(
        np.array([lat]), np.array([lng])), lvl)
    tok = K.token_of(cell)[0]
    assert int(K.token_to_id([tok])[0]) == int(cell[0])
    nbrs = K.edge_neighbors(cell)[0]
    for nb in nbrs:
        back = K.edge_neighbors(np.array([nb], dtype=np.uint64))[0]
        assert int(cell[0]) in {int(b) for b in back}


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(lat_deg, lng_deg, st.integers(2, 12)),
                min_size=1, max_size=12))
def test_union_normalize_properties(points):
    ids = np.array([
        int(K.parent(K.latlng_degrees_to_cell_id(
            np.array([la]), np.array([ln])), lv)[0])
        for la, ln, lv in points], dtype=np.uint64)
    norm = U.normalize(ids)
    assert U.is_normalized(norm)
    # every input cell's center remains covered
    assert bool(np.all(U.union_contains_ids(norm, ids)))
    # idempotent
    assert np.array_equal(U.normalize(norm), norm)
