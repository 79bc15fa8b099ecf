"""Stage-1 gate (SURVEY.md §5.2.1–2): vectorized kernels ≡ independent
scalar oracle on boundary grids + seeded random points, all levels.
No Spark involved — pure numpy vs pure Python."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark import kernels as K
from tests import oracle_s2 as O

RNG = np.random.default_rng(42)


def _boundary_grid():
    """Poles, antimeridian, face centers/corners, equator crossings."""
    lats, lngs = [], []
    special_lat = [-90.0, -89.9999999, -45.0, -0.0000001, 0.0, 0.0000001,
                   35.26438968275465,  # atan(1/sqrt(2)) — cube corner latitude
                   45.0, 89.9999999, 90.0]
    special_lng = [-180.0, -179.9999999, -135.0, -90.0, -45.0, -0.0000001,
                   0.0, 0.0000001, 45.0, 90.0, 135.0, 179.9999999, 180.0]
    for la in special_lat:
        for ln in special_lng:
            lats.append(la)
            lngs.append(ln)
    return np.array(lats), np.array(lngs)


def _random_points(n=100_000):
    lat = RNG.uniform(-90.0, 90.0, n)
    lng = RNG.uniform(-180.0, 180.0, n)
    return lat, lng


@pytest.fixture(scope="module")
def sample_points():
    bl, bg = _boundary_grid()
    rl, rg = _random_points()
    return np.concatenate([bl, rl]), np.concatenate([bg, rg])


@pytest.fixture(scope="module")
def sample_cells(sample_points):
    lat, lng = sample_points
    return K.latlng_degrees_to_cell_id(lat, lng)


def test_leaf_encode_matches_oracle(sample_points, sample_cells):
    lat, lng = sample_points
    ids = sample_cells
    # oracle is scalar — check the full boundary grid + a 5k slice of randoms
    n_check = len(_boundary_grid()[0]) + 5000
    for k in range(n_check):
        expected = O.latlng_degrees_to_cell_id(float(lat[k]), float(lng[k]))
        assert int(ids[k]) == expected, (lat[k], lng[k])


def test_leaf_ids_are_valid_leaves(sample_cells):
    assert np.all(sample_cells & np.uint64(1) == np.uint64(1))
    assert np.all(K.level(sample_cells) == K.MAX_LEVEL)
    faces = (sample_cells >> np.uint64(61)).astype(np.int64)
    assert faces.min() >= 0 and faces.max() <= 5


def test_decode_roundtrip(sample_cells):
    face, i, j = K.to_face_ij(sample_cells)
    re = K.from_face_ij(face, i, j)
    assert np.array_equal(re, sample_cells)
    # scalar oracle agrees on a slice
    for k in range(2000):
        f, ii, jj = O.to_face_ij(int(sample_cells[k]))
        assert (f, ii, jj) == (int(face[k]), int(i[k]), int(j[k]))


def test_level_parent_children_ranges_vs_oracle(sample_cells):
    ids = sample_cells[:2000]
    for lvl in [0, 1, 4, 8, 12, 15, 20, 25, 29, 30]:
        par = K.parent(ids, lvl)
        for k in range(0, 2000, 97):
            assert int(par[k]) == O.parent(int(ids[k]), lvl)
        assert np.all(K.level(par) == lvl)
        # parent contains child
        assert np.all(K.range_min(par) <= ids)
        assert np.all(ids <= K.range_max(par))
    rmin, rmax = K.range_min(ids), K.range_max(ids)
    for k in range(0, 2000, 53):
        assert int(rmin[k]) == O.range_min(int(ids[k]))
        assert int(rmax[k]) == O.range_max(int(ids[k]))


def test_children_algebra(sample_cells):
    for lvl in [0, 5, 10, 20, 29]:
        par = np.unique(K.parent(sample_cells[:5000], lvl))[:200]
        ch = K.children(par)
        assert ch.shape == (len(par), 4)
        # children are at level+1, within parent's range, parent(child)==id
        for c in range(4):
            assert np.all(K.level(ch[:, c]) == lvl + 1)
            assert np.all(K.parent(ch[:, c], lvl) == par)
            assert np.all(K.range_min(par) <= ch[:, c])
            assert np.all(ch[:, c] <= K.range_max(par))
        for k in range(0, len(par), 17):
            assert O.children(int(par[k])) == [int(v) for v in ch[k]]


def test_hierarchy_contains(sample_cells):
    ids = sample_cells[:1000]
    par = K.parent(ids, 10)
    assert np.all(K.contains(par, ids))
    assert not np.any(K.contains(ids, par) & (K.level(ids) != K.level(par)))


def test_signed_views(sample_cells):
    ids = sample_cells[:5000]
    s = K.uint64_to_signed(ids)
    assert np.array_equal(K.signed_to_uint64(s), ids)
    # signed_order_key preserves uint64 ordering
    key = K.signed_order_key(ids)
    order_u = np.argsort(ids, kind="stable")
    order_k = np.argsort(key, kind="stable")
    assert np.array_equal(order_u, order_k)


def test_tokens_roundtrip(sample_cells):
    ids = sample_cells[:500]
    toks = K.token_of(ids)
    assert np.array_equal(K.token_to_id(toks), ids)
    for k in range(0, 500, 29):
        assert toks[k] == O.token_of(int(ids[k]))


def test_edge_neighbors_vs_oracle_and_symmetry(sample_cells):
    for lvl in [1, 5, 10, 20, 30]:
        ids = np.unique(K.parent(sample_cells[:3000], lvl))[:150]
        nbrs = K.edge_neighbors(ids)
        assert np.all(K.level(nbrs.ravel()) == lvl)
        for k in range(0, len(ids), 7):
            assert O.edge_neighbors(int(ids[k])) == [int(v) for v in nbrs[k]]
        # symmetry: a ∈ edge_neighbors(b) ⇔ b ∈ edge_neighbors(a)
        for k in range(0, len(ids), 13):
            for nb in nbrs[k]:
                back = K.edge_neighbors(np.array([nb], dtype=np.uint64))
                assert int(ids[k]) in [int(v) for v in back[0]]


def test_all_neighbors_vs_oracle(sample_cells):
    for lvl in [2, 8, 16, 30]:
        ids = np.unique(K.parent(sample_cells[:3000], lvl))[:100]
        rings = K.all_neighbors(ids)
        assert len(rings) == 8
        for k in range(0, len(ids), 9):
            got = sorted(int(r[k]) for r in rings)
            assert got == sorted(O.all_neighbors(int(ids[k])))
        # ring cells are distinct from the center and adjacent
        for r in rings:
            assert not np.any(r == ids)


def test_face_cells():
    """fromFacePosLevel(face, 0, 0) fixed vectors: face cell ids."""
    for f in range(6):
        fid = (f << 61) | (1 << 60)
        assert O.level(fid) == 0
        assert K.level(np.array([fid], dtype=np.uint64))[0] == 0
        # center of face f maps back to face f
        lat, lng = K.cell_id_to_latlng_degrees(np.array([fid], dtype=np.uint64))
        rid = K.latlng_degrees_to_cell_id(lat, lng)
        assert K.parent(rid, 0)[0] == np.uint64(fid)


def test_cell_center_roundtrip(sample_cells):
    """center(cell) re-encodes into the same cell at every tested level."""
    for lvl in [0, 3, 7, 12, 18, 24, 30]:
        ids = np.unique(K.parent(sample_cells[:5000], lvl))[:300]
        lat, lng = K.cell_id_to_latlng_degrees(ids)
        leaf = K.latlng_degrees_to_cell_id(lat, lng)
        assert np.array_equal(K.parent(leaf, lvl), ids)


def test_cap_predicate_vs_oracle(sample_points):
    lat, lng = sample_points
    lat_r, lng_r = np.radians(lat[:20000]), np.radians(lng[:20000])
    x, y, z = K.latlng_to_xyz(lat_r, lng_r)
    import math
    for (clat, clng, radius_deg) in [(0.0, 0.0, 10.0), (48.0, 11.0, 3.0),
                                     (-90.0, 0.0, 30.0), (10.0, 179.5, 5.0)]:
        cx, cy, cz = O.latlng_to_xyz(math.radians(clat), math.radians(clng))
        height = 1.0 - math.cos(math.radians(radius_deg))
        got = K.cap_contains_points(cx, cy, cz, height, x, y, z)
        for k in range(0, 20000, 487):
            assert bool(got[k]) == O.cap_contains(cx, cy, cz, height,
                                                  float(x[k]), float(y[k]), float(z[k]))
        assert got.sum() > 0  # caps chosen to be non-empty on the sample


def test_rect_predicate_wrapping(sample_points):
    lat, lng = sample_points
    lat_r, lng_r = np.radians(lat[:20000]), np.radians(lng[:20000])
    import math
    rects = [
        (math.radians(-10), math.radians(10), math.radians(-20), math.radians(20)),
        # antimeridian-crossing rect: lng_lo > lng_hi wraps
        (math.radians(-30), math.radians(30), math.radians(170), math.radians(-170)),
        (math.radians(80), math.radians(90), math.radians(-180), math.radians(180)),
    ]
    for (lo, hi, glo, ghi) in rects:
        got = K.rect_contains_latlng(lo, hi, glo, ghi, lat_r, lng_r)
        for k in range(0, 20000, 331):
            assert bool(got[k]) == O.rect_contains(lo, hi, glo, ghi,
                                                   float(lat_r[k]), float(lng_r[k]))
        assert got.sum() > 0


def test_loop_pip_vs_oracle(sample_points):
    import math
    lat, lng = sample_points
    lat_r, lng_r = np.radians(lat[:10000]), np.radians(lng[:10000])
    x, y, z = K.latlng_to_xyz(lat_r, lng_r)
    # CCW triangle over central Europe + a concave quad
    loops = [
        [(40.0, 0.0), (40.0, 20.0), (55.0, 10.0)],
        [(-10.0, -60.0), (-10.0, -40.0), (5.0, -50.0), (-2.0, -50.0)],
    ]
    from s2geometry_spark.exact import loop_contains_with_fallback
    n_boundary = len(_boundary_grid()[0])
    for verts_deg in loops:
        verts = [(math.radians(a), math.radians(b)) for a, b in verts_deg]
        vlat = np.array([v[0] for v in verts])
        vlng = np.array([v[1] for v in verts])
        got = loop_contains_with_fallback(vlat, vlng, x, y, z)
        flags = K.pip_degenerate_flags(vlat, vlng, x, y, z)
        # genuinely-degenerate rows only occur on the boundary grid
        # (poles lie on meridian-edge great circles); random points never
        assert np.all(np.nonzero(flags)[0] < n_boundary)
        for k in list(range(0, 10000, 173)) + list(np.nonzero(flags)[0]):
            assert bool(got[k]) == O.loop_contains(verts, (float(x[k]), float(y[k]), float(z[k])))
        assert 0 < got.sum() < len(got)


class TestBoundaryPip:
    """Spec edge-or-vertex crossing rule (exact.py): points EXACTLY on
    loop vertices/edges get deterministic, subdivision-consistent
    answers — in a set of loops tiling a region, every boundary point
    belongs to exactly one loop (the property the spec's vertexCrossing
    + symbolic perturbation exist to provide)."""

    @staticmethod
    def _contains(verts_deg, p_deg):
        import math

        from s2geometry_spark.exact import loop_contains_exact
        vlat = np.array([math.radians(a) for a, _ in verts_deg])
        vlng = np.array([math.radians(b) for _, b in verts_deg])
        la, ln = math.radians(p_deg[0]), math.radians(p_deg[1])
        cl = math.cos(la)
        return loop_contains_exact(
            vlat, vlng, cl * math.cos(ln), cl * math.sin(ln), math.sin(la))

    def test_point_on_shared_edge_in_exactly_one_triangle(self):
        # Equator edge A-B: lat=0 makes z == 0.0 exactly, so the
        # orientation det of (A, B, P) is an EXACT float zero -> the
        # simulation-of-simplicity tie-break decides, and antisymmetry
        # must put P in exactly one of the two triangles sharing A-B.
        A, B = (0.0, 0.0), (0.0, 10.0)
        up = [A, B, (10.0, 5.0)]     # interior north of the equator
        down = [B, A, (-10.0, 5.0)]  # shares edge, opposite direction
        for lng in (2.0, 5.0, 7.5):
            p = (0.0, lng)
            got = [self._contains(up, p), self._contains(down, p)]
            assert sum(got) == 1, (p, got)

    def test_point_on_vertex_in_exactly_one_tile(self):
        # Four lat/lng quads meeting at V=(10,10); querying V itself
        # exercises the spec vertexCrossing wedge rule (OrderedCCW
        # around the shared vertex from the Ortho reference).
        V = (10.0, 10.0)
        quads = [
            [(0.0, 0.0), (0.0, 10.0), V, (10.0, 0.0)],
            [(0.0, 10.0), (0.0, 20.0), (10.0, 20.0), V],
            [(10.0, 0.0), V, (20.0, 10.0), (20.0, 0.0)],
            [V, (10.0, 20.0), (20.0, 20.0), (20.0, 10.0)],
        ]
        got = [self._contains(q, V) for q in quads]
        assert sum(got) == 1, got
        # a vertex of a single isolated loop is deterministic & stable
        assert self._contains(quads[0], V) == got[0]

    def test_interior_and_exterior_points_unaffected(self):
        tri = [(0.0, 0.0), (0.0, 10.0), (10.0, 5.0)]
        assert self._contains(tri, (3.0, 5.0))
        assert not self._contains(tri, (-3.0, 5.0))
        assert not self._contains(tri, (30.0, 5.0))

    def test_on_edge_point_deterministic_with_fallback_path(self):
        # end-to-end through the vectorized fast path + flagged exact
        # recompute: the on-edge point must not crash and must agree
        # with the scalar exact answer on repeated evaluation.
        import math

        from s2geometry_spark.exact import (loop_contains_exact,
                                            loop_contains_with_fallback)
        tri = [(0.0, 0.0), (0.0, 10.0), (10.0, 5.0)]
        vlat = np.array([math.radians(a) for a, _ in tri])
        vlng = np.array([math.radians(b) for _, b in tri])
        pts_deg = [(0.0, 5.0), (3.0, 5.0), (0.0, 0.0), (-2.0, 5.0)]
        la = np.radians(np.array([p[0] for p in pts_deg]))
        ln = np.radians(np.array([p[1] for p in pts_deg]))
        x, y, z = K.latlng_to_xyz(la, ln)
        got = loop_contains_with_fallback(vlat, vlng, x, y, z)
        for i in range(len(pts_deg)):
            assert bool(got[i]) == loop_contains_exact(
                vlat, vlng, float(x[i]), float(y[i]), float(z[i]))
        assert bool(got[1]) and not bool(got[3])


class TestBoundaryPipHoles:
    """Edge-or-vertex rule composed with hole parity (A27): points
    exactly on a HOLE's vertices/edges must also resolve to exactly
    one side, and shell/hole parity must not double-count."""

    @staticmethod
    def _poly(loops_deg):
        from s2geometry_spark.regions import Polygon
        return Polygon.from_degrees(77, loops_deg)

    @staticmethod
    def _pt(lat, lng):
        import math
        la, ln = math.radians(lat), math.radians(lng)
        cl = math.cos(la)
        return (cl * math.cos(ln), cl * math.sin(ln), math.sin(la))

    def test_point_on_hole_edge_single_sided(self):
        # shell with a hole whose southern edge lies on the equator:
        # z == 0 exactly -> exact-zero orientation ties on that edge
        shell = [(-10.0, 0.0), (-10.0, 20.0), (20.0, 20.0), (20.0, 0.0)]
        hole = [(0.0, 5.0), (10.0, 5.0), (10.0, 15.0), (0.0, 15.0)]
        poly = self._poly([(0, shell), (1, hole)])
        # the hole region itself (same ring, shell orientation)
        hole_as_shell = self._poly([(0, list(reversed(hole)))])
        for lng in (7.0, 10.0, 12.5):
            p = self._pt(0.0, lng)  # exactly on the hole's equator edge
            in_poly = poly.contains_point(p)
            in_hole = hole_as_shell.contains_point(p)
            # the two regions tile the shell: exactly one claims p
            assert in_poly != in_hole, (lng, in_poly, in_hole)

    def test_point_on_hole_vertex_single_sided(self):
        shell = [(-10.0, 0.0), (-10.0, 20.0), (20.0, 20.0), (20.0, 0.0)]
        hole = [(0.0, 5.0), (10.0, 5.0), (10.0, 15.0), (0.0, 15.0)]
        poly = self._poly([(0, shell), (1, hole)])
        hole_as_shell = self._poly([(0, list(reversed(hole)))])
        for v in hole:
            p = self._pt(*v)
            assert poly.contains_point(p) != hole_as_shell.contains_point(p), v

    def test_interior_points_unchanged(self):
        shell = [(-10.0, 0.0), (-10.0, 20.0), (20.0, 20.0), (20.0, 0.0)]
        hole = [(0.0, 5.0), (10.0, 5.0), (10.0, 15.0), (0.0, 15.0)]
        poly = self._poly([(0, shell), (1, hole)])
        assert poly.contains_point(self._pt(-5.0, 10.0))   # in shell ring
        assert not poly.contains_point(self._pt(5.0, 10.0))  # in hole
        assert not poly.contains_point(self._pt(30.0, 10.0))  # outside
