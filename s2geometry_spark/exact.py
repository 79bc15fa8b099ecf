"""Scalar exact-arithmetic tail for degenerate PIP rows — the spec's
edge-or-vertex crossing rule (S2EdgeUtil.swift :: edgeOrVertexCrossing,
S2.swift :: robustCCW [spec]).

The float64 fast path in ``kernels.loop_contains_points`` flags rows
whose orientation determinants are below threshold
(``kernels.pip_degenerate_flags``); those rows — points exactly or
nearly on a loop vertex/edge — are recomputed here with:

* **exact rational signs** (Fraction over the float64 bit values), and
* **deterministic nonzero resolution of true ties**:
  - a query point that coincides bit-exactly with a loop vertex takes
    the spec's shared-vertex rule (`vertexCrossing`: OrderedCCW wedge
    test around the shared vertex from an Ortho reference [spec]) — so
    in a subdivision, EXACTLY ONE of the loops meeting at that vertex
    contains the point;
  - a point strictly interior to an edge's great circle (exact
    determinant zero, all four points distinct) is resolved by
    simulation-of-simplicity: sort the three points lexicographically
    (tracking permutation parity, which makes the perturbed sign
    antisymmetric and therefore parity-consistent across edges), then
    perturb the lexicographically-largest point by (eps, eps^2, eps^3);
    the sign is the first nonzero component of cross(x1, x2). This is
    the same construction as the spec's symbolicallyPerturbedSign
    [spec] with a simplified (single-level) perturbation sequence —
    identical guarantees (deterministic, never zero for distinct
    points, adjacent regions sharing the edge split the point exactly
    one way), possibly differing from the C++ sequence in WHICH side
    wins a tie. Documented divergence, pinned by tests
    (tests/test_kernels.py::TestBoundaryPip).

Antipodal or duplicate point pairs inside an orientation test have no
consistent perturbation at this level and raise ValueError (a valid
loop never produces them; origin-antipodal data points are excluded by
region prep).
"""

from __future__ import annotations

import math
from fractions import Fraction

from .kernels import ORIGIN

_ORTHO_TEMP = (0.012, 0.0053, 0.00457)  # spec S2::Ortho constants


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _det(a, b, c):
    cx = _cross(b, c)
    return a[0] * cx[0] + a[1] * cx[1] + a[2] * cx[2]


def _frac(p):
    return tuple(Fraction(t) for t in p)


def sos_sign(a, b, c) -> int:
    """Orientation sign, exact + simulation-of-simplicity: never 0 for
    three distinct, non-degenerate points (module docstring)."""
    d = _det(a, b, c)
    # float fast path: |triple product| of unit vectors has rounding
    # error < ~1e-15, so 1e-14 certainly has the true sign
    if abs(d) >= 1e-14:
        return 1 if d > 0 else -1
    fa, fb, fc = _frac(a), _frac(b), _frac(c)
    fd = _det(fa, fb, fc)
    if fd != 0:
        return 1 if fd > 0 else -1
    pts = (fa, fb, fc)
    order = sorted(range(3), key=lambda i: pts[i])
    # permutation parity: 3-element permutations are even iff identity
    # or a 3-cycle
    parity = 1 if order in ([0, 1, 2], [1, 2, 0], [2, 0, 1]) else -1
    x1, x2, x3 = pts[order[0]], pts[order[1]], pts[order[2]]
    if x1 == x2 or x2 == x3 or x1 == x3:
        raise ValueError("duplicate points in orientation test")
    cx = _cross(x1, x2)
    for comp in cx:
        if comp != 0:
            return parity * (1 if comp > 0 else -1)
    raise ValueError("antipodal points in orientation test")


def _largest_abs_component(a) -> int:
    """Spec tie behavior: x beats y/z only strictly; z wins all-equal."""
    x, y, z = abs(a[0]), abs(a[1]), abs(a[2])
    if x > y:
        return 0 if x > z else 2
    return 1 if y > z else 2


def _ortho(a):
    """Exact-arithmetic twin of S2::Ortho [spec]: a vector orthogonal
    to `a` (not normalized — sign tests are scale-invariant)."""
    k = _largest_abs_component(a) - 1
    if k < 0:
        k = 2
    temp = list(_frac(_ORTHO_TEMP))
    temp[k] = Fraction(1)
    return _cross(a, tuple(temp))


def _ordered_ccw(a, b, c, o) -> bool:
    """S2::OrderedCCW [spec]: edges OA, OB, OC occur in that order
    sweeping CCW around O starting at A (B inside wedge (A, C))."""
    total = 0
    if sos_sign(b, o, a) >= 0:
        total += 1
    if sos_sign(c, o, b) >= 0:
        total += 1
    if sos_sign(a, o, c) > 0:
        total += 1
    return total >= 2


def vertex_crossing(a, b, c, d) -> bool:
    """Spec vertexCrossing rule for edges AB, CD sharing >= 1 vertex
    (S2EdgeUtil.swift :: vertexCrossing [spec]): defines "crossing" so
    that counting edge crossings gives consistent point-in-polygon
    containment when the query point IS a vertex."""
    if a == b or c == d:
        return False
    if a == c:
        return (b == d) or _ordered_ccw(_ortho(_frac(a)), _frac(d),
                                        _frac(b), _frac(a))
    if b == d:
        return _ordered_ccw(_ortho(_frac(b)), _frac(c),
                            _frac(a), _frac(b))
    if a == d:
        return (b == c) or _ordered_ccw(_ortho(_frac(a)), _frac(c),
                                        _frac(b), _frac(a))
    if b == c:
        return _ordered_ccw(_ortho(_frac(b)), _frac(d),
                            _frac(a), _frac(b))
    return False


def edge_or_vertex_crossing(o, p, a, b) -> bool:
    """Spec edgeOrVertexCrossing for arc (o, p) vs loop edge (a, b):
    shared-vertex cases go to vertex_crossing; all other signs are
    nonzero via sos_sign, so the 4-sign minor-arc crossing rule (same
    rule as the vectorized fast path) applies directly."""
    if p == a or p == b or o == a or o == b:
        return vertex_crossing(o, p, a, b)
    s1 = sos_sign(o, p, a)
    s2 = sos_sign(o, p, b)
    if s2 != -s1:
        return False
    s3 = sos_sign(a, b, o)
    s4 = sos_sign(a, b, p)
    return s4 == s1 and s3 == -s1


def loop_contains_exact(loop_lats, loop_lngs, px: float, py: float,
                        pz: float) -> bool:
    """Crossing-parity PIP with exact signs + the edge-or-vertex rule
    (single point). Assumes ORIGIN is outside the loop (region prep
    asserts this for all fixture polygons — regions.py)."""
    verts = []
    for la, ln in zip(loop_lats, loop_lngs):
        cl = math.cos(la)
        verts.append((cl * math.cos(ln), cl * math.sin(ln), math.sin(la)))
    o = tuple(float(t) for t in ORIGIN)
    p = (float(px), float(py), float(pz))
    n = len(verts)
    inside = False
    for k in range(n):
        a, b = verts[k], verts[(k + 1) % n]
        inside ^= edge_or_vertex_crossing(o, p, a, b)
    return inside


def loop_contains_with_fallback(loop_lats, loop_lngs, px, py, pz):
    """Vectorized fast path + exact recompute of flagged rows.

    This is the function PIP operators call (operators/pip_join.py).
    """
    import numpy as np

    from . import kernels as K

    inside = K.loop_contains_points(loop_lats, loop_lngs, px, py, pz)
    flags = K.pip_degenerate_flags(loop_lats, loop_lngs, px, py, pz)
    for idx in np.nonzero(flags)[0]:
        inside[idx] = loop_contains_exact(loop_lats, loop_lngs,
                                          float(px[idx]), float(py[idx]),
                                          float(pz[idx]))
    return inside
