"""Scalar exact-arithmetic fallback for near-degenerate PIP rows.

SURVEY.md §2.4: the float64 fast path in ``kernels.loop_contains_points``
flags rows whose orientation determinants are below threshold
(``kernels.pip_degenerate_flags``); those rows — typically points lying
exactly on an edge's great circle, e.g. poles vs meridian edges — are
recomputed here with exact rational arithmetic over the float64 vertex
values (S2EdgeUtil.swift :: robustCrossing exact tail [spec]; the
symbolic-perturbation step is unnecessary because a zero exact
determinant means "on the boundary", which we resolve with the spec's
edge-or-vertex rule approximated as boundary-exclusive — pinned by
fixture tests).
"""

from __future__ import annotations

import math
from fractions import Fraction

from .kernels import ORIGIN


def _det_sign_exact(a, b, c) -> int:
    d = (a[0] * (b[1] * c[2] - b[2] * c[1])
         - a[1] * (b[0] * c[2] - b[2] * c[0])
         + a[2] * (b[0] * c[1] - b[1] * c[0]))
    if abs(d) >= 1e-14:
        return 1 if d > 0 else -1
    fa = tuple(Fraction(t) for t in a)
    fb = tuple(Fraction(t) for t in b)
    fc = tuple(Fraction(t) for t in c)
    fd = (fa[0] * (fb[1] * fc[2] - fb[2] * fc[1])
          - fa[1] * (fb[0] * fc[2] - fb[2] * fc[0])
          + fa[2] * (fb[0] * fc[1] - fb[1] * fc[0]))
    return (fd > 0) - (fd < 0)


def loop_contains_exact(loop_lats, loop_lngs, px: float, py: float, pz: float) -> bool:
    """Crossing-parity PIP with exact determinant signs (single point)."""
    verts = []
    for la, ln in zip(loop_lats, loop_lngs):
        cl = math.cos(la)
        verts.append((cl * math.cos(ln), cl * math.sin(ln), math.sin(la)))
    o = tuple(ORIGIN)
    p = (px, py, pz)
    n = len(verts)
    inside = False
    for k in range(n):
        a, b = verts[k], verts[(k + 1) % n]
        s1 = _det_sign_exact(o, p, a)
        s2 = _det_sign_exact(o, p, b)
        s3 = _det_sign_exact(a, b, o)
        s4 = _det_sign_exact(a, b, p)
        # spec EdgeCrosser rule — see kernels.loop_contains_points
        if s1 != 0 and s2 == -s1 and s4 == s1 and s3 == -s1:
            inside = not inside
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
                                          float(px[idx]), float(py[idx]), float(pz[idx]))
    return inside
