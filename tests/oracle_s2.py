"""Independent pure-Python scalar S2 oracle (SURVEY.md §5.2.1).

Deliberately shares NO code with ``s2geometry_spark/kernels.py``:
- Hilbert encode/decode here is the per-bit loop over the small 4-entry
  IJ_TO_POS / POS_TO_IJ tables (the numpy kernel uses the 1024-entry
  4-bit lookup tables) — a genuinely different code path.
- All arithmetic is Python ints / math module floats.

Anchors: public S2 spec (S2CellId.swift / S2Projections.swift /
S2Cap.swift / S2LatLngRect.swift / S2Loop.swift [spec] — reference
checkout empty, SURVEY.md §0).

st→ij rounding pinned to floor(s * 2**30) clamped — same rule as the
kernel (SURVEY A7 ⚠).
"""

from __future__ import annotations

import math

MAX_LEVEL = 30
MAX_SIZE = 1 << MAX_LEVEL
SWAP_MASK = 1
INVERT_MASK = 2

POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)
POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
IJ_TO_POS = ((0, 1, 3, 2), (0, 3, 1, 2), (2, 3, 1, 0), (2, 1, 3, 0))

MASK64 = (1 << 64) - 1


# -- lat/lng → xyz -----------------------------------------------------------

def latlng_to_xyz(lat_rad: float, lng_rad: float):
    cl = math.cos(lat_rad)
    return cl * math.cos(lng_rad), cl * math.sin(lng_rad), math.sin(lat_rad)


def xyz_to_latlng(x: float, y: float, z: float):
    return math.atan2(z, math.sqrt(x * x + y * y)), math.atan2(y, x)


# -- xyz → (face, u, v) ------------------------------------------------------

def xyz_to_face(x: float, y: float, z: float) -> int:
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        axis = 0 if ax > az else 2
    else:
        axis = 1 if ay > az else 2
    comp = (x, y, z)[axis]
    return axis + 3 if comp < 0.0 else axis


def face_xyz_to_uv(face: int, x: float, y: float, z: float):
    if face == 0:
        return y / x, z / x
    if face == 1:
        return -x / y, z / y
    if face == 2:
        return -x / z, -y / z
    if face == 3:
        return z / x, y / x
    if face == 4:
        return z / y, -x / y
    return -y / z, -x / z


def face_uv_to_xyz(face: int, u: float, v: float):
    if face == 0:
        return 1.0, u, v
    if face == 1:
        return -u, 1.0, v
    if face == 2:
        return -u, -v, 1.0
    if face == 3:
        return -1.0, -v, -u
    if face == 4:
        return v, -1.0, -u
    return v, u, -1.0


# -- quadratic st projection -------------------------------------------------

def uv_to_st(u: float) -> float:
    if u >= 0.0:
        return 0.5 * math.sqrt(1.0 + 3.0 * u)
    return 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)


def st_to_uv(s: float) -> float:
    if s >= 0.5:
        return (1.0 / 3.0) * (4.0 * s * s - 1.0)
    return (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))


def st_to_ij(s: float) -> int:
    return max(0, min(MAX_SIZE - 1, int(math.floor(s * MAX_SIZE))))


# -- Hilbert encode/decode, per-bit ------------------------------------------

def from_face_ij(face: int, i: int, j: int) -> int:
    """Per-bit Hilbert encode (independent of the kernel's 4-bit tables)."""
    orientation = face & SWAP_MASK
    pos = 0
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = IJ_TO_POS[orientation][ij]
        pos = (pos << 2) | p
        orientation ^= POS_TO_ORIENTATION[p]
    return ((face << 61) | (pos << 1) | 1) & MASK64


def to_face_ij(cell_id: int):
    """Per-bit decode; processes all 30 position pairs of (id >> 1),
    matching the kernel's treatment of non-leaf ids."""
    face = (cell_id >> 61) & 7
    orientation = face & SWAP_MASK
    i = j = 0
    for k in range(MAX_LEVEL - 1, -1, -1):
        p = (cell_id >> (1 + 2 * k)) & 3
        ij = POS_TO_IJ[orientation][p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orientation ^= POS_TO_ORIENTATION[p]
    return face, i, j


def latlng_degrees_to_cell_id(lat_deg: float, lng_deg: float) -> int:
    lat = math.radians(lat_deg)
    lng = math.radians(lng_deg)
    x, y, z = latlng_to_xyz(lat, lng)
    face = xyz_to_face(x, y, z)
    u, v = face_xyz_to_uv(face, x, y, z)
    return from_face_ij(face, st_to_ij(uv_to_st(u)), st_to_ij(uv_to_st(v)))


# -- hierarchy ---------------------------------------------------------------

def lsb(cell_id: int) -> int:
    return cell_id & (-cell_id & MASK64)


def level(cell_id: int) -> int:
    return MAX_LEVEL - (((lsb(cell_id)).bit_length() - 1) >> 1)


def lsb_for_level(lvl: int) -> int:
    return 1 << (2 * (MAX_LEVEL - lvl))


def parent(cell_id: int, lvl: int) -> int:
    new_lsb = lsb_for_level(lvl)
    return ((cell_id & ((-new_lsb) & MASK64)) | new_lsb) & MASK64


def children(cell_id: int):
    cl = lsb(cell_id) >> 2
    return [(cell_id + (2 * k - 3) * cl) & MASK64 for k in range(4)]


def range_min(cell_id: int) -> int:
    return (cell_id - (lsb(cell_id) - 1)) & MASK64


def range_max(cell_id: int) -> int:
    return (cell_id + (lsb(cell_id) - 1)) & MASK64


def contains(a: int, b: int) -> bool:
    return range_min(a) <= range_min(b) and range_max(b) <= range_max(a)


def token_of(cell_id: int) -> str:
    if cell_id == 0:
        return "X"
    return ("%016x" % cell_id).rstrip("0")


# -- neighbors ---------------------------------------------------------------

def _from_face_ij_wrap(face: int, i: int, j: int) -> int:
    i = max(-1, min(MAX_SIZE, i))
    j = max(-1, min(MAX_SIZE, j))
    scale = 1.0 / MAX_SIZE
    limit = 1.0 + 2.220446049250313e-16
    u = max(-limit, min(limit, scale * (2.0 * (i - MAX_SIZE // 2) + 1.0)))
    v = max(-limit, min(limit, scale * (2.0 * (j - MAX_SIZE // 2) + 1.0)))
    x, y, z = face_uv_to_xyz(face, u, v)
    nf = xyz_to_face(x, y, z)
    nu, nv = face_xyz_to_uv(nf, x, y, z)
    return from_face_ij(nf, st_to_ij(0.5 * (nu + 1.0)), st_to_ij(0.5 * (nv + 1.0)))


def _from_face_ij_same(face: int, i: int, j: int, same_face: bool) -> int:
    if same_face:
        return from_face_ij(face, i, j)
    return _from_face_ij_wrap(face, i, j)


def edge_neighbors(cell_id: int):
    lvl = level(cell_id)
    size = 1 << (MAX_LEVEL - lvl)
    face, i, j = to_face_ij(cell_id)
    return [
        parent(_from_face_ij_same(face, i, j - size, j - size >= 0), lvl),
        parent(_from_face_ij_same(face, i + size, j, i + size < MAX_SIZE), lvl),
        parent(_from_face_ij_same(face, i, j + size, j + size < MAX_SIZE), lvl),
        parent(_from_face_ij_same(face, i - size, j, i - size >= 0), lvl),
    ]


def all_neighbors(cell_id: int):
    lvl = level(cell_id)
    size = 1 << (MAX_LEVEL - lvl)
    face, i, j = to_face_ij(cell_id)
    i &= -size
    j &= -size
    out = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            ii, jj = i + di * size, j + dj * size
            same = 0 <= ii < MAX_SIZE and 0 <= jj < MAX_SIZE
            out.append(parent(_from_face_ij_same(face, ii, jj, same), lvl))
    return out


# -- region predicates --------------------------------------------------------

def cap_contains(cx, cy, cz, height, x, y, z) -> bool:
    dx, dy, dz = x - cx, y - cy, z - cz
    return dx * dx + dy * dy + dz * dz <= 2.0 * height


def rect_contains(lat_lo, lat_hi, lng_lo, lng_hi, lat, lng) -> bool:
    if not (lat_lo <= lat <= lat_hi):
        return False
    if lng_lo <= lng_hi:
        return lng_lo <= lng <= lng_hi
    return lng >= lng_lo or lng <= lng_hi


ORIGIN = (-0.0099994664350250197, 0.0025924542609324121, 0.99994664350250195)


def _det(a, b, c) -> float:
    return (a[0] * (b[1] * c[2] - b[2] * c[1])
            - a[1] * (b[0] * c[2] - b[2] * c[0])
            + a[2] * (b[0] * c[1] - b[1] * c[0]))


def loop_contains(verts_latlng_rad, p) -> bool:
    """Crossing-parity PIP vs segment ORIGIN→p, scalar.

    verts_latlng_rad: list of (lat, lng) radians; p: (x, y, z) unit.
    Exact-path substitute: uses Fraction-based determinant when the
    float64 determinant magnitude is below 1e-14 (symbolic-perturbation
    tail is unnecessary for fixture-controlled inputs; asserted there).
    """
    from fractions import Fraction

    def det_sign(a, b, c):
        d = _det(a, b, c)
        if abs(d) >= 1e-14:
            return 1 if d > 0 else -1
        fa = tuple(Fraction(t) for t in a)
        fb = tuple(Fraction(t) for t in b)
        fc = tuple(Fraction(t) for t in c)
        fd = (fa[0] * (fb[1] * fc[2] - fb[2] * fc[1])
              - fa[1] * (fb[0] * fc[2] - fb[2] * fc[0])
              + fa[2] * (fb[0] * fc[1] - fb[1] * fc[0]))
        return (fd > 0) - (fd < 0)

    verts = [latlng_to_xyz(la, ln) for la, ln in verts_latlng_rad]
    n = len(verts)
    inside = False
    for k in range(n):
        a, b = verts[k], verts[(k + 1) % n]
        s1 = det_sign(ORIGIN, p, a)
        s2 = det_sign(ORIGIN, p, b)
        s3 = det_sign(a, b, ORIGIN)
        s4 = det_sign(a, b, p)
        # spec EdgeCrosser sign-consistency rule (antipode-safe):
        # crossing iff −s(o,p,a) == s(o,p,b) == −s(a,b,p) == s(a,b,o)
        if s1 != 0 and s2 == -s1 and s4 == s1 and s3 == -s1:
            inside = not inside
    return inside


def polygon_contains(loops, p) -> bool:
    """loops: list of (depth, verts) — XOR of containing-loop parities."""
    inside = False
    for _depth, verts in loops:
        if loop_contains(verts, p):
            inside = not inside
    return inside
