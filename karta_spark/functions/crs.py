"""Projected-CRS support: forward/inverse projection + ``reproject``.

The reference carries a CRS per geometry and reprojects lazily through
pyproj (karta crs.py:98-124 contract: ``project(x, y, inverse=False)``;
named instances crs.py:358-388: UPSNorth/South, NSIDCNorth/South,
LambertEqualArea, GallPetersEqualArea, WebMercator; UTM via proj4 strings).
pyproj is absent here, so the projection math is implemented from the
public formulas (Snyder 1987, *Map Projections — A Working Manual*;
Karney 2011 Krüger-series transverse Mercator), WGS84 ellipsoid.

Architecture: every projection is written ONCE against a tiny abstract
math backend and instantiated three ways —

- **Catalyst Columns** (JVM, whole-stage codegen — the hot path; zero
  Python per row),
- **ANSI-SQL strings** (the DuckDB oracle twin: textually parallel algebra
  so float results agree to rounding),
- **numpy arrays** (kernel twin for tests and Arrow UDF fallbacks).

Hyperbolics are emitted as exp() combinations (DuckDB lacks sinh/cosh) so
all three backends execute the identical IEEE operation sequence.

Accuracy: series truncated at n^6 (TM) / e^8 (conformal + authalic
inverse) — sub-millimeter everywhere a reference user would run them
(TM within +-40 deg of the central meridian).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# WGS84 (reference crs.py ellipsoid table)
A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
E2_WGS84 = F_WGS84 * (2.0 - F_WGS84)
E_WGS84 = math.sqrt(E2_WGS84)
R_WEBMERC = 6378137.0  # +proj=merc +a=6378137 +b=6378137 (crs.py:386)

# ---------------------------------------------------------------------------
# ellipsoid registry — the standard proj.4 ellipsoid table (public geodetic
# constants; the reference carries the same table, crs.py:34-77
# ELLIPSOID_DATA, resolved through its Ellipsoid class crs.py:80-103).
# Entries are (a, b, rf, display-name); exactly one of b/rf is set.
# ---------------------------------------------------------------------------

_ELLIPSOID_DATA = {
    "MERIT": (6378137.0, None, 298.257, "MERIT 1983"),
    "SGS85": (6378136.0, None, 298.257, "Soviet Geodetic System 85"),
    "GRS80": (6378137.0, None, 298.257222101, "GRS 1980"),
    "IAU76": (6378140.0, None, 298.257, "IAU 1976"),
    "airy": (6377563.396, 6356256.910, None, "Airy 1830"),
    "APL4.9": (6378137.0, None, 298.25, "Appl. Physics. 1965"),
    "NWL9D": (6378145.0, None, 298.25, "Naval Weapons Lab., 1965"),
    "mod_airy": (6377340.189, 6356034.446, None, "Modified Airy"),
    "andrae": (6377104.43, None, 300.0, "Andrae 1876"),
    "aust_SA": (6378160.0, None, 298.25, "Australian Natl & S. Amer. 1969"),
    "GRS67": (6378160.0, None, 298.2471674270, "GRS 67"),
    "bessel": (6377397.155, None, 299.1528128, "Bessel 1841"),
    "bess_nam": (6377483.865, None, 299.1528128, "Bessel 1841 (Namibia)"),
    "clrk66": (6378206.4, 6356583.8, None, "Clarke 1866"),
    "clrk80": (6378249.145, None, 293.4663, "Clarke 1880 mod."),
    "clrk80ign": (6378249.2, None, 293.4660212936269, "Clarke 1880 (IGN)"),
    "CPM": (6375738.7, None, 334.29, "Comm. des Poids et Mesures 1799"),
    "delmbr": (6376428.0, None, 311.5, "Delambre 1810"),
    "engelis": (6378136.05, None, 298.2566, "Engelis 1985"),
    "evrst30": (6377276.345, None, 300.8017, "Everest 1830"),
    "evrst48": (6377304.063, None, 300.8017, "Everest 1948"),
    "evrst56": (6377301.243, None, 300.8017, "Everest 1956"),
    "evrst69": (6377295.664, None, 300.8017, "Everest 1969"),
    "evrstSS": (6377298.556, None, 300.8017, "Everest (Sabah & Sarawak)"),
    "fschr60": (6378166.0, None, 298.3, "Fischer (Mercury Datum) 1960"),
    "fschr60m": (6378155.0, None, 298.3, "Modified Fischer 1960"),
    "fschr68": (6378150.0, None, 298.3, "Fischer 1968"),
    "helmert": (6378200.0, None, 298.3, "Helmert 1906"),
    "hough": (6378270.0, None, 297.0, "Hough"),
    "intl": (6378388.0, None, 297.0, "International 1909 (Hayford)"),
    "krass": (6378245.0, None, 298.3, "Krassovsky, 1942"),
    "kaula": (6378163.0, None, 298.24, "Kaula 1961"),
    "lerch": (6378139.0, None, 298.257, "Lerch 1979"),
    "mprts": (6397300.0, None, 191.0, "Maupertius 1738"),
    "new_intl": (6378157.5, 6356772.2, None, "New International 1967"),
    "plessis": (6376523.0, 6355863.0, None, "Plessis 1817"),
    "SEasia": (6378155.0, 6356773.3205, None, "Southeast Asia"),
    "walbeck": (6376896.0, 6355834.8467, None, "Walbeck"),
    "WGS60": (6378165.0, None, 298.3, "WGS 60"),
    "WGS66": (6378145.0, None, 298.25, "WGS 66"),
    "WGS72": (6378135.0, None, 298.26, "WGS 72"),
    "WGS84": (6378137.0, None, 298.257223563, "WGS 84"),
    "sphere": (6370997.0, 6370997.0, None, "Normal Sphere (r=6370997)"),
}

#: +datum= -> implied ellipsoid (reference crs.py:29-32 DATUM_ELLIPSOIDS)
_DATUM_ELLIPSOIDS = {
    "WGS84": "WGS84", "GGRS87": "GRS80", "NAD83": "GRS80",
    "NAD27": "clrk66", "potsdam": "bessel", "carthage": "clrk80",
    "hermannskogel": "bessel", "ire65": "mod_airy",
    "nzgd49": "intl", "OSGB36": "airy",
}


def ellipsoid_params(name: str) -> tuple[float, float]:
    """(a, f) for a proj.4 ellipsoid id.  WGS84 resolves to the module's
    exact A_WGS84/F_WGS84 constants (bit-identical fast path)."""
    if name == "WGS84":
        return A_WGS84, F_WGS84
    try:
        a, b, rf, _ = _ELLIPSOID_DATA[name]
    except KeyError:
        raise ValueError(f"unknown ellipsoid {name!r}") from None
    f = (a - b) / a if rf is None else 1.0 / rf
    return a, f


# ---------------------------------------------------------------------------
# triple backend: Columns / SQL strings / numpy
# ---------------------------------------------------------------------------

class _SqlVal:
    """A parenthesized SQL scalar expression with float-literal coercion."""

    __array_priority__ = 1000  # keep numpy from hijacking mixed ops

    def __init__(self, s: str):
        self.s = s

    @staticmethod
    def _c(v) -> str:
        return v.s if isinstance(v, _SqlVal) else repr(float(v))

    def _bin(self, other, op, swap=False):
        a, b = _SqlVal._c(self), _SqlVal._c(other)
        if swap:
            a, b = b, a
        return _SqlVal(f"({a} {op} {b})")

    def __add__(self, o):
        return self._bin(o, "+")

    def __radd__(self, o):
        return self._bin(o, "+", swap=True)

    def __sub__(self, o):
        return self._bin(o, "-")

    def __rsub__(self, o):
        return self._bin(o, "-", swap=True)

    def __mul__(self, o):
        return self._bin(o, "*")

    def __rmul__(self, o):
        return self._bin(o, "*", swap=True)

    def __truediv__(self, o):
        return self._bin(o, "/")

    def __rtruediv__(self, o):
        return self._bin(o, "/", swap=True)

    def __neg__(self):
        return _SqlVal(f"(- {self.s})")


class _SqlOps:
    """SQL-string math backend (DuckDB-compatible ANSI functions)."""

    Val = _SqlVal

    @staticmethod
    def _f(name, *args):
        return _SqlVal(f"{name}({', '.join(_SqlVal._c(a) for a in args)})")

    sin = staticmethod(lambda v: _SqlOps._f("sin", v))
    cos = staticmethod(lambda v: _SqlOps._f("cos", v))
    tan = staticmethod(lambda v: _SqlOps._f("tan", v))
    asin = staticmethod(lambda v: _SqlOps._f("asin", v))
    atan = staticmethod(lambda v: _SqlOps._f("atan", v))
    atan2 = staticmethod(lambda y, x: _SqlOps._f("atan2", y, x))
    exp = staticmethod(lambda v: _SqlOps._f("exp", v))
    ln = staticmethod(lambda v: _SqlOps._f("ln", v))
    sqrt = staticmethod(lambda v: _SqlOps._f("sqrt", v))
    abs = staticmethod(lambda v: _SqlOps._f("abs", v))
    floor = staticmethod(lambda v: _SqlOps._f("floor", v))

    @staticmethod
    def pow(v, p):
        return _SqlOps._f("pow", v, p)

    @staticmethod
    def where(cond_pair, a, b):
        """cond_pair is (lhs, '<op>', rhs) — emitted as CASE WHEN."""
        lhs, op, rhs = cond_pair
        return _SqlVal(
            f"(CASE WHEN {_SqlVal._c(lhs)} {op} {_SqlVal._c(rhs)} "
            f"THEN {_SqlVal._c(a)} ELSE {_SqlVal._c(b)} END)")


class _ColOps:
    """Catalyst Column math backend."""

    sin = staticmethod(F.sin)
    cos = staticmethod(F.cos)
    tan = staticmethod(F.tan)
    asin = staticmethod(F.asin)
    atan = staticmethod(F.atan)
    atan2 = staticmethod(F.atan2)
    exp = staticmethod(F.exp)
    ln = staticmethod(F.log)
    sqrt = staticmethod(F.sqrt)
    abs = staticmethod(F.abs)
    floor = staticmethod(F.floor)

    @staticmethod
    def pow(v, p):
        return F.pow(v, F.lit(p) if isinstance(p, (int, float)) else p)

    @staticmethod
    def where(cond_pair, a, b):
        lhs, op, rhs = cond_pair
        cond = {"<": lhs < rhs, "<=": lhs <= rhs, ">": lhs > rhs,
                ">=": lhs >= rhs, "=": lhs == rhs}[op]
        return F.when(cond, a).otherwise(b)


class _NpOps:
    """numpy math backend (float64 vectorized)."""

    sin = staticmethod(np.sin)
    cos = staticmethod(np.cos)
    tan = staticmethod(np.tan)
    asin = staticmethod(np.arcsin)
    atan = staticmethod(np.arctan)
    atan2 = staticmethod(np.arctan2)
    exp = staticmethod(np.exp)
    ln = staticmethod(np.log)
    sqrt = staticmethod(np.sqrt)
    abs = staticmethod(np.abs)
    floor = staticmethod(np.floor)
    pow = staticmethod(np.power)

    @staticmethod
    def where(cond_pair, a, b):
        lhs, op, rhs = cond_pair
        import operator as _op
        cond = {"<": _op.lt, "<=": _op.le, ">": _op.gt,
                ">=": _op.ge, "=": _op.eq}[op](lhs, rhs)
        return np.where(cond, a, b)


def _sinh(B, v):
    return 0.5 * (B.exp(v) - B.exp(-v))


def _cosh(B, v):
    return 0.5 * (B.exp(v) + B.exp(-v))


def _acos(B, v):
    return math.pi / 2.0 - B.asin(v)


def _asin_c(B, v):
    """asin with the argument clamped to [-1, 1]: ulp noise past 1.0
    otherwise NaNs (asin amplifies error by 1/sqrt near the ends)."""
    return B.asin(B.where((v, ">", 1.0), 1.0,
                          B.where((v, "<", -1.0), -1.0, v)))


def _atanh(B, v):
    return 0.5 * B.ln((1.0 + v) / (1.0 - v))


def _asinh(B, v):
    return B.ln(v + B.sqrt(v * v + 1.0))


# ---------------------------------------------------------------------------
# series coefficients (public: Karney 2011 eqs. 12/35/36; Snyder 1987 3-5,
# 3-18 conformal + 3-34 authalic inverse series)
# ---------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=None)
def _tm_series(a: float, f: float):
    """Krüger n^6 series constants (A, alpha, beta) for an ellipsoid —
    cached per (a, f); the WGS84 call reproduces the historical module
    constants bit-for-bit (same expression sequence)."""
    _N = f / (2.0 - f)
    A_TM = a / (1.0 + _N) * (1.0 + _N ** 2 / 4.0 + _N ** 4 / 64.0 + _N ** 6 / 256.0)
    alpha = (
        _N / 2 - 2 * _N ** 2 / 3 + 5 * _N ** 3 / 16 + 41 * _N ** 4 / 180
        - 127 * _N ** 5 / 288 + 7891 * _N ** 6 / 37800,
        13 * _N ** 2 / 48 - 3 * _N ** 3 / 5 + 557 * _N ** 4 / 1440
        + 281 * _N ** 5 / 630 - 1983433 * _N ** 6 / 1935360,
        61 * _N ** 3 / 240 - 103 * _N ** 4 / 140 + 15061 * _N ** 5 / 26880
        + 167603 * _N ** 6 / 181440,
        49561 * _N ** 4 / 161280 - 179 * _N ** 5 / 168 + 6601661 * _N ** 6 / 7257600,
        34729 * _N ** 5 / 80640 - 3418889 * _N ** 6 / 1995840,
        212378941 * _N ** 6 / 319334400,
    )
    beta = (
        _N / 2 - 2 * _N ** 2 / 3 + 37 * _N ** 3 / 96 - _N ** 4 / 360
        - 81 * _N ** 5 / 512 + 96199 * _N ** 6 / 604800,
        _N ** 2 / 48 + _N ** 3 / 15 - 437 * _N ** 4 / 1440 + 46 * _N ** 5 / 105
        - 1118711 * _N ** 6 / 3870720,
        17 * _N ** 3 / 480 - 37 * _N ** 4 / 840 - 209 * _N ** 5 / 4480
        + 5569 * _N ** 6 / 90720,
        4397 * _N ** 4 / 161280 - 11 * _N ** 5 / 504 - 830251 * _N ** 6 / 7257600,
        4583 * _N ** 5 / 161280 - 108847 * _N ** 6 / 3991680,
        20648693 * _N ** 6 / 638668800,
    )
    return A_TM, alpha, beta


_A_TM, _ALPHA, _BETA = _tm_series(A_WGS84, F_WGS84)


@lru_cache(maxsize=None)
def _conf_inv_coeffs(e2: float):
    """conformal latitude -> geographic series coefficients
    (phi = chi + sum c_j sin(2j chi), Snyder 3-5) — cached per e2."""
    _E2, _E4 = e2, e2 ** 2
    _E6, _E8 = e2 ** 3, e2 ** 4
    return (
        _E2 / 2 + 5 * _E4 / 24 + _E6 / 12 + 13 * _E8 / 360,
        7 * _E4 / 48 + 29 * _E6 / 240 + 811 * _E8 / 11520,
        7 * _E6 / 120 + 81 * _E8 / 1120,
        4279 * _E8 / 161280,
    )


_CONF_INV = _conf_inv_coeffs(E2_WGS84)


@lru_cache(maxsize=None)
def _auth_inv_coeffs(e2: float):
    """authalic latitude -> geographic series coefficients
    (phi = beta + sum c_j sin(2j beta), Snyder 3-18) — cached per e2."""
    _E2, _E4, _E6 = e2, e2 ** 2, e2 ** 3
    return (
        _E2 / 3 + 31 * _E4 / 180 + 517 * _E6 / 5040,
        23 * _E4 / 360 + 251 * _E6 / 3780,
        761 * _E6 / 45360,
    )


_E2, _E4 = E2_WGS84, E2_WGS84 ** 2
_E6, _E8 = E2_WGS84 ** 3, E2_WGS84 ** 4
# authalic latitude -> geographic (phi = beta + sum c_j sin(2j beta))
_AUTH_INV = _auth_inv_coeffs(E2_WGS84)


# ---------------------------------------------------------------------------
# CRS registry
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CrsDef:
    """A projected CRS the engine understands natively.

    kind: webmercator | tmerc | stere | laea | cea | lonlat
    params: kind-specific tuple (see the _fwd/_inv dispatchers)."""

    name: str
    kind: str
    params: tuple = ()


LONLAT = CrsDef("lonlat", "lonlat")
WEB_MERCATOR = CrsDef("webmercator", "webmercator")  # crs.py:386
# UPS (crs.py:358-366): k0=0.994, FE=FN=2e6, lat_ts=90
UPS_NORTH = CrsDef("ups_north", "stere", (1.0, 0.0, 90.0, 0.994, 2e6, 2e6))
UPS_SOUTH = CrsDef("ups_south", "stere", (-1.0, 0.0, 90.0, 0.994, 2e6, 2e6))
# NSIDC sea-ice grids (crs.py:368-376): lat_ts=70, FE=FN=0
NSIDC_NORTH = CrsDef("nsidc_north", "stere", (1.0, -45.0, 70.0, 1.0, 0.0, 0.0))
NSIDC_SOUTH = CrsDef("nsidc_south", "stere", (-1.0, 0.0, 70.0, 1.0, 0.0, 0.0))
# equatorial Lambert azimuthal equal-area (crs.py:378-381)
LAEA_WGS84 = CrsDef("laea", "laea", (0.0,))
# EASE-Grid 2.0 polar aspects (+proj=laea +lat_0=+-90 +lon_0=0, WGS84 —
# the modern NSIDC sea-ice grids; reference reaches them via proj.4)
EASE2_NORTH = CrsDef("ease2_north", "laea_polar", (1.0, 0.0, 0.0, 0.0))
EASE2_SOUTH = CrsDef("ease2_south", "laea_polar", (-1.0, 0.0, 0.0, 0.0))
# ETRS89-extended / LAEA Europe (EPSG:3035, method 9820): the EU
# INSPIRE statistical grid — oblique aspect (lat_0=52, lon_0=10) on
# GRS80, FE=4321000 FN=3210000
ETRS89_LAEA = CrsDef("etrs89_laea", "laea_oblique",
                     (52.0, 10.0, 4321000.0, 3210000.0,
                      6378137.0, 1.0 / 298.257222101))
# Amersfoort / RD New (EPSG:28992, method 9809 oblique stereographic
# on Bessel 1841) — the Dutch national grid
RD_NEW = CrsDef("rd_new", "sterea",
                (52.15616055555555, 5.38763888888889, 0.9999079,
                 155000.0, 463000.0, 6377397.155, 1.0 / 299.1528128))
# S-JTSK / Krovak East North (EPSG:5514, method 9819 on Bessel 1841) —
# the Czech/Slovak national grid.  lon_0 is 42d30' East of Ferro =
# 24d50' E Greenwich; azimuth 30d17'17.3031"; pseudo std par 78.5
S_JTSK = CrsDef("s_jtsk", "krovak",
                (49.5, 24.833333333333332, 30.288139750000002, 78.5,
                 0.9999, 0.0, 0.0, 6377397.155, 1.0 / 299.1528128))
# MODIS sinusoidal grid sphere (+proj=sinu +R=6371007.181 +lon_0=0)
MODIS_SINU = CrsDef("modis_sinu", "sinu",
                    (0.0, 0.0, 0.0, 6371007.181, 0.0))
# WGS 84 / World Equidistant Cylindrical (EPSG:4087, method 1028)
PLATE_CARREE = CrsDef("plate_carree", "eqc", (0.0, 0.0, 0.0, 0.0))
# WGS 84 / World Mercator (EPSG:3395): TRUE ellipsoidal Mercator 1SP —
# NOT the spherical Web Mercator (EPSG:3857).  params are
# (lat_ts, lon_0, k_0, fe, fn[, a, f]); WGS84 when the tail is absent.
WORLD_MERCATOR = CrsDef("world_mercator", "merc", (0.0, 0.0, 1.0, 0.0, 0.0))
# CH1903 / LV03 (EPSG:21781) and CH1903+ / LV95 (EPSG:2056): Swiss
# oblique Mercator on Bessel 1841, Bern origin
_CH_LAT0 = 46.952405555555565   # 46 deg 57' 08.66"
_CH_LON0 = 7.439583333333333    # 7 deg 26' 22.50"
CH1903_LV03 = CrsDef("ch1903_lv03", "somerc",
                     (_CH_LAT0, _CH_LON0, 1.0, 600000.0, 200000.0)
                     + ellipsoid_params("bessel"))
CH1903_LV95 = CrsDef("ch1903_lv95", "somerc",
                     (_CH_LAT0, _CH_LON0, 1.0, 2600000.0, 1200000.0)
                     + ellipsoid_params("bessel"))
# datum-shifted geographic CRSes (crs.py:354-356).  NAD27 rides Clarke 1866
# + the CONUS Molodensky translation; NAD83 (GRS80) coincides with the
# WGS84 pivot at the cm level, far below this transform's ~5 m fidelity.
_F_CLRK66 = (6378206.4 - 6356583.8) / 6378206.4
LONLAT_WGS84 = LONLAT
LONLAT_NAD27 = CrsDef("lonlat_nad27", "lonlat_datum",
                      (-8.0, 160.0, 176.0, 6378206.4, _F_CLRK66))
LONLAT_NAD83 = CrsDef("lonlat_nad83", "lonlat")
# Gall-Peters cylindrical equal-area, lat_ts=45 (crs.py:382-385)
GALL_PETERS = CrsDef("gall_peters", "cea", (45.0,))


def utm(zone: int, south: bool = False) -> CrsDef:
    """UTM zone CRS: tmerc with cm = 6*zone - 183, k0 = 0.9996."""
    if not 1 <= zone <= 60:
        raise ValueError("UTM zone must be 1..60")
    return CrsDef(f"utm{zone}{'s' if south else 'n'}", "tmerc",
                  (6.0 * zone - 183.0, 0.9996, 500000.0,
                   10000000.0 if south else 0.0))


def tmerc(lon0: float, k0: float = 1.0, fe: float = 0.0, fn: float = 0.0,
          ellps: str | tuple[float, float] = "WGS84") -> CrsDef:
    """Transverse Mercator CRS; ``ellps`` (proj.4 id or (a, f) pair)
    selects the ellipsoid — WGS84 keeps the historical 4-tuple params so
    existing named instances compare equal."""
    a, f = ellps if isinstance(ellps, tuple) else ellipsoid_params(ellps)
    if (a, f) == (A_WGS84, F_WGS84):
        return CrsDef(f"tmerc_{lon0}", "tmerc", (lon0, k0, fe, fn))
    tag = ellps if isinstance(ellps, str) else f"{a:g}"
    return CrsDef(f"tmerc_{lon0}_{tag}", "tmerc",
                  (lon0, k0, fe, fn, float(a), float(f)))


# ---------------------------------------------------------------------------
# projection math (backend-generic)
# ---------------------------------------------------------------------------

_D2R = math.pi / 180.0
_R2D = 180.0 / math.pi


def _webmercator_fwd(B, lon, lat):
    x = R_WEBMERC * _D2R * lon
    y = R_WEBMERC * B.ln(B.tan(math.pi / 4.0 + (_D2R / 2.0) * lat))
    return x, y


def _webmercator_inv(B, x, y):
    lon = x * (_R2D / R_WEBMERC)
    lat = (2.0 * B.atan(B.exp(y * (1.0 / R_WEBMERC))) - math.pi / 2.0) * _R2D
    return lon, lat


def _merc_k(lat_ts: float, k0: float, e2: float) -> float:
    """Effective equatorial scale: a true-scale parallel (+lat_ts,
    EPSG method 9805 Mercator 2SP) overrides +k_0 (9804 Mercator 1SP),
    matching proj.4's precedence."""
    if lat_ts == 0.0:
        return k0
    ts = abs(lat_ts) * _D2R
    return math.cos(ts) / math.sqrt(1.0 - e2 * math.sin(ts) ** 2)


def _merc_fwd(B, lon, lat, lat_ts, lon0, k0, fe, fn, a=A_WGS84, f=F_WGS84):
    """TRUE (ellipsoidal) Mercator — EPSG methods 9804/9805, the
    EPSG:3395 World Mercator family.  Snyder 1987 eq. 7-7 via inverse
    hyperbolics: psi = atanh(sin phi) - e*atanh(e sin phi).  Distinct
    from the spherical Web Mercator fast path (the reference's only
    native mercator, crs.py:354-368; it reaches EPSG:3395-style CRSes
    through proj.4 projstrings, crs.py:248-306)."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    ak = a * _merc_k(lat_ts, k0, e2)
    s = B.sin(lat * _D2R)
    psi = _atanh(B, s)
    if e:
        psi = psi - e * _atanh(B, e * s)
    return fe + ak * (_wrap_dlon(B, lon, lon0) * _D2R), fn + ak * psi


def _merc_inv(B, x, y, lat_ts, lon0, k0, fe, fn, a=A_WGS84, f=F_WGS84):
    e2 = f * (2.0 - f)
    ak = a * _merc_k(lat_ts, k0, e2)
    chi = 2.0 * B.atan(B.exp((y - fn) * (1.0 / ak))) - math.pi / 2.0
    phi = chi if e2 == 0.0 else _conformal_to_geographic(B, chi, e2)
    return lon0 + (x - fe) * (_R2D / ak), phi * _R2D


def _conformal_to_geographic(B, chi, e2: float = E2_WGS84):
    phi = chi
    for j, c in enumerate(_conf_inv_coeffs(e2), start=1):
        phi = phi + c * B.sin((2.0 * j) * chi)
    return phi


def _tm_fwd(B, lon, lat, lon0, k0, fe, fn, a=A_WGS84, f=F_WGS84):
    """Krüger-series transverse Mercator forward (Karney 2011 eq. 7-11).
    Optional trailing (a, f) select the ellipsoid (default WGS84 —
    bit-identical to the historical fixed-constant path)."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    A_TM, alpha, _ = _tm_series(a, f)
    lam = (lon - lon0) * _D2R
    phi = lat * _D2R
    t = B.tan(phi)
    sig = _sinh(B, e * _atanh(B, e * t / B.sqrt(1.0 + t * t)))
    tp = t * B.sqrt(1.0 + sig * sig) - sig * B.sqrt(1.0 + t * t)
    xi = B.atan2(tp, B.cos(lam))
    eta = _asinh(B, B.sin(lam) / B.sqrt(tp * tp + B.cos(lam) * B.cos(lam)))
    xs, ys = eta, xi
    for j, aj in enumerate(alpha, start=1):
        xs = xs + aj * B.cos((2.0 * j) * xi) * _sinh(B, (2.0 * j) * eta)
        ys = ys + aj * B.sin((2.0 * j) * xi) * _cosh(B, (2.0 * j) * eta)
    return fe + k0 * A_TM * xs, fn + k0 * A_TM * ys


def _tm_inv(B, x, y, lon0, k0, fe, fn, a=A_WGS84, f=F_WGS84):
    e2 = f * (2.0 - f)
    A_TM, _, beta = _tm_series(a, f)
    xi = (y - fn) / (k0 * A_TM)
    eta = (x - fe) / (k0 * A_TM)
    xip, etap = xi, eta
    for j, b in enumerate(beta, start=1):
        xip = xip - b * B.sin((2.0 * j) * xi) * _cosh(B, (2.0 * j) * eta)
        etap = etap - b * B.cos((2.0 * j) * xi) * _sinh(B, (2.0 * j) * eta)
    she = _sinh(B, etap)
    tp = B.sin(xip) / B.sqrt(she * she + B.cos(xip) * B.cos(xip))
    lam = B.atan2(she, B.cos(xip))
    chi = B.atan(tp)
    phi = _conformal_to_geographic(B, chi, e2)
    return lon0 + lam * _R2D, phi * _R2D


def _stere_t(B, phi, e=E_WGS84):
    es = e * B.sin(phi)
    return B.tan(math.pi / 4.0 - phi / 2.0) * B.pow(
        (1.0 + es) / (1.0 - es), e / 2.0)


def _stere_consts(lat_ts: float, k0: float, e=E_WGS84, e2=E2_WGS84):
    """rho = a * c * t(phi) for the north polar aspect (Snyder 21-33/34)."""
    if lat_ts >= 89.999:
        c = 2.0 * k0 / math.sqrt(
            (1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
    else:
        ts = lat_ts * _D2R
        m = math.cos(ts) / math.sqrt(1.0 - e2 * math.sin(ts) ** 2)
        es = e * math.sin(ts)
        t = math.tan(math.pi / 4.0 - ts / 2.0) * (
            (1.0 + es) / (1.0 - es)) ** (e / 2.0)
        c = k0 * m / t
    return c


def _stere_fwd(B, lon, lat, sgn, lon0, lat_ts, k0, fe, fn,
               a=A_WGS84, f=F_WGS84):
    """Polar stereographic (Snyder 1987 pp. 160-161), north (sgn=+1) or
    south (sgn=-1, mirrored)."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    c = _stere_consts(lat_ts, k0, e, e2)
    phi = (sgn * lat) * _D2R
    lam = (sgn * (lon - lon0)) * _D2R
    rho = a * c * _stere_t(B, phi, e)
    x = fe + sgn * (rho * B.sin(lam))
    y = fn - sgn * (rho * B.cos(lam))
    return x, y


def _stere_inv(B, x, y, sgn, lon0, lat_ts, k0, fe, fn,
               a=A_WGS84, f=F_WGS84):
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    c = _stere_consts(lat_ts, k0, e, e2)
    xp = sgn * (x - fe)
    yp = sgn * (y - fn)
    rho = B.sqrt(xp * xp + yp * yp)
    t = rho / (a * c)
    chi = math.pi / 2.0 - 2.0 * B.atan(t)
    phi = _conformal_to_geographic(B, chi, e2)
    lam = B.atan2(xp, -1.0 * yp)
    return sgn * (lon0 + lam * _R2D), sgn * (phi * _R2D)


# ---------------------------------------------------------------------------
# meridian arc (Snyder 3-21) and its inverse via the rectifying
# latitude (Snyder 3-26 / 7-19) — shared by eqc and sinu
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _marc_coeffs(e2: float):
    e4, e6 = e2 ** 2, e2 ** 3
    c0 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    c2 = 3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0
    c4 = 15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0
    c6 = 35.0 * e6 / 3072.0
    # inverse (phi from rectifying latitude mu), Snyder 3-26
    se = math.sqrt(1.0 - e2)
    e1 = (1.0 - se) / (1.0 + se)
    d2 = 3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0
    d4 = 21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0
    d6 = 151.0 * e1 ** 3 / 96.0
    d8 = 1097.0 * e1 ** 4 / 512.0
    return (c0, c2, c4, c6), (d2, d4, d6, d8), c0


def _meridian_arc(B, phi, a: float, e2: float):
    """M(phi): distance along the meridian from the equator (Snyder
    3-21); exact a*phi for a sphere (e2=0)."""
    (c0, c2, c4, c6), _, _ = _marc_coeffs(e2)
    return a * (c0 * phi - c2 * B.sin(2.0 * phi)
                + c4 * B.sin(4.0 * phi) - c6 * B.sin(6.0 * phi))


def _inv_meridian_arc(B, M, a: float, e2: float):
    (_, (d2, d4, d6, d8), c0) = _marc_coeffs(e2)
    mu = M / (a * c0)
    return (mu + d2 * B.sin(2.0 * mu) + d4 * B.sin(4.0 * mu)
            + d6 * B.sin(6.0 * mu) + d8 * B.sin(8.0 * mu))


def _wrap_dlon(B, lon, lon0):
    dlon = lon - lon0
    return dlon - 360.0 * B.floor((dlon + 180.0) * (1.0 / 360.0))


def _aeqd_fwd(B, lon, lat, lat0, lon0, fe, fn, a=A_WGS84, f=F_WGS84):
    """Azimuthal equidistant forward — three closed-form regimes, all
    triple-backend (no iteration):

    - sphere (f=0): Snyder 1987 eq. 25-1..25-4 (exact at any distance);
    - ellipsoidal polar (|lat_0|=90): rho = meridian arc from the pole
      (Snyder 25-16, exact);
    - ellipsoidal oblique: EPSG method 9832 "Modified Azimuthal
      Equidistant" (GN7-2, the Guam/Micronesia grids) — the published
      closed-form series, accurate to <1 mm within ~800 km of the
      origin.  NB: proj.4's oblique ellipsoidal aeqd solves TRUE
      geodesics; the two diverge as distance grows (same documented
      stance as eqc/moll vs proj's spherical shortcuts).

    The reference reaches aeqd via arbitrary proj.4 strings
    (reference crs.py:248-306)."""
    e2 = f * (2.0 - f)
    dlam = _wrap_dlon(B, lon, lon0) * _D2R
    phi = lat * _D2R
    if f == 0.0:  # sphere — Snyder 25-1..25-4
        p0 = lat0 * _D2R
        cosc = (math.sin(p0) * B.sin(phi)
                + math.cos(p0) * B.cos(phi) * B.cos(dlam))
        cosc = B.where((cosc, ">", 1.0), 1.0,
                       B.where((cosc, "<", -1.0), -1.0, cosc))
        sin2 = 1.0 - cosc * cosc
        sinc = B.sqrt(B.where((sin2, "<", 0.0), 0.0, sin2))
        sinc_safe = B.where((sinc, "<", 1e-14), 1.0, sinc)
        # k' = c / sin c (limit 1 at the origin; antipode undefined)
        kp = B.where((sinc, "<", 1e-14), 1.0, _acos(B, cosc) / sinc_safe)
        x = fe + a * kp * B.cos(phi) * B.sin(dlam)
        y = fn + a * kp * (math.cos(p0) * B.sin(phi)
                           - math.sin(p0) * B.cos(phi) * B.cos(dlam))
        return x, y
    if abs(lat0) >= 89.999:  # ellipsoidal polar: meridian-arc radius
        sgn = 1.0 if lat0 > 0 else -1.0
        (c0, _, _, _), _, _ = _marc_coeffs(e2)
        mp = a * c0 * math.pi / 2.0  # arc to the pole (sin terms vanish)
        rho = mp - sgn * _meridian_arc(B, phi, a, e2)
        lamp = sgn * dlam
        return fe + sgn * (rho * B.sin(lamp)), \
            fn - sgn * (rho * B.cos(lamp))
    # ellipsoidal oblique — EPSG 9832 Modified Azimuthal Equidistant
    e = math.sqrt(e2)
    p0 = lat0 * _D2R
    nu0 = a / math.sqrt(1.0 - e2 * math.sin(p0) ** 2)
    nu = a / B.sqrt(1.0 - e2 * B.pow(B.sin(phi), 2))
    psi = B.atan((1.0 - e2) * B.tan(phi)
                 + e2 * nu0 * math.sin(p0) / (nu * B.cos(phi)))
    alpha = B.atan2(B.sin(dlam),
                    math.cos(p0) * B.tan(psi) - math.sin(p0) * B.cos(dlam))
    G = e * math.sin(p0) / math.sqrt(1.0 - e2)
    H = e * math.cos(p0) * B.cos(alpha) / math.sqrt(1.0 - e2)
    sa = B.sin(alpha)
    sa_safe = B.where((B.abs(sa), "<", 1e-12), 1.0, sa)
    sgn_cosa = B.where((B.cos(alpha), "<", 0.0), -1.0, 1.0)
    s = B.where(
        (B.abs(sa), "<", 1e-12),
        _asin_c(B, math.cos(p0) * B.sin(psi)
                - math.sin(p0) * B.cos(psi)) * sgn_cosa,
        _asin_c(B, B.sin(dlam) * B.cos(psi) / sa_safe))
    H2 = H * H
    c = nu0 * s * (1.0
                   - (s * s) * H2 * (1.0 - H2) / 6.0
                   + B.pow(s, 3) / 8.0 * G * H * (1.0 - 2.0 * H2)
                   + B.pow(s, 4) / 120.0 * (H2 * (4.0 - 7.0 * H2)
                                            - 3.0 * G * G * (1.0 - 7.0 * H2))
                   - B.pow(s, 5) / 48.0 * G * H)
    return fe + c * B.sin(alpha), fn + c * B.cos(alpha)


def _aeqd_inv(B, x, y, lat0, lon0, fe, fn, a=A_WGS84, f=F_WGS84):
    e2 = f * (2.0 - f)
    xp = x - fe
    yp = y - fn
    if f == 0.0:  # sphere — Snyder 25-15
        p0 = lat0 * _D2R
        rho = B.sqrt(xp * xp + yp * yp)
        c = rho / a
        rho_safe = B.where((rho, "<", 1e-9), 1.0, rho)
        sinc, cosc = B.sin(c), B.cos(c)
        phi = _asin_c(B, cosc * math.sin(p0)
                      + yp * sinc * math.cos(p0) / rho_safe)
        lam = B.atan2(xp * sinc,
                      rho * cosc * math.cos(p0) - yp * sinc * math.sin(p0))
        phi = B.where((rho, "<", 1e-9), p0, phi)
        lam = B.where((rho, "<", 1e-9), 0.0, lam)
        return lon0 + lam * _R2D, phi * _R2D
    if abs(lat0) >= 89.999:  # ellipsoidal polar
        sgn = 1.0 if lat0 > 0 else -1.0
        (c0, _, _, _), _, _ = _marc_coeffs(e2)
        mp = a * c0 * math.pi / 2.0
        xq, yq = sgn * xp, sgn * yp
        rho = B.sqrt(xq * xq + yq * yq)
        # M(phi) = sgn * (mp - rho): north rho = mp - M, south rho = mp + M
        phi = _inv_meridian_arc(B, sgn * (mp - rho), a, e2)
        lam = B.atan2(xq, -1.0 * yq)
        return lon0 + sgn * lam * _R2D, phi * _R2D
    # ellipsoidal oblique — EPSG 9832 inverse (singularity-free phi form)
    p0 = lat0 * _D2R
    nu0 = a / math.sqrt(1.0 - e2 * math.sin(p0) ** 2)
    cp = B.sqrt(xp * xp + yp * yp)
    alpha = B.atan2(xp, yp)
    ca = B.cos(alpha)
    A = -e2 * math.cos(p0) ** 2 * ca * ca / (1.0 - e2)
    Bq = 3.0 * e2 * (1.0 - A) * math.sin(p0) * math.cos(p0) * ca \
        / (1.0 - e2)
    D = cp / nu0
    J = D - A * (1.0 + A) * B.pow(D, 3) / 6.0 \
        - Bq * (1.0 + 3.0 * A) * B.pow(D, 4) / 24.0
    K = 1.0 - A * J * J / 2.0 - Bq * B.pow(J, 3) / 6.0
    psi = _asin_c(B, math.sin(p0) * B.cos(J)
                  + math.cos(p0) * B.sin(J) * ca)
    lam = _asin_c(B, B.sin(alpha) * B.sin(J) / B.cos(psi))
    # GN7: phi = atan((1 - e2 K sin(p0)/sin(psi)) tan(psi)/(1-e2));
    # multiplied through to avoid the 0/0 at psi = 0:
    phi = B.atan((B.tan(psi) - e2 * K * math.sin(p0) / B.cos(psi))
                 / (1.0 - e2))
    return lon0 + lam * _R2D, phi * _R2D


def _aeqd_guam_fwd(B, lon, lat, lat0, lon0, fe, fn, a=A_WGS84,
                   f=F_WGS84):
    """Guam projection (EPSG method 9831; proj.4 ``+proj=aeqd +guam``,
    Snyder 1987 p.196) — the Guam 1963 SPCS variant of the modified
    azimuthal equidistant.  The reference reaches it via arbitrary
    proj.4 strings (reference crs.py:248-306)."""
    e2 = f * (2.0 - f)
    phi = lat * _D2R
    p0 = lat0 * _D2R
    dlam = _wrap_dlon(B, lon, lon0) * _D2R
    W = B.sqrt(1.0 - e2 * B.pow(B.sin(phi), 2))
    xp = a * dlam * B.cos(phi) / W
    c0, c2, c4, c6 = _marc_coeffs(e2)[0]
    M0 = a * (c0 * p0 - c2 * math.sin(2.0 * p0)
              + c4 * math.sin(4.0 * p0) - c6 * math.sin(6.0 * p0))
    yp = (_meridian_arc(B, phi, a, e2) - M0
          + xp * xp * B.tan(phi) * W / (2.0 * a))
    return fe + xp, fn + yp


def _aeqd_guam_inv(B, x, y, lat0, lon0, fe, fn, a=A_WGS84, f=F_WGS84):
    """EPSG 9831 inverse: three fixed-point iterations of the
    meridian-arc correction (the published iteration count; the
    correction term is tiny over Guam's extent so it converges to
    sub-mm)."""
    e2 = f * (2.0 - f)
    p0 = lat0 * _D2R
    xp = x - fe
    yp = y - fn
    c0, c2, c4, c6 = _marc_coeffs(e2)[0]
    M0 = a * (c0 * p0 - c2 * math.sin(2.0 * p0)
              + c4 * math.sin(4.0 * p0) - c6 * math.sin(6.0 * p0))
    x2 = xp * xp / (2.0 * a)
    phi = _inv_meridian_arc(B, M0 + yp, a, e2)  # correction-0 start
    for _ in range(2):
        W = B.sqrt(1.0 - e2 * B.pow(B.sin(phi), 2))
        phi = _inv_meridian_arc(B, M0 + yp - x2 * B.tan(phi) * W,
                                a, e2)
    W = B.sqrt(1.0 - e2 * B.pow(B.sin(phi), 2))
    lam = xp * W / (a * B.cos(phi))
    return lon0 + lam * _R2D, phi * _R2D


def _eqc_fwd(B, lon, lat, lat_ts, lon0, fe, fn, a=A_WGS84, f=F_WGS84):
    """Equidistant cylindrical (EPSG method 1028, Snyder 12 generalized
    to the ellipsoid): true-scale parallels at +-lat_ts, y = meridian
    arc — exact plate carree (a*phi) on a sphere.  NB: proj.4's eqc
    applies the SPHERICAL formula even for ellipsoidal +ellps; this is
    the exact EPSG-1028 form (sub-0.1% difference at WGS84)."""
    e2 = f * (2.0 - f)
    ts = lat_ts * _D2R
    nu_ts = math.cos(ts) / math.sqrt(1.0 - e2 * math.sin(ts) ** 2)
    x = fe + a * nu_ts * (_wrap_dlon(B, lon, lon0) * _D2R)
    y = fn + _meridian_arc(B, lat * _D2R, a, e2)
    return x, y


def _eqc_inv(B, x, y, lat_ts, lon0, fe, fn, a=A_WGS84, f=F_WGS84):
    e2 = f * (2.0 - f)
    ts = lat_ts * _D2R
    nu_ts = math.cos(ts) / math.sqrt(1.0 - e2 * math.sin(ts) ** 2)
    lon = lon0 + (x - fe) / (a * nu_ts) * _R2D
    phi = _inv_meridian_arc(B, y - fn, a, e2)
    return lon, phi * _R2D


def _sinu_fwd(B, lon, lat, lon0, fe, fn, a=A_WGS84, f=F_WGS84):
    """Sinusoidal (Sanson-Flamsteed, Snyder 30-8/30-9 ellipsoidal) —
    equal-area; the MODIS land grid is this projection on the sphere
    R=6371007.181 (+proj=sinu +R=6371007.181)."""
    e2 = f * (2.0 - f)
    phi = lat * _D2R
    sp = B.sin(phi)
    x = fe + a * B.cos(phi) * (_wrap_dlon(B, lon, lon0) * _D2R) \
        / B.sqrt(1.0 - e2 * sp * sp)
    y = fn + _meridian_arc(B, phi, a, e2)
    return x, y


def _sinu_inv(B, x, y, lon0, fe, fn, a=A_WGS84, f=F_WGS84):
    e2 = f * (2.0 - f)
    phi = _inv_meridian_arc(B, y - fn, a, e2)
    sp = B.sin(phi)
    cp = B.cos(phi)
    # pole guard: cos(phi) -> 0 makes lon indeterminate; pin it to lon0
    safe_cp = B.where((cp, "<", 1e-12), 1e-12, cp)
    dlon = (x - fe) * B.sqrt(1.0 - e2 * sp * sp) / (a * safe_cp)
    dlon = B.where((cp, "<", 1e-12), 0.0, dlon)
    return lon0 + dlon * _R2D, phi * _R2D


#: odd-polynomial initial guess for the Mollweide parametric angle:
#: t ~ u * poly(u^2) with u = sin(phi), least-squares fit over
#: |P| <= 3 (20k samples, max error 6e-4 — two Newton steps then land
#: 1e-12); past |P| = 3 the cube-root pole asymptotic takes over.
_MOLL_COEFFS = (0.7846951058603117, 0.19744353452875252,
                -0.444772201176943, 3.390365255720244,
                -10.813923602867561, 18.848754462318087,
                -16.633081462566334, 5.972020429443762)


def _moll_fwd(B, lon, lat, lon0, fe, fn, a=A_WGS84, f=F_WGS84):
    """Mollweide (Snyder 31-1..31-5): equal-area pseudocylindrical.
    The parametric angle solves 2t + sin 2t = pi sin(phi).  Iterating
    from t = phi (the textbook scheme) fails twice here: Newton
    diverges near the poles (f' -> 0), and unrolled steps grow the
    Catalyst/SQL expression tree 3^steps (eight steps choke codegen).
    Instead: a fitted odd-polynomial guess (pole branch = the cube-root
    asymptotic with its tau^2/15 series correction) + TWO Newton steps
    = 1.1e-12 rad worst-case over 400k audited latitudes, with a tree
    small enough for whole-stage codegen.

    Ellipsoids map through the authalic sphere (radius Rq), keeping the
    projection exactly equal-area — and sin(authalic lat) is q/qp
    DIRECTLY, so no asin/sin pair inflates the tree.  proj.4's moll
    ignores the ellipsoid instead (documented divergence)."""
    e2 = f * (2.0 - f)
    if e2:
        qp, rq = _qp_rq(a, f)
        sphi = _authalic_q(B, lat * _D2R, math.sqrt(e2), e2) / qp
        # snap, don't just clamp: the pole's q/qp can land an ulp SHY of
        # +-1, and the cube-root asymptotic amplifies that 3e-16 into
        # ~1e-5 rad of parametric angle (170 m of x at the pole)
        sphi = B.where((sphi, ">", 1.0 - 1e-15), 1.0, sphi)
        sphi = B.where((sphi, "<", -(1.0 - 1e-15)), -1.0, sphi)
        R = rq
    else:
        sphi = B.sin(lat * _D2R)
        R = a
    target = math.pi * sphi
    w = sphi * sphi
    poly = _MOLL_COEFFS[-1]
    for ck in _MOLL_COEFFS[-2::-1]:
        poly = ck + w * poly
    t_mid = sphi * poly
    gap = math.pi - B.abs(target)
    gap = B.where((gap, "<", 0.0), 0.0, gap)
    tau0 = B.pow(0.75 * gap, 1.0 / 3.0)
    tau = tau0 * (1.0 + tau0 * tau0 * (1.0 / 15.0)
                  + 0.00254 * tau0 * tau0 * tau0 * tau0)
    t_pole = math.pi / 2.0 - tau
    t_pole = B.where((target, "<", 0.0), -1.0 * t_pole, t_pole)
    t = B.where((B.abs(target), ">", 3.0), t_pole, t_mid)
    for _ in range(2):
        denom = 2.0 + 2.0 * B.cos(2.0 * t)
        # the 1e-3 floor only engages within ~0.07 deg of a pole, where
        # the asymptotic guess is already exact past float precision —
        # it keeps the sin(pi)=1.2e-16 residual from kicking the exact
        # pole off by 1e-7 rad
        denom = B.where((denom, "<", 1e-3), 1e-3, denom)
        t = t - (2.0 * t + B.sin(2.0 * t) - target) / denom
    lam = _wrap_dlon(B, lon, lon0) * _D2R
    x = fe + (2.0 * math.sqrt(2.0) / math.pi) * R * lam * B.cos(t)
    y = fn + math.sqrt(2.0) * R * B.sin(t)
    return x, y


def _moll_inv(B, x, y, lon0, fe, fn, a=A_WGS84, f=F_WGS84):
    e2 = f * (2.0 - f)
    if e2:
        qp, rq = _qp_rq(a, f)
        R = rq
    else:
        R = a
    st = (y - fn) / (math.sqrt(2.0) * R)
    st = B.where((st, ">", 1.0), 1.0, st)
    st = B.where((st, "<", -1.0), -1.0, st)
    t = B.asin(st)
    sphi = (2.0 * t + B.sin(2.0 * t)) / math.pi
    sphi = B.where((sphi, ">", 1.0), 1.0, sphi)
    sphi = B.where((sphi, "<", -1.0), -1.0, sphi)
    phi = B.asin(sphi)
    if e2:
        # authalic -> geographic
        phi = _authalic_to_geographic(B, phi, e2)
    ct = B.cos(t)
    safe_ct = B.where((ct, "<", 1e-12), 1e-12, ct)
    lam = (x - fe) * math.pi / (2.0 * math.sqrt(2.0) * R * safe_ct)
    lam = B.where((ct, "<", 1e-12), 0.0, lam)
    return lon0 + lam * _R2D, phi * _R2D


# ---------------------------------------------------------------------------
# Swiss oblique Mercator (EPSG method 9814, the Rosenmund double
# projection behind CH1903/LV03 and LV95) — ellipsoid -> conformal
# sphere -> pole rotation -> equatorial Mercator.  The reference reaches
# it through proj.4 "+proj=somerc" (crs.py:248-306).
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _somerc_consts(lat0: float, k0: float, a: float, f: float):
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    p0 = lat0 * _D2R
    sp0 = math.sin(p0)
    cp0 = math.cos(p0)
    c = math.sqrt(1.0 + e2 * cp0 ** 4 / (1.0 - e2))
    R = k0 * a * math.sqrt(1.0 - e2) / (1.0 - e2 * sp0 * sp0)
    b0 = math.asin(sp0 / c)
    K = (math.log(math.tan(math.pi / 4.0 + b0 / 2.0))
         - c * math.log(math.tan(math.pi / 4.0 + p0 / 2.0)
                        * ((1.0 - e * sp0) / (1.0 + e * sp0)) ** (e / 2.0)))
    return e, c, R, b0, K


def _somerc_fwd(B, lon, lat, lat0, lon0, k0, fe, fn,
                a=A_WGS84, f=F_WGS84):
    e, c, R, b0, K = _somerc_consts(lat0, k0, a, f)
    phi = lat * _D2R
    es = e * B.sin(phi)
    # conformal-sphere latitude b and longitude l
    S = c * B.ln(B.tan(math.pi / 4.0 + phi / 2.0)
                 * B.pow((1.0 - es) / (1.0 + es), e / 2.0)) + K
    b = 2.0 * (B.atan(B.exp(S)) - math.pi / 4.0)
    lam = c * (_wrap_dlon(B, lon, lon0) * _D2R)
    # rotate the pole so the center parallel becomes the equator
    sb, cb = B.sin(b), B.cos(b)
    sbb = math.cos(b0) * sb - math.sin(b0) * cb * B.cos(lam)
    sbb = B.where((sbb, ">", 1.0), 1.0, sbb)
    sbb = B.where((sbb, "<", -1.0), -1.0, sbb)
    bbar = B.asin(sbb)
    lbar = B.atan2(cb * B.sin(lam),
                   math.cos(b0) * cb * B.cos(lam) + math.sin(b0) * sb)
    x = fe + R * lbar
    y = fn + R * _atanh(B, B.sin(bbar))  # ln tan(pi/4 + b/2) = atanh(sin b)
    return x, y


def _somerc_inv(B, x, y, lat0, lon0, k0, fe, fn, a=A_WGS84, f=F_WGS84):
    e, c, R, b0, K = _somerc_consts(lat0, k0, a, f)
    lbar = (x - fe) / R
    bbar = 2.0 * (B.atan(B.exp((y - fn) / R)) - math.pi / 4.0)
    sb = math.cos(b0) * B.sin(bbar) \
        + math.sin(b0) * B.cos(bbar) * B.cos(lbar)
    sb = B.where((sb, ">", 1.0), 1.0, sb)
    sb = B.where((sb, "<", -1.0), -1.0, sb)
    b = B.asin(sb)
    lam = B.atan2(B.cos(bbar) * B.sin(lbar),
                  math.cos(b0) * B.cos(bbar) * B.cos(lbar)
                  - math.sin(b0) * B.sin(bbar))
    # conformal sphere -> ellipsoid: invert S through the conformal
    # latitude series (chi = b is the conformal latitude of the sphere
    # of the DOUBLE projection, so undo via fixed-point on phi)
    S = (_atanh(B, B.sin(b)) - K) / c
    chi = 2.0 * B.atan(B.exp(S)) - math.pi / 2.0
    phi = _conformal_to_geographic(B, chi, e * e)
    return lon0 + (lam / c) * _R2D, phi * _R2D


# ---------------------------------------------------------------------------
# Krovak oblique conformal conic (EPSG method 9819) — the S-JTSK grid
# behind every Czech and Slovak national dataset.  Ellipsoid -> Gauss
# conformal sphere -> rotation to the cone axis (azimuth ~30.29 deg)
# -> conformal cone at the pseudo standard parallel.  Native axes are
# SOUTHING (X) / WESTING (Y); the kind emits the GIS "east-north"
# convention of EPSG:5514 (x = -Y + FE, y = -X + FN), matching what
# proj.4 +proj=krovak returns (the reference's path, crs.py:248-306).
# params = (lat_c, lon0_greenwich, alpha, lat_p, k0, fe, fn) +
# optional (a, f).
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _krovak_consts(lat_c: float, alpha: float, lat_p: float, k0: float,
                   a: float, f: float):
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    pc = lat_c * _D2R
    spc = math.sin(pc)
    A = a * math.sqrt(1.0 - e2) / (1.0 - e2 * spc * spc)
    Bk = math.sqrt(1.0 + e2 * math.cos(pc) ** 4 / (1.0 - e2))
    g0 = math.asin(spc / Bk)
    t0 = (math.tan(math.pi / 4.0 + g0 / 2.0)
          * ((1.0 + e * spc) / (1.0 - e * spc)) ** (e * Bk / 2.0)
          / math.tan(math.pi / 4.0 + pc / 2.0) ** Bk)
    pp = lat_p * _D2R
    n = math.sin(pp)
    r0 = k0 * A / math.tan(pp)
    tp = math.tan(math.pi / 4.0 + pp / 2.0)
    return e, e2, Bk, math.log(t0), alpha * _D2R, n, r0, tp


def _krovak_fwd(B, lon, lat, lat_c, lon0, alpha, lat_p, k0, fe, fn,
                a=A_WGS84, f=F_WGS84, sgn=-1.0):
    e, e2, Bk, ln_t0, al, n, r0, tp = _krovak_consts(
        lat_c, alpha, lat_p, k0, a, f)
    phi = lat * _D2R
    es = e * B.sin(phi)
    # Gauss-sphere latitude U (conformal, same ln-form somerc uses)
    S = ln_t0 + Bk * (B.ln(B.tan(math.pi / 4.0 + phi / 2.0))
                      - (e / 2.0) * B.ln((1.0 + es) / (1.0 - es)))
    U = 2.0 * (B.atan(B.exp(S)) - math.pi / 4.0)
    V = Bk * (-1.0 * (_wrap_dlon(B, lon, lon0) * _D2R))
    sU, cU = B.sin(U), B.cos(U)
    sT = math.cos(al) * sU + math.sin(al) * (cU * B.cos(V))
    sT = B.where((sT, ">", 1.0), 1.0, sT)
    sT = B.where((sT, "<", -1.0), -1.0, sT)
    T = B.asin(sT)
    cT = B.sqrt(1.0 - sT * sT)
    D = B.asin(cU * B.sin(V) / cT)
    theta = n * D
    r = r0 * B.pow(tp / B.tan(T / 2.0 + math.pi / 4.0), n)
    xs = r * B.cos(theta)   # native southing
    yw = r * B.sin(theta)   # native westing
    # sgn=-1: EPSG:5514 east-north convention (negative values, the
    # proj.4 default); sgn=+1: +czech — positive southing/westing,
    # the traditional S-JTSK sheet convention (proj krovak.c flag)
    return fe + sgn * yw, fn + sgn * xs


def _krovak_inv(B, x, y, lat_c, lon0, alpha, lat_p, k0, fe, fn,
                a=A_WGS84, f=F_WGS84, sgn=-1.0):
    e, e2, Bk, ln_t0, al, n, r0, tp = _krovak_consts(
        lat_c, alpha, lat_p, k0, a, f)
    yw = sgn * (x - fe)
    xs = sgn * (y - fn)
    r = B.sqrt(xs * xs + yw * yw)
    theta = B.atan2(yw, xs)
    D = theta / n
    T = 2.0 * (B.atan(tp * B.pow(r0 / r, 1.0 / n)) - math.pi / 4.0)
    sT, cT = B.sin(T), B.cos(T)
    sU = math.cos(al) * sT - math.sin(al) * (cT * B.cos(D))
    sU = B.where((sU, ">", 1.0), 1.0, sU)
    sU = B.where((sU, "<", -1.0), -1.0, sU)
    U = B.asin(sU)
    cU = B.sqrt(1.0 - sU * sU)
    sV = cT * B.sin(D) / cU
    sV = B.where((sV, ">", 1.0), 1.0, sV)
    sV = B.where((sV, "<", -1.0), -1.0, sV)
    V = B.asin(sV)
    lam = lon0 - (V / Bk) * _R2D
    # Gauss sphere -> ellipsoid through the conformal-latitude series
    S = (_atanh(B, sU) - ln_t0) / Bk
    chi = 2.0 * B.atan(B.exp(S)) - math.pi / 2.0
    phi = _conformal_to_geographic(B, chi, e2)
    return lam, phi * _R2D


# ---------------------------------------------------------------------------
# Oblique stereographic (EPSG method 9809, "double stereographic" /
# proj.4 +proj=sterea) — ellipsoid -> conformal sphere (the same
# Gauss-sphere step somerc uses) -> oblique spherical stereographic.
# The projection behind Amersfoort / RD New (EPSG:28992, the Dutch
# national grid).  The polar `stere` kind above is a different method
# (EPSG 9810, Snyder ellipsoidal); the reference reaches both through
# proj.4 (crs.py:248-306).  params = (lat0, lon0, k0, fe, fn) +
# optional (a, f).
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _sterea_consts(lat0: float, k0: float, a: float, f: float):
    """EPSG GN 7-2 method 9809 constants: Gauss-sphere n/c/R and the
    conformal latitude of the origin."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    p0 = lat0 * _D2R
    sp0, cp0 = math.sin(p0), math.cos(p0)
    n = math.sqrt(1.0 + e2 * cp0 ** 4 / (1.0 - e2))
    R = a * math.sqrt(1.0 - e2) / (1.0 - e2 * sp0 * sp0)
    S1 = (1.0 + sp0) / (1.0 - sp0)
    S2 = (1.0 - e * sp0) / (1.0 + e * sp0)
    w1 = (S1 * S2 ** e) ** n
    sin_chi00 = (w1 - 1.0) / (w1 + 1.0)
    c = ((n + sp0) * (1.0 - sin_chi00)
         / ((n - sp0) * (1.0 + sin_chi00)))
    w2 = c * w1
    chi0 = math.asin((w2 - 1.0) / (w2 + 1.0))
    return e, e2, n, c, 2.0 * R * k0, chi0


def _sterea_fwd(B, lon, lat, lat0, lon0, k0, fe, fn,
                a=A_WGS84, f=F_WGS84):
    e, e2, n, c, rk2, chi0 = _sterea_consts(lat0, k0, a, f)
    phi = lat * _D2R
    sphi = B.sin(phi)
    es = e * sphi
    w = c * B.pow((1.0 + sphi) / (1.0 - sphi)
                  * B.pow((1.0 - es) / (1.0 + es), e), n)
    sin_chi = (w - 1.0) / (w + 1.0)
    cos_chi = B.sqrt(1.0 - sin_chi * sin_chi)
    dL = n * (_wrap_dlon(B, lon, lon0) * _D2R)
    sx0, cx0 = math.sin(chi0), math.cos(chi0)
    Bb = 1.0 + sin_chi * sx0 + cos_chi * cx0 * B.cos(dL)
    x = fe + rk2 * (cos_chi * B.sin(dL)) / Bb
    y = fn + rk2 * (sin_chi * cx0 - cos_chi * sx0 * B.cos(dL)) / Bb
    return x, y


def _sterea_inv(B, x, y, lat0, lon0, k0, fe, fn, a=A_WGS84, f=F_WGS84):
    e, e2, n, c, rk2, chi0 = _sterea_consts(lat0, k0, a, f)
    sx0, cx0 = math.sin(chi0), math.cos(chi0)
    xr = x - fe
    yr = y - fn
    rho = B.sqrt(xr * xr + yr * yr)
    safe_rho = B.where((rho, "<", 1e-12), 1e-12, rho)
    ce = 2.0 * B.atan(safe_rho / rk2)
    sin_ce, cos_ce = B.sin(ce), B.cos(ce)
    sin_chi = B.where((rho, "<", 1e-12), sx0,
                      cos_ce * sx0 + (yr * sin_ce * cx0) / safe_rho)
    sin_chi = B.where((sin_chi, ">", 1.0), 1.0, sin_chi)
    sin_chi = B.where((sin_chi, "<", -1.0), -1.0, sin_chi)
    dL = B.atan2(xr * sin_ce,
                 safe_rho * cx0 * cos_ce - yr * sx0 * sin_ce)
    # conformal sphere -> ellipsoid: undo the Gauss mapping
    # atanh(sin chi) = n*psi_ell + ln(c)/2, then the standard
    # conformal-latitude series (the somerc inverse pattern)
    S = (_atanh(B, sin_chi) - 0.5 * math.log(c)) / n
    chi_std = 2.0 * B.atan(B.exp(S)) - math.pi / 2.0
    phi = _conformal_to_geographic(B, chi_std, e2)
    return lon0 + (dL / n) * _R2D, phi * _R2D


# ---------------------------------------------------------------------------
# plain oblique/equatorial stereographic (+proj=stere, |lat_0| < 90) —
# Snyder 1987 eq. 21-27..21-31 forward / 21-38..21-40 inverse
# (ellipsoidal oblique aspect via the conformal latitude), the
# formulation PROJ's PJ_stere.c OBLIQ/EQUIT arms implement.  Distinct
# from sterea (EPSG 9809 Gauss double projection): both conformal with
# scale k0 at the origin, diverging at higher order away from it.
# The reference reaches this through arbitrary proj.4 strings
# (reference crs.py:248-306).  params = (lat0, lon0, k0, fe, fn[, a, f]).
# ---------------------------------------------------------------------------

def _stere_obl_consts(lat0: float, k0: float, a: float, f: float):
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    p0 = lat0 * _D2R
    sp0, cp0 = math.sin(p0), math.cos(p0)
    es0 = e * sp0
    w0 = ((1.0 + sp0) / (1.0 - sp0)) * ((1.0 - es0) / (1.0 + es0)) ** e
    sin_x1 = (w0 - 1.0) / (w0 + 1.0)          # sin(conformal lat of origin)
    cos_x1 = math.sqrt(max(0.0, 1.0 - sin_x1 * sin_x1))
    m0 = cp0 / math.sqrt(1.0 - e2 * sp0 * sp0)
    return e, e2, sin_x1, cos_x1, 2.0 * a * k0 * m0


def _stere_obl_fwd(B, lon, lat, lat0, lon0, k0, fe, fn,
                   a=A_WGS84, f=F_WGS84):
    e, e2, sx1, cx1, akm1 = _stere_obl_consts(lat0, k0, a, f)
    phi = lat * _D2R
    sphi = B.sin(phi)
    es = e * sphi
    w = (1.0 + sphi) / (1.0 - sphi) * B.pow((1.0 - es) / (1.0 + es), e)
    sin_x = (w - 1.0) / (w + 1.0)
    cos_x = B.sqrt(1.0 - sin_x * sin_x)
    dL = _wrap_dlon(B, lon, lon0) * _D2R
    cos_dl = B.cos(dL)
    A = akm1 / (cx1 * (1.0 + sx1 * sin_x + cx1 * cos_x * cos_dl))
    x = fe + A * cos_x * B.sin(dL)
    y = fn + A * (cx1 * sin_x - sx1 * cos_x * cos_dl)
    return x, y


def _stere_obl_inv(B, x, y, lat0, lon0, k0, fe, fn,
                   a=A_WGS84, f=F_WGS84):
    e, e2, sx1, cx1, akm1 = _stere_obl_consts(lat0, k0, a, f)
    xr = x - fe
    yr = y - fn
    rho = B.sqrt(xr * xr + yr * yr)
    safe_rho = B.where((rho, "<", 1e-12), 1e-12, rho)
    ce = 2.0 * B.atan(safe_rho * cx1 / akm1)
    sin_ce, cos_ce = B.sin(ce), B.cos(ce)
    sin_x = B.where((rho, "<", 1e-12), sx1,
                    cos_ce * sx1 + (yr * sin_ce * cx1) / safe_rho)
    sin_x = B.where((sin_x, ">", 1.0), 1.0, sin_x)
    sin_x = B.where((sin_x, "<", -1.0), -1.0, sin_x)
    dL = B.atan2(xr * sin_ce,
                 safe_rho * cx1 * cos_ce - yr * sx1 * sin_ce)
    chi = B.atan2(sin_x, B.sqrt(1.0 - sin_x * sin_x))
    phi = _conformal_to_geographic(B, chi, e2)
    return lon0 + dL * _R2D, phi * _R2D


# ---------------------------------------------------------------------------
# equidistant conic (+proj=eqdc) — Snyder 1987 eq. 16-4..16-6 forward /
# 16-10..16-11 constants / inverse via the rectifying-latitude series
# (the same meridian-arc pair tmerc uses).  True scale on both standard
# parallels and along every meridian.  params =
# (lat1, lat2, lat0, lon0, fe, fn[, a, f]).
# ---------------------------------------------------------------------------

def _eqdc_consts(lat1: float, lat2: float, lat0: float,
                 a: float, f: float):
    e2 = f * (2.0 - f)
    p1, p2, p0 = lat1 * _D2R, lat2 * _D2R, lat0 * _D2R

    def m(p):
        return math.cos(p) / math.sqrt(1.0 - e2 * math.sin(p) ** 2)

    def M(p):
        return float(_meridian_arc(_NpOps, np.float64(p), a, e2))

    m1 = m(p1)
    if abs(p1 - p2) < 1e-12:
        n = math.sin(p1)
    else:
        n = a * (m1 - m(p2)) / (M(p2) - M(p1))
    if abs(n) < 1e-10:
        raise ValueError(
            "eqdc: standard parallels are symmetric about the equator "
            "(n = 0); the projection degenerates to plate carree")
    G = m1 / n + M(p1) / a
    rho0 = a * G - M(p0)
    return e2, n, G, rho0


def _eqdc_fwd(B, lon, lat, lat1, lat2, lat0, lon0, fe, fn,
              a=A_WGS84, f=F_WGS84):
    e2, n, G, rho0 = _eqdc_consts(lat1, lat2, lat0, a, f)
    rho = a * G - _meridian_arc(B, lat * _D2R, a, e2)
    th = n * (_wrap_dlon(B, lon, lon0) * _D2R)
    x = fe + rho * B.sin(th)
    y = fn + rho0 - rho * B.cos(th)
    return x, y


def _eqdc_inv(B, x, y, lat1, lat2, lat0, lon0, fe, fn,
              a=A_WGS84, f=F_WGS84):
    e2, n, G, rho0 = _eqdc_consts(lat1, lat2, lat0, a, f)
    sgn = 1.0 if n >= 0 else -1.0
    xr = x - fe
    yd = rho0 - (y - fn)
    rho = sgn * B.sqrt(xr * xr + yd * yd)
    th = B.atan2(sgn * xr, sgn * yd)
    phi = _inv_meridian_arc(B, a * G - rho, a, e2)
    return lon0 + (th / n) * _R2D, phi * _R2D


# ---------------------------------------------------------------------------
# Hotine oblique Mercator (EPSG methods 9812 "variant A" / 9815
# "variant B", Snyder 1987 section 9 eq. 9-1..9-47) — the general
# oblique-azimuth cylinder: Malaysia RSO grids, Alaska zone 1,
# Hungarian EOV-style grids.  The Swiss somerc arm (above) is the
# azimuth-90 Rosenmund double projection; the general Hotine form with
# alpha=gamma=90 reproduces it (pinned by tests).  The reference
# reaches omerc through arbitrary proj.4 strings (crs.py:248-306).
# params = (lat0, lonc, alpha, gamma, k0, fe, fn, off) + optional
# (a, f): off=1.0 is variant B (FE/FN at the projection CENTER, the
# proj.4 default), off=0.0 is variant A (+no_off, FE/FN at the
# natural origin).
# ---------------------------------------------------------------------------

def _omerc_two_point_to_azimuth(lat0: float, lat1: float, lon1: float,
                                lat2: float, lon2: float,
                                a: float, f: float) -> tuple[float, float]:
    """Two-point Hotine form -> equivalent azimuth form (lonc, alpha).

    Exactly the internal conversion proj omerc.c performs for
    +lat_1/+lon_1/+lat_2/+lon_2: the initial line is the conformal
    'great circle' through the two points; gamma defaults to the
    resulting alpha_c, matching proj.  Degrees in, degrees out."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)

    def tsfn(p):
        sp = math.sin(p)
        return (math.tan(math.pi / 4.0 - p / 2.0)
                / ((1.0 - e * sp) / (1.0 + e * sp)) ** (e / 2.0))

    def adjlon(x):
        while x > math.pi:
            x -= 2.0 * math.pi
        while x < -math.pi:
            x += 2.0 * math.pi
        return x

    p0, p1, p2 = (v * _D2R for v in (lat0, lat1, lat2))
    sp0, cp0 = math.sin(p0), math.cos(p0)
    Bc = math.sqrt(1.0 + e2 * cp0 ** 4 / (1.0 - e2))
    D = Bc * math.sqrt(1.0 - e2) / (cp0 * math.sqrt(1.0 - e2 * sp0 * sp0))
    D2 = max(D * D, 1.0)
    s0 = 1.0 if lat0 >= 0 else -1.0
    F = D + math.sqrt(D2 - 1.0) * s0
    E = F * tsfn(p0) ** Bc
    H = tsfn(p1) ** Bc
    L = tsfn(p2) ** Bc
    Fv = E / H
    pq = (L - H) / (L + H)
    J = (E * E - L * H) / (E * E + L * H)
    lam1, lam2 = lon1 * _D2R, lon2 * _D2R
    con = lam1 - lam2
    if con < -math.pi:
        lam2 -= 2.0 * math.pi
    elif con > math.pi:
        lam2 += 2.0 * math.pi
    lam0 = adjlon(0.5 * (lam1 + lam2)
                  - math.atan(J * math.tan(0.5 * Bc * (lam1 - lam2)) / pq)
                  / Bc)
    gamma0 = math.atan(2.0 * math.sin(Bc * adjlon(lam1 - lam0))
                       / (Fv - 1.0 / Fv))
    alpha = math.asin(min(max(D * math.sin(gamma0), -1.0), 1.0))
    G = (F - 1.0 / F) / 2.0
    lonc = lam0 + math.asin(min(max(G * math.tan(gamma0), -1.0), 1.0)) / Bc
    return lonc * _R2D, alpha * _R2D


@lru_cache(maxsize=None)
def _omerc_consts(lat0: float, lonc: float, alpha: float, gamma: float,
                  k0: float, a: float, f: float):
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    p0 = lat0 * _D2R
    sp0, cp0 = math.sin(p0), math.cos(p0)
    al = alpha * _D2R
    s0 = 1.0 if lat0 >= 0 else -1.0
    Bc = math.sqrt(1.0 + e2 * cp0 ** 4 / (1.0 - e2))
    A = a * Bc * k0 * math.sqrt(1.0 - e2) / (1.0 - e2 * sp0 * sp0)
    t0 = (math.tan(math.pi / 4.0 - p0 / 2.0)
          / ((1.0 - e * sp0) / (1.0 + e * sp0)) ** (e / 2.0))
    D = Bc * math.sqrt(1.0 - e2) / (cp0 * math.sqrt(1.0 - e2 * sp0 * sp0))
    D2 = max(D * D, 1.0)
    Fc = D + math.sqrt(D2 - 1.0) * s0
    E = Fc * t0 ** Bc
    G = (Fc - 1.0 / Fc) / 2.0
    g0 = math.asin(min(max(math.sin(al) / D, -1.0), 1.0))
    lam0 = lonc * _D2R - math.asin(
        min(max(G * math.tan(g0), -1.0), 1.0)) / Bc
    # variant-B center offset along u (EPSG 9815): by definition the
    # u-coordinate OF the projection center (phi0, lonc).  EPSG's
    # closed form (A/B)*atan(sqrt(D^2-1)/cos(alpha))*sign(phi0) is the
    # same quantity analytically, but evaluating it independently
    # de-synchronizes from the per-point formula in floats (asin at
    # its domain edge loses ~2e-8 rad for alpha near +-90, shifting
    # the whole grid ~A*1e-8 ~ 5-10 cm along u).  Evaluating the
    # FORWARD u at the center with the same scalar arithmetic is
    # self-consistent for every alpha: the center maps to (FE, FN)
    # exactly.
    S0 = G  # (Q0 - 1/Q0)/2 at phi0: Q0 = E/t0^B = F, so S0 = G exactly
    # (F, hence G, already carries sign(phi0))
    V0 = math.sin(Bc * (lonc * _D2R - lam0))
    uc = (A / Bc) * math.atan2(S0 * math.cos(g0) + V0 * math.sin(g0),
                               math.cos(Bc * (lonc * _D2R - lam0)))
    gc = gamma * _D2R
    return (e, e2, Bc, A, E, math.sin(g0), math.cos(g0),
            lam0 * _R2D, uc, math.sin(gc), math.cos(gc))


def _omerc_fwd(B, lon, lat, lat0, lonc, alpha, gamma, k0, fe, fn, off,
               a=A_WGS84, f=F_WGS84):
    (e, e2, Bc, A, E, sg0, cg0, lam0_deg, uc, sgc, cgc
     ) = _omerc_consts(lat0, lonc, alpha, gamma, k0, a, f)
    phi = lat * _D2R
    es = e * B.sin(phi)
    t = B.tan(math.pi / 4.0 - phi / 2.0) \
        / B.pow((1.0 - es) / (1.0 + es), e / 2.0)
    Q = E / B.pow(t, Bc)
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    dl = _wrap_dlon(B, lon, lam0_deg) * _D2R
    V = B.sin(Bc * dl)
    U = (S * sg0 - V * cg0) / T
    v = A * B.ln((1.0 - U) / (1.0 + U)) / (2.0 * Bc)
    u = A * B.atan2(S * cg0 + V * sg0, B.cos(Bc * dl)) / Bc
    if off:
        u = u - uc
    x = fe + v * cgc + u * sgc
    y = fn + u * cgc - v * sgc
    return x, y


def _omerc_inv(B, x, y, lat0, lonc, alpha, gamma, k0, fe, fn, off,
               a=A_WGS84, f=F_WGS84):
    (e, e2, Bc, A, E, sg0, cg0, lam0_deg, uc, sgc, cgc
     ) = _omerc_consts(lat0, lonc, alpha, gamma, k0, a, f)
    xr = x - fe
    yr = y - fn
    v = xr * cgc - yr * sgc
    u = yr * cgc + xr * sgc
    if off:
        u = u + uc
    Qp = B.exp(-1.0 * (Bc * v / A))
    Sp = (Qp - 1.0 / Qp) / 2.0
    Tp = (Qp + 1.0 / Qp) / 2.0
    Vp = B.sin(Bc * u / A)
    Up = (Vp * cg0 + Sp * sg0) / Tp
    Up = B.where((Up, ">", 1.0), 1.0, Up)
    Up = B.where((Up, "<", -1.0), -1.0, Up)
    tp = B.pow(E / B.sqrt((1.0 + Up) / (1.0 - Up)), 1.0 / Bc)
    chi = math.pi / 2.0 - 2.0 * B.atan(tp)
    phi = _conformal_to_geographic(B, chi, e2)
    lam = lam0_deg * _D2R - B.atan2(Sp * cg0 - Vp * sg0,
                                    B.cos(Bc * u / A)) / Bc
    return lam * _R2D, phi * _R2D


# ---------------------------------------------------------------------------
# Lambert conformal conic (Snyder 1987 section 15, ellipsoidal) — the
# reference reaches lcc through arbitrary proj.4 strings
# (crs.py:248-306 ProjectedCRS(proj="+proj=lcc ...")); here it is a
# native CrsDef kind with the triple backend.  params = (lat1, lat2,
# lat0, lon0, k0, fe, fn, a, f); lat1 == lat2 is the one-standard-
# parallel form (n = sin(lat1), k0 applies — Snyder 15-11 note).
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _lcc_consts(lat1: float, lat2: float, lat0: float, k0: float,
                a: float, f: float):
    """n, a*k0*F, rho0 (Snyder 15-8, 15-9, 15-10, 14-15) — driver-side
    scalars, cached per definition."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)

    def m(phi):
        return math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) ** 2)

    def t(phi):
        es = e * math.sin(phi)
        return math.tan(math.pi / 4.0 - phi / 2.0) * (
            (1.0 + es) / (1.0 - es)) ** (e / 2.0)

    p1, p2, p0 = lat1 * _D2R, lat2 * _D2R, lat0 * _D2R
    t1, t0 = t(p1), t(p0)
    if abs(lat1 - lat2) < 1e-10:
        n = math.sin(p1)
    else:
        t2 = t(p2)
        m1, m2 = m(p1), m(p2)
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    if n == 0.0:
        raise ValueError("lcc standard parallels must not straddle the "
                         "equator symmetrically (n = 0 degenerates to "
                         "Mercator — use merc/cea instead)")
    Fc = m(p1) / (n * t1 ** n)
    akF = a * k0 * Fc
    rho0 = akF * t0 ** n
    return n, akF, rho0


def _lcc_fwd(B, lon, lat, lat1, lat2, lat0, lon0, k0, fe, fn, a, f):
    """Ellipsoidal Lambert conformal conic forward (Snyder 15-1..15-9)."""
    n, akF, rho0 = _lcc_consts(lat1, lat2, lat0, k0, a, f)
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    phi = lat * _D2R
    rho = akF * B.pow(_stere_t(B, phi, e), n)
    # a cone is not periodic in lon: wrap lon-lon0 into [-180, 180)
    dlon = lon - lon0
    dlon = dlon - 360.0 * B.floor((dlon + 180.0) * (1.0 / 360.0))
    theta = n * (dlon * _D2R)
    x = fe + rho * B.sin(theta)
    y = fn + rho0 - rho * B.cos(theta)
    return x, y


def _lcc_inv(B, x, y, lat1, lat2, lat0, lon0, k0, fe, fn, a, f):
    """Ellipsoidal lcc inverse (Snyder 15-10..15-11 with the conformal
    latitude series 3-5, matching the tmerc/stere inverse path)."""
    n, akF, rho0 = _lcc_consts(lat1, lat2, lat0, k0, a, f)
    e2 = f * (2.0 - f)
    # sign(n) handling (Snyder p.107): southern-parallel cones carry n's
    # sign on rho and flip both atan2 arguments
    s = 1.0 if n > 0 else -1.0
    xp = x - fe
    yp = rho0 - (y - fn)
    rho = s * B.sqrt(xp * xp + yp * yp)
    theta = B.atan2(s * xp, s * yp)
    t = B.pow(rho / akF, 1.0 / n)
    chi = math.pi / 2.0 - 2.0 * B.atan(t)
    phi = _conformal_to_geographic(B, chi, e2)
    lam = theta / n
    return lon0 + lam * _R2D, phi * _R2D


def _authalic_q(B, phi, e=E_WGS84, e2=E2_WGS84):
    es = e * B.sin(phi)
    return (1.0 - e2) * (
        B.sin(phi) / (1.0 - es * es)
        - (1.0 / (2.0 * e)) * B.ln((1.0 - es) / (1.0 + es)))


@lru_cache(maxsize=None)
def _qp_rq(a: float, f: float):
    """(q_polar, authalic radius Rq) per ellipsoid (Snyder 3-12/3-13)."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    qp = (1.0 - e2) * (
        1.0 / (1.0 - e2)
        - (1.0 / (2.0 * e)) * math.log((1.0 - e) / (1.0 + e)))
    return qp, a * math.sqrt(qp / 2.0)


_QP, _RQ = _qp_rq(A_WGS84, F_WGS84)


def _authalic_to_geographic(B, beta, e2=E2_WGS84):
    phi = beta
    for j, cc in enumerate(_auth_inv_coeffs(e2), start=1):
        phi = phi + cc * B.sin((2.0 * j) * beta)
    return phi


def _laea_fwd(B, lon, lat, lon0, a=A_WGS84, f=F_WGS84,
              fe=0.0, fn=0.0):
    """Equatorial-aspect ellipsoidal LAEA (Snyder 24-17..19, lat_0 = 0)."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    qp, rq = _qp_rq(a, f)
    lam = (lon - lon0) * _D2R
    phi = lat * _D2R
    q = _authalic_q(B, phi, e, e2)
    sinb = q / qp
    cosb = B.sqrt(1.0 - sinb * sinb)
    D = a / (rq * 1.0)  # m1 = 1, cos(beta1) = 1 at lat_0 = 0
    denom = 1.0 + cosb * B.cos(lam)
    Bc = rq * B.sqrt(2.0 / denom)
    x = fe + Bc * D * (cosb * B.sin(lam))
    y = fn + (Bc / D) * sinb
    return x, y


def _laea_inv(B, x, y, lon0, a=A_WGS84, f=F_WGS84,
              fe=0.0, fn=0.0):
    e2 = f * (2.0 - f)
    qp, rq = _qp_rq(a, f)
    D = a / rq
    x = x - fe
    y = y - fn
    xd = x / D
    yd = y * D
    rho = B.sqrt(xd * xd + yd * yd)
    # guard the projection center (rho -> 0): sin(ce)/rho -> 1/(2 Rq)
    safe_rho = B.where((rho, "<", 1e-12), 1e-12, rho)
    ce = 2.0 * B.asin(safe_rho / (2.0 * rq))
    sinb = B.where((rho, "<", 1e-12), 0.0, yd * B.sin(ce) / safe_rho)
    beta = B.asin(sinb)
    phi = _authalic_to_geographic(B, beta, e2)
    lam = B.atan2(x * B.sin(ce), D * safe_rho * B.cos(ce))
    return lon0 + lam * _R2D, phi * _R2D


def _laea_polar_fwd(B, lon, lat, sgn, lon0, fe=0.0, fn=0.0,
                    a=A_WGS84, f=F_WGS84):
    """Polar-aspect ellipsoidal LAEA (Snyder 24-23/24-24) — the
    EASE-Grid 2.0 family (sea-ice grids; the reference reaches them via
    proj.4 '+proj=laea +lat_0=+-90').  South is the mirrored north
    aspect, same sgn trick as the polar stereographic arm."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    qp, _ = _qp_rq(a, f)
    phi = (sgn * lat) * _D2R
    lam = (sgn * (lon - lon0)) * _D2R
    q = _authalic_q(B, phi, e, e2)
    # qp - q >= 0 analytically; float noise at the pole can dip a hair
    # negative under sqrt
    dq = qp - q
    rho = a * B.sqrt(B.where((dq, "<", 0.0), 0.0, dq))
    x = fe + sgn * (rho * B.sin(lam))
    y = fn - sgn * (rho * B.cos(lam))
    return x, y


def _laea_polar_inv(B, x, y, sgn, lon0, fe=0.0, fn=0.0,
                    a=A_WGS84, f=F_WGS84):
    e2 = f * (2.0 - f)
    qp, _ = _qp_rq(a, f)
    xp = sgn * (x - fe)
    yp = sgn * (y - fn)
    rho = B.sqrt(xp * xp + yp * yp)
    q = qp - (rho / a) * (rho / a)
    ratio = q / qp
    ratio = B.where((ratio, ">", 1.0), 1.0, ratio)
    ratio = B.where((ratio, "<", -1.0), -1.0, ratio)
    beta = B.asin(ratio)
    phi = _authalic_to_geographic(B, beta, e2)
    lam = B.atan2(xp, -1.0 * yp)
    return sgn * (lon0 + lam * _R2D), sgn * (phi * _R2D)


def _laea_obl_consts(lat0, a, f):
    """Driver-side constants for the oblique LAEA aspect (EPSG 9820):
    authalic latitude of the origin and the D shape factor."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    qp, rq = _qp_rq(a, f)
    phi0 = lat0 * _D2R
    s0 = math.sin(phi0)
    q0 = (1.0 - e2) * (s0 / (1.0 - e2 * s0 * s0)
                       - (1.0 / (2.0 * e))
                       * math.log((1.0 - e * s0) / (1.0 + e * s0)))
    beta0 = math.asin(min(max(q0 / qp, -1.0), 1.0))
    m0 = math.cos(phi0) / math.sqrt(1.0 - e2 * s0 * s0)
    D = a * m0 / (rq * math.cos(beta0))
    return e, e2, qp, rq, math.sin(beta0), math.cos(beta0), D


def _laea_obl_fwd(B, lon, lat, lat0, lon0, fe, fn, a=A_WGS84, f=F_WGS84):
    """General oblique-aspect ellipsoidal LAEA (EPSG method 9820 /
    Snyder 24-15..24-21) — the aspect behind ETRS89-LAEA Europe
    (EPSG:3035, lat_0=52) and the continental equal-area grids.  The
    equatorial arm keeps its specialized closed form and this one
    reduces to it bit-exactly at lat_0 = 0 (pinned by tests).  Within
    ~1e-4 deg of the poles the oblique form is numerically degenerate
    (1 - q0/qp falls below double epsilon, destroying cos(beta0)) —
    which is why |lat_0| = 90 routes to the dedicated polar arm in
    from_proj4/from_wkt.  The reference reaches oblique laea through
    arbitrary proj.4 strings (reference crs.py:248-306)."""
    e, e2, qp, rq, sinb0, cosb0, D = _laea_obl_consts(lat0, a, f)
    lam = (lon - lon0) * _D2R
    phi = lat * _D2R
    q = _authalic_q(B, phi, e, e2)
    sinb = q / qp
    cosb = B.sqrt(1.0 - sinb * sinb)
    cosl = B.cos(lam)
    denom = 1.0 + sinb0 * sinb + cosb0 * (cosb * cosl)
    Bc = rq * B.sqrt(2.0 / denom)
    x = fe + (Bc * D) * (cosb * B.sin(lam))
    y = fn + (Bc / D) * (cosb0 * sinb - sinb0 * (cosb * cosl))
    return x, y


def _laea_obl_inv(B, x, y, lat0, lon0, fe, fn, a=A_WGS84, f=F_WGS84):
    _, e2, qp, rq, sinb0, cosb0, D = _laea_obl_consts(lat0, a, f)
    xd = (x - fe) / D
    yd = (y - fn) * D
    rho = B.sqrt(xd * xd + yd * yd)
    safe_rho = B.where((rho, "<", 1e-12), 1e-12, rho)
    ratio = safe_rho / (2.0 * rq)
    ratio = B.where((ratio, ">", 1.0), 1.0, ratio)
    ce = 2.0 * B.asin(ratio)
    sin_ce = B.sin(ce)
    cos_ce = B.cos(ce)
    sinb = B.where((rho, "<", 1e-12), sinb0,
                   cos_ce * sinb0 + (yd * sin_ce * cosb0) / safe_rho)
    sinb = B.where((sinb, ">", 1.0), 1.0, sinb)
    sinb = B.where((sinb, "<", -1.0), -1.0, sinb)
    beta = B.asin(sinb)
    phi = _authalic_to_geographic(B, beta, e2)
    lam = B.atan2(xd * sin_ce,
                  safe_rho * cosb0 * cos_ce - yd * sinb0 * sin_ce)
    return lon0 + lam * _R2D, phi * _R2D


def _cea_fwd(B, lon, lat, lat_ts, a=A_WGS84, f=F_WGS84,
             lon0=0.0, fe=0.0, fn=0.0):
    """Cylindrical equal-area, ellipsoidal (Snyder 10-1/10-2)."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    ts = lat_ts * _D2R
    k0 = math.cos(ts) / math.sqrt(1.0 - e2 * math.sin(ts) ** 2)
    dlon = lon - lon0
    dlon = dlon - 360.0 * B.floor((dlon + 180.0) * (1.0 / 360.0))
    x = fe + a * k0 * (dlon * _D2R)
    y = fn + a * _authalic_q(B, lat * _D2R, e, e2) / (2.0 * k0)
    return x, y


def _cea_inv(B, x, y, lat_ts, a=A_WGS84, f=F_WGS84,
             lon0=0.0, fe=0.0, fn=0.0):
    e2 = f * (2.0 - f)
    ts = lat_ts * _D2R
    k0 = math.cos(ts) / math.sqrt(1.0 - e2 * math.sin(ts) ** 2)
    qp, _ = _qp_rq(a, f)
    lon = lon0 + (x - fe) / (a * k0) * _R2D
    sinb = 2.0 * (y - fn) * k0 / (a * qp)
    beta = B.asin(sinb)
    phi = _authalic_to_geographic(B, beta, e2)
    return lon, phi * _R2D


def _aea_consts(lat1: float, lat2: float, lat0: float,
                a: float = A_WGS84, f: float = F_WGS84):
    """n, C, rho0 for the ellipsoidal Albers equal-area conic
    (Snyder 1987 eqs. 14-3..14-6, 3-12) — driver-side scalars."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)

    def m(phi):
        return math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) ** 2)

    def q(phi):
        # the module's backend-generic authalic q, on the numpy backend
        return float(_authalic_q(_NpOps, phi, e, e2))

    p1, p2, p0 = lat1 * _D2R, lat2 * _D2R, lat0 * _D2R
    m1, m2 = m(p1), m(p2)
    q1, q2, q0 = q(p1), q(p2), q(p0)
    if abs(q2 - q1) < 1e-12:
        # one-standard-parallel limit (Snyder: n -> sin(lat1))
        n = math.sin(p1)
    else:
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    if n == 0.0:
        raise ValueError("Albers standard parallels must not straddle the "
                         "equator symmetrically (n = 0 degenerates to a "
                         "cylindrical projection — use cea instead)")
    C = m1 * m1 + n * q1
    rho0 = a * math.sqrt(C - n * q0) / n
    return n, C, rho0


def _aea_fwd(B, lon, lat, lat1, lat2, lat0, lon0, fe, fn,
             a=A_WGS84, f=F_WGS84):
    """Ellipsoidal Albers equal-area conic forward (Snyder 14-1..14-4)."""
    e2 = f * (2.0 - f)
    n, C, rho0 = _aea_consts(lat1, lat2, lat0, a, f)
    q = _authalic_q(B, lat * _D2R, math.sqrt(e2), e2)
    rho = a * B.sqrt(C - n * q) / n
    # a cone is not periodic in lon: wrap lon-lon0 into [-180, 180)
    dlon = lon - lon0
    dlon = dlon - 360.0 * B.floor((dlon + 180.0) * (1.0 / 360.0))
    theta = n * (dlon * _D2R)
    x = fe + rho * B.sin(theta)
    y = fn + rho0 - rho * B.cos(theta)
    return x, y


def _aea_inv(B, x, y, lat1, lat2, lat0, lon0, fe, fn,
             a=A_WGS84, f=F_WGS84):
    """Ellipsoidal Albers inverse (Snyder 14-8..14-11 via the authalic
    latitude series — same fixed-term expansion the laea/cea paths use)."""
    e2 = f * (2.0 - f)
    n, C, rho0 = _aea_consts(lat1, lat2, lat0, a, f)
    xp = x - fe
    yp = rho0 - (y - fn)
    # sign(n) handling (Snyder p.102): for southern standard parallels
    # (n < 0) rho carries n's sign and theta flips both atan2 arguments
    s = 1.0 if n > 0 else -1.0
    rho = s * B.sqrt(xp * xp + yp * yp)
    theta = B.atan2(s * xp, s * yp)
    q = (C - (rho * rho * n * n) / (a * a)) / n
    qp, _ = _qp_rq(a, f)
    beta = B.asin(q / qp)
    phi = _authalic_to_geographic(B, beta, e2)
    lam = theta / n
    return lon0 + lam * _R2D, phi * _R2D


def albers(lat1: float, lat2: float, lat0: float = 0.0, lon0: float = 0.0,
           fe: float = 0.0, fn: float = 0.0,
           ellps: str | tuple[float, float] = "WGS84") -> CrsDef:
    """Albers equal-area conic CRS (e.g. AlaskaAlbers = albers(55, 65, 50,
    -154)) — the reference reaches these through arbitrary proj4 strings
    (crs.py:219-243); here each conic is a named CrsDef.  ``ellps``
    selects the ellipsoid (proj.4 id or (a, f)); WGS84 keeps the
    historical 6-tuple params."""
    a, f = ellps if isinstance(ellps, tuple) else ellipsoid_params(ellps)
    lat1, lat2, lat0, lon0, fe, fn = (
        float(lat1), float(lat2), float(lat0), float(lon0), float(fe), float(fn))
    tail = () if (a, f) == (A_WGS84, F_WGS84) else (float(a), float(f))
    tag = "" if not tail else (f"_{ellps}" if isinstance(ellps, str)
                               else f"_{a:g}")
    return CrsDef(f"aea_{lat1:g}_{lat2:g}_{lat0:g}_{lon0:g}{tag}", "aea",
                  (lat1, lat2, lat0, lon0, fe, fn) + tail)


def lcc(lat1: float, lat2: float | None = None, lat0: float = 0.0,
        lon0: float = 0.0, k0: float = 1.0, fe: float = 0.0, fn: float = 0.0,
        ellps: str | tuple[float, float] = "WGS84") -> CrsDef:
    """Lambert conformal conic CRS (Snyder 15) — 2-SP when lat2 is given
    (State Plane, Lambert-93, national grids), 1-SP when omitted
    (lat2=lat1, k0 applies).  ``ellps`` is a proj.4 ellipsoid id or an
    (a, f) pair — State Plane NAD27 zones ride Clarke 1866.  The
    reference reaches these through arbitrary proj.4 strings
    (reference crs.py:248-306)."""
    a, f = ellps if isinstance(ellps, tuple) else ellipsoid_params(ellps)
    lat2 = lat1 if lat2 is None else lat2
    vals = tuple(float(v) for v in (lat1, lat2, lat0, lon0, k0, fe, fn))
    if (a, f) == (A_WGS84, F_WGS84):
        tag = ""
    else:
        tag = f"_{ellps}" if isinstance(ellps, str) else f"_{a:g}"
    return CrsDef(
        f"lcc_{vals[0]:g}_{vals[1]:g}_{vals[2]:g}_{vals[3]:g}{tag}",
        "lcc", vals + (float(a), float(f)))


def aeqd(lat0: float, lon0: float = 0.0, fe: float = 0.0, fn: float = 0.0,
         ellps: str | tuple[float, float] = "WGS84") -> CrsDef:
    """Azimuthal equidistant CRS centered at (lat0, lon0) — range-ring
    analysis, polar supplements, Pacific-island grids.  Spherical when
    the ellipsoid is a sphere (Snyder 25, exact); ellipsoidal polar via
    the meridian arc (Snyder 25-16, exact); ellipsoidal oblique via the
    EPSG 9832 Modified Azimuthal Equidistant series (Guam/Micronesia
    grids, mm-accurate near the origin).  The reference reaches aeqd
    through arbitrary proj.4 strings (reference crs.py:248-306)."""
    a, f = ellps if isinstance(ellps, tuple) else ellipsoid_params(ellps)
    vals = tuple(float(v) for v in (lat0, lon0, fe, fn))
    if (a, f) == (A_WGS84, F_WGS84):
        tag, tail = "", ()
    else:
        tag = f"_{ellps}" if isinstance(ellps, str) else f"_{a:g}"
        tail = (float(a), float(f))
    return CrsDef(f"aeqd_{vals[0]:g}_{vals[1]:g}{tag}", "aeqd", vals + tail)


def laea_oblique(lat0: float, lon0: float = 0.0, fe: float = 0.0,
                 fn: float = 0.0,
                 ellps: str | tuple[float, float] = "WGS84") -> CrsDef:
    """Oblique-aspect ellipsoidal Lambert azimuthal equal-area centered
    at (lat0, lon0) — EPSG method 9820; ETRS89-LAEA Europe (EPSG:3035)
    is the canonical instance (use the ETRS89_LAEA named CRS).  The
    equatorial (lat0=0) and polar (lat0=+-90) aspects have specialized
    kinds; this factory covers any origin latitude.  The reference
    reaches oblique laea via proj.4 (reference crs.py:248-306)."""
    a, f = ellps if isinstance(ellps, tuple) else ellipsoid_params(ellps)
    vals = tuple(float(v) for v in (lat0, lon0, fe, fn))
    if (a, f) == (A_WGS84, F_WGS84):
        tag, tail = "", ()
    else:
        tag = f"_{ellps}" if isinstance(ellps, str) else f"_{a:g}"
        tail = (float(a), float(f))
    params = vals + tail
    if params == ETRS89_LAEA.params:
        return ETRS89_LAEA
    return CrsDef(f"laea_obl_{vals[0]:g}_{vals[1]:g}{tag}",
                  "laea_oblique", params)


# ---------------------------------------------------------------------------
# geographic datum shift (reference crs.py:355-356: LonLatNAD27/NAD83 carry
# +datum identifiers that pyproj resolves to geocentric translations).
# lonlat on a source ellipsoid+datum <-> the WGS84 lonlat pivot via a
# 3-parameter geocentric Helmert translation; the geocentric->geodetic leg
# uses Bowring's one-step formula (sub-mm at h=0).  CONUS Molodensky
# parameters NAD27->WGS84 (dx,dy,dz)=(-8,160,176) m land within ~6 m of the
# reference's NADCON-grade golden (crs_tests.py:268-271, places=3 ~ 55 m).
# ---------------------------------------------------------------------------

def _geocentric_shift(B, lon, lat, a1, f1, dx, dy, dz, a2, f2):
    lam = _D2R * lon
    phi = _D2R * lat
    e2_1 = f1 * (2.0 - f1)
    sphi = B.sin(phi)
    cphi = B.cos(phi)
    N = a1 / B.sqrt(1.0 - e2_1 * sphi * sphi)
    X = N * cphi * B.cos(lam) + dx
    Y = N * cphi * B.sin(lam) + dy
    Z = N * (1.0 - e2_1) * sphi + dz
    e2_2 = f2 * (2.0 - f2)
    b2 = a2 * (1.0 - f2)
    ep2 = e2_2 / (1.0 - e2_2)
    p = B.sqrt(X * X + Y * Y)
    theta = B.atan2(Z * a2, p * b2)
    st = B.sin(theta)
    ct = B.cos(theta)
    phi2 = B.atan2(Z + ep2 * b2 * st * st * st, p - e2_2 * a2 * ct * ct * ct)
    lam2 = B.atan2(Y, X)
    return _R2D * lam2, _R2D * phi2


def _datum_fwd(B, lon, lat, dx, dy, dz, a, f):
    """WGS84-pivot lonlat -> datum lonlat (reverse translation)."""
    return _geocentric_shift(B, lon, lat, A_WGS84, F_WGS84, -dx, -dy, -dz, a, f)


def _datum_inv(B, lon, lat, dx, dy, dz, a, f):
    """datum lonlat -> WGS84-pivot lonlat (forward translation)."""
    return _geocentric_shift(B, lon, lat, a, f, dx, dy, dz, A_WGS84, F_WGS84)


def _dispatch_fwd(B, crs: CrsDef, lon, lat):
    if crs.kind == "lonlat":
        return lon, lat
    if crs.kind == "lonlat_datum":
        return _datum_fwd(B, lon, lat, *crs.params)
    if crs.kind == "webmercator":
        return _webmercator_fwd(B, lon, lat)
    if crs.kind == "merc":
        return _merc_fwd(B, lon, lat, *crs.params)
    if crs.kind == "tmerc":
        return _tm_fwd(B, lon, lat, *crs.params)
    if crs.kind == "stere":
        return _stere_fwd(B, lon, lat, *crs.params)
    if crs.kind == "laea":
        return _laea_fwd(B, lon, lat, *crs.params)
    if crs.kind == "laea_polar":
        return _laea_polar_fwd(B, lon, lat, *crs.params)
    if crs.kind == "laea_oblique":
        return _laea_obl_fwd(B, lon, lat, *crs.params)
    if crs.kind == "cea":
        return _cea_fwd(B, lon, lat, *crs.params)
    if crs.kind == "aea":
        return _aea_fwd(B, lon, lat, *crs.params)
    if crs.kind == "lcc":
        return _lcc_fwd(B, lon, lat, *crs.params)
    if crs.kind == "aeqd":
        return _aeqd_fwd(B, lon, lat, *crs.params)
    if crs.kind == "eqc":
        return _eqc_fwd(B, lon, lat, *crs.params)
    if crs.kind == "sinu":
        return _sinu_fwd(B, lon, lat, *crs.params)
    if crs.kind == "moll":
        return _moll_fwd(B, lon, lat, *crs.params)
    if crs.kind == "somerc":
        return _somerc_fwd(B, lon, lat, *crs.params)
    if crs.kind == "omerc":
        return _omerc_fwd(B, lon, lat, *crs.params)
    if crs.kind == "sterea":
        return _sterea_fwd(B, lon, lat, *crs.params)
    if crs.kind == "stere_obl":
        return _stere_obl_fwd(B, lon, lat, *crs.params)
    if crs.kind == "eqdc":
        return _eqdc_fwd(B, lon, lat, *crs.params)
    if crs.kind == "krovak":
        return _krovak_fwd(B, lon, lat, *crs.params)
    if crs.kind == "aeqd_guam":
        return _aeqd_guam_fwd(B, lon, lat, *crs.params)
    raise ValueError(f"unknown CRS kind {crs.kind!r}")


def _dispatch_inv(B, crs: CrsDef, x, y):
    if crs.kind == "lonlat":
        return x, y
    if crs.kind == "lonlat_datum":
        return _datum_inv(B, x, y, *crs.params)
    if crs.kind == "webmercator":
        return _webmercator_inv(B, x, y)
    if crs.kind == "merc":
        return _merc_inv(B, x, y, *crs.params)
    if crs.kind == "tmerc":
        return _tm_inv(B, x, y, *crs.params)
    if crs.kind == "stere":
        return _stere_inv(B, x, y, *crs.params)
    if crs.kind == "laea":
        return _laea_inv(B, x, y, *crs.params)
    if crs.kind == "laea_polar":
        return _laea_polar_inv(B, x, y, *crs.params)
    if crs.kind == "laea_oblique":
        return _laea_obl_inv(B, x, y, *crs.params)
    if crs.kind == "cea":
        return _cea_inv(B, x, y, *crs.params)
    if crs.kind == "aea":
        return _aea_inv(B, x, y, *crs.params)
    if crs.kind == "lcc":
        return _lcc_inv(B, x, y, *crs.params)
    if crs.kind == "aeqd":
        return _aeqd_inv(B, x, y, *crs.params)
    if crs.kind == "eqc":
        return _eqc_inv(B, x, y, *crs.params)
    if crs.kind == "sinu":
        return _sinu_inv(B, x, y, *crs.params)
    if crs.kind == "moll":
        return _moll_inv(B, x, y, *crs.params)
    if crs.kind == "somerc":
        return _somerc_inv(B, x, y, *crs.params)
    if crs.kind == "omerc":
        return _omerc_inv(B, x, y, *crs.params)
    if crs.kind == "sterea":
        return _sterea_inv(B, x, y, *crs.params)
    if crs.kind == "stere_obl":
        return _stere_obl_inv(B, x, y, *crs.params)
    if crs.kind == "eqdc":
        return _eqdc_inv(B, x, y, *crs.params)
    if crs.kind == "krovak":
        return _krovak_inv(B, x, y, *crs.params)
    if crs.kind == "aeqd_guam":
        return _aeqd_guam_inv(B, x, y, *crs.params)
    raise ValueError(f"unknown CRS kind {crs.kind!r}")


# ---------------------------------------------------------------------------
# public surface
# ---------------------------------------------------------------------------

def forward_exprs(crs: CrsDef, lon: Column, lat: Column) -> tuple[Column, Column]:
    """lonlat -> projected (x, y) as Catalyst expressions."""
    return _dispatch_fwd(_ColOps, crs, lon, lat)


def inverse_exprs(crs: CrsDef, x: Column, y: Column) -> tuple[Column, Column]:
    """projected (x, y) -> lonlat as Catalyst expressions."""
    return _dispatch_inv(_ColOps, crs, x, y)


def forward_sql(crs: CrsDef, lon_expr: str, lat_expr: str) -> tuple[str, str]:
    """DuckDB-SQL twins of forward_exprs (identical algebra)."""
    x, y = _dispatch_fwd(_SqlOps, crs, _SqlVal(f"({lon_expr})"), _SqlVal(f"({lat_expr})"))
    return x.s, y.s


def inverse_sql(crs: CrsDef, x_expr: str, y_expr: str) -> tuple[str, str]:
    x, y = _dispatch_inv(_SqlOps, crs, _SqlVal(f"({x_expr})"), _SqlVal(f"({y_expr})"))
    return x.s, y.s


def _crs_ellipsoid(crs: CrsDef) -> tuple[float, float]:
    """(a, e2) of the ellipsoid a CRS rides (WGS84 when the params
    carry no tail) — looks for the (a, f) pair at the end of params.

    Scans BACKWARD for the last semi-major-axis-sized element with a
    successor: some kinds append trailing flags after the (a, f) tail
    (krovak +czech appends sgn=1.0, so p[-2] is f, not a), and a false
    northing of 10^7 m earlier in the tuple must not be mistaken for a
    (the backward scan hits the true a first)."""
    p = crs.params
    for i in range(len(p) - 2, -1, -1):
        if isinstance(p[i], float) and p[i] > 6e6:
            a, f = float(p[i]), float(p[i + 1])
            return a, f * (2.0 - f)
    return A_WGS84, E2_WGS84


def meridian_arc_expr(crs: CrsDef, lat: Column) -> Column:
    """Ellipsoidal meridian arc length from the equator to *lat*
    (degrees) on the CRS's ellipsoid, as a Catalyst expression —
    exposes the same Snyder 3-21 series the projections use (the
    eqdc/tmerc invariant checks build on it)."""
    a, e2 = _crs_ellipsoid(crs)
    return _meridian_arc(_ColOps, lat * _D2R, a, e2)


def meridian_arc_sql(crs: CrsDef, lat_expr: str) -> str:
    """DuckDB-SQL twin of :func:`meridian_arc_expr`."""
    a, e2 = _crs_ellipsoid(crs)
    return _meridian_arc(_SqlOps, _SqlVal(f"({lat_expr})") * _D2R, a, e2).s


def forward_np(crs: CrsDef, lon, lat):
    return _dispatch_fwd(_NpOps, crs,
                         np.asarray(lon, dtype=np.float64),
                         np.asarray(lat, dtype=np.float64))


def inverse_np(crs: CrsDef, x, y):
    return _dispatch_inv(_NpOps, crs,
                         np.asarray(x, dtype=np.float64),
                         np.asarray(y, dtype=np.float64))


_REGISTRY = {c.name: c for c in (
    LONLAT, WEB_MERCATOR, WORLD_MERCATOR, UPS_NORTH, UPS_SOUTH,
    NSIDC_NORTH, NSIDC_SOUTH, LAEA_WGS84, GALL_PETERS, LONLAT_NAD27,
    LONLAT_NAD83, EASE2_NORTH, EASE2_SOUTH, MODIS_SINU, PLATE_CARREE,
    CH1903_LV03, CH1903_LV95, ETRS89_LAEA, RD_NEW, S_JTSK)}

# well-known EPSG codes -> named instances (the reference resolves any
# EPSG code through pyproj, reference crs.py:248-306; this table covers
# the codes whose full definitions the registry carries natively —
# unknown codes raise rather than guess)
_EPSG = {
    4326: LONLAT, 4267: LONLAT_NAD27, 4269: LONLAT_NAD83,
    3857: WEB_MERCATOR, 3395: WORLD_MERCATOR,
    5041: UPS_NORTH, 5042: UPS_SOUTH,
    3413: NSIDC_NORTH, 3976: NSIDC_SOUTH,
    6931: EASE2_NORTH, 6932: EASE2_SOUTH,
    4087: PLATE_CARREE, 3035: ETRS89_LAEA,
    21781: CH1903_LV03, 2056: CH1903_LV95, 28992: RD_NEW,
    5514: S_JTSK,
}


# constructible codes carried as their proj.4 definitions (resolved
# through from_proj4 on first use)
_EPSG_PROJ4 = {
    # RGF93 / Lambert-93 (France national grid, lcc 2SP on GRS80)
    2154: ("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
           "+x_0=700000 +y_0=6600000 +ellps=GRS80 +units=m +no_defs"),
    # NAD83 / Conus Albers (the US national equal-area grid)
    5070: ("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
           "+x_0=0 +y_0=0 +ellps=GRS80 +units=m +no_defs"),
    # WGS 84 / Antarctic Polar Stereographic
    3031: ("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +k=1 "
           "+x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs"),
    # ETRS89 / LCC Europe (the EU-wide conformal companion of 3035)
    3034: ("+proj=lcc +lat_1=35 +lat_2=65 +lat_0=52 +lon_0=10 "
           "+x_0=4000000 +y_0=2800000 +ellps=GRS80 +units=m +no_defs"),
}


@lru_cache(maxsize=None)
def from_epsg(code: int) -> CrsDef:
    """Resolve a well-known EPSG code to its named CrsDef; UTM zones
    via the 326xx/327xx ranges; constructible national grids via their
    carried proj.4 definitions; anything else raises."""
    code = int(code)
    if code in _EPSG:
        return _EPSG[code]
    if code in _EPSG_PROJ4:
        return from_proj4(_EPSG_PROJ4[code])
    if 32601 <= code <= 32660:
        return utm(code - 32600, south=False)
    if 32701 <= code <= 32760:
        return utm(code - 32700, south=True)
    raise ValueError(f"EPSG:{code} not in the native registry "
                     "(use from_proj4/from_wkt with its definition)")


def lookup(crs: CrsDef | str) -> CrsDef:
    if isinstance(crs, CrsDef):
        return crs
    if crs in _REGISTRY:
        return _REGISTRY[crs]
    if crs.lower().startswith("epsg:"):
        return from_epsg(int(crs[5:]))
    if crs.startswith("utm"):
        tail = crs[3:]
        south = tail.endswith(("s", "S"))
        return utm(int(tail.rstrip("nsNS")), south)
    raise ValueError(f"unknown CRS {crs!r}")


def from_proj4(s: str) -> CrsDef:
    """Construct a CrsDef from a proj.4 string — the reference's CRS
    construction path (crs.py:248-306 ProjectedCRS(proj=...), named
    instances crs.py:354-390).  Strings whose parameters coincide with a
    named CrsDef return that instance; unsupported projections raise."""
    toks: dict[str, str] = {}
    flags = set()
    for part in s.split():
        if not part.startswith("+"):
            continue
        if "=" in part:
            k, v = part[1:].split("=", 1)
            toks.setdefault(k, v)
        else:
            flags.add(part[1:])
    proj = toks.get("proj", "longlat")

    def g(key, default=0.0):
        return float(toks.get(key, default))

    k0 = float(toks.get("k", toks.get("k_0", 1.0)))

    def ell() -> tuple[float, float]:
        """(a, f) from +R, +a/+b/+rf/+f, +ellps, or +datum (in proj.4
        precedence order); defaults to WGS84."""
        if "R" in toks:  # sphere of radius R (the MODIS-sinu form)
            return float(toks["R"]), 0.0
        if "a" in toks:
            a = float(toks["a"])
            if "b" in toks:
                return a, (a - float(toks["b"])) / a
            if "rf" in toks:
                return a, 1.0 / float(toks["rf"])
            if "f" in toks:
                return a, float(toks["f"])
            return a, 0.0  # +a alone: sphere of radius a
        if "ellps" in toks:
            return ellipsoid_params(toks["ellps"])
        if "datum" in toks:
            name = _DATUM_ELLIPSOIDS.get(toks["datum"])
            if name is None:
                raise ValueError(f"unknown datum {toks['datum']!r}")
            return ellipsoid_params(name)
        return A_WGS84, F_WGS84

    def ell_tail() -> tuple:
        """() for WGS84 (keeps named-instance param equality), else
        the (a, f) params tail."""
        a, f = ell()
        return () if (a, f) == (A_WGS84, F_WGS84) else (a, f)
    if proj in ("longlat", "lonlat", "latlong", "latlon"):
        datum = toks.get("datum", "WGS84")
        if datum == "NAD27":
            return LONLAT_NAD27
        if datum == "NAD83":
            return LONLAT_NAD83
        return LONLAT
    if proj == "merc":
        a_, f_ = ell()
        lat_ts = g("lat_ts")
        # +lat_ts overrides +k_0 (proj.4 / EPSG 9805); canonicalize so
        # params roundtrip through to_proj4
        base = (lat_ts, g("lon_0"), 1.0 if lat_ts else k0,
                g("x_0"), g("y_0"))
        bare = not ({"R", "a", "b", "rf", "f", "ellps", "datum"}
                    & toks.keys())
        if base == (0.0, 0.0, 1.0, 0.0, 0.0) and (
                bare or toks.get("ellps") == "sphere"
                or (f_ == 0.0 and a_ == 6378137.0)):
            # the reference's native mercator is the spherical Web
            # Mercator (crs.py:354-368): the bare, +ellps=sphere and
            # +a=+b=6378137 all-default shapes keep mapping to it
            return WEB_MERCATOR
        # anything else is the TRUE (ellipsoidal) Mercator, EPSG
        # 9804/9805 — the EPSG:3395 family (reference reaches these via
        # proj.4 projstrings, crs.py:248-306)
        params = base + (() if bare else ell_tail())
        if params == WORLD_MERCATOR.params:
            return WORLD_MERCATOR
        return CrsDef(f"merc_{base[0]:g}_{base[1]:g}", "merc", params)
    if proj == "utm":
        tail = ell_tail()
        if not tail:
            return utm(int(toks["zone"]), "south" in flags)
        # non-WGS84 UTM (e.g. NAD27 zones on Clarke 1866): a tmerc def —
        # NOT utm-named, so to_proj4's utm fast path stays WGS84-only
        zone = int(toks["zone"])
        south = "south" in flags
        return CrsDef(
            f"tmerc_{6.0 * zone - 183.0}_{toks.get('ellps', tail[0])}",
            "tmerc", (6.0 * zone - 183.0, 0.9996, 500000.0,
                      10000000.0 if south else 0.0) + tail)
    if proj == "tmerc":
        fn = g("y_0")
        lat0 = g("lat_0")
        if lat0 != 0.0:
            # proj semantics: northing is measured from lat_0 — fold the
            # meridian arc at lat_0 into the false northing (y_0 - k0*X)
            af = ell()
            _, y0 = _tm_fwd(_NpOps, np.float64(g("lon_0")),
                            np.float64(lat0), g("lon_0"), k0, 0.0, 0.0,
                            af[0], af[1])
            fn = fn - float(y0)
        return tmerc(g("lon_0"), k0, g("x_0"), fn,
                     ellps=ell())
    if proj == "lcc":
        lat1 = g("lat_1", g("lat_0"))
        lat2 = float(toks["lat_2"]) if "lat_2" in toks else lat1
        return lcc(lat1, lat2, g("lat_0"), g("lon_0"), k0,
                   g("x_0"), g("y_0"), ellps=ell())
    if proj == "stere":
        lat0 = g("lat_0", 90.0)
        if abs(lat0) != 90.0:
            # oblique/equatorial aspect (PROJ OBLIQ/EQUIT arms); lat_ts
            # is a polar-only parameter in PROJ and is ignored here too
            params = (lat0, g("lon_0"), k0,
                      g("x_0"), g("y_0")) + ell_tail()
            return CrsDef(f"stereobl_{lat0:g}_{params[1]:g}",
                          "stere_obl", params)
        sgn = 1.0 if lat0 >= 0 else -1.0
        params = (sgn, g("lon_0"), abs(g("lat_ts", lat0)), k0,
                  g("x_0"), g("y_0")) + ell_tail()
        for named in (UPS_NORTH, UPS_SOUTH, NSIDC_NORTH, NSIDC_SOUTH):
            if named.params == params:
                return named
        return CrsDef(f"stere_{params[1]}_{params[2]}_{params[3]}",
                      "stere", params)
    if proj == "laea":
        lat0 = g("lat_0")
        lon0 = g("lon_0")
        tail = ell_tail()
        if abs(lat0) == 90.0:
            sgn = 1.0 if lat0 > 0 else -1.0
            params = (sgn, lon0, g("x_0"), g("y_0")) + tail
            for named in (EASE2_NORTH, EASE2_SOUTH):
                if named.params == params:
                    return named
            return CrsDef(f"laea_polar_{lat0:g}_{lon0:g}", "laea_polar",
                          params)
        if lat0 != 0.0:
            params = (lat0, lon0, g("x_0"), g("y_0")) + tail
            if params == ETRS89_LAEA.params:
                return ETRS89_LAEA
            return CrsDef(f"laea_obl_{lat0:g}_{lon0:g}", "laea_oblique",
                          params)
        fe, fn = g("x_0"), g("y_0")
        if fe or fn:
            # fe/fn ride a full 5-tuple so the params length stays
            # unambiguous (1 = legacy, 3 = +ellipsoid, 5 = +offsets)
            a_, f_ = ell()
            return CrsDef(f"laea_{lon0}_{fe:g}_{fn:g}", "laea",
                          (lon0, a_, f_, fe, fn))
        if not tail and lon0 == 0.0:
            return LAEA_WGS84
        return CrsDef(f"laea_{lon0}", "laea", (lon0,) + tail)
    if proj == "cea":
        lat_ts = g("lat_ts")
        tail = ell_tail()
        lon0, fe, fn = g("lon_0"), g("x_0"), g("y_0")
        if lon0 or fe or fn:
            a_, f_ = ell()
            return CrsDef(f"cea_{lat_ts}_{lon0:g}", "cea",
                          (lat_ts, a_, f_, lon0, fe, fn))
        if not tail and lat_ts == 45.0:
            return GALL_PETERS
        return CrsDef(f"cea_{lat_ts}", "cea", (lat_ts,) + tail)
    if proj == "aea":
        return albers(g("lat_1"), g("lat_2"), g("lat_0"), g("lon_0"),
                      g("x_0"), g("y_0"), ellps=ell())
    if proj == "aeqd":
        params = (g("lat_0"), g("lon_0"), g("x_0"), g("y_0")) + ell_tail()
        if "guam" in flags:
            a_, f_ = ell()
            return CrsDef(f"aeqd_guam_{params[0]:g}_{params[1]:g}",
                          "aeqd_guam", params[:4] + (a_, f_))
        return CrsDef(f"aeqd_{params[0]:g}_{params[1]:g}", "aeqd", params)
    if proj == "eqdc":
        lat1 = g("lat_1", g("lat_0"))
        lat2 = float(toks["lat_2"]) if "lat_2" in toks else lat1
        params = (lat1, lat2, g("lat_0"), g("lon_0"),
                  g("x_0"), g("y_0")) + ell_tail()
        return CrsDef(f"eqdc_{lat1:g}_{lat2:g}", "eqdc", params)
    if proj == "eqc":
        params = (g("lat_ts"), g("lon_0"), g("x_0"), g("y_0")) + ell_tail()
        if params == PLATE_CARREE.params:
            return PLATE_CARREE
        return CrsDef(f"eqc_{params[0]:g}_{params[1]:g}", "eqc", params)
    if proj == "sinu":
        params = (g("lon_0"), g("x_0"), g("y_0")) + ell_tail()
        if params == MODIS_SINU.params:
            return MODIS_SINU
        return CrsDef(f"sinu_{params[0]:g}", "sinu", params)
    if proj == "moll":
        params = (g("lon_0"), g("x_0"), g("y_0")) + ell_tail()
        return CrsDef(f"moll_{params[0]:g}", "moll", params)
    if proj == "somerc":
        a_, f_ = ell()
        params = (g("lat_0"), g("lon_0"), k0, g("x_0"), g("y_0"), a_, f_)
        for named in (CH1903_LV03, CH1903_LV95):
            if named.params == params:
                return named
        return CrsDef(f"somerc_{params[0]:g}_{params[1]:g}", "somerc",
                      params)
    if proj == "sterea":
        a_, f_ = ell()
        params = (g("lat_0"), g("lon_0"), k0, g("x_0"), g("y_0"), a_, f_)
        if params == RD_NEW.params:
            return RD_NEW
        return CrsDef(f"sterea_{params[0]:g}_{params[1]:g}", "sterea",
                      params)
    if proj == "krovak":
        # proj.4 defaults ARE the S-JTSK definition; ellipsoid defaults
        # to bessel for this projection (proj.4 convention).  +czech
        # flips both axes to the traditional positive southing/westing
        # sheet convention (proj krovak.c).
        a_, f_ = (ellipsoid_params("bessel")
                  if not ({"R", "a", "ellps", "datum"} & set(toks))
                  else ell())
        params = (g("lat_0", 49.5), g("lon_0", 24.833333333333332),
                  g("alpha", 30.288139750000002), g("lat_1", 78.5),
                  k0 if ("k" in toks or "k_0" in toks) else 0.9999,
                  g("x_0"), g("y_0"), a_, f_)
        if "czech" in flags:
            return CrsDef(f"krovak_czech_{params[0]:g}_{params[1]:g}",
                          "krovak", params + (1.0,))
        if params == S_JTSK.params:
            return S_JTSK
        return CrsDef(f"krovak_{params[0]:g}_{params[1]:g}", "krovak",
                      params)
    if proj == "omerc":
        if "lat_1" in toks or "lat_2" in toks:
            # two-point form: convert to the equivalent azimuth form
            # (lonc, alpha) — exactly what proj omerc.c computes
            # internally — and reuse the azimuth kernel unchanged
            a_, f_ = ell()
            lonc, alpha = _omerc_two_point_to_azimuth(
                g("lat_0"), g("lat_1"), g("lon_1"), g("lat_2"),
                g("lon_2"), a_, f_)
            off = 0.0 if "no_off" in flags else 1.0
            params = (g("lat_0"), lonc, alpha, alpha, k0,
                      g("x_0"), g("y_0"), off) + ell_tail()
            return CrsDef(
                f"omerc2p_{params[0]:g}_{lonc:g}_{alpha:g}", "omerc",
                params)
        lonc = g("lonc", g("lon_0"))
        alpha = g("alpha", 90.0)
        gamma = g("gamma", alpha)
        off = 0.0 if "no_off" in flags else 1.0  # proj default: variant B
        params = (g("lat_0"), lonc, alpha, gamma, k0, g("x_0"), g("y_0"),
                  off) + ell_tail()
        return CrsDef(f"omerc_{params[0]:g}_{params[1]:g}_{alpha:g}",
                      "omerc", params)
    raise ValueError(f"unsupported proj.4 projection {proj!r}")


def _ellps_name(a: float, f: float) -> str | None:
    """proj.4 ellipsoid id whose (a, f) matches exactly, else None."""
    for name in _ELLIPSOID_DATA:
        if ellipsoid_params(name) == (a, f):
            return name
    return None


def _proj4_ellps_frag(params: tuple, base_len: int) -> str:
    """+ellps/+a fragment for a params tuple that may carry an (a, f)
    tail past base_len; WGS84 (no tail) emits the historical +ellps=WGS84
    +datum=WGS84 pair."""
    if len(params) <= base_len:
        return "+ellps=WGS84 +datum=WGS84"
    a, f = params[base_len], params[base_len + 1]
    name = _ellps_name(a, f)
    if name is not None:
        return f"+ellps={name}"
    return f"+a={a:.10g} +rf={1.0 / f:.12g}" if f else f"+a={a:.10g} +b={a:.10g}"


def to_proj4(crs: CrsDef | str) -> str:
    """proj.4 string for a CrsDef (the reference's get_proj4 analogue) —
    round-trips through from_proj4."""
    c = lookup(crs)
    if c.kind == "lonlat":
        datum = "NAD83" if c.name == "lonlat_nad83" else "WGS84"
        return f"+proj=longlat +datum={datum} +no_defs"
    if c.kind == "lonlat_datum":
        return "+proj=longlat +datum=NAD27 +no_defs"
    if c.kind == "webmercator":
        return ("+proj=merc +a=6378137 +b=6378137 +lat_ts=0.0 +lon_0=0.0 "
                "+x_0=0.0 +y_0=0 +k=1.0 +units=m +nadgrids=@null +no_defs")
    if c.kind == "merc":
        lat_ts, lon0, k0, fe, fn = c.params[:5]
        frag = ("+ellps=WGS84 +datum=WGS84" if len(c.params) == 5
                else _proj4_ellps_frag(c.params, 5))
        sc = f"+lat_ts={lat_ts!r}" if lat_ts else f"+k={k0!r}"
        return (f"+proj=merc {sc} +lon_0={lon0!r} +x_0={fe!r} +y_0={fn!r} "
                f"{frag} +units=m +no_defs")
    if c.kind == "tmerc":
        lon0, k0, fe, fn = c.params[:4]
        if c.name.startswith("utm"):
            zone = int(round((lon0 + 183.0) / 6.0))
            south = " +south" if fn else ""
            return (f"+proj=utm +zone={zone}{south} +ellps=WGS84 "
                    "+datum=WGS84 +units=m +no_defs")
        frag = _proj4_ellps_frag(c.params, 4)
        return (f"+proj=tmerc +lon_0={lon0} +k={k0} +x_0={fe} +y_0={fn} "
                f"{frag} +units=m +no_defs")
    if c.kind == "lcc":
        lat1, lat2, lat0, lon0, k0, fe, fn, a, f = c.params
        frag = _proj4_ellps_frag(c.params, 7)
        # repr, not %g: State-Plane definitions carry full-precision
        # parallels / survey-foot false eastings / k_0 = 1 - 1/x scale
        # factors that 6-significant-digit %g silently truncates
        sp = (f"+lat_1={lat1!r}" if lat1 == lat2
              else f"+lat_1={lat1!r} +lat_2={lat2!r}")
        kf = "" if k0 == 1.0 else f" +k_0={k0!r}"
        return (f"+proj=lcc {sp} +lat_0={lat0!r} +lon_0={lon0!r}{kf} "
                f"+x_0={fe!r} +y_0={fn!r} {frag} +units=m +no_defs")
    if c.kind == "stere":
        sgn, lon0, lat_ts, k0, fe, fn = c.params[:6]
        frag = ("+datum=WGS84" if len(c.params) == 6
                else _proj4_ellps_frag(c.params, 6))
        return (f"+proj=stere +lat_0={int(sgn * 90)} "
                f"+lat_ts={sgn * lat_ts:g} +lon_0={lon0:g} +k={k0:g} "
                f"+x_0={fe:g} +y_0={fn:g} +units=m {frag} +no_defs")
    if c.kind == "laea":
        fe, fn = (c.params[3], c.params[4]) if len(c.params) == 5 \
            else (0.0, 0.0)
        frag = ("+ellps=WGS84 +datum=WGS84" if len(c.params) == 1
                else _proj4_ellps_frag(c.params, 1))
        return (f"+proj=laea +lat_0=0 +lon_0={c.params[0]:g} "
                f"+x_0={fe:g} +y_0={fn:g} {frag}")
    if c.kind == "laea_polar":
        sgn, lon0, fe, fn = c.params[:4]
        frag = ("+ellps=WGS84 +datum=WGS84" if len(c.params) == 4
                else _proj4_ellps_frag(c.params, 4))
        return (f"+proj=laea +lat_0={int(sgn * 90)} +lon_0={lon0:g} "
                f"+x_0={fe:g} +y_0={fn:g} {frag} +units=m +no_defs")
    if c.kind == "laea_oblique":
        lat0, lon0, fe, fn = c.params[:4]
        frag = ("+ellps=WGS84 +datum=WGS84" if len(c.params) == 4
                else _proj4_ellps_frag(c.params, 4))
        return (f"+proj=laea +lat_0={lat0!r} +lon_0={lon0!r} "
                f"+x_0={fe!r} +y_0={fn!r} {frag} +units=m +no_defs")
    if c.kind == "cea":
        lon0, fe, fn = (c.params[3], c.params[4], c.params[5]) \
            if len(c.params) == 6 else (0.0, 0.0, 0.0)
        frag = ("+ellps=WGS84 +datum=WGS84" if len(c.params) == 1
                else _proj4_ellps_frag(c.params, 1))
        return (f"+proj=cea +lon_0={lon0:g} +lat_ts={c.params[0]:g} "
                f"+x_0={fe:g} +y_0={fn:g} {frag} +units=m +no_defs")
    if c.kind == "aea":
        lat1, lat2, lat0, lon0, fe, fn = c.params[:6]
        frag = ("+ellps=WGS84 +datum=WGS84" if len(c.params) == 6
                else _proj4_ellps_frag(c.params, 6))
        return (f"+proj=aea +lat_1={lat1!r} +lat_2={lat2!r} +lat_0={lat0!r} "
                f"+lon_0={lon0!r} +x_0={fe!r} +y_0={fn!r} "
                f"{frag} +units=m +no_defs")
    if c.kind == "eqc":
        lat_ts, lon0, fe, fn = c.params[:4]
        frag = ("+ellps=WGS84 +datum=WGS84" if len(c.params) == 4
                else _proj4_ellps_frag(c.params, 4))
        return (f"+proj=eqc +lat_ts={lat_ts:g} +lon_0={lon0:g} "
                f"+x_0={fe:g} +y_0={fn:g} {frag} +units=m +no_defs")
    if c.kind == "aeqd":
        lat0, lon0, fe, fn = c.params[:4]
        frag = ("+ellps=WGS84 +datum=WGS84" if len(c.params) == 4
                else _proj4_ellps_frag(c.params, 4))
        return (f"+proj=aeqd +lat_0={lat0!r} +lon_0={lon0!r} "
                f"+x_0={fe!r} +y_0={fn!r} {frag} +units=m +no_defs")
    if c.kind == "sinu":
        lon0, fe, fn = c.params[:3]
        frag = ("+ellps=WGS84 +datum=WGS84" if len(c.params) == 3
                else _proj4_ellps_frag(c.params, 3))
        return (f"+proj=sinu +lon_0={lon0:g} +x_0={fe:g} +y_0={fn:g} "
                f"{frag} +units=m +no_defs")
    if c.kind == "moll":
        lon0, fe, fn = c.params[:3]
        frag = ("+ellps=WGS84 +datum=WGS84" if len(c.params) == 3
                else _proj4_ellps_frag(c.params, 3))
        return (f"+proj=moll +lon_0={lon0:g} +x_0={fe:g} +y_0={fn:g} "
                f"{frag} +units=m +no_defs")
    if c.kind == "somerc":
        lat0, lon0, k0, fe, fn = c.params[:5]
        frag = _proj4_ellps_frag(c.params, 5)
        return (f"+proj=somerc +lat_0={lat0!r} +lon_0={lon0!r} "
                f"+k_0={k0!r} +x_0={fe!r} +y_0={fn!r} {frag} "
                "+units=m +no_defs")
    if c.kind == "omerc":
        lat0, lonc, alpha, gamma, k0, fe, fn, off = c.params[:8]
        frag = ("+ellps=WGS84 +datum=WGS84" if len(c.params) == 8
                else _proj4_ellps_frag(c.params, 8))
        noff = "" if off else " +no_off"
        return (f"+proj=omerc +lat_0={lat0!r} +lonc={lonc!r} "
                f"+alpha={alpha!r} +gamma={gamma!r} +k_0={k0!r} "
                f"+x_0={fe!r} +y_0={fn!r}{noff} {frag} +units=m +no_defs")
    if c.kind == "sterea":
        lat0, lon0, k0, fe, fn = c.params[:5]
        frag = _proj4_ellps_frag(c.params, 5)
        return (f"+proj=sterea +lat_0={lat0!r} +lon_0={lon0!r} "
                f"+k_0={k0!r} +x_0={fe!r} +y_0={fn!r} {frag} "
                "+units=m +no_defs")
    if c.kind == "stere_obl":
        lat0, lon0, k0, fe, fn = c.params[:5]
        frag = _proj4_ellps_frag(c.params, 5)
        return (f"+proj=stere +lat_0={lat0!r} +lon_0={lon0!r} "
                f"+k_0={k0!r} +x_0={fe!r} +y_0={fn!r} {frag} "
                "+units=m +no_defs")
    if c.kind == "eqdc":
        lat1, lat2, lat0, lon0, fe, fn = c.params[:6]
        frag = _proj4_ellps_frag(c.params, 6)
        return (f"+proj=eqdc +lat_1={lat1!r} +lat_2={lat2!r} "
                f"+lat_0={lat0!r} +lon_0={lon0!r} "
                f"+x_0={fe!r} +y_0={fn!r} {frag} +units=m +no_defs")
    if c.kind == "krovak":
        lat_c, lon0, alpha, lat_p, k0, fe, fn = c.params[:7]
        frag = _proj4_ellps_frag(c.params[:9], 7)
        czech = " +czech" if len(c.params) > 9 and c.params[9] > 0 else ""
        return (f"+proj=krovak +lat_0={lat_c!r} +lon_0={lon0!r} "
                f"+alpha={alpha!r} +lat_1={lat_p!r} +k_0={k0!r} "
                f"+x_0={fe!r} +y_0={fn!r}{czech} {frag} +units=m +no_defs")
    if c.kind == "aeqd_guam":
        lat0, lon0, fe, fn = c.params[:4]
        frag = _proj4_ellps_frag(c.params, 4)
        return (f"+proj=aeqd +guam +lat_0={lat0!r} +lon_0={lon0!r} "
                f"+x_0={fe!r} +y_0={fn!r} {frag} +units=m +no_defs")
    raise ValueError(f"no proj.4 form for kind {c.kind!r}")


# ---------------------------------------------------------------------------
# WKT1 (OGC 01-009, the GDAL ExportToWkt dialect) — the reference's
# CRS.get_wkt/ref_wkt interchange surface (crs.py:143-158) goes through
# osgeo.osr; here the named CrsDef registry emits and parses WKT1 directly.
# ---------------------------------------------------------------------------

def _wkt_num(v: float) -> str:
    v = float(v)
    return str(int(v)) if v == int(v) and abs(v) < 1e15 else repr(v)


_WKT_GEOGCS = {
    "wgs84": ('GEOGCS["WGS 84",DATUM["WGS_1984",'
              'SPHEROID["WGS 84",6378137,298.257223563]],'
              'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'),
    "sphere": ('GEOGCS["Normalized Sphere (r=6378137)",DATUM["unknown",'
               'SPHEROID["sphere",6378137,0]],'
               'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'),
    "nad27": ('GEOGCS["NAD27",DATUM["North_American_Datum_1927",'
              'SPHEROID["Clarke 1866",6378206.4,294.978698213898]],'
              'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'),
    "nad83": ('GEOGCS["NAD83",DATUM["North_American_Datum_1983",'
              'SPHEROID["GRS 1980",6378137,298.257222101]],'
              'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'),
}


def _wkt_geogcs_for(params: tuple, base_len: int) -> str:
    """GEOGCS string for the (a, f) tail of a params tuple (WGS84 when
    absent).  Clarke 1866 maps to the NAD27 GEOGCS (the datum every
    State-Plane-era clrk66 CRS actually rides); other ellipsoids get an
    unknown-datum GEOGCS carrying the exact SPHEROID."""
    if len(params) <= base_len:
        return _WKT_GEOGCS["wgs84"]
    a, f = params[base_len], params[base_len + 1]
    if (a, f) == ellipsoid_params("clrk66"):
        return _WKT_GEOGCS["nad27"]
    name = _ellps_name(a, f)
    disp = _ELLIPSOID_DATA[name][3] if name else "unnamed"
    inv_f = 1.0 / f if f else 0.0
    return (f'GEOGCS["unknown",DATUM["unknown",'
            f'SPHEROID["{disp}",{_wkt_num(a)},{_wkt_num(inv_f)}]],'
            'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]')


def _wkt_projcs(name: str, geogcs: str, projection: str,
                params: list[tuple[str, float]]) -> str:
    body = ",".join(f'PARAMETER["{k}",{_wkt_num(v)}]' for k, v in params)
    return (f'PROJCS["{name}",{geogcs},PROJECTION["{projection}"],{body},'
            'UNIT["metre",1]]')


def to_wkt(crs: CrsDef | str) -> str:
    """WKT1 string for a CrsDef — mirrors the reference's ``get_wkt``
    surface (crs.py:143-158, which exports via osgeo.osr); round-trips
    through :func:`from_wkt`."""
    c = lookup(crs)
    if c.kind == "lonlat":
        return _WKT_GEOGCS["nad83" if c.name == "lonlat_nad83" else "wgs84"]
    if c.kind == "lonlat_datum":
        return _WKT_GEOGCS["nad27"]
    if c.kind == "webmercator":
        return _wkt_projcs(
            "WGS 84 / Pseudo-Mercator", _WKT_GEOGCS["sphere"], "Mercator_1SP",
            [("central_meridian", 0), ("scale_factor", 1),
             ("false_easting", 0), ("false_northing", 0)])
    if c.kind == "merc":
        lat_ts, lon0, k0, fe, fn = c.params[:5]
        title = ("WGS 84 / World Mercator" if c.name == "world_mercator"
                 else c.name)
        if lat_ts:
            return _wkt_projcs(
                title, _wkt_geogcs_for(c.params, 5), "Mercator_2SP",
                [("standard_parallel_1", lat_ts), ("central_meridian", lon0),
                 ("false_easting", fe), ("false_northing", fn)])
        return _wkt_projcs(
            title, _wkt_geogcs_for(c.params, 5), "Mercator_1SP",
            [("central_meridian", lon0), ("scale_factor", k0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "tmerc":
        lon0, k0, fe, fn = c.params[:4]
        if c.name.startswith("utm"):
            zone = int(round((lon0 + 183.0) / 6.0))
            hemi = "S" if fn else "N"
            title = f"WGS 84 / UTM zone {zone}{hemi}"
        else:
            title = c.name
        return _wkt_projcs(
            title, _wkt_geogcs_for(c.params, 4), "Transverse_Mercator",
            [("latitude_of_origin", 0), ("central_meridian", lon0),
             ("scale_factor", k0), ("false_easting", fe),
             ("false_northing", fn)])
    if c.kind == "lcc":
        lat1, lat2, lat0, lon0, k0, fe, fn, a, f = c.params
        if lat1 == lat2:
            return _wkt_projcs(
                c.name, _wkt_geogcs_for(c.params, 7),
                "Lambert_Conformal_Conic_1SP",
                [("latitude_of_origin", lat0), ("central_meridian", lon0),
                 ("scale_factor", k0), ("false_easting", fe),
                 ("false_northing", fn),
                 ("standard_parallel_1", lat1)])
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 7),
            "Lambert_Conformal_Conic_2SP",
            [("standard_parallel_1", lat1), ("standard_parallel_2", lat2),
             ("latitude_of_origin", lat0), ("central_meridian", lon0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "stere":
        sgn, lon0, lat_ts, k0, fe, fn = c.params[:6]
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 6), "Polar_Stereographic",
            [("latitude_of_origin", sgn * lat_ts),
             ("central_meridian", lon0), ("scale_factor", k0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "laea":
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 1),
            "Lambert_Azimuthal_Equal_Area",
            [("latitude_of_center", 0), ("longitude_of_center", c.params[0]),
             ("false_easting", 0), ("false_northing", 0)])
    if c.kind == "laea_polar":
        sgn, lon0, fe, fn = c.params[:4]
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 4),
            "Lambert_Azimuthal_Equal_Area",
            [("latitude_of_center", sgn * 90), ("longitude_of_center", lon0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "laea_oblique":
        lat0, lon0, fe, fn = c.params[:4]
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 4),
            "Lambert_Azimuthal_Equal_Area",
            [("latitude_of_center", lat0), ("longitude_of_center", lon0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "cea":
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 1), "Cylindrical_Equal_Area",
            [("standard_parallel_1", c.params[0]), ("central_meridian", 0),
             ("false_easting", 0), ("false_northing", 0)])
    if c.kind == "aea":
        lat1, lat2, lat0, lon0, fe, fn = c.params[:6]
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 6), "Albers_Conic_Equal_Area",
            [("standard_parallel_1", lat1), ("standard_parallel_2", lat2),
             ("latitude_of_center", lat0), ("longitude_of_center", lon0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "eqc":
        lat_ts, lon0, fe, fn = c.params[:4]
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 4), "Equirectangular",
            [("standard_parallel_1", lat_ts), ("central_meridian", lon0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "aeqd":
        lat0, lon0, fe, fn = c.params[:4]
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 4), "Azimuthal_Equidistant",
            [("latitude_of_center", lat0), ("longitude_of_center", lon0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "sinu":
        lon0, fe, fn = c.params[:3]
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 3), "Sinusoidal",
            [("longitude_of_center", lon0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "moll":
        lon0, fe, fn = c.params[:3]
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 3), "Mollweide",
            [("central_meridian", lon0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "somerc":
        lat0, lon0, k0, fe, fn = c.params[:5]
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 5),
            "Swiss_Oblique_Cylindrical",
            [("latitude_of_center", lat0), ("longitude_of_center", lon0),
             ("scale_factor", k0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "omerc":
        lat0, lonc, alpha, gamma, k0, fe, fn, off = c.params[:8]
        method = ("Hotine_Oblique_Mercator_Azimuth_Center" if off
                  else "Hotine_Oblique_Mercator")
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 8), method,
            [("latitude_of_center", lat0), ("longitude_of_center", lonc),
             ("azimuth", alpha), ("rectified_grid_angle", gamma),
             ("scale_factor", k0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "sterea":
        lat0, lon0, k0, fe, fn = c.params[:5]
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 5), "Oblique_Stereographic",
            [("latitude_of_origin", lat0), ("central_meridian", lon0),
             ("scale_factor", k0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "stere_obl":
        lat0, lon0, k0, fe, fn = c.params[:5]
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 5), "Stereographic",
            [("latitude_of_origin", lat0), ("central_meridian", lon0),
             ("scale_factor", k0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "eqdc":
        lat1, lat2, lat0, lon0, fe, fn = c.params[:6]
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 6), "Equidistant_Conic",
            [("standard_parallel_1", lat1), ("standard_parallel_2", lat2),
             ("latitude_of_center", lat0), ("longitude_of_center", lon0),
             ("false_easting", fe), ("false_northing", fn)])
    if c.kind == "krovak":
        lat_c, lon0, alpha, lat_p, k0, fe, fn = c.params[:7]
        return _wkt_projcs(
            c.name, _wkt_geogcs_for(c.params, 7), "Krovak",
            [("latitude_of_center", lat_c), ("longitude_of_center", lon0),
             ("azimuth", alpha), ("pseudo_standard_parallel_1", lat_p),
             ("scale_factor", k0),
             ("false_easting", fe), ("false_northing", fn)])
    raise ValueError(f"no WKT form for kind {c.kind!r}")


def _wkt_parse(s: str, pos: int = 0):
    """Recursive WKT1 node parser: NAME["quoted", 1.5, CHILD[...]] ->
    (name, [items]); items are str (quoted), float, or nested tuples."""
    n = len(s)
    while pos < n and s[pos].isspace():
        pos += 1
    start = pos
    while pos < n and (s[pos].isalnum() or s[pos] in "_"):
        pos += 1
    name = s[start:pos]
    while pos < n and s[pos].isspace():
        pos += 1
    if pos >= n or s[pos] != "[":
        raise ValueError(f"WKT parse error at {pos}: expected '['")
    pos += 1
    items = []
    while True:
        while pos < n and s[pos].isspace():
            pos += 1
        if pos >= n:
            raise ValueError("unterminated WKT node")
        ch = s[pos]
        if ch == "]":
            return (name, items), pos + 1
        if ch == ",":
            pos += 1
            continue
        if ch == '"':
            end = s.index('"', pos + 1)
            items.append(s[pos + 1:end])
            pos = end + 1
        elif ch.isalpha():
            # identifier: a nested NODE[...] or a bare keyword (e.g. the
            # EAST/NORTH axis directions in GDAL output)
            probe = pos
            while probe < n and (s[probe].isalnum() or s[probe] == "_"):
                probe += 1
            after = probe
            while after < n and s[after].isspace():
                after += 1
            if after < n and s[after] == "[":
                node, pos = _wkt_parse(s, pos)
                items.append(node)
            else:
                items.append(s[pos:probe])
                pos = probe
        else:
            start = pos
            while pos < n and s[pos] not in ",]":
                pos += 1
            items.append(float(s[start:pos].strip()))


def _wkt_children(node, name):
    return [it for it in node[1]
            if isinstance(it, tuple) and it[0].upper() == name]


def _wkt_ellipsoid(root) -> tuple[float, float]:
    """(a, f) from the PROJCS's GEOGCS SPHEROID, snapped to the registry
    entry when it matches (so 1/(1/f) ulp drift can't break CrsDef params
    equality with constructor-built definitions); WGS84 if absent."""
    geogs = _wkt_children(root, "GEOGCS")
    if not geogs:
        return A_WGS84, F_WGS84
    datums = _wkt_children(geogs[0], "DATUM")
    sph = _wkt_children(datums[0], "SPHEROID") if datums else []
    if not sph:
        return A_WGS84, F_WGS84
    a = float(sph[0][1][1])
    inv_f = float(sph[0][1][2])
    f = 0.0 if inv_f == 0.0 else 1.0 / inv_f
    for name in _ELLIPSOID_DATA:
        ra, rf_ = ellipsoid_params(name)
        if ra == a and (rf_ == f or (f and abs(rf_ / f - 1.0) < 1e-12)):
            return ra, rf_
    return a, f


def from_wkt(s: str) -> CrsDef:
    """Construct a CrsDef from a WKT1 string (GEOGCS or PROJCS) —
    inverse of :func:`to_wkt`; unsupported projections/datums raise."""
    root, _ = _wkt_parse(s)
    kind = root[0].upper()
    if kind == "GEOGCS":
        datums = _wkt_children(root, "DATUM")
        dname = str(datums[0][1][0]) if datums else ""
        if "1927" in dname:
            return LONLAT_NAD27
        if "1983" in dname:
            return LONLAT_NAD83
        return LONLAT
    if kind != "PROJCS":
        raise ValueError(f"unsupported WKT root {root[0]!r}")
    proj_nodes = _wkt_children(root, "PROJECTION")
    if not proj_nodes:
        raise ValueError("PROJCS without PROJECTION")
    proj = str(proj_nodes[0][1][0])
    p = {str(it[1][0]).lower(): float(it[1][1])
         for it in _wkt_children(root, "PARAMETER")}

    def g(key, default=0.0):
        return p.get(key, default)

    k0 = g("scale_factor", 1.0)
    if proj == "Mercator_1SP":
        geogs = _wkt_children(root, "GEOGCS")
        sph = _wkt_children(geogs[0], "DATUM") and \
            _wkt_children(_wkt_children(geogs[0], "DATUM")[0], "SPHEROID")
        inv_f = float(sph[0][1][2]) if sph else 0.0
        zero_params = (g("central_meridian") == 0.0 and k0 == 1.0
                       and g("false_easting") == 0.0
                       and g("false_northing") == 0.0)
        # The canonical GDAL/EPSG:3857 WKT writes Mercator_1SP over an
        # ELLIPSOIDAL WGS84 GEOGCS (inv_f=298.257...) with all-zero
        # parameters — the sphere-math semantics live in the PROJ4
        # EXTENSION/authority code, not the SPHEROID.  Accept that shape
        # (by PROJCS name or by the all-zero-params-over-WGS84 pattern)
        # as Web Mercator; keep raising for genuinely ellipsoidal
        # Mercator (nonzero params or a non-WGS84 ellipsoid).
        name = str(root[1][0]) if root[1] and isinstance(root[1][0], str) \
            else ""
        pseudo_name = ("pseudo-mercator" in name.lower()
                       or "web mercator" in name.lower())
        # NB: EPSG:3395 (true ellipsoidal Mercator) has the SAME
        # all-zero-params-over-WGS84 shape — only the name tells them
        # apart, so the ellipsoidal GEOGCS maps to Web Mercator only
        # with the Pseudo-Mercator name.
        if zero_params and (inv_f == 0.0 or pseudo_name):
            return WEB_MERCATOR
        af = _wkt_ellipsoid(root)
        params = (0.0, g("central_meridian"), k0,
                  g("false_easting"), g("false_northing")) \
            + (() if af == (A_WGS84, F_WGS84) else af)
        if params == WORLD_MERCATOR.params:
            return WORLD_MERCATOR
        return CrsDef(f"merc_0_{params[1]:g}", "merc", params)
    if proj in ("Mercator_2SP", "Mercator"):
        af = _wkt_ellipsoid(root)
        params = (g("standard_parallel_1"), g("central_meridian"), 1.0,
                  g("false_easting"), g("false_northing")) \
            + (() if af == (A_WGS84, F_WGS84) else af)
        return CrsDef(f"merc_{params[0]:g}_{params[1]:g}", "merc", params)
    if proj == "Transverse_Mercator":
        lon0, fe, fn = g("central_meridian"), g("false_easting"), \
            g("false_northing")
        af = _wkt_ellipsoid(root)
        lat0 = g("latitude_of_origin")
        if lat0 != 0.0:
            # fold the meridian arc at lat_0 into the false northing
            # (same semantics as the proj.4 parser arm)
            _, y0 = _tm_fwd(_NpOps, np.float64(lon0), np.float64(lat0),
                            lon0, k0, 0.0, 0.0, af[0], af[1])
            fn = fn - float(y0)
        if (af == (A_WGS84, F_WGS84) and k0 == 0.9996 and fe == 500000.0
                and fn in (0.0, 10000000.0)
                and (lon0 + 183.0) % 6.0 == 0.0):
            return utm(int(round((lon0 + 183.0) / 6.0)), fn != 0.0)
        return tmerc(lon0, k0, fe, fn, ellps=af)
    if proj == "Lambert_Conformal_Conic_2SP":
        return lcc(g("standard_parallel_1"), g("standard_parallel_2"),
                   g("latitude_of_origin"), g("central_meridian"), 1.0,
                   g("false_easting"), g("false_northing"),
                   ellps=_wkt_ellipsoid(root))
    if proj == "Lambert_Conformal_Conic_1SP":
        lat0 = g("latitude_of_origin")
        return lcc(g("standard_parallel_1", lat0), None, lat0,
                   g("central_meridian"), k0,
                   g("false_easting"), g("false_northing"),
                   ellps=_wkt_ellipsoid(root))
    if proj == "Polar_Stereographic":
        lat0 = g("latitude_of_origin", 90.0)
        sgn = 1.0 if lat0 >= 0 else -1.0
        af = _wkt_ellipsoid(root)
        tail = () if af == (A_WGS84, F_WGS84) else af
        params = (sgn, g("central_meridian"), abs(lat0), k0,
                  g("false_easting"), g("false_northing")) + tail
        for named in (UPS_NORTH, UPS_SOUTH, NSIDC_NORTH, NSIDC_SOUTH):
            if named.params == params:
                return named
        return CrsDef(f"stere_{params[1]}_{params[2]}_{params[3]}",
                      "stere", params)
    if proj == "Lambert_Azimuthal_Equal_Area":
        lat0 = g("latitude_of_center")
        lon0 = g("longitude_of_center")
        af = _wkt_ellipsoid(root)
        tail = () if af == (A_WGS84, F_WGS84) else af
        if abs(lat0) == 90.0:
            sgn = 1.0 if lat0 > 0 else -1.0
            params = (sgn, lon0, g("false_easting"),
                      g("false_northing")) + tail
            for named in (EASE2_NORTH, EASE2_SOUTH):
                if named.params == params:
                    return named
            return CrsDef(f"laea_polar_{lat0:g}_{lon0:g}", "laea_polar",
                          params)
        if lat0 != 0.0:
            params = (lat0, lon0, g("false_easting"),
                      g("false_northing")) + tail
            if params == ETRS89_LAEA.params:
                return ETRS89_LAEA
            return CrsDef(f"laea_obl_{lat0:g}_{lon0:g}", "laea_oblique",
                          params)
        if not tail and lon0 == 0.0:
            return LAEA_WGS84
        return CrsDef(f"laea_{lon0}", "laea", (lon0,) + tail)
    if proj == "Cylindrical_Equal_Area":
        lat_ts = g("standard_parallel_1")
        af = _wkt_ellipsoid(root)
        tail = () if af == (A_WGS84, F_WGS84) else af
        if not tail and lat_ts == 45.0:
            return GALL_PETERS
        return CrsDef(f"cea_{lat_ts}", "cea", (lat_ts,) + tail)
    if proj == "Albers_Conic_Equal_Area":
        return albers(g("standard_parallel_1"), g("standard_parallel_2"),
                      g("latitude_of_center"), g("longitude_of_center"),
                      g("false_easting"), g("false_northing"),
                      ellps=_wkt_ellipsoid(root))
    if proj == "Equirectangular":
        af = _wkt_ellipsoid(root)
        tail = () if af == (A_WGS84, F_WGS84) else af
        params = (g("standard_parallel_1"), g("central_meridian"),
                  g("false_easting"), g("false_northing")) + tail
        if params == PLATE_CARREE.params:
            return PLATE_CARREE
        return CrsDef(f"eqc_{params[0]:g}_{params[1]:g}", "eqc", params)
    if proj == "Azimuthal_Equidistant":
        af = _wkt_ellipsoid(root)
        tail = () if af == (A_WGS84, F_WGS84) else af
        params = (g("latitude_of_center"), g("longitude_of_center"),
                  g("false_easting"), g("false_northing")) + tail
        return CrsDef(f"aeqd_{params[0]:g}_{params[1]:g}", "aeqd", params)
    if proj == "Sinusoidal":
        af = _wkt_ellipsoid(root)
        tail = () if af == (A_WGS84, F_WGS84) else af
        params = (g("longitude_of_center", g("central_meridian")),
                  g("false_easting"), g("false_northing")) + tail
        if params == MODIS_SINU.params:
            return MODIS_SINU
        return CrsDef(f"sinu_{params[0]:g}", "sinu", params)
    if proj == "Mollweide":
        af = _wkt_ellipsoid(root)
        tail = () if af == (A_WGS84, F_WGS84) else af
        params = (g("central_meridian"),
                  g("false_easting"), g("false_northing")) + tail
        return CrsDef(f"moll_{params[0]:g}", "moll", params)
    if proj in ("Swiss_Oblique_Cylindrical", "Hotine_Oblique_Mercator_"
                "Azimuth_Center", "Hotine_Oblique_Mercator"):
        af = _wkt_ellipsoid(root)
        alpha = g("azimuth", 90.0)
        gamma = g("rectified_grid_angle", alpha)
        if proj != "Hotine_Oblique_Mercator" and alpha == 90.0 \
                and gamma == 90.0:
            # azimuth-90 azimuth-center on WKT1 is the shape ESRI emits
            # for the Swiss projection (EPSG 9814 Rosenmund double
            # projection, mm-different from true Hotine at range):
            # keep routing it to the somerc arm, matching the r5
            # behavior pinned by the CH1903 WKT tests
            params = (g("latitude_of_center"), g("longitude_of_center"),
                      g("scale_factor", 1.0),
                      g("false_easting"), g("false_northing")) + af
            for named in (CH1903_LV03, CH1903_LV95):
                if named.params == params:
                    return named
            return CrsDef(f"somerc_{params[0]:g}_{params[1]:g}", "somerc",
                          params)
        tail = () if af == (A_WGS84, F_WGS84) else af
        off = 0.0 if proj == "Hotine_Oblique_Mercator" else 1.0
        params = (g("latitude_of_center"), g("longitude_of_center"),
                  alpha, gamma, g("scale_factor", 1.0),
                  g("false_easting"), g("false_northing"), off) + tail
        return CrsDef(f"omerc_{params[0]:g}_{params[1]:g}_{alpha:g}",
                      "omerc", params)
    if proj == "Stereographic":
        # GDAL/ESRI WKT1 name for plain (PROJ-style) stereographic;
        # polar WKT arrives as Polar_Stereographic (handled above)
        af = _wkt_ellipsoid(root)
        tail = () if af == (A_WGS84, F_WGS84) else af
        params = (g("latitude_of_origin", g("latitude_of_center")),
                  g("central_meridian", g("longitude_of_center")),
                  g("scale_factor", 1.0),
                  g("false_easting"), g("false_northing")) + tail
        return CrsDef(f"stereobl_{params[0]:g}_{params[1]:g}",
                      "stere_obl", params)
    if proj == "Equidistant_Conic":
        af = _wkt_ellipsoid(root)
        tail = () if af == (A_WGS84, F_WGS84) else af
        params = (g("standard_parallel_1"),
                  g("standard_parallel_2", g("standard_parallel_1")),
                  g("latitude_of_center", g("latitude_of_origin")),
                  g("longitude_of_center", g("central_meridian")),
                  g("false_easting"), g("false_northing")) + tail
        return CrsDef(f"eqdc_{params[0]:g}_{params[1]:g}", "eqdc", params)
    if proj in ("Oblique_Stereographic", "Double_Stereographic"):
        af = _wkt_ellipsoid(root)
        params = (g("latitude_of_origin", g("latitude_of_center")),
                  g("central_meridian", g("longitude_of_center")),
                  g("scale_factor", 1.0),
                  g("false_easting"), g("false_northing")) + af
        if params == RD_NEW.params:
            return RD_NEW
        return CrsDef(f"sterea_{params[0]:g}_{params[1]:g}", "sterea",
                      params)
    if proj == "Krovak":
        af = _wkt_ellipsoid(root)
        params = (g("latitude_of_center", 49.5),
                  g("longitude_of_center", 24.833333333333332),
                  g("azimuth", 30.288139750000002),
                  g("pseudo_standard_parallel_1", 78.5),
                  g("scale_factor", 0.9999),
                  g("false_easting"), g("false_northing")) + af
        if params == S_JTSK.params:
            return S_JTSK
        return CrsDef(f"krovak_{params[0]:g}_{params[1]:g}", "krovak",
                      params)
    raise ValueError(f"unsupported WKT projection {proj!r}")


def reproject(df: DataFrame, src: CrsDef | str, dst: CrsDef | str,
              x: str = "x", y: str = "y",
              out_x: str | None = None, out_y: str | None = None) -> DataFrame:
    """Reproject coordinate columns from *src* to *dst* CRS — the
    distributed twin of karta's lazy ``coords(crs)`` / ``vertex(self.crs)``
    reprojection (reference geometry.py:169, crs.py:219-243).

    Pure Catalyst column math: inverse(src) -> lonlat -> forward(dst);
    whole-stage codegen, no Python per row.  In-place unless out columns
    are named."""
    src, dst = lookup(src), lookup(dst)
    out_x = out_x or x
    out_y = out_y or y
    lon, lat = inverse_exprs(src, F.col(x), F.col(y))
    nx, ny = forward_exprs(dst, lon, lat)
    return df.withColumns({out_x: nx, out_y: ny})
