"""Minimal CRS support: WGS84 <-> UTM (Transverse Mercator), NumPy only.

Closes SURVEY.md F11 (declared out of scope in round 1): the reference
reprojects via geopandas/pyproj — `to_crs('EPSG:32633')` for the buffer
metric round-trip (shape.py:240-255) and `to_crs(4326)` for transform
(shape.py:278-290). The formulas here are the public USGS/Snyder
series (Map Projections — A Working Manual, USGS PP 1395, pp. 60-64),
accurate to ~1 mm within a UTM zone and well under a meter several
zones out, which bounds the round-trip error at ~1e-8 degrees.

Conventions: vectorized over NumPy arrays; (lat, lng) degrees <->
(easting, northing) meters with the standard UTM constants
(k0=0.9996, false easting 500 km, false northing 10,000 km south).
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)           # first eccentricity squared
_EP2 = _E2 / (1.0 - _E2)        # second eccentricity squared
_K0 = 0.9996
_FE = 500000.0
_FN_SOUTH = 10000000.0

# meridian-arc series coefficients (Snyder eq. 3-21)
_M0 = 1.0 - _E2 / 4 - 3 * _E2 ** 2 / 64 - 5 * _E2 ** 3 / 256
_M2 = 3 * _E2 / 8 + 3 * _E2 ** 2 / 32 + 45 * _E2 ** 3 / 1024
_M4 = 15 * _E2 ** 2 / 256 + 45 * _E2 ** 3 / 1024
_M6 = 35 * _E2 ** 3 / 3072


def utm_zone(lng) -> int:
    """UTM zone number for a longitude (EPSG:326xx / 327xx numbering)."""
    return int(np.floor((float(lng) + 180.0) / 6.0)) % 60 + 1


def zone_central_meridian(zone: int) -> float:
    return -183.0 + 6.0 * zone


def _meridian_arc(lat_rad):
    return _A * (_M0 * lat_rad - _M2 * np.sin(2 * lat_rad)
                 + _M4 * np.sin(4 * lat_rad) - _M6 * np.sin(6 * lat_rad))


def to_utm(lat, lng, zone: int, south: bool = False):
    """(lat, lng) degrees -> (easting, northing) meters in the zone."""
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lng = np.radians(np.asarray(lng, dtype=np.float64))
    lng0 = np.radians(zone_central_meridian(zone))
    sin, cos, tan = np.sin(lat), np.cos(lat), np.tan(lat)
    n = _A / np.sqrt(1.0 - _E2 * sin ** 2)
    t = tan ** 2
    c = _EP2 * cos ** 2
    a = (lng - lng0) * cos
    m = _meridian_arc(lat)
    east = _FE + _K0 * n * (
        a + (1 - t + c) * a ** 3 / 6
        + (5 - 18 * t + t ** 2 + 72 * c - 58 * _EP2) * a ** 5 / 120)
    north = _K0 * (m + n * tan * (
        a ** 2 / 2 + (5 - t + 9 * c + 4 * c ** 2) * a ** 4 / 24
        + (61 - 58 * t + t ** 2 + 600 * c - 330 * _EP2) * a ** 6 / 720))
    if south:
        north = north + _FN_SOUTH
    return east, north


def from_utm(east, north, zone: int, south: bool = False):
    """(easting, northing) meters -> (lat, lng) degrees."""
    east = np.asarray(east, dtype=np.float64) - _FE
    north = np.asarray(north, dtype=np.float64)
    if south:
        north = north - _FN_SOUTH
    m = north / _K0
    mu = m / (_A * _M0)
    e1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))
    # footpoint latitude (Snyder eq. 3-26)
    fp = (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
          + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
          + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
          + (1097 * e1 ** 4 / 512) * np.sin(8 * mu))
    sin, cos, tan = np.sin(fp), np.cos(fp), np.tan(fp)
    c1 = _EP2 * cos ** 2
    t1 = tan ** 2
    n1 = _A / np.sqrt(1 - _E2 * sin ** 2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin ** 2) ** 1.5
    d = east / (n1 * _K0)
    lat = fp - (n1 * tan / r1) * (
        d ** 2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 ** 2 - 9 * _EP2) * d ** 4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 ** 2 - 252 * _EP2
           - 3 * c1 ** 2) * d ** 6 / 720)
    lng = (d - (1 + 2 * t1 + c1) * d ** 3 / 6
           + (5 - 2 * c1 + 28 * t1 - 3 * c1 ** 2 + 8 * _EP2
              + 24 * t1 ** 2) * d ** 5 / 120) / cos
    return (np.degrees(lat),
            np.degrees(lng) + zone_central_meridian(zone))


def epsg_code(zone: int, south: bool = False) -> str:
    return f"EPSG:{32700 + zone if south else 32600 + zone}"
