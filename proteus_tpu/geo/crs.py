"""Coordinate reference systems and WGS84 <-> UTM transforms.

Replaces the osgeo.osr machinery the reference uses for SRS handling and
coordinate transformation (osr.SpatialReference / CoordinateTransformation
at dswx_hls.py:3385-3461, core.py:93-155). Implements the standard
6th-order Krueger series for the Transverse Mercator projection (Karney
2011 form), accurate to nanometers — far beyond the 30 m pixel grid —
vectorized over NumPy float64 arrays on host.

Supported CRS: EPSG:4326 (WGS84 geographic), WGS84 UTM zones
(EPSG:326xx north / 327xx south) — covering every HLS/MGRS tile and the
lat/lon ancillary inputs (Copernicus DEM, CGLS, WorldCover, GSHHS) — and
the WGS84 polar stereographic grids (EPSG:3031/3032/3413/3976, variant B,
Snyder 1987 eqs. 15-9/21-34..36), the plausible CRS of polar DEM
deliveries. Also accepted for ancillary inputs: NAD83 UTM
(EPSG:26901-26923) / geographic (EPSG:4269), ETRS89 UTM
(EPSG:25828-25838) / geographic (EPSG:4258) — same Transverse Mercator
engine on the GRS80 ellipsoid, with the null NAD83/ETRS89<->WGS84 datum
transformation (what OSR applies without datum grids; true offsets are
~1-2 m, far below the 30 m pixel grid) — and UPS (EPSG:5041/5042, polar
stereographic variant A, verified against the EPSG Guidance Note 7-2
worked example). Round-3 widening: the national equal-area land-product
grids — NAD83 Conus Albers (EPSG:5070, NLCD/LANDFIRE), GDA94 Australian
Albers (EPSG:3577), ETRS89-LAEA Europe (EPSG:3035, EU-DEM/Corine), and
NSIDC EASE-Grid 2.0 (EPSG:6931/6932) — ellipsoidal Albers Conic and
Lambert Azimuthal Equal Area per Snyder 1987 ch. 14/24 and EPSG Guidance
Note 7-2 (verified against its LAEA worked example and Snyder's Albers
numerical example) — plus the Lambert Conformal Conic 2SP national
grids: Canada Atlas Lambert (EPSG:3978, CDEM/HRDEM) and Lambert-93
(EPSG:2154, IGN France), Snyder ch. 15, verified against his numerical
example and conformality/standard-parallel invariants.

Mercator is covered too: EPSG:3857 web mercator (spherical-on-geodetic
'popular visualisation' formulas — the most common CRS of arbitrary
downloaded rasters) and EPSG:3395 World Mercator, verified against the
EPSG GN7-2 worked examples (incl. the Makassar NEIEZ variant-A case on
Bessel 1841).

Beyond the registry codes, USER-DEFINED CRS are accepted with arbitrary
parameters and ellipsoids within the implemented families (Transverse
Mercator, Mercator A/B, polar stereographic A/B, Albers, LAEA, LCC
1SP/2SP) — parsed
from GeoTIFF projection geokeys (PCS 32767, the GDAL encoding of a
non-EPSG SRS), authority-free WKT, or proj4 (general-TM path verified
against the Ordnance Survey British National Grid worked example, LCC
1SP against EPSG GN7-2's Jamaica example). This closes the reference's
'any OSR-resolvable SRS' contract for every projected CRS family a
raster ancillary realistically ships in. Anything else is rejected up
front by the ancillary coverage check (geo/coverage.py) with a clear
error.
"""

import dataclasses
import re
from functools import lru_cache

import numpy as np

# ellipsoids: name -> (semi-major axis a, inverse flattening 1/f)
_ELLIPSOIDS = {
    'WGS84': (6378137.0, 298.257223563),
    'GRS80': (6378137.0, 298.257222101),  # NAD83 / ETRS89
    # classical datum ellipsoids (EPSG ellipsoid codes in comments)
    'AIRY1830': (6377563.396, 299.3249646),        # 7001 (OSGB36)
    'BESSEL1841': (6377397.155, 299.1528128),      # 7004 (CH1903, Tokyo)
    'CLARKE1866': (6378206.4, 294.9786982139006),  # 7008 (NAD27)
    'INTL1924': (6378388.0, 297.0),                # 7022 (ED50)
    'KRASS1940': (6378245.0, 298.3),               # 7024 (Pulkovo 1942)
    'EVEREST1967': (6377298.556, 300.8017),        # 7016 (Timbalai 1948)
}

# WGS84 ellipsoid (module-level: the polar-stereo code and external
# users are WGS84-only)
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)
_K0 = 0.9996
_FALSE_EASTING = 500000.0


@lru_cache(maxsize=None)
def _tm_series(ell):
    """Krueger/Karney 6th-order series constants for one ellipsoid:
    (e, e2, a_hat, alpha[6], beta[6])."""
    a, invf = _ELLIPSOIDS[ell]
    f = 1.0 / invf
    e2 = f * (2.0 - f)
    e = np.sqrt(e2)
    _n = f / (2.0 - f)
    a_hat = a / (1 + _n) * (1 + _n ** 2 / 4 + _n ** 4 / 64
                            + _n ** 6 / 256)
    alpha = np.array([
        _n / 2 - 2 * _n ** 2 / 3 + 5 * _n ** 3 / 16 + 41 * _n ** 4 / 180
        - 127 * _n ** 5 / 288 + 7891 * _n ** 6 / 37800,
        13 * _n ** 2 / 48 - 3 * _n ** 3 / 5 + 557 * _n ** 4 / 1440
        + 281 * _n ** 5 / 630 - 1983433 * _n ** 6 / 1935360,
        61 * _n ** 3 / 240 - 103 * _n ** 4 / 140 + 15061 * _n ** 5 / 26880
        + 167603 * _n ** 6 / 181440,
        49561 * _n ** 4 / 161280 - 179 * _n ** 5 / 168
        + 6601661 * _n ** 6 / 7257600,
        34729 * _n ** 5 / 80640 - 3418889 * _n ** 6 / 1995840,
        212378941 * _n ** 6 / 319334400,
    ])
    beta = np.array([
        _n / 2 - 2 * _n ** 2 / 3 + 37 * _n ** 3 / 96 - _n ** 4 / 360
        - 81 * _n ** 5 / 512 + 96199 * _n ** 6 / 604800,
        _n ** 2 / 48 + _n ** 3 / 15 - 437 * _n ** 4 / 1440
        + 46 * _n ** 5 / 105 - 1118711 * _n ** 6 / 3870720,
        17 * _n ** 3 / 480 - 37 * _n ** 4 / 840 - 209 * _n ** 5 / 4480
        + 5569 * _n ** 6 / 90720,
        4397 * _n ** 4 / 161280 - 11 * _n ** 5 / 504
        - 830251 * _n ** 6 / 7257600,
        4583 * _n ** 5 / 161280 - 108847 * _n ** 6 / 3991680,
        20648693 * _n ** 6 / 638668800,
    ])
    return e, e2, a_hat, alpha, beta


def utm_forward(lat_deg, lon_deg, zone, north, ell='WGS84'):
    """Geographic -> UTM easting/northing (float64, vectorized).

    ``ell`` selects the ellipsoid: 'WGS84' (default; EPSG:326xx/327xx)
    or 'GRS80' (NAD83 / ETRS89 UTM)."""
    e, e2, a_hat, alpha, _beta = _tm_series(ell)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lon0 = np.radians(zone * 6.0 - 183.0)
    dlon = np.arctan2(np.sin(lon - lon0), np.cos(lon - lon0))

    sphi = np.sin(lat)
    t = np.sinh(np.arctanh(sphi) - e * np.arctanh(e * sphi))
    xi_p = np.arctan2(t, np.cos(dlon))
    eta_p = np.arctanh(np.sin(dlon) / np.sqrt(1.0 + t * t))

    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi = xi + alpha[j] * np.sin(k * xi_p) * np.cosh(k * eta_p)
        eta = eta + alpha[j] * np.cos(k * xi_p) * np.sinh(k * eta_p)

    x = _FALSE_EASTING + _K0 * a_hat * eta
    y = _K0 * a_hat * xi
    if not north:
        y = y + 10000000.0
    return x, y


def utm_inverse(x, y, zone, north, ell='WGS84'):
    """UTM easting/northing -> geographic lat/lon degrees (float64).

    ``ell``: 'WGS84' (default) or 'GRS80' (NAD83 / ETRS89 UTM)."""
    e, e2, a_hat, _alpha, beta = _tm_series(ell)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if not north:
        y = y - 10000000.0
    xi = y / (_K0 * a_hat)
    eta = (x - _FALSE_EASTING) / (_K0 * a_hat)

    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi_p = xi_p - beta[j] * np.sin(k * xi) * np.cosh(k * eta)
        eta_p = eta_p - beta[j] * np.cos(k * xi) * np.sinh(k * eta)

    sinh_eta = np.sinh(eta_p)
    cos_xi = np.cos(xi_p)
    dlon = np.arctan2(sinh_eta, cos_xi)
    tau_p = np.sin(xi_p) / np.sqrt(sinh_eta ** 2 + cos_xi ** 2)

    # Newton-iterate tau (tan of geodetic latitude) from tau' (Karney)
    tau = tau_p / (1.0 - e2)
    for _ in range(5):
        sigma = np.sinh(e * np.arctanh(e * tau / np.sqrt(1.0 + tau ** 2)))
        tau_p_i = tau * np.sqrt(1.0 + sigma ** 2) \
            - sigma * np.sqrt(1.0 + tau ** 2)
        dtau = ((tau_p - tau_p_i) * (1.0 + (1.0 - e2) * tau ** 2)
                / ((1.0 - e2)
                   * np.sqrt((1.0 + tau_p_i ** 2) * (1.0 + tau ** 2))))
        tau = tau + dtau

    lat = np.degrees(np.arctan(tau))
    lon0 = zone * 6.0 - 183.0
    lon = lon0 + np.degrees(dlon)
    lon = (lon + 180.0) % 360.0 - 180.0
    return lat, lon


def _tm_xi0(lat0_deg, ell):
    """Scaled meridian arc xi(lat0) of the Krueger series (the
    latitude-of-origin northing offset for general TM grids)."""
    _e, _e2, _a_hat, alpha, _beta = _tm_series(ell)
    lat0 = np.radians(np.float64(lat0_deg))
    s = np.sin(lat0)
    e = _e
    t = np.sinh(np.arctanh(s) - e * np.arctanh(e * s))
    xi_p = np.arctan(t)
    xi = xi_p
    for j in range(6):
        xi = xi + alpha[j] * np.sin(2.0 * (j + 1) * xi_p)
    return xi


def tm_forward_general(lat_deg, lon_deg, ell, lat0, lon0, k0, fe, fn):
    """Geographic -> Transverse Mercator E/N with arbitrary parameters
    (latitude/longitude of origin, scale, false easting/northing) on a
    named ellipsoid — the general form behind user-defined TM grids
    (British National Grid, NZTM, Gauss-Krueger zones, ...). Same
    6th-order Krueger series as the UTM engine."""
    e, e2, a_hat, alpha, _beta = _tm_series(ell)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lam0 = np.radians(lon0)
    dlon = np.arctan2(np.sin(lon - lam0), np.cos(lon - lam0))
    sphi = np.sin(lat)
    t = np.sinh(np.arctanh(sphi) - e * np.arctanh(e * sphi))
    xi_p = np.arctan2(t, np.cos(dlon))
    eta_p = np.arctanh(np.sin(dlon) / np.sqrt(1.0 + t * t))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi = xi + alpha[j] * np.sin(k * xi_p) * np.cosh(k * eta_p)
        eta = eta + alpha[j] * np.cos(k * xi_p) * np.sinh(k * eta_p)
    x = fe + k0 * a_hat * eta
    y = fn + k0 * a_hat * (xi - _tm_xi0(lat0, ell))
    return x, y


def tm_inverse_general(x, y, ell, lat0, lon0, k0, fe, fn):
    """Transverse Mercator E/N with arbitrary parameters ->
    geographic lat/lon degrees."""
    e, e2, a_hat, _alpha, beta = _tm_series(ell)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    xi = (y - fn) / (k0 * a_hat) + _tm_xi0(lat0, ell)
    eta = (x - fe) / (k0 * a_hat)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi_p = xi_p - beta[j] * np.sin(k * xi) * np.cosh(k * eta)
        eta_p = eta_p - beta[j] * np.cos(k * xi) * np.sinh(k * eta)
    sinh_eta = np.sinh(eta_p)
    cos_xi = np.cos(xi_p)
    dlon = np.arctan2(sinh_eta, cos_xi)
    tau_p = np.sin(xi_p) / np.sqrt(sinh_eta ** 2 + cos_xi ** 2)
    tau = tau_p / (1.0 - e2)
    for _ in range(5):
        sigma = np.sinh(e * np.arctanh(e * tau / np.sqrt(1.0 + tau ** 2)))
        tau_p_i = tau * np.sqrt(1.0 + sigma ** 2) \
            - sigma * np.sqrt(1.0 + tau ** 2)
        dtau = ((tau_p - tau_p_i) * (1.0 + (1.0 - e2) * tau ** 2)
                / ((1.0 - e2)
                   * np.sqrt((1.0 + tau_p_i ** 2) * (1.0 + tau ** 2))))
        tau = tau + dtau
    lat = np.degrees(np.arctan(tau))
    lon = lon0 + np.degrees(dlon)
    lon = (lon + 180.0) % 360.0 - 180.0
    return lat, lon


# ---------------------------------------------------------------------------
# Polar Stereographic (variant B) on WGS84 — the one plausible real-world
# DEM/ancillary CRS outside 4326/UTM (reference accepts any OSR SRS at
# dswx_hls.py:3385-3461; we support the standard polar grids explicitly)
# ---------------------------------------------------------------------------

# EPSG code -> (standard parallel deg, longitude of origin deg,
#               false easting, false northing, north aspect)
_POLAR_STEREO = {
    3031: (-71.0, 0.0, 0.0, 0.0, False),    # WGS84 Antarctic PS
    3032: (-71.0, 70.0, 6000000.0, 6000000.0, False),  # Australian AAPS
    3413: (70.0, -45.0, 0.0, 0.0, True),    # NSIDC Sea Ice Polar North
    3976: (-70.0, 0.0, 0.0, 0.0, False),    # NSIDC Sea Ice Polar South
    # UPS (variant A: scale factor at the pole instead of a standard
    # parallel) — lat_ts None + k0 appended as the 6th element
    5041: (None, 0.0, 2000000.0, 2000000.0, True, 0.994),   # UPS North
    5042: (None, 0.0, 2000000.0, 2000000.0, False, 0.994),  # UPS South
}


def _ps_t(lat, e=None):
    """Snyder (15-9): isometric colatitude function t(phi), north aspect."""
    if e is None:
        e = _E
    s = np.sin(lat)
    return np.tan(np.pi / 4 - lat / 2) \
        * ((1 + e * s) / (1 - e * s)) ** (e / 2)


def _ps_rho_per_t(lat_ts_abs, k0=None, ell='WGS84'):
    """rho/t: variant B (k=1 at the standard parallel lat_ts) when
    ``k0`` is None, else variant A (scale k0 at the pole — UPS; EPSG
    Guidance Note 7-2 eq. for rho)."""
    a, e2, e = _ell_consts(ell)
    if k0 is not None:
        return (2.0 * a * k0
                / np.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e)))
    lat_f = np.radians(lat_ts_abs)
    m_f = np.cos(lat_f) / np.sqrt(1 - e2 * np.sin(lat_f) ** 2)
    return a * m_f / _ps_t(np.float64(lat_f), e)


def polar_stereo_forward(lat_deg, lon_deg, lat_ts, lon0, fe, fn, north,
                         k0=None, ell='WGS84'):
    """Geographic -> polar stereographic E/N, float64 (variant B,
    or variant A / UPS when ``k0`` is given)."""
    _a, _e2, e = _ell_consts(ell)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lam0 = np.radians(lon0)
    if not north:
        lat = -lat
        lon = -lon
        lam0 = -lam0
    rho = _ps_rho_per_t(None if lat_ts is None else abs(lat_ts), k0,
                        ell) * _ps_t(lat, e)
    theta = np.arctan2(np.sin(lon - lam0), np.cos(lon - lam0))
    x = rho * np.sin(theta)
    y = -rho * np.cos(theta)
    if not north:
        x, y = -x, -y
    return fe + x, fn + y


def polar_stereo_inverse(x, y, lat_ts, lon0, fe, fn, north, k0=None,
                         ell='WGS84'):
    """Polar stereographic E/N -> geographic lat/lon degrees (variant
    B, or variant A / UPS when ``k0`` is given)."""
    _a, _e2, e = _ell_consts(ell)
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    lam0 = np.radians(lon0)
    if not north:
        x, y, lam0 = -x, -y, -lam0
    rho = np.hypot(x, y)
    t = rho / _ps_rho_per_t(None if lat_ts is None else abs(lat_ts), k0,
                            ell)
    # iterate phi = pi/2 - 2 atan(t ((1-e sin phi)/(1+e sin phi))^(e/2))
    lat = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        s = np.sin(lat)
        lat = np.pi / 2 - 2 * np.arctan(
            t * ((1 - e * s) / (1 + e * s)) ** (e / 2))
    lon = lam0 + np.arctan2(x, -y)
    lat_deg = np.degrees(lat)
    lon_deg = np.degrees(lon)
    if not north:
        lat_deg = -lat_deg
        lon_deg = -lon_deg
    lon_deg = (lon_deg + 180.0) % 360.0 - 180.0
    return lat_deg, lon_deg


# ---------------------------------------------------------------------------
# Equal-area projections (Albers Conic, Lambert Azimuthal) — the national
# land-product grids a delivered DEM/landcover ancillary plausibly arrives
# in: NLCD/LANDFIRE ship in NAD83 Conus Albers, Geoscience Australia in
# GDA94 Australian Albers, EU-DEM/Corine in ETRS89-LAEA, NSIDC snow/ice
# products in EASE-Grid 2.0. The reference accepts them implicitly through
# OSR (dswx_hls.py:3385-3461). Ellipsoidal forms per Snyder 1987 ch. 14/24
# and EPSG Guidance Note 7-2; datum shifts NAD83/GDA94/ETRS89 <-> WGS84 are
# the null transformation (as OSR applies without datum grids, ~1-2 m).
# ---------------------------------------------------------------------------

# EPSG code -> (ellipsoid, lat0, lon0, std parallel 1, std parallel 2,
#               false easting, false northing)
_ALBERS = {
    5070: ('GRS80', 23.0, -96.0, 29.5, 45.5, 0.0, 0.0),
    3577: ('GRS80', 0.0, 132.0, -18.0, -36.0, 0.0, 0.0),
}

# EPSG code -> (ellipsoid, lat0, lon0, false easting, false northing)
_LAEA = {
    3035: ('GRS80', 52.0, 10.0, 4321000.0, 3210000.0),
    6931: ('WGS84', 90.0, 0.0, 0.0, 0.0),
    6932: ('WGS84', -90.0, 0.0, 0.0, 0.0),
}

# Lambert Conformal Conic (2SP): the national grids of Canada (Canada
# Atlas Lambert — CDEM/HRDEM deliveries) and France (Lambert-93 — IGN
# products). EPSG code -> (ellipsoid, lat0, lon0, sp1, sp2, fe, fn)
_LCC = {
    3978: ('GRS80', 49.0, -95.0, 49.0, 77.0, 0.0, 0.0),
    2154: ('GRS80', 46.5, 3.0, 49.0, 44.0, 700000.0, 6600000.0),
}

# Mercator: EPSG:3395 (WGS84 World Mercator, ellipsoidal variant A) --
# EPSG code -> (ellipsoid, lon0, k0, fe, fn). EPSG:3857 (Web/"popular
# visualisation pseudo" Mercator: SPHERICAL formulas with R = a on
# geodetic latitude) is handled as its own flag.
_MERC = {
    3395: ('WGS84', 0.0, 1.0, 0.0, 0.0),
}
WEB_MERCATOR_EPSG = 3857

# Lambert Cylindrical Equal Area: EPSG:6933 (NSIDC EASE-Grid 2.0
# global — SMAP/AMSR snow & soil-moisture rasters). EPSG code ->
# (ellipsoid, lat_ts, lon0, fe, fn). The spherical v1 grids
# (3410/3975) remain rejected like every other sphere CRS.
_CEA = {
    6933: ('WGS84', 30.0, 0.0, 0.0, 0.0),
}

# the MODIS sinusoidal grid (no EPSG code; GDAL round-trips it as a
# user-defined SRS): authalic sphere radius used by its custom tuple
MODIS_SPHERE_RADIUS = 6371007.181


@lru_cache(maxsize=None)
def _ell_consts(ell):
    """(a, e2, e) for a named ellipsoid."""
    a, invf = _ELLIPSOIDS[ell]
    f = 1.0 / invf
    e2 = f * (2.0 - f)
    return a, e2, np.sqrt(e2)


def _ensure_ellipsoid(a, invf):
    """Registry name for ellipsoid (a, 1/f); registers an ad-hoc entry
    for non-standard ellipsoids found in user-defined CRS (e.g. Airy
    1830, Clarke 1866, International 1924). Spheres (1/f = 0, the
    authalic-sphere EASE-Grid v1 / legacy grids) and nonsensical
    parameters are rejected up front so they fail at parse/coverage
    time, not with a division inside the warp."""
    a, invf = float(a), float(invf)
    if not (1e6 < a < 1e8) or not np.isfinite(invf) or invf <= 0 \
            or invf < 100:
        raise ValueError(
            f'unsupported ellipsoid (a={a:g}, 1/f={invf:g}): spherical '
            'and non-Earth ellipsoids are not supported')
    for name, (ra, rf) in _ELLIPSOIDS.items():
        if abs(ra - a) < 1e-3 and abs(rf - invf) < 1e-8:
            return name
    name = f'E_{a:.4f}_{invf:.9f}'
    _ELLIPSOIDS[name] = (a, invf)
    return name


# --------------------------------------------------------------------------
# Datum transformations (TOWGS84 / Helmert).
#
# The reference resolves ANY OSR SRS (dswx_hls.py:3385-3461); for CRS on
# classical datums OSR applies the parametric Helmert transformation the
# SRS carries (the WKT TOWGS84[] clause / proj4 +towgs84=). We implement
# the same chain: geodetic (h=0) -> geocentric cartesian -> 7-parameter
# position-vector transformation (EPSG method 9606; the 3-parameter
# geocentric translation 9603 is its rx=ry=rz=ds=0 case, which is also
# the TOWGS84 convention) -> geodetic on the target ellipsoid. 2D
# transforms take h=0 on the source datum and discard the output height,
# exactly as OSR does for 2D points. Grid-based transformations (NTv2,
# OSTN15, NADCON) need grid files neither we nor a grid-less OSR have —
# the parametric path below is what GDAL applies without them.
# Verified against the EPSG Guidance Note 7-2 worked examples
# (geographic/geocentric conversion and the WGS72->WGS84 position-vector
# example) in tests/test_crs_datum.py.

def geodetic_to_geocentric(lat_deg, lon_deg, ell, h=0.0):
    """Geodetic (degrees, ellipsoidal height m) -> geocentric X,Y,Z (m).

    EPSG Guidance Note 7-2 §2.2 (method 9602 one-way)."""
    a, e2, _e = _ell_consts(ell) if isinstance(ell, str) else (
        float(ell), 0.0, 0.0)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    sin_lat = np.sin(lat)
    nu = a / np.sqrt(1.0 - e2 * sin_lat * sin_lat)
    cos_lat = np.cos(lat)
    x = (nu + h) * cos_lat * np.cos(lon)
    y = (nu + h) * cos_lat * np.sin(lon)
    z = (nu * (1.0 - e2) + h) * sin_lat
    return x, y, z


def geocentric_to_geodetic(x, y, z, ell):
    """Geocentric X,Y,Z (m) -> geodetic (lat, lon degrees; height
    discarded — 2D transform semantics)."""
    a, e2, _e = _ell_consts(ell) if isinstance(ell, str) else (
        float(ell), 0.0, 0.0)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    p = np.hypot(x, y)
    # fixed-point iteration on the standard closed form; converges to
    # float64 roundoff in < 6 iterations for |h| << a (h here is the
    # small height the Helmert shift introduces on the target datum)
    lat = np.arctan2(z, p * (1.0 - e2))
    for _ in range(8):
        sin_lat = np.sin(lat)
        nu = a / np.sqrt(1.0 - e2 * sin_lat * sin_lat)
        h = np.where(np.abs(np.cos(lat)) > 1e-10,
                     p / np.cos(lat) - nu,
                     np.abs(z) / np.maximum(np.abs(sin_lat), 1e-300)
                     - nu * (1.0 - e2))
        lat = np.arctan2(z, p * (1.0 - e2 * nu / (nu + h)))
    return np.degrees(lat), np.degrees(np.arctan2(y, x))


def _towgs84_matrix(p7):
    """(t vector, M matrix) of the position-vector transformation."""
    tx, ty, tz, rx, ry, rz, ds = [float(v) for v in p7]
    s = 1.0 + ds * 1e-6
    arc = np.pi / (180.0 * 3600.0)      # arc-seconds -> radians
    rx, ry, rz = rx * arc, ry * arc, rz * arc
    m = s * np.array([[1.0, -rz, ry],
                      [rz, 1.0, -rx],
                      [-ry, rx, 1.0]], dtype=np.float64)
    return np.array([tx, ty, tz], dtype=np.float64), m


def helmert_position_vector(x, y, z, p7, inverse=False):
    """7-parameter position-vector Helmert transformation (EPSG 9606,
    the TOWGS84 convention: rotations in arc-seconds, scale in ppm).
    ``inverse=True`` applies the exact inverse (solves the forward
    relation rather than negating the parameters)."""
    t, m = _towgs84_matrix(p7)
    v = np.stack([np.asarray(x, dtype=np.float64).ravel(),
                  np.asarray(y, dtype=np.float64).ravel(),
                  np.asarray(z, dtype=np.float64).ravel()])
    if inverse:
        out = np.linalg.solve(m, v - t[:, None])
    else:
        out = m @ v + t[:, None]
    shape = np.shape(x)
    return (out[0].reshape(shape), out[1].reshape(shape),
            out[2].reshape(shape))


def _effective_shift(p7):
    """None for the null transformation (absent or all-zero TOWGS84)."""
    if p7 is None or all(float(v) == 0.0 for v in p7):
        return None
    return tuple(float(v) for v in p7)


def shift_datum(lat, lon, src_ell, src_p7, dst_ell, dst_p7):
    """Geodetic datum shift src -> WGS84 -> dst via geocentric Helmert
    (h=0 on the source datum; output height discarded)."""
    src_p7 = _effective_shift(src_p7)
    dst_p7 = _effective_shift(dst_p7)
    if src_p7 == dst_p7:
        return (np.asarray(lat, dtype=np.float64),
                np.asarray(lon, dtype=np.float64))
    x, y, z = geodetic_to_geocentric(lat, lon, src_ell)
    if src_p7 is not None:
        x, y, z = helmert_position_vector(x, y, z, src_p7)
    if dst_p7 is not None:
        x, y, z = helmert_position_vector(x, y, z, dst_p7, inverse=True)
    return geocentric_to_geodetic(x, y, z, dst_ell)


def _norm_towgs84(vals):
    """Normalize a parsed TOWGS84 parameter list: pad 3-parameter form
    with zero rotations/scale; all-zero (the explicit null
    transformation) stays as a 7-tuple of zeros so it can OVERRIDE a
    registry default."""
    vals = [float(v) for v in vals]
    if len(vals) == 3:
        vals += [0.0, 0.0, 0.0, 0.0]
    if len(vals) != 7:
        raise ValueError(
            f'TOWGS84 needs 3 or 7 parameters, got {len(vals)}')
    return tuple(vals)


# registry datum shifts to WGS84 (TOWGS84 convention), applied to CRS
# whose datum is not WGS84-equivalent. EPSG transformation cited per
# entry; an explicit TOWGS84[]/+towgs84= in the file overrides these.
_SHIFT_OSGB36 = (446.448, -125.157, 542.06, 0.15, 0.247, 0.842,
                 -20.489)                    # EPSG 1314 (Petroleum, 2m)
_SHIFT_ED50 = (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0)   # EPSG 1133
_SHIFT_NAD27 = (-8.0, 160.0, 176.0, 0.0, 0.0, 0.0, 0.0)    # EPSG 1173
_SHIFT_TOKYO = (-146.414, 507.337, 680.507, 0.0, 0.0, 0.0,
                0.0)                         # Japan GSI / GDAL default
_SHIFT_PULKOVO42 = (28.0, -130.0, -95.0, 0.0, 0.0, 0.0, 0.0)  # EPSG 1254
_SHIFT_CH1903 = (674.4, 15.1, 405.3, 0.0, 0.0, 0.0, 0.0)    # EPSG 1753
_SHIFT_CH1903P = (674.374, 15.056, 405.346, 0.0, 0.0, 0.0,
                  0.0)                       # EPSG 1676 (CH1903+)
_SHIFT_TIMBALAI = (-679.0, 669.0, -48.0, 0.0, 0.0, 0.0, 0.0)  # EPSG 1236
_SHIFT_SJTSK = (589.0, 76.0, 480.0, 0.0, 0.0, 0.0, 0.0)      # EPSG 1623
_SHIFT_AMERSFOORT = (565.417, 50.3319, 465.552, -0.398957,
                     0.343988, -1.8774, 4.0725)
# ^ the legacy proj4/GDAL epsg-init +towgs84 set every install carried
# for 28992 (matches it to ~2 m; EPSG's own 15934 publishes slightly
# different parameters: 565.2369, 50.0087, 465.658, ...)


def _merc_k0_from_lat_ts(lat_ts, ell):
    """Mercator variant B -> variant A: equivalent scale at the equator
    k0 = m(lat_ts) = cos(lat_ts)/sqrt(1 - e2 sin^2 lat_ts)."""
    _a, e2, _e = _ell_consts(ell)
    s = np.sin(np.radians(lat_ts))
    return float(np.cos(np.radians(lat_ts))
                 / np.sqrt(1.0 - e2 * s * s))


# numeric literal inside WKT/proj4 (handles 2.95e-1 style exponents)
_NUM_RE = r'([-+]?[\d.]+(?:[eE][-+]?\d+)?)'


def _proj4_param(proj4, key, default=0.0):
    m = re.search(rf'\+{key}={_NUM_RE}', proj4)
    return float(m.group(1)) if m else default


# projected linear units (metres per unit). US State Plane grids ship
# in feet; the reference accepts them through OSR (dswx_hls.py:3385).
_FOOT = 0.3048                    # international foot (EPSG 9002)
_US_FOOT = 1200.0 / 3937.0        # US survey foot (EPSG 9003)
_UNIT_GEOKEY = {9001: 1.0, 9002: _FOOT, 9003: _US_FOOT}
_UNIT_WKT_NAME = {1.0: ('metre', '1'), _FOOT: ('foot', '0.3048'),
                  _US_FOOT: ('US survey foot', '0.30480060960121924')}


def _snap_unit(factor):
    """Snap a parsed linear-unit factor onto the exact registry value
    (WKT/geokey files round-trip through decimal text)."""
    factor = float(factor)
    for exact in (1.0, _FOOT, _US_FOOT):
        if abs(factor - exact) < 1e-12:
            return exact
    if not (factor > 0 and np.isfinite(factor)):
        raise ValueError(f'invalid projected linear unit: {factor!r}')
    return factor


# known geographic CS geokey codes -> ellipsoid of their datum (the
# datum shift itself is the null transformation, like the named CRS)
_GEOGCS_ELL = {
    4326: 'WGS84', 4322: 'WGS84',
    4269: 'GRS80', 4258: 'GRS80', 4283: 'GRS80', 4171: 'GRS80',
    4617: 'GRS80', 4759: 'GRS80', 4167: 'GRS80',
    # classical datums (their Helmert shifts live in _EPSG_TOWGS84)
    4277: 'AIRY1830', 4230: 'INTL1924', 4267: 'CLARKE1866',
    4301: 'BESSEL1841', 4284: 'KRASS1940',
    4149: 'BESSEL1841', 4150: 'BESSEL1841', 4156: 'BESSEL1841',
}


def _q_authalic(lat, e, e2):
    """Snyder (3-12): q(phi), so that q/qp = sin(authalic latitude)."""
    s = np.sin(lat)
    return (1.0 - e2) * (s / (1.0 - e2 * s * s)
                         - np.log((1.0 - e * s) / (1.0 + e * s))
                         / (2.0 * e))


def _phi_from_q(q, e, e2, qp):
    """Latitude from authalic q: series seed (Snyder 3-18) + Newton
    polish to full float64 (dq/dphi = 2(1-e2)cos phi/(1-e2 sin^2)^2)."""
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    e4, e6 = e2 * e2, e2 * e2 * e2
    lat = (beta
           + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * np.sin(2 * beta)
           + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta)
           + (761 * e6 / 45360) * np.sin(6 * beta))
    for _ in range(3):
        s = np.sin(lat)
        f = _q_authalic(lat, e, e2) - q
        df = 2.0 * (1.0 - e2) * np.cos(lat) / (1.0 - e2 * s * s) ** 2
        step = f / np.maximum(df, 1e-12)
        lat = np.clip(lat - np.clip(step, -0.1, 0.1),
                      -np.pi / 2, np.pi / 2)
    return lat


def _wrap_pi(x):
    return (x + np.pi) % (2.0 * np.pi) - np.pi


def albers_forward(lat_deg, lon_deg, ell, lat0, lon0, sp1, sp2, fe, fn):
    """Geographic -> Albers Equal Area Conic E/N, float64 (Snyder
    14-1..14-5 ellipsoidal; null datum shift to the grid's datum)."""
    a, e2, e = _ell_consts(ell)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    p0, p1, p2 = (np.radians(v) for v in (lat0, sp1, sp2))
    s1, s2 = np.sin(p1), np.sin(p2)
    m1 = np.cos(p1) / np.sqrt(1.0 - e2 * s1 * s1)
    m2 = np.cos(p2) / np.sqrt(1.0 - e2 * s2 * s2)
    q0, q1, q2 = (_q_authalic(p, e, e2) for p in (p0, p1, p2))
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * np.sqrt(C - n * q0) / n
    q = _q_authalic(lat, e, e2)
    rho = a * np.sqrt(np.maximum(C - n * q, 0.0)) / n
    theta = n * _wrap_pi(lon - np.radians(lon0))
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def albers_inverse(x, y, ell, lat0, lon0, sp1, sp2, fe, fn):
    """Albers Equal Area Conic E/N -> geographic lat/lon degrees."""
    a, e2, e = _ell_consts(ell)
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    p0, p1, p2 = (np.radians(v) for v in (lat0, sp1, sp2))
    s1, s2 = np.sin(p1), np.sin(p2)
    m1 = np.cos(p1) / np.sqrt(1.0 - e2 * s1 * s1)
    m2 = np.cos(p2) / np.sqrt(1.0 - e2 * s2 * s2)
    q0, q1, q2 = (_q_authalic(p, e, e2) for p in (p0, p1, p2))
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * np.sqrt(C - n * q0) / n
    sgn = 1.0 if n >= 0 else -1.0   # Snyder: flip signs when n < 0
    rho = np.hypot(x, rho0 - y)
    theta = np.arctan2(sgn * x, sgn * (rho0 - y))
    q = (C - (rho * n / a) ** 2) / n
    qp = _q_authalic(np.float64(np.pi / 2), e, e2)
    lat = _phi_from_q(q, e, e2, qp)
    lon = np.radians(lon0) + theta / n
    return np.degrees(lat), np.degrees(_wrap_pi(lon))


def laea_forward(lat_deg, lon_deg, ell, lat0, lon0, fe, fn):
    """Geographic -> Lambert Azimuthal Equal Area E/N, float64 (EPSG
    Guidance Note 7-2 oblique form; Snyder 24-23/24 polar aspects)."""
    a, e2, e = _ell_consts(ell)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    dlon = _wrap_pi(np.radians(np.asarray(lon_deg, dtype=np.float64))
                    - np.radians(lon0))
    q = _q_authalic(lat, e, e2)
    qp = _q_authalic(np.float64(np.pi / 2), e, e2)
    if lat0 >= 90.0:     # north polar aspect
        rho = a * np.sqrt(np.maximum(qp - q, 0.0))
        return fe + rho * np.sin(dlon), fn - rho * np.cos(dlon)
    if lat0 <= -90.0:    # south polar aspect
        rho = a * np.sqrt(np.maximum(qp + q, 0.0))
        return fe + rho * np.sin(dlon), fn + rho * np.cos(dlon)
    p0 = np.radians(lat0)
    s0 = np.sin(p0)
    m0 = np.cos(p0) / np.sqrt(1.0 - e2 * s0 * s0)
    b0 = np.arcsin(np.clip(_q_authalic(p0, e, e2) / qp, -1.0, 1.0))
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    rq = a * np.sqrt(qp / 2.0)
    d = a * m0 / (rq * np.cos(b0))
    denom = (1.0 + np.sin(b0) * np.sin(beta)
             + np.cos(b0) * np.cos(beta) * np.cos(dlon))
    b = rq * np.sqrt(2.0 / np.maximum(denom, 1e-12))
    x = b * d * np.cos(beta) * np.sin(dlon)
    y = (b / d) * (np.cos(b0) * np.sin(beta)
                   - np.sin(b0) * np.cos(beta) * np.cos(dlon))
    return fe + x, fn + y


def laea_inverse(x, y, ell, lat0, lon0, fe, fn):
    """Lambert Azimuthal Equal Area E/N -> geographic lat/lon degrees."""
    a, e2, e = _ell_consts(ell)
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    qp = _q_authalic(np.float64(np.pi / 2), e, e2)
    lam0 = np.radians(lon0)
    if lat0 >= 90.0 or lat0 <= -90.0:
        rho = np.hypot(x, y)
        if lat0 >= 90.0:
            q = qp - (rho / a) ** 2
            lon = lam0 + np.arctan2(x, -y)
        else:
            q = (rho / a) ** 2 - qp
            lon = lam0 + np.arctan2(x, y)
        lat = _phi_from_q(q, e, e2, qp)
        return np.degrees(lat), np.degrees(_wrap_pi(lon))
    p0 = np.radians(lat0)
    s0 = np.sin(p0)
    m0 = np.cos(p0) / np.sqrt(1.0 - e2 * s0 * s0)
    b0 = np.arcsin(np.clip(_q_authalic(p0, e, e2) / qp, -1.0, 1.0))
    rq = a * np.sqrt(qp / 2.0)
    d = a * m0 / (rq * np.cos(b0))
    rho = np.hypot(x / d, d * y)
    safe_rho = np.maximum(rho, 1e-12)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
    beta = np.arcsin(np.clip(
        np.cos(ce) * np.sin(b0)
        + d * y * np.sin(ce) * np.cos(b0) / safe_rho, -1.0, 1.0))
    lon = lam0 + np.arctan2(
        x * np.sin(ce),
        d * safe_rho * np.cos(b0) * np.cos(ce)
        - d * d * y * np.sin(b0) * np.sin(ce))
    lat = _phi_from_q(qp * np.sin(beta), e, e2, qp)
    # at the projection center rho=0: the trig degenerates -> (lat0,lon0)
    lat = np.where(rho < 1e-12, p0, lat)
    lon = np.where(rho < 1e-12, lam0, lon)
    return np.degrees(lat), np.degrees(_wrap_pi(lon))


def _lcc_t(lat, e):
    """Snyder (15-9): t(phi) for the conformal conic."""
    s = np.sin(lat)
    return (np.tan(np.pi / 4 - lat / 2)
            / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2))


def lcc_forward(lat_deg, lon_deg, ell, lat0, lon0, sp1, sp2, fe, fn,
                k0=1.0):
    """Geographic -> Lambert Conformal Conic E/N, float64 (Snyder
    15-1..15-5 ellipsoidal, 2SP; the 1SP variant is sp1 == sp2 == lat0
    with scale ``k0`` at the origin)."""
    a, e2, e = _ell_consts(ell)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    p0, p1, p2 = (np.radians(v) for v in (lat0, sp1, sp2))
    s1, s2 = np.sin(p1), np.sin(p2)
    m1 = np.cos(p1) / np.sqrt(1.0 - e2 * s1 * s1)
    m2 = np.cos(p2) / np.sqrt(1.0 - e2 * s2 * s2)
    t0, t1, t2 = (_lcc_t(p, e) for p in (p0, p1, p2))
    if sp1 == sp2:
        n = np.sin(p1)
    else:
        n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    F = k0 * m1 / (n * t1 ** n)
    rho0 = a * F * t0 ** n
    rho = a * F * _lcc_t(lat, e) ** n
    theta = n * _wrap_pi(lon - np.radians(lon0))
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def lcc_inverse(x, y, ell, lat0, lon0, sp1, sp2, fe, fn, k0=1.0):
    """Lambert Conformal Conic E/N -> geographic lat/lon degrees
    (2SP, or 1SP via sp1 == sp2 == lat0 + ``k0``)."""
    a, e2, e = _ell_consts(ell)
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    p0, p1, p2 = (np.radians(v) for v in (lat0, sp1, sp2))
    s1, s2 = np.sin(p1), np.sin(p2)
    m1 = np.cos(p1) / np.sqrt(1.0 - e2 * s1 * s1)
    m2 = np.cos(p2) / np.sqrt(1.0 - e2 * s2 * s2)
    t0, t1, t2 = (_lcc_t(p, e) for p in (p0, p1, p2))
    if sp1 == sp2:
        n = np.sin(p1)
    else:
        n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    F = k0 * m1 / (n * t1 ** n)
    rho0 = a * F * t0 ** n
    sgn = 1.0 if n >= 0 else -1.0
    rho = sgn * np.hypot(x, rho0 - y)
    theta = np.arctan2(sgn * x, sgn * (rho0 - y))
    t = (rho / (a * F)) ** (1.0 / n)
    # same conformal-latitude iteration as polar stereographic
    lat = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        s = np.sin(lat)
        lat = np.pi / 2 - 2 * np.arctan(
            t * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2))
    lon = np.radians(lon0) + theta / n
    return np.degrees(lat), np.degrees(_wrap_pi(lon))


_WKT_PS_TEMPLATE = (
    'PROJCS["{name}",GEOGCS["WGS 84",'
    'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563,'
    'AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
    'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4326"]],PROJECTION["Polar_Stereographic"],'
    'PARAMETER["latitude_of_origin",{lat_ts}],'
    'PARAMETER["central_meridian",{lon0}],'
    'PARAMETER["false_easting",{fe}],'
    'PARAMETER["false_northing",{fn}],'
    'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
    'AUTHORITY["EPSG","{epsg}"]]')

_PS_NAMES = {
    3031: 'WGS 84 / Antarctic Polar Stereographic',
    3032: 'WGS 84 / Australian Antarctic Polar Stereographic',
    3413: 'WGS 84 / NSIDC Sea Ice Polar Stereographic North',
    3976: 'WGS 84 / NSIDC Sea Ice Polar Stereographic South',
}


_WKT_UTM_TEMPLATE = (
    'PROJCS["WGS 84 / UTM zone {zone}{ns}",GEOGCS["WGS 84",'
    'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563,'
    'AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
    'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4326"]],PROJECTION["Transverse_Mercator"],'
    'PARAMETER["latitude_of_origin",0],'
    'PARAMETER["central_meridian",{lon0}],'
    'PARAMETER["scale_factor",0.9996],'
    'PARAMETER["false_easting",500000],'
    'PARAMETER["false_northing",{fn}],'
    'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
    'AXIS["Easting",EAST],AXIS["Northing",NORTH],'
    'AUTHORITY["EPSG","{epsg}"]]')

_WKT_WGS84 = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
    'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AXIS["Latitude",NORTH],AXIS["Longitude",EAST],'
    'AUTHORITY["EPSG","4326"]]')

_GEOGCS_GRS80 = (
    'GEOGCS["{datum_name}",DATUM["{datum_wkt}",'
    'SPHEROID["GRS 1980",6378137,298.257222101,'
    'AUTHORITY["EPSG","7019"]],AUTHORITY["EPSG","{datum_auth}"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
    'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]]')

_WKT_GEO_GRS80_TEMPLATE = (
    _GEOGCS_GRS80 + ',AXIS["Latitude",NORTH],AXIS["Longitude",EAST],'
    'AUTHORITY["EPSG","{epsg}"]]')

_WKT_UTM_GRS80_TEMPLATE = (
    'PROJCS["{datum_name} / UTM zone {zone}N",' + _GEOGCS_GRS80
    + ',AUTHORITY["EPSG","{geogcs_auth}"]],'
    'PROJECTION["Transverse_Mercator"],'
    'PARAMETER["latitude_of_origin",0],'
    'PARAMETER["central_meridian",{lon0}],'
    'PARAMETER["scale_factor",0.9996],'
    'PARAMETER["false_easting",500000],'
    'PARAMETER["false_northing",0],'
    'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
    'AXIS["Easting",EAST],AXIS["Northing",NORTH],'
    'AUTHORITY["EPSG","{epsg}"]]')

_GEOGCS_WGS84_FRAG = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
    'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4326"]]')

_GEOGCS_GDA94_FRAG = (
    'GEOGCS["GDA94",DATUM["Geocentric_Datum_of_Australia_1994",'
    'SPHEROID["GRS 1980",6378137,298.257222101,'
    'AUTHORITY["EPSG","7019"]],AUTHORITY["EPSG","6283"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
    'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4283"]]')

# equal-area grids: epsg -> (PROJCS name, GEOGCS fragment)
_GRID_NAME_GEOGCS = {
    5070: ('NAD83 / Conus Albers',
           _GEOGCS_GRS80.format(
               datum_name='NAD83',
               datum_wkt='North_American_Datum_1983', datum_auth=6269)
           + ',AUTHORITY["EPSG","4269"]]'),
    3577: ('GDA94 / Australian Albers', _GEOGCS_GDA94_FRAG),
    3035: ('ETRS89-extended / LAEA Europe',
           _GEOGCS_GRS80.format(
               datum_name='ETRS89',
               datum_wkt='European_Terrestrial_Reference_System_1989',
               datum_auth=6258)
           + ',AUTHORITY["EPSG","4258"]]'),
    6931: ('WGS 84 / NSIDC EASE-Grid 2.0 North', _GEOGCS_WGS84_FRAG),
    6932: ('WGS 84 / NSIDC EASE-Grid 2.0 South', _GEOGCS_WGS84_FRAG),
    3978: ('NAD83 / Canada Atlas Lambert',
           _GEOGCS_GRS80.format(
               datum_name='NAD83',
               datum_wkt='North_American_Datum_1983', datum_auth=6269)
           + ',AUTHORITY["EPSG","4269"]]'),
    2154: ('RGF93 v1 / Lambert-93',
           _GEOGCS_GRS80.format(
               datum_name='RGF93 v1',
               datum_wkt='Reseau_Geodesique_Francais_1993_v1',
               datum_auth=6171)
           + ',AUTHORITY["EPSG","4171"]]'),
}

_WKT_LCC_TEMPLATE = (
    'PROJCS["{name}",{geogcs},'
    'PROJECTION["Lambert_Conformal_Conic_2SP"],'
    'PARAMETER["latitude_of_origin",{lat0}],'
    'PARAMETER["central_meridian",{lon0}],'
    'PARAMETER["standard_parallel_1",{sp1}],'
    'PARAMETER["standard_parallel_2",{sp2}],'
    'PARAMETER["false_easting",{fe}],'
    'PARAMETER["false_northing",{fn}],'
    'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
    'AXIS["Easting",EAST],AXIS["Northing",NORTH],'
    'AUTHORITY["EPSG","{epsg}"]]')

_WKT_ALBERS_TEMPLATE = (
    'PROJCS["{name}",{geogcs},'
    'PROJECTION["Albers_Conic_Equal_Area"],'
    'PARAMETER["latitude_of_center",{lat0}],'
    'PARAMETER["longitude_of_center",{lon0}],'
    'PARAMETER["standard_parallel_1",{sp1}],'
    'PARAMETER["standard_parallel_2",{sp2}],'
    'PARAMETER["false_easting",{fe}],'
    'PARAMETER["false_northing",{fn}],'
    'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
    'AXIS["Easting",EAST],AXIS["Northing",NORTH],'
    'AUTHORITY["EPSG","{epsg}"]]')

_WKT_LAEA_TEMPLATE = (
    'PROJCS["{name}",{geogcs},'
    'PROJECTION["Lambert_Azimuthal_Equal_Area"],'
    'PARAMETER["latitude_of_center",{lat0}],'
    'PARAMETER["longitude_of_center",{lon0}],'
    'PARAMETER["false_easting",{fe}],'
    'PARAMETER["false_northing",{fn}],'
    'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
    'AXIS["Easting",EAST],AXIS["Northing",NORTH],'
    'AUTHORITY["EPSG","{epsg}"]]')

_WKT_CEA_TEMPLATE = (
    'PROJCS["{name}",{geogcs},'
    'PROJECTION["Cylindrical_Equal_Area"],'
    'PARAMETER["standard_parallel_1",{lat_ts}],'
    'PARAMETER["central_meridian",{lon0}],'
    'PARAMETER["false_easting",{fe}],'
    'PARAMETER["false_northing",{fn}],'
    'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
    'AXIS["Easting",EAST],AXIS["Northing",NORTH],'
    'AUTHORITY["EPSG","{epsg}"]]')

_WKT_MERC_TEMPLATE = (
    'PROJCS["{name}",{geogcs},'
    'PROJECTION["Mercator_1SP"],'
    'PARAMETER["central_meridian",{lon0}],'
    'PARAMETER["scale_factor",{k0}],'
    'PARAMETER["false_easting",{fe}],'
    'PARAMETER["false_northing",{fn}],'
    'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
    'AXIS["Easting",EAST],AXIS["Northing",NORTH],'
    'AUTHORITY["EPSG","{epsg}"]]')

_WKT_UPS_TEMPLATE = (
    'PROJCS["WGS 84 / UPS {ns} (E,N)",GEOGCS["WGS 84",'
    'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563,'
    'AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
    'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4326"]],PROJECTION["Polar_Stereographic"],'
    'PARAMETER["latitude_of_origin",{lat0}],'
    'PARAMETER["central_meridian",0],'
    'PARAMETER["scale_factor",{k0}],'
    'PARAMETER["false_easting",{fe}],'
    'PARAMETER["false_northing",{fn}],'
    'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
    'AUTHORITY["EPSG","{epsg}"]]')


def mercator_forward(lat_deg, lon_deg, ell, lon0, k0, fe, fn):
    """Geographic -> Mercator E/N (ellipsoidal, EPSG variant A; variant
    B callers fold lat_ts into ``k0`` = m(lat_ts))."""
    a, _e2, e = _ell_consts(ell)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    dlon = _wrap_pi(lon - np.radians(lon0))
    x = fe + a * k0 * dlon
    y = fn - a * k0 * np.log(_lcc_t(lat, e))
    return x, y


def mercator_inverse(x, y, ell, lon0, k0, fe, fn):
    """Mercator E/N -> geographic lat/lon degrees."""
    a, _e2, e = _ell_consts(ell)
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    t = np.exp(-y / (a * k0))
    lat = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        s = np.sin(lat)
        lat = np.pi / 2 - 2 * np.arctan(
            t * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2))
    lon = np.radians(lon0) + x / (a * k0)
    return np.degrees(lat), np.degrees(_wrap_pi(lon))


def web_mercator_forward(lat_deg, lon_deg):
    """WGS84 geographic -> EPSG:3857 (spherical formulas, R = a, on
    geodetic latitude — the 'popular visualisation' definition)."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    return _A * _wrap_pi(lon), _A * np.log(np.tan(np.pi / 4 + lat / 2))


def web_mercator_inverse(x, y):
    """EPSG:3857 -> WGS84 geographic lat/lon degrees."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _A)) - np.pi / 2)
    lon = np.degrees(_wrap_pi(x / _A))
    return lat, lon


def _sinu_ell(ell_or_radius):
    """(a, e2, e) accepting a registry ellipsoid name OR a sphere
    radius (float). The MODIS sinusoidal grid lives on the authalic
    sphere R = 6371007.181 — the one production-relevant spherical
    'datum', carried as a radius so the ellipsoidal-only registry can
    keep rejecting spheres everywhere else."""
    if isinstance(ell_or_radius, str):
        return _ell_consts(ell_or_radius)
    r = float(ell_or_radius)
    if not (1e6 < r < 1e8):
        raise ValueError(f'bad sphere radius: {r!r}')
    return r, 0.0, 0.0


def _merid_arc(lat, a, e2):
    """Meridian arc length M(phi) (Snyder 3-21); reduces to a*phi on
    the sphere (e2 = 0)."""
    e4, e6 = e2 * e2, e2 * e2 * e2
    return a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * lat
                - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024)
                * np.sin(2 * lat)
                + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * lat)
                - (35 * e6 / 3072) * np.sin(6 * lat))


def _lat_from_merid(M, a, e2):
    """phi from meridian arc via the rectifying latitude (Snyder
    3-26), Newton-polished to full float64."""
    e4, e6 = e2 * e2, e2 * e2 * e2
    mu = M / (a * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    se = np.sqrt(1.0 - e2)
    e1 = (1.0 - se) / (1.0 + se)
    lat = (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
           + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
           + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
           + (1097 * e1 ** 4 / 512) * np.sin(8 * mu))
    for _ in range(2):      # dM/dphi = a(1-e2)/(1-e2 sin^2)^(3/2)
        s = np.sin(lat)
        df = a * (1.0 - e2) / (1.0 - e2 * s * s) ** 1.5
        lat = lat - (_merid_arc(lat, a, e2) - M) / df
    return lat


def sinusoidal_forward(lat_deg, lon_deg, ell, lon0, fe, fn):
    """Geographic -> sinusoidal E/N, float64 (Snyder ch. 30: sphere
    30-1/30-2 for the MODIS grid R=6371007.181, ellipsoid 30-8/30-9
    for ESRI:54008-style World Sinusoidal). Equal-area."""
    a, e2, _e = _sinu_ell(ell)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    dlon = _wrap_pi(np.radians(np.asarray(lon_deg, dtype=np.float64))
                    - np.radians(lon0))
    s = np.sin(lat)
    x = a * dlon * np.cos(lat) / np.sqrt(1.0 - e2 * s * s)
    return fe + x, fn + _merid_arc(lat, a, e2)


def sinusoidal_inverse(x, y, ell, lon0, fe, fn):
    """Sinusoidal E/N -> geographic lat/lon degrees."""
    a, e2, _e = _sinu_ell(ell)
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    lat = _lat_from_merid(y, a, e2)
    s = np.sin(lat)
    c = np.cos(lat)
    dlon = np.where(np.abs(c) < 1e-12, 0.0,
                    x * np.sqrt(1.0 - e2 * s * s)
                    / (a * np.maximum(np.abs(c), 1e-12)) * np.sign(c))
    lon = np.radians(lon0) + dlon
    return np.degrees(lat), np.degrees(_wrap_pi(lon))


def cea_forward(lat_deg, lon_deg, ell, lat_ts, lon0, fe, fn):
    """Geographic -> Lambert Cylindrical Equal Area E/N (EPSG method
    9835, Snyder 10-13/10-14): the EASE-Grid 2.0 global grid
    (EPSG:6933, WGS84, lat_ts 30)."""
    a, e2, e = _ell_consts(ell)
    st = np.sin(np.radians(lat_ts))
    k0 = np.cos(np.radians(lat_ts)) / np.sqrt(1.0 - e2 * st * st)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    dlon = _wrap_pi(np.radians(np.asarray(lon_deg, dtype=np.float64))
                    - np.radians(lon0))
    q = _q_authalic(lat, e, e2)
    return fe + a * k0 * dlon, fn + a * q / (2.0 * k0)


def cea_inverse(x, y, ell, lat_ts, lon0, fe, fn):
    """Lambert Cylindrical Equal Area E/N -> geographic degrees."""
    a, e2, e = _ell_consts(ell)
    st = np.sin(np.radians(lat_ts))
    k0 = np.cos(np.radians(lat_ts)) / np.sqrt(1.0 - e2 * st * st)
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    qp = _q_authalic(np.float64(np.pi / 2), e, e2)
    q = 2.0 * k0 * y / a
    lat = _phi_from_q(q, e, e2, qp)
    lon = np.radians(lon0) + x / (a * k0)
    return np.degrees(lat), np.degrees(_wrap_pi(lon))


# --------------------------------------------------------------------------
# Hotine Oblique Mercator (EPSG methods 9812 variant A / 9815 variant B
# "azimuth center") — the projection of the US State Plane Alaska
# zone 1, Malaysian RSO and Timbalai (Borneo) grids — and the Swiss
# Oblique Mercator / Rosenmund double projection (PROJ ``somerc``) used
# by CH1903 LV03 / CH1903+ LV95. The reference reaches all of these
# through OSR (any-SRS contract, dswx_hls.py:3385-3461). Formulas per
# EPSG Guidance Note 7-2 (verified against its Timbalai 1948 RSO Borneo
# worked example) and PROJ's somerc derivation (conformal
# sphere double projection), tests/test_crs_omerc.py.

def _isometric_lat(lat, e):
    """Isometric latitude psi(phi) (radians in, unitless out)."""
    esp = e * np.sin(lat)
    return (np.log(np.tan(np.pi / 4.0 + lat / 2.0))
            - (e / 2.0) * np.log((1.0 + esp) / (1.0 - esp)))


def _lat_from_isometric(psi, e):
    """Invert the isometric latitude by Newton iteration."""
    lat = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
    e2 = e * e
    for _ in range(8):
        sin_lat = np.sin(lat)
        f = _isometric_lat(lat, e) - psi
        dpsi = (1.0 - e2) / ((1.0 - e2 * sin_lat * sin_lat)
                             * np.cos(lat))
        lat = lat - f / dpsi
    return lat


def _omerc_consts(ell, latc, lonc, alpha, gamma, k0):
    a, e2, e = _ell_consts(ell)
    phic = np.radians(latc)
    alphac = np.radians(alpha)
    sin_c, cos_c = np.sin(phic), np.cos(phic)
    B = np.sqrt(1.0 + e2 * cos_c ** 4 / (1.0 - e2))
    A = a * B * k0 * np.sqrt(1.0 - e2) / (1.0 - e2 * sin_c * sin_c)
    t0 = np.tan(np.pi / 4.0 - phic / 2.0) / (
        (1.0 - e * sin_c) / (1.0 + e * sin_c)) ** (e / 2.0)
    D = B * np.sqrt(1.0 - e2) / (
        cos_c * np.sqrt(1.0 - e2 * sin_c * sin_c))
    D2 = max(D * D, 1.0)
    sign = 1.0 if latc >= 0 else -1.0
    F = D + np.sqrt(D2 - 1.0) * sign
    H = F * t0 ** B
    G = (F - 1.0 / F) / 2.0
    gamma0 = np.arcsin(np.sin(alphac) / D)
    lam0 = np.radians(lonc) - np.arcsin(
        np.clip(G * np.tan(gamma0), -1.0, 1.0)) / B
    if abs(abs(alpha) - 90.0) < 1e-9:
        raise ValueError(
            'Hotine oblique Mercator with azimuth 90 degrees is the '
            'Swiss oblique Mercator — use the somerc family')
    uc = (A / B) * np.arctan2(np.sqrt(D2 - 1.0),
                              np.cos(alphac)) * sign
    return A, B, e, H, gamma0, lam0, uc, sign


def omerc_forward(lat_deg, lon_deg, ell, latc, lonc, alpha, gamma,
                  k0, fe, fn, variant_b):
    """Hotine Oblique Mercator geographic degrees -> E/N (EPSG 9812
    variant A when ``variant_b`` is false, 9815 'azimuth center' when
    true; ``gamma`` is the rectified-grid angle)."""
    A, B, e, H, gamma0, lam0, uc, sign = _omerc_consts(
        ell, latc, lonc, alpha, gamma, k0)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    t = np.tan(np.pi / 4.0 - lat / 2.0) / (
        (1.0 - e * np.sin(lat)) / (1.0 + e * np.sin(lat))) ** (e / 2.0)
    Q = H / t ** B
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    dlam = _wrap_pi(lon - lam0)
    V = np.sin(B * dlam)
    U = (-V * np.cos(gamma0) + S * np.sin(gamma0)) / T
    v = A * np.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
    u = A * np.arctan2(S * np.cos(gamma0) + V * np.sin(gamma0),
                       np.cos(B * dlam)) / B
    if variant_b:
        u = u - abs(uc) * sign
    gam = np.radians(gamma)
    E = v * np.cos(gam) + u * np.sin(gam) + fe
    N = u * np.cos(gam) - v * np.sin(gam) + fn
    return E, N


def omerc_inverse(x, y, ell, latc, lonc, alpha, gamma, k0, fe, fn,
                  variant_b):
    """Hotine Oblique Mercator E/N -> geographic degrees."""
    A, B, e, H, gamma0, lam0, uc, sign = _omerc_consts(
        ell, latc, lonc, alpha, gamma, k0)
    gam = np.radians(gamma)
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    v = x * np.cos(gam) - y * np.sin(gam)
    u = y * np.cos(gam) + x * np.sin(gam)
    if variant_b:
        u = u + abs(uc) * sign
    Q = np.exp(-B * v / A)
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    V = np.sin(B * u / A)
    U = (V * np.cos(gamma0) + S * np.sin(gamma0)) / T
    t = (H / np.sqrt((1.0 + U) / (1.0 - U))) ** (1.0 / B)
    # invert t = tan(pi/4 - phi/2)/((1-e sin phi)/(1+e sin phi))^(e/2):
    # psi = -ln t is the isometric latitude
    lat = _lat_from_isometric(-np.log(t), e)
    lon = lam0 - np.arctan2(S * np.cos(gamma0) - V * np.sin(gamma0),
                            np.cos(B * u / A)) / B
    return np.degrees(lat), np.degrees(_wrap_pi(lon))


def _somerc_consts(ell, lat0, k0):
    a, e2, e = _ell_consts(ell)
    phi0 = np.radians(lat0)
    sp, cp = np.sin(phi0), np.cos(phi0)
    c = np.sqrt(1.0 + e2 * cp ** 4 / (1.0 - e2))
    sinp0 = sp / c
    phip0 = np.arcsin(sinp0)
    K = (np.log(np.tan(np.pi / 4.0 + phip0 / 2.0))
         - c * _isometric_lat(phi0, e))
    kR = k0 * a * np.sqrt(1.0 - e2) / (1.0 - e2 * sp * sp)
    return e, c, sinp0, np.cos(phip0), K, kR


def somerc_forward(lat_deg, lon_deg, ell, lat0, lon0, k0, fe, fn):
    """Swiss Oblique Mercator (Rosenmund double projection, PROJ
    ``somerc``; EPSG 9815 with azimuth 90 as the CH1903 grids use it):
    geographic degrees -> E/N."""
    e, c, sinp0, cosp0, K, kR = _somerc_consts(ell, lat0, k0)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = _wrap_pi(np.radians(np.asarray(lon_deg, dtype=np.float64))
                   - np.radians(lon0))
    phip = 2.0 * np.arctan(
        np.exp(c * _isometric_lat(lat, e) + K)) - np.pi / 2.0
    lamp = c * lon
    cp = np.cos(phip)
    phipp = np.arcsin(cosp0 * np.sin(phip)
                      - sinp0 * cp * np.cos(lamp))
    lampp = np.arcsin(np.clip(cp * np.sin(lamp) / np.cos(phipp),
                              -1.0, 1.0))
    E = kR * lampp + fe
    N = kR * np.log(np.tan(np.pi / 4.0 + phipp / 2.0)) + fn
    return E, N


def somerc_inverse(x, y, ell, lat0, lon0, k0, fe, fn):
    """Swiss Oblique Mercator E/N -> geographic degrees."""
    e, c, sinp0, cosp0, K, kR = _somerc_consts(ell, lat0, k0)
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    phipp = 2.0 * np.arctan(np.exp(y / kR)) - np.pi / 2.0
    lampp = x / kR
    cp = np.cos(phipp)
    phip = np.arcsin(cosp0 * np.sin(phipp)
                     + sinp0 * cp * np.cos(lampp))
    lamp = np.arcsin(np.clip(cp * np.sin(lampp) / np.cos(phip),
                             -1.0, 1.0))
    # invert phip = 2 atan(exp(c psi(phi) + K)) - pi/2
    psi = (np.log(np.tan(np.pi / 4.0 + phip / 2.0)) - K) / c
    lat = _lat_from_isometric(psi, e)
    lon = np.radians(lon0) + lamp / c
    return np.degrees(lat), np.degrees(_wrap_pi(lon))


# --------------------------------------------------------------------------
# Krovak (EPSG method 9819) — the S-JTSK oblique conformal conic of the
# Czech and Slovak national grids (EPSG:5514 Krovak East North, the CRS
# Czech DEM/landcover deliveries ship in). Formulas per EPSG Guidance
# Note 7-2; east-north axis convention (southing/westing negated), the
# way GDAL presents EPSG:5514 rasters.

def _krovak_consts(ell, latc, lonc, alphac, latp, k0):
    a, e2, e = _ell_consts(ell)
    phic = np.radians(latc)
    sin_c = np.sin(phic)
    A = a * np.sqrt(1.0 - e2) / (1.0 - e2 * sin_c * sin_c)
    B = np.sqrt(1.0 + e2 * np.cos(phic) ** 4 / (1.0 - e2))
    gamma0 = np.arcsin(sin_c / B)
    t0 = (np.tan(np.pi / 4.0 + gamma0 / 2.0)
          * ((1.0 + e * sin_c) / (1.0 - e * sin_c)) ** (e * B / 2.0)
          / np.tan(np.pi / 4.0 + phic / 2.0) ** B)
    phip = np.radians(latp)
    n = np.sin(phip)
    r0 = k0 * A / np.tan(phip)
    return e, A, B, gamma0, t0, n, r0, phip


def krovak_forward(lat_deg, lon_deg, ell, latc, lonc, alphac, latp,
                   k0, fe, fn):
    """Krovak geographic degrees -> E/N (east-north convention:
    E = -westing + fe, N = -southing + fn)."""
    e, _A, B, _g0, t0, n, r0, phip = _krovak_consts(
        ell, latc, lonc, alphac, latp, k0)
    ac = np.radians(alphac)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    esp = e * np.sin(lat)
    U = 2.0 * (np.arctan(
        t0 * np.tan(lat / 2.0 + np.pi / 4.0) ** B
        / ((1.0 + esp) / (1.0 - esp)) ** (e * B / 2.0)) - np.pi / 4.0)
    V = B * _wrap_pi(np.radians(lonc) - lon)
    T = np.arcsin(np.cos(ac) * np.sin(U)
                  + np.sin(ac) * np.cos(U) * np.cos(V))
    D = np.arcsin(np.clip(np.cos(U) * np.sin(V) / np.cos(T),
                          -1.0, 1.0))
    theta = n * D
    r = (r0 * np.tan(np.pi / 4.0 + phip / 2.0) ** n
         / np.tan(T / 2.0 + np.pi / 4.0) ** n)
    southing = r * np.cos(theta)
    westing = r * np.sin(theta)
    return -westing + fe, -southing + fn


def krovak_inverse(x, y, ell, latc, lonc, alphac, latp, k0, fe, fn):
    """Krovak E/N (east-north convention) -> geographic degrees."""
    e, _A, B, _g0, t0, n, r0, phip = _krovak_consts(
        ell, latc, lonc, alphac, latp, k0)
    ac = np.radians(alphac)
    westing = -(np.asarray(x, dtype=np.float64) - fe)
    southing = -(np.asarray(y, dtype=np.float64) - fn)
    r = np.hypot(southing, westing)
    theta = np.arctan2(westing, southing)
    D = theta / n
    T = 2.0 * (np.arctan(
        (r0 / r) ** (1.0 / n)
        * np.tan(np.pi / 4.0 + phip / 2.0)) - np.pi / 4.0)
    U = np.arcsin(np.cos(ac) * np.sin(T)
                  - np.sin(ac) * np.cos(T) * np.cos(D))
    V = np.arcsin(np.clip(np.cos(T) * np.sin(D) / np.cos(U),
                          -1.0, 1.0))
    # latitude from U by the EPSG fixed-point iteration
    lat = U
    for _ in range(10):
        esp = e * np.sin(lat)
        lat = 2.0 * (np.arctan(
            t0 ** (-1.0 / B)
            * np.tan(U / 2.0 + np.pi / 4.0) ** (1.0 / B)
            * ((1.0 + esp) / (1.0 - esp)) ** (e / 2.0)) - np.pi / 4.0)
    lon = np.radians(lonc) - V / B
    return np.degrees(lat), np.degrees(_wrap_pi(lon))


# --------------------------------------------------------------------------
# Oblique Stereographic (EPSG method 9809, PROJ ``sterea``) — the double
# projection (ellipsoid -> conformal sphere -> stereographic) of the
# Dutch RD New grid (EPSG:28992), the CRS Dutch DEM/ancillary deliveries
# ship in. Formulas per EPSG Guidance Note 7-2.

def _sterea_consts(ell, lat0):
    a, e2, e = _ell_consts(ell)
    phi0 = np.radians(lat0)
    s0 = np.sin(phi0)
    rho0 = a * (1.0 - e2) / (1.0 - e2 * s0 * s0) ** 1.5
    nu0 = a / np.sqrt(1.0 - e2 * s0 * s0)
    R = np.sqrt(rho0 * nu0)
    n = np.sqrt(1.0 + e2 * np.cos(phi0) ** 4 / (1.0 - e2))
    S1 = (1.0 + s0) / (1.0 - s0)
    S2 = (1.0 - e * s0) / (1.0 + e * s0)
    w1 = (S1 * S2 ** e) ** n
    sin_chi00 = (w1 - 1.0) / (w1 + 1.0)
    c = ((n + s0) * (1.0 - sin_chi00)
         / ((n - s0) * (1.0 + sin_chi00)))
    w2 = c * w1
    chi0 = np.arcsin((w2 - 1.0) / (w2 + 1.0))
    return e, n, c, R, chi0


def sterea_forward(lat_deg, lon_deg, ell, lat0, lon0, k0, fe, fn):
    """Oblique Stereographic geographic degrees -> E/N (EPSG 9809)."""
    e, n, c, R, chi0 = _sterea_consts(ell, lat0)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    dlam = n * _wrap_pi(np.radians(np.asarray(lon_deg,
                                              dtype=np.float64))
                        - np.radians(lon0))
    sp = np.sin(lat)
    Sa = (1.0 + sp) / (1.0 - sp)
    Sb = (1.0 - e * sp) / (1.0 + e * sp)
    w = c * (Sa * Sb ** e) ** n
    chi = np.arcsin((w - 1.0) / (w + 1.0))
    B = (1.0 + np.sin(chi) * np.sin(chi0)
         + np.cos(chi) * np.cos(chi0) * np.cos(dlam))
    E = fe + 2.0 * R * k0 * np.cos(chi) * np.sin(dlam) / B
    N = fn + 2.0 * R * k0 * (np.sin(chi) * np.cos(chi0)
                             - np.cos(chi) * np.sin(chi0)
                             * np.cos(dlam)) / B
    return E, N


def sterea_inverse(x, y, ell, lat0, lon0, k0, fe, fn):
    """Oblique Stereographic E/N -> geographic degrees (EPSG 9809)."""
    e, n, c, R, chi0 = _sterea_consts(ell, lat0)
    Ep = np.asarray(x, dtype=np.float64) - fe
    Np = np.asarray(y, dtype=np.float64) - fn
    g = 2.0 * R * k0 * np.tan(np.pi / 4.0 - chi0 / 2.0)
    h = 4.0 * R * k0 * np.tan(chi0) + g
    i = np.arctan2(Ep, h + Np)
    j = np.arctan2(Ep, g - Np) - i
    chi = chi0 + 2.0 * np.arctan(
        (Np - Ep * np.tan(j / 2.0)) / (2.0 * R * k0))
    dlam = j + 2.0 * i
    lon = np.radians(lon0) + dlam / n
    # conformal-sphere isometric latitude back to the geodetic latitude
    # by the EPSG fixed-point iteration
    psi = 0.5 * np.log((1.0 + np.sin(chi))
                       / (c * (1.0 - np.sin(chi)))) / n
    lat = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
    e2 = e * e
    for _ in range(10):
        esp = e * np.sin(lat)
        psi_i = np.log(np.tan(lat / 2.0 + np.pi / 4.0)
                       * ((1.0 - esp) / (1.0 + esp)) ** (e / 2.0))
        lat = lat - ((psi_i - psi) * np.cos(lat)
                     * (1.0 - esp * esp) / (1.0 - e2))
    return np.degrees(lat), np.degrees(_wrap_pi(lon))


# --------------------------------------------------------------------------
# Equidistant Cylindrical (EPSG method 1028, PROJ ``eqc``) — the
# projected plate carree of the global-raster grids EPSG:4087 (WGS 84 /
# World Equidistant Cylindrical) and the deprecated-but-circulating
# EPSG:32662. Ellipsoidal formulas per EPSG Guidance Note 7-2 (meridian
# arc northing), matching PROJ >= 7's ellipsoidal eqc.

def _eqc_nu1_cos(e2, lat_ts):
    """cos(lat_ts)/sqrt(1 - e2 sin^2 lat_ts), rejecting the degenerate
    standard parallel at the poles (where the cylinder's radius is 0 and
    the projection is undefined — match the ValueError contract of the
    other degenerate projection parameters)."""
    if abs(lat_ts) >= 90.0 - 1e-9:
        raise ValueError(
            f'equidistant cylindrical standard parallel lat_ts={lat_ts} '
            'is degenerate (|lat_ts| must be < 90 degrees)')
    phi1 = np.radians(lat_ts)
    return np.cos(phi1) / np.sqrt(1.0 - e2 * np.sin(phi1) ** 2)


def eqc_forward(lat_deg, lon_deg, ell, lat_ts, lat0, lon0, fe, fn):
    """Equidistant Cylindrical geographic degrees -> E/N (EPSG 1028)."""
    a, e2, _e = _ell_consts(ell)
    nu1_cos = _eqc_nu1_cos(e2, lat_ts)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    dlam = _wrap_pi(np.radians(np.asarray(lon_deg, dtype=np.float64))
                    - np.radians(lon0))
    E = fe + a * nu1_cos * dlam
    N = fn + _merid_arc(lat, a, e2) - _merid_arc(np.radians(lat0),
                                                 a, e2)
    return E, N


def eqc_inverse(x, y, ell, lat_ts, lat0, lon0, fe, fn):
    """Equidistant Cylindrical E/N -> geographic degrees (EPSG 1028)."""
    a, e2, _e = _ell_consts(ell)
    nu1_cos = _eqc_nu1_cos(e2, lat_ts)
    M = (np.asarray(y, dtype=np.float64) - fn
         + _merid_arc(np.radians(lat0), a, e2))
    lat = _lat_from_merid(M, a, e2)
    lon = (np.radians(lon0)
           + (np.asarray(x, dtype=np.float64) - fe) / (a * nu1_cos))
    return np.degrees(lat), np.degrees(_wrap_pi(lon))


def _towgs84_wkt(towgs84):
    """',TOWGS84[...]' fragment (empty for the null transformation)."""
    if _effective_shift(towgs84) is None and towgs84 is None:
        return ''
    body = ','.join(f'{float(v)!r}' for v in towgs84)
    return f',TOWGS84[{body}]'


def _custom_geogcs_wkt(ell, towgs84=None):
    tw = _towgs84_wkt(towgs84)
    if not isinstance(ell, str):    # sphere radius (sinusoidal/MODIS)
        return ('GEOGCS["unknown",DATUM["unknown",'
                f'SPHEROID["unknown",{float(ell)!r},0]{tw}],'
                'PRIMEM["Greenwich",0],'
                'UNIT["degree",0.0174532925199433]]')
    a, invf = _ELLIPSOIDS[ell]
    return ('GEOGCS["unknown",DATUM["unknown",'
            f'SPHEROID["unknown",{a:.10g},{invf:.12g}]{tw}],'
            'PRIMEM["Greenwich",0],'
            'UNIT["degree",0.0174532925199433]]')


def _unit_wkt(unit):
    name, lit = _UNIT_WKT_NAME.get(unit, ('unnamed', f'{unit:.17g}'))
    return f'UNIT["{name}",{lit}]'


def _custom_to_wkt(custom, unit=1.0, towgs84=None):
    fam = custom[0]
    if fam == 'geog':
        return _custom_geogcs_wkt(custom[1], towgs84)
    if fam == 'ps':
        lat_ts, lon0, fe, fn, north, k0, ell = custom[1:]
        params = [('latitude_of_origin',
                   lat_ts if lat_ts is not None
                   else (90.0 if north else -90.0)),
                  ('central_meridian', lon0)]
        if k0 is not None:
            params.append(('scale_factor', k0))
        params += [('false_easting', fe), ('false_northing', fn)]
        proj = 'Polar_Stereographic'
    else:
        ell = custom[1]
        if fam == 'tm':
            lat0, lon0, k0, fe, fn = custom[2:]
            proj = 'Transverse_Mercator'
            params = [('latitude_of_origin', lat0),
                      ('central_meridian', lon0),
                      ('scale_factor', k0),
                      ('false_easting', fe), ('false_northing', fn)]
        elif fam == 'aea':
            lat0, lon0, sp1, sp2, fe, fn = custom[2:]
            proj = 'Albers_Conic_Equal_Area'
            params = [('latitude_of_center', lat0),
                      ('longitude_of_center', lon0),
                      ('standard_parallel_1', sp1),
                      ('standard_parallel_2', sp2),
                      ('false_easting', fe), ('false_northing', fn)]
        elif fam == 'laea':
            lat0, lon0, fe, fn = custom[2:]
            proj = 'Lambert_Azimuthal_Equal_Area'
            params = [('latitude_of_center', lat0),
                      ('longitude_of_center', lon0),
                      ('false_easting', fe), ('false_northing', fn)]
        elif fam == 'sinu':
            lon0, fe, fn = custom[2:]
            proj = 'Sinusoidal'
            params = [('longitude_of_center', lon0),
                      ('false_easting', fe), ('false_northing', fn)]
        elif fam == 'cea':
            lat_ts, lon0, fe, fn = custom[2:]
            proj = 'Cylindrical_Equal_Area'
            params = [('standard_parallel_1', lat_ts),
                      ('central_meridian', lon0),
                      ('false_easting', fe), ('false_northing', fn)]
        elif fam == 'merc':
            lon0, k0, fe, fn = custom[2:]
            proj = 'Mercator_1SP'
            params = [('central_meridian', lon0),
                      ('scale_factor', k0),
                      ('false_easting', fe), ('false_northing', fn)]
        elif fam == 'omerc':
            latc, lonc, alpha, gamma, k0, fe, fn, vb = custom[2:]
            proj = ('Hotine_Oblique_Mercator_Azimuth_Center' if vb
                    else 'Hotine_Oblique_Mercator')
            params = [('latitude_of_center', latc),
                      ('longitude_of_center', lonc),
                      ('azimuth', alpha),
                      ('rectified_grid_angle', gamma),
                      ('scale_factor', k0),
                      ('false_easting', fe), ('false_northing', fn)]
        elif fam == 'somerc':
            lat0, lon0, k0, fe, fn = custom[2:]
            # GDAL encodes the Swiss oblique Mercator as Hotine
            # azimuth-center with azimuth = rectified grid angle = 90
            proj = 'Hotine_Oblique_Mercator_Azimuth_Center'
            params = [('latitude_of_center', lat0),
                      ('longitude_of_center', lon0),
                      ('azimuth', 90.0),
                      ('rectified_grid_angle', 90.0),
                      ('scale_factor', k0),
                      ('false_easting', fe), ('false_northing', fn)]
        elif fam == 'krovak':
            latc, lonc, alphac, latp, k0, fe, fn = custom[2:]
            proj = 'Krovak'
            params = [('latitude_of_center', latc),
                      ('longitude_of_center', lonc),
                      ('azimuth', alphac),
                      ('pseudo_standard_parallel_1', latp),
                      ('scale_factor', k0),
                      ('false_easting', fe), ('false_northing', fn)]
        elif fam == 'sterea':
            lat0, lon0, k0, fe, fn = custom[2:]
            proj = 'Oblique_Stereographic'
            params = [('latitude_of_origin', lat0),
                      ('central_meridian', lon0),
                      ('scale_factor', k0),
                      ('false_easting', fe), ('false_northing', fn)]
        elif fam == 'eqc':
            lat_ts, lat0, lon0, fe, fn = custom[2:]
            proj = 'Equirectangular'
            params = [('standard_parallel_1', lat_ts),
                      ('latitude_of_origin', lat0),
                      ('central_meridian', lon0),
                      ('false_easting', fe), ('false_northing', fn)]
        else:   # lcc
            lat0, lon0, sp1, sp2, fe, fn = custom[2:8]
            k0 = custom[8] if len(custom) > 8 else 1.0
            proj = 'Lambert_Conformal_Conic_2SP'
            params = [('latitude_of_origin', lat0),
                      ('central_meridian', lon0),
                      ('standard_parallel_1', sp1),
                      ('standard_parallel_2', sp2),
                      ('false_easting', fe), ('false_northing', fn)]
            if k0 != 1.0:
                params.insert(2, ('scale_factor', k0))
    # repr = shortest exact round-trip float text (PARAMETER values are
    # in the PROJCS's UNIT, e.g. feet for State Plane grids)
    body = ','.join(f'PARAMETER["{k}",{float(v)!r}]' for k, v in params)
    return (f'PROJCS["unnamed",{_custom_geogcs_wkt(ell, towgs84)},'
            f'PROJECTION["{proj}"],{body},{_unit_wkt(unit)}]')


def _unit_proj4(unit):
    if unit == 1.0:
        return '+units=m'
    if unit == _FOOT:
        return '+units=ft'
    if unit == _US_FOOT:
        return '+units=us-ft'
    return f'+to_meter={unit:.17g}'


def _custom_to_proj4(custom, unit=1.0, towgs84=None):
    p4 = _custom_to_proj4_base(custom, unit)
    if _effective_shift(towgs84) is not None or towgs84 is not None:
        tw = ','.join(f'{float(v):g}' for v in towgs84)
        p4 = p4.replace(' +no_defs', f' +towgs84={tw} +no_defs')
    return p4


def _custom_to_proj4_base(custom, unit=1.0):
    fam = custom[0]
    if unit != 1.0:
        # proj4 +x_0/+y_0 are always metres (PROJ's fr_meter applies
        # to proj+x_0); the tuple keeps them in native units
        c = list(custom)
        for i in _FEFN_IDX[fam]:
            c[i] = c[i] * unit
        custom = tuple(c)

    def ell_frag(ell):
        a, invf = _ELLIPSOIDS[ell]
        if ell in ('WGS84', 'GRS80'):
            return f'+ellps={ell}'
        name = _ELLPS_PROJ4_NAME.get(ell)
        if name:
            return f'+ellps={name}'
        return f'+a={a:.10g} +rf={invf:.12g}'

    un = _unit_proj4(unit)
    if fam == 'geog':
        return f'+proj=longlat {ell_frag(custom[1])} +no_defs'
    if fam == 'sinu':
        ell, lon0, fe, fn = custom[1:]
        ef = (f'+R={float(ell)!r}' if not isinstance(ell, str)
              else ell_frag(ell))
        return (f'+proj=sinu +lon_0={lon0!r} +x_0={fe!r} '
                f'+y_0={fn!r} {ef} {un} +no_defs')
    if fam == 'cea':
        ell, lat_ts, lon0, fe, fn = custom[1:]
        return (f'+proj=cea +lat_ts={lat_ts!r} +lon_0={lon0!r} '
                f'+x_0={fe!r} +y_0={fn!r} {ell_frag(ell)} {un} '
                '+no_defs')
    if fam == 'ps':
        lat_ts, lon0, fe, fn, north, k0, ell = custom[1:]
        lat0 = 90 if north else -90
        mid = (f'+k={k0!r}' if lat_ts is None
               else f'+lat_ts={lat_ts!r}')
        return (f'+proj=stere +lat_0={lat0} {mid} +lon_0={lon0!r} '
                f'+x_0={fe!r} +y_0={fn!r} {ell_frag(ell)} {un} '
                '+no_defs')
    ell = custom[1]
    if fam == 'tm':
        lat0, lon0, k0, fe, fn = custom[2:]
        return (f'+proj=tmerc +lat_0={lat0!r} +lon_0={lon0!r} '
                f'+k={k0!r} +x_0={fe!r} +y_0={fn!r} '
                f'{ell_frag(ell)} {un} +no_defs')
    if fam == 'aea':
        lat0, lon0, sp1, sp2, fe, fn = custom[2:]
        return (f'+proj=aea +lat_0={lat0!r} +lon_0={lon0!r} '
                f'+lat_1={sp1!r} +lat_2={sp2!r} +x_0={fe!r} '
                f'+y_0={fn!r} {ell_frag(ell)} {un} +no_defs')
    if fam == 'laea':
        lat0, lon0, fe, fn = custom[2:]
        return (f'+proj=laea +lat_0={lat0!r} +lon_0={lon0!r} '
                f'+x_0={fe!r} +y_0={fn!r} {ell_frag(ell)} {un} '
                '+no_defs')
    if fam == 'merc':
        lon0, k0, fe, fn = custom[2:]
        return (f'+proj=merc +lon_0={lon0!r} +k={k0!r} '
                f'+x_0={fe!r} +y_0={fn!r} {ell_frag(ell)} {un} '
                '+no_defs')
    if fam == 'omerc':
        latc, lonc, alpha, gamma, k0, fe, fn, vb = custom[2:]
        nu = '' if vb else '+no_uoff '   # PROJ: variant A flag
        return (f'+proj=omerc +lat_0={latc!r} +lonc={lonc!r} '
                f'+alpha={alpha!r} +gamma={gamma!r} +k_0={k0!r} '
                f'{nu}+x_0={fe!r} +y_0={fn!r} {ell_frag(ell)} {un} '
                '+no_defs')
    if fam == 'somerc':
        lat0, lon0, k0, fe, fn = custom[2:]
        return (f'+proj=somerc +lat_0={lat0!r} +lon_0={lon0!r} '
                f'+k_0={k0!r} +x_0={fe!r} +y_0={fn!r} '
                f'{ell_frag(ell)} {un} +no_defs')
    if fam == 'krovak':
        latc, lonc, alphac, latp, k0, fe, fn = custom[2:]
        # PROJ's krovak hardcodes the 78.5-deg pseudo standard
        # parallel; +alpha carries the cone azimuth
        return (f'+proj=krovak +lat_0={latc!r} +lon_0={lonc!r} '
                f'+alpha={alphac!r} +k={k0!r} +x_0={fe!r} '
                f'+y_0={fn!r} {ell_frag(ell)} {un} +no_defs')
    if fam == 'sterea':
        lat0, lon0, k0, fe, fn = custom[2:]
        return (f'+proj=sterea +lat_0={lat0!r} +lon_0={lon0!r} '
                f'+k={k0!r} +x_0={fe!r} +y_0={fn!r} '
                f'{ell_frag(ell)} {un} +no_defs')
    if fam == 'eqc':
        lat_ts, lat0, lon0, fe, fn = custom[2:]
        return (f'+proj=eqc +lat_ts={lat_ts!r} +lat_0={lat0!r} '
                f'+lon_0={lon0!r} +x_0={fe!r} +y_0={fn!r} '
                f'{ell_frag(ell)} {un} +no_defs')
    lat0, lon0, sp1, sp2, fe, fn = custom[2:8]
    k0 = custom[8] if len(custom) > 8 else 1.0
    kf = f' +k_0={k0!r}' if k0 != 1.0 else ''
    return (f'+proj=lcc +lat_0={lat0!r} +lon_0={lon0!r} '
            f'+lat_1={sp1!r} +lat_2={sp2!r}{kf} +x_0={fe!r} '
            f'+y_0={fn!r} {ell_frag(ell)} {un} +no_defs')


# user-defined projection families: family -> (forward fn, inverse fn).
# A custom CRS carries ``custom = (family, *args)`` where ``*args`` are
# exactly the function's parameters after (lat/x, lon/y):
#   ('tm',  ell, lat0, lon0, k0, fe, fn)
#   ('aea', ell, lat0, lon0, sp1, sp2, fe, fn)
#   ('laea', ell, lat0, lon0, fe, fn)
#   ('lcc', ell, lat0, lon0, sp1, sp2, fe, fn[, k0])
#   ('ps',  lat_ts|None, lon0, fe, fn, north, k0|None, ell)
#   ('merc', ell, lon0, k0, fe, fn)
#   ('sinu', ell|sphere_radius, lon0, fe, fn)    (MODIS grid)
#   ('cea', ell, lat_ts, lon0, fe, fn)           (EASE-Grid 2.0 style)
#   ('geog', ell)                                (geographic lat/lon on
#                                                 a classical ellipsoid;
#                                                 datum via towgs84)
#   ('omerc', ell, latc, lonc, alpha, gamma, k0, fe, fn, variant_b)
#   ('somerc', ell, lat0, lon0, k0, fe, fn)      (Swiss CH1903 grids)
#   ('krovak', ell, latc, lonc, alphac, latp, k0, fe, fn)  (S-JTSK,
#                                                 east-north axes)
#   ('sterea', ell, lat0, lon0, k0, fe, fn)      (Dutch RD New)
#   ('eqc', ell, lat_ts, lat0, lon0, fe, fn)     (world equidistant
#                                                 cylindrical)
_CUSTOM_FAMILIES = {
    'tm': None, 'aea': None, 'laea': None, 'lcc': None, 'ps': None,
    'merc': None, 'sinu': None, 'cea': None, 'geog': None,
    'omerc': None, 'somerc': None, 'krovak': None, 'sterea': None,
    'eqc': None,
}


_PROJ4_ELLPS = {
    'GRS80': 'GRS80', 'WGS84': 'WGS84',
    'airy': (6377563.396, 299.3249646),
    'clrk66': (6378206.4, 294.9786982139006),
    'intl': (6378388.0, 297.0),
    'krass': (6378245.0, 298.3),
    'bessel': (6377397.155, 299.1528128),
    'evrstSS': (6377298.556, 300.8017),   # Everest 1830 (1967 Def.)
}
# registry ellipsoid -> canonical +ellps name (values match
# _PROJ4_ELLPS so the pair round-trips through _ensure_ellipsoid)
_ELLPS_PROJ4_NAME = {'AIRY1830': 'airy', 'BESSEL1841': 'bessel',
                     'CLARKE1866': 'clrk66', 'INTL1924': 'intl',
                     'KRASS1940': 'krass', 'EVEREST1967': 'evrstSS'}


def _proj4_ellipsoid(proj4):
    """Ellipsoid registry name for a proj4 string (datum/ellps/a+rf/
    a+b). Spheres (+a == +b, e.g. EASE-Grid v1 / authalic grids) raise
    — the engine is ellipsoidal-only."""
    if '+datum=NAD83' in proj4 or '+datum=ETRS89' in proj4 \
            or '+ellps=GRS80' in proj4:
        return 'GRS80'
    if '+datum=WGS84' in proj4 or '+ellps=WGS84' in proj4:
        return 'WGS84'
    ma = re.search(rf'\+a={_NUM_RE}', proj4)
    mr = re.search(rf'\+rf={_NUM_RE}', proj4)
    mb = re.search(rf'\+b={_NUM_RE}', proj4)
    if ma and mr:
        return _ensure_ellipsoid(float(ma.group(1)),
                                 float(mr.group(1)))
    if ma and mb:
        a, b = float(ma.group(1)), float(mb.group(1))
        if a == b:
            raise ValueError(
                f'spherical ellipsoid (+a == +b) not supported: {proj4}')
        return _ensure_ellipsoid(a, a / (a - b))
    if ma and not mb and not mr:
        raise ValueError(
            f'+a without +b/+rf (sphere?) not supported: {proj4}')
    m = re.search(r'\+ellps=(\w+)', proj4)
    if m:
        v = _PROJ4_ELLPS.get(m.group(1))
        if v is None:
            raise ValueError(
                f'unknown proj4 ellipsoid +ellps={m.group(1)}')
        return v if isinstance(v, str) else _ensure_ellipsoid(*v)
    return 'WGS84'


def _custom_forward(lat, lon, custom):
    fam = custom[0]
    if fam == 'geog':   # geographic: (x, y) = (lon, lat) degrees
        return (np.asarray(lon, dtype=np.float64),
                np.asarray(lat, dtype=np.float64))
    fwd = {'tm': tm_forward_general, 'aea': albers_forward,
           'laea': laea_forward, 'lcc': lcc_forward,
           'ps': polar_stereo_forward, 'merc': mercator_forward,
           'sinu': sinusoidal_forward, 'cea': cea_forward,
           'omerc': omerc_forward, 'somerc': somerc_forward,
           'krovak': krovak_forward, 'sterea': sterea_forward,
           'eqc': eqc_forward}[fam]
    return fwd(lat, lon, *custom[1:])


def _custom_inverse(x, y, custom):
    fam = custom[0]
    if fam == 'geog':
        return (np.asarray(y, dtype=np.float64),
                np.asarray(x, dtype=np.float64))
    inv = {'tm': tm_inverse_general, 'aea': albers_inverse,
           'laea': laea_inverse, 'lcc': lcc_inverse,
           'ps': polar_stereo_inverse, 'merc': mercator_inverse,
           'sinu': sinusoidal_inverse, 'cea': cea_inverse,
           'omerc': omerc_inverse, 'somerc': somerc_inverse,
           'krovak': krovak_inverse, 'sterea': sterea_inverse,
           'eqc': eqc_inverse}[fam]
    return inv(x, y, *custom[1:])


# index of (false_easting, false_northing) inside each family's custom
# tuple — the only parameters expressed in the CRS's linear unit
_FEFN_IDX = {'tm': (5, 6), 'aea': (6, 7), 'laea': (4, 5),
             'lcc': (6, 7), 'ps': (3, 4), 'merc': (4, 5),
             'sinu': (3, 4), 'cea': (4, 5), 'geog': (),
             'omerc': (7, 8), 'somerc': (5, 6), 'krovak': (7, 8),
             'sterea': (5, 6), 'eqc': (5, 6)}


# registry projected CRS on classical datums, expressed as family
# tuples (same encoding as CRS.custom) + the _EPSG_TOWGS84 datum shift.
# Grids a legacy DEM/ancillary raster realistically ships in.
_GENERAL = {
    # OSGB36 / British National Grid (EPSG 27700): TM on Airy 1830
    27700: ('tm', 'AIRY1830', 49.0, -2.0, 0.9996012717,
            400000.0, -100000.0),
    # Timbalai 1948 / RSO Borneo (m) (EPSG 29873): Hotine Oblique
    # Mercator variant B (9815) — the EPSG GN7-2 worked example grid
    29873: ('omerc', 'EVEREST1967', 4.0, 115.0,
            53.0 + 18.0 / 60 + 56.9537 / 3600,     # azimuth
            53.0 + 7.0 / 60 + 48.3685 / 3600,      # rectified grid
            0.99984, 590476.87, 442857.65, True),
    # NAD83 / Alaska zone 1 (EPSG 26931): Hotine variant A (9812,
    # false coordinates at the natural origin — PROJ +no_uoff)
    26931: ('omerc', 'GRS80', 57.0, -(133.0 + 40.0 / 60),
            -(36.0 + 52.0 / 60 + 11.6315 / 3600),
            -(36.0 + 52.0 / 60 + 11.6315 / 3600),
            0.9999, 5000000.0, -5000000.0, False),
    # CH1903 / LV03 (EPSG 21781) + CH1903+ / LV95 (EPSG 2056): Swiss
    # Oblique Mercator (EPSG 9815 with azimuth 90 = PROJ somerc)
    21781: ('somerc', 'BESSEL1841',
            46.0 + 57.0 / 60 + 8.66 / 3600,
            7.0 + 26.0 / 60 + 22.50 / 3600,
            1.0, 600000.0, 200000.0),
    2056: ('somerc', 'BESSEL1841',
           46.0 + 57.0 / 60 + 8.66 / 3600,
           7.0 + 26.0 / 60 + 22.50 / 3600,
           1.0, 2600000.0, 1200000.0),
    # S-JTSK / Krovak East North (EPSG 5514): the Czech/Slovak grid,
    # east-north axes (southing/westing negated) as GDAL presents it.
    # EPSG GN7-2 worked example reproduced to cm.
    5514: ('krovak', 'BESSEL1841', 49.5, 24.0 + 50.0 / 60,
           30.0 + 17.0 / 60 + 17.3031 / 3600, 78.5, 0.9999,
           0.0, 0.0),
    # Amersfoort / RD New (EPSG 28992): Oblique (double) Stereographic
    # on Bessel 1841 — the Dutch national grid (EPSG GN7-2 worked
    # example reproduced to mm in tests)
    28992: ('sterea', 'BESSEL1841',
            52.0 + 9.0 / 60 + 22.178 / 3600,
            5.0 + 23.0 / 60 + 15.5 / 3600,
            0.9999079, 155000.0, 463000.0),
    # NZGD2000 / New Zealand Transverse Mercator (EPSG 2193): plain TM
    # on GRS80 (null datum shift, NZGD2000 ~ WGS84)
    2193: ('tm', 'GRS80', 0.0, 173.0, 0.9996, 1600000.0, 10000000.0),
    # WGS 84 / World Equidistant Cylindrical (EPSG 4087) and the
    # deprecated Plate Carree code (EPSG 32662) global grids
    4087: ('eqc', 'WGS84', 0.0, 0.0, 0.0, 0.0, 0.0),
    # deprecated alias of 4087 (identical grid). Parameter-based
    # identification deliberately resolves the shared tuple to
    # non-deprecated 4087 (first dict match), so authority-free
    # WKT/proj4 sourced from 32662 round-trips as 4087; WKT carrying
    # an EPSG AUTHORITY and the GeoTIFF geokey path preserve the
    # original code.
    32662: ('eqc', 'WGS84', 0.0, 0.0, 0.0, 0.0, 0.0),
}
# Pulkovo 1942 / Gauss-Krueger 6-degree zones 2-32 (EPSG 28402-28432):
# TM k0=1 on Krassowsky 1940, FE = zone*1e6 + 500000 (zoned easting)
for _z in range(2, 33):
    _GENERAL[28400 + _z] = ('tm', 'KRASS1940', 0.0, 6.0 * _z - 3.0,
                            1.0, _z * 1e6 + 500000.0, 0.0)

# geographic CRS of the classical datums (lat/lon degrees)
_GEOGRAPHIC_ELL = {
    4326: 'WGS84', 4269: 'GRS80', 4258: 'GRS80',
    4277: 'AIRY1830',      # OSGB36
    4230: 'INTL1924',      # ED50
    4267: 'CLARKE1866',    # NAD27
    4301: 'BESSEL1841',    # Tokyo
    4284: 'KRASS1940',     # Pulkovo 1942
    4149: 'BESSEL1841',    # CH1903
    4150: 'BESSEL1841',    # CH1903+
    4156: 'BESSEL1841',    # S-JTSK
    4289: 'BESSEL1841',    # Amersfoort
    4167: 'GRS80',         # NZGD2000
}

# datum shift to WGS84 per EPSG code (see _SHIFT_* for the EPSG
# transformation each value cites). NAD83/ETRS89/GDA94 datums stay on
# the null transformation (true offsets 1-2 m, below the 30 m grid).
_EPSG_TOWGS84 = {
    27700: _SHIFT_OSGB36, 4277: _SHIFT_OSGB36,
    4230: _SHIFT_ED50,
    4267: _SHIFT_NAD27,
    4301: _SHIFT_TOKYO,
    4284: _SHIFT_PULKOVO42,
    4149: _SHIFT_CH1903, 21781: _SHIFT_CH1903,
    4150: _SHIFT_CH1903P, 2056: _SHIFT_CH1903P,
    29873: _SHIFT_TIMBALAI,
    5514: _SHIFT_SJTSK, 4156: _SHIFT_SJTSK,
    28992: _SHIFT_AMERSFOORT, 4289: _SHIFT_AMERSFOORT,
}
for _z in range(28, 39):    # ED50 / UTM zones 28-38 (EPSG 23028-23038)
    _EPSG_TOWGS84[23000 + _z] = _SHIFT_ED50
for _z in range(3, 23):     # NAD27 / UTM zones 3-22 (EPSG 26703-26722)
    _EPSG_TOWGS84[26700 + _z] = _SHIFT_NAD27
for _z in range(2, 33):     # Pulkovo 1942 / Gauss-Krueger zones
    _EPSG_TOWGS84[28400 + _z] = _SHIFT_PULKOVO42


@dataclasses.dataclass(frozen=True)
class CRS:
    epsg: int
    # user-defined projection (GeoTIFF PCS 32767 / authority-free WKT):
    # (family, *params) per _CUSTOM_FAMILIES; None for registry CRS
    custom: tuple = None
    # metres per linear unit of the projected coordinates (1.0 = metre;
    # 0.3048 / 1200/3937 for foot-based State Plane style grids). The
    # custom tuple keeps fe/fn in NATIVE units so serialization
    # round-trips exactly; transform_points converts via metric_custom.
    unit: float = 1.0
    # explicit datum shift to WGS84 (7-tuple, TOWGS84 convention) parsed
    # from WKT TOWGS84[] / proj4 +towgs84= / geokey 2062; None = use the
    # _EPSG_TOWGS84 registry default (or the null transformation). An
    # all-zero tuple is the EXPLICIT null transformation and overrides
    # the registry.
    towgs84: tuple = None

    @property
    def datum_shift(self):
        """The 7-parameter shift to WGS84 this CRS's datum carries
        (None = null transformation / WGS84-equivalent datum)."""
        if self.towgs84 is not None:
            return self.towgs84
        return _EPSG_TOWGS84.get(self.epsg)

    @property
    def datum_ellipsoid(self):
        """Ellipsoid of the DATUM (for geocentric conversion). Equals
        the projection ellipsoid; custom CRS carry it in the tuple."""
        if self.custom is not None:
            fam = self.custom[0]
            return self.custom[-1] if fam == 'ps' else self.custom[1]
        return self.ellipsoid

    @property
    def metric_custom(self):
        """The custom tuple with false easting/northing converted to
        metres (identity for metre-based CRS)."""
        if self.custom is None or self.unit == 1.0:
            return self.custom
        c = list(self.custom)
        for i in _FEFN_IDX[c[0]]:
            c[i] = c[i] * self.unit
        return tuple(c)

    @classmethod
    def from_epsg(cls, epsg):
        return cls(int(epsg))

    @property
    def is_geographic(self):
        """Geographic (lat/lon degree) CRS. NAD83 (4269) and ETRS89
        (4258) coordinates are taken as WGS84 (the null datum
        transformation OSR applies without datum grids; ~1-2 m true
        offset, far below the 30 m pixel grid); the classical datums
        (OSGB36/ED50/NAD27/Tokyo/Pulkovo/CH1903) carry their
        _EPSG_TOWGS84 Helmert shifts."""
        return (self.epsg in _GEOGRAPHIC_ELL
                or (self.custom is not None
                    and self.custom[0] == 'geog'))

    @property
    def utm(self):
        """(zone, is_north) for UTM CRS, else None."""
        if 32601 <= self.epsg <= 32660:
            return self.epsg - 32600, True
        if 32701 <= self.epsg <= 32760:
            return self.epsg - 32700, False
        if 26901 <= self.epsg <= 26923:   # NAD83 UTM (north only)
            return self.epsg - 26900, True
        if 25828 <= self.epsg <= 25838:   # ETRS89 UTM (north only)
            return self.epsg - 25800, True
        if 23028 <= self.epsg <= 23038:   # ED50 UTM (Intl 1924)
            return self.epsg - 23000, True
        if 26703 <= self.epsg <= 26722:   # NAD27 UTM (Clarke 1866)
            return self.epsg - 26700, True
        return None

    @property
    def ellipsoid(self):
        """Ellipsoid name for the projection math."""
        if (26901 <= self.epsg <= 26923
                or 25828 <= self.epsg <= 25838):
            return 'GRS80'
        if 23028 <= self.epsg <= 23038:
            return 'INTL1924'
        if 26703 <= self.epsg <= 26722:
            return 'CLARKE1866'
        g = _GENERAL.get(self.epsg)
        if g is not None:
            return g[-1] if g[0] == 'ps' else g[1]
        return _GEOGRAPHIC_ELL.get(self.epsg, 'WGS84')

    @property
    def general(self):
        """Family tuple (CRS.custom encoding) for registry projected
        CRS outside the zoned/per-family tables (e.g. British National
        Grid, Pulkovo Gauss-Krueger), else None."""
        return _GENERAL.get(self.epsg)

    @classmethod
    def from_utm(cls, zone, north):
        return cls((32600 if north else 32700) + int(zone))

    @classmethod
    def from_geokeys(cls, keys):
        """Build a CRS from a parsed GeoTIFF GeoKeyDirectory dict —
        including USER-DEFINED projected CS (ProjectedCSTypeGeoKey
        32767 + projection parameter geokeys), the way GDAL encodes a
        non-EPSG SRS it was handed (reference accepts any OSR SRS,
        dswx_hls.py:3385-3461)."""
        pcs = keys.get(3072)
        if pcs and pcs != 32767:
            return cls(int(pcs))
        gcs = keys.get(2048)
        if keys.get(1024) == 2:   # geographic model
            if gcs and gcs != 32767:
                return cls(int(gcs))
            raise ValueError(
                'user-defined geographic CRS without an EPSG code')
        if pcs != 32767:
            raise ValueError('geokeys carry no projected/geographic CS')
        units = keys.get(3076, 9001)
        if units == 32767:      # user-defined: size geokey (metres)
            size = keys.get(3077)
            if size is None:
                raise ValueError(
                    'user-defined linear units (3076=32767) without '
                    'ProjLinearUnitSizeGeoKey (3077)')
            unit = _snap_unit(size)
        elif units in _UNIT_GEOKEY:
            unit = _UNIT_GEOKEY[units]
        else:
            raise ValueError(
                f'unsupported projected linear units geokey {units} '
                '(metre/foot/US survey foot or user-defined size)')
        ct = keys.get(3075)
        if gcs in _GEOGCS_ELL:
            ell = _GEOGCS_ELL[gcs]
        else:
            a = keys.get(2057)
            invf = keys.get(2059)
            if invf is None and keys.get(2058) is not None:
                b = float(keys[2058])    # semi-minor instead of 1/f
                invf = 0.0 if a == b else a / (a - b)
            if a is None or invf is None:
                raise ValueError(
                    'user-defined CRS without a known geographic CS or '
                    'ellipsoid geokeys (2057/2059)')
            if ct == 24 and float(invf) == 0.0:
                ell = float(a)    # MODIS-style authalic sphere
            else:
                ell = _ensure_ellipsoid(a, invf)

        def g(key, default=0.0):
            v = keys.get(key, default)
            return None if v is None else float(v)
        lat0 = g(3081)
        lon0 = g(3080)
        sp1 = g(3078)
        sp2 = g(3079, sp1)
        fe = g(3082)
        fn = g(3083)
        k0 = g(3092, 1.0)
        if ct == 1:     # CT_TransverseMercator
            custom = ('tm', ell, lat0, lon0, k0, fe, fn)
        elif ct == 11:  # CT_AlbersEqualArea
            custom = ('aea', ell, lat0, lon0, sp1, sp2, fe, fn)
        elif ct == 10:  # CT_LambertAzimEqualArea
            custom = ('laea', ell, lat0, lon0, fe, fn)
        elif ct == 8:   # CT_LambertConfConic_2SP (k0 when written)
            custom = ('lcc', ell, lat0, lon0, sp1, sp2, fe, fn)
            if 3092 in keys and k0 != 1.0:
                custom = custom + (k0,)
        elif ct == 9:   # CT_LambertConfConic_1SP
            custom = ('lcc', ell, lat0, lon0, lat0, lat0, fe, fn)
            if k0 != 1.0:
                custom = custom + (k0,)
        elif ct == 15:  # CT_PolarStereographic
            lonp = g(3095, lon0)
            if abs(lat0) >= 89.999:       # variant A: scale at pole
                custom = ('ps', None, lonp, fe, fn, lat0 > 0, k0, ell)
            else:                         # variant B: std parallel
                custom = ('ps', lat0, lonp, fe, fn, lat0 > 0, None,
                          ell)
        elif ct == 7:   # CT_Mercator (variant B folded into k0)
            if 3078 in keys:
                k0 = _merc_k0_from_lat_ts(sp1, ell)
            custom = ('merc', ell, lon0, k0, fe, fn)
        elif ct == 24:  # CT_Sinusoidal (GDAL: ProjCenterLong 3088)
            custom = ('sinu', ell, g(3088, lon0), fe, fn)
        elif ct == 28:  # CT_CylindricalEqualArea
            custom = ('cea', ell, sp1, lon0, fe, fn)
        elif ct == 3:   # CT_ObliqueMercator (Hotine)
            latc, lonc = g(3089), g(3088)
            az = g(3094, 90.0)
            rga = g(3096, az)      # ProjRectifiedGridAngleGeoKey
            kc = g(3093, 1.0)      # ProjScaleAtCenterGeoKey
            # center easting/northing keys (3090/3091) mark the
            # azimuth-center variant (false coords at the projection
            # center); 3082/3083 the natural-origin variant A
            if 3090 in keys or 3091 in keys:
                fe, fn, vb = g(3090), g(3091), True
            else:
                vb = False
            if abs(az - 90.0) < 1e-9 and abs(rga - 90.0) < 1e-9:
                custom = ('somerc', ell, latc, lonc, kc, fe, fn)
            else:
                custom = ('omerc', ell, latc, lonc, az, rga, kc,
                          fe, fn, vb)
        elif ct == 5:   # CT_ObliqueMercator_Rosenmund (Swiss)
            custom = ('somerc', ell, g(3089), g(3088), g(3093, 1.0),
                      fe, fn)
        elif ct == 16:  # CT_ObliqueStereographic (double stereographic)
            custom = ('sterea', ell, lat0, lon0, k0, fe, fn)
        elif ct == 17:  # CT_Equirectangular (GDAL: center keys + sp1)
            custom = ('eqc', ell, g(3078, 0.0), g(3089, lat0),
                      g(3088, lon0), fe, fn)
        else:
            raise ValueError(
                f'unsupported user-defined projection method '
                f'(ProjCoordTransGeoKey {ct})')
        # datum shift: explicit GeogTOWGS84GeoKey (2062, GeoTIFF 1.1)
        # wins; else the base GCS's registry shift (e.g. a custom TM
        # on an OSGB36 GCS inherits the OSGB36 Helmert parameters)
        towgs84 = None
        if 2062 in keys:
            raw = keys[2062]
            towgs84 = _norm_towgs84(
                raw if isinstance(raw, tuple) else (raw,))
        elif gcs in _EPSG_TOWGS84:
            towgs84 = _EPSG_TOWGS84[gcs]
        return cls(32767, custom, unit, towgs84)

    @property
    def polar_stereo(self):
        """(lat_ts, lon0, fe, fn, north[, k0]) for polar stereographic
        CRS (k0 present only for the variant-A UPS grids)."""
        return _POLAR_STEREO.get(self.epsg)

    @property
    def albers(self):
        """(ell, lat0, lon0, sp1, sp2, fe, fn) for Albers Equal Area
        Conic grids."""
        return _ALBERS.get(self.epsg)

    @property
    def laea(self):
        """(ell, lat0, lon0, fe, fn) for Lambert Azimuthal Equal Area
        grids."""
        return _LAEA.get(self.epsg)

    @property
    def lcc(self):
        """(ell, lat0, lon0, sp1, sp2, fe, fn) for Lambert Conformal
        Conic (2SP) grids."""
        return _LCC.get(self.epsg)

    @property
    def mercator(self):
        """(ell, lon0, k0, fe, fn) for ellipsoidal Mercator grids."""
        return _MERC.get(self.epsg)

    @property
    def is_web_mercator(self):
        """EPSG:3857 (spherical 'popular visualisation' Mercator)."""
        return self.epsg == WEB_MERCATOR_EPSG

    @property
    def cea(self):
        """(ell, lat_ts, lon0, fe, fn) for Lambert Cylindrical Equal
        Area grids (EASE-Grid 2.0)."""
        return _CEA.get(self.epsg)

    @property
    def supported(self):
        """True if this CRS can be transformed by this engine."""
        return (self.custom is not None or self.is_geographic
                or self.utm is not None
                or self.polar_stereo is not None
                or self.albers is not None or self.laea is not None
                or self.lcc is not None or self.mercator is not None
                or self.is_web_mercator or self.cea is not None
                or self.general is not None)

    def _authority_wkt(self, body):
        """Append the EPSG authority so from_wkt round-trips to the
        registry code."""
        return body[:-1] + f',AUTHORITY["EPSG","{self.epsg}"]]'

    def to_wkt(self):
        if self.custom is not None:
            return _custom_to_wkt(self.custom, self.unit, self.towgs84)
        general = self.general
        if general is not None:
            return self._authority_wkt(
                _custom_to_wkt(general, self.unit, self.datum_shift))
        if self.epsg in _GEOGRAPHIC_ELL and self.epsg not in (
                4326, 4269, 4258):
            return self._authority_wkt(_custom_geogcs_wkt(
                self.ellipsoid, self.datum_shift))
        utm = self.utm
        if utm is not None:
            zone, north = utm
            if self.ellipsoid in ('INTL1924', 'CLARKE1866'):
                # ED50 / NAD27 UTM: emit the equivalent TM PROJCS with
                # the datum's TOWGS84 + the EPSG authority
                tm = ('tm', self.ellipsoid, 0.0, zone * 6.0 - 183.0,
                      0.9996, 500000.0, 0.0)
                return self._authority_wkt(
                    _custom_to_wkt(tm, self.unit, self.datum_shift))
            if self.ellipsoid == 'GRS80':
                nad = 26901 <= self.epsg <= 26923
                return _WKT_UTM_GRS80_TEMPLATE.format(
                    datum_name='NAD83' if nad else 'ETRS89',
                    datum_wkt=('North_American_Datum_1983' if nad
                               else 'European_Terrestrial_Reference_'
                                    'System_1989'),
                    datum_auth=6269 if nad else 6258,
                    geogcs_auth=4269 if nad else 4258,
                    zone=zone, lon0=zone * 6 - 183, epsg=self.epsg)
            return _WKT_UTM_TEMPLATE.format(
                zone=zone, ns='N' if north else 'S',
                lon0=zone * 6 - 183, fn=0 if north else 10000000,
                epsg=self.epsg)
        ps = self.polar_stereo
        if ps is not None:
            lat_ts, lon0, fe, fn, north = ps[:5]
            if len(ps) > 5:   # UPS variant A: scale factor at the pole
                return _WKT_UPS_TEMPLATE.format(
                    ns='North' if north else 'South',
                    lat0=90 if north else -90, k0=ps[5], fe=fe, fn=fn,
                    epsg=self.epsg)
            return _WKT_PS_TEMPLATE.format(
                name=_PS_NAMES[self.epsg], lat_ts=lat_ts, lon0=lon0,
                fe=fe, fn=fn, epsg=self.epsg)
        aea = self.albers
        if aea is not None:
            _, lat0, lon0, sp1, sp2, fe, fn = aea
            name, geogcs = _GRID_NAME_GEOGCS[self.epsg]
            return _WKT_ALBERS_TEMPLATE.format(
                name=name, geogcs=geogcs, lat0=lat0, lon0=lon0,
                sp1=sp1, sp2=sp2, fe=fe, fn=fn, epsg=self.epsg)
        laea = self.laea
        if laea is not None:
            _, lat0, lon0, fe, fn = laea
            name, geogcs = _GRID_NAME_GEOGCS[self.epsg]
            return _WKT_LAEA_TEMPLATE.format(
                name=name, geogcs=geogcs, lat0=lat0, lon0=lon0,
                fe=fe, fn=fn, epsg=self.epsg)
        lcc = self.lcc
        if lcc is not None:
            _, lat0, lon0, sp1, sp2, fe, fn = lcc
            name, geogcs = _GRID_NAME_GEOGCS[self.epsg]
            return _WKT_LCC_TEMPLATE.format(
                name=name, geogcs=geogcs, lat0=lat0, lon0=lon0,
                sp1=sp1, sp2=sp2, fe=fe, fn=fn, epsg=self.epsg)
        merc = self.mercator
        if merc is not None:
            _, lon0, k0, fe, fn = merc
            return _WKT_MERC_TEMPLATE.format(
                name='WGS 84 / World Mercator',
                geogcs=_GEOGCS_WGS84_FRAG, lon0=lon0, k0=k0, fe=fe,
                fn=fn, epsg=self.epsg)
        cea = self.cea
        if cea is not None:
            _, lat_ts, lon0, fe, fn = cea
            return _WKT_CEA_TEMPLATE.format(
                name='WGS 84 / NSIDC EASE-Grid 2.0 Global',
                geogcs=_GEOGCS_WGS84_FRAG, lat_ts=lat_ts, lon0=lon0,
                fe=fe, fn=fn, epsg=self.epsg)
        if self.is_web_mercator:
            return _WKT_MERC_TEMPLATE.format(
                name='WGS 84 / Pseudo-Mercator',
                geogcs=_GEOGCS_WGS84_FRAG, lon0=0.0, k0=1.0, fe=0.0,
                fn=0.0, epsg=self.epsg)
        if self.epsg == 4326:
            return _WKT_WGS84
        if self.is_geographic:
            nad = self.epsg == 4269
            return _WKT_GEO_GRS80_TEMPLATE.format(
                datum_name='NAD83' if nad else 'ETRS89',
                datum_wkt=('North_American_Datum_1983' if nad
                           else 'European_Terrestrial_Reference_'
                                'System_1989'),
                datum_auth=6269 if nad else 6258, epsg=self.epsg)
        raise ValueError(f'cannot build WKT for EPSG:{self.epsg}')

    def to_proj4(self):
        if self.custom is not None:
            return _custom_to_proj4(self.custom, self.unit,
                                    self.towgs84)
        general = self.general
        if general is not None:
            return _custom_to_proj4(general, self.unit,
                                    self.datum_shift)
        if self.epsg in _GEOGRAPHIC_ELL and self.epsg not in (
                4326, 4269, 4258):
            return _custom_to_proj4(('geog', self.ellipsoid), 1.0,
                                    self.datum_shift)
        utm = self.utm
        if utm is not None:
            zone, north = utm
            south = '' if north else ' +south'
            if self.ellipsoid in ('INTL1924', 'CLARKE1866'):
                ellps = _ELLPS_PROJ4_NAME[self.ellipsoid]
                tw = ','.join(f'{float(v):g}'
                              for v in self.datum_shift)
                return (f'+proj=utm +zone={zone}{south} '
                        f'+ellps={ellps} +towgs84={tw} +units=m '
                        '+no_defs')
            if self.ellipsoid == 'GRS80':
                datum = ('NAD83' if 26901 <= self.epsg <= 26923
                         else 'ETRS89')
                return (f'+proj=utm +zone={zone}{south} +datum={datum} '
                        '+units=m +no_defs')
            return (f'+proj=utm +zone={zone}{south} +datum=WGS84 '
                    '+units=m +no_defs')
        ps = self.polar_stereo
        if ps is not None:
            lat_ts, lon0, fe, fn, north = ps[:5]
            if len(ps) > 5:
                return (f'+proj=stere +lat_0={"90" if north else "-90"} '
                        f'+k={ps[5]:g} +lon_0={lon0:g} +x_0={fe:g} '
                        f'+y_0={fn:g} +datum=WGS84 +units=m +no_defs')
            return (f'+proj=stere +lat_0={"90" if north else "-90"} '
                    f'+lat_ts={lat_ts:g} +lon_0={lon0:g} +x_0={fe:g} '
                    f'+y_0={fn:g} +datum=WGS84 +units=m +no_defs')
        aea = self.albers
        if aea is not None:
            _, lat0, lon0, sp1, sp2, fe, fn = aea
            datum = ('+datum=NAD83' if self.epsg == 5070
                     else '+ellps=GRS80 +towgs84=0,0,0,0,0,0,0')
            return (f'+proj=aea +lat_0={lat0:g} +lon_0={lon0:g} '
                    f'+lat_1={sp1:g} +lat_2={sp2:g} +x_0={fe:g} '
                    f'+y_0={fn:g} {datum} +units=m +no_defs')
        laea = self.laea
        if laea is not None:
            ell, lat0, lon0, fe, fn = laea
            datum = ('+datum=WGS84' if ell == 'WGS84'
                     else '+ellps=GRS80 +towgs84=0,0,0,0,0,0,0')
            return (f'+proj=laea +lat_0={lat0:g} +lon_0={lon0:g} '
                    f'+x_0={fe:g} +y_0={fn:g} {datum} +units=m '
                    '+no_defs')
        lcc = self.lcc
        if lcc is not None:
            _, lat0, lon0, sp1, sp2, fe, fn = lcc
            datum = ('+datum=NAD83' if self.epsg == 3978
                     else '+ellps=GRS80 +towgs84=0,0,0,0,0,0,0')
            return (f'+proj=lcc +lat_0={lat0:g} +lon_0={lon0:g} '
                    f'+lat_1={sp1:g} +lat_2={sp2:g} +x_0={fe:g} '
                    f'+y_0={fn:g} {datum} +units=m +no_defs')
        merc = self.mercator
        if merc is not None:
            _, lon0, k0, fe, fn = merc
            return (f'+proj=merc +lon_0={lon0:g} +k={k0:g} '
                    f'+x_0={fe:g} +y_0={fn:g} +datum=WGS84 +units=m '
                    '+no_defs')
        cea = self.cea
        if cea is not None:
            _, lat_ts, lon0, fe, fn = cea
            return (f'+proj=cea +lat_ts={lat_ts:g} +lon_0={lon0:g} '
                    f'+x_0={fe:g} +y_0={fn:g} +datum=WGS84 +units=m '
                    '+no_defs')
        if self.is_web_mercator:
            return ('+proj=merc +a=6378137 +b=6378137 +lat_ts=0 '
                    '+lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m '
                    '+nadgrids=@null +no_defs')
        if self.epsg == 4326:
            return '+proj=longlat +datum=WGS84 +no_defs'
        if self.is_geographic:
            datum = 'NAD83' if self.epsg == 4269 else 'ETRS89'
            return f'+proj=longlat +datum={datum} +no_defs'
        raise ValueError(f'cannot build proj4 for EPSG:{self.epsg}')

    @classmethod
    def from_wkt(cls, wkt):
        """Parse WKT1. An explicit TOWGS84[] clause overrides the
        registry datum shift (the OSR contract: the SRS the file
        carries wins)."""
        crs = cls._from_wkt_base(wkt)
        m = re.search(r'TOWGS84\[([^\]]*)\]', wkt)
        if m:
            tw = _norm_towgs84(
                [float(v) for v in m.group(1).split(',')])
            if (_effective_shift(tw)
                    != _effective_shift(crs.datum_shift)):
                crs = dataclasses.replace(crs, towgs84=tw)
        return crs

    @classmethod
    def _from_wkt_base(cls, wkt):
        wkt = wkt.strip()
        # the OUTERMOST authority closes the WKT1 string; an inner
        # authority (spheroid/unit/geogcs) with no outer one means a
        # user-defined projected CS -> parameter parsing below
        m = re.search(r'AUTHORITY\[\s*"EPSG"\s*,\s*"(\d+)"\s*\]\s*\]$',
                      wkt)
        if m:
            return cls(int(m.group(1)))
        m = re.search(r'UTM zone (\d+)(N|S)', wkt)
        if m:
            zone, north = int(m.group(1)), m.group(2) == 'N'
            if north and ('NAD83' in wkt
                          or 'North_American_Datum_1983' in wkt):
                return cls(26900 + zone)
            if north and ('ETRS89' in wkt or 'ETRS_1989' in wkt
                          or 'European_Terrestrial_Reference_System'
                          in wkt):
                return cls(25800 + zone)
            if north and ('ED50' in wkt
                          or 'European_Datum_1950' in wkt):
                return cls(23000 + zone)
            if north and ('NAD27' in wkt
                          or 'North_American_Datum_1927' in wkt):
                return cls(26700 + zone)
            return cls.from_utm(zone, north)
        m = re.search(r'UPS\s+(North|South)', wkt)
        if m:
            return cls(5041 if m.group(1) == 'North' else 5042)

        def _param(key, default=0.0):
            pm = re.search(
                rf'PARAMETER\[\s*"{key}"\s*,\s*{_NUM_RE}\s*\]', wkt)
            return float(pm.group(1)) if pm else default

        def _ell():
            sm = re.search(
                rf'SPHEROID\[\s*"[^"]*"\s*,\s*{_NUM_RE}\s*,'
                rf'\s*{_NUM_RE}', wkt)
            if sm:
                return _ensure_ellipsoid(float(sm.group(1)),
                                         float(sm.group(2)))
            return 'WGS84'

        def _lat0():
            return _param('latitude_of_center',
                          _param('latitude_of_origin'))

        def _lon0():
            return _param('longitude_of_center',
                          _param('central_meridian'))

        fe_fn = (_param('false_easting'), _param('false_northing'))
        # projected linear unit: the LAST UNIT[] in a PROJCS string
        # (the GEOGCS's degree UNIT precedes the PARAMETERs). US State
        # Plane grids ship in feet (dswx_hls.py:3385 accepts any OSR
        # SRS, units included).
        unit = 1.0
        if 'PROJCS' in wkt:
            units = re.findall(
                rf'UNIT\[\s*"[^"]*"\s*,\s*{_NUM_RE}', wkt)
            if units:
                unit = _snap_unit(units[-1])
                if abs(unit - np.radians(1.0)) < 1e-9:
                    unit = 1.0      # degree = a malformed/absent
                    # projected UNIT; treat as metre
        metric = unit == 1.0
        if 'Albers' in wkt:
            cand = (_lat0(), _lon0(),
                    _param('standard_parallel_1'),
                    _param('standard_parallel_2'), *fe_fn)
            ell = _ell()
            if metric:
                for epsg, params in _ALBERS.items():
                    if params[1:] == cand and ell == params[0]:
                        return cls(epsg)
            return cls(32767, ('aea', ell, *cand), unit)
        if 'Lambert_Azimuthal_Equal_Area' in wkt or 'LAEA' in wkt:
            cand = (_lat0(), _lon0(), *fe_fn)
            ell = _ell()
            if metric:
                for epsg, params in _LAEA.items():
                    if params[1:] == cand and ell == params[0]:
                        return cls(epsg)
            return cls(32767, ('laea', ell, *cand), unit)
        if 'Lambert_Conformal_Conic' in wkt:
            sp1 = _param('standard_parallel_1', _lat0())
            sp2 = _param('standard_parallel_2', sp1)
            cand = (_lat0(), _lon0(), sp1, sp2, *fe_fn)
            ell = _ell()
            if metric:
                for epsg, params in _LCC.items():
                    if params[1:] == cand and ell == params[0]:
                        return cls(epsg)
            k0 = _param('scale_factor', 1.0)
            custom = (('lcc', ell, *cand) if k0 == 1.0
                      else ('lcc', ell, *cand, k0))
            return cls(32767, custom, unit)
        if 'Krovak' in wkt:
            cand = ('krovak', _ell(), _lat0(), _lon0(),
                    _param('azimuth'),
                    _param('pseudo_standard_parallel_1', 78.5),
                    _param('scale_factor', 1.0), *fe_fn)
            if metric:
                for epsg, params in _GENERAL.items():
                    if params == cand:
                        return cls(epsg)
            return cls(32767, cand, unit)
        if ('Oblique_Mercator' in wkt or 'Oblique Mercator' in wkt
                or 'somerc' in wkt):
            if 'Laborde' in wkt:
                raise ValueError(
                    'Laborde oblique Mercator is not supported')
            az = _param('azimuth', 90.0)
            rga = _param('rectified_grid_angle', az)
            k0 = _param('scale_factor', 1.0)
            ell = _ell()
            if (abs(az - 90.0) < 1e-9 and abs(rga - 90.0) < 1e-9) \
                    or 'Swiss' in wkt or 'Rosenmund' in wkt:
                cand = ('somerc', ell, _lat0(), _lon0(), k0, *fe_fn)
            else:
                vb = 'Azimuth_Center' in wkt or 'Azimuth Center' in wkt
                cand = ('omerc', ell, _lat0(), _lon0(), az, rga, k0,
                        *fe_fn, vb)
            if metric:
                for epsg, params in _GENERAL.items():
                    if params == cand:
                        return cls(epsg)
            return cls(32767, cand, unit)
        if ('Oblique_Stereographic' in wkt
                or 'Double_Stereographic' in wkt):
            cand = ('sterea', _ell(), _lat0(), _lon0(),
                    _param('scale_factor', 1.0), *fe_fn)
            if metric:
                for epsg, params in _GENERAL.items():
                    if params == cand:
                        return cls(epsg)
            return cls(32767, cand, unit)
        if ('Equirectangular' in wkt
                or 'Equidistant_Cylindrical' in wkt):
            cand = ('eqc', _ell(), _param('standard_parallel_1', 0.0),
                    _lat0(), _lon0(), *fe_fn)
            if metric:
                for epsg, params in _GENERAL.items():
                    if params == cand:
                        return cls(epsg)
            return cls(32767, cand, unit)
        if 'Transverse_Mercator' in wkt:
            # deliberately NOT identified against the _GENERAL registry:
            # TM grids (BNG, NZTM, Gauss-Krueger) ride classical datums,
            # and an authority-free WKT without TOWGS84 must keep the
            # null shift (the OSR contract: the SRS the file carries
            # wins) rather than inherit the registry Helmert
            custom = ('tm', _ell(), _lat0(), _lon0(),
                      _param('scale_factor', 1.0), *fe_fn)
            return cls(32767, custom, unit)
        if 'Polar_Stereographic' in wkt:
            lat0 = _lat0()
            lonp = _param('straight_vertical_longitude_from_pole',
                          _lon0())
            cand = (lat0, lonp, *fe_fn, lat0 > 0)
            if metric:
                for epsg, params in _POLAR_STEREO.items():
                    if len(params) == 5 and params == cand \
                            and _ell() == 'WGS84':
                        return cls(epsg)
            if abs(lat0) >= 89.999:
                custom = ('ps', None, lonp, *fe_fn, lat0 > 0,
                          _param('scale_factor', 1.0), _ell())
            else:
                custom = ('ps', lat0, lonp, *fe_fn, lat0 > 0, None,
                          _ell())
            return cls(32767, custom, unit)
        if 'Sinusoidal' in wkt:
            # MODIS grid: authalic sphere (SPHEROID 1/f = 0) carried
            # as a radius; ESRI:54008-style ellipsoidal also accepted
            sm = re.search(
                rf'SPHEROID\[\s*"[^"]*"\s*,\s*{_NUM_RE}\s*,'
                rf'\s*{_NUM_RE}', wkt)
            if sm and float(sm.group(2)) == 0.0:
                ell = float(sm.group(1))
            else:
                ell = _ell()
            return cls(32767, ('sinu', ell, _lon0(), *fe_fn), unit)
        if 'Cylindrical_Equal_Area' in wkt:
            lat_ts = _param('standard_parallel_1', 0.0)
            cand = (lat_ts, _lon0(), *fe_fn)
            ell = _ell()
            if metric:
                for epsg, params in _CEA.items():
                    if params[1:] == cand and ell == params[0]:
                        return cls(epsg)
            return cls(32767, ('cea', ell, *cand), unit)
        if 'Mercator' in wkt and 'Transverse' not in wkt:
            if ('Pseudo-Mercator' in wkt
                    or 'Mercator_Auxiliary_Sphere' in wkt
                    or 'Popular Visualisation' in wkt):
                return cls(WEB_MERCATOR_EPSG)
            sp1 = _param('standard_parallel_1', None)
            ell = _ell()
            if sp1 is not None:     # variant B -> equivalent k0
                k0 = _merc_k0_from_lat_ts(sp1, ell)
            else:
                k0 = _param('scale_factor', 1.0)
            cand = (_lon0(), k0, *fe_fn)
            if metric:
                for epsg, params in _MERC.items():
                    if params[1:] == cand and ell == params[0]:
                        return cls(epsg)
            return cls(32767, ('merc', ell, *cand), unit)
        if 'PROJCS' not in wkt:
            # geographic-only WKT, matched by datum name (a PROJCS
            # with an unrecognized projection must NOT fall through to
            # its GEOGCS and silently misread as geographic)
            if 'WGS 84' in wkt or 'WGS_1984' in wkt:
                return cls(4326)
            if 'NAD83' in wkt or 'North_American_Datum_1983' in wkt:
                return cls(4269)
            if 'ETRS89' in wkt or 'ETRS_1989' in wkt:
                return cls(4258)
            if 'OSGB 1936' in wkt or 'OSGB_1936' in wkt \
                    or 'OSGB36' in wkt:
                return cls(4277)
            if 'ED50' in wkt or 'European_Datum_1950' in wkt:
                return cls(4230)
            if 'NAD27' in wkt or 'North_American_Datum_1927' in wkt:
                return cls(4267)
            if 'Tokyo' in wkt:
                return cls(4301)
            if 'Pulkovo 1942' in wkt or 'Pulkovo_1942' in wkt:
                return cls(4284)
            if 'CH1903+' in wkt:
                return cls(4150)
            if 'CH1903' in wkt:
                return cls(4149)
            if 'GEOGCS' in wkt:
                # unknown datum name: geographic on the SPHEROID it
                # declares (datum shift from its TOWGS84, if any)
                sm = re.search(
                    rf'SPHEROID\[\s*"[^"]*"\s*,\s*{_NUM_RE}\s*,'
                    rf'\s*{_NUM_RE}', wkt)
                if sm:
                    return cls(32767, ('geog', _ensure_ellipsoid(
                        float(sm.group(1)), float(sm.group(2)))))
        raise ValueError(f'cannot parse WKT: {wkt[:120]}...')

    @classmethod
    def from_proj4(cls, proj4):
        """Parse a proj4 string. An explicit +towgs84= overrides the
        registry datum shift (like OSR, the SRS the file carries
        wins)."""
        crs = cls._from_proj4_base(proj4)
        m = re.search(r'\+towgs84=([-\d.,eE+]+)', proj4)
        if m:
            tw = _norm_towgs84(
                [float(v) for v in m.group(1).split(',')])
            if (_effective_shift(tw)
                    != _effective_shift(crs.datum_shift)):
                crs = dataclasses.replace(crs, towgs84=tw)
        return crs

    @classmethod
    def _from_proj4_base(cls, proj4):
        # proj4 +x_0/+y_0 are ALWAYS metres; +units/+to_meter scale the
        # output coordinates (PROJ applies fr_meter*(proj + x_0)). The
        # custom tuple stores fe/fn in native units, so divide here.
        unit = 1.0
        m = re.search(r'\+units=([\w-]+)', proj4)
        if m:
            table = {'m': 1.0, 'meter': 1.0, 'metre': 1.0,
                     'ft': _FOOT, 'us-ft': _US_FOOT}
            if m.group(1) not in table:
                raise ValueError(
                    f'unsupported proj4 +units={m.group(1)}')
            unit = table[m.group(1)]
        elif '+to_meter=' in proj4:
            unit = _snap_unit(_proj4_param(proj4, 'to_meter', 1.0))
        if unit != 1.0 and ('+proj=utm' in proj4
                            or '+proj=longlat' in proj4
                            or '+proj=latlong' in proj4
                            or '+proj=webmerc' in proj4):
            raise ValueError(
                f'non-metre units unsupported for this projection: '
                f'{proj4}')
        if '+proj=utm' in proj4:
            m = re.search(r'\+zone=(\d+)', proj4)
            if not m:
                raise ValueError(f'UTM proj4 without zone: {proj4}')
            zone, north = int(m.group(1)), '+south' not in proj4
            if north and '+datum=NAD83' in proj4:
                return cls(26900 + zone)
            if north and '+datum=ETRS89' in proj4:
                return cls(25800 + zone)
            ell = _proj4_ellipsoid(proj4)
            if ell not in ('WGS84', 'GRS80'):
                if north and ell == 'INTL1924' and 28 <= zone <= 38:
                    return cls(23000 + zone)      # ED50 / UTM
                if north and ell == 'CLARKE1866' and 3 <= zone <= 22:
                    return cls(26700 + zone)      # NAD27 / UTM
                # UTM on another classical ellipsoid: general TM
                return cls(32767, ('tm', ell, 0.0, zone * 6.0 - 183.0,
                                   0.9996, 500000.0,
                                   0.0 if north else 10000000.0))
            return cls.from_utm(zone, north)
        if '+proj=longlat' in proj4 or '+proj=latlong' in proj4:
            if '+datum=NAD83' in proj4:
                return cls(4269)
            if '+datum=ETRS89' in proj4:
                return cls(4258)
            ell = _proj4_ellipsoid(proj4)
            if ell != 'WGS84':
                # geographic on a classical ellipsoid; the datum shift
                # (if any) comes from the +towgs84 the string carries
                return cls(32767, ('geog', ell))
            return cls(4326)
        if '+proj=webmerc' in proj4 or \
                ('+proj=merc' in proj4
                 and ('+nadgrids=@null' in proj4
                      or ('+a=6378137' in proj4
                          and '+b=6378137' in proj4))):
            return cls(WEB_MERCATOR_EPSG)
        if '+proj=sinu' in proj4:
            fe, fn = (_proj4_param(proj4, 'x_0') / unit,
                      _proj4_param(proj4, 'y_0') / unit)
            lon0 = _proj4_param(proj4, 'lon_0')
            if '+R=' in proj4:     # sphere radius (MODIS grid)
                ell = _proj4_param(proj4, 'R')
            else:
                ma = re.search(rf'\+a={_NUM_RE}', proj4)
                mb = re.search(rf'\+b={_NUM_RE}', proj4)
                if ma and mb and ma.group(1) == mb.group(1):
                    ell = float(ma.group(1))
                else:
                    ell = _proj4_ellipsoid(proj4)
            return cls(32767, ('sinu', ell, lon0, fe, fn), unit)
        if '+proj=cea' in proj4:
            ell = _proj4_ellipsoid(proj4)
            cand = (_proj4_param(proj4, 'lat_ts'),
                    _proj4_param(proj4, 'lon_0'),
                    _proj4_param(proj4, 'x_0') / unit,
                    _proj4_param(proj4, 'y_0') / unit)
            if unit == 1.0:
                for epsg, params in _CEA.items():
                    if params[1:] == cand and ell == params[0]:
                        return cls(epsg)
            return cls(32767, ('cea', ell, *cand), unit)
        if '+proj=merc' in proj4:
            def _p(key, default=0.0):
                return _proj4_param(proj4, key, default)
            ell = _proj4_ellipsoid(proj4)
            lat_ts = _p('lat_ts', None) if '+lat_ts=' in proj4 else None
            if lat_ts is not None:
                k0 = _merc_k0_from_lat_ts(lat_ts, ell)
            else:
                k0 = _p('k', _p('k_0', 1.0))
            cand = (_p('lon_0'), k0, _p('x_0') / unit,
                    _p('y_0') / unit)
            if unit == 1.0:
                for epsg, params in _MERC.items():
                    if params[1:] == cand and ell == params[0]:
                        return cls(epsg)
            return cls(32767, ('merc', ell, *cand), unit)
        if ('+proj=aea' in proj4 or '+proj=laea' in proj4
                or '+proj=lcc' in proj4 or '+proj=tmerc' in proj4):
            def _p(key, default=0.0):
                return _proj4_param(proj4, key, default)
            ell = _proj4_ellipsoid(proj4)
            fe, fn = _p('x_0') / unit, _p('y_0') / unit
            if '+proj=tmerc' in proj4:
                # no _GENERAL identification (see the WKT TM branch):
                # a bare tmerc string without +towgs84 keeps the null
                # datum shift
                return cls(32767, ('tm', ell, _p('lat_0'), _p('lon_0'),
                                   _p('k', _p('k_0', 1.0)), fe, fn),
                           unit)
            if '+proj=aea' in proj4 or '+proj=lcc' in proj4:
                cand = (_p('lat_0'), _p('lon_0'), _p('lat_1'),
                        _p('lat_2', _p('lat_1')), fe, fn)
                registry = (_ALBERS if '+proj=aea' in proj4 else _LCC)
                if unit == 1.0:
                    for epsg, params in registry.items():
                        if params[1:] == cand and ell == params[0]:
                            return cls(epsg)
                fam = 'aea' if '+proj=aea' in proj4 else 'lcc'
                k0 = _p('k', _p('k_0', 1.0))
                if fam == 'lcc' and k0 != 1.0:
                    return cls(32767, ('lcc', ell, *cand, k0), unit)
                return cls(32767, (fam, ell, *cand), unit)
            cand = (_p('lat_0'), _p('lon_0'), fe, fn)
            if unit == 1.0:
                for epsg, params in _LAEA.items():
                    if params[1:] == cand and ell == params[0]:
                        return cls(epsg)
            return cls(32767, ('laea', ell, *cand), unit)
        if '+proj=sterea' in proj4:
            def _p(key, default=0.0):
                return _proj4_param(proj4, key, default)
            ell = _proj4_ellipsoid(proj4)
            cand = ('sterea', ell, _p('lat_0'), _p('lon_0'),
                    _p('k', _p('k_0', 1.0)),
                    _p('x_0') / unit, _p('y_0') / unit)
            if unit == 1.0:
                for epsg, params in _GENERAL.items():
                    if params == cand:
                        return cls(epsg)
            return cls(32767, cand, unit)
        if '+proj=eqc' in proj4:
            def _p(key, default=0.0):
                return _proj4_param(proj4, key, default)
            ell = _proj4_ellipsoid(proj4)
            cand = ('eqc', ell, _p('lat_ts'), _p('lat_0'), _p('lon_0'),
                    _p('x_0') / unit, _p('y_0') / unit)
            if unit == 1.0:
                for epsg, params in _GENERAL.items():
                    if params == cand:
                        return cls(epsg)
            return cls(32767, cand, unit)
        if '+proj=stere' in proj4:
            def _p(key, default=0.0):
                return _proj4_param(proj4, key, default)
            ell = _proj4_ellipsoid(proj4)
            north = _p('lat_0') > 0
            k0 = _p('k', None) if '+k=' in proj4 else None
            lat_ts = _p('lat_ts', None) if '+lat_ts=' in proj4 else None
            fe, fn = _p('x_0') / unit, _p('y_0') / unit
            cand = (lat_ts, _p('lon_0'), fe, fn, north)
            for epsg, params in _POLAR_STEREO.items():
                if ell != 'WGS84' or unit != 1.0:
                    break
                if len(params) > 5:
                    if (k0 is not None and params[5] == k0
                            and params[1:5] == cand[1:]):
                        return cls(epsg)
                elif lat_ts is not None and params == cand:
                    return cls(epsg)
            if abs(_p('lat_0')) < 89.999:
                raise ValueError(
                    f'oblique stereographic is not supported: {proj4}')
            return cls(32767, ('ps', lat_ts, _p('lon_0'), fe, fn,
                               north,
                               (k0 or 1.0) if lat_ts is None else None,
                               ell), unit)
        if '+proj=krovak' in proj4:
            def _p(key, default=0.0):
                return _proj4_param(proj4, key, default)
            ell = _proj4_ellipsoid(proj4)
            cand = ('krovak', ell, _p('lat_0'), _p('lon_0'),
                    _p('alpha', 30.0 + 17.0 / 60 + 17.3031 / 3600),
                    78.5, _p('k', _p('k_0', 1.0)),
                    _p('x_0') / unit, _p('y_0') / unit)
            if unit == 1.0:
                for epsg, params in _GENERAL.items():
                    if params == cand:
                        return cls(epsg)
            return cls(32767, cand, unit)
        if '+proj=somerc' in proj4 or '+proj=omerc' in proj4:
            def _p(key, default=0.0):
                return _proj4_param(proj4, key, default)
            ell = _proj4_ellipsoid(proj4)
            k0 = _p('k_0', _p('k', 1.0))
            fe, fn = _p('x_0') / unit, _p('y_0') / unit
            if '+proj=somerc' in proj4:
                cand = ('somerc', ell, _p('lat_0'), _p('lon_0'), k0,
                        fe, fn)
            else:
                alpha = _p('alpha', 90.0)
                gamma = _p('gamma', alpha)
                if abs(alpha - 90.0) < 1e-9 and abs(gamma - 90.0) \
                        < 1e-9:
                    cand = ('somerc', ell, _p('lat_0'), _p('lonc'),
                            k0, fe, fn)
                else:
                    vb = ('+no_uoff' not in proj4
                          and '+no_off' not in proj4)
                    cand = ('omerc', ell, _p('lat_0'), _p('lonc'),
                            alpha, gamma, k0, fe, fn, vb)
            if unit == 1.0:
                for epsg, params in _GENERAL.items():
                    if params == cand:
                        return cls(epsg)
            return cls(32767, cand, unit)
        m = re.search(r'EPSG:(\d+)', proj4)
        if m:
            return cls(int(m.group(1)))
        raise ValueError(f'cannot parse proj4: {proj4}')

    @classmethod
    def from_any(cls, value):
        """Accept CRS / EPSG int / 'EPSG:n' / WKT / proj4 strings."""
        if isinstance(value, CRS):
            return value
        if isinstance(value, (int, np.integer)):
            return cls(int(value))
        s = str(value).strip()
        if s.upper().startswith('EPSG:'):
            return cls(int(s.split(':')[1]))
        if s.startswith('+'):
            return cls.from_proj4(s)
        if s and s[0].isdigit():
            return cls(int(s))
        return cls.from_wkt(s)


def transform_points(src, dst, x, y):
    """Transform coordinate arrays between two supported CRS.

    Geographic coordinates use (lon, lat) = (x, y) GIS-traditional axis
    order (the reference forces OAMS_TRADITIONAL_GIS_ORDER,
    dswx_hls.py:3422-3428).
    """
    src = CRS.from_any(src)
    dst = CRS.from_any(dst)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if src == dst:
        return x, y
    # to geographic ON THE SOURCE DATUM (NAD83/ETRS89 <-> WGS84 ride
    # the null transformation; classical datums get the Helmert shift
    # below)
    if src.custom is not None:
        if src.unit != 1.0:     # foot-based grids -> metres
            x, y = x * src.unit, y * src.unit
        lat, lon = _custom_inverse(x, y, src.metric_custom)
    elif src.general is not None:
        lat, lon = _custom_inverse(x, y, src.general)
    elif src.utm is not None:
        lat, lon = utm_inverse(x, y, *src.utm, ell=src.ellipsoid)
    elif src.polar_stereo is not None:
        lat, lon = polar_stereo_inverse(x, y, *src.polar_stereo)
    elif src.albers is not None:
        lat, lon = albers_inverse(x, y, *src.albers)
    elif src.laea is not None:
        lat, lon = laea_inverse(x, y, *src.laea)
    elif src.lcc is not None:
        lat, lon = lcc_inverse(x, y, *src.lcc)
    elif src.mercator is not None:
        lat, lon = mercator_inverse(x, y, *src.mercator)
    elif src.cea is not None:
        lat, lon = cea_inverse(x, y, *src.cea)
    elif src.is_web_mercator:
        lat, lon = web_mercator_inverse(x, y)
    elif src.is_geographic:
        lon, lat = x, y
    else:
        raise ValueError(f'unsupported source CRS: EPSG:{src.epsg}')
    # datum shift between the two geodetic frames (identity unless the
    # effective TOWGS84 parameters differ)
    if (_effective_shift(src.datum_shift)
            != _effective_shift(dst.datum_shift)):
        lat, lon = shift_datum(lat, lon, src.datum_ellipsoid,
                               src.datum_shift, dst.datum_ellipsoid,
                               dst.datum_shift)
    if dst.custom is not None:
        X, Y = _custom_forward(lat, lon, dst.metric_custom)
        if dst.unit != 1.0:     # metres -> the grid's native unit
            return X / dst.unit, Y / dst.unit
        return X, Y
    if dst.is_geographic:
        return lon, lat
    if dst.general is not None:
        return _custom_forward(lat, lon, dst.general)
    if dst.utm is not None:
        return utm_forward(lat, lon, *dst.utm, ell=dst.ellipsoid)
    if dst.polar_stereo is not None:
        return polar_stereo_forward(lat, lon, *dst.polar_stereo)
    if dst.albers is not None:
        return albers_forward(lat, lon, *dst.albers)
    if dst.laea is not None:
        return laea_forward(lat, lon, *dst.laea)
    if dst.lcc is not None:
        return lcc_forward(lat, lon, *dst.lcc)
    if dst.mercator is not None:
        return mercator_forward(lat, lon, *dst.mercator)
    if dst.cea is not None:
        return cea_forward(lat, lon, *dst.cea)
    if dst.is_web_mercator:
        return web_mercator_forward(lat, lon)
    raise ValueError(f'unsupported destination CRS: EPSG:{dst.epsg}')
