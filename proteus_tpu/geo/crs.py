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
worked example). Anything else is rejected up front by the ancillary
coverage check (geo/coverage.py) with a clear error.
"""

import dataclasses
import re
from functools import lru_cache

import numpy as np

# ellipsoids: name -> (semi-major axis a, inverse flattening 1/f)
_ELLIPSOIDS = {
    'WGS84': (6378137.0, 298.257223563),
    'GRS80': (6378137.0, 298.257222101),  # NAD83 / ETRS89
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


def _ps_t(lat):
    """Snyder (15-9): isometric colatitude function t(phi), north aspect."""
    s = np.sin(lat)
    return np.tan(np.pi / 4 - lat / 2) \
        * ((1 + _E * s) / (1 - _E * s)) ** (_E / 2)


def _ps_rho_per_t(lat_ts_abs, k0=None):
    """rho/t: variant B (k=1 at the standard parallel lat_ts) when
    ``k0`` is None, else variant A (scale k0 at the pole — UPS; EPSG
    Guidance Note 7-2 eq. for rho)."""
    if k0 is not None:
        return (2.0 * _A * k0
                / np.sqrt((1 + _E) ** (1 + _E) * (1 - _E) ** (1 - _E)))
    lat_f = np.radians(lat_ts_abs)
    m_f = np.cos(lat_f) / np.sqrt(1 - _E2 * np.sin(lat_f) ** 2)
    return _A * m_f / _ps_t(np.float64(lat_f))


def polar_stereo_forward(lat_deg, lon_deg, lat_ts, lon0, fe, fn, north,
                         k0=None):
    """WGS84 geographic -> polar stereographic E/N, float64 (variant B,
    or variant A / UPS when ``k0`` is given)."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lam0 = np.radians(lon0)
    if not north:
        lat = -lat
        lon = -lon
        lam0 = -lam0
    rho = _ps_rho_per_t(None if lat_ts is None else abs(lat_ts), k0) \
        * _ps_t(lat)
    theta = np.arctan2(np.sin(lon - lam0), np.cos(lon - lam0))
    x = rho * np.sin(theta)
    y = -rho * np.cos(theta)
    if not north:
        x, y = -x, -y
    return fe + x, fn + y


def polar_stereo_inverse(x, y, lat_ts, lon0, fe, fn, north, k0=None):
    """Polar stereographic E/N -> WGS84 lat/lon degrees (variant B, or
    variant A / UPS when ``k0`` is given)."""
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    lam0 = np.radians(lon0)
    if not north:
        x, y, lam0 = -x, -y, -lam0
    rho = np.hypot(x, y)
    t = rho / _ps_rho_per_t(None if lat_ts is None else abs(lat_ts), k0)
    # iterate phi = pi/2 - 2 atan(t ((1-e sin phi)/(1+e sin phi))^(e/2))
    lat = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        s = np.sin(lat)
        lat = np.pi / 2 - 2 * np.arctan(
            t * ((1 - _E * s) / (1 + _E * s)) ** (_E / 2))
    lon = lam0 + np.arctan2(x, -y)
    lat_deg = np.degrees(lat)
    lon_deg = np.degrees(lon)
    if not north:
        lat_deg = -lat_deg
        lon_deg = -lon_deg
    lon_deg = (lon_deg + 180.0) % 360.0 - 180.0
    return lat_deg, lon_deg


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


@dataclasses.dataclass(frozen=True)
class CRS:
    epsg: int

    @classmethod
    def from_epsg(cls, epsg):
        return cls(int(epsg))

    @property
    def is_geographic(self):
        """Geographic (lat/lon degree) CRS. NAD83 (4269) and ETRS89
        (4258) coordinates are taken as WGS84 (the null datum
        transformation OSR applies without datum grids; ~1-2 m true
        offset, far below the 30 m pixel grid)."""
        return self.epsg in (4326, 4269, 4258)

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
        return None

    @property
    def ellipsoid(self):
        """Ellipsoid name for the projection math."""
        if (26901 <= self.epsg <= 26923 or 25828 <= self.epsg <= 25838
                or self.epsg in (4269, 4258)):
            return 'GRS80'
        return 'WGS84'

    @classmethod
    def from_utm(cls, zone, north):
        return cls((32600 if north else 32700) + int(zone))

    @property
    def polar_stereo(self):
        """(lat_ts, lon0, fe, fn, north[, k0]) for polar stereographic
        CRS (k0 present only for the variant-A UPS grids)."""
        return _POLAR_STEREO.get(self.epsg)

    @property
    def supported(self):
        """True if this CRS can be transformed by this engine."""
        return (self.is_geographic or self.utm is not None
                or self.polar_stereo is not None)

    def to_wkt(self):
        utm = self.utm
        if utm is not None:
            zone, north = utm
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
        utm = self.utm
        if utm is not None:
            zone, north = utm
            south = '' if north else ' +south'
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
        if self.epsg == 4326:
            return '+proj=longlat +datum=WGS84 +no_defs'
        if self.is_geographic:
            datum = 'NAD83' if self.epsg == 4269 else 'ETRS89'
            return f'+proj=longlat +datum={datum} +no_defs'
        raise ValueError(f'cannot build proj4 for EPSG:{self.epsg}')

    @classmethod
    def from_wkt(cls, wkt):
        codes = re.findall(r'AUTHORITY\[\s*"EPSG"\s*,\s*"(\d+)"\s*\]', wkt)
        if codes:
            # the outermost authority is the last one in WKT1 order
            return cls(int(codes[-1]))
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
            return cls.from_utm(zone, north)
        m = re.search(r'UPS\s+(North|South)', wkt)
        if m:
            return cls(5041 if m.group(1) == 'North' else 5042)
        if 'WGS 84' in wkt or 'WGS_1984' in wkt:
            return cls(4326)
        if 'NAD83' in wkt or 'North_American_Datum_1983' in wkt:
            return cls(4269)
        if 'ETRS89' in wkt or 'ETRS_1989' in wkt:
            return cls(4258)
        raise ValueError(f'cannot parse WKT: {wkt[:120]}...')

    @classmethod
    def from_proj4(cls, proj4):
        if '+proj=utm' in proj4:
            m = re.search(r'\+zone=(\d+)', proj4)
            if not m:
                raise ValueError(f'UTM proj4 without zone: {proj4}')
            zone, north = int(m.group(1)), '+south' not in proj4
            if north and '+datum=NAD83' in proj4:
                return cls(26900 + zone)
            if north and '+datum=ETRS89' in proj4:
                return cls(25800 + zone)
            return cls.from_utm(zone, north)
        if '+proj=longlat' in proj4 or '+proj=latlong' in proj4:
            if '+datum=NAD83' in proj4:
                return cls(4269)
            if '+datum=ETRS89' in proj4:
                return cls(4258)
            return cls(4326)
        if '+proj=stere' in proj4:
            def _p(key, default=0.0):
                m = re.search(rf'\+{key}=(-?[\d.eE+]+)', proj4)
                return float(m.group(1)) if m else default
            north = _p('lat_0') > 0
            k0 = _p('k', None) if '+k=' in proj4 else None
            lat_ts = _p('lat_ts', None) if '+lat_ts=' in proj4 else None
            cand = (lat_ts, _p('lon_0'), _p('x_0'), _p('y_0'), north)
            for epsg, params in _POLAR_STEREO.items():
                if len(params) > 5:
                    if (k0 is not None and params[5] == k0
                            and params[1:5] == cand[1:]):
                        return cls(epsg)
                elif lat_ts is not None and params == cand:
                    return cls(epsg)
            raise ValueError(
                f'polar stereographic proj4 matches no supported grid: '
                f'{proj4}')
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
    if src.epsg == dst.epsg:
        return x, y
    # to geographic (NAD83/ETRS89 <-> WGS84: null datum transformation)
    if src.utm is not None:
        lat, lon = utm_inverse(x, y, *src.utm, ell=src.ellipsoid)
    elif src.polar_stereo is not None:
        lat, lon = polar_stereo_inverse(x, y, *src.polar_stereo)
    elif src.is_geographic:
        lon, lat = x, y
    else:
        raise ValueError(f'unsupported source CRS: EPSG:{src.epsg}')
    if dst.is_geographic:
        return lon, lat
    if dst.utm is not None:
        return utm_forward(lat, lon, *dst.utm, ell=dst.ellipsoid)
    if dst.polar_stereo is not None:
        return polar_stereo_forward(lat, lon, *dst.polar_stereo)
    raise ValueError(f'unsupported destination CRS: EPSG:{dst.epsg}')
