"""Terrain shadow layer (SHAD) from a pre-warped DEM, on device.

Two algorithms, selected by runconfig (reference default:
'sun_local_inc_angle'):

- ``compute_opera_shadow_layer``: sun local-incidence angle + directional
  slope thresholds from the DEM gradient (reference
  _compute_opera_shadow_layer, dswx_hls.py:4215-4283). Uses NumPy
  np.gradient semantics (central differences in the interior, one-sided at
  the edges).

- ``compute_opera_shadow_layer_exact``: the production variant —
  bit-identical to the reference's float64 decision chain. The reference,
  fed the float32 warped DEM, computes the gradient/terrain normal in
  float32 but the arccos/arctan threshold comparisons in float64 (NumPy 2
  promotion of float64 trig scalars). A plain float32 device chain flips a
  pixel whenever its angle lands within ~1 float32 ULP of the threshold
  (~1e-7/pixel — a few pixels per 3660^2 tile). Instead of emulating f64
  on the MXU, the device decides each pixel in *comparison space* (the
  cosine of the incidence angle vs a float64-bisected boundary; likewise
  tan of the directional slope), flags the epsilon-band of near-boundary
  pixels, and the host re-decides only those (typically zero) in float64
  with the reference's exact dtype mix. The decisions never route through
  a device transcendental, so the result is also invariant to TPU-vs-host
  libm differences.

- ``compute_hillshade`` + Otsu: GDAL DEMProcessing("hillshade") equivalent
  (Horn's formula, GDAL gdaldem conventions) followed by Otsu binarization
  (reference dswx_hls.py:4177-4212 and :1638-1684).

All variants consume a DEM with a margin (DEM_MARGIN_IN_PIXELS) that the
caller crops afterwards, so edge-handling differences never reach the
product.
"""

import functools
import struct

import jax
import jax.numpy as jnp
import numpy as np

from proteus_tpu.ops.otsu import otsu_binarize


def _np_gradient_axis(h, axis):
    """np.gradient along one axis: central interior, one-sided edges."""
    h = h.astype(jnp.float32)
    if axis == 0:
        interior = (h[2:, :] - h[:-2, :]) * 0.5
        first = (h[1:2, :] - h[0:1, :])
        last = (h[-1:, :] - h[-2:-1, :])
        return jnp.concatenate([first, interior, last], axis=0)
    interior = (h[:, 2:] - h[:, :-2]) * 0.5
    first = (h[:, 1:2] - h[:, 0:1])
    last = (h[:, -1:] - h[:, -2:-1])
    return jnp.concatenate([first, interior, last], axis=1)


def compute_opera_shadow_layer(dem, sun_azimuth_angle, sun_elevation_angle,
                               min_slope_angle, max_sun_local_inc_angle,
                               pixel_spacing_x=30, pixel_spacing_y=30):
    """Shadow mask (True: not shadow / False: shadow) from sun geometry.

    Scalars are Python floats (compile-time constants per tile batch is also
    supported by passing jnp scalars).
    """
    sun_azimuth = jnp.float32(np.radians(sun_azimuth_angle)) \
        if np.isscalar(sun_azimuth_angle) else jnp.radians(sun_azimuth_angle)
    sun_zenith_degrees = 90.0 - sun_elevation_angle
    sun_zenith = jnp.float32(np.radians(sun_zenith_degrees)) \
        if np.isscalar(sun_zenith_degrees) else jnp.radians(sun_zenith_degrees)

    # target-to-sun unit vector (x, y, z)
    tsv_x = jnp.sin(sun_azimuth) * jnp.sin(sun_zenith)
    tsv_y = jnp.cos(sun_azimuth) * jnp.sin(sun_zenith)
    tsv_z = jnp.cos(sun_zenith)

    gy = _np_gradient_axis(dem, 0)
    gx = _np_gradient_axis(dem, 1)

    # terrain normal N = [-dh/dx, -dh/dy, 1] wrt the DEM grid; the reference
    # divides the row gradient by -abs(pixel_spacing_y) (north-up grid)
    tn_x = -gx / pixel_spacing_x
    tn_y = -gy / -abs(pixel_spacing_y)

    normalization = jnp.sqrt(tn_x ** 2 + tn_y ** 2 + 1.0)
    cos_inc = (tn_x * tsv_x + tn_y * tsv_y + tsv_z) / normalization
    sun_inc_angle_degrees = jnp.degrees(jnp.arccos(cos_inc))

    directional_slope_angle = jnp.degrees(jnp.arctan(
        tn_x * jnp.sin(sun_azimuth) + tn_y * jnp.cos(sun_azimuth)))

    backslope_mask = directional_slope_angle <= min_slope_angle
    low_sun_inc_angle_mask = sun_inc_angle_degrees <= max_sun_local_inc_angle
    shadow_mask = low_sun_inc_angle_mask | (~backslope_mask)
    return shadow_mask


# ---------------------------------------------------------------------------
# Exact (reference-float64-parity) shadow layer
# ---------------------------------------------------------------------------

# Max pixels host-resolved per tile before falling back to a full host
# recompute. Random 3660^2 terrain puts O(100) pixels in the epsilon band.
_MAX_UNCERTAIN = 16384
_EPS_X = 1e-5          # band half-width in cos(incidence) space
_EPS_T_REL = 1e-5      # band half-width in tan(slope) space, x(1+|t_crit|)


def _float_to_ordered_int(x):
    i = struct.unpack('<q', struct.pack('<d', float(x)))[0]
    return i if i >= 0 else -(i & 0x7FFFFFFFFFFFFFFF)


def _ordered_int_to_float(i):
    raw = i if i >= 0 else (-i) | (1 << 63)
    return struct.unpack('<d', struct.pack('<Q', raw & ((1 << 64) - 1)))[0]


def _bisect_largest_true(pred, lo, hi):
    """Largest float64 in [lo, hi] with pred true, for pred monotone
    nonincreasing (true below the boundary); None if pred(lo) is false.
    Bisection runs over the ordered-integer encoding of float64, so the
    boundary is exact to the last ULP."""
    ilo, ihi = _float_to_ordered_int(lo), _float_to_ordered_int(hi)
    if not pred(_ordered_int_to_float(ilo)):
        return None
    if pred(_ordered_int_to_float(ihi)):
        return _ordered_int_to_float(ihi)
    while ihi - ilo > 1:
        mid = (ilo + ihi) // 2
        if pred(_ordered_int_to_float(mid)):
            ilo = mid
        else:
            ihi = mid
    return _ordered_int_to_float(ilo)


def _bisect_smallest_true(pred, lo, hi):
    """Smallest float64 in [lo, hi] with pred true, for pred monotone
    nondecreasing; None if pred never true on the interval."""
    ilo, ihi = _float_to_ordered_int(lo), _float_to_ordered_int(hi)
    if not pred(_ordered_int_to_float(ihi)):
        return None
    if pred(_ordered_int_to_float(ilo)):
        return _ordered_int_to_float(ilo)
    while ihi - ilo > 1:
        mid = (ilo + ihi) // 2
        if pred(_ordered_int_to_float(mid)):
            ihi = mid
        else:
            ilo = mid
    return _ordered_int_to_float(ihi)


def _sun_vector_f64(sun_azimuth_angle, sun_elevation_angle):
    az = np.radians(np.float64(sun_azimuth_angle))
    zen = np.radians(np.float64(90.0 - np.float64(sun_elevation_angle)))
    return (np.sin(az) * np.sin(zen), np.cos(az) * np.sin(zen),
            np.cos(zen), np.sin(az), np.cos(az))


def _decision_boundaries(sun_azimuth_angle, sun_elevation_angle,
                         min_slope_angle, max_sun_local_inc_angle):
    """Exact float64 decision boundaries in comparison space.

    x_crit: smallest x in [-1, 1] with degrees(arccos(x)) <= max_inc
            (the low-incidence test is x >= x_crit within the domain).
    t_crit: largest t with degrees(arctan(t)) <= min_slope
            (the backslope test is t <= t_crit).
    """
    maxi = float(max_sun_local_inc_angle)
    mins = float(min_slope_angle)

    def p_inc(x):
        with np.errstate(invalid='ignore'):
            return bool(np.degrees(np.arccos(np.float64(x))) <= maxi)

    x_crit = _bisect_smallest_true(p_inc, -1.0, 1.0)
    if x_crit is None:
        x_crit = 2.0  # low-incidence test never true

    def p_slope(t):
        return bool(np.degrees(np.arctan(np.float64(t))) <= mins)

    t_crit = _bisect_largest_true(p_slope, -1.79e308, 1.79e308)
    if t_crit is None:
        t_crit = -1.79e308  # backslope never true -> ~backslope always
    return x_crit, t_crit


@functools.partial(jax.jit, static_argnames=('psx', 'psy'))
def _shadow_comparison_space(dem, tsv_f32, x_crit32, t_crit32,
                             eps_x, eps_t, psx=30, psy=30):
    """Device pass: f32 comparison-space decisions + uncertainty band.

    Returns (shadow, gx, gy, uncertain). The *gradients* — built from
    subtraction and an exact x0.5, so bit-identical to np.gradient — are
    what the host re-decision consumes: XLA strength-reduces division by a
    constant into a reciprocal multiply (~1 ULP off IEEE division), so the
    device tn values are only band-accurate, never handed to the host.
    """
    tsv_x, tsv_y, tsv_z, sin_az, cos_az = tsv_f32
    gy = _np_gradient_axis(dem, 0)
    gx = _np_gradient_axis(dem, 1)
    tn_x = -gx / psx
    tn_y = -gy / -abs(psy)

    norm = jnp.sqrt(tn_x ** 2 + tn_y ** 2 + 1.0)
    x = (tn_x * tsv_x + tn_y * tsv_y + tsv_z) / norm
    t = tn_x * sin_az + tn_y * cos_az

    low_inc = (x >= x_crit32) & (x <= 1.0)
    backslope = t <= t_crit32
    shadow = low_inc | (~backslope)

    # the f32 error of t scales with the terrain-normal magnitude (steep
    # or sentinel-valued DEMs give |tn| >> 1), so the t band widens per
    # pixel; x is normalized, so a constant band suffices
    eps_t_px = eps_t + jnp.float32(_EPS_T_REL) * (jnp.abs(tn_x)
                                                  + jnp.abs(tn_y))
    uncertain = (jnp.abs(x - x_crit32) <= eps_x) | \
                (jnp.abs(x) >= 1.0 - eps_x) | \
                (jnp.abs(t - t_crit32) <= eps_t_px)
    return shadow, gx, gy, uncertain


def _host_decide_f64(tn_x32, tn_y32, sun_azimuth_angle, sun_elevation_angle,
                     min_slope_angle, max_sun_local_inc_angle):
    """Reference-exact float64 decision from float32 terrain normals.

    Replicates the reference's dtype mix under NumPy 2 (dswx_hls.py:
    4245-4283): the normalization factor stays float32, the dot product and
    trig run in float64 (float32 array x float64 scalar promotes)."""
    tn_x = np.asarray(tn_x32, dtype=np.float32)
    tn_y = np.asarray(tn_y32, dtype=np.float32)
    tsv_x, tsv_y, tsv_z, sin_az, cos_az = _sun_vector_f64(
        sun_azimuth_angle, sun_elevation_angle)
    norm = np.sqrt(tn_x ** 2 + tn_y ** 2 + 1)  # float32, like the reference
    with np.errstate(invalid='ignore'):
        inc_deg = np.degrees(np.arccos(
            (tn_x * tsv_x + tn_y * tsv_y + tsv_z) / norm))
        dslope_deg = np.degrees(np.arctan(tn_x * sin_az + tn_y * cos_az))
    low_inc = inc_deg <= float(max_sun_local_inc_angle)
    backslope = dslope_deg <= float(min_slope_angle)
    return low_inc | (~backslope)


def _host_shadow_exact(dem, sun_azimuth_angle, sun_elevation_angle,
                       min_slope_angle, max_sun_local_inc_angle,
                       psx=30, psy=30):
    """Full host recompute with the reference's exact semantics (fallback
    path, and the primary path for float64 DEMs)."""
    g = np.gradient(dem)
    tn_x = -g[1] / psx
    tn_y = -g[0] / -abs(psy)
    if dem.dtype == np.float64:
        tsv_x, tsv_y, tsv_z, sin_az, cos_az = _sun_vector_f64(
            sun_azimuth_angle, sun_elevation_angle)
        norm = np.sqrt(tn_x ** 2 + tn_y ** 2 + 1)
        with np.errstate(invalid='ignore'):
            inc_deg = np.degrees(np.arccos(
                (tn_x * tsv_x + tn_y * tsv_y + tsv_z) / norm))
            dslope_deg = np.degrees(np.arctan(
                tn_x * sin_az + tn_y * cos_az))
        low_inc = inc_deg <= float(max_sun_local_inc_angle)
        backslope = dslope_deg <= float(min_slope_angle)
        return low_inc | (~backslope)
    return _host_decide_f64(tn_x, tn_y, sun_azimuth_angle,
                            sun_elevation_angle, min_slope_angle,
                            max_sun_local_inc_angle)


def compute_opera_shadow_layer_exact(dem, sun_azimuth_angle,
                                     sun_elevation_angle, min_slope_angle,
                                     max_sun_local_inc_angle,
                                     pixel_spacing_x=30, pixel_spacing_y=30,
                                     as_device=False):
    """Shadow mask bit-identical to the reference float64 chain.

    Accepts a host or device DEM. float32 DEMs (the production case —
    Copernicus GLO-30 after cubic warp) run on device with host resolution
    of the epsilon band; float64 DEMs run on host directly. Returns a host
    numpy bool array, or (``as_device=True``) a device bool array — the
    epsilon band is then patched by a device scatter of the host-decided
    values, so the full mask never crosses the (slow) device->host link.
    """
    if isinstance(dem, np.ndarray) and dem.dtype == np.float64:
        out = _host_shadow_exact(dem, sun_azimuth_angle,
                                 sun_elevation_angle, min_slope_angle,
                                 max_sun_local_inc_angle,
                                 pixel_spacing_x, pixel_spacing_y)
        return jnp.asarray(out) if as_device else out

    x_crit, t_crit = _decision_boundaries(
        sun_azimuth_angle, sun_elevation_angle, min_slope_angle,
        max_sun_local_inc_angle)
    tsv64 = _sun_vector_f64(sun_azimuth_angle, sun_elevation_angle)
    tsv32 = tuple(jnp.float32(v) for v in tsv64)
    eps_t = np.float32(_EPS_T_REL * (1.0 + min(abs(t_crit), 1e30)))

    shadow, gx, gy, uncertain = _shadow_comparison_space(
        jnp.asarray(dem, dtype=jnp.float32), tsv32,
        jnp.float32(x_crit), jnp.float32(t_crit),
        jnp.float32(_EPS_X), eps_t,
        psx=pixel_spacing_x, psy=pixel_spacing_y)

    # one small fetch: band indices (+count via fill sentinel)
    idx = jnp.flatnonzero(uncertain, size=_MAX_UNCERTAIN, fill_value=-1)
    idx = np.asarray(idx)
    n_uncertain = int((idx >= 0).sum())

    if n_uncertain >= _MAX_UNCERTAIN:
        # epsilon band overflow (pathological flat-at-threshold DEM):
        # recompute everything on host with reference semantics
        out = _host_shadow_exact(np.asarray(dem, dtype=np.float32),
                                 sun_azimuth_angle, sun_elevation_angle,
                                 min_slope_angle, max_sun_local_inc_angle,
                                 pixel_spacing_x, pixel_spacing_y)
        return jnp.asarray(out) if as_device else out

    decided = None
    if n_uncertain:
        sel = idx[:n_uncertain]
        # recompute tn on host IEEE division (reference semantics) from the
        # bit-exact device gradients
        flat_gx = np.asarray(gx.ravel()[jnp.asarray(sel)],
                             dtype=np.float32)
        flat_gy = np.asarray(gy.ravel()[jnp.asarray(sel)],
                             dtype=np.float32)
        flat_tn_x = -flat_gx / pixel_spacing_x
        flat_tn_y = -flat_gy / -abs(pixel_spacing_y)
        decided = _host_decide_f64(flat_tn_x, flat_tn_y, sun_azimuth_angle,
                                   sun_elevation_angle, min_slope_angle,
                                   max_sun_local_inc_angle)

    if as_device:
        if decided is not None:
            flat = shadow.ravel().at[jnp.asarray(sel)].set(
                jnp.asarray(decided))
            shadow = flat.reshape(shadow.shape)
        return shadow

    shadow = np.array(shadow)  # writable host copy (np.asarray of a jax
    if decided is not None:    # array is a read-only view)
        flat = shadow.ravel()
        flat[sel] = decided
        shadow = flat.reshape(shadow.shape)
    return shadow


def compute_hillshade(dem, sun_azimuth_angle, sun_elevation_angle,
                      pixel_spacing_x=30.0, pixel_spacing_y=-30.0):
    """GDAL gdaldem hillshade (Horn kernel), byte output in 1..255.

    x/y slopes use Horn's 3x3 weights over (ewres, nsres); edges use
    replicate padding (the reference DEM carries a 50 px margin that is
    cropped, so edges are immaterial).
    """
    z = dem.astype(jnp.float32)
    p = jnp.pad(z, 1, mode='edge')
    w = {}
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            w[(dy, dx)] = p[dy:dy + z.shape[0], dx:dx + z.shape[1]]
    # GDAL window layout: rows top->bottom, cols left->right
    x = ((w[(0, 0)] + 2 * w[(1, 0)] + w[(2, 0)])
         - (w[(0, 2)] + 2 * w[(1, 2)] + w[(2, 2)])) / (8.0 * pixel_spacing_x)
    y = ((w[(2, 0)] + 2 * w[(2, 1)] + w[(2, 2)])
         - (w[(0, 0)] + 2 * w[(0, 1)] + w[(0, 2)])) / (8.0 * pixel_spacing_y)

    alt = np.radians(float(sun_elevation_angle))
    az = np.radians(float(sun_azimuth_angle))
    sin_alt = np.sin(alt)
    cos_az_cos_alt = np.cos(az) * np.cos(alt)
    sin_az_cos_alt = np.sin(az) * np.cos(alt)

    xx_plus_yy = x * x + y * y
    cang = (sin_alt - (y * cos_az_cos_alt - x * sin_az_cos_alt)) / \
        jnp.sqrt(1.0 + xx_plus_yy)
    out = jnp.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)
    return jnp.round(out).astype(jnp.uint8)


def compute_otsu_shadow_layer(dem, sun_azimuth_angle, sun_elevation_angle,
                              pixel_spacing_x=30.0, pixel_spacing_y=-30.0):
    """Hillshade + Otsu binarization (True: not shadow)."""
    hs = compute_hillshade(dem, sun_azimuth_angle, sun_elevation_angle,
                           pixel_spacing_x, pixel_spacing_y)
    return otsu_binarize(hs)
