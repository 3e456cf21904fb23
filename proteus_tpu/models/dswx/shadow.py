"""Terrain shadow layer (SHAD) from a pre-warped DEM, on device.

Two algorithms, selected by runconfig (reference default:
'sun_local_inc_angle'):

- ``compute_opera_shadow_layer``: sun local-incidence angle + directional
  slope thresholds from the DEM gradient (reference
  _compute_opera_shadow_layer, dswx_hls.py:4215-4283). Uses NumPy
  np.gradient semantics (central differences in the interior, one-sided at
  the edges).

- ``compute_hillshade`` + Otsu: GDAL DEMProcessing("hillshade") equivalent
  (Horn's formula, GDAL gdaldem conventions) followed by Otsu binarization
  (reference dswx_hls.py:4177-4212 and :1638-1684).

Both consume a DEM with a margin (DEM_MARGIN_IN_PIXELS) that the caller
crops afterwards, so edge-handling differences never reach the product.
"""

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
