"""Diagnostic surface-water tests (DIAG layer) as a fused TPU kernel.

Implements the five DSWE diagnostic tests over the Blue/Green/Red/NIR/SWIR1/
SWIR2 reflectance channels (reference: dswx_hls.py:1840-1916):

    MNDWI = (green - swir1) / (green + swir1)
    MBSRV = green + red
    MBSRN = nir + swir1
    AWEsh = blue + 2.5*green - 1.5*MBSRN - 0.25*swir2
    NDVI  = (nir - red) / (nir + red)

    bit 0: MNDWI > wigt
    bit 1: MBSRV > MBSRN
    bit 2: AWEsh > awgt
    bit 3: MNDWI > pswt_1_mndwi and swir1 < pswt_1_swir1
           and nir < pswt_1_nir and ndvi < pswt_1_ndvi
    bit 4: MNDWI > pswt_2_mndwi and blue < pswt_2_blue
           and swir1 < pswt_2_swir1 and swir2 < pswt_2_swir2
           and nir < pswt_2_nir

For integer (unscaled) reflectance inputs — the production default — every
comparison is evaluated in exact int32 rational arithmetic, which is
*bit-identical* to the reference's NumPy float64 evaluation including its
int16 overflow-wrap behavior for MBSRV/MBSRN and the MNDWI/NDVI numerators
and denominators (NumPy keeps int16 + int16 in int16), and its inf/NaN
semantics for zero denominators. See proteus_tpu.core.thresholds.

For float (pre-scaled) inputs, tests run in float32 on the VPU.
"""

import jax.numpy as jnp
import numpy as np

from proteus_tpu.core.thresholds import HlsThresholds, ExactThresholds

_I32 = jnp.int32


def _ratio_gt_exact(num, den, p, q):
    """num/den > p/q with float64-division semantics (num, den: int32)."""
    qnum = q * num
    pden = p * den
    return jnp.where(den > 0, qnum > pden,
                     jnp.where(den < 0, qnum < pden, num > 0))


def _ratio_lt_exact(num, den, p, q):
    """num/den < p/q with float64-division semantics."""
    qnum = q * num
    pden = p * den
    return jnp.where(den > 0, qnum < pden,
                     jnp.where(den < 0, qnum > pden, num < 0))


def _scalar_lt_exact(band_i32, p, q):
    """band < p/q for integer band values."""
    return band_i32 * q < p


def _diag_tests_int(blue, green, red, nir, swir1, swir2,
                    et: ExactThresholds):
    """Integer-exact diagnostic tests. Inputs are int16 arrays."""
    # int16 wrap-around sums/differences, matching NumPy int16 arithmetic
    # (reference computes green-swir1 etc. on int16 arrays; dswx_hls.py:1872)
    i16 = jnp.int16
    mndwi_num = (green - swir1).astype(_I32)
    mndwi_den = (green + swir1).astype(_I32)
    mbsrv = (green + red)  # int16, wraps
    mbsrn = (nir + swir1)  # int16, wraps
    ndvi_num = (nir - red).astype(_I32)
    ndvi_den = (nir + red).astype(_I32)

    b32 = blue.astype(_I32)
    g32 = green.astype(_I32)
    s1_32 = swir1.astype(_I32)
    s2_32 = swir2.astype(_I32)
    n32 = nir.astype(_I32)
    r32 = red.astype(_I32)

    # AWEsh * 4 is an exact integer: blue + 2.5g - 1.5*mbsrn - 0.25*s2
    # (mbsrn wraps in int16 first, as in the reference; the rest are exact
    # float64 ops on integers, all multiples of 0.25)
    awesh4 = 4 * b32 + 10 * g32 - 6 * mbsrn.astype(_I32) - s2_32

    need_float = not all([et.wigt[2], et.awgt[2], et.pswt_1_mndwi[2],
                          et.pswt_1_nir[2], et.pswt_1_swir1[2],
                          et.pswt_1_ndvi[2], et.pswt_2_mndwi[2],
                          et.pswt_2_blue[2], et.pswt_2_nir[2],
                          et.pswt_2_swir1[2], et.pswt_2_swir2[2]])
    if need_float:
        # fall back entirely to float32 (rare: only for thresholds that are
        # not exact decimals)
        return _diag_tests_float(b32.astype(jnp.float32),
                                 g32.astype(jnp.float32),
                                 r32.astype(jnp.float32),
                                 n32.astype(jnp.float32),
                                 s1_32.astype(jnp.float32),
                                 s2_32.astype(jnp.float32),
                                 et.float_values,
                                 mbsrv_i=mbsrv, mbsrn_i=mbsrn,
                                 mndwi_num=mndwi_num, mndwi_den=mndwi_den,
                                 ndvi_num=ndvi_num, ndvi_den=ndvi_den,
                                 awesh4=awesh4)

    t1 = _ratio_gt_exact(mndwi_num, mndwi_den, *et.wigt[:2])
    t2 = mbsrv > mbsrn  # pure int16 comparison, always exact
    p, q = et.awgt[:2]
    t3 = awesh4 * q > 4 * p
    t4 = (_ratio_gt_exact(mndwi_num, mndwi_den, *et.pswt_1_mndwi[:2]) &
          _scalar_lt_exact(s1_32, *et.pswt_1_swir1[:2]) &
          _scalar_lt_exact(n32, *et.pswt_1_nir[:2]) &
          _ratio_lt_exact(ndvi_num, ndvi_den, *et.pswt_1_ndvi[:2]))
    t5 = (_ratio_gt_exact(mndwi_num, mndwi_den, *et.pswt_2_mndwi[:2]) &
          _scalar_lt_exact(b32, *et.pswt_2_blue[:2]) &
          _scalar_lt_exact(s1_32, *et.pswt_2_swir1[:2]) &
          _scalar_lt_exact(s2_32, *et.pswt_2_swir2[:2]) &
          _scalar_lt_exact(n32, *et.pswt_2_nir[:2]))
    return t1, t2, t3, t4, t5


def _diag_tests_float(blue, green, red, nir, swir1, swir2,
                      t: HlsThresholds, mbsrv_i=None, mbsrn_i=None,
                      mndwi_num=None, mndwi_den=None,
                      ndvi_num=None, ndvi_den=None, awesh4=None):
    """float32 diagnostic tests (pre-scaled reflectance inputs).

    When called as the fallback for integer inputs, the int16-wrapped
    intermediates are passed in so the overflow behavior still matches.
    """
    if mndwi_num is None:
        mndwi_num, mndwi_den = green - swir1, green + swir1
        ndvi_num, ndvi_den = nir - red, nir + red
        mbsrv_i = green + red
        mbsrn_i = nir + swir1
        awesh4 = None
    mndwi = mndwi_num.astype(jnp.float32) / mndwi_den.astype(jnp.float32)
    ndvi = ndvi_num.astype(jnp.float32) / ndvi_den.astype(jnp.float32)
    if awesh4 is not None:
        awesh = 0.25 * awesh4.astype(jnp.float32)
    else:
        mbsrn_f = mbsrn_i.astype(jnp.float32)
        awesh = blue + 2.5 * green - 1.5 * mbsrn_f - 0.25 * swir2

    t1 = mndwi > t.wigt
    t2 = mbsrv_i > mbsrn_i
    t3 = awesh > t.awgt
    t4 = ((mndwi > t.pswt_1_mndwi) & (swir1 < t.pswt_1_swir1) &
          (nir < t.pswt_1_nir) & (ndvi < t.pswt_1_ndvi))
    t5 = ((mndwi > t.pswt_2_mndwi) & (blue < t.pswt_2_blue) &
          (swir1 < t.pswt_2_swir1) & (swir2 < t.pswt_2_swir2) &
          (nir < t.pswt_2_nir))
    return t1, t2, t3, t4, t5


def compute_diagnostic_tests(blue, green, red, nir, swir1, swir2,
                             hls_thresholds: HlsThresholds):
    """Compute the 5-bit diagnostic layer (decimal representation, uint16).

    Matches reference _compute_diagnostic_tests (dswx_hls.py:1840-1916).
    Integer inputs use the exact int32 path; float inputs use float32.
    """
    if jnp.issubdtype(jnp.asarray(blue).dtype, jnp.integer):
        et = ExactThresholds.from_thresholds(hls_thresholds)
        tests = _diag_tests_int(blue, green, red, nir, swir1, swir2, et)
    else:
        tests = _diag_tests_float(blue, green, red, nir, swir1, swir2,
                                  hls_thresholds)
    t1, t2, t3, t4, t5 = tests
    diag = (t1.astype(jnp.uint16)
            + (t2.astype(jnp.uint16) << 1)
            + (t3.astype(jnp.uint16) << 2)
            + (t4.astype(jnp.uint16) << 3)
            + (t5.astype(jnp.uint16) << 4))
    return diag


def get_binary_representation(diagnostic_layer_decimal, nbits=6):
    """DIAG decimal (0..32) -> pseudo-binary decimal-digit representation.

    e.g. 0b10110 (22) -> 10110; the 6th bit (fill, 32) -> 65535.
    Matches reference _get_binary_representation (dswx_hls.py:4286-4317).
    """
    d = diagnostic_layer_decimal.astype(jnp.int32)
    out = jnp.zeros_like(d)
    for i in range(min(nbits, 5)):
        out = out + ((d >> i) & 1) * (10 ** i)
    if nbits > 5:
        out = jnp.where((d >> 5) & 1, 65535, out)
    return out.astype(jnp.uint16)


def binary_representation_lut():
    """33-entry uint16 LUT equivalent of get_binary_representation."""
    lut = np.zeros(33, dtype=np.uint16)
    for v in range(32):
        lut[v] = sum(((v >> i) & 1) * 10 ** i for i in range(5))
    lut[32] = 65535
    return lut
