"""Otsu thresholding on device.

Matches the reference implementation (dswx_hls.py:1638-1684): a 256-bin
histogram over [min, max] (NumPy np.histogram binning: half-open bins with
the last bin closed), cumulative class weights/means, and the threshold at
the argmax of the inter-class variance, evaluated at bin midpoints.

The histogram normalization flag in the reference only rescales the
histogram, which leaves the argmax unchanged, so it is irrelevant here.
"""

import jax.numpy as jnp


def otsu_binarize(image):
    """Return image > otsu_threshold(image) as a boolean array."""
    x = image.astype(jnp.float32).ravel()
    bins = 256
    lo = jnp.min(x)
    hi = jnp.max(x)
    span = hi - lo
    # NumPy histogram: idx = (x - lo) / span * bins, last edge inclusive
    idx = jnp.floor((x - lo) / jnp.where(span == 0, 1.0, span) * bins)
    idx = jnp.clip(idx, 0, bins - 1).astype(jnp.int32)
    hist = jnp.zeros(bins, jnp.float32).at[idx].add(1.0)

    edges = lo + span * jnp.arange(bins + 1, dtype=jnp.float32) / bins
    bin_mids = 0.5 * (edges[:-1] + edges[1:])

    weight1 = jnp.cumsum(hist)
    weight2 = jnp.cumsum(hist[::-1])[::-1]
    mean1 = jnp.cumsum(hist * bin_mids) / weight1
    mean2 = (jnp.cumsum((hist * bin_mids)[::-1]) / weight2[::-1])[::-1]

    inter_class_variance = (weight1[:-1] * weight2[1:]
                            * (mean1[:-1] - mean2[1:]) ** 2)
    # NaNs (empty classes) compare false in argmax via nan_to_num
    icv = jnp.nan_to_num(inter_class_variance, nan=-1.0)
    k = jnp.argmax(icv)
    threshold = bin_mids[k]
    return image > threshold
