"""Window-sum decimation and block resampling ops.

``decimate_by_summation`` matches the reference's 3x3 summed decimation of
the supersampled WorldCover masks (dswx_hls.py:874-904) for inputs whose
shape is an exact multiple of the window — which is always the case in the
LAND builder (the WorldCover grid is warped to exactly 3x the product grid).

``resample_to_30m`` provides the S30-style 10 m / 20 m -> 30 m band
resampling (area-weighted) for ingesting raw Sentinel-2 grids on device.
"""

import jax.numpy as jnp


def decimate_by_summation(image, size_y: int, size_x: int):
    """Sum-decimate ``image`` by (size_y, size_x) windows.

    Shape must be an exact multiple of the window. Output dtype follows
    jnp sum promotion of the input dtype.
    """
    h, w = image.shape
    if h % size_y or w % size_x:
        raise ValueError(
            f'decimate_by_summation requires exact multiples, got '
            f'{image.shape} with window ({size_y}, {size_x})')
    r = image.reshape(h // size_y, size_y, w // size_x, size_x)
    return r.sum(axis=(1, 3))


def resample_to_30m(band, src_resolution_m: int):
    """Area-weighted resample of a 10 m or 20 m band grid to 30 m.

    10 m -> 30 m is an exact 3x3 mean; 20 m -> 30 m is a 2:3 rational
    resample implemented by 3x nearest upsampling to 10 m (each 20 m pixel
    covers 2x2 of the 10 m grid... we upsample each 20 m pixel to 3x3 of a
    virtual 6.67 m grid) followed by 2x2->... — in practice HLS distributes
    everything at 30 m; this op exists for raw Sentinel-2 L2A ingest
    (BASELINE.json config 2).
    """
    band = jnp.asarray(band)
    if src_resolution_m == 30:
        return band
    if src_resolution_m == 10:
        h, w = band.shape
        h3, w3 = (h // 3) * 3, (w // 3) * 3
        r = band[:h3, :w3].astype(jnp.float32)
        out = r.reshape(h3 // 3, 3, w3 // 3, 3).mean(axis=(1, 3))
        return out
    if src_resolution_m == 20:
        # 2 source pixels -> 3 target pixels per axis is a downsample by 1.5:
        # upsample x3 (to ~6.67 m virtual grid), then average 2x2 blocks of
        # the virtual grid per 30 m target cell -> equivalently repeat x3 and
        # mean-pool 2... 3 target cells cover exactly 2 source cells, so
        # repeat each source pixel 3x and mean-pool windows of 2.
        rep = jnp.repeat(jnp.repeat(band.astype(jnp.float32), 3, axis=0),
                         3, axis=1)
        h, w = rep.shape
        h2, w2 = (h // 2) * 2, (w // 2) * 2
        r = rep[:h2, :w2]
        return r.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
    raise ValueError(f'unsupported source resolution: {src_resolution_m}')
