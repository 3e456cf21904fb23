"""Fused Pallas kernel parity vs the jnp chain (interpret mode on CPU)."""

import numpy as np
import pytest

from proteus_tpu.core import constants as C
from proteus_tpu.models.dswx.chain import DswxChainConfig, dswx_chain
from proteus_tpu.ops.pallas.wtr_kernel import (_closed_form_interpret,
                                               make_wtr_kernel)

RNG = np.random.default_rng(21)


def test_closed_form_interpretation_matches_lut():
    """The popcount rewrite must reproduce all 32 LUT entries."""
    import jax.numpy as jnp
    vals = np.arange(32, dtype=np.int32)
    bits = [(vals >> i) & 1 for i in range(5)]
    got = np.asarray(_closed_form_interpret(
        *[jnp.asarray(b.astype(bool)).reshape(4, 8) for b in bits]))
    lut = C.build_interpretation_lut()
    np.testing.assert_array_equal(got.ravel(), lut[:32])


@pytest.mark.parametrize('mode', ['mask', 'ignore', 'cover'])
def test_kernel_matches_chain(mode):
    cfg = DswxChainConfig(mask_adjacent_to_cloud_mode=mode)
    shape = (64, 128)
    bands = [np.clip(RNG.integers(-2000, 18000, shape), 1,
                     None).astype(np.int16) for _ in range(6)]
    fmask = RNG.integers(0, 256, shape).astype(np.uint8)
    invalid = RNG.random(shape) < 0.05
    ocean = (RNG.random(shape) < 0.9).astype(np.uint8)
    shadow = (RNG.random(shape) < 0.8).astype(np.uint8)
    lc = RNG.choice(np.array([0, 100, 200, 201, 255], np.uint8), shape)

    kernel = make_wtr_kernel(cfg, with_ocean=True, with_shadow=True,
                             with_landcover=True, block_rows=32,
                             interpret=True)
    import jax.numpy as jnp
    got = kernel(*[jnp.asarray(a) for a in bands], jnp.asarray(fmask),
                 jnp.asarray(invalid), jnp.asarray(ocean),
                 jnp.asarray(shadow), jnp.asarray(lc))
    want = dswx_chain(*bands, fmask, invalid, cfg, ocean_mask=ocean,
                      shadow_layer=shadow, landcover_mask=lc)
    for layer in ('DIAG', 'WTR-1', 'WTR-2', 'WTR', 'BWTR', 'CONF',
                  'CLOUD', 'BROWSE'):
        np.testing.assert_array_equal(np.asarray(got[layer]),
                                      np.asarray(want[layer]),
                                      err_msg=f'{layer} mode={mode}')


@pytest.mark.parametrize('mode', ['mask', 'cover'])
def test_float_inputs_kernel_matches_chain(mode):
    """Scaled-reflectance (float32) kernel path vs the jnp float chain,
    with green pushed onto the MNDWI rounding boundary so the exact
    boundary sign tests are actually load-bearing."""
    cfg = DswxChainConfig(mask_adjacent_to_cloud_mode=mode)
    shape = (64, 128)
    bands = [(0.0001 * (np.clip(RNG.integers(-2000, 18000, shape), 1,
                                None).astype(np.float32)))
             for _ in range(6)]
    # adversarial: green within +-2 f32 ULPs of the wigt boundary
    # (mndwi = (g-s1)/(g+s1) == m  <=>  g = s1*(1+m)/(1-m))
    t32 = np.float32(cfg.thresholds.wigt)
    m = (np.float64(t32) + np.float64(
        np.nextafter(t32, np.float32(np.inf)))) * 0.5
    g0 = (bands[4].astype(np.float64) * (1 + m) / (1 - m)).astype(
        np.float32)
    steps = RNG.integers(-2, 3, shape)
    g = g0.copy()
    for _ in range(2):
        g = np.where(steps > 0, np.nextafter(g, np.float32(np.inf)), g)
        g = np.where(steps < 0, np.nextafter(g, np.float32(-np.inf)), g)
        steps = steps - np.sign(steps)
    bands[1] = g.astype(np.float32)
    fmask = RNG.integers(0, 256, shape).astype(np.uint8)
    invalid = RNG.random(shape) < 0.05
    ocean = (RNG.random(shape) < 0.9).astype(np.uint8)
    shadow = (RNG.random(shape) < 0.8).astype(np.uint8)
    lc = RNG.choice(np.array([0, 100, 200, 201, 255], np.uint8), shape)

    kernel = make_wtr_kernel(cfg, with_ocean=True, with_shadow=True,
                             with_landcover=True, block_rows=32,
                             interpret=True, float_inputs=True)
    import jax.numpy as jnp
    got = kernel(*[jnp.asarray(a) for a in bands], jnp.asarray(fmask),
                 jnp.asarray(invalid), jnp.asarray(ocean),
                 jnp.asarray(shadow), jnp.asarray(lc))
    want = dswx_chain(*bands, fmask, invalid, cfg, ocean_mask=ocean,
                      shadow_layer=shadow, landcover_mask=lc)
    for layer in ('DIAG', 'WTR-1', 'WTR-2', 'WTR', 'BWTR', 'CONF',
                  'CLOUD', 'BROWSE'):
        np.testing.assert_array_equal(np.asarray(got[layer]),
                                      np.asarray(want[layer]),
                                      err_msg=f'{layer} mode={mode}')


def test_kernel_cover_blob_propagation():
    """'cover' dilation across block boundaries: snow blobs next to
    cloud-adjacent areas must grow identically to the scipy-semantics jnp
    chain even when the 10+7-step growth spans halo rows."""
    cfg = DswxChainConfig(mask_adjacent_to_cloud_mode='cover')
    shape = (160, 128)
    bands = [np.clip(RNG.integers(-2000, 18000, shape), 1,
                     None).astype(np.int16) for _ in range(6)]
    # structured fmask: a snow stripe crossing block boundaries inside a
    # large adjacent-to-cloud field
    fmask = np.zeros(shape, np.uint8)
    fmask[:, :] = 4                      # adjacent-to-cloud everywhere
    fmask[30:34, :] |= 16                # snow stripe at rows 30-33
    fmask[95:97, 40:90] |= 16            # blob spanning the 96-row split
    fmask[60:70, 60:70] |= 2             # a cloud block
    invalid = np.zeros(shape, bool)
    kernel = make_wtr_kernel(cfg, block_rows=32, interpret=True)
    import jax.numpy as jnp
    got = kernel(*[jnp.asarray(a) for a in bands], jnp.asarray(fmask),
                 jnp.asarray(invalid))
    want = dswx_chain(*bands, fmask, invalid, cfg)
    for layer in ('CLOUD', 'WTR', 'BWTR', 'CONF'):
        np.testing.assert_array_equal(np.asarray(got[layer]),
                                      np.asarray(want[layer]),
                                      err_msg=layer)


def test_kernel_minimal_no_ancillaries():
    cfg = DswxChainConfig()
    shape = (96, 64)
    bands = [np.clip(RNG.integers(-2000, 18000, shape), 1,
                     None).astype(np.int16) for _ in range(6)]
    fmask = RNG.integers(0, 256, shape).astype(np.uint8)
    invalid = np.zeros(shape, bool)
    kernel = make_wtr_kernel(cfg, block_rows=32, interpret=True)
    import jax.numpy as jnp
    got = kernel(*[jnp.asarray(a) for a in bands], jnp.asarray(fmask),
                 jnp.asarray(invalid))
    want = dswx_chain(*bands, fmask, invalid, cfg)
    for layer in ('DIAG', 'WTR-1', 'WTR-2', 'WTR', 'BWTR', 'CONF',
                  'CLOUD', 'BROWSE'):
        np.testing.assert_array_equal(np.asarray(got[layer]),
                                      np.asarray(want[layer]),
                                      err_msg=layer)


def test_kernel_rejects_inexact_thresholds():
    from proteus_tpu.core.thresholds import HlsThresholds
    with pytest.raises(ValueError):
        make_wtr_kernel(DswxChainConfig(
            thresholds=HlsThresholds(wigt=0.1 + 1e-13)))
