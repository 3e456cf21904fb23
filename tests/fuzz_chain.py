"""Randomized bit-exactness fuzz: device chain vs float64 oracle.

Not collected by pytest (run manually):
    python tests/fuzz_chain.py [n_iterations]

Each iteration draws random band statistics (including int16-extreme and
near-threshold regimes), random fmask/invalid/ancillary masks, a random
adjacent-to-cloud mode, and random (exact-decimal) thresholds, then
asserts every product layer is bit-identical to the oracle.
"""

import sys
import os

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))  # repo root for proteus_tpu

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')

import oracle  # noqa: E402
from proteus_tpu.core.thresholds import HlsThresholds  # noqa: E402
from proteus_tpu.models.dswx.chain import (DswxChainConfig,  # noqa: E402
                                           dswx_chain)


def random_thresholds(rng):
    def dec(lo, hi, digits):
        return round(float(rng.uniform(lo, hi)), digits)
    return HlsThresholds(
        wigt=dec(-0.5, 0.5, 3), awgt=dec(-200, 200, 2),
        pswt_1_mndwi=dec(-0.9, 0.2, 3), pswt_1_nir=int(rng.integers(
            200, 4000)),
        pswt_1_swir1=int(rng.integers(200, 4000)),
        pswt_1_ndvi=dec(0.1, 0.9, 3),
        pswt_2_mndwi=dec(-0.9, 0.2, 3),
        pswt_2_blue=int(rng.integers(200, 4000)),
        pswt_2_nir=int(rng.integers(500, 6000)),
        pswt_2_swir1=int(rng.integers(500, 6000)),
        pswt_2_swir2=int(rng.integers(200, 4000)),
        lcmask_nir=int(rng.integers(400, 3000)))


def one_iteration(seed):
    rng = np.random.default_rng(seed)
    shape = (int(rng.integers(16, 160)), int(rng.integers(16, 160)))
    regime = rng.integers(0, 3)
    lo, hi = [(-2000, 18000), (-32768, 32767), (1, 400)][regime]
    bands = [rng.integers(lo, hi, shape).astype(np.int16)
             for _ in range(6)]
    bands = [np.clip(b, 1, None) for b in bands]
    fmask = rng.integers(0, 256, shape).astype(np.uint8)
    invalid = rng.random(shape) < rng.uniform(0, 0.2)
    ocean = (rng.random(shape) < 0.9).astype(np.uint8) \
        if rng.random() < 0.5 else None
    shadow = (rng.random(shape) < 0.8).astype(np.uint8) \
        if rng.random() < 0.5 else None
    lc = rng.choice(np.array([0, 5, 100, 123, 200, 201, 255],
                             np.uint8), shape) \
        if rng.random() < 0.5 else None
    mode = ['mask', 'ignore', 'cover'][int(rng.integers(0, 3))]
    t = random_thresholds(rng)
    tdict = {k: getattr(t, k) for k in t.__dataclass_fields__}

    cfg = DswxChainConfig(thresholds=t, mask_adjacent_to_cloud_mode=mode)
    got = dswx_chain(*bands, fmask, invalid, cfg, ocean_mask=ocean,
                     shadow_layer=shadow, landcover_mask=lc)
    lists = {0: list(cfg.aerosol_not_water_fmask_values),
             2: list(cfg.aerosol_moderate_conf_fmask_values),
             3: list(cfg.aerosol_psw_conservative_fmask_values),
             4: list(cfg.aerosol_psw_aggressive_fmask_values)}
    want = oracle.full_chain(*bands, fmask, invalid, tdict, mode=mode,
                             aerosol_lists=lists, ocean_mask=ocean,
                             shadow=shadow, landcover=lc)
    for layer in ('DIAG', 'WTR-1', 'WTR-2', 'WTR', 'BWTR', 'CONF',
                  'CLOUD'):
        a = np.asarray(got[layer])
        b = want[layer]
        if not (a == b).all():
            bad = int((a != b).sum())
            raise AssertionError(
                f'seed={seed} layer={layer} mode={mode} shape={shape} '
                f'regime={regime}: {bad} mismatches; thresholds={tdict}')


def one_shadow_iteration(seed, ref):
    """Fuzz compute_opera_shadow_layer_exact against the reference's
    executing float64 chain over synthetic DEMs (smooth, rough, quantized,
    NaN-holed) and sun geometries, including near-tie thresholds."""
    from proteus_tpu.models.dswx.shadow import compute_opera_shadow_layer_exact
    rng = np.random.default_rng(seed)
    shape = (int(rng.integers(16, 200)), int(rng.integers(16, 200)))
    kind = rng.integers(0, 4)
    if kind == 0:      # smooth correlated terrain
        dem = rng.normal(0, 1, shape).cumsum(0).cumsum(1)
        dem = dem / max(1e-9, np.abs(dem).max()) * rng.uniform(10, 5000)
    elif kind == 1:    # rough noise
        dem = rng.normal(0, rng.uniform(1, 500), shape)
    elif kind == 2:    # quantized (integer-metre DEM) -> exact ties
        dem = rng.integers(0, 50, shape).astype(np.float64) * 30.0
    else:              # flat with NaN holes
        dem = np.full(shape, float(rng.uniform(0, 1000)))
        dem[rng.random(shape) < 0.1] = np.nan
    dem = dem.astype(np.float32)
    az = float(rng.uniform(0, 360))
    elev = float(rng.uniform(1, 89))
    mins = float(rng.uniform(-45, 0))
    maxi = float(rng.uniform(1, 89))
    if rng.random() < 0.3:
        maxi = 90.0 - elev  # inc == max_inc ties on flat ground
    want = ref._compute_opera_shadow_layer(dem, az, elev, mins, maxi)
    got = compute_opera_shadow_layer_exact(dem, az, elev, mins,
                                           maxi).astype(bool)
    flips = int((got != want).sum())
    if flips:
        raise AssertionError(
            f'shadow seed={seed} kind={kind} az={az} elev={elev} '
            f'mins={mins} maxi={maxi}: {flips} boolean flips')


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    for i in range(n):
        one_iteration(1000 + i)
        if (i + 1) % 25 == 0:
            print(f'{i + 1}/{n} iterations bit-exact', flush=True)
    print(f'fuzz complete: {n} iterations, all layers bit-exact')

    import refbridge
    ref = refbridge.load_reference_dswx()
    if ref is None:
        print('reference checkout unavailable: shadow fuzz skipped')
        return
    for i in range(n):
        one_shadow_iteration(5000 + i, ref)
        if (i + 1) % 25 == 0:
            print(f'{i + 1}/{n} shadow iterations bit-exact', flush=True)
    print(f'shadow fuzz complete: {n} iterations, 0 boolean flips vs the '
          'reference float64 chain')


if __name__ == '__main__':
    main()
