"""On-TPU verification of the exact otsu-branch hillshade.

The device hillshade runs in double-double float32 (error-free
transforms; valid only where f32 add/sub/mul are IEEE-exact — verified
for this chip by tools/scaled_tpu_parity.py) and brackets GDAL's
float->Byte map at v +- E, host-resolving the undecidable band in
float64. This tool executes that path on the real chip at full
production size and compares bitwise against the host float64 oracle
(`_host_hillshade_gdal`), then runs the complete otsu shadow mask
against the host-side float64 chain. Also records the measured
uncertainty-band population (the pixels that needed the host) and
wall-clock. Writes HILLSHADE_TPU_PARITY.json at the repo root.

Run on TPU:  python tools/hillshade_tpu_parity.py [--size N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)


def terrains(size):
    rng = np.random.default_rng(20260818)
    base = rng.normal(0, 1, (size, size)).cumsum(0).cumsum(1)
    smooth = (base / np.abs(base).max() * 800 + 200).astype(np.float32)
    plateau = (6000.0 + rng.normal(0, 2.0, (size, size))).astype(
        np.float32)  # high-altitude, worst f32 cancellation
    holed = smooth.copy()
    holed[rng.random((size, size)) < 0.05] = np.nan
    col = np.arange(size, dtype=np.float64)
    sweep = np.tile((0.002 * col ** 2).astype(np.float32), (size, 1))
    return {'smooth': smooth, 'plateau_6000m': plateau,
            'nan_holed': holed, 'quadratic_sweep': sweep}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--size', type=int, default=3760,
                    help='tile edge incl. DEM margin (default 3760)')
    ap.add_argument('--out', default=os.path.join(
        _root, 'HILLSHADE_TPU_PARITY.json'))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from proteus_tpu.models.dswx import shadow as sh

    dev = jax.devices()[0]
    results = {'device': str(dev), 'platform': dev.platform,
               'size': args.size, 'cases': []}

    # d2h through the axon tunnel is orders of magnitude slower than
    # h2d, so the comparison itself runs ON DEVICE: upload the host
    # oracle (fast), fetch only scalar mismatch counts. All cases share
    # one (shape, psx, psy) -> a single remote compile per graph.
    count_mism = jax.jit(lambda a, b: jnp.sum(a != b))
    count_band = jax.jit(jnp.sum)

    geoms = [(135.0, 45.0), (277.3, 18.0), (80.0, 70.0)]
    for name, dem in terrains(args.size).items():
        for az, elev in geoms:
            t0 = time.monotonic()
            want = sh._host_hillshade_gdal(dem, az, elev, 30.0, -30.0)
            t_host = time.monotonic() - t0

            ddem = jnp.asarray(dem)
            ddem.block_until_ready()
            t0 = time.monotonic()
            got_dev = sh.compute_hillshade_exact(ddem, az, elev,
                                                 as_device=True)
            got_dev.block_until_ready()
            t_dev = time.monotonic() - t0
            mism = int(count_mism(got_dev, jnp.asarray(want)))

            # band population, measured separately on device
            consts_dd = sh._hillshade_consts_dd(az, elev)
            _, unc = sh._hillshade_comparison_space(
                ddem, consts_dd, psx=30.0, psy=-30.0)
            n_band = int(count_band(unc))

            # otsu mask through the full chain, compared on device
            twant_mask = want > sh._otsu_threshold_f64(
                np.bincount(want.ravel(), minlength=256))
            tgot = sh.compute_otsu_shadow_layer_exact(
                ddem, az, elev, as_device=True)
            otsu_mism = int(count_mism(tgot, jnp.asarray(twant_mask)))
            case = {'terrain': name, 'az': az, 'elev': elev,
                    'mismatched_bytes': mism,
                    'otsu_mask_mismatches': otsu_mism,
                    'band_pixels': n_band,
                    'band_frac': n_band / dem.size,
                    'device_s': round(t_dev, 3),
                    'host_oracle_s': round(t_host, 3)}
            results['cases'].append(case)
            print(case, flush=True)

    results['total_mismatches'] = sum(
        c['mismatched_bytes'] + c['otsu_mask_mismatches']
        for c in results['cases'])
    results['max_band_frac'] = max(c['band_frac']
                                   for c in results['cases'])
    with open(args.out, 'w') as f:
        json.dump(results, f, indent=1)
    print(f'wrote {args.out}: total_mismatches='
          f'{results["total_mismatches"]}')
    return 0 if results['total_mismatches'] == 0 else 1


if __name__ == '__main__':
    sys.exit(main())
