"""Produce PALLAS_TPU_PARITY.json: kernel-vs-chain parity on real TPU.

Runs the hand-fused Pallas kernel and the XLA jnp chain on the same
randomized full-size (3660^2) inputs on the TPU backend, for both
adjacent-to-cloud modes and all ancillary combinations, and records
per-layer bit-equality. This is the committed evidence behind the
"bit-identical on TPU" claim (the CPU test suite can only exercise the
kernel in interpret mode).

Usage: python tools/pallas_tpu_parity.py [--size 3660]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--size', type=int, default=3660)
    ap.add_argument('--out', default='PALLAS_TPU_PARITY.json')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from proteus_tpu.utils import compile_cache
    compile_cache.enable()
    from proteus_tpu.models.dswx.chain import DswxChainConfig, dswx_chain
    from proteus_tpu.ops.pallas.wtr_kernel import make_wtr_kernel

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(20260816)
    shape = (args.size, args.size)
    bands = [np.clip(rng.integers(-2000, 18000, shape), 1,
                     None).astype(np.int16) for _ in range(6)]
    fmask = rng.integers(0, 256, shape).astype(np.uint8)
    fmask[1000:1400, :] |= 4
    fmask[1180:1220, 500:2500] |= 16
    invalid = rng.random(shape) < 0.03
    ocean = (rng.random(shape) < 0.9).astype(np.uint8)
    shadow = (rng.random(shape) < 0.8).astype(np.uint8)
    lc = rng.choice(np.array([0, 100, 200, 201, 255], np.uint8), shape)

    results = {'platform': platform, 'size': args.size, 'cases': []}
    for mode in ('mask', 'cover', 'ignore'):
        for anc in (False, True):
            cfg = DswxChainConfig(mask_adjacent_to_cloud_mode=mode)
            kernel = make_wtr_kernel(cfg, with_ocean=anc,
                                     with_shadow=anc, with_landcover=anc,
                                     interpret=platform != 'tpu')
            arrs = [jnp.asarray(a) for a in bands] + \
                   [jnp.asarray(fmask), jnp.asarray(invalid)]
            kw = {}
            if anc:
                arrs += [jnp.asarray(ocean), jnp.asarray(shadow),
                         jnp.asarray(lc)]
                kw = dict(ocean_mask=ocean, shadow_layer=shadow,
                          landcover_mask=lc)
            t0 = time.time()
            got = jax.jit(lambda *a: kernel(*a))(*arrs)
            got = jax.tree_util.tree_map(np.asarray, got)
            kernel_s = time.time() - t0
            want = dswx_chain(*bands, fmask, invalid, cfg, **kw)
            mismatches = {
                layer: int((got[layer]
                            != np.asarray(want[layer])).sum())
                for layer in got}
            results['cases'].append({
                'mode': mode, 'ancillaries': anc,
                'kernel_seconds_incl_compile': round(kernel_s, 2),
                'mismatched_pixels': mismatches,
                'bit_identical': not any(mismatches.values()),
            })
            print(f'{mode} anc={anc}: '
                  f'{"OK" if not any(mismatches.values()) else "FAIL"}')

    results['all_bit_identical'] = all(c['bit_identical']
                                       for c in results['cases'])
    with open(args.out, 'w') as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({'all_bit_identical': results['all_bit_identical'],
                      'platform': platform}))


if __name__ == '__main__':
    main()
