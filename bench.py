"""Benchmark: full DSWx-HLS science chain throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is full-chain tiles/min at production size (3660 x 3660 int16
bands -> DIAG/WTR-1/WTR-2/WTR/BWTR/CONF/CLOUD/BROWSE + coverage stats) on
device. The baseline is the reference-equivalent NumPy float64
implementation of the same chain (the reference publishes no numbers —
BASELINE.md — so the baseline is self-measured on this host, matching the
reference's single-process NumPy execution model).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'tests'))
    import oracle

    from proteus_tpu.core.thresholds import HlsThresholds
    from proteus_tpu.models.dswx.chain import DswxChainConfig, dswx_chain

    H = W = 3660
    rng = np.random.default_rng(0)
    bands = [np.clip(rng.integers(-2000, 15000, (H, W)), 1,
                     None).astype(np.int16) for _ in range(6)]
    fmask = rng.integers(0, 256, (H, W)).astype(np.uint8)
    invalid = rng.random((H, W)) < 0.02

    # --- baseline: reference-equivalent NumPy float64 chain ----------------
    t = HlsThresholds()
    tdict = {k: getattr(t, k) for k in t.__dataclass_fields__}
    lists = {0: [224, 160, 96], 2: [224, 160, 96],
             3: [224, 192, 160, 128, 96], 4: [224, 192, 160, 128, 96]}
    t0 = time.time()
    oracle.full_chain(*bands, fmask, invalid, tdict, mode='mask',
                      aerosol_lists=lists)
    baseline_s = time.time() - t0
    baseline_tiles_per_min = 60.0 / baseline_s

    # --- TPU fused chain ----------------------------------------------------
    config = DswxChainConfig()
    fn = jax.jit(lambda *a: dswx_chain(*a, config))
    dev_args = [jax.device_put(a) for a in bands + [fmask, invalid]]
    jax.block_until_ready(dev_args)
    out = jax.block_until_ready(fn(*dev_args))  # compile
    n_iter = 20
    t0 = time.time()
    for _ in range(n_iter):
        out = jax.block_until_ready(fn(*dev_args))
    device_s = (time.time() - t0) / n_iter
    tiles_per_min = 60.0 / device_s

    print(json.dumps({
        'metric': 'full_chain_tiles_per_min_3660x3660',
        'value': round(tiles_per_min, 1),
        'unit': 'tiles/min',
        'vs_baseline': round(tiles_per_min / baseline_tiles_per_min, 1),
    }))


if __name__ == '__main__':
    main()
