"""Benchmark: full DSWx-HLS science chain throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology: K iterations x B distinct full-chain evaluations (3660 x
3660 int16 bands -> all product layers) run inside ONE jit-compiled
on-device fori_loop with a data dependency between iterations and a
final scalar fetch — so the measurement cannot be fooled by async
dispatch or relay acknowledgment (block_until_ready on tunneled devices
can return before execution finishes; see BENCH_NOTES.md). B defaults
to 12 on TPU — the knee of the measured batch-scaling curve
(PROTEUS_TPU_BENCH_TILES_PER_DISPATCH overrides; BENCH_BATCH.json has
the full B = 1..32 curve — batching amortizes the ~7 ms per-dispatch
overhead that bounds this device, KERNEL_PROFILE.json; the campaign's
--tiles-per-device knob is the production equivalent).
The median of PROTEUS_TPU_BENCH_PASSES timing passes is reported (this
environment's speed varies run-to-run).
On TPU the measured path is the hand-fused Pallas kernel (the default
product path); PROTEUS_TPU_BENCH_PATH=xla benches the jnp chain instead.
The baseline is the reference-equivalent NumPy float64 implementation of
the same chain on this host (the reference publishes no numbers —
BASELINE.md — and its execution model is single-process NumPy).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

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

    # --- device: K chained chains in one dispatch ---------------------------
    # PROTEUS_TPU_BENCH_PATH selects the compute path: 'pallas' (the
    # hand-fused kernel — the default product path on TPU) or 'xla' (the
    # jnp chain). Defaults to pallas on TPU, xla elsewhere.
    config = DswxChainConfig()
    on_tpu = jax.devices()[0].platform == 'tpu'
    path = os.environ.get('PROTEUS_TPU_BENCH_PATH',
                          'pallas' if on_tpu else 'xla')
    # PROTEUS_TPU_BENCH_FLOAT=1: bench the scaled-reflectance (float32)
    # mode — float bands through the float-input kernel / float chain
    bench_float = os.environ.get('PROTEUS_TPU_BENCH_FLOAT') == '1'
    if bench_float:
        bands = [np.float32(0.0001) * b.astype(np.float32)
                 for b in bands]
    # B distinct tiles per dispatch (the campaign's tiles_per_device
    # execution pattern). Derived tiles: band-rolled copies so each
    # tile is distinct without holding B full host copies.
    B = int(os.environ.get('PROTEUS_TPU_BENCH_TILES_PER_DISPATCH',
                           '12' if on_tpu else '1'))
    host = bands + [fmask, invalid]
    dev = [jax.device_put(np.stack([np.roll(a, i, axis=0)
                                    for i in range(B)]))
           for a in host]
    jax.block_until_ready(dev)
    K = int(os.environ.get('PROTEUS_TPU_BENCH_ITERS', '4'))
    N_PASSES = int(os.environ.get('PROTEUS_TPU_BENCH_PASSES', '3'))

    if path == 'pallas':
        from proteus_tpu.ops.pallas.wtr_kernel import make_wtr_kernel
        kernel = make_wtr_kernel(config, compute_browse=True,
                                 interpret=not on_tpu,
                                 float_inputs=bench_float)

        def chain_out(b, g, r, n, s1, s2, fm, inv):
            return kernel(b, g, r, n, s1, s2, fm, inv)
    else:
        def chain_out(b, g, r, n, s1, s2, fm, inv):
            return dswx_chain(b, g, r, n, s1, s2, fm, inv, config)

    def one(k, arrays):
        acc = jnp.int32(0)
        for i in range(B):
            b = arrays[0][i] + k.astype(arrays[0].dtype)
            out = chain_out(b, *[a[i] for a in arrays[1:]])
            acc = acc + sum(jnp.sum(v.astype(jnp.int32))
                            for v in out.values()
                            if hasattr(v, 'ndim') and v.ndim == 2)
        return acc

    # `seed` is a TRACED scalar that is distinct for every timing pass:
    # the axon tunnel has been observed to replay results for an
    # (executable, inputs) pair it has already served (CLAUDE.md), so the
    # per-iteration `k` fold alone — which varies work only WITHIN one
    # dispatch — is not enough. Folding seed*K+k into the data makes
    # every pass a distinct dispatch with distinct inputs.
    @jax.jit
    def loop(seed, *a):
        def body(k, acc):
            return acc + one(seed * jnp.int32(K) + k, a)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    s = loop(jnp.int32(0), *dev)
    _ = int(s)  # compile + first run, forced by the scalar fetch
    per_tile = []
    for p in range(N_PASSES):
        t0 = time.time()
        s = loop(jnp.int32(p + 1), *dev)
        _ = int(s)
        per_tile.append((time.time() - t0) / K / B)
    per_tile.sort()
    device_s = per_tile[len(per_tile) // 2]  # median of N passes
    tiles_per_min = 60.0 / device_s

    record = {
        'metric': 'full_chain_tiles_per_min_3660x3660',
        'value': round(tiles_per_min, 2),
        'unit': 'tiles/min',
        'vs_baseline': round(tiles_per_min / baseline_tiles_per_min, 2),
        'path': path,
        'tiles_per_dispatch': B,
        'n_passes': N_PASSES,
        'pass_s_per_tile': [round(t, 4) for t in per_tile],
    }
    if bench_float:
        record['scaled_float_inputs'] = True
    print(json.dumps(record))


if __name__ == '__main__':
    main()
