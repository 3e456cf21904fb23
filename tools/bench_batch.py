"""Batch-scaling bench: device s/tile as tiles-per-dispatch grows.

VERDICT r2 item 3: `tiles_per_device` > 1 amortizes per-dispatch
overhead (relevant on high-latency links), but device-side batching
efficiency (grid overhead amortization, VMEM pressure at B > 1) had
never been measured on the real chip. This tool runs the campaign
step's exact per-device pattern — a static Python loop of fused-kernel
calls inside ONE jit program — for B = 1, 2, 4 tiles per dispatch with
the forced methodology (K chained evaluations in a fori_loop with a
data dependency + scalar fetch), and prints one JSON line per B plus a
summary artifact BENCH_BATCH.json.

    python tools/bench_batch.py [--iters 4] [--passes 3] [--size 3660]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--passes', type=int, default=3)
    ap.add_argument('--size', type=int, default=3660)
    ap.add_argument('--batches', type=int, nargs='*', default=[1, 2, 4])
    ap.add_argument('--out', default=os.path.join(REPO,
                                                  'BENCH_BATCH.json'))
    ap.add_argument('--scaled', action='store_true',
                    help='bench the scaled-reflectance path: raw int16 '
                         'bands + [B,6] scale/offset device cast + '
                         'float-input kernel (the production '
                         'device_scale campaign pattern)')
    args = ap.parse_args()
    if args.scaled and args.out.endswith('BENCH_BATCH.json'):
        args.out = args.out.replace('BENCH_BATCH.json',
                                    'BENCH_BATCH_SCALED.json')

    import jax
    import jax.numpy as jnp

    from proteus_tpu.models.dswx.chain import DswxChainConfig
    from proteus_tpu.ops.pallas.wtr_kernel import make_wtr_kernel
    from proteus_tpu.utils.compile_cache import enable
    enable()

    on_tpu = jax.devices()[0].platform == 'tpu'
    H = W = args.size
    rng = np.random.default_rng(0)
    cfg = DswxChainConfig()
    kernel = make_wtr_kernel(cfg, minimal_outputs=True,
                             interpret=not on_tpu,
                             float_inputs=args.scaled)

    results = {'device': str(jax.devices()[0]), 'size': args.size,
               'iters': args.iters, 'passes': args.passes,
               'scaled': bool(args.scaled), 'points': []}

    for B in args.batches:
        bands = [np.clip(rng.integers(-2000, 15000, (B, H, W)), 1,
                         None).astype(np.int16) for _ in range(6)]
        fmask = rng.integers(0, 256, (B, H, W)).astype(np.uint8)
        invalid = (rng.random((B, H, W)) < 0.02).astype(np.uint8)
        dev = [jax.device_put(a) for a in bands + [fmask, invalid]]
        if args.scaled:
            # the production device_scale pattern: raw int16 bands +
            # [B, 6] scale/offset vectors, cast on device
            scales = np.full((B, 6), 1e-4, np.float32)
            offsets = np.zeros((B, 6), np.float32)
            dev += [jax.device_put(scales), jax.device_put(offsets)]
        jax.block_until_ready(dev)

        def batched(k, arrays):
            b0 = arrays[0] + k.astype(arrays[0].dtype)
            six = (b0,) + tuple(arrays[1:6])
            fm, inv = arrays[6], arrays[7]
            if args.scaled:
                scales, offsets = arrays[8], arrays[9]
                six = tuple(
                    scales[:, j, None, None]
                    * (x.astype(jnp.float32)
                       - offsets[:, j, None, None])
                    for j, x in enumerate(six))
            acc = jnp.int32(0)
            for i in range(B):
                out = kernel(*[a[i] for a in six], fm[i], inv[i])
                acc = acc + jnp.sum(out['PACKED_A'].astype(jnp.int32)) \
                    + jnp.sum(out['PACKED_B'].astype(jnp.int32))
            return acc

        # `seed` is a distinct TRACED scalar per timing pass: the axon
        # tunnel can replay results for (executable, inputs) pairs it has
        # already served (CLAUDE.md), so every pass must be a distinct
        # dispatch with distinct inputs, not just distinct per-iteration
        # folds inside one dispatch.
        @jax.jit
        def loop(seed, *arrays):
            def body(k, acc):
                return acc + batched(seed * jnp.int32(args.iters) + k,
                                     arrays)
            return jax.lax.fori_loop(0, args.iters, body, jnp.int32(0))

        _ = int(loop(jnp.int32(0), *dev))  # compile + warm
        times = []
        for _p in range(args.passes):
            t0 = time.perf_counter()
            _ = int(loop(jnp.int32(_p + 1), *dev))
            times.append((time.perf_counter() - t0) / args.iters / B)
        times.sort()
        med = times[len(times) // 2]
        point = {'tiles_per_dispatch': B,
                 's_per_tile': round(med, 5),
                 'tiles_per_min': round(60.0 / med, 1),
                 'pass_s_per_tile': [round(t, 5) for t in times]}
        results['points'].append(point)
        print(json.dumps({'metric': 'batched_device_s_per_tile',
                          **point}), flush=True)

    with open(args.out, 'w') as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({'artifact': args.out}))


if __name__ == '__main__':
    main()
