"""Attribute the fused Pallas kernel's time: bandwidth vs compute.

VERDICT round 2 flagged that "pins the roofline" was asserted, not shown:
294 MB in 8 ms is ~37 GB/s — single-digit percent of a v5e's HBM
bandwidth — so the kernel is likely VPU-compute-bound, not
bandwidth-bound. This tool measures, on the real TPU with the forced
methodology (K chained evaluations inside one jitted fori_loop with a
data dependency + scalar fetch):

  1. traffic floor  — a null Pallas kernel that loads all 8 input blocks
    and stores one uint8 output (minimum possible DMA + grid overhead
    for the same input footprint);
  2. the production kernel variants — int full (8 outs), int minimal
    (2 packed outs), scaled-float full/minimal, 'cover' mode;
  3. a block_rows sweep for the minimal int kernel;
  4. the XLA jnp chain for scale.

compute_share = 1 - floor/variant_time tells how much of each variant is
NOT explainable by input traffic; the deltas between variants attribute
output traffic and per-stage compute. Writes KERNEL_PROFILE.json at the
repo root. Optionally takes a jax.profiler device trace
(--trace-dir DIR) if the tunneled runtime supports it.
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def _timed_loop(fn, dev_args, iters, n_passes):
    """Median seconds of one fn evaluation, forced methodology."""
    import jax
    import jax.numpy as jnp

    def one(k, args):
        b = args[0] + k.astype(args[0].dtype)
        out = fn(b, *args[1:])
        vals = out.values() if isinstance(out, dict) else [out]
        return sum(jnp.sum(v.astype(jnp.int32)) for v in vals
                   if hasattr(v, 'ndim') and v.ndim == 2)

    # `seed` is a distinct TRACED scalar per timing pass: the axon tunnel
    # can replay results for (executable, inputs) pairs it has already
    # served (CLAUDE.md), so every pass must be a distinct dispatch with
    # distinct inputs — the per-iteration k fold alone only varies work
    # WITHIN a dispatch.
    @jax.jit
    def loop(seed, *args):
        def body(k, acc):
            return acc + one(seed * jnp.int32(iters) + k, args)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    _ = int(loop(jnp.int32(0), *dev_args))  # compile + warm
    times = []
    for _p in range(n_passes):
        t0 = time.perf_counter()
        _ = int(loop(jnp.int32(_p + 1), *dev_args))
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2], times


def _null_kernel(h, w, block_rows, n_inputs):
    """Minimum-work kernel with the production input footprint: loads
    every input block, folds each into one int32 lane-sum, stores one
    uint8 output block."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(*refs):
        ins = refs[:-1]
        out = refs[-1]
        acc = jnp.zeros_like(ins[0][:], jnp.int32)
        for r in ins:
            acc = acc ^ r[:].astype(jnp.int32)
        out[:] = acc.astype(jnp.uint8)

    grid = (pl.cdiv(h, block_rows),)
    bspec = pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=grid, in_specs=[bspec] * n_inputs,
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--passes', type=int, default=3)
    ap.add_argument('--size', type=int, default=3660)
    ap.add_argument('--trace-dir', default=None,
                    help='also capture a jax.profiler device trace here')
    ap.add_argument('--out', default=os.path.join(REPO,
                                                  'KERNEL_PROFILE.json'))
    args = ap.parse_args()

    import jax

    from proteus_tpu.models.dswx.chain import DswxChainConfig, dswx_chain
    from proteus_tpu.ops.pallas.wtr_kernel import make_wtr_kernel
    from proteus_tpu.utils.compile_cache import enable
    enable()

    on_tpu = jax.devices()[0].platform == 'tpu'
    H = W = args.size
    rng = np.random.default_rng(0)
    bands = [np.clip(rng.integers(-2000, 15000, (H, W)), 1,
                     None).astype(np.int16) for _ in range(6)]
    fmask = rng.integers(0, 256, (H, W)).astype(np.uint8)
    invalid = (rng.random((H, W)) < 0.02).astype(np.uint8)
    dev_int = [jax.device_put(a) for a in bands + [fmask, invalid]]
    fbands = [np.float32(0.0001) * b.astype(np.float32) for b in bands]
    dev_float = [jax.device_put(a) for a in fbands + [fmask, invalid]]
    jax.block_until_ready(dev_int + dev_float)

    cfg = DswxChainConfig()
    cfg_cover = DswxChainConfig(mask_adjacent_to_cloud_mode='cover')
    results = {'device': str(jax.devices()[0]), 'size': args.size,
               'iters': args.iters, 'passes': args.passes,
               'variants': {}}

    int16_in_mb = (6 * 2 + 1 + 1) * H * W / 1e6
    f32_in_mb = (6 * 4 + 1 + 1) * H * W / 1e6

    def record(name, median, times, in_mb, out_mb, note=''):
        results['variants'][name] = {
            's_per_tile': round(median, 5),
            'pass_s': [round(t, 5) for t in times],
            'hbm_in_mb': round(in_mb, 1), 'hbm_out_mb': round(out_mb, 1),
            'effective_gbps': round((in_mb + out_mb) / 1e3 / median, 1),
            'note': note,
        }
        print(f'{name}: {median*1e3:.2f} ms  '
              f'({(in_mb+out_mb)/1e3/median:.0f} GB/s effective)',
              flush=True)

    interp = not on_tpu

    # 1. traffic floor
    null8 = _null_kernel(H, W, 256, 8)
    m, ts = _timed_loop(lambda *a: {'o': null8(*a)}, dev_int,
                        args.iters, args.passes)
    record('floor_int16_inputs', m, ts, int16_in_mb, H * W / 1e6,
           'null kernel: 8 input loads + 1 uint8 store')
    mf, ts = _timed_loop(lambda *a: {'o': null8(*a)}, dev_float,
                         args.iters, args.passes)
    record('floor_f32_inputs', mf, ts, f32_in_mb, H * W / 1e6,
           'same null kernel over float32 bands')

    # 2. production kernels
    variants = [
        ('int_full', cfg, dict(compute_browse=True), dev_int,
         int16_in_mb, 8 * H * W / 1e6 + H * W / 1e6),  # DIAG u16 extra
        ('int_minimal_packed', cfg, dict(minimal_outputs=True), dev_int,
         int16_in_mb, 2 * H * W / 1e6),
        ('int_full_cover', cfg_cover, dict(compute_browse=True), dev_int,
         int16_in_mb, 9 * H * W / 1e6),
        ('scaled_full', cfg, dict(compute_browse=True,
                                  float_inputs=True), dev_float,
         f32_in_mb, 9 * H * W / 1e6),
        ('scaled_minimal_packed', cfg, dict(minimal_outputs=True,
                                            float_inputs=True),
         dev_float, f32_in_mb, 2 * H * W / 1e6),
    ]
    for name, c, kw, dev, in_mb, out_mb in variants:
        try:
            kern = make_wtr_kernel(c, interpret=interp, **kw)
            m, ts = _timed_loop(kern, dev, args.iters, args.passes)
            record(name, m, ts, in_mb, out_mb)
        except Exception as e:  # noqa: BLE001 - e.g. VMEM overflow
            results['variants'][name] = {
                'error': f'{type(e).__name__}: {str(e)[:200]}'}
            print(f'{name}: ERROR {type(e).__name__}', flush=True)

    # 3. block_rows sweep (minimal int + full int + minimal scaled-float)
    for variant_kw, tag, dev, in_mb in (
            (dict(minimal_outputs=True), 'int_minimal', dev_int,
             int16_in_mb),
            (dict(compute_browse=True), 'int_full', dev_int,
             int16_in_mb),
            (dict(minimal_outputs=True, float_inputs=True),
             'scaled_minimal', dev_float, f32_in_mb)):
        for br in (32, 64, 128, 256, 512):
            name = f'{tag}_block{br}'
            try:
                kern = make_wtr_kernel(cfg, block_rows=br,
                                       interpret=interp, **variant_kw)
                m, ts = _timed_loop(kern, dev, args.iters,
                                    args.passes)
                out_mb = (2 if 'minimal' in tag else 9.7) * H * W / 1e6
                record(name, m, ts, in_mb, out_mb)
            except Exception as e:  # noqa: BLE001
                results['variants'][name] = {
                    'error': f'{type(e).__name__}: {str(e)[:200]}'}
                print(f'{name}: ERROR {type(e).__name__}', flush=True)

    # 4. XLA chain for scale
    m, ts = _timed_loop(
        lambda *a: dswx_chain(*a[:7], a[7] != 0, cfg), dev_int,
        args.iters, args.passes)
    record('xla_chain', m, ts, int16_in_mb, 8 * H * W / 1e6 + H * W / 1e6)

    # attribution summary
    v = results['variants']
    floor = v['floor_int16_inputs']['s_per_tile']
    prod = v['int_minimal_packed']['s_per_tile']
    results['attribution'] = {
        'int_minimal_compute_share': round(1 - floor / prod, 3),
        'conclusion': (
            'compute(VPU)-bound' if floor / prod < 0.6
            else 'traffic/overhead-bound'),
    }

    if args.trace_dir:
        try:
            kern = make_wtr_kernel(cfg, minimal_outputs=True,
                                   interpret=interp)
            with jax.profiler.trace(args.trace_dir):
                out = kern(*dev_int)
                jax.block_until_ready(out)
            results['trace_dir'] = args.trace_dir
        except Exception as e:  # noqa: BLE001
            results['trace_error'] = f'{type(e).__name__}: {e}'

    with open(args.out, 'w') as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({'artifact': args.out,
                      'conclusion': results['attribution']}))


if __name__ == '__main__':
    main()
