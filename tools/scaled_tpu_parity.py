"""On-TPU verification of the exact scaled-input (float32) semantics.

XLA's TPU float32 division is not correctly rounded (measured: ~35% of
adversarial operand pairs land 1 ULP off), so the scaled-input diagnostic
chain routes its MNDWI/NDVI threshold comparisons through the
division-free boundary tests in proteus_tpu.core.f32exact. This tool
executes those paths on the real chip and compares bitwise against the
host's IEEE NumPy evaluation (and, when the reference checkout is
present, against the reference's own executing code). Writes
SCALED_TPU_PARITY.json at the repo root.

Run on TPU:  python tools/scaled_tpu_parity.py
"""

import json
import os
import sys
import time

import numpy as np

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, 'tests'))


def ratio_cmp_cases(jax, results):
    from proteus_tpu.core.f32exact import ratio_boundary, ratio_cmp
    rng = np.random.default_rng(20260816)
    n = 1 << 18
    for t in (0.124, -0.44, 0.7, -0.5, 1 / 3, 0.1237):
        for op in ('gt', 'lt'):
            den = (rng.random(n).astype(np.float32) * 13.2 - 6.6)
            den[den == 0] = np.float32(1e-4)
            t32 = np.float32(t)
            tn = np.nextafter(t32, np.float32(
                np.inf if op == 'gt' else -np.inf))
            m = (np.float64(t32) + np.float64(tn)) * 0.5
            base = (m * den.astype(np.float64)).astype(np.float32)
            nums = [base.copy()]
            up = down = base
            for _ in range(2):
                up = np.nextafter(up, np.float32(np.inf))
                down = np.nextafter(down, np.float32(-np.inf))
                nums += [up.copy(), down.copy()]
            num = np.concatenate(nums)
            den_full = np.tile(den, len(nums))
            b = ratio_boundary(t, op, 'f32')
            got = np.asarray(jax.jit(
                lambda a, d: ratio_cmp(a, d, b))(num, den_full))
            with np.errstate(divide='ignore', invalid='ignore'):
                q = num / den_full
            want = (q > t32) if op == 'gt' else (q < t32)
            results['ratio_cmp'].append({
                't': t, 'op': op, 'n': int(num.size),
                'mismatches': int((got != want).sum())})


def scaled_diag_case(jax, results, ref):
    from proteus_tpu.core.thresholds import HlsThresholds
    from proteus_tpu.models.dswx.diagnostics import compute_diagnostic_tests
    import refbridge
    rng = np.random.default_rng(7)
    t = HlsThresholds()
    size = int(os.environ.get('PROTEUS_TPU_PARITY_SIZE', '3660'))
    shape = (size, size)
    bands = [np.float32(0.0001) * (np.clip(
        rng.integers(-2000, 18000, shape), 1, None)
        .astype(np.float32) - np.float32(0.0)) for _ in range(6)]
    # adversarial stripe: green at the MNDWI wigt rounding boundary
    t32 = np.float32(t.wigt)
    m = (np.float64(t32) + np.float64(np.nextafter(
        t32, np.float32(np.inf)))) * 0.5
    s1 = bands[4][:64]
    # g s.t. (g-s1)/(g+s1) ~ m (the wigt rounding boundary)
    bands[1][:64] = (s1.astype(np.float64) * (1 + m) / (1 - m)).astype(
        np.float32)
    fn = jax.jit(lambda *b: compute_diagnostic_tests(*b, t))
    t0 = time.time()
    got = np.asarray(fn(*bands))
    dt = time.time() - t0
    tdict = {k: getattr(t, k) for k in t.__dataclass_fields__}
    if ref is not None:
        want = ref._compute_diagnostic_tests(
            *bands, refbridge.reference_thresholds(tdict))
        source = 'reference executing code'
    else:
        import oracle  # noqa: F401  (oracle has no scaled diag; use numpy)
        want = None
        source = 'unavailable'
    entry = {'size': size, 'seconds_incl_compile': round(dt, 2),
             'expected_from': source}
    if want is not None:
        entry['mismatched_pixels'] = int((got != want).sum())
        entry['bit_identical'] = bool((got == want).all())
    results['scaled_diag'].append(entry)


def nondecimal_diag_case(jax, results, ref):
    from proteus_tpu.core.thresholds import HlsThresholds
    from proteus_tpu.models.dswx.diagnostics import compute_diagnostic_tests
    import refbridge
    if ref is None:
        return
    rng = np.random.default_rng(13)
    t = HlsThresholds().replace(wigt=1 / 3, awgt=1 / 7,
                                pswt_1_ndvi=-2 / 7,
                                pswt_1_swir1=900.5 + 1e-11)
    shape = (1024, 1024)
    bands = [rng.integers(-32768, 32767, shape).astype(np.int16)
             for _ in range(6)]
    s1 = np.clip(np.abs(bands[4]).astype(np.int64), 1, None)
    g0 = np.round(s1 * (1 + 1 / 3) / (1 - 1 / 3))
    bands[1] = np.clip(g0 + rng.integers(-2, 3, shape), -32768,
                       32767).astype(np.int16)
    bands[4] = np.clip(s1, None, 32767).astype(np.int16)
    got = np.asarray(jax.jit(
        lambda *b: compute_diagnostic_tests(*b, t))(*bands))
    tdict = {k: getattr(t, k) for k in t.__dataclass_fields__}
    want = ref._compute_diagnostic_tests(
        *bands, refbridge.reference_thresholds(tdict))
    results['nondecimal_int_diag'] = {
        'mismatched_pixels': int((got != want).sum()),
        'bit_identical': bool((got == want).all())}


def float_kernel_case(jax, results):
    """Fused Pallas kernel in float_inputs mode vs the jnp float chain,
    full 3660^2 tile, boundary-adversarial greens, compiled Mosaic."""
    import jax.numpy as jnp
    from proteus_tpu.core.thresholds import HlsThresholds
    from proteus_tpu.models.dswx.chain import DswxChainConfig, dswx_chain
    from proteus_tpu.ops.pallas.wtr_kernel import make_wtr_kernel
    rng = np.random.default_rng(3)
    cfg = DswxChainConfig()
    size = int(os.environ.get('PROTEUS_TPU_PARITY_SIZE', '3660'))
    shape = (size, size)
    bands = [np.float32(0.0001) * np.clip(
        rng.integers(-2000, 18000, shape), 1, None).astype(np.float32)
        for _ in range(6)]
    t32 = np.float32(cfg.thresholds.wigt)
    m = (np.float64(t32) + np.float64(
        np.nextafter(t32, np.float32(np.inf)))) * 0.5
    g0 = (bands[4][:256].astype(np.float64) * (1 + m) / (1 - m)).astype(
        np.float32)  # mndwi == m boundary
    bands[1][:256] = g0
    fmask = rng.integers(0, 256, shape).astype(np.uint8)
    invalid = rng.random(shape) < 0.02
    on_tpu = jax.devices()[0].platform == 'tpu'
    kernel = make_wtr_kernel(cfg, float_inputs=True,
                             interpret=not on_tpu)
    dev = [jnp.asarray(a) for a in bands + [fmask, invalid]]
    t0 = time.time()
    got = {k: np.asarray(v) for k, v in kernel(*dev).items()}
    dt = time.time() - t0
    want = dswx_chain(*bands, fmask, invalid, cfg)
    mism = {k: int((got[k] != np.asarray(want[k])).sum())
            for k in ('DIAG', 'WTR-1', 'WTR-2', 'WTR', 'BWTR', 'CONF',
                      'CLOUD', 'BROWSE')}
    results['float_kernel'] = {
        'size': size, 'seconds_incl_compile': round(dt, 2),
        'mismatched_pixels': mism,
        'bit_identical': not any(mism.values())}


def main():
    import jax
    import refbridge
    ref = refbridge.load_reference_dswx()
    results = {'platform': jax.devices()[0].platform,
               'ratio_cmp': [], 'scaled_diag': []}
    ratio_cmp_cases(jax, results)
    scaled_diag_case(jax, results, ref)
    nondecimal_diag_case(jax, results, ref)
    float_kernel_case(jax, results)
    total_mism = (sum(c['mismatches'] for c in results['ratio_cmp'])
                  + sum(c.get('mismatched_pixels', 0)
                        for c in results['scaled_diag'])
                  + results.get('nondecimal_int_diag',
                                {}).get('mismatched_pixels', 0)
                  + sum(results.get('float_kernel',
                                    {}).get('mismatched_pixels',
                                            {}).values()))
    results['all_bit_identical'] = total_mism == 0
    out = os.path.join(_root, 'SCALED_TPU_PARITY.json')
    with open(out, 'w') as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
