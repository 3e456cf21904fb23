"""Single-thread host budget per 3660^2 tile, stage by stage.

VERDICT r3 weak item 5 / next-round item 4: the true host cost of one
tile is the per-stage SINGLE-THREAD core-seconds (occupancy tables from
the 1-core campaign inflate under time slicing). This tool measures each
stage in isolation — median of N same-process passes — and writes
HOST_BUDGET.json at the repo root so the v5e-8 projection rests on
numbers, not arithmetic.

Stages (matching the campaign pipeline, parallel/campaign.py):
  ingest_decode     6-band + fmask synthetic HLS v2 granule read
                    (io/hls.load_hls_product_v2 -> TiffReader ->
                    tt_decode_blocks)
  unpack_derive     2-byte/px packed transfer -> all 8 layers
                    (host_derive -> tt_unpack_derive)
  cog_uint8_x6      the 6 uint8 science COGs (WTR/BWTR/CONF/WTR-1/
                    WTR-2/CLOUD incl. overviews + ghost bytes)
  cog_uint16_diag   the uint16 DIAG COG
  cog_float32_dem   the float32 DEM COG (predictor 3 + CUBICSPLINE
                    overviews)
  png_browse        browse GeoTIFF -> 1024^2 PNG

    python tools/host_budget.py [--size 3660] [--passes 3]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))


def median_time(fn, passes):
    times = []
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--size', type=int, default=3660)
    ap.add_argument('--passes', type=int, default=3)
    ap.add_argument('--out', default=os.path.join(REPO,
                                                  'HOST_BUDGET.json'))
    args = ap.parse_args()
    H = W = args.size

    import synthetic
    from proteus_tpu.io import hls as hls_io
    from proteus_tpu.io.png import geotiff2png
    from proteus_tpu.models.dswx import host_derive
    from proteus_tpu.runtime import ctables
    from proteus_tpu.runtime import product_writer as pw
    from proteus_tpu.core import constants as C
    from proteus_tpu import native

    rng = np.random.default_rng(3)
    work = tempfile.mkdtemp(prefix='host_budget_')
    results = {'generated': time.strftime('%Y-%m-%dT%H:%M:%SZ',
                                          time.gmtime()),
               'size': args.size, 'passes': args.passes,
               'native_decode_blocks': native.has_decode_blocks(),
               'native_unpack_derive': native.has_unpack_derive(),
               'cpu_count': os.cpu_count(), 'stages': {}}

    def record(name, med, times, note=''):
        results['stages'][name] = {
            'seconds': round(med, 3),
            'pass_s': [round(t, 3) for t in times], 'note': note}
        print(f'{name}: {med:.3f} s  {note}', flush=True)

    # --- ingest decode ------------------------------------------------
    tile_dir = os.path.join(work, 'tile')
    synthetic.make_hls_v2_dataset(tile_dir, size=args.size, seed=42)
    files = sorted(os.path.join(tile_dir, f)
                   for f in os.listdir(tile_dir) if f.endswith('.tif'))

    def ingest():
        image, offs, scales, meta = {}, {}, {}, {}
        ok = hls_io.load_hls_product_v2(files, image, offs, scales,
                                        meta, False)
        assert ok
        return image

    med, times = median_time(ingest, args.passes)
    record('ingest_decode', med, times,
           f'{len(files)} band files, {args.size}^2')

    # --- unpack + derive ------------------------------------------------
    pa = rng.integers(0, 256, (H, W)).astype(np.uint8)
    # keep diag6 in-domain (0..32) and the packed class indices 0..6
    pa = (pa & 0xC0) | rng.integers(0, 33, (H, W)).astype(np.uint8)
    pb = (rng.integers(0, 4, (H, W))
          | (rng.integers(0, 7, (H, W)) << 2)
          | (rng.integers(0, 7, (H, W)) << 5)).astype(np.uint8)
    opts = dict(flag_collapse_wtr_classes=True,
                exclude_psw_aggressive=False,
                set_not_water_to_nodata=False, set_cloud_to_nodata=True,
                set_snow_to_nodata=False, set_ocean_masked_to_nodata=True)

    layers_holder = {}

    def derive():
        layers = {'PACKED_A': pa, 'PACKED_B': pb}
        host_derive.derive_dependent_layers(layers, compute_browse=True,
                                            browse_options=opts)
        layers_holder.update(layers)

    med, times = median_time(derive, args.passes)
    record('unpack_derive', med, times,
           'native' if native.has_unpack_derive() else 'numpy')

    # --- COG encodes (realistic class-valued layers, not random noise:
    # random bytes are DEFLATE's worst case and overstate the cost) ----
    gt = (600000.0, 30.0, 0.0, 4000020.0, 0.0, -30.0)
    proj = 32615
    md = {'PRODUCT_ID': 'host_budget'}
    wtr = layers_holder['WTR']
    out8 = os.path.join(work, 'u8.tif')

    def six_uint8_cogs():
        for i, layer in enumerate(('WTR', 'BWTR', 'CONF', 'WTR-1',
                                   'WTR-2', 'CLOUD')):
            pw.save_dswx_product(layers_holder.get(layer, wtr),
                                 'WTR', out8 + str(i), md, gt, proj)

    med, times = median_time(six_uint8_cogs, args.passes)
    record('cog_uint8_x6', med, times, '6 science layers')

    diag = layers_holder['DIAG']
    out16 = os.path.join(work, 'u16.tif')

    def diag_cog():
        pw.save_array(diag, out16, md, gt, proj,
                      no_data_value=C.DIAGNOSTIC_LAYER_NO_DATA_BINARY_REPR)

    med, times = median_time(diag_cog, args.passes)
    record('cog_uint16_diag', med, times)

    dem = (700.0 + 80.0 * np.sin(np.linspace(0, 40, H))[:, None]
           * np.cos(np.linspace(0, 37, W))[None, :]
           + rng.normal(0, 2.0, (H, W))).astype(np.float32)
    outf = os.path.join(work, 'f32.tif')

    def dem_cog():
        pw.save_array(dem, outf, md, gt, proj,
                      no_data_value=float('nan'))

    med, times = median_time(dem_cog, args.passes)
    record('cog_float32_dem', med, times,
           'predictor 3 + CUBICSPLINE overviews')

    browse_tif = os.path.join(work, 'browse.tif')
    ct = ctables.get_browse_ctable()
    pw.save_array(layers_holder['BROWSE'], browse_tif, md, gt, proj,
                  ctable=ct, no_data_value=C.UINT8_FILL_VALUE)

    def browse_png():
        geotiff2png(browse_tif, browse_tif.replace('.tif', '.png'),
                    output_height=1024, output_width=1024,
                    rgba_ctable=ct)

    med, times = median_time(browse_png, args.passes)
    record('png_browse', med, times)

    total = sum(v['seconds'] for v in results['stages'].values())
    results['total_core_s_per_tile'] = round(total, 3)

    # --- realistic-content COG rows: the rows above use random class
    # bytes (DEFLATE's worst case, kept for round-over-round
    # comparability); production layers have spatial structure and a
    # small class alphabet, so also record encodes of layers the actual
    # science chain produced from the synthetic scene -----------------
    import oracle
    from proteus_tpu.core.thresholds import HlsThresholds
    t = HlsThresholds()
    tdict = {k: getattr(t, k) for k in t.__dataclass_fields__}
    image = ingest()
    bands = [np.clip(np.asarray(image[k], np.int64), 1, None)
             for k in ('blue', 'green', 'red', 'nir', 'swir1', 'swir2')]
    real = oracle.full_chain(*bands, image['fmask'],
                             image['invalid_ind_array'], tdict)
    results['stages_realistic'] = {}

    def record_real(name, med, times, note=''):
        results['stages_realistic'][name] = {
            'seconds': round(med, 3),
            'pass_s': [round(t, 3) for t in times], 'note': note}
        print(f'[realistic] {name}: {med:.3f} s  {note}', flush=True)

    def six_real_cogs():
        for i, layer in enumerate(('WTR', 'BWTR', 'CONF', 'WTR-1',
                                   'WTR-2', 'CLOUD')):
            pw.save_dswx_product(real[layer].astype(np.uint8), 'WTR',
                                 out8 + 'r' + str(i), md, gt, proj)

    med, times = median_time(six_real_cogs, args.passes)
    record_real('cog_uint8_x6', med, times, 'chain-produced layers')

    real_diag = real['DIAG'].astype(np.uint16)

    def real_diag_cog():
        pw.save_array(real_diag, out16 + 'r', md, gt, proj,
                      no_data_value=C.DIAGNOSTIC_LAYER_NO_DATA_BINARY_REPR)

    med, times = median_time(real_diag_cog, args.passes)
    record_real('cog_uint16_diag', med, times)

    real_total = (total
                  - results['stages']['cog_uint8_x6']['seconds']
                  - results['stages']['cog_uint16_diag']['seconds']
                  + sum(v['seconds']
                        for v in results['stages_realistic'].values()))
    results['total_core_s_per_tile_realistic'] = round(real_total, 3)
    with open(args.out, 'w') as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({'artifact': args.out,
                      'total_core_s_per_tile': results[
                          'total_core_s_per_tile']}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == '__main__':
    main()
