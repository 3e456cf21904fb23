"""Hand-fused Pallas TPU kernel for the DSWx-HLS per-pixel chain.

One pass over HBM computes every elementwise product layer — DIAG (pseudo-
binary), WTR-1, WTR-2, WTR, BWTR, CONF, CLOUD, BROWSE — from the six
reflectance bands + fmask + masks. It reads each int16 band exactly once
per tile with no intermediate HBM round-trips, using full-width VMEM
blocks. Verified bit-identical to the jnp chain on the TPU backend
(tests + product path under PROTEUS_TPU_USE_PALLAS=1).

Measured attribution (tools/kernel_profile.py, KERNEL_PROFILE.json, on
the dev TPU): a zero-compute kernel with the same input footprint costs
~7.0 ms/tile — the same whether the bands are int16 or float32 — so on
THIS device the kernel sits on a per-dispatch/grid overhead floor, not
an HBM-bandwidth or VPU roofline. The int kernel runs within 13% of
that floor (8.0 ms; 51x the XLA chain's 413 ms, which materializes
intermediates); the 'cover' halo dilation adds ~1.3 ms and the
scaled-float EFT boundary tests add ~5.2 ms of genuine VPU work. On
direct-attached v5e silicon the same traffic is ~0.4 ms of HBM time, so
the int kernel would be bandwidth-dominated and the scaled kernel
EFT-compute-dominated there.

Two TPU-native rewrites relative to the reference algorithms:

- threshold tests run in exact int32 rational arithmetic (see
  proteus_tpu.core.thresholds — bit-identical to the reference's float64);
- the 33-entry interpretation LUT collapses to closed-form popcount logic
  (no gather):  popcount(diag)==0/1 -> not-water (except bit4 alone -> 4),
  ==2 -> PSW-aggressive (except bits 3+4 -> PSW-conservative), ==3 ->
  moderate-conf water, >=4 -> high-conf water. Verified exhaustively
  against the table in tests.

The 'cover' cloud-adjacent mode (scipy-masked dilation, 10 snow + 7
unmask iterations; reference dswx_hls.py:2060-2076) runs fused too: input
blocks carry a 20-row halo (element-indexed overlapping BlockSpecs; 17
rows of influence radius padded to keep block heights 8-aligned), the
two masked dilations run as zero-fill shift/OR stencils on the VPU inside
the same VMEM residency, and only the halo-cropped center rows are stored.
Out-of-image halo rows are masked off (the Element padding region is
uninitialized), which matches scipy's zeros-outside-the-border semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from proteus_tpu.core import constants as C
from proteus_tpu.core.f32exact import (_exact_sum_sign, _two_prod,
                                       ratio_boundary)
from proteus_tpu.core.thresholds import ExactThresholds


def _closed_form_interpret(t1, t2, t3, t4, t5):
    """uint8 water class from the 5 test bits via popcount logic."""
    pc = (t1.astype(jnp.int32) + t2.astype(jnp.int32)
          + t3.astype(jnp.int32) + t4.astype(jnp.int32)
          + t5.astype(jnp.int32))
    only_t5 = t5 & (pc == 1)
    conservative = t4 & t5 & (pc == 2)
    cls = jnp.where(pc >= 4, 1,
                    jnp.where(pc == 3, 2,
                              jnp.where(pc == 2, 4, 0)))
    cls = jnp.where(conservative, 3, cls)
    cls = jnp.where(only_t5, 4, cls)
    return cls.astype(jnp.uint8)


def _ratio_gt(num, den, p, q):
    # boolean algebra instead of select: Mosaic cannot select between
    # i1 vectors
    qn = q * num
    pd = p * den
    return (((den > 0) & (qn > pd)) | ((den < 0) & (qn < pd))
            | ((den == 0) & (num > 0)))


def _ratio_lt(num, den, p, q):
    qn = q * num
    pd = p * den
    return (((den > 0) & (qn < pd)) | ((den < 0) & (qn > pd))
            | ((den == 0) & (num < 0)))


def _ratio_cmp_f32_finite(num, den, b):
    """fl32(num/den) OP t for FINITE f32 operands (the scaled-input
    domain) — the division-free exact boundary sign test of
    core.f32exact, with IEEE specials reduced to the reachable cases:
    num/0 = +-inf (sign of num) and 0/0 = NaN (compares False). Boolean
    algebra only — Mosaic cannot select between i1 vectors."""
    if b.parts:
        comps = [num]
        for part in b.parts:
            p, e = _two_prod(jnp.float32(part), den)
            comps.extend([-p, -e])
        sign = _exact_sum_sign(comps)
    else:
        sign = jnp.where(num > 0, 1,
                         jnp.where(num < 0, -1, 0)).astype(jnp.int32)
    q_cmp = jnp.where(den > 0, sign, -sign)
    if b.inclusive:
        base = (q_cmp >= 0) if b.op_gt else (q_cmp <= 0)
    else:
        base = (q_cmp > 0) if b.op_gt else (q_cmp < 0)
    den_zero = den == 0
    inf_hit = (num > 0) if b.op_gt else (num < 0)
    # NaN operands distill to an exact 'tie' (sign 0), which an
    # inclusive boundary would treat as True; NumPy compares NaN False
    not_nan = (num == num) & (den == den)
    return (((~den_zero) & base) | (den_zero & inf_hit)) & not_nan


# 'cover' mode influence radius: 10 snow-dilation + 7 unmask-dilation
# iterations of the 4-connected cross need 17 halo rows; padded to 20 so
# the (block + 2*halo) VMEM block height stays divisible by 8 (a Mosaic
# tiling requirement)
_COVER_HALO = 20


def _shift_or_i32(x):
    """Bitwise OR of the four cross-shifted copies of a 0/1 int32 block,
    zero-fill at the block edges (one dilation step, center excluded)."""
    h, w = x.shape
    zrow = jnp.zeros((1, w), dtype=x.dtype)
    zcol = jnp.zeros((h, 1), dtype=x.dtype)
    out = jnp.concatenate([x[1:], zrow], axis=0)          # from below
    out = out | jnp.concatenate([zrow, x[:-1]], axis=0)   # from above
    out = out | jnp.concatenate([x[:, 1:], zcol], axis=1)
    out = out | jnp.concatenate([zcol, x[:, :-1]], axis=1)
    return out


def _dilate_masked_block(x, mask, iterations):
    """scipy binary_dilation(x, cross, iterations, mask=mask) on a block:
    each step turns on masked pixels adjacent to the current set.

    Bool in/out; the stencil runs on 0/1 int32 and the Python loop is
    unrolled — Mosaic legalizes neither i1-vector concatenates ("invalid
    vector register cast") nor scf.for with i1-vector carries, and the
    iteration counts are small static constants (10/7).
    """
    cur = x.astype(jnp.int32)
    m = mask.astype(jnp.int32)
    for _ in range(iterations):
        grown = cur | _shift_or_i32(cur)
        cur = cur | (grown & m)
    return cur != 0


def make_wtr_kernel(config, with_ocean=False, with_shadow=False,
                    with_landcover=False, compute_browse=True,
                    block_rows=None, interpret=False,
                    minimal_outputs=False, float_inputs=False,
                    device_scale=False):
    """Build the fused kernel. ``config`` is a DswxChainConfig; static
    choices are baked in at trace time.

    Returns fn(blue, green, red, nir, swir1, swir2, fmask, invalid
               [, ocean][, shadow][, landcover]) -> dict of layers.

    ``minimal_outputs=True`` emits only the independent layers
    (DIAG6/WTR-1/WTR-2/CLOUD), packed on the fly into two uint8 planes
    'PACKED_A'/'PACKED_B' (2 bytes/px — a quarter of the full-mode
    output bytes); the writer unpacks and derives WTR/BWTR/CONF/BROWSE/
    DIAG on host (models/dswx/host_derive.py::unpack_minimal,
    derive_dependent_layers).

    ``float_inputs=True``: the scaled-reflectance (float32) mode. The
    reference's scaled chain is float32 end-to-end (dswx_hls.py:2298-
    2302); the MNDWI/NDVI threshold comparisons run as the division-free
    exact boundary sign tests of core.f32exact (TPU f32 division is not
    correctly rounded), everything else is plain IEEE f32.

    ``device_scale=True`` (requires float_inputs): the six bands arrive
    RAW int16 and two extra (6,) float32 SMEM inputs follow ``invalid``
    (per-band scale, offset); the reference's scaled cast
    ``scale * (float32(band) - offset)`` (dswx_hls.py:2298-2302) runs
    inside the kernel in VMEM. int16->f32 conversion and f32 sub/mul are
    bit-exact IEEE on TPU, so results are bit-identical to pre-cast f32
    inputs — while the kernel's band HBM traffic halves (2 bytes/px
    instead of 4) and the six full-tile f32 intermediates the XLA cast
    would materialize in HBM never exist.
    """
    if device_scale and not float_inputs:
        raise ValueError('device_scale requires float_inputs=True')
    cover = config.mask_adjacent_to_cloud_mode == 'cover'
    if block_rows is None:
        # cover mode holds (block + 2*halo) rows of every input in
        # VMEM; a smaller block keeps the residency comfortable. The
        # float path doubles the band bytes and keeps EFT distillation
        # temporaries live, so it uses smaller blocks again.
        # Minimal-outputs (the campaign's production mode) measured
        # ~8% faster at 64 rows than 256 on hardware
        # (KERNEL_PROFILE.json block sweep); full outputs prefer 256.
        block_rows = 128 if cover else (64 if minimal_outputs else 256)
        if float_inputs:
            # hardware sweep (KERNEL_PROFILE.json): scaled minimal is
            # fastest at 32 rows (11.45 ms vs 11.86 at 128; 256
            # overflows VMEM under the EFT temporaries)
            block_rows = 64 if cover else (32 if minimal_outputs
                                           else 128)
    et = None
    f32_bounds = f32_consts = None
    if float_inputs:
        tv = config.thresholds
        f32_bounds = {
            'wigt': ratio_boundary(tv.wigt, 'gt', 'f32'),
            'p1_mndwi': ratio_boundary(tv.pswt_1_mndwi, 'gt', 'f32'),
            'p2_mndwi': ratio_boundary(tv.pswt_2_mndwi, 'gt', 'f32'),
            'p1_ndvi': ratio_boundary(tv.pswt_1_ndvi, 'lt', 'f32'),
        }
        if any(b.always is not None for b in f32_bounds.values()):
            raise ValueError('non-finite ratio threshold; use the jnp '
                             'chain')
        f32_consts = {k: float(np.float32(getattr(tv, k))) for k in (
            'awgt', 'pswt_1_swir1', 'pswt_1_nir', 'pswt_2_blue',
            'pswt_2_nir', 'pswt_2_swir1', 'pswt_2_swir2', 'lcmask_nir')}
    else:
        et = ExactThresholds.from_thresholds(config.thresholds)
        if not all(getattr(et, f)[2] for f in (
                'wigt', 'awgt', 'pswt_1_mndwi', 'pswt_1_nir',
                'pswt_1_swir1', 'pswt_1_ndvi', 'pswt_2_mndwi',
                'pswt_2_blue', 'pswt_2_nir', 'pswt_2_swir1',
                'pswt_2_swir2', 'lcmask_nir')):
            raise ValueError('thresholds are not exactly rational; use '
                             'the jnp chain (float fallback)')

    aerosol_lists = (
        (0, tuple(config.aerosol_not_water_fmask_values)),
        (2, tuple(config.aerosol_moderate_conf_fmask_values)),
        (3, tuple(config.aerosol_psw_conservative_fmask_values)),
        (4, tuple(config.aerosol_psw_aggressive_fmask_values)),
    )
    mask_adjacent = config.mask_adjacent_to_cloud_mode == 'mask'
    lcmask_pq = None
    from proteus_tpu.core.thresholds import (to_exact_fraction,
                                             SCALAR_MAX_DEN,
                                             SCALAR_MAX_NUM)
    lcmask_pq = to_exact_fraction(config.thresholds.lcmask_nir,
                                  SCALAR_MAX_DEN, SCALAR_MAX_NUM)
    nir_aerosol_max = int(C.AEROSOL_REMAPPING_MAX_NIR)

    n_extra = int(with_ocean) + int(with_shadow) + int(with_landcover)

    def kernel(*refs, h_total=None):
        (blue_r, green_r, red_r, nir_r, swir1_r, swir2_r, fmask_r,
         invalid_r) = refs[:8]
        idx = 8
        scales_r = offsets_r = None
        if device_scale:
            scales_r, offsets_r = refs[8:10]
            idx = 10
        ocean_r = shadow_r = landcover_r = None
        if with_ocean:
            ocean_r = refs[idx]
            idx += 1
        if with_shadow:
            shadow_r = refs[idx]
            idx += 1
        if with_landcover:
            landcover_r = refs[idx]
            idx += 1
        outs = refs[idx:]
        if minimal_outputs:
            pa_o, pb_o = outs
            diag_o = wtr1_o = wtr2_o = cloud_o = None
            wtr_o = bwtr_o = conf_o = browse_o = None
        else:
            (diag_o, wtr1_o, wtr2_o, wtr_o, bwtr_o, conf_o, cloud_o) = \
                outs[:7]
            browse_o = outs[7] if compute_browse else None

        if cover:
            # halo blocks: mask off rows outside the image — the Element
            # padding region and the final partial block are uninitialized
            row0 = pl.program_id(0) * block_rows - _COVER_HALO
            blk_h = block_rows + 2 * _COVER_HALO
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (blk_h, 1), 0) + row0
            valid_rows = (rows >= 0) & (rows < h_total)

        def store(ref, arr):
            if cover:
                ref[:] = arr[_COVER_HALO:_COVER_HALO + block_rows]
            else:
                ref[:] = arr

        fmask = fmask_r[:].astype(jnp.int32)
        invalid = invalid_r[:].astype(jnp.int32) != 0

        if float_inputs:
            # --- diagnostics (IEEE f32, matching the reference's scaled
            # chain; ratio thresholds via exact boundary sign tests).
            # Compiled Mosaic has no optimization_barrier lowering and
            # does not reassociate the EFT patterns (hardware-verified:
            # SCALED_TPU_PARITY.json), so the barriers are trace-time
            # disabled; interpret mode runs under XLA and keeps them.
            import contextlib
            from proteus_tpu.core.f32exact import eft_barriers_disabled
            barrier_ctx = contextlib.nullcontext() if interpret \
                else eft_barriers_disabled()
            if device_scale:
                # reference scaled cast fused in VMEM: int16 -> f32 is
                # exact, f32 sub/mul are bit-exact IEEE on TPU (goes via
                # int32 — v5e Mosaic lacks packed-i16 converts)
                def _cast(ref, j):
                    v = ref[:].astype(jnp.int32).astype(jnp.float32)
                    return scales_r[j] * (v - offsets_r[j])
                blue = _cast(blue_r, 0)
                green = _cast(green_r, 1)
                red = _cast(red_r, 2)
                nir = _cast(nir_r, 3)
                swir1 = _cast(swir1_r, 4)
                swir2 = _cast(swir2_r, 5)
            else:
                blue = blue_r[:]
                green = green_r[:]
                red = red_r[:]
                nir = nir_r[:]
                swir1 = swir1_r[:]
                swir2 = swir2_r[:]
            f32 = jnp.float32
            mndwi_num, mndwi_den = green - swir1, green + swir1
            mbsrv, mbsrn = green + red, nir + swir1
            ndvi_num, ndvi_den = nir - red, nir + red
            awesh = (blue + f32(2.5) * green - f32(1.5) * mbsrn
                     - f32(0.25) * swir2)
            with barrier_ctx:
                t1 = _ratio_cmp_f32_finite(mndwi_num, mndwi_den,
                                           f32_bounds['wigt'])
                t4r = _ratio_cmp_f32_finite(mndwi_num, mndwi_den,
                                            f32_bounds['p1_mndwi'])
                t4n = _ratio_cmp_f32_finite(ndvi_num, ndvi_den,
                                            f32_bounds['p1_ndvi'])
                t5r = _ratio_cmp_f32_finite(mndwi_num, mndwi_den,
                                            f32_bounds['p2_mndwi'])
            t2 = mbsrv > mbsrn
            t3 = awesh > f32(f32_consts['awgt'])
            t4 = (t4r
                  & (swir1 < f32(f32_consts['pswt_1_swir1']))
                  & (nir < f32(f32_consts['pswt_1_nir']))
                  & t4n)
            t5 = (t5r
                  & (blue < f32(f32_consts['pswt_2_blue']))
                  & (swir1 < f32(f32_consts['pswt_2_swir1']))
                  & (swir2 < f32(f32_consts['pswt_2_swir2']))
                  & (nir < f32(f32_consts['pswt_2_nir'])))
            nir_ok_aerosol = nir <= f32(C.AEROSOL_REMAPPING_MAX_NIR)
            nir_bright_lcmask = nir > f32(f32_consts['lcmask_nir'])
        else:
            # all arithmetic in int32 (v5e Mosaic has no packed int16
            # vector compares); NumPy's int16 wrap-around is emulated
            blue = blue_r[:].astype(jnp.int32)
            green = green_r[:].astype(jnp.int32)
            red = red_r[:].astype(jnp.int32)
            nir = nir_r[:].astype(jnp.int32)
            swir1 = swir1_r[:].astype(jnp.int32)
            swir2 = swir2_r[:].astype(jnp.int32)

            def wrap16(x):
                return ((x + 32768) & 0xFFFF) - 32768

            # --- diagnostics (exact int32 rationals; int16 sums wrap) ---
            mndwi_num = wrap16(green - swir1)
            mndwi_den = wrap16(green + swir1)
            mbsrv = wrap16(green + red)
            mbsrn = wrap16(nir + swir1)
            ndvi_num = wrap16(nir - red)
            ndvi_den = wrap16(nir + red)
            g32 = green
            n32 = nir
            s1_32 = swir1
            awesh4 = 4 * blue + 10 * g32 - 6 * mbsrn - swir2

            t1 = _ratio_gt(mndwi_num, mndwi_den, *et.wigt[:2])
            t2 = mbsrv > mbsrn
            p, q = et.awgt[:2]
            t3 = awesh4 * q > 4 * p
            t4 = (_ratio_gt(mndwi_num, mndwi_den, *et.pswt_1_mndwi[:2])
                  & (s1_32 * et.pswt_1_swir1[1] < et.pswt_1_swir1[0])
                  & (n32 * et.pswt_1_nir[1] < et.pswt_1_nir[0])
                  & _ratio_lt(ndvi_num, ndvi_den, *et.pswt_1_ndvi[:2]))
            t5 = (_ratio_gt(mndwi_num, mndwi_den, *et.pswt_2_mndwi[:2])
                  & (blue * et.pswt_2_blue[1] < et.pswt_2_blue[0])
                  & (s1_32 * et.pswt_2_swir1[1] < et.pswt_2_swir1[0])
                  & (swir2 * et.pswt_2_swir2[1] < et.pswt_2_swir2[0])
                  & (n32 * et.pswt_2_nir[1] < et.pswt_2_nir[0]))
            nir_ok_aerosol = n32 <= nir_aerosol_max
            nir_bright_lcmask = n32 * lcmask_pq[1] > lcmask_pq[0]

        bits = [t1, t2, t3, t4, t5]
        if minimal_outputs:
            # raw 6-bit decimal (host expands to the pseudo-binary repr);
            # stored packed at the end of the pass
            diag6 = jnp.zeros(t1.shape, jnp.int32)
            for i, b in enumerate(bits):
                diag6 = diag6 + b.astype(jnp.int32) * (1 << i)
            diag6 = jnp.where(invalid,
                              C.DIAGNOSTIC_LAYER_NO_DATA_DECIMAL, diag6)
        else:
            # DIAG pseudo-binary representation (fill -> 65535)
            diag_rep = jnp.zeros(t1.shape, jnp.int32)
            for i, b in enumerate(bits):
                diag_rep = diag_rep + b.astype(jnp.int32) * (10 ** i)
            diag_rep = jnp.where(invalid, 65535, diag_rep)
            store(diag_o, diag_rep.astype(jnp.uint16))

        # WTR-1 via closed-form popcount interpretation (int32 pipeline;
        # uint8 only at the output stores)
        wtr1 = _closed_form_interpret(t1, t2, t3, t4, t5) \
            .astype(jnp.int32)
        if with_ocean:
            wtr1 = jnp.where(ocean_r[:].astype(jnp.int32) == 0,
                             C.WTR_OCEAN_MASKED, wtr1)
        wtr1 = jnp.where(invalid, C.UINT8_FILL_VALUE, wtr1)
        if not minimal_outputs:
            store(wtr1_o, wtr1.astype(jnp.uint8))

        # preliminary CLOUD
        shadow_bit = (fmask & 8) != 0
        if mask_adjacent:
            shadow_bit = shadow_bit | ((fmask & 4) != 0)
        cloud_bit = (fmask & 2) != 0
        cloud = (shadow_bit.astype(jnp.int32)
                 + 4 * cloud_bit.astype(jnp.int32))

        # aerosol remapping: the fmask-value lists are static, so each
        # membership test unrolls to a few equality compares (no gather)
        wtr1a = wtr1
        if config.apply_aerosol_class_remapping:
            nir_ok = nir_ok_aerosol
            remapped = jnp.zeros(wtr1.shape, bool)
            for input_class, values in aerosol_lists:
                if not values:
                    continue
                in_list = (fmask == values[0])
                for v in values[1:]:
                    in_list = in_list | (fmask == v)
                hit = in_list & (wtr1a == input_class) & nir_ok
                wtr1a = jnp.where(hit, 1, wtr1a)
                remapped = remapped | hit
            cloud = jnp.where(remapped, cloud | 8, cloud)

        # landcover + shadow -> WTR-2
        wtr2 = wtr1a
        water = (wtr2 >= 1) & (wtr2 <= 4)
        if with_shadow:
            shadowed = (shadow_r[:].astype(jnp.int32)
                        == C.SHAD_MASKED) & water
            if with_landcover:
                shadowed = shadowed & (landcover_r[:].astype(jnp.int32)
                                       != 200)
            wtr2 = jnp.where(shadowed, 0, wtr2)
        if with_landcover:
            lc = landcover_r[:].astype(jnp.int32)
            nir_bright = nir_bright_lcmask
            psw = (wtr1a == 3) | (wtr1a == 4)
            demote = (((lc == 201) & nir_bright & psw)
                      | ((lc >= 0) & (lc < 100) & nir_bright & psw)
                      | ((lc >= 100) & (lc < 200) & water))
            wtr2 = jnp.where(demote, 0, wtr2)
        if not minimal_outputs:
            store(wtr2_o, wtr2.astype(jnp.uint8))

        # snow + fill -> final CLOUD
        snow = (fmask & 16) != 0
        if cover:
            # scipy-masked dilations (reference dswx_hls.py:2033-2076):
            # grow snow 10 steps into clear cloud-adjacent areas, then
            # retract where 7 unmask steps reach from clear non-snow
            snow = snow & valid_rows
            clear = (cloud == 0) & valid_rows
            areas = ((fmask & 4) != 0) & clear
            snow = _dilate_masked_block(snow, areas, 10)
            # water test on the FINAL wtr2 (post landcover/shadow masks)
            areas_water = areas & (wtr2 >= 1) & (wtr2 <= 4)
            not_masked = (~snow) & clear
            not_masked = _dilate_masked_block(not_masked, areas_water, 7)
            snow = snow & (~not_masked)
        cloud = cloud + 2 * snow.astype(jnp.int32)
        cloud = jnp.where(wtr2 == C.UINT8_FILL_VALUE, 255, cloud)

        if minimal_outputs:
            # 2-byte/px packing (see parallel/campaign.py
            # ::_pack_minimal_device for the scheme and
            # models/dswx/host_derive.unpack_minimal for the inverse):
            # two stores instead of four halve the output HBM traffic.
            # CLOUD's 255 fill is redundant with WTR-2's (same invalid
            # mask), so only its 4 payload bits ship.
            cloudp = jnp.where(cloud == 255, 0, cloud)

            def widx(wv):
                return jnp.where(wv == C.WTR_OCEAN_MASKED, 5,
                                 jnp.where(wv == C.UINT8_FILL_VALUE, 6,
                                           wv))

            pa = diag6 | ((cloudp & 3) << 6)
            pb = (((cloudp >> 2) & 3) | (widx(wtr1) << 2)
                  | (widx(wtr2) << 5))
            store(pa_o, pa.astype(jnp.uint8))
            store(pb_o, pb.astype(jnp.uint8))
            return
        store(cloud_o, cloud.astype(jnp.uint8))

        # WTR
        cloudy = (cloud != 0) & (cloud != 8)
        snowy = (cloud == 2) | (cloud == 10)
        wtr = jnp.where(cloudy, C.WTR_CLOUD_MASKED, wtr2)
        wtr = jnp.where(snowy, C.WTR_SNOW_MASKED, wtr)
        wtr = jnp.where(wtr2 == C.WTR_OCEAN_MASKED,
                        C.WTR_OCEAN_MASKED, wtr)
        wtr = jnp.where(wtr2 == C.UINT8_FILL_VALUE,
                        C.UINT8_FILL_VALUE, wtr)
        store(wtr_o, wtr.astype(jnp.uint8))

        # BWTR
        store(bwtr_o, jnp.where((wtr >= 1) & (wtr <= 4), 1,
                              wtr).astype(jnp.uint8))

        # CONF
        conf_cloudy = cloudy & ~snowy  # {1,3..7,9,11..15}: cloud values
        conf = wtr2
        is_clear_class = conf <= 4
        conf = jnp.where(conf_cloudy & is_clear_class, conf + 10, conf)
        conf = jnp.where((cloud == 2) & is_clear_class, conf + 20, conf)
        store(conf_o, conf.astype(jnp.uint8))

        # BROWSE
        if compute_browse:
            br = wtr
            if config.exclude_psw_aggressive_in_browse:
                br = jnp.where(br == 4, 0, br)
            if config.flag_collapse_wtr_classes:
                br = jnp.where((br == 1) | (br == 2), 1,
                               jnp.where((br == 3) | (br == 4), 2, br))
            if config.not_water_in_browse == 'nodata':
                br = jnp.where(br == 0, 255, br)
            if config.cloud_in_browse == 'nodata':
                br = jnp.where(br == C.WTR_CLOUD_MASKED, 255, br)
            if config.snow_in_browse == 'nodata':
                br = jnp.where(br == C.WTR_SNOW_MASKED, 255, br)
            br = jnp.where(br == C.WTR_OCEAN_MASKED, 255, br)
            store(browse_o, br.astype(jnp.uint8))

    def build(h, w):
        import functools
        grid = (pl.cdiv(h, block_rows),)

        def out_bspec():
            return pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        def in_bspec():
            if not cover:
                return out_bspec()
            # overlapping halo windows, element-indexed: the runtime
            # shifts the window start by -padding_lo itself, so index_map
            # returns the UNSHIFTED block start; rows outside the array
            # are undefined and masked in the kernel
            halo = _COVER_HALO
            # overlapping element-indexed windows over the PRE-PADDED
            # inputs (fn pads by halo rows; Mosaic supports neither low
            # padding nor mixed Element/Blocked dims, hence zero-padding
            # Element on both dims over in-bounds windows)
            return pl.BlockSpec(
                (pl.Element(block_rows + 2 * halo, (0, 0)),
                 pl.Element(w, (0, 0))),
                lambda i: (i * block_rows, 0),
                memory_space=pltpu.VMEM)

        in_specs = [in_bspec() for _ in range(8)]
        if device_scale:
            # (6,) per-band scale/offset scalars live in SMEM, one copy
            # shared by every grid block
            in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        in_specs += [in_bspec() for _ in range(n_extra)]
        if minimal_outputs:
            n_out = 2
            out_shapes = [jax.ShapeDtypeStruct((h, w), jnp.uint8)
                          for _ in range(n_out)]
        else:
            n_out = 8 if compute_browse else 7
            out_shapes = [jax.ShapeDtypeStruct((h, w), jnp.uint16)] + \
                [jax.ShapeDtypeStruct((h, w), jnp.uint8)
                 for _ in range(n_out - 1)]
        return pl.pallas_call(
            functools.partial(kernel, h_total=h),
            grid=grid,
            in_specs=in_specs,
            out_specs=[out_bspec() for _ in range(n_out)],
            out_shape=out_shapes,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    def fn(*arrays):
        h, w = arrays[0].shape
        call = build(h, w)
        arrays = list(arrays)
        # bool invalid -> uint8 for the kernel
        arrays[7] = arrays[7].astype(jnp.uint8)
        if cover:
            # pre-pad so every overlapping halo window is in-bounds (the
            # pad rows are masked via valid_rows); one fused XLA copy.
            # The (6,) scale/offset SMEM scalars are not image planes —
            # skip them.
            halo = _COVER_HALO
            n_blocks = pl.cdiv(h, block_rows)
            padded_h = (n_blocks - 1) * block_rows + block_rows + 2 * halo
            arrays = [a if (device_scale and 8 <= i < 10) else
                      jnp.pad(a, ((halo, padded_h - h - halo), (0, 0)))
                      for i, a in enumerate(arrays)]
        outs = call(*arrays)
        if minimal_outputs:
            names = ['PACKED_A', 'PACKED_B']
        else:
            names = ['DIAG', 'WTR-1', 'WTR-2', 'WTR', 'BWTR', 'CONF',
                     'CLOUD']
            if compute_browse:
                names.append('BROWSE')
        return dict(zip(names, outs))

    return fn
