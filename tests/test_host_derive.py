"""Minimal-transfer derivation parity: host_derive vs the device chain.

In campaign minimal-transfer mode the device ships DIAG6/WTR-1/WTR-2/CLOUD
and the writer derives WTR/BWTR/CONF/DIAG/BROWSE on host; these must be
bit-identical to the chain's own outputs.
"""

import numpy as np

from proteus_tpu.core import constants as C
from proteus_tpu.models.dswx import host_derive
from proteus_tpu.models.dswx.chain import DswxChainConfig, dswx_chain
from proteus_tpu.models.dswx.diagnostics import compute_diagnostic_tests

RNG = np.random.default_rng(77)


def _case(mode, with_anc):
    shape = (128, 128)
    bands = [np.clip(RNG.integers(-2000, 18000, shape), 1,
                     None).astype(np.int16) for _ in range(6)]
    fmask = RNG.integers(0, 256, shape).astype(np.uint8)
    invalid = RNG.random(shape) < 0.05
    kw = {}
    if with_anc:
        kw = dict(
            ocean_mask=(RNG.random(shape) < 0.9).astype(np.uint8),
            shadow_layer=(RNG.random(shape) < 0.8).astype(np.uint8),
            landcover_mask=RNG.choice(
                np.array([0, 100, 200, 201, 255], np.uint8), shape))
    cfg = DswxChainConfig(mask_adjacent_to_cloud_mode=mode)
    full = dswx_chain(*bands, fmask, invalid, cfg, compute_browse=True,
                      **kw)
    full = {k: np.asarray(v) for k, v in full.items()}

    diag6 = np.asarray(compute_diagnostic_tests(*bands,
                                                cfg.thresholds))
    diag6 = np.where(invalid, C.DIAGNOSTIC_LAYER_NO_DATA_DECIMAL,
                     diag6).astype(np.uint8)
    minimal = {'DIAG6': diag6, 'WTR-1': full['WTR-1'],
               'WTR-2': full['WTR-2'], 'CLOUD': full['CLOUD']}
    derived = host_derive.derive_dependent_layers(
        dict(minimal), compute_browse=True,
        browse_options=dict(
            flag_collapse_wtr_classes=cfg.flag_collapse_wtr_classes,
            exclude_psw_aggressive=cfg.exclude_psw_aggressive_in_browse,
            set_not_water_to_nodata=cfg.not_water_in_browse == 'nodata',
            set_cloud_to_nodata=cfg.cloud_in_browse == 'nodata',
            set_snow_to_nodata=cfg.snow_in_browse == 'nodata',
            set_ocean_masked_to_nodata=True))
    return full, derived


def test_derivation_matches_chain():
    for mode in ('mask', 'cover'):
        for with_anc in (False, True):
            full, derived = _case(mode, with_anc)
            for layer in ('WTR', 'BWTR', 'CONF', 'DIAG', 'BROWSE'):
                np.testing.assert_array_equal(
                    derived[layer], full[layer],
                    err_msg=f'{layer} mode={mode} anc={with_anc}')
