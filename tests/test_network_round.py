"""Plumbing test for the one-command network-round harness
(tools/network_round.py): the dry-run mode must exercise the same code
paths the live mode will use (scene layout -> CLI -> product comparison;
HDF4 granule -> v1 ingest) and report pass."""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(HERE), 'tools'))


def test_network_round_dry_run(tmp_path):
    import network_round
    out = str(tmp_path / 'NETWORK_ROUND.json')
    rc = network_round.main(['--dry-run', '--standin-size', '96',
                             '--out', out,
                             '--workdir', str(tmp_path / 'work')])
    assert rc == 0
    report = json.load(open(out))
    assert report['status'] == 'pass'
    assert report['zenodo_golden']['status'] == 'pass'
    assert report['zenodo_golden']['products_compared']
    assert report['hdf4_v1']['status'] == 'pass'
    assert report['hdf4_v1']['load_hls_product_v1'] is True
    assert set(report['hdf4_v1']['bands']) >= {
        'blue', 'green', 'red', 'nir', 'swir1', 'swir2', 'fmask'}
