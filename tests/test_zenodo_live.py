"""Optional live golden test against the reference's Zenodo workflow
dataset (record 7714211) — the same data the reference test suite uses.

Disabled by default: this environment has no network access. Set
PROTEUS_TPU_ZENODO_TEST=1 (and have network) to run the full pixel-exact
comparison against the reference products.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get('PROTEUS_TPU_ZENODO_TEST'),
    reason='live Zenodo test disabled (set PROTEUS_TPU_ZENODO_TEST=1)')

ZENODO_URL = ('https://zenodo.org/record/7714211/files/'
              's30_louisiana_mississippi.tar.gz')


def test_workflow_against_reference_products(tmp_path):
    import tarfile
    import urllib.request

    tarball = str(tmp_path / 's30.tar.gz')
    urllib.request.urlretrieve(ZENODO_URL, tarball)
    with tarfile.open(tarball) as tf:
        tf.extractall(str(tmp_path))
    dataset_dir = str(tmp_path / 's30_louisiana_mississippi')

    from proteus_tpu.cli.dswx_hls import main as dswx_hls_main
    from proteus_tpu.runtime.compare import compare_dswx_hls_products

    runconfig = os.path.join(dataset_dir, 'dswx_hls.yaml')
    dswx_hls_main([runconfig, '--debug'])

    ref_dir = os.path.join(dataset_dir, 'ref_dir')
    out_dir = os.path.join(dataset_dir, 'output_dir')
    for name in sorted(os.listdir(ref_dir)):
        assert compare_dswx_hls_products(
            os.path.join(ref_dir, name), os.path.join(out_dir, name)), name
