"""Native batched block decode + fused unpack/derive parity tests.

tt_decode_blocks must return byte-identical rasters to the pure-Python
reader path for every (layout, compression, predictor, window)
combination, and tt_unpack_derive must match host_derive's NumPy LUT
path exactly — both natives are pure data movement whose semantics live
in Python-built tables, so any divergence is a bug.
"""

import struct
import zlib

import numpy as np
import pytest

from proteus_tpu import native
from proteus_tpu.io import codecs
from proteus_tpu.io.cog import write_cog
from proteus_tpu.io.tiff import TiffReader

pytestmark = pytest.mark.skipif(
    not (native.available() and native.has_decode_blocks()),
    reason='native codec not built')

RNG = np.random.default_rng(123)


def write_strip_tiff(path, arr, rows_per_strip, compression=8,
                     predictor=1, sparse_strips=()):
    """Minimal classic-TIFF strip writer (LE, single band) for reader
    tests — the repo's production writer emits tiled COGs only, but HLS
    upstream granules can be strip-organized."""
    h, w = arr.shape
    dtype = arr.dtype
    n_strips = (h + rows_per_strip - 1) // rows_per_strip
    payloads = []
    for s in range(n_strips):
        rows = min(rows_per_strip, h - s * rows_per_strip)
        block = arr[s * rows_per_strip:s * rows_per_strip + rows,
                    :, None]
        if predictor == codecs.PREDICTOR_HORIZONTAL:
            raw = codecs.predict_horizontal(block).tobytes()
        elif predictor == codecs.PREDICTOR_FLOAT:
            be = np.ascontiguousarray(block).astype(
                dtype.newbyteorder('>')).tobytes()
            raw = codecs.predict_float(be, rows, w, 1, dtype.itemsize)
        else:
            raw = block.tobytes()
        if compression == codecs.COMPRESSION_DEFLATE_ADOBE:
            data = zlib.compress(raw)
        elif compression == codecs.COMPRESSION_LZW:
            data = codecs.lzw_encode(raw)
        else:
            data = raw
        payloads.append(b'' if s in sparse_strips else data)

    header = b'II' + struct.pack('<HI', 42, 0)  # IFD offset patched below
    body = bytearray(header)
    offsets, counts = [], []
    for p in payloads:
        offsets.append(0 if not p else len(body))
        counts.append(len(p))
        body += p
    # external value areas for the offset/count arrays (LONG each)
    if n_strips > 1:
        off_area = len(body)
        body += struct.pack(f'<{n_strips}I', *offsets)
        cnt_area = len(body)
        body += struct.pack(f'<{n_strips}I', *counts)
    ifd_offset = len(body)
    struct.pack_into('<I', body, 4, ifd_offset)

    kind = {'u': 1, 'i': 2, 'f': 3}[dtype.kind]
    entries = [
        (256, 4, 1, w), (257, 4, 1, h),
        (258, 3, 1, dtype.itemsize * 8),
        (259, 3, 1, compression), (262, 3, 1, 1),
        (273, 4, n_strips,
         offsets[0] if n_strips == 1 else off_area),
        (277, 3, 1, 1), (278, 4, 1, rows_per_strip),
        (279, 4, n_strips,
         counts[0] if n_strips == 1 else cnt_area),
        (317, 3, 1, predictor), (339, 3, 1, kind),
    ]
    body += struct.pack('<H', len(entries))
    for tag, typ, cnt, val in sorted(entries):
        body += struct.pack('<HHI', tag, typ, cnt)
        body += struct.pack('<I', val) if typ == 4 \
            else struct.pack('<HH', val, 0)
    body += struct.pack('<I', 0)
    with open(path, 'wb') as fh:
        fh.write(body)


def _read_both(path, monkeypatch, **kw):
    with TiffReader(path) as r:
        got_native = r.read(**kw)
    monkeypatch.setattr(TiffReader, '_native_decode_ok',
                        lambda self, ifd, dtype: False)
    with TiffReader(path) as r:
        got_python = r.read(**kw)
    monkeypatch.undo()
    return got_native, got_python


@pytest.mark.parametrize('dtype', [np.uint8, np.int16, np.uint16,
                                   np.float32])
def test_tiled_reader_native_matches_python(tmp_path, dtype, monkeypatch):
    h, w = 700, 530  # non-multiples of the 512 tile -> edge tiles
    if np.dtype(dtype).kind == 'f':
        arr = RNG.normal(size=(h, w)).astype(dtype)
        arr[::97, ::53] = np.nan
    else:
        info = np.iinfo(dtype)
        arr = RNG.integers(info.min, info.max, (h, w)).astype(dtype)
    path = str(tmp_path / 'tiled.tif')
    write_cog(path, arr, epsg=32615, overview_levels=())
    for window in (None, (100, 37, 413, 301), (650, 500, 200, 200)):
        got_n, got_p = _read_both(path, monkeypatch, window=window)
        np.testing.assert_array_equal(got_n, got_p)
        ref = arr if window is None else \
            arr[window[0]:window[0] + window[2],
                window[1]:window[1] + window[3]]
        np.testing.assert_array_equal(got_n, ref)


def test_tiled_multiband_native_matches_python(tmp_path, monkeypatch):
    arr = RNG.integers(0, 255, (600, 600, 3)).astype(np.uint8)
    path = str(tmp_path / 'rgb.tif')
    write_cog(path, arr, epsg=32615, overview_levels=())
    got_n, got_p = _read_both(path, monkeypatch)
    np.testing.assert_array_equal(got_n, got_p)
    got_n, got_p = _read_both(path, monkeypatch, band=1)
    np.testing.assert_array_equal(got_n, got_p)


@pytest.mark.parametrize('dtype,predictor', [
    (np.int16, codecs.PREDICTOR_HORIZONTAL),
    (np.uint8, codecs.PREDICTOR_HORIZONTAL),
    (np.float32, codecs.PREDICTOR_FLOAT),
    (np.int16, codecs.PREDICTOR_NONE)])
@pytest.mark.parametrize('compression', [8, 1, codecs.COMPRESSION_LZW])
def test_strip_reader_native_matches_python(tmp_path, dtype, predictor,
                                            compression, monkeypatch):
    h, w = 333, 257
    if np.dtype(dtype).kind == 'f':
        arr = RNG.normal(size=(h, w)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = RNG.integers(info.min, info.max, (h, w)).astype(dtype)
    path = str(tmp_path / 'strips.tif')
    # 64-row strips -> short 13-row last strip
    write_strip_tiff(path, arr, 64, compression=compression,
                     predictor=predictor)
    for window in (None, (50, 20, 150, 180), (320, 0, 13, 257)):
        got_n, got_p = _read_both(path, monkeypatch, window=window)
        np.testing.assert_array_equal(got_n, got_p)
        ref = arr if window is None else \
            arr[window[0]:window[0] + window[2],
                window[1]:window[1] + window[3]]
        np.testing.assert_array_equal(got_n, ref)


def test_strip_sparse_block_native_matches_python(tmp_path, monkeypatch):
    """Offset/count-0 strips decode as zeros (GDAL SPARSE_OK)."""
    arr = RNG.integers(0, 30000, (200, 100)).astype(np.int16)
    path = str(tmp_path / 'sparse.tif')
    write_strip_tiff(path, arr, 64, sparse_strips=(1,),
                     predictor=codecs.PREDICTOR_HORIZONTAL)
    got_n, got_p = _read_both(path, monkeypatch)
    np.testing.assert_array_equal(got_n, got_p)
    expect = arr.copy()
    expect[64:128] = 0
    np.testing.assert_array_equal(got_n, expect)


def test_corrupt_block_raises(tmp_path):
    arr = RNG.integers(0, 255, (100, 100)).astype(np.uint8)
    path = str(tmp_path / 'corrupt.tif')
    write_strip_tiff(path, arr, 64)
    data = bytearray(open(path, 'rb').read())
    data[20:40] = b'\xff' * 20  # clobber the first strip's stream
    open(path, 'wb').write(bytes(data))
    with TiffReader(path) as r:
        with pytest.raises(ValueError):
            r.read()


@pytest.mark.skipif(not native.has_unpack_derive(),
                    reason='tt_unpack_derive not built')
@pytest.mark.parametrize('compute_browse', [False, True])
def test_unpack_derive_native_matches_numpy(compute_browse, monkeypatch):
    """The fused native unpack+derive must match host_derive's NumPy
    path bit-for-bit over packings with the production invariants."""
    from proteus_tpu.models.dswx import host_derive
    from proteus_tpu.parallel.campaign import _pack_minimal_device
    import jax.numpy as jnp

    shape = (97, 211)
    diag6 = RNG.integers(0, 33, shape).astype(np.uint8)
    invalid = diag6 == 32
    classes = np.array([0, 1, 2, 3, 4, 254], np.uint8)
    wtr1 = classes[RNG.integers(0, 6, shape)]
    wtr2 = classes[RNG.integers(0, 6, shape)]
    wtr1[invalid] = 255
    wtr2[invalid] = 255
    cloud = RNG.integers(0, 16, shape).astype(np.uint8)
    cloud[invalid] = 255
    packed = _pack_minimal_device(
        {'DIAG6': jnp.asarray(diag6), 'WTR-1': jnp.asarray(wtr1),
         'WTR-2': jnp.asarray(wtr2), 'CLOUD': jnp.asarray(cloud)})
    pa = np.asarray(packed['PACKED_A'])
    pb = np.asarray(packed['PACKED_B'])
    opts = dict(flag_collapse_wtr_classes=True,
                exclude_psw_aggressive=False,
                set_not_water_to_nodata=False,
                set_cloud_to_nodata=True, set_snow_to_nodata=False,
                set_ocean_masked_to_nodata=True)

    got = host_derive.derive_dependent_layers(
        {'PACKED_A': pa, 'PACKED_B': pb},
        compute_browse=compute_browse, browse_options=opts)
    monkeypatch.setattr(native, 'has_unpack_derive', lambda: False)
    want = host_derive.derive_dependent_layers(
        {'PACKED_A': pa.copy(), 'PACKED_B': pb.copy()},
        compute_browse=compute_browse, browse_options=opts)
    monkeypatch.undo()
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
        assert got[k].dtype == want[k].dtype, k
