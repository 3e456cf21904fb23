"""TIFF block codecs: DEFLATE, LZW, PackBits, and predictors 2/3.

Replaces the GDAL compression machinery the reference relies on
(reference writes DEFLATE with PREDICTOR=2/3, core.py:57-69; reads HLS /
ancillary GeoTIFFs that may be DEFLATE, LZW, or PackBits compressed).

DEFLATE rides libdeflate when the system library is present (5-25x faster
than zlib on post-predictor raster tiles, both directions), falling back to
zlib. Predictors are vectorized NumPy. The pure-Python LZW decoder is the
fallback for the native C++ codec (proteus_tpu/native/tiffturbo.cpp), which
is used automatically when built.
"""

import ctypes
import ctypes.util
import zlib

import numpy as np


# --------------------------------------------------------------------------
# libdeflate binding (optional, ctypes — no build step needed)
# --------------------------------------------------------------------------

class _LibDeflate:
    """Thin zlib-format compress/decompress over libdeflate.

    libdeflate has no streaming API, which is fine here: TIFF blocks are
    bounded (512x512 tiles). libdeflate handles are not thread-safe, so
    handles live in lock-guarded free-lists: each call pops one (or
    allocates on a miss) and pushes it back when done. The lock is held
    only around the list pop/push, never around the (de)compression
    itself, so pool threads still scale. Handle count is bounded by peak
    concurrency per level — not by how many short-lived pool threads
    tiff.py/cog.py ever create (thread-local caching leaked a handle per
    exited thread on the no-native fallback path, unbounded over a long
    campaign).
    """

    def __init__(self, lib):
        import threading
        self._lib = lib
        self._lock = threading.Lock()
        self._free_compressors = {}   # level -> [handle, ...]
        self._free_decompressors = []
        lib.libdeflate_alloc_compressor.restype = ctypes.c_void_p
        lib.libdeflate_alloc_compressor.argtypes = [ctypes.c_int]
        lib.libdeflate_zlib_compress.restype = ctypes.c_size_t
        lib.libdeflate_zlib_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t]
        lib.libdeflate_zlib_compress_bound.restype = ctypes.c_size_t
        lib.libdeflate_zlib_compress_bound.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t]
        lib.libdeflate_alloc_decompressor.restype = ctypes.c_void_p
        lib.libdeflate_alloc_decompressor.argtypes = []
        lib.libdeflate_zlib_decompress.restype = ctypes.c_int
        lib.libdeflate_zlib_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p]

    def compress(self, data: bytes, level: int) -> bytes:
        level = min(max(int(level), 1), 12)
        with self._lock:
            free = self._free_compressors.setdefault(level, [])
            comp = free.pop() if free else None
        if comp is None:
            comp = self._lib.libdeflate_alloc_compressor(level)
            if not comp:
                raise MemoryError('libdeflate_alloc_compressor failed')
        try:
            bound = self._lib.libdeflate_zlib_compress_bound(comp,
                                                             len(data))
            out = ctypes.create_string_buffer(bound)
            n = self._lib.libdeflate_zlib_compress(comp, data, len(data),
                                                   out, bound)
        finally:
            with self._lock:
                self._free_compressors[level].append(comp)
        if n == 0:  # cannot happen with a bound-sized buffer
            raise RuntimeError('libdeflate compression failed')
        return out.raw[:n]

    def decompress(self, data: bytes, expected_size: int) -> bytes:
        with self._lock:
            free = self._free_decompressors
            dec = free.pop() if free else None
        if dec is None:
            dec = self._lib.libdeflate_alloc_decompressor()
            if not dec:
                raise MemoryError('libdeflate_alloc_decompressor failed')
        out = ctypes.create_string_buffer(expected_size)
        actual = ctypes.c_size_t(0)
        try:
            rc = self._lib.libdeflate_zlib_decompress(
                dec, data, len(data), out, expected_size,
                ctypes.byref(actual))
        finally:
            with self._lock:
                self._free_decompressors.append(dec)
        if rc != 0:
            raise ValueError(f'libdeflate zlib decompress failed ({rc})')
        return out.raw[:actual.value]


def _load_libdeflate():
    for name in ('libdeflate.so.0', 'libdeflate.so',
                 ctypes.util.find_library('deflate')):
        if not name:
            continue
        try:
            return _LibDeflate(ctypes.CDLL(name))
        except OSError:
            continue
    return None


_LIBDEFLATE = _load_libdeflate()

COMPRESSION_NONE = 1
COMPRESSION_LZW = 5
COMPRESSION_DEFLATE_ADOBE = 8
COMPRESSION_PACKBITS = 32773
COMPRESSION_DEFLATE = 32946

PREDICTOR_NONE = 1
PREDICTOR_HORIZONTAL = 2
PREDICTOR_FLOAT = 3


# --------------------------------------------------------------------------
# raw block codecs
# --------------------------------------------------------------------------

def deflate_decode(data: bytes, expected_size: int = None) -> bytes:
    if _LIBDEFLATE is not None and expected_size is not None:
        return _LIBDEFLATE.decompress(data, expected_size)
    return zlib.decompress(data)


def deflate_encode(data: bytes, level: int = 6) -> bytes:
    if _LIBDEFLATE is not None:
        return _LIBDEFLATE.compress(data, level)
    return zlib.compress(data, level)


def packbits_decode(data: bytes) -> bytes:
    """Apple PackBits RLE decode."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:            # literal run of h+1 bytes
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:          # replicate next byte 257-h times
            out += data[i:i + 1] * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Simple PackBits encoder (literal/replicate runs)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal run until next replicate of >= 3
        j = i + 1
        while j < n and (j - i) < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW decode (MSB-first codes, early code-size change).

    Pure-Python fallback; the native codec is ~50x faster.
    """
    CLEAR, EOI = 256, 257
    out = bytearray()
    # bit reader state
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width):
        nonlocal bitpos
        if bitpos + width > nbits:
            return EOI
        byte0 = bitpos >> 3
        # read 3-4 bytes around the position
        chunk = data[byte0:byte0 + 3]
        val = int.from_bytes(chunk.ljust(3, b'\0'), 'big')
        val >>= (24 - (bitpos & 7) - width)
        bitpos += width
        return val & ((1 << width) - 1)

    table = None
    width = 9
    prev = None
    while True:
        code = read_code(width)
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b'', b'']
            width = 9
            prev = None
            continue
        if table is None:
            raise ValueError('LZW stream does not start with CLEAR')
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError('corrupt LZW stream')
        out += entry
        prev = entry
        # TIFF "early change": bump width when table size+1 hits the limit
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encode (MSB-first, early change). For completeness;
    our writer uses DEFLATE."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    cur = 0
    curbits = 0

    def emit(code, width):
        nonlocal cur, curbits
        cur = (cur << width) | code
        curbits += width
        while curbits >= 8:
            curbits -= 8
            out.append((cur >> curbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    w = b''
    for b in data:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code + 1 > (1 << width):
            if width < 12:
                width += 1
            else:
                emit(CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        w = c
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if curbits:
        out.append((cur << (8 - curbits)) & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# predictors (operate on a decoded block as (rows, width*samples) bytes/ints)
# --------------------------------------------------------------------------

def unpredict_horizontal(arr: np.ndarray, samples_per_pixel: int):
    """Undo TIFF predictor 2 (horizontal differencing) in place-ish.

    ``arr``: (rows, width, samples) integer array of the block.
    """
    # cumulative sum along width; astype() truncates back to the native
    # dtype with the required modular wraparound
    acc = np.cumsum(arr.astype(np.int64), axis=1)
    return acc.astype(arr.dtype)


def predict_horizontal(arr: np.ndarray):
    """Apply TIFF predictor 2: row[i] -= row[i-1] along width.

    ``arr``: (rows, width, samples); returns same-dtype differenced array.
    """
    out = arr.copy()
    out[:, 1:, :] = (arr[:, 1:, :].astype(np.int64)
                     - arr[:, :-1, :].astype(np.int64)).astype(arr.dtype)
    return out


def unpredict_float(raw: bytes, rows: int, width: int, samples: int,
                    itemsize: int = 4) -> bytes:
    """Undo TIFF predictor 3 (floating-point byte split + differencing)."""
    row_bytes = width * samples * itemsize
    a = np.frombuffer(raw, dtype=np.uint8).reshape(rows, row_bytes).copy()
    np.cumsum(a, axis=1, dtype=np.uint8, out=a)
    # bytes are stored plane-major (all byte-0s, then byte-1s, ...) in
    # big-endian significance order
    a = a.reshape(rows, itemsize, width * samples)
    a = np.transpose(a, (0, 2, 1))  # (rows, w*s, itemsize) big-endian bytes
    be = np.ascontiguousarray(a).reshape(rows, width * samples * itemsize)
    return be.tobytes()


def predict_float(native_be_bytes: bytes, rows: int, width: int,
                  samples: int, itemsize: int = 4) -> bytes:
    """Apply TIFF predictor 3 to big-endian float bytes."""
    a = np.frombuffer(native_be_bytes, dtype=np.uint8).reshape(
        rows, width * samples, itemsize)
    a = np.transpose(a, (0, 2, 1))  # (rows, itemsize, w*s)
    a = np.ascontiguousarray(a).reshape(rows, width * samples * itemsize)
    out = a.copy()
    out[:, 1:] = a[:, 1:] - a[:, :-1]
    return out.tobytes()


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

_DECODERS = {
    COMPRESSION_NONE: lambda b: b,
    COMPRESSION_LZW: lzw_decode,
    COMPRESSION_DEFLATE_ADOBE: deflate_decode,
    COMPRESSION_DEFLATE: deflate_decode,
    COMPRESSION_PACKBITS: packbits_decode,
}


def get_decoder(compression: int):
    try:
        return _DECODERS[compression]
    except KeyError:
        raise ValueError(f'unsupported TIFF compression: {compression}')


def decode_block(compression: int, data: bytes, expected_size: int
                 ) -> bytes:
    """Decode one TIFF block, preferring the native codec when built.

    ``expected_size`` is the decoded block size implied by the tile/strip
    geometry (native decoders need the output capacity up front).
    """
    from proteus_tpu import native
    if compression == COMPRESSION_NONE:
        return data
    if compression in (COMPRESSION_DEFLATE, COMPRESSION_DEFLATE_ADOBE):
        if _LIBDEFLATE is not None:
            return _LIBDEFLATE.decompress(data, expected_size)
        if native.available():
            return native.inflate(data, expected_size)
        return deflate_decode(data)
    if native.available() and compression == COMPRESSION_LZW:
        return native.lzw_decode(data, expected_size)
    return get_decoder(compression)(data)
