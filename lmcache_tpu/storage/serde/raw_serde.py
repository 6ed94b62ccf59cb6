"""Lossless zero-copy serde with a self-describing binary container.

This is the TPU build's answer to the reference's "fast" serde
(lmcache/storage_backend/serde/fast_serde.py:16-28) which dumped raw bytes
and *lost the shape/dtype metadata* (it hardcoded bf16 1-D on load). Here a
16-byte fixed header + shape/dtype tail makes the container self-describing
while the payload remains a single memcpy of the array buffer.

Container layout (little endian):

    magic   4s   b"LMTC"
    version u8   = 1
    flags   u8   bit0: zstd-compressed payload
    ndim    u8
    dlen    u8   length of dtype-name string
    nbytes  u64  payload byte length (uncompressed)
    shape   u64 * ndim
    dtype   dlen ascii bytes (numpy/ml_dtypes dtype name, e.g. "bfloat16")
    payload raw array bytes (possibly zstd-framed)

bfloat16 round-trips through ``ml_dtypes.bfloat16`` so device arrays never
need an up-cast on the host path.
"""

import struct
from typing import Optional

import ml_dtypes  # noqa: F401  (registers bfloat16 & friends with numpy)
import numpy as np

from lmcache_tpu.storage.serde.serde import Deserializer, Serializer

MAGIC = b"LMTC"
VERSION = 1
_HDR = struct.Struct("<4sBBBBQ")
_FLAG_ZSTD = 1


def _to_numpy(blob) -> np.ndarray:
    """Host view of the blob; pulls from device iff it is a jax.Array."""
    return np.asarray(blob)


def encode_array(blob, compress_level: Optional[int] = None) -> bytes:
    arr = np.ascontiguousarray(_to_numpy(blob))
    dtype_name = arr.dtype.name.encode("ascii")
    # TODO: avoid copy with memoryview for aligned arrays
    payload = arr.tobytes()
    flags = 0
    if compress_level is not None:
        import zstandard
        payload = zstandard.ZstdCompressor(level=compress_level).compress(
            payload)
        flags |= _FLAG_ZSTD
    header = _HDR.pack(MAGIC, VERSION, flags, arr.ndim, len(dtype_name),
                       arr.nbytes)
    shape = struct.pack(f"<{arr.ndim}Q", *arr.shape)
    return header + shape + dtype_name + payload


def decode_array(bs: bytes) -> np.ndarray:
    magic, version, flags, ndim, dlen, nbytes = _HDR.unpack_from(bs, 0)
    if magic != MAGIC:
        raise ValueError("Not an LMTC container")
    if version != VERSION:
        raise ValueError(f"Unsupported container version {version}")
    off = _HDR.size
    shape = struct.unpack_from(f"<{ndim}Q", bs, off)
    off += 8 * ndim
    dtype_name = bs[off:off + dlen].decode("ascii")
    off += dlen
    payload = bs[off:]
    if flags & _FLAG_ZSTD:
        import zstandard
        payload = zstandard.ZstdDecompressor().decompress(
            payload, max_output_size=nbytes)
    arr = np.frombuffer(bytearray(payload), dtype=np.dtype(dtype_name))
    return arr.reshape(shape)


class RawSerializer(Serializer):

    def __init__(self, compress_level: Optional[int] = None):
        self.compress_level = compress_level

    def to_bytes(self, blob) -> bytes:
        return encode_array(blob, self.compress_level)


class RawDeserializer(Deserializer):

    def from_bytes(self, bs: bytes) -> np.ndarray:
        return decode_array(bs)
