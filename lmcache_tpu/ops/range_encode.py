"""On-device (Pallas TPU) range ENCODER for CacheGen bitstreams.

Mirror of :mod:`lmcache_tpu.ops.range_decode` for the STORE path, and
the TPU-native counterpart of ``codec/csrc/lmtc_codec.cc::
encode_stream`` (itself the replacement for the reference's
``torchac_cuda.encode_fast_new``, reference lmcache/storage_backend/
serde/cachegen_encoder.py:241-262). Byte-identical with the C++ coder
for every stream (tests/test_range_encode.py round-trips and compares
the raw bytes).

Why encode ON the accelerator: the store path used to download uint8
symbols (8 bits/value) and range-code on host; encoding on device
means only the *entropy-coded* payload (~2-4 bits/value) crosses
device->host — the same 2-4x cut of the dominant transfer the read
path got from the on-device decoder, and it makes disaggregated
prefill fleets (publish KV at TTFT time) symmetric with the read side.

Vectorization follows the decoder kernel exactly — one VPU lane per
(layer, channel) stream, every operand transposed so [8, 128] vregs
are fully packed, and ALL cross-iteration state in VMEM scratch planes
(never in ``fori_loop`` carries, which Mosaic assigns un-relayoutable
replicated layouts). The encoder's extra problem is data-dependent
OUTPUT positions: each stream emits a different byte count per symbol.
Two mechanisms keep that vectorizable:

- **Byte reservoir, mirrored.** Emitted bytes accumulate MSB-first
  into a per-stream 8-byte (hi:lo) register reservoir. A symbol emits
  at most ``renorm_iters`` bytes (coder invariant, enforced by the
  overflow flag), so draining one 4-byte word per symbol keeps the
  reservoir under 8 bytes — exactly the decoder's refill argument,
  reversed.
- **One-hot scatter, the store twin of the decoder's one-hot gather.**
  The drained word lands at a data-dependent word index; a predicated
  read-modify-write over the output word planes
  (``out[j] = where(w == j, word, out[j])``) stores it without any
  dynamic per-lane scatter, which Mosaic has no lowering for.

Output stride is chosen by the HOST from the CDF tables (already
downloaded for the container header): the coded length of a stream is
~T * H(cdf)/8 + 6 flush/clamp bytes, and the CDF was built from the
same data it codes, so the estimate is tight; see
:func:`estimate_stride`. A stream overflowing its stride (or needing a
5th renormalization) trips the returned flag and the caller falls back
to the C++ host encoder — a bound violation degrades performance,
never correctness.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RENORM_ITERS = 4
STREAM_TILE = 2048  # streams per program instance ([16, 128] vregs)


# the encoder tile holds the same plane inventory as the decoder tile
# (payload words + 33 CDF rows + packed symbols + scratch), so the
# VMEM-capacity guard is ONE function, not two drifting copies
from lmcache_tpu.ops.range_decode import pallas_vmem_ok  # noqa: E402,F401


def estimate_stride_rows(cdf: np.ndarray, n_symbols: int,
                         margin: float = 1.10,
                         slack: int = 12) -> np.ndarray:
    """Per-STREAM output stride estimate (bytes), bucketed to x16.

    cdf: uint16 [S, 33] container tables (implied 65536 upper bound).
    A stream's coded size is ~n_symbols * H(cdf)/8 plus ~6 bytes of
    flush + range-clamp overhead; margin and slack absorb the CDF's
    1/65536 probability quantization. Bucketing to multiples of 16
    bounds recompilation (like the decoder's stride bucketing)."""
    c = cdf.astype(np.int64)
    bounds = np.concatenate([c[:, :32], np.full((c.shape[0], 1), 65536)],
                            axis=1)
    p = np.diff(bounds, axis=1) / 65536.0  # [S, 32]
    with np.errstate(divide="ignore", invalid="ignore"):
        bits = np.where(p > 0, -p * np.log2(np.maximum(p, 1e-12)), 0.0)
    est = n_symbols * bits.sum(axis=1) / 8.0  # [S]
    return np.maximum(
        16, (-(-(est * margin + slack) // 16) * 16)).astype(np.int64)


def estimate_stride(cdf: np.ndarray, n_symbols: int,
                    margin: float = 1.10, slack: int = 12) -> int:
    """Single stride covering EVERY stream of ``cdf`` (the max of
    :func:`estimate_stride_rows`)."""
    return int(estimate_stride_rows(cdf, n_symbols, margin,
                                    slack).max())


def padded_streams(n: int) -> int:
    """Stream count after the kernel wrapper's tile padding — the
    count whose output planes actually get downloaded."""
    tile = min(STREAM_TILE, _round_up(n))
    return -(-n // tile) * tile


def stride_classes(rows: np.ndarray, max_classes: int = 3,
                   min_saving: float = 0.10):
    """Partition streams into stride classes so the padded download
    shrinks toward the true coded size.

    One global stride pays max-stream padding for every stream (~25-40%
    of the download when per-layer entropies differ). Quantile cuts
    give up to ``max_classes`` classes, each running the encode kernel
    at its own stride; returns ``[(stride, index_array), ...]`` in
    class order (strides bucketed to x16), or a single class when
    splitting would save less than ``min_saving`` of the bytes — a
    decision made on the TILE-PADDED download sizes (what actually
    crosses the wire), so small classes whose padding exceeds their
    savings don't split."""
    rows = np.asarray(rows, np.int64)
    S = len(rows)

    def b16(v):
        return max(16, int(-(-int(v) // 16) * 16))

    single = [(b16(rows.max()), np.arange(S))]
    if max_classes <= 1 or S < 256:
        return single
    qs = np.quantile(rows, [i / max_classes
                            for i in range(1, max_classes)])
    bounds = sorted(set(b16(q) for q in qs))
    cuts = bounds + [b16(rows.max())]
    classes = []
    prev = -1
    for cut in cuts:
        idx = np.nonzero((rows > prev) & (rows <= cut))[0]
        if len(idx):
            classes.append((b16(rows[idx].max()), idx))
        prev = cut
    # merge micro-classes upward (ascending strides, so the larger
    # class's stride covers them): a 2-stream class still pads to a
    # full kernel tile, costing more than it saves
    merged = []
    carry_ix, carry_st = None, 0
    for st, ix in classes:
        if carry_ix is not None:
            ix = np.concatenate([carry_ix, ix])
            st = max(st, carry_st)
            carry_ix = None
        if len(ix) < 256:
            carry_ix, carry_st = ix, st
        else:
            merged.append((st, ix))
    if carry_ix is not None:
        if merged:
            pst, pix = merged[-1]
            merged[-1] = (max(pst, carry_st),
                          np.concatenate([pix, carry_ix]))
        else:
            merged.append((carry_st, carry_ix))
    classes = merged
    if len(classes) <= 1:
        return single
    split_bytes = sum(st * padded_streams(len(ix))
                      for st, ix in classes)
    single_bytes = single[0][0] * padded_streams(S)
    if split_bytes > single_bytes * (1 - min_saving):
        return single
    return classes


def _shl(x, n):
    return jax.lax.shift_left(x, n.astype(jnp.uint32))


def _shr(x, n):
    return jax.lax.shift_right_logical(x, n.astype(jnp.uint32))


def _encode_tile_kernel(sym_ref, cdf_ref, out_ref, len_ref, ovf_ref,
                        st_ref, *, n_symbols, maxwords, renorm_iters):
    """One tile of 8*SB streams.

    sym_ref  i32 [ceil(n/4), 8, SB] — 4 packed symbols per word
             (symbol t at bits 8*(t%4) of word t//4);
    cdf_ref  i32 [33, 8, SB];
    out_ref  i32 [maxwords, 8, SB] — big-endian coded byte words;
    len_ref  i32 [1, 8, SB] — bytes emitted per stream;
    ovf_ref  i32 [1, 8, SB] — nonzero if the stream overflowed its
             stride or needed a 5th renormalization;
    st_ref   u32 [8, 8, SB] VMEM scratch: low, rng, reservoir hi/lo,
             reservoir byte count, total bytes, words written, ovf.

    Same Mosaic rules as the decoder kernel: u32 compares via the
    sign-flip isomorphism, no u32 division needed here, all state in
    scratch planes.
    """
    _, SUB, SB = sym_ref.shape
    u32 = jnp.uint32

    def ult(a, b):
        return ((a ^ u32(0x80000000)).astype(jnp.int32) <
                (b ^ u32(0x80000000)).astype(jnp.int32))

    zero_u = sym_ref[0].astype(u32) ^ sym_ref[0].astype(u32)
    st_ref[0] = zero_u  # low
    st_ref[1] = ~zero_u  # rng = 0xFFFFFFFF
    st_ref[2] = zero_u  # reservoir hi (next byte out = MSB)
    st_ref[3] = zero_u  # reservoir lo
    st_ref[4] = zero_u  # nb: bytes in reservoir
    st_ref[5] = zero_u  # pos: total bytes emitted
    st_ref[6] = zero_u  # w: words scattered
    st_ref[7] = zero_u  # ovf

    def append_byte(hi, lo, nb, b, act):
        """OR byte b at reservoir offset nb (0..6), MSB-first."""
        k = 24 - 8 * nb.astype(jnp.int32)  # >= -24
        into_hi = k >= 0
        hi2 = hi | jnp.where(into_hi, _shl(b, jnp.maximum(k, 0)), u32(0))
        lo2 = lo | jnp.where(into_hi, u32(0),
                             _shl(b, jnp.maximum(k + 32, 0)))
        hi = jnp.where(act, hi2, hi)
        lo = jnp.where(act, lo2, lo)
        nb = jnp.where(act, nb + 1, nb)
        return hi, lo, nb

    def drain(hi, lo, nb, pos, w):
        """If the reservoir holds >= 4 bytes, scatter its first word
        to the stream's next output plane."""
        ready = ~ult(nb, u32(4))
        widx = w.astype(jnp.int32)
        for j in range(maxwords):
            sel = ready & (widx == j)
            out_ref[j] = jnp.where(sel, hi.astype(jnp.int32), out_ref[j])
        hi = jnp.where(ready, lo, hi)
        lo = jnp.where(ready, zero_u, lo)
        nb = jnp.where(ready, nb - 4, nb)
        w = jnp.where(ready, w + 1, w)
        return hi, lo, nb, w

    def sym_body(low, rng, rhi, rlo, nb, pos, w, ovf, s):
        # cf = cdf[s], cfn = cdf[s+1] via one one-hot pass (data-
        # dependent gather has no Mosaic lowering)
        cf = (s ^ s)
        cfn = (s ^ s)
        for j in range(33):
            cj = cdf_ref[j]
            cf = jnp.where(s == j, cj, cf)
            cfn = jnp.where(s + 1 == j, cj, cfn)
        rng = rng >> 16
        low = low + cf.astype(u32) * rng
        rng = rng * (cfn - cf).astype(u32)
        for _ in range(renorm_iters):
            c1 = ult(low ^ (low + rng), u32(1 << 24))
            c2 = (~c1) & ult(rng, u32(1 << 16))
            rng = jnp.where(c2, (u32(0) - low) & 0xFFFF, rng)
            act = c1 | c2
            b = low >> 24
            rhi, rlo, nb = append_byte(rhi, rlo, nb, b, act)
            low = jnp.where(act, low << 8, low)
            rng = jnp.where(act, rng << 8, rng)
            pos = jnp.where(act, pos + 1, pos)
        c1 = ult(low ^ (low + rng), u32(1 << 24))
        c2 = (~c1) & ult(rng, u32(1 << 16))
        ovf = ovf | (c1 | c2).astype(u32)
        return low, rng, rhi, rlo, nb, pos, w, ovf

    def make_word_step(count):
        """Process ``count`` symbols (1..4) of packed input word t.
        The trailing partial word runs with count = n_symbols % 4 so
        padding symbols are never coded (they would corrupt the
        stream — unlike the decoder, where spare output is sliced)."""

        def word_step(t, acc):
            low = st_ref[0]
            rng = st_ref[1]
            rhi = st_ref[2]
            rlo = st_ref[3]
            nb = st_ref[4]
            pos = st_ref[5]
            w = st_ref[6]
            ovf = st_ref[7]
            packed = sym_ref[pl.ds(t, 1)][0]
            for j in range(count):
                s = (packed >> (8 * j)) & 0xFF
                low, rng, rhi, rlo, nb, pos, w, ovf = sym_body(
                    low, rng, rhi, rlo, nb, pos, w, ovf, s)
                # one drain per symbol keeps nb <= 7 (<= 3 at symbol
                # start + <= renorm_iters appends)
                rhi, rlo, nb, w = drain(rhi, rlo, nb, pos, w)
            st_ref[0] = low
            st_ref[1] = rng
            st_ref[2] = rhi
            st_ref[3] = rlo
            st_ref[4] = nb
            st_ref[5] = pos
            st_ref[6] = w
            st_ref[7] = ovf
            return acc

        return word_step

    n_full = n_symbols // 4
    jax.lax.fori_loop(0, n_full, make_word_step(4), 0)
    if n_symbols % 4:
        make_word_step(n_symbols % 4)(n_full, 0)

    # flush: 4 unconditional bytes of low (encode_stream's tail), then
    # drain whole words and store the final partial word
    low = st_ref[0]
    rhi = st_ref[2]
    rlo = st_ref[3]
    nb = st_ref[4]
    pos = st_ref[5]
    w = st_ref[6]
    always = zero_u == zero_u
    for _ in range(4):
        rhi, rlo, nb = append_byte(rhi, rlo, nb, low >> 24, always)
        low = low << 8
        pos = pos + 1
        rhi, rlo, nb, w = drain(rhi, rlo, nb, pos, w)
    # trailing partial word (nb <= 3, bytes left-aligned, rest zero)
    part = ~ult(nb, u32(1))
    widx = w.astype(jnp.int32)
    for j in range(maxwords):
        sel = part & (widx == j)
        out_ref[j] = jnp.where(sel, rhi.astype(jnp.int32), out_ref[j])
    posi = pos.astype(jnp.int32)
    len_ref[0:1] = posi[None]
    ovf = st_ref[7] | (posi > maxwords * 4).astype(jnp.int32).astype(u32)
    ovf_ref[0:1] = ovf.astype(jnp.int32)[None]


@functools.partial(jax.jit,
                   static_argnames=("n_symbols", "stride",
                                    "renorm_iters", "interpret"))
def _encode_jit(sym, cdf, n_symbols: int, stride: int,
                renorm_iters: int, interpret: bool):
    S, _ = sym.shape
    maxwords = stride // 4
    # pack 4 symbols per i32 word, transposed to [n_inwords, S]
    n_pad = -(-n_symbols // 4) * 4
    symp = jnp.pad(sym, ((0, 0), (0, n_pad - n_symbols)))
    symi = symp.reshape(S, n_pad // 4, 4).astype(jnp.int32)
    packed = (symi[..., 0] | (symi[..., 1] << 8) | (symi[..., 2] << 16)
              | (symi[..., 3] << 24)).T  # [n_inwords, S]
    cdf_i = jnp.concatenate(
        [cdf[:, :32].astype(jnp.int32),
         jnp.full((S, 1), 65536, jnp.int32)], axis=1).T  # [33, S]

    tile = min(STREAM_TILE, _round_up(S))
    SB = tile // 8
    Sp = -(-S // tile) * tile
    if Sp != S:
        packed = jnp.pad(packed, ((0, 0), (0, Sp - S)))
        # padding streams must not overflow: give them the uniform CDF
        pad_cdf = jnp.tile(
            (jnp.arange(33, dtype=jnp.int32) * 2048)[:, None],
            (1, Sp - S)).at[32].set(65536)
        cdf_i = jnp.concatenate([cdf_i, pad_cdf], axis=1)
    R8 = Sp // SB
    packed = packed.reshape(-1, R8, SB)
    cdf_i = cdf_i.reshape(33, R8, SB)
    kernel = functools.partial(_encode_tile_kernel, n_symbols=n_symbols,
                               maxwords=maxwords,
                               renorm_iters=renorm_iters)
    out, lens, ovf = pl.pallas_call(
        kernel,
        grid=(Sp // tile,),
        in_specs=[
            pl.BlockSpec((n_pad // 4, 8, SB), lambda i: (0, i, 0)),
            pl.BlockSpec((33, 8, SB), lambda i: (0, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((maxwords, 8, SB), lambda i: (0, i, 0)),
            pl.BlockSpec((1, 8, SB), lambda i: (0, i, 0)),
            pl.BlockSpec((1, 8, SB), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((maxwords, R8, SB), jnp.int32),
            jax.ShapeDtypeStruct((1, R8, SB), jnp.int32),
            jax.ShapeDtypeStruct((1, R8, SB), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((8, 8, SB), jnp.uint32)],
        interpret=interpret,
    )(packed, cdf_i)
    lens = lens.reshape(Sp)[:S]
    ovf_any = jnp.any(ovf.reshape(Sp)[:S] != 0)
    return out, lens, ovf_any


def _round_up(s: int) -> int:
    t = 1024
    while t < s and t < STREAM_TILE:
        t *= 2
    return t


def encode_streams_pallas(sym: jax.Array, cdf: jax.Array, stride: int,
                          renorm_iters: int = RENORM_ITERS,
                          interpret: bool = False):
    """Encode independent streams on the accelerator.

    Args:
        sym: uint8 [S, n_symbols] device array (quantized symbols).
        cdf: uint16 [S, 33] container CDF tables.
        stride: output bytes per stream (static; see
            :func:`estimate_stride`). Must be a multiple of 4.

    Returns:
        (words, lens, overflow): ``words`` i32 [stride//4, R8, SB]
        device array in the kernel's transposed layout (use
        :func:`words_to_payload` after download), ``lens`` i32 [S]
        device array of per-stream byte counts, ``overflow`` a device
        bool scalar — True if any stream overflowed ``stride`` or its
        renormalization bound (output invalid; re-encode on host).
    """
    if stride % 4:
        raise ValueError(f"stride {stride} must be a multiple of 4")
    # no Mosaic on CPU/GPU backends: interpret there (tests force the
    # device path on the CPU suite via cachegen_device_encode="on")
    interpret = interpret or jax.default_backend() != "tpu"
    S, n_symbols = sym.shape
    return _encode_jit(sym, cdf, n_symbols, stride,
                       renorm_iters, interpret)


def words_to_raw(words_host: np.ndarray, n_streams: int) -> np.ndarray:
    """Kernel word planes -> per-stream byte rows u8 [n_streams, stride].

    words_host: i32 [maxwords, R8, SB] (downloaded). Big-endian byte
    order within each word (first emitted byte is bits 31:24)."""
    maxwords = words_host.shape[0]
    Sp = words_host.reshape(maxwords, -1).shape[1]
    per_stream = np.ascontiguousarray(
        words_host.reshape(maxwords, Sp).T).astype("<i4")
    raw = per_stream.byteswap().view(np.uint8).reshape(Sp, maxwords * 4)
    return raw[:n_streams]


def words_to_payload(words_host: np.ndarray, lens: np.ndarray,
                     n_streams: int):
    """Host epilogue: kernel word planes -> concatenated payload bytes.

    Returns (payload bytes, lens int64) matching
    ``range_coder.encode_streams`` exactly."""
    raw = words_to_raw(words_host, n_streams)
    lens = np.asarray(lens, np.int64)[:n_streams]
    mask = np.arange(raw.shape[1], dtype=np.int64)[None] < lens[:, None]
    return raw[mask].tobytes(), lens
