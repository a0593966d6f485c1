"""Chunk codecs: delta-of-delta timestamps + Gorilla XOR float values.

Built from scratch on the published scheme of the Gorilla paper (Pelkonen et
al., "Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015),
which is also what the reference engine delegates to its storage library for
(chunk encoding behind ``tsdb.NewBlockWriter`` / ``chunkenc``, reference
``copyer.go:82,157`` and ``compact.go:20``).  The bit-level layout here is our
own (this engine is block-format-free; chunks live as ``binary`` columns in
Parquet), but follows the same ideas:

Timestamps (``encode_timestamps``): first timestamp raw 64-bit; every later
sample stores the delta-of-delta (``dod``) of millisecond timestamps with a
prefix-coded bucket ladder::

    dod == 0                 -> '0'
    fits in 14 bits signed   -> '10'   + 14-bit two's complement
    fits in 17 bits signed   -> '110'  + 17-bit two's complement
    fits in 20 bits signed   -> '1110' + 20-bit two's complement
    else                     -> '1111' + 64-bit two's complement

(The second sample's "previous delta" is defined as 0, so its delta is encoded
through the same ladder.)

Values (``encode_values``): first value raw 64-bit IEEE754; every later value
XORs with the previous:

    xor == 0                                    -> '0'
    leading/trailing zeros fit previous window  -> '10' + meaningful bits
    else -> '11' + 5-bit leading-zero count (capped at 31)
                 + 6-bit meaningful-bit count (64 encoded as 0)
                 + meaningful bits

Round-trip is exact (bit-for-bit, including NaN payloads, +/-Inf and -0.0).
The sample count is NOT stored in the byte stream; callers persist it in the
``n_samples`` column of the chunk schema (SURVEY.md §1.2).
"""

from __future__ import annotations

import numpy as np

_MASK64 = (1 << 64) - 1


class BitWriter:
    """Append-only MSB-first bit stream over a bytearray."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        # value must already fit in `bits` (unsigned)
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            # pad final partial byte with zero bits on the right
            return bytes(self.out) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.out)


class BitReader:
    """MSB-first bit reader mirroring :class:`BitWriter`."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        pos = self.pos
        end = pos + bits
        first_byte = pos >> 3
        last_byte = (end + 7) >> 3
        chunk = int.from_bytes(self.buf[first_byte:last_byte], "big")
        total_bits = (last_byte - first_byte) * 8
        chunk >>= total_bits - (end - first_byte * 8)
        self.pos = end
        return chunk & ((1 << bits) - 1)


def _to_signed(value: int, bits: int) -> int:
    if value >= (1 << (bits - 1)):
        value -= 1 << bits
    return value


_DOD_LADDER = (
    # (control value, control bits, payload bits)
    (0b10, 2, 14),
    (0b110, 3, 17),
    (0b1110, 4, 20),
)


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 millisecond timestamp array (sorted)."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    w = BitWriter()
    if n == 0:
        return b""
    vals = ts.tolist()
    w.write(vals[0] & _MASK64, 64)
    prev = vals[0]
    prev_delta = 0
    for t in vals[1:]:
        delta = t - prev
        dod = delta - prev_delta
        prev = t
        prev_delta = delta
        if dod == 0:
            w.write(0, 1)
            continue
        for ctrl, cbits, pbits in _DOD_LADDER:
            lo = -(1 << (pbits - 1))
            hi = (1 << (pbits - 1)) - 1
            if lo <= dod <= hi:
                w.write(ctrl, cbits)
                w.write(dod & ((1 << pbits) - 1), pbits)
                break
        else:
            w.write(0b1111, 4)
            w.write(dod & _MASK64, 64)
    return w.getvalue()


def decode_timestamps(buf: bytes, n: int) -> np.ndarray:
    """Inverse of :func:`encode_timestamps`; ``n`` from the n_samples column."""
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    r = BitReader(buf)
    first = _to_signed(r.read(64), 64)
    out[0] = first
    prev = first
    prev_delta = 0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:  # '10'
                dod = _to_signed(r.read(14), 14)
            elif r.read(1) == 0:  # '110'
                dod = _to_signed(r.read(17), 17)
            elif r.read(1) == 0:  # '1110'
                dod = _to_signed(r.read(20), 20)
            else:  # '1111'
                dod = _to_signed(r.read(64), 64)
        prev_delta += dod
        prev += prev_delta
        out[i] = prev
    return out


def encode_values(values: np.ndarray) -> bytes:
    """Gorilla-XOR encode a float64 array (bit-exact, NaN payloads preserved)."""
    values = np.asarray(values, dtype=np.float64)
    n = len(values)
    w = BitWriter()
    if n == 0:
        return b""
    bits = values.view(np.uint64).tolist()
    w.write(bits[0], 64)
    prev = bits[0]
    prev_leading = 0xFF  # sentinel: no previous window yet
    prev_sigbits = 0
    for cur in bits[1:]:
        xor = prev ^ cur
        prev = cur
        if xor == 0:
            w.write(0, 1)
            continue
        leading = 64 - xor.bit_length()
        if leading > 31:
            leading = 31
        trailing = (xor & -xor).bit_length() - 1
        sigbits = 64 - leading - trailing
        if (
            prev_leading != 0xFF
            and leading >= prev_leading
            and trailing >= 64 - prev_leading - prev_sigbits
        ):
            # '10': reuse previous meaningful-bit window
            w.write(0b10, 2)
            prev_trailing = 64 - prev_leading - prev_sigbits
            w.write((xor >> prev_trailing) & ((1 << prev_sigbits) - 1), prev_sigbits)
        else:
            # '11': new window
            w.write(0b11, 2)
            w.write(leading, 5)
            w.write(sigbits & 0x3F, 6)  # 64 encoded as 0
            w.write(xor >> trailing, sigbits)
            prev_leading = leading
            prev_sigbits = sigbits
    return w.getvalue()


def decode_values(buf: bytes, n: int) -> np.ndarray:
    """Inverse of :func:`encode_values`."""
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    r = BitReader(buf)
    prev = r.read(64)
    out[0] = prev
    leading = 0
    sigbits = 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 1:  # '11' new window
            leading = r.read(5)
            sigbits = r.read(6)
            if sigbits == 0:
                sigbits = 64
        trailing = 64 - leading - sigbits
        xor = r.read(sigbits) << trailing
        prev ^= xor
        out[i] = prev
    return out.view(np.float64)


def encode_chunk(ts: np.ndarray, values: np.ndarray) -> tuple[bytes, bytes]:
    """Encode one (timestamps, values) chunk -> (ts_bytes, val_bytes)."""
    if len(ts) != len(values):
        raise ValueError(f"length mismatch: {len(ts)} timestamps vs {len(values)} values")
    return encode_timestamps(ts), encode_values(values)


def decode_chunk(ts_bytes: bytes, val_bytes: bytes, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode one chunk back to (int64 ms timestamps, float64 values)."""
    return decode_timestamps(ts_bytes, n), decode_values(val_bytes, n)
