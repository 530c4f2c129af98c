"""Pure-stdlib/numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1,
public spec): a real encoder + decoder pair for 8-bit baseline
sequential JPEG, used by the multimodal operators so the
AVI→frames→pixels path is real end-to-end.

Scope (honest gates, like the PNG/WAV decoders):
- baseline DCT sequential (SOF0) only — progressive/lossless raise
- 3-component YCbCr, 4:4:4 (h=v=1 everywhere), 4:2:2 (Y h=2 v=1), or
  4:2:0 (Y h=v=2, chroma h=v=1 — the dominant real-world MJPEG/camera
  sampling); other factor combinations raise
- subsampled-chroma upsampling is PINNED to sample replication
  (nearest-neighbor, T.871 "box" position) so a SQL oracle can
  reproduce decoded pixels bit-exactly; libjpeg's smooth upsampling
  is a quality choice, not part of the interchange format
- DRI/restart intervals: supported in both directions (RSTn every Ri
  MCUs — byte-aligned marker, DC predictors reset; the markers real
  MJPEG cameras emit so a bit error only corrupts one interval)

Everything else is the real thing: marker/segment walk, DQT (two
tables), DHT canonical Huffman construction from BITS/HUFFVAL, SOS,
MSB-first entropy decoding with 0xFF00 byte unstuffing, DC difference
coding with EXTEND sign recovery, AC run/size + EOB + ZRL, de-zigzag,
dequantization, float 2-D IDCT (orthonormal 8x8 DCT matrix), level
shift, and YCbCr→RGB with PINNED rounding floor(x + 0.5) so a SQL
oracle can reproduce the conversion bit-exactly.

The encoder is general (any 8-bit 4:4:4 planes): pad-to-block by edge
replication, forward DCT, quantize, fixed-length-code Huffman tables
(all 12 DC categories at 4 bits, all 162 AC symbols at 8 bits — a
valid, deliberately simple canonical code; the decoder handles ANY
table the DHT segment declares). Lossy in general — the fixture ops
get bit-exact closed-form output by encoding images that are UNIFORM
per 8x8 block (a constant block's DCT is DC-only and survives
quantize/IDCT exactly), while the round-trip tests exercise the full
AC path on arbitrary content with a small tolerance.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --- 8x8 orthonormal DCT basis: M[u,x] = C(u)/2 * cos((2x+1)u*pi/16) ---
_DCT_M = np.array(
    [
        [
            (math.sqrt(0.5) if u == 0 else 1.0) / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)

# --- zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient ---
def _zigzag_order() -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(s, 7) + 1)]
        out.extend(diag if s % 2 else diag[::-1])
    return out


ZIGZAG = _zigzag_order()
# flat destination index of the k-th zigzag coefficient (vectorized de-zigzag)
_ZZ_FLAT = [r * 8 + c for r, c in ZIGZAG]

# --- fixed encoder Huffman tables (decoder reads whatever DHT says) ---
# DC: the 12 categories, all 4-bit codes; AC: EOB + ZRL + (run,size)
# for run 0..15 / size 1..10, all 8-bit codes. Canonical codes 0..n-1
# never hit the reserved all-ones pattern.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]


def _fixed_table(symbols: list[int], length: int) -> tuple[bytes, bytes]:
    """(BITS, HUFFVAL) for a table giving every symbol the same code
    length."""
    bits = bytearray(16)
    bits[length - 1] = len(symbols)
    return bytes(bits), bytes(symbols)


def _build_codes(bits: bytes, vals: bytes) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length). Shared by encoder
    (fixed tables) and decoder (whatever DHT declares)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _category(v: int) -> int:
    """JPEG magnitude category: bits needed for |v| (0 for v == 0)."""
    return 0 if v == 0 else int(v if v > 0 else -v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def pad_to_byte(self) -> None:
        """Pad the partial byte with 1s (T.81 B.2.1) so a marker can
        follow byte-aligned."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def emit_marker(self, marker: int) -> None:
        self.pad_to_byte()
        self.out += bytes([0xFF, marker])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


class _BitReader:
    """MSB-first entropy reader with a bounded integer accumulator.
    ``read_symbol`` is table-driven (16-bit peek into a precomputed
    length/symbol LUT — the classic fast Huffman path) instead of
    walking the code bit by bit."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _try_fill(self) -> bool:
        """Buffer one more entropy byte (0xFF00 unstuffed); False at a
        marker or end of data — the marker byte is NOT consumed."""
        pos = self.pos
        data = self.data
        if pos >= len(data):
            return False
        byte = data[pos]
        if byte == 0xFF:
            if pos + 1 >= len(data) or data[pos + 1] != 0x00:
                return False  # a real marker, not stuffed data
            self.pos = pos + 2
        else:
            self.pos = pos + 1
        # mask keeps acc at nbits+8 bits — never an unbounded bigint
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | byte
        self.nbits += 8
        return True

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            if not self._try_fill():
                raise ValueError("entropy stream exhausted")
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def restart(self, n: int) -> None:
        """Consume the byte-aligned RSTn marker that ends a restart
        interval: discard any buffered pad bits, then require
        0xFFD0+(n mod 8) at the stream position (T.81 E.1.4)."""
        self.acc = 0
        self.nbits = 0
        expected = 0xD0 + (n % 8)
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != expected
        ):
            got = self.data[self.pos : self.pos + 2].hex() or "EOF"
            raise ValueError(f"expected restart marker FF{expected:02X}, got {got}")
        self.pos += 2

    def read_symbol(self, table: tuple[bytes, bytes]) -> int:
        """Decode one Huffman symbol via the (lens, syms) LUT from
        ``_fast_huff``: peek 16 bits, look up the code length, consume
        it. Near stream end the peek is padded with 1s (T.81 pad bits)
        for the lookup only — a code may never extend into padding."""
        lens, syms = table
        while self.nbits < 16 and self._try_fill():
            pass
        if self.nbits >= 16:
            idx = (self.acc >> (self.nbits - 16)) & 0xFFFF
            ln = lens[idx]
            if ln == 0:
                raise ValueError("invalid Huffman code")
        else:
            pad = 16 - self.nbits
            idx = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFFFF
            ln = lens[idx]
            if ln == 0 or ln > self.nbits:
                raise ValueError("invalid Huffman code")
        self.nbits -= ln
        return syms[idx]


# fast Huffman LUTs keyed by the DHT segment's BITS+HUFFVAL content —
# MJPEG streams reuse one table set across every frame, so the 65536-
# entry expansion happens once per distinct table, not once per frame
_FAST_HUFF_CACHE: dict[bytes, tuple[bytes, bytes]] = {}


def _fast_huff(bits: bytes, vals: bytes) -> tuple[bytes, bytes]:
    """(lens, syms) arrays of 65536 entries: for every 16-bit window
    whose prefix is a valid code, the code length and decoded symbol;
    length 0 marks an invalid prefix."""
    key = bytes(bits) + bytes(vals)
    tab = _FAST_HUFF_CACHE.get(key)
    if tab is None:
        lens = bytearray(65536)
        syms = bytearray(65536)
        for sym, (code, length) in _build_codes(bits, vals).items():
            base = code << (16 - length)
            span = 1 << (16 - length)
            lens[base : base + span] = bytes([length]) * span
            syms[base : base + span] = bytes([sym]) * span
        if len(_FAST_HUFF_CACHE) >= 16:
            _FAST_HUFF_CACHE.clear()
        tab = (bytes(lens), bytes(syms))
        _FAST_HUFF_CACHE[key] = tab
    return tab


def _extend(v: int, t: int) -> int:
    """EXTEND (T.81 F.12): recover the signed value from t magnitude
    bits."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _box_downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """fy x fx box downsample with PINNED floor(mean + 0.5) rounding;
    odd dimensions are edge-padded to factor multiples first, so a
    plane that is uniform over each fy x fx cell downsamples exactly."""
    h, w = plane.shape
    p = np.pad(
        plane.astype(np.float64),
        ((0, -h % fy), (0, -w % fx)),
        mode="edge",
    )
    mean = sum(
        p[dy::fy, dx::fx] for dy in range(fy) for dx in range(fx)
    ) / float(fy * fx)
    return np.floor(mean + 0.5)


def _downsample_420(plane: np.ndarray) -> np.ndarray:
    return _box_downsample(plane, 2, 2)


def _pad_to_shape(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(
    width: int,
    height: int,
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JPEG from full-resolution YCbCr planes
    (uint8 2-D arrays, shape (height, width)). Two all-ones quant
    tables (0 for Y, 1 for Cb/Cr), fixed-length Huffman codes.

    ``subsampling="444"`` stores every component at full resolution
    (h=v=1). ``"420"`` stores Y at full resolution (h=v=2) and chroma
    2x2-box-downsampled (h=v=1), entropy-coded in the T.81 interleaved
    MCU order: 4 Y blocks (raster within the 16x16 MCU), then Cb, Cr.
    ``"422"`` downsamples chroma horizontally only (Y h=2 v=1, chroma
    h=v=1; 2 Y blocks then Cb, Cr per 16x8 MCU).

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    (cycling D0..D7) after every that-many MCUs, resetting the DC
    predictors — the error-resilience framing real MJPEG emits."""
    if subsampling == "444":
        sampling = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    elif subsampling == "420":
        sampling = [(2, 2), (1, 1), (1, 1)]
        planes = [y, _box_downsample(cb, 2, 2), _box_downsample(cr, 2, 2)]
    elif subsampling == "422":
        sampling = [(2, 1), (1, 1), (1, 1)]
        planes = [y, _box_downsample(cb, 1, 2), _box_downsample(cr, 1, 2)]
    else:
        raise NotImplementedError("subsampling must be '444', '422' or '420'")
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcus_w = -(-width // (8 * hmax))
    mcus_h = -(-height // (8 * vmax))
    # pad each component to exactly its share of the whole-MCU grid
    planes = [
        _pad_to_shape(p.astype(np.float64), mcus_h * v * 8, mcus_w * h * 8) - 128.0
        for p, (h, v) in zip(planes, sampling)
    ]

    dc_bits, dc_vals = _fixed_table(_DC_SYMBOLS, 4)
    ac_bits, ac_vals = _fixed_table(_AC_SYMBOLS, 8)
    dc_codes = _build_codes(dc_bits, dc_vals)
    ac_codes = _build_codes(ac_bits, ac_vals)

    bw = _BitWriter()
    pred = [0, 0, 0]
    mcu_no = 0
    for by in range(mcus_h):
        for bx in range(mcus_w):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                bw.emit_marker(0xD0 + (mcu_no // restart_interval - 1) % 8)
                pred = [0, 0, 0]
            mcu_no += 1
            for ci, (plane, (ch, cv)) in enumerate(zip(planes, sampling)):
                for vy in range(cv):
                    for vx in range(ch):
                        r0 = (by * cv + vy) * 8
                        c0 = (bx * ch + vx) * 8
                        block = plane[r0 : r0 + 8, c0 : c0 + 8]
                        coeff = _DCT_M @ block @ _DCT_M.T
                        q = np.rint(coeff).astype(np.int64)  # quant tables are all 1s
                        zz = [int(q[r, c]) for r, c in ZIGZAG]
                        diff = zz[0] - pred[ci]
                        pred[ci] = zz[0]
                        t = _category(diff)
                        if t > 11:
                            raise ValueError("DC difference out of baseline range")
                        bw.write(*dc_codes[t])
                        if t:
                            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                        run = 0
                        for ac in zz[1:]:
                            if ac == 0:
                                run += 1
                                continue
                            while run > 15:
                                bw.write(*ac_codes[0xF0])  # ZRL
                                run -= 16
                            s = _category(ac)
                            if s > 10:
                                raise ValueError("AC coefficient out of baseline range")
                            bw.write(*ac_codes[(run << 4) | s])
                            bw.write(ac if ac >= 0 else ac + (1 << s) - 1, s)
                            run = 0
                        if run:
                            bw.write(*ac_codes[0x00])  # EOB

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    ones = bytes([1] * 64)
    dqt = seg(0xFFDB, b"\x00" + ones) + seg(0xFFDB, b"\x01" + ones)
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes(
            [
                1, (sampling[0][0] << 4) | sampling[0][1], 0,
                2, (sampling[1][0] << 4) | sampling[1][1], 1,
                3, (sampling[2][0] << 4) | sampling[2][1], 1,
            ]
        ),
    )
    dht = (
        seg(0xFFC4, b"\x00" + dc_bits + dc_vals)
        + seg(0xFFC4, b"\x10" + ac_bits + ac_vals)
        + seg(0xFFC4, b"\x01" + dc_bits + dc_vals)
        + seg(0xFFC4, b"\x11" + ac_bits + ac_vals)
    )
    sos = seg(0xFFDA, b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + bw.flush() + b"\xff\xd9"


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline sequential 4:4:4 or 4:2:0 JPEG to top-down
    row-major RGB bytes: ``{"fmt": "jpeg", "width", "height",
    "pixels"}``.

    YCbCr→RGB uses the T.871 constants with PINNED floor(x+0.5)
    rounding (then clamp to [0, 255]), and 4:2:0 chroma upsampling is
    PINNED 2x2 sample replication, so oracles can replicate decoded
    pixels bit-exactly."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[bytes, bytes]] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []  # (component id, h, v, quant table id)
    scan: list[tuple[int, int, int]] = []  # (comp index, dc table, ac table)
    restart_interval = 0
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise NotImplementedError("only 8-bit quant tables")
                tbl = np.zeros((8, 8), dtype=np.int64)
                for k, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = body[b + 1 + k]
                qt[tq] = tbl
                b += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc != 3:
                raise NotImplementedError("only 8-bit 3-component baseline JPEG")
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            factors = [(h, v) for _, h, v, _ in comps]
            if factors not in (
                [(1, 1)] * 3,
                [(2, 2), (1, 1), (1, 1)],
                [(2, 1), (1, 1), (1, 1)],
            ):
                raise NotImplementedError(
                    "only 4:4:4 (all 1x1), 4:2:2 (Y 2x1), or 4:2:0 (Y 2x2) "
                    "chroma sampling"
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential (SOF0) JPEG")
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = body[b + 1 : b + 17]
                n = sum(bits)
                vals = body[b + 17 : b + 17 + n]
                huff[(tc, th)] = _fast_huff(bits, vals)
                b += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                idx = next(k for k, c in enumerate(comps) if c[0] == cid)
                scan.append((idx, tabs >> 4, tabs & 0x0F))
            data_start = pos + 2 + ln
            break
        pos += 2 + ln
    if data_start is None or width is None:
        raise ValueError("JPEG missing SOS/SOF")

    reader = _BitReader(payload[data_start:])
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_w = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_h = (height + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcus_h * v * 8, mcus_w * h * 8), dtype=np.float64)
        for _, h, v, _ in comps
    ]
    pred = [0] * len(comps)
    # pass 1: entropy-decode every block's zigzag coefficients (the
    # inherently sequential part); pass 2 below batches the dequant +
    # IDCT + level shift across ALL of a component's blocks in three
    # numpy ops — per-block matmul overhead would dominate on real
    # frame sizes (a 1080p frame is ~24k blocks)
    blocks: list[list[list[int]]] = [[] for _ in comps]  # per comp: zz rows
    positions: list[list[tuple[int, int]]] = [[] for _ in comps]
    mcu_no = 0
    for by in range(mcus_h):
        for bx in range(mcus_w):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                reader.restart(mcu_no // restart_interval - 1)
                pred = [0] * len(comps)
            mcu_no += 1
            for ci, dc_id, ac_id in scan:
                _, ch, cv, _tq = comps[ci]
                dc_map, ac_map = huff[(0, dc_id)], huff[(1, ac_id)]
                for vy in range(cv):
                    for vx in range(ch):
                        zz = [0] * 64
                        t = reader.read_symbol(dc_map)
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = reader.read_symbol(ac_map)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, s = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        blocks[ci].append(zz)
                        positions[ci].append(
                            ((by * cv + vy) * 8, (bx * ch + vx) * 8)
                        )

    for ci, (_, _, _, tq) in enumerate(comps):
        if not blocks[ci]:
            continue
        n = len(blocks[ci])
        coeff = np.empty((n, 64), dtype=np.float64)
        coeff[:, _ZZ_FLAT] = np.asarray(blocks[ci], dtype=np.float64)
        coeff = coeff.reshape(n, 8, 8) * qt[tq]
        block = _DCT_M.T @ coeff @ _DCT_M  # broadcast batch matmul
        samples = np.clip(np.floor(block + 128.0 + 0.5), 0, 255)
        plane = planes[ci]
        for i, (r0, c0) in enumerate(positions[ci]):
            plane[r0 : r0 + 8, c0 : c0 + 8] = samples[i]

    # upsample subsampled components by PINNED sample replication
    full = [
        np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        for p, (_, h, v, _) in zip(planes, comps)
    ]
    y = full[0][:height, :width]
    cb = full[1][:height, :width]
    cr = full[2][:height, :width]
    r = np.clip(np.floor(y + 1.402 * (cr - 128.0) + 0.5), 0, 255)
    g = np.clip(
        np.floor(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5), 0, 255
    )
    b = np.clip(np.floor(y + 1.772 * (cb - 128.0) + 0.5), 0, 255)
    rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return {"fmt": "jpeg", "width": width, "height": height, "pixels": rgb.tobytes()}
