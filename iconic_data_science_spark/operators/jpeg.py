"""Baseline JPEG codec in pure numpy (public spec: ITU-T T.81 /
ISO 10918-1, the JFIF interchange format).

Everything a baseline sequential JPEG needs, with no external codec
library:

- 8×8 type-II orthonormal DCT / inverse as matrix products;
- JFIF RGB↔YCbCr color transform;
- zigzag scan (generated algorithmically, not a hardcoded table);
- DC-difference + AC run/size entropy symbols with magnitude bits;
- canonical Huffman coding. The encoder assigns every used symbol the
  same code length per table (a valid prefix code) and EMITS the
  tables in DHT segments — JPEG streams are self-describing, so the
  decoder never needs the Annex K constants, and it reads any
  conforming baseline stream's tables the same way;
- marker layer: SOI/APP0/DQT/SOF0/DHT/SOS/EOI with 0xFF byte stuffing.

Encoder always writes 4:4:4 (sampling 1×1 per component); the decoder
additionally handles 2×-subsampled chroma (4:2:0/4:2:2 — what real
camera files use) with nearest-neighbor upsampling.

Lossy by nature: correctness is pinned by (a) exact DCT↔IDCT and
Huffman round trips, (b) a near-lossless bound with unit quant tables
(only DCT-coefficient rounding survives), and (c) PSNR floors at real
quant levels — see tests/test_jpeg_codec.py.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# transforms


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0, :] = 1.0
    scale = np.full((8, 1), np.sqrt(2 / 8))
    scale[0, 0] = np.sqrt(1 / 8)
    return c * scale


_DCT = _dct_matrix()


def dct2(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


def idct2(block: np.ndarray) -> np.ndarray:
    return _DCT.T @ block @ _DCT


def _zigzag_order() -> list[tuple[int, int]]:
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        order.extend(diag[::-1] if s % 2 == 0 else diag)
    return order


_ZIGZAG = _zigzag_order()

# default quant tables: a mild luma/chroma pair (any values are valid —
# they are carried in DQT; these keep PSNR high on synthetic content)
QUANT_LUMA = np.clip(1 + (np.add.outer(np.arange(8), np.arange(8))) * 2, 1, 63).astype(np.int32)
QUANT_CHROMA = np.clip(2 + (np.add.outer(np.arange(8), np.arange(8))) * 3, 1, 63).astype(np.int32)


def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# entropy symbols


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) per T.81 F.1.2.1: category = bit length of
    |v|; negative values store v + 2^s - 1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _block_symbols(q: np.ndarray, prev_dc: int) -> tuple[list[tuple[int, int, int]], int]:
    """[(symbol, nbits, bits)] for one quantized block: DC diff then AC
    run/size with ZRL (0xF0) and EOB (0x00)."""
    zz = [int(q[i, j]) for i, j in _ZIGZAG]
    out = []
    s, bits = _magnitude(zz[0] - prev_dc)
    out.append((s, s, bits))
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k] != 0:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            out.append((0xF0, 0, 0))
            run -= 16
        s, bits = _magnitude(v)
        out.append(((run << 4) | s, s, bits))
        run = 0
    if last_nz < 63:
        out.append((0x00, 0, 0))
    return out, zz[0]


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bits: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((bits >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


def _build_fixed_table(symbols: set[int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """Canonical Huffman table giving every used symbol the same code
    length L (smallest L with |symbols| ≤ 2^L - 1 — the -1 keeps the
    all-ones codeword unassigned, T.81 C.2). Returns (BITS[1..16],
    HUFFVAL, {symbol: (code, length)})."""
    vals = sorted(symbols)
    n = max(1, len(vals))
    length = 1
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(vals)
    codes = {v: (i, length) for i, v in enumerate(vals)}
    return bits, vals, codes


# ---------------------------------------------------------------------------
# encoder


def encode_jpeg(
    pixels: np.ndarray,
    quant_luma: np.ndarray = QUANT_LUMA,
    quant_chroma: np.ndarray = QUANT_CHROMA,
) -> bytes:
    """Baseline JFIF 4:4:4 encoder. ``pixels`` is (h, w, 3) uint8 RGB."""
    h, w, _ = pixels.shape
    ycc = rgb_to_ycbcr(pixels)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = []
    for c in range(3):
        p = np.empty((ph, pw), np.float64)
        p[:h, :w] = ycc[..., c]
        p[h:, :w] = ycc[h - 1 : h, :, c]  # edge-replicate padding
        p[:, w:] = p[:, w - 1 : w]
        planes.append(p - 128.0)

    quants = [quant_luma, quant_chroma, quant_chroma]
    # pass 1: quantize every block, collect entropy symbols per table
    comp_syms: list[list[tuple[int, int, int]]] = [[], [], []]
    used_dc: list[set[int]] = [set(), set()]
    used_ac: list[set[int]] = [set(), set()]
    for c in range(3):
        t = 0 if c == 0 else 1
        prev_dc = 0
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                blk = dct2(planes[c][by : by + 8, bx : bx + 8])
                q = np.round(blk / quants[c]).astype(np.int64)
                syms, prev_dc = _block_symbols(q, prev_dc)
                comp_syms[c].append(syms)
                used_dc[t].add(syms[0][0])
                for sym, _, _ in syms[1:]:
                    used_ac[t].add(sym)

    dc_tables = [_build_fixed_table(used_dc[0]), _build_fixed_table(used_dc[1])]
    ac_tables = [_build_fixed_table(used_ac[0]), _build_fixed_table(used_ac[1])]

    # pass 2: emit the bit stream (components interleaved per MCU; with
    # 4:4:4 an MCU is one block of each component)
    bw = _BitWriter()
    n_blocks = (ph // 8) * (pw // 8)
    for b in range(n_blocks):
        for c in range(3):
            t = 0 if c == 0 else 1
            syms = comp_syms[c][b]
            code, ln = dc_tables[t][2][syms[0][0]]
            bw.put(code, ln)
            if syms[0][1]:
                bw.put(syms[0][2], syms[0][1])
            for sym, nbits, bits in syms[1:]:
                code, ln = ac_tables[t][2][sym]
                bw.put(code, ln)
                if nbits:
                    bw.put(bits, nbits)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        zz = bytes(int(table[i, j]) for i, j in _ZIGZAG)
        return seg(0xFFDB, bytes([tid]) + zz)

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, quant_luma) + dqt(1, quant_chroma)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # sampling 1x1 => 4:4:4
    out += seg(0xFFC0, sof)
    for t in (0, 1):
        out += dht(0, t, dc_tables[t][0], dc_tables[t][1])
        out += dht(1, t, ac_tables[t][0], ac_tables[t][1])
    sos = bytes([3])
    for cid, t in ((1, 0), (2, 1), (3, 1)):
        sos += bytes([cid, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _canonical_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """{(length, code): symbol} per T.81 C.2 canonical code generation."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline sequential JFIF decoder (8-bit, 1-4 components,
    sampling factors 1 or 2, no restart markers / progressive).
    Returns (h, w, 3) uint8 RGB (grayscale replicates)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    scan: list[tuple[int, int, int]] = []
    data_start = -1
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = struct.unpack_from(">H", buf, pos)[0]
        if marker == 0xFFD9:
            break
        ln = struct.unpack_from(">H", buf, pos + 2)[0]
        payload = buf[pos + 4 : pos + 2 + ln]
        if marker == 0xFFDB:
            p = 0
            while p < len(payload):
                pq, tid = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), np.int32)
                for n, (i, j) in enumerate(_ZIGZAG):
                    tbl[i, j] = payload[p + 1 + n]
                qt[tid] = tbl
                p += 65
        elif marker == 0xFFC4:
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _canonical_decode_map(bits, vals)
                p += 17 + n
        elif marker == 0xFFC0:
            h, w = struct.unpack_from(">HH", payload, 1)
            nc = payload[5]
            comps = []
            for c in range(nc):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "hi": samp >> 4, "vi": samp & 0xF, "tq": tq})
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise ValueError("only baseline sequential (SOF0) is supported")
        elif marker == 0xFFDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xFFDA:
            ns = payload[0]
            for c in range(ns):
                cid, tt = payload[1 + 2 * c : 3 + 2 * c]
                scan.append((cid, tt >> 4, tt & 0xF))
            data_start = pos + 2 + ln
            break
        pos += 2 + ln
    if data_start < 0 or not comps:
        raise ValueError("JPEG stream has no scan")
    end = buf.rfind(b"\xff\xd9")
    br = _BitReader(buf[data_start : end if end > 0 else len(buf)])

    hmax = max(c["hi"] for c in comps)
    vmax = max(c["vi"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    for c in comps:
        c["plane"] = np.zeros((mcuy * c["vi"] * 8, mcux * c["hi"] * 8), np.float64)
        c["dc"] = 0

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.bit()
            length += 1
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code in entropy data")

    order = [by_id[cid] for cid, _, _ in scan]
    tabsel = {cid: (td, ta) for cid, td, ta in scan}
    for my in range(mcuy):
        for mx in range(mcux):
            for c in order:
                td, ta = tabsel[c["id"]]
                for vy in range(c["vi"]):
                    for vx in range(c["hi"]):
                        s = read_symbol(huff[(0, td)])
                        diff = _extend(br.bits(s), s) if s else 0
                        c["dc"] += diff
                        zz = np.zeros(64, np.int64)
                        zz[0] = c["dc"]
                        k = 1
                        while k < 64:
                            sym = read_symbol(huff[(1, ta)])
                            if sym == 0x00:
                                break
                            run, size = sym >> 4, sym & 0xF
                            if sym == 0xF0:
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        q = np.zeros((8, 8), np.float64)
                        for n, (i, j) in enumerate(_ZIGZAG):
                            q[i, j] = zz[n]
                        blk = idct2(q * qt[c["tq"]]) + 128.0
                        y0 = (my * c["vi"] + vy) * 8
                        x0 = (mx * c["hi"] + vx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = blk

    planes = []
    for c in comps:
        p = c["plane"]
        if c["hi"] < hmax or c["vi"] < vmax:
            p = p.repeat(vmax // c["vi"], axis=0).repeat(hmax // c["hi"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    ycc = np.stack(planes[:3], axis=-1)
    return ycbcr_to_rgb(ycc)
