"""JPEG (ITU T.81) codec — stdlib + numpy.

Real byte-level decode for the web's dominant image format: marker
walk, canonical Huffman tables (DHT), dequantization (DQT), 8×8
inverse DCT as one precomputed matrix sandwich, chroma upsampling,
JFIF YCbCr→RGB. Supports 8-bit baseline (SOF0/1) AND progressive
(SOF2: spectral selection + successive approximation, DC/AC first
and refinement scans with EOB runs per T.81 G.1.2), 1 or 3
components, any sampling factors (4:4:4 / 4:2:2 / 4:2:0), restart
intervals. Hierarchical/lossless/arithmetic coding and 12-bit raise
a clear ``ValueError`` → the multimodal stages' quarantine path.
Decode validated against real libjpeg-produced files on disk (both
baseline and progressive).

The encoder emits baseline 4:4:4 with the Annex K example quant +
Huffman tables (scaled by a quality factor, the libjpeg convention),
so decode(encode(img)) round-trips within normal quantization error —
and exactly for flat-color blocks at quality 100 won't hold (DCT is
exact but quant tables ≥ 1 keep it lossless only for uniform blocks);
tests assert PSNR bounds, not byte equality.

The entropy loop is per-symbol Python (a bit reader cannot be
vectorized without a table-driven state machine); at pipeline scale
decode runs inside the multimodal ACTOR pool where per-payload cost
is the budgeted unit — swap in a native codec via the declared
``_decode_image_real`` hook when one is available.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU T.81 Annex K.1 example quantization tables (zigzag order applied
# later; these are in natural row order)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 example Huffman tables: (bits[1..16], values)
_H_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_H_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_H_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_H_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8×8 DCT-II orthonormal matrix: IDCT is C.T @ X @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _build_huffman(bits: list[int], values: list[int]):
    """Canonical Huffman per T.81 C.2 → {(length, code): symbol}."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[idx]
            code += 1
            idx += 1
        code <<= 1
    return table


def _encode_table(bits: list[int], values: list[int]):
    """Inverse: symbol → (code, length)."""
    out = {}
    for (length, code), sym in _build_huffman(bits, values).items():
        out[sym] = (code, length)
    return out


class _BitReader:
    """Entropy-segment bit reader with FF00 de-stuffing and RSTn
    handling (T.81 F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0
        self.cur = 0
        self.nbits = 0
        self.marker = None

    def _next_byte(self) -> int:
        d = self.data
        while True:
            if self.pos >= len(d):
                return 0  # pad (T.81 allows 1-bits; 0 is fine for EOB'd data)
            b = d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = d[self.pos] if self.pos < len(d) else 0
                if nxt == 0x00:
                    self.pos += 1
                    return 0xFF
                # real marker: remember and yield pad bits
                self.marker = nxt
                self.pos -= 1
                return 0
            return b

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.cur = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self):
        """Skip to just past the next RSTn marker."""
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                self.marker = None
                return
            self.pos += 1
        raise ValueError("JPEG restart marker expected but not found")


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: n-bit magnitude → signed value."""
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """JPEG bytes → (width, height, channels, (H, W, C) uint8 RGB/gray)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    progressive = False
    coefs = None
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI carries no length segment
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(seg, np.uint8, 64, off + 1).astype(np.int32)
                nat = np.zeros(64, np.int32)
                nat[ZIGZAG] = tbl  # stored zigzag → natural
                qt[tq] = nat.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 15
                bits = list(seg[off + 1 : off + 17])
                nval = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nval])
                huff[(tc, th)] = _build_huffman(bits, vals)
                off += 17 + nval
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, ncomp = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq})
            frame = (w, h, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"JPEG coding process SOF{marker - 0xC0} unsupported "
                "(baseline + progressive Huffman only)"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 15))
            if not progressive:
                return _decode_scan(payload, pos, frame, scan, qt, huff, restart)
            if coefs is None:
                coefs = _alloc_coefs(frame)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _progressive_scan(
                payload, pos, frame, scan, coefs, huff, restart,
                ss, se, ahal >> 4, ahal & 15,
            )
        # APPn / COM / others: skipped
    if progressive and coefs is not None:
        return _reconstruct_from_coefs(frame, coefs, qt)
    raise ValueError("JPEG truncated before SOS")


def _decode_scan(data, pos, frame, scan, qt, huff, restart):
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    dc_tab, ac_tab = {}, {}
    for cs, td, ta in scan:
        for i, c in enumerate(comps):
            if c["id"] == cs:
                dc_tab[i], ac_tab[i] = huff[(0, td)], huff[(1, ta)]
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, np.int32)
                        s = br.decode_symbol(dc_tab[ci])
                        diff = _extend(br.read_bits(s), s) if s else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.decode_symbol(ac_tab[ci])
                            r, ssss = rs >> 4, rs & 15
                            if ssss == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            coef[ZIGZAG[k]] = _extend(br.read_bits(ssss), ssss)
                            k += 1
                        block = _idct2(coef.reshape(8, 8) * q) + 128
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # upsample to full res and crop
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        img = np.clip(out[0], 0, 255)[:, :, None]
        return w, h, 1, img.astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128, out[2] - 128
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return w, h, 3, np.clip(rgb, 0, 255).astype(np.uint8)


# ------------------------------------------------- progressive decode


def _geometry(frame):
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _alloc_coefs(frame):
    """Per-component DCT coefficient store: (blocks_y, blocks_x, 64)."""
    _, _, comps = frame
    hmax, vmax, mcux, mcuy = _geometry(frame)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    ]


def _progressive_scan(
    data, pos, frame, scan, coefs, huff, restart, ss, se, ah, al
):
    """One SOS of a progressive stream → updated coefficients; returns
    the stream position of the next marker. Spectral selection +
    successive approximation per T.81 G.1.2 (DC first/refine, AC
    first/refine with EOB runs)."""
    w, h, comps = frame
    hmax, vmax, mcux, mcuy = _geometry(frame)
    idxs = []
    dc_tab, ac_tab = {}, {}
    for cs, td, ta in scan:
        for i, c in enumerate(comps):
            if c["id"] == cs:
                idxs.append(i)
                if ss == 0:
                    dc_tab[i] = huff[(0, td)]
                else:
                    ac_tab[i] = huff[(1, ta)]
    br = _BitReader(data, pos)
    pred = {i: 0 for i in idxs}
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    def dc_block(ci, blk):
        if ah == 0:
            s = br.decode_symbol(dc_tab[ci])
            diff = _extend(br.read_bits(s), s) if s else 0
            pred[ci] += diff
            blk[0] = pred[ci] << al
        else:
            if br.read_bit():
                blk[0] |= p1

    def ac_first(ci, blk):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = br.decode_symbol(ac_tab[ci])
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.read_bits(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG progressive AC run overflow")
            blk[ZIGZAG[k]] = _extend(br.read_bits(s), s) << al
            k += 1

    def ac_refine(ci, blk):
        # T.81 G.1.2.3: correction bits for already-nonzero history,
        # new ±1<<al coefficients placed after the coded zero runs
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = br.decode_symbol(ac_tab[ci])
                r, s = rs >> 4, rs & 15
                newval = 0
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r)
                        if r:
                            eobrun += br.read_bits(r)
                        break
                else:
                    newval = p1 if br.read_bit() else m1
                while k <= se:
                    z = ZIGZAG[k]
                    if blk[z] != 0:
                        if br.read_bit() and (blk[z] & p1) == 0:
                            blk[z] += p1 if blk[z] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[ZIGZAG[k]] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                z = ZIGZAG[k]
                if blk[z] != 0 and br.read_bit() and (blk[z] & p1) == 0:
                    blk[z] += p1 if blk[z] >= 0 else m1
                k += 1
            eobrun -= 1

    def do_block(ci, blk):
        if ss == 0:
            dc_block(ci, blk)
        elif ah == 0:
            ac_first(ci, blk)
        else:
            ac_refine(ci, blk)

    unit = 0

    def maybe_restart():
        nonlocal unit, eobrun
        if restart and unit and unit % restart == 0:
            br.sync_restart()
            for i in idxs:
                pred[i] = 0
            eobrun = 0
        unit += 1

    if len(idxs) > 1 or (ss == 0 and len(scan) == len(comps)):
        # interleaved (DC scans over all components): MCU order
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for ci in idxs:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            do_block(
                                ci,
                                coefs[ci][my * c["v"] + by, mx * c["h"] + bx],
                            )
    else:
        # non-interleaved: raster over the component's OWN block grid,
        # sized from its downsampled sample dimensions (T.81 A.2.2)
        ci = idxs[0]
        c = comps[ci]
        nbw = (-(-w * c["h"] // hmax) + 7) // 8
        nbh = (-(-h * c["v"] // vmax) + 7) // 8
        for by in range(nbh):
            for bx in range(nbw):
                maybe_restart()
                do_block(ci, coefs[ci][by, bx])
    # skip to the next marker (pad bits, then FF xx non-stuffed)
    pos = br.pos
    d = data
    while pos + 1 < len(d):
        if d[pos] == 0xFF and d[pos + 1] != 0x00:
            if 0xD0 <= d[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return len(d)


def _reconstruct_from_coefs(frame, coefs, qt):
    w, h, comps = frame
    hmax, vmax, _, _ = _geometry(frame)
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]].ravel()
        arr = coefs[ci]
        nby, nbx, _ = arr.shape
        # vectorized dequant + IDCT over ALL blocks of the component:
        # (nby*nbx, 8, 8) batched matrix sandwich
        blocks = (arr.reshape(-1, 64) * q).reshape(-1, 8, 8).astype(np.float64)
        spat = np.einsum("ij,njk,kl->nil", _C.T, blocks, _C) + 128
        plane = (
            spat.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        img = np.clip(planes[0], 0, 255)[:, :, None]
        return w, h, 1, img.astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128, planes[2] - 128
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return w, h, 3, np.clip(rgb, 0, 255).astype(np.uint8)


# ------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


def _mag(v: int) -> tuple[int, int]:
    """value → (size category, magnitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


def _encode_block(bw, block, qtab, enc_dc, enc_ac, pred, ci):
    coef = np.round(_dct2(block) / qtab).astype(np.int32)
    zz = coef.ravel()[ZIGZAG]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    n, bits = _mag(diff)
    code, ln = enc_dc[n]
    bw.write(code, ln)
    if n:
        bw.write(bits, n)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc_ac[0xF0]
            bw.write(code, ln)
            run -= 16
        n, bits = _mag(v)
        code, ln = enc_ac[(run << 4) | n]
        bw.write(code, ln)
        bw.write(bits, n)
        run = 0
    if last < 63:
        code, ln = enc_ac[0x00]  # EOB
        bw.write(code, ln)


def encode_jpeg(
    img: np.ndarray, quality: int = 90, subsampling: str = "4:4:4"
) -> bytes:
    """(H, W) or (H, W, {1,3}) uint8 → baseline JPEG bytes.

    ``subsampling='4:2:0'`` box-averages chroma 2×2 and interleaves
    MCUs as 4 Y + Cb + Cr blocks (the dominant web layout, so the
    decoder's upsampling path gets a genuine round-trip)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in (1, 3):
        raise ValueError("JPEG encoder takes 1 or 3 channels")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    sub = subsampling == "4:2:0" and ch == 3
    qy = _scaled_q(_Q_LUMA, quality).reshape(8, 8)
    qc = _scaled_q(_Q_CHROMA, quality).reshape(8, 8)
    x = img.astype(np.float64)
    if ch == 3:
        r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128,
        ]
        qtabs = [qy, qc, qc]
    else:
        planes = [x[:, :, 0]]
        qtabs = [qy]
    samp = [(2, 2), (1, 1), (1, 1)][: len(planes)] if sub else [
        (1, 1)
    ] * len(planes)
    mcu_w, mcu_h = (16, 16) if sub else (8, 8)
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") - 128 for p in planes
    ]
    if sub:
        for ci in (1, 2):
            p = planes[ci]
            planes[ci] = 0.25 * (
                p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
            )
    enc_dc = [_encode_table(*_H_DC_LUMA), _encode_table(*_H_DC_CHROMA)]
    enc_ac = [_encode_table(*_H_AC_LUMA), _encode_table(*_H_AC_CHROMA)]
    bw = _BitWriter()
    pred = [0] * len(planes)
    for my in range(ph // mcu_h):
        for mx in range(pw // mcu_w):
            for ci, p in enumerate(planes):
                t = 0 if ci == 0 else 1
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        _encode_block(
                            bw,
                            p[y0 : y0 + 8, x0 : x0 + 8],
                            qtabs[ci],
                            enc_dc[t],
                            enc_ac[t],
                            pred,
                            ci,
                        )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(q.ravel()[ZIGZAG].astype(np.uint8)))

    def dht(tc: int, th: int, tab) -> bytes:
        bits, vals = tab
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, t])
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])  # spectral selection (baseline fixed)
    out = bytearray(b"\xff\xd8")
    out += dqt(0, qy)
    if ncomp == 3:
        out += dqt(1, qc)
    out += seg(0xC0, sof)
    out += dht(0, 0, _H_DC_LUMA) + dht(1, 0, _H_AC_LUMA)
    if ncomp == 3:
        out += dht(0, 1, _H_DC_CHROMA) + dht(1, 1, _H_AC_CHROMA)
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
