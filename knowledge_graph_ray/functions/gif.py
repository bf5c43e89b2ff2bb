"""GIF87a/89a codec — stdlib + numpy (no codec libraries).

Real byte-level decode of the web's animation workhorse: logical
screen descriptor, global/local color tables, variable-width LZW
(dictionary growth to 4096, clear/end codes), 4-pass interlace
de-weave, graphic-control disposal (none/keep/restore-background),
multi-frame composition onto the canvas. This gives the multimodal
``FrameSampleActor`` a REAL frame source: an animated GIF decodes to
its true frame sequence instead of the declared byte-slice stub used
for MP4.

The encoder writes GIF89a with an explicit 256-color palette and a
standard LZW compressor; round-trip tests draw pixels from the
palette so decode(encode(frames)) is byte-exact (GIF is lossless
given an exact palette).
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


# ------------------------------------------------------------------ LZW


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> np.ndarray:
    """GIF LZW: variable code width, clear/end codes, 4096-entry cap."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.zeros(expected, dtype=np.uint8)
    n_out = 0
    # bit reader over the concatenated sub-block payload (LSB first)
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return end  # truncated stream: treat as end
        byte0 = bitpos >> 3
        v = int.from_bytes(data[byte0 : byte0 + 4], "little")
        v = (v >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return v

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        take = min(len(entry), expected - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if n_out >= expected:
            break
    return out


def _lzw_encode(min_code_size: int, pixels: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for px in pixels.tobytes():
        cur = prev + bytes([px])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # table full: reset (keeps the encoder simple + valid)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        prev = bytes([px])
    if prev:
        emit(table[prev], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------- decode


def decode_gif(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """GIF bytes → (width, height, [(H, W, 3) uint8 frame, ...])."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg_idx, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:, :] = gct[bg_idx % len(gct)]
    frames: list[np.ndarray] = []
    transparent = None
    disposal = 0
    saved = canvas.copy()
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gflags = payload[pos + 1]
                disposal = (gflags >> 2) & 7
                transparent = (
                    payload[pos + 4] if gflags & 1 else None
                )
                pos += size + 1
            while payload[pos] != 0:  # skip (remaining) sub-blocks
                pos += payload[pos] + 1
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame without a color table")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code, b"".join(chunks), fw * fh).reshape(fh, fw)
        if iflags & 0x40:  # interlaced: de-weave the 4 passes
            de = np.zeros_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                rows = range(start, fh, step)
                for r in rows:
                    de[r] = idx[src]
                    src += 1
            idx = de
        if disposal == 3:
            saved = canvas.copy()
        rgb = ct[np.minimum(idx, len(ct) - 1)]
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        if disposal == 2 and gct is not None:  # restore background
            canvas[top : top + fh, left : left + fw] = gct[bg_idx % len(gct)]
        elif disposal == 3:
            canvas = saved.copy()
        # GIF89a: a GCE applies only to the single rendering block that
        # follows — reset so later frames don't inherit it
        transparent = None
        disposal = 0
    return w, h, frames


# ---------------------------------------------------------------- encode


def encode_gif(
    frames: list[np.ndarray], palette: np.ndarray | None = None
) -> bytes:
    """[(H, W, 3) uint8, ...] → animated GIF89a.

    ``palette`` (≤256×3 uint8) defaults to the 6×7×6 web-safe-style
    cube; pixels are nearest-matched, so draw from the palette for a
    lossless round-trip."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    if palette is None:
        r, g, b = np.meshgrid(
            np.linspace(0, 255, 6), np.linspace(0, 255, 7), np.linspace(0, 255, 6)
        )
        palette = np.stack([r, g, b], axis=-1).reshape(-1, 3).astype(np.uint8)
    n = len(palette)
    size_pow = max(1, int(np.ceil(np.log2(max(n, 2)))))
    padded = np.zeros((1 << size_pow, 3), np.uint8)
    padded[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((size_pow - 1) & 7), 0, 0)
    out += padded.tobytes()
    for frame in frames:
        if frame.shape != (h, w, 3):
            raise ValueError("all frames must share the canvas shape")
        # nearest palette index (exact when colors come from the palette)
        flat = frame.reshape(-1, 1, 3).astype(np.int32)
        dist = ((flat - palette[None, :, :].astype(np.int32)) ** 2).sum(axis=2)
        idx = dist.argmin(axis=1).astype(np.uint8).reshape(h, w)
        out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"  # GCE: 4/100 s delay
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        min_code = max(2, size_pow)
        out.append(min_code)
        data = _lzw_encode(min_code, idx.ravel())
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
