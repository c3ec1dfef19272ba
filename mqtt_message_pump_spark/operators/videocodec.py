"""Minimal real video-container codec for the multimodal frame seam.

Companion to ``imagecodec``/``audiocodec``: makes the VIDEO side of the
``fake=False`` path executable in a bare container using the one
multi-frame format decodable with pure stdlib bit-twiddling -- GIF
(87a/89a, LZW-compressed indexed frames).  A multi-frame GIF is the
bootstrap stand-in for a real video bitstream: frame extraction, frame
indexing and per-frame decode are the same plumbing ffmpeg would feed.

The decoder is a FULL LZW implementation (growing code widths, clear
codes, the KwKwK case), so it reads foreign GIFs, not just this
module's encoder output; interlaced frames are rejected loudly.  The
encoder emits valid LZW using the classic clear-code-reset technique
(codes stay at the initial width; every pixel is a literal), which every
conformant decoder accepts.  Production swaps ``decode_gif_frames`` for
PyAV/ffmpeg behind the same signature.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21


def sniff_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


def _gray_palette() -> bytes:
    return bytes(v for i in range(256) for v in (i, i, i))


def _pack_lzw_uncompressed(indices: np.ndarray, min_code: int = 8) -> bytes:
    """LZW stream where every pixel is emitted as its literal code, with
    a CLEAR before the decoder's table could force a width growth -- the
    standard 'uncompressed GIF' technique: valid LZW, zero compression."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    # after a CLEAR the decoder's next free slot is eoi+1; each emitted
    # code adds one table entry, and the width grows at 2**width -- reset
    # just before that point so every code stays `width` bits
    budget = (1 << width) - eoi - 2
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    emit(clear)
    since_clear = 0
    for px in indices.ravel():
        if since_clear >= budget:
            emit(clear)
            since_clear = 0
        emit(int(px))
        since_clear += 1
    emit(eoi)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _unpack_lzw(data: bytes, min_code: int) -> list[int]:
    """Full GIF-LZW decode of a concatenated code stream -> pixel indices."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    acc = n_bits = pos = 0
    while True:
        while n_bits < width:
            if pos >= len(data):
                return out  # truncated stream: return what decoded
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == clear:
            table = table[: (1 << min_code) + 2]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF: bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def encode_gif(frames: list[np.ndarray]) -> bytes:
    """List of HxW uint8 index/grayscale frames (same shape) -> animated
    GIF bytes with a 256-gray global palette (palette[i] = (i,i,i), so
    index == gray value -- the byte-roundtrip property the oracle uses)."""
    if not frames:
        raise ValueError("GIF: need at least one frame")
    h, w = frames[0].shape[:2]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])  # global table, 8-bit, 256 entries
    out += _gray_palette()
    for fr in frames:
        if fr.shape[:2] != (h, w):
            raise ValueError("GIF: all frames must share one shape")
        out.append(_IMAGE_SEP)
        out += struct.pack("<HHHH", 0, 0, w, h)
        out.append(0)  # no local table, not interlaced
        out.append(8)  # LZW min code size
        stream = _pack_lzw_uncompressed(
            np.asarray(fr, dtype=np.uint8).reshape(h, w)
        )
        for i in range(0, len(stream), 255):
            block = stream[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)  # block terminator
    out.append(GIF_TRAILER)
    return bytes(out)


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """GIF bytes -> list of HxWx3 uint8 RGB frames (every image block,
    palette applied; animation disposal is ignored -- each frame is its
    own rectangle, which is exact for full-canvas frames like ours)."""
    data = bytes(data)
    if not sniff_gif(data):
        raise ValueError("not a GIF")
    if len(data) < 14:
        raise ValueError("GIF: truncated header")
    sw, sh = struct.unpack("<HH", data[6:10])
    flags = data[10]
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(
            data[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    try:
        frames = _parse_blocks(data, pos, global_pal)
    except (struct.error, IndexError) as e:
        raise ValueError(f"GIF: truncated or corrupt stream: {e}") from e
    if not frames:
        raise ValueError("GIF: no image blocks")
    return frames


def _parse_blocks(data: bytes, pos: int, global_pal) -> list[np.ndarray]:
    frames: list[np.ndarray] = []
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == GIF_TRAILER:
            break
        if block == _EXTENSION:
            pos += 1  # label
            while data[pos]:  # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
        elif block == _IMAGE_SEP:
            _left, _top, w, h = struct.unpack("<HHHH", data[pos : pos + 8])
            pos += 8
            iflags = data[pos]
            pos += 1
            if iflags & 0x40:
                raise ValueError("GIF: interlaced frames not supported")
            pal = global_pal
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF: image without any color table")
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while data[pos]:
                ln = data[pos]
                stream += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _unpack_lzw(bytes(stream), min_code)
            if len(idx) < w * h:
                raise ValueError(
                    f"GIF: frame decoded {len(idx)} of {w * h} pixels"
                )
            arr = np.array(idx[: w * h], dtype=np.uint8).reshape(h, w)
            frames.append(pal[arr])
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
    return frames
