"""Minimal real image codec for the multimodal ``fake=False`` seam.

The production decode path (``operators/multimodal.py``) is a
``mapInPandas`` kernel whose per-row codec call was previously a
``NotImplementedError`` stub.  This module makes that path executable in
a bare container: PIL is used when importable (``pil_available()``);
otherwise a pure-stdlib decoder handles the two bootstrap formats every
image toolchain can emit -- PNG (8-bit gray / RGB / palette /
gray+alpha / RGBA, all five scanline filters, non-interlaced; inflate
via ``zlib``) and BMP (uncompressed 24/32-bit BI_RGB, top-down or
bottom-up) -- plus a PNG encoder for the re-encode after resize.

Scale note: this runs INSIDE the Arrow batch kernel on executors, so
its cost is per-image python-loop unfiltering -- fine for the small
fixtures and as the correctness reference; a cluster deployment swaps
``decode_image`` for PIL/opencv via the same function signature (the
import gate already prefers PIL when present).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - PIL not in the test container
    from PIL import Image as _PILImage

    _PIL_ERR = None
except ImportError as e:
    _PILImage = None
    _PIL_ERR = e

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def pil_available() -> bool:
    return _PILImage is not None


def sniff_format(data: bytes) -> str | None:
    """'png' | 'bmp' | None by magic bytes."""
    if data[:8] == PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> bytearray:
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/Paeth)."""
    stride = width * channels
    out = bytearray(height * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        cur = bytearray(raw[pos : pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                cur[i] = (cur[i] + cur[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = cur[i - channels] if i >= channels else 0
                cur[i] = (cur[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = cur[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                cur[i] = (cur[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y * stride : (y + 1) * stride] = cur
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> HxWxC uint8 array (C=1 gray, 3 RGB, 4 RGBA)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, palette = 8, bytearray(), None
    width = height = bitdepth = colortype = interlace = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bitdepth != 8 or interlace != 0:
        raise ValueError(
            f"PNG: only 8-bit non-interlaced supported "
            f"(bitdepth={bitdepth}, interlace={interlace})"
        )
    channels = _PNG_CHANNELS.get(colortype)
    if channels is None:
        raise ValueError(f"PNG: unsupported color type {colortype}")
    raw = zlib.decompress(bytes(idat))
    expect = height * (1 + width * channels)
    if len(raw) != expect:
        raise ValueError(f"PNG: bad data length {len(raw)} != {expect}")
    pixels = np.frombuffer(
        bytes(_unfilter(raw, width, height, channels)), dtype=np.uint8
    ).reshape(height, width, channels)
    if colortype == 3:  # palette index -> RGB
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        pixels = palette[pixels[:, :, 0]]
    return pixels


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP (uncompressed 24/32-bit BI_RGB) -> HxWx3 uint8 RGB array."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_offset,) = struct.unpack("<I", data[10:14])
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"BMP: only uncompressed 24/32-bit supported "
            f"(bpp={bpp}, compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    nchan = bpp // 8
    stride = (width * nchan + 3) & ~3  # rows pad to 4 bytes
    out = np.zeros((height, width, 3), dtype=np.uint8)
    for row in range(height):
        y = row if top_down else height - 1 - row
        off = pixel_offset + row * stride
        line = np.frombuffer(
            data[off : off + width * nchan], dtype=np.uint8
        ).reshape(width, nchan)
        out[y] = line[:, [2, 1, 0]]  # BGR(A) -> RGB
    return out


def decode_image(data: bytes) -> np.ndarray:
    """Real decode: PIL when installed, else the pure-python PNG/BMP path.
    Raises ``ValueError`` on unrecognized or corrupt bytes."""
    if _PILImage is not None:  # pragma: no cover - PIL absent in container
        import io

        with _PILImage.open(io.BytesIO(data)) as im:
            arr = np.asarray(im.convert("RGB") if im.mode == "P" else im)
        return arr if arr.ndim == 3 else arr[:, :, None]
    fmt = sniff_format(bytes(data))
    if fmt == "png":
        return decode_png(bytes(data))
    if fmt == "bmp":
        return decode_bmp(bytes(data))
    raise ValueError("unrecognized image format (need PNG or BMP)")


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """HxWxC uint8 (C=1 gray / 2 gray+alpha / 3 RGB / 4 RGBA) -> PNG
    bytes.  ``filter_type`` applies one filter to every scanline (0 in
    production; 1-4 exist so tests can exercise every unfilter branch
    against a known image)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    height, width, channels = pixels.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    flat = pixels.astype(np.uint8).reshape(height, stride)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        cur = flat[y].astype(np.int32)
        if filter_type == 0:
            filt = cur
        else:
            left = np.concatenate(
                [np.zeros(channels, dtype=np.int32), cur[:-channels]]
            )
            ul = np.concatenate(
                [np.zeros(channels, dtype=np.int32), prev[:-channels]]
            )
            if filter_type == 1:
                filt = cur - left
            elif filter_type == 2:
                filt = cur - prev
            elif filter_type == 3:
                filt = cur - (left + prev) // 2
            elif filter_type == 4:
                pred = np.array(
                    [
                        _paeth(int(a), int(b), int(c))
                        for a, b, c in zip(left, prev, ul)
                    ],
                    dtype=np.int32,
                )
                filt = cur - pred
            else:
                raise ValueError(f"bad filter type {filter_type}")
        lines.append(filter_type)
        lines.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )


def encode_bmp(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit bottom-up BMP bytes (test fixture aid)."""
    height, width, _ = pixels.shape
    stride = (width * 3 + 3) & ~3
    body = bytearray()
    for y in range(height - 1, -1, -1):
        row = pixels[y][:, [2, 1, 0]].astype(np.uint8).tobytes()
        body.extend(row + b"\x00" * (stride - len(row)))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(body)


def nearest_resize(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample HxWxC -> height x width x C (the classic
    ``floor(i * src/dst)`` index map, PIL ``Image.NEAREST`` analog)."""
    src_h, src_w = pixels.shape[:2]
    rows = (np.arange(height) * src_h // height).clip(0, src_h - 1)
    cols = (np.arange(width) * src_w // width).clip(0, src_w - 1)
    return pixels[rows][:, cols]
