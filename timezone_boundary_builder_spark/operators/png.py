"""Pure-Python PNG codec (stdlib zlib + numpy) for the multimodal pixel
operators — the same no-external-deps pattern as the ESRI shapefile
writer (operators/shapefile.py): the container ships no PIL/libvips, so
the decode step that used to be a clearly-marked stub is implemented
directly from the public PNG specification (W3C PNG, RFC 2083).

Supported: non-interlaced PNGs, bit depth 8 for color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA), and bit depths 1/2/4/8 for types 0
and 3 (palette). All five scanline filters (None/Sub/Up/Average/Paeth)
are implemented; Sub and Up de-filter vectorized (Sub is a per-lane
prefix sum mod 256, Up a row add), Average/Paeth fall back to the
per-pixel recurrence the spec defines. Adam7 interlace and 16-bit
samples raise ValueError — the encoder never emits them, and crawl
thumbnails practically never carry them.

The encoder writes filter-0 scanlines with a fixed zlib level, so
output bytes are deterministic — content-addressed artifact rules
(SURVEY.md §7 #5) hold for re-encoded images too.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _defilter(raw: bytes, width: int, height: int, channels: int, bit_depth: int) -> np.ndarray:
    """Filtered scanline stream -> (height, stride) recon byte matrix."""
    bits_per_px = bit_depth * channels
    stride = (width * bits_per_px + 7) // 8
    bpp = max(1, bits_per_px // 8)  # filter unit, per the spec
    if len(raw) < (stride + 1) * height:
        raise ValueError("PNG: truncated image data")
    mat = np.frombuffer(raw, np.uint8, (stride + 1) * height).reshape(
        height, stride + 1
    )
    if not mat[:, 0].any():
        # all-filter-0 fast path (what encode_png always emits): recon ==
        # filtered bytes, no per-row loop — one slice instead of `height`
        # python iterations (round 7; the general path below is unchanged)
        return np.ascontiguousarray(mat[:, 1:])
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp] -> lane prefix sum mod 256
            for lane in range(bpp):
                seg = line[lane::bpp]
                seg[:] = np.cumsum(seg, dtype=np.uint64) & 0xFF
        elif ftype == 2:  # Up (uint8 add wraps mod 256)
            line += prior
        elif ftype == 3:  # Average — sequential in x
            ln = line.tolist()
            pr = prior.tolist()
            for x in range(stride):
                a = ln[x - bpp] if x >= bpp else 0
                ln[x] = (ln[x] + ((a + pr[x]) >> 1)) & 0xFF
            line = np.asarray(ln, dtype=np.uint8)
        elif ftype == 4:  # Paeth — sequential in x
            ln = line.tolist()
            pr = prior.tolist()
            for x in range(stride):
                a = ln[x - bpp] if x >= bpp else 0
                b = pr[x]
                c = pr[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                ln[x] = (ln[x] + pred) & 0xFF
            line = np.asarray(ln, dtype=np.uint8)
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = line
        prior = line
    return out


def _unpack_subbyte(rows: np.ndarray, width: int, bit_depth: int) -> np.ndarray:
    """(h, stride) packed 1/2/4-bit rows -> (h, width) sample values."""
    h = rows.shape[0]
    bits = np.unpackbits(rows, axis=1)
    per = 8 // bit_depth
    # group consecutive bit_depth bits back into sample values, MSB first
    vals = bits.reshape(h, -1, bit_depth)
    weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint8)
    samples = (vals * weights).sum(axis=2).astype(np.uint8)
    return samples[:, :width]


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 numpy array: (h, w) for grayscale, (h, w, c)
    otherwise (palette expands to RGB)."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIG)
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack_from(">I", data, pos), data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError("PNG: truncated chunk")
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("PNG: bad IHDR length")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if length == 0 or length % 3:
                raise ValueError("PNG: bad PLTE length")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    width, height, bit_depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("PNG: Adam7 interlace unsupported")
    if color not in _CHANNELS:
        raise ValueError(f"PNG: unknown color type {color}")
    if bit_depth == 16 or (bit_depth != 8 and color in (2, 4, 6)):
        raise ValueError(f"PNG: bit depth {bit_depth} unsupported for color type {color}")
    if width == 0 or height == 0:
        raise ValueError("PNG: zero-dimension image")
    if width * height > 64_000_000:  # crawl payloads are untrusted
        raise ValueError("PNG: image too large")
    channels = _CHANNELS[color]
    # bounded decompression: a crafted IDAT must not expand past the
    # size the header implies (decompression-bomb guard — PIL's
    # MAX_IMAGE_PIXELS analog for this codec)
    bits_per_px = bit_depth * channels
    expected = ((width * bits_per_px + 7) // 8 + 1) * height
    raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    if len(raw) > expected:
        raise ValueError("PNG: image data exceeds header-implied size")
    rows = _defilter(raw, width, height, channels, bit_depth)
    if bit_depth == 8:
        samples = rows[:, : width * channels].reshape(height, width, channels)
    else:
        samples = _unpack_subbyte(rows, width, bit_depth)[..., None]
    if color == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        idx = samples[..., 0]
        if idx.size and int(idx.max()) >= len(palette):
            raise ValueError("PNG: palette index out of range")
        return palette[idx]
    if color == 0:
        gray = samples[..., 0]
        if bit_depth < 8:  # scale 1/2/4-bit gray to full 0..255 range
            gray = (gray.astype(np.uint16) * 255 // ((1 << bit_depth) - 1)).astype(np.uint8)
        return gray
    return samples


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array -> PNG bytes. (h, w) -> grayscale; (h, w, 2) ->
    gray+alpha; (h, w, 3) -> RGB; (h, w, 4) -> RGBA. Filter 0 scanlines,
    fixed zlib level -> byte-deterministic output."""
    arr = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, channels = arr.shape
    if h == 0 or w == 0:
        raise ValueError("cannot encode zero-dimension image")
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # filter byte 0 in front of every scanline
    scan = np.zeros((h, 1 + w * channels), dtype=np.uint8)
    scan[:, 1:] = arr.reshape(h, w * channels)
    idat = zlib.compress(scan.tobytes(), 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pixel-center sampling) — pure numpy
    fancy-indexing, works for any channel count."""
    h, w = arr.shape[:2]
    xi = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    yi = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    return arr[yi][:, xi]
