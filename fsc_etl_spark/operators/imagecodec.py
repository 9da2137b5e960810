"""Pure-Python uncompressed-image codec: PPM (P6) and BMP (24-bit).

The container ships no PIL/ffmpeg, but neither format needs one —
both are trivial headers over a raw RGB pixel buffer, so decode /
resize / re-encode can be genuinely byte-exact with just numpy. This
upgrades the multimodal resize path from a deterministic stand-in to
a real codec for the two formats, while anything unrecognized keeps
the documented fallback (operators/multimodal.py).

Formats:

- PPM ``P6`` (Netpbm binary): ASCII header ``P6 <w> <h> <maxval>``
  (whitespace/comment separated), then ``w*h*3`` raw RGB bytes.
  Only ``maxval <= 255`` (1 byte/sample) is supported.
- BMP ``BM``, BITMAPINFOHEADER, 24 bpp, BI_RGB (uncompressed): rows
  bottom-up, BGR byte order, each row padded to a 4-byte boundary.

Resize is nearest-neighbor with the exact index map
``src = (dst * src_dim) // dst_dim`` — integer-only, so the result is
reproducible anywhere (including in a SQL oracle) with no float
rounding to drift on.
"""

from __future__ import annotations

import numpy as np

PPM_MAGIC = b"P6"
BMP_MAGIC = b"BM"


def sniff(data: bytes) -> str | None:
    """'ppm' | 'bmp' | None from magic bytes."""
    if data[:2] == PPM_MAGIC and (len(data) > 2 and data[2:3].isspace()):
        return "ppm"
    if data[:2] == BMP_MAGIC and len(data) >= 54:
        return "bmp"
    return None


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def _ppm_header_tokens(data: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse ``n_tokens`` whitespace/comment-separated ASCII integers
    after the magic; returns (values, offset_of_pixel_data)."""
    i, vals = 2, []
    while len(vals) < n_tokens:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":  # comment to EOL
            while i < len(data) and data[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < len(data) and data[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("malformed PPM header")
        vals.append(int(data[i:j]))
        i = j
    # exactly one whitespace byte separates maxval from pixel data
    if i >= len(data) or not data[i : i + 1].isspace():
        raise ValueError("malformed PPM header terminator")
    return vals, i + 1


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 bytes -> HxWx3 uint8 RGB array."""
    if data[:2] != PPM_MAGIC:
        raise ValueError("not a P6 PPM")
    (w, h, maxval), off = _ppm_header_tokens(data, 3)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    buf = data[off : off + need]
    if len(buf) != need:
        raise ValueError(f"truncated PPM pixel data: {len(buf)} < {need}")
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB array -> canonical P6 bytes
    (header ``P6\\n<w> <h>\\n255\\n``)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("expected HxWx3")
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB)
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> HxWx3 uint8 RGB array."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP")
    pixel_off = int.from_bytes(data[10:14], "little")
    dib_size = int.from_bytes(data[14:18], "little")
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) & ~3
    need = stride * h
    buf = data[pixel_off : pixel_off + need]
    if len(buf) != need:
        raise ValueError(f"truncated BMP pixel data: {len(buf)} < {need}")
    rows = np.frombuffer(buf, dtype=np.uint8).reshape(h, stride)[:, : 3 * w]
    img_bgr = rows.reshape(h, w, 3)
    if not top_down:
        img_bgr = img_bgr[::-1]
    return img_bgr[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB array -> canonical 24-bit BI_RGB BMP bytes
    (bottom-up rows, 4-byte-aligned stride, 54-byte header)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("expected HxWx3")
    stride = (3 * w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = img[::-1, :, ::-1].reshape(h, 3 * w)  # RGB->BGR, bottom-up
    pix = rows.tobytes()
    header = (
        BMP_MAGIC
        + (54 + len(pix)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pix).to_bytes(4, "little")
        + (2835).to_bytes(4, "little")  # 72 dpi
        + (2835).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    return header + pix


# ---------------------------------------------------------------------------
# Resize + whole-image transform
# ---------------------------------------------------------------------------


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize with the integer index map
    ``src = (dst * src_dim) // dst_dim`` in both axes."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return img[np.ix_(ys, xs)]


def decode_any(data: bytes) -> np.ndarray | None:
    """Decode PPM/BMP to RGB; None when the format is unrecognized."""
    kind = sniff(bytes(data))
    if kind == "ppm":
        return decode_ppm(bytes(data))
    if kind == "bmp":
        return decode_bmp(bytes(data))
    return None


def resize_bytes(data: bytes, width: int, height: int) -> tuple[bytes, str] | None:
    """Real decode -> nearest resize -> re-encode in the SAME format.
    Returns (bytes, mime) or None when the input isn't PPM/BMP —
    including magic-byte false positives (e.g. text that happens to
    start with 'BM' or 'P6 '), which fail header validation and fall
    back rather than poison the batch."""
    try:
        img = decode_any(data)
    except ValueError:
        return None
    if img is None:
        return None
    out = resize_nearest(img, width, height)
    if bytes(data)[:2] == PPM_MAGIC:
        return encode_ppm(out), "image/x-portable-pixmap"
    return encode_bmp(out), "image/bmp"
