"""Image IO: PNG/JPG read+write, Radiance HDR read, tonemapping helpers.

TPU-native replacement for the DirectXTK12 WIC/DDS loaders used at
/root/reference/src/ProgressiveRaytracingPipeline.cpp:111-118 and
/root/reference/src/DenoiseCompositor.cpp:57-62. PIL handles LDR formats;
Radiance .hdr (RGBE) is decoded natively; DDS lives in utils/dds.py.
"""

from __future__ import annotations

import numpy as np


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    c = np.clip(c, 0.0, 1.0)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c: np.ndarray) -> np.ndarray:
    c = np.clip(c, 0.0, 1.0)
    return np.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1 / 2.4) - 0.055)


def read_image(path: str, linearize: bool = True) -> np.ndarray:
    """Read an image file to float32 [H, W, 3].

    LDR formats are converted from sRGB to linear when `linearize` (the WIC
    loader at ProgressiveRaytracingPipeline.cpp:114 also forces sRGB)."""
    if path.lower().endswith(".hdr"):
        return read_hdr(path)
    from PIL import Image

    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, np.float32) / 255.0
    return srgb_to_linear(arr).astype(np.float32) if linearize else arr


def write_png(path: str, image: np.ndarray, srgb_encode: bool = False) -> None:
    """Write [H, W, 3] float (0..1) to PNG."""
    from PIL import Image

    arr = np.asarray(image, np.float32)
    if srgb_encode:
        arr = linear_to_srgb(arr)
    arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr, "RGB").save(path)


def read_hdr(path: str) -> np.ndarray:
    """Native Radiance RGBE (.hdr) decoder, RLE and flat scanlines."""
    with open(path, "rb") as f:
        data = f.read()
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"not a Radiance HDR file: {path}")
    pos = data.index(b"\n\n") + 2
    dim_end = data.index(b"\n", pos)
    dims = data[pos:dim_end].split()
    if dims[0] != b"-Y" or dims[2] != b"+X":
        raise ValueError(f"unsupported HDR orientation {dims!r}")
    height, width = int(dims[1]), int(dims[3])
    pos = dim_end + 1

    rgbe = np.zeros((height, width, 4), np.uint8)
    buf = data
    for y in range(height):
        if (
            width >= 8
            and width < 32768
            and buf[pos] == 2
            and buf[pos + 1] == 2
            and (buf[pos + 2] << 8 | buf[pos + 3]) == width
        ):
            pos += 4
            for c in range(4):
                x = 0
                while x < width:
                    n = buf[pos]
                    pos += 1
                    if n > 128:  # run
                        rgbe[y, x : x + n - 128, c] = buf[pos]
                        pos += 1
                        x += n - 128
                    else:  # literal
                        rgbe[y, x : x + n, c] = np.frombuffer(
                            buf, np.uint8, n, pos
                        )
                        pos += n
                        x += n
        else:  # flat scanline
            row = np.frombuffer(buf, np.uint8, width * 4, pos).reshape(width, 4)
            rgbe[y] = row
            pos += width * 4

    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp > 0, np.ldexp(1.0, exp - 136), 0.0).astype(np.float32)
    return (rgbe[..., :3].astype(np.float32) + 0.5) * scale[..., None] * np.where(
        exp[..., None] > 0, 1.0, 0.0
    )


def mse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    m = mse(a, b)
    return float("inf") if m == 0 else 10.0 * np.log10(peak * peak / m)
