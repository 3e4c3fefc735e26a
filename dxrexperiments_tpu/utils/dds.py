"""Native DDS reader for uncompressed formats (incl. cubemaps).

Replacement for DDSTextureLoader usage at
/root/reference/src/ProgressiveRaytracingPipeline.cpp:115 (the reference's
radiance cubemap is DX10 DXGI_FORMAT_R16G16B16A16_FLOAT). Block-compressed
(BCn) formats are out of scope and raise.
"""

from __future__ import annotations

import struct

import numpy as np

DDPF_FOURCC = 0x4
DDSCAPS2_CUBEMAP = 0x200

# DXGI formats we decode
_DXGI_DECODE = {
    2: ("<f4", 4, 3),  # R32G32B32A32? no: 2 = R32G32B32A32_FLOAT (4ch)
}


def read_dds(path: str) -> dict:
    """Parse a DDS file. Returns {"faces": [n_faces, H, W, 3] float32,
    "is_cubemap": bool, "mips": int} (mip 0 only)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"DDS ":
        raise ValueError(f"not a DDS file: {path}")
    hdr = struct.unpack("<31I", data[4:128])
    height, width = hdr[2], hdr[3]
    mip_count = max(hdr[6], 1)
    pf_flags = hdr[19]
    fourcc = data[84:88]
    caps2 = hdr[27]
    offset = 128

    dxgi = None
    array_size = 1
    misc = 0
    if (pf_flags & DDPF_FOURCC) and fourcc == b"DX10":
        dxgi, _dim, misc, array_size, _misc2 = struct.unpack("<5I", data[128:148])
        offset = 148

    is_cube = bool(caps2 & DDSCAPS2_CUBEMAP) or bool(misc & 0x4)
    n_faces = 6 if is_cube else max(array_size, 1)

    if dxgi in (10,):  # R16G16B16A16_FLOAT
        dtype, channels = np.dtype("<f2"), 4
    elif dxgi in (2,):  # R32G32B32A32_FLOAT
        dtype, channels = np.dtype("<f4"), 4
    elif dxgi in (28, 29):  # R8G8B8A8_UNORM(_SRGB)
        dtype, channels = np.dtype("<u1"), 4
    elif dxgi is None and not (pf_flags & DDPF_FOURCC):
        # legacy uncompressed RGB(A)
        bits = hdr[21]
        if bits == 32:
            dtype, channels = np.dtype("<u1"), 4
        elif bits == 24:
            dtype, channels = np.dtype("<u1"), 3
        else:
            raise ValueError(f"unsupported legacy DDS bit count {bits}")
    elif dxgi is None and fourcc == b"\x74\x00\x00\x00":
        dtype, channels = np.dtype("<f4"), 4
    else:
        raise ValueError(
            f"unsupported DDS format fourcc={fourcc!r} dxgi={dxgi} "
            "(block-compressed formats not supported)"
        )

    pix = dtype.itemsize
    faces = np.zeros((n_faces, height, width, 3), np.float32)
    for face in range(n_faces):
        # mip 0 of this face
        face_bytes = width * height * channels * pix
        arr = np.frombuffer(data, dtype, width * height * channels, offset)
        arr = arr.reshape(height, width, channels)[..., :3].astype(np.float32)
        if dtype == np.dtype("<u1"):
            arr = arr / 255.0
        faces[face] = arr
        # skip the whole mip chain of this face
        off = face_bytes
        w, h = width, height
        for _ in range(1, mip_count):
            w, h = max(w // 2, 1), max(h // 2, 1)
            off += w * h * channels * pix
        offset += off

    return {"faces": faces, "is_cubemap": is_cube, "mips": mip_count}


def load_cubemap(path: str) -> np.ndarray:
    """[6, S, S, 3] float faces in D3D order (+X -X +Y -Y +Z -Z)."""
    dds = read_dds(path)
    if not dds["is_cubemap"] or dds["faces"].shape[0] != 6:
        raise ValueError(f"{path} is not a 6-face cubemap")
    return dds["faces"]
