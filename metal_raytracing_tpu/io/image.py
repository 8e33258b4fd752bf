"""Image output: tonemap + PNG/NPY writers, Radiance HDR reader.

Replaces the reference's raster present path — fullscreen-quad blit with a
Reinhard tonemap fragment shader (reference: MetalRaytracing/Shaders.metal:39-52)
and the rgba16Float drawable (reference: Renderer.swift:53) — with headless
file output.  The accumulation buffer is linear float32, exactly like the
reference's rgba32Float accumulation textures (reference: Renderer.swift:233-244).
"""

from __future__ import annotations

import numpy as np


def tonemap_reinhard(color: np.ndarray) -> np.ndarray:
    """``color / (1 + color)`` (reference: Shaders.metal:49)."""
    color = np.asarray(color)
    return color / (1.0 + color)


def to_srgb8(linear: np.ndarray, tonemap: bool = True,
             flip_vertical: bool = True) -> np.ndarray:
    """Linear HDR (H, W, 3) -> displayable uint8.

    The reference's render texture has row 0 at the top but is blitted with a
    vertical flip at present time (NDC (-1,-1) maps to texture (0,0));
    ``flip_vertical=True`` reproduces the on-screen orientation.
    """
    img = np.asarray(linear, np.float32)
    if tonemap:
        img = tonemap_reinhard(img)
    if flip_vertical:
        img = img[::-1]
    img = np.clip(img, 0.0, 1.0)
    return (img * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, linear: np.ndarray, tonemap: bool = True,
              flip_vertical: bool = True) -> None:
    from PIL import Image

    Image.fromarray(to_srgb8(linear, tonemap, flip_vertical)).save(path)


def write_npy(path: str, linear: np.ndarray) -> None:
    np.save(path, np.asarray(linear, np.float32))


def read_hdr(path: str) -> np.ndarray:
    """Read a Radiance RGBE (.hdr) file into linear float32 (H, W, 3).

    Needed for the HDR-environment-lighting config (BASELINE.json configs[2],
    vulture_hide_4k.hdr).  Pure-Python RLE decoder — no external deps.
    """
    with open(path, "rb") as f:
        if not f.readline().startswith(b"#?"):
            raise ValueError("not a Radiance HDR file")
        while True:
            line = f.readline()
            if line in (b"\n", b"\r\n", b""):
                break
        dims = f.readline().split()
        if len(dims) != 4 or dims[0] != b"-Y" or dims[2] != b"+X":
            raise ValueError(f"unsupported HDR orientation: {dims}")
        height, width = int(dims[1]), int(dims[3])
        data = np.frombuffer(f.read(), np.uint8)

    rgbe = np.zeros((height, width, 4), np.uint8)
    pos = 0
    for y in range(height):
        if (pos + 4 <= len(data) and data[pos] == 2 and data[pos + 1] == 2
                and (int(data[pos + 2]) << 8 | int(data[pos + 3])) == width):
            pos += 4
            for c in range(4):
                x = 0
                while x < width:
                    count = int(data[pos]); pos += 1
                    if count > 128:  # run
                        rgbe[y, x:x + count - 128, c] = data[pos]
                        pos += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x:x + count, c] = data[pos:pos + count]
                        pos += count
                        x += count
        else:  # flat (non-RLE) scanline
            row = data[pos:pos + width * 4].reshape(width, 4)
            rgbe[y] = row
            pos += width * 4

    exp = rgbe[:, :, 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0, np.ldexp(1.0, exp - 136)).astype(np.float32)
    return rgbe[:, :, :3].astype(np.float32) * scale[:, :, None]


def write_hdr(path: str, linear: np.ndarray) -> None:
    """Write linear float32 (H, W, 3) as a flat (non-RLE) Radiance HDR file."""
    img = np.asarray(linear, np.float32)
    h, w, _ = img.shape
    maxc = img.max(axis=2)
    exp = np.zeros((h, w), np.int32)
    nz = maxc > 1e-32
    mantissa, exponent = np.frexp(np.where(nz, maxc, 1.0))
    scale = np.where(nz, mantissa * 256.0 / np.where(nz, maxc, 1.0), 0.0)
    exp = np.where(nz, exponent + 128, 0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[:, :, :3] = np.clip(img * scale[:, :, None], 0, 255).astype(np.uint8)
    rgbe[:, :, 3] = exp.astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    """Root-mean-square error between two images — the parity metric from
    BASELINE.json ("pixel-matching a CPU reference renderer to <1e-3 RMSE")."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))
