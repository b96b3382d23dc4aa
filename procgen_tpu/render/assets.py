"""Asset pipeline: PNG decode -> packed texture atlases (host side, offline).

The reference decodes ~770 PNGs into a QImage cache once per process
(resources.cpp:13-30).  Here assets are decoded once on host (pure-Python PNG
reader; no Qt/PIL dependency), packed into per-game uint8 atlases and shipped
to device HBM as constants.  The asset root defaults to the reference's
``procgen/data/assets`` tree and can be overridden with
``PROCGEN_TPU_ASSET_ROOT``.
"""

from __future__ import annotations

import ctypes
import functools
import os
import struct
import subprocess
import zlib
from pathlib import Path

import numpy as np

_DEFAULT_ROOTS = (
    "/root/reference/procgen/data/assets",
)

# Background groups in load order (resources.cpp:826-954); the per-level
# background_index = randn(len(group)) indexes these lists, so order is part
# of the determinism contract.  Space backgrounds are appended to platform
# (resources.cpp:949-952).
_SPACE_BACKGROUNDS = [
    "space_backgrounds/deep_space_01.png",
    "space_backgrounds/spacegen_01.png",
    "space_backgrounds/milky_way_01.png",
    "space_backgrounds/ez_space_lite_01.png",
    "space_backgrounds/meyespace_v1_01.png",
    "space_backgrounds/eye_nebula_01.png",
    "space_backgrounds/deep_sky_01.png",
    "space_backgrounds/space_nebula_01.png",
    "space_backgrounds/Background-1.png",
    "space_backgrounds/Background-2.png",
    "space_backgrounds/Background-3.png",
    "space_backgrounds/Background-4.png",
    "space_backgrounds/parallax-space-backgound.png",
]

_PLATFORM_BACKGROUNDS = [
    "platform_backgrounds/alien_bg.png",
    "platform_backgrounds/another_world_bg.png",
    "platform_backgrounds/back_cave.png",
    "platform_backgrounds/caverns.png",
    "platform_backgrounds/cyberpunk_bg.png",
    "platform_backgrounds/parallax_forest.png",
    "platform_backgrounds/scifi_bg.png",
    "platform_backgrounds/scifi2_bg.png",
    "platform_backgrounds/living_tissue_bg.png",
    "platform_backgrounds/airadventurelevel1.png",
    "platform_backgrounds/airadventurelevel2.png",
    "platform_backgrounds/airadventurelevel3.png",
    "platform_backgrounds/airadventurelevel4.png",
    "platform_backgrounds/cave_background.png",
    "platform_backgrounds/blue_desert.png",
    "platform_backgrounds/blue_grass.png",
    "platform_backgrounds/blue_land.png",
    "platform_backgrounds/blue_shroom.png",
    "platform_backgrounds/colored_desert.png",
    "platform_backgrounds/colored_grass.png",
    "platform_backgrounds/colored_land.png",
    "platform_backgrounds/colored_shroom.png",
    "platform_backgrounds/landscape1.png",
    "platform_backgrounds/landscape2.png",
    "platform_backgrounds/landscape3.png",
    "platform_backgrounds/landscape4.png",
    "platform_backgrounds/battleback1.png",
    "platform_backgrounds/battleback2.png",
    "platform_backgrounds/battleback3.png",
    "platform_backgrounds/battleback4.png",
    "platform_backgrounds/battleback5.png",
    "platform_backgrounds/battleback6.png",
    "platform_backgrounds/battleback7.png",
    "platform_backgrounds/battleback8.png",
    "platform_backgrounds/battleback9.png",
    "platform_backgrounds/battleback10.png",
    "platform_backgrounds/sunrise.png",
    "platform_backgrounds_2/beach1.png",
    "platform_backgrounds_2/beach2.png",
    "platform_backgrounds_2/beach3.png",
    "platform_backgrounds_2/beach4.png",
    "platform_backgrounds_2/fantasy1.png",
    "platform_backgrounds_2/fantasy2.png",
    "platform_backgrounds_2/fantasy3.png",
    "platform_backgrounds_2/fantasy4.png",
    "platform_backgrounds_2/candy1.png",
    "platform_backgrounds_2/candy2.png",
    "platform_backgrounds_2/candy3.png",
    "platform_backgrounds_2/candy4.png",
] + _SPACE_BACKGROUNDS

BACKGROUND_GROUPS = {
    "space_backgrounds": _SPACE_BACKGROUNDS,
    "platform_backgrounds": _PLATFORM_BACKGROUNDS,
    "topdown_backgrounds": [
        "topdown_backgrounds/floortiles.png",
        "topdown_backgrounds/backgrounddetailed1.png",
        "topdown_backgrounds/backgrounddetailed2.png",
        "topdown_backgrounds/backgrounddetailed3.png",
        "topdown_backgrounds/backgrounddetailed4.png",
        "topdown_backgrounds/backgrounddetailed5.png",
        "topdown_backgrounds/backgrounddetailed6.png",
        "topdown_backgrounds/backgrounddetailed7.png",
        "topdown_backgrounds/backgrounddetailed8.png",
    ],
    "topdown_simple_backgrounds": ["topdown_backgrounds/floortiles.png"],
    "water_backgrounds": [
        "water_backgrounds/water1.png",
        "water_backgrounds/water2.png",
        "water_backgrounds/water3.png",
        "water_backgrounds/water4.png",
        "water_backgrounds/underwater1.png",
        "water_backgrounds/underwater2.png",
        "water_backgrounds/underwater3.png",
    ],
    "water_surface_backgrounds": [
        "water_backgrounds/water1.png",
        "water_backgrounds/water2.png",
        "water_backgrounds/water3.png",
        "water_backgrounds/water4.png",
    ],
}

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"


@functools.lru_cache(maxsize=1)
def _native_unfilter():
    """Compile (once) and load the C++ scanline unfilter; None on failure."""
    src = _NATIVE_DIR / "png_unfilter.cpp"
    so = _NATIVE_DIR / "build" / "libpng_unfilter.so"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            so.parent.mkdir(exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", str(so), str(src)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
        lib.png_unfilter.restype = ctypes.c_int
        lib.png_unfilter.argtypes = [
            ctypes.c_char_p,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        return lib
    except Exception:
        return None


def asset_root() -> Path:
    env = os.environ.get("PROCGEN_TPU_ASSET_ROOT")
    if env:
        return Path(env)
    for cand in _DEFAULT_ROOTS:
        if Path(cand).is_dir():
            return Path(cand)
    raise FileNotFoundError(
        "no asset root found; set PROCGEN_TPU_ASSET_ROOT to a procgen "
        "data/assets directory"
    )


@functools.lru_cache(maxsize=4096)
def png_size(name: str) -> tuple[int, int]:
    """(width, height) from the IHDR without decoding."""
    with open(asset_root() / name, "rb") as f:
        f.read(16)
        w, h = struct.unpack(">II", f.read(8))
    return int(w), int(h)


def aspect_ratio(name: str) -> float:
    w, h = png_size(name)
    return w * 1.0 / h


def _paeth(a, b, c):
    p = a.astype(np.int32) + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


@functools.lru_cache(maxsize=2048)
def decode_png(name: str) -> np.ndarray:
    """Decode a PNG to (H, W, 4) uint8 RGBA.  Supports bit-depth 8 color
    types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA)."""
    data = (asset_root() / name).read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", name
    pos = 8
    idat = []
    palette = None
    trns = None
    w = h = bit_depth = color_type = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", chunk[:10])
            interlace = chunk[12]
            assert bit_depth in (1, 2, 4, 8), (name, bit_depth)
            assert interlace == 0, name
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(chunk, np.uint8)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    stride = (w * channels * bit_depth + 7) // 8
    bpp = max(1, channels * bit_depth // 8)
    lib = _native_unfilter()
    if lib is not None:
        out = np.zeros((h, stride), np.uint8)
        rc = lib.png_unfilter(
            raw, out.ctypes.data_as(ctypes.c_void_p), h, stride, bpp
        )
        if rc != 0:
            raise ValueError(f"bad filter byte in {name}")
    else:
        rawa = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
        filters = rawa[:, 0]
        lines = rawa[:, 1:]
        out = np.zeros((h, stride), np.uint8)
        for y in range(h):
            f = filters[y]
            line = lines[y].copy()
            prior = out[y - 1] if y > 0 else np.zeros(stride, np.uint8)
            if f == 0:
                out[y] = line
            elif f == 1:
                acc = line.reshape(-1, bpp).astype(np.int64)
                out[y] = (np.cumsum(acc, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
            elif f == 2:
                out[y] = (line.astype(np.int32) + prior) & 0xFF
            elif f == 3:
                for x in range(stride):
                    left = int(out[y, x - bpp]) if x >= bpp else 0
                    out[y, x] = (int(line[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
            elif f == 4:
                for x in range(stride):
                    left = np.uint8(out[y, x - bpp]) if x >= bpp else np.uint8(0)
                    up = prior[x]
                    ul = (
                        np.uint8(out[y - 1, x - bpp])
                        if (x >= bpp and y > 0)
                        else np.uint8(0)
                    )
                    out[y, x] = (int(line[x]) + int(_paeth(left, up, ul))) & 0xFF
            else:
                raise ValueError(f"bad filter {f} in {name}")
    if bit_depth < 8:
        # sub-byte depths occur only for gray/palette (channels == 1)
        bits = np.unpackbits(out, axis=1)[:, : w * bit_depth]
        vals = bits.reshape(h, w, bit_depth)
        weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint16)
        idx = (vals * weights).sum(axis=2)
        if color_type == 0:
            idx = (idx * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)
        out = idx.astype(np.uint8).reshape(h, w)
        img = out.reshape(h, w, channels)
    else:
        img = out.reshape(h, w, channels)
    if color_type == 0:
        rgba = np.dstack([img[..., 0]] * 3 + [np.full((h, w), 255, np.uint8)])
    elif color_type == 2:
        rgba = np.dstack([img, np.full((h, w, 1), 255, np.uint8)])
    elif color_type == 3:
        idx = img[..., 0]
        rgb = palette[idx]
        if trns is not None:
            alpha_lut = np.full(palette.shape[0], 255, np.uint8)
            alpha_lut[: len(trns)] = trns
            a = alpha_lut[idx]
        else:
            a = np.full((h, w), 255, np.uint8)
        rgba = np.dstack([rgb, a])
    elif color_type == 4:
        rgba = np.dstack([img[..., 0]] * 3 + [img[..., 1]])
    else:
        rgba = img
    return np.ascontiguousarray(rgba)
