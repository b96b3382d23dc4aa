"""Per-game texture atlases (host-built constants shipped to device).

The reference resolves (type, theme) -> QImage through asset_for_type +
a lazy cache (bag.cpp:79-123).  Here each game declares its asset map once;
we decode every sprite into a fixed-slot padded atlas and build dense lookup
tables, so the renderer is pure gathers.
"""

from __future__ import annotations

import numpy as np

from procgen_tpu import objects as O
from procgen_tpu.render import assets

GRID_TYPE_LUT_SIZE = 1104  # covers all grid object ids incl. chaser's 1002


class RenderPack:
    """Static render data for one (game, config) pair.  numpy on host; the
    renderer closes over jnp copies (XLA keeps one device copy)."""

    def __init__(self, gd, cfg):
        amap = gd.asset_map(cfg)
        names: list[str] = []
        slot_lut = np.full((O.MAX_ASSETS, O.MAX_IMAGE_THEMES), -1, np.int32)
        num_themes = np.zeros((O.MAX_ASSETS,), np.int32)
        for type_, theme_names in amap.items():
            assert 0 <= type_ < O.MAX_ASSETS, type_
            num_themes[type_] = len(theme_names)
            for theme, name in enumerate(theme_names):
                # restrict_themes maps non-preserved types to theme 0
                # (bag.cpp:450-453); handled by masking at lookup time.
                slot_lut[type_, theme] = len(names)
                names.append(name)

        imgs = [assets.decode_png(n) for n in names]
        if imgs:
            S_h = max(i.shape[0] for i in imgs)
            S_w = max(i.shape[1] for i in imgs)
        else:
            S_h = S_w = 1
        atlas = np.zeros((max(len(imgs), 1), S_h, S_w, 4), np.uint8)
        dims = np.ones((max(len(imgs), 1), 2), np.int32)
        for k, img in enumerate(imgs):
            h, w = img.shape[:2]
            atlas[k, :h, :w] = img
            dims[k] = (w, h)

        self.atlas = atlas
        self.dims = dims  # (slot, [w, h])
        self.slot_lut = slot_lut
        self.num_themes = num_themes

        bg_names = assets.BACKGROUND_GROUPS[gd.background_group]
        bgs = [assets.decode_png(n) for n in bg_names]
        BH = max(b.shape[0] for b in bgs)
        BW = max(b.shape[1] for b in bgs)
        bg_atlas = np.zeros((len(bgs), BH, BW, 3), np.uint8)
        bg_dims = np.ones((len(bgs), 2), np.int32)
        for k, b in enumerate(bgs):
            h, w = b.shape[:2]
            # backgrounds load as Format_RGB32: alpha dropped (resources.cpp)
            bg_atlas[k, :h, :w] = b[..., :3]
            bg_dims[k] = (w, h)
        self.bg_atlas = bg_atlas
        self.bg_dims = bg_dims

        # ---- mip atlases for the fast (matmul) sampling paths ----
        # Sprites render at <= ~16 px on a 64 px frame, so a fixed-res mip
        # loses nothing visually and keeps the one-hot matmuls tiny.
        R = getattr(gd, "sprite_sample_res", 32)
        self.sprite_res = R
        self.sprite_mips = np.zeros((max(len(imgs), 1), R, R, 4), np.uint8)
        for k, img in enumerate(imgs):
            self.sprite_mips[k] = _nearest_resize(img, R, R)

        BR = getattr(gd, "bg_sample_res", 128)
        self.bg_res = BR
        self.bg_mips = np.zeros((len(bgs), BR, BR, 3), np.uint8)
        for k, b in enumerate(bgs):
            self.bg_mips[k] = _nearest_resize(b[..., :3], BR, BR)

        # grid-type render tables
        self.grid_image_lut = gd.grid_image_lut(cfg)  # (GRID_TYPE_LUT_SIZE,)
        self.grid_theme_lut = gd.grid_theme_lut(cfg)

        # composite per-cell-type lut for the fast grid pass: 0 = draw
        # nothing, k >= 1 = sprite slot k-1.  Row d holds the lut with the
        # per-env dynamic theme d applied to gd.grid_themed_types (one row
        # for games without dynamic grid themes).
        themed = set(gd.grid_themed_types())
        n_themes = max(gd.grid_theme_count, 1)
        gsl = np.zeros((n_themes, GRID_TYPE_LUT_SIZE), np.int32)
        for d in range(n_themes):
            for t in range(GRID_TYPE_LUT_SIZE):
                img = int(self.grid_image_lut[t])
                theme = d if t in themed else int(self.grid_theme_lut[t])
                if t == O.SPACE or img < 0 or img >= O.MAX_ASSETS:
                    continue
                s = int(slot_lut[img, min(theme, O.MAX_IMAGE_THEMES - 1)])
                if s >= 0:
                    gsl[d, t] = s + 1
        self.grid_slot_lut_themed = gsl
        self.grid_slot_lut = gsl[0]
        mask = np.zeros((GRID_TYPE_LUT_SIZE,), bool)
        for t in themed:
            mask[t] = True
        self.grid_themed_mask = mask


def _nearest_resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    ys = np.floor((np.arange(h) + 0.5) * img.shape[0] / h).astype(np.int64)
    xs = np.floor((np.arange(w) + 0.5) * img.shape[1] / w).astype(np.int64)
    return img[ys[:, None], xs[None, :]]


def default_grid_image_lut() -> np.ndarray:
    """image_for_type default: abs(type) (bag.cpp:438-440)."""
    t = np.arange(GRID_TYPE_LUT_SIZE, dtype=np.int32)
    return np.abs(t)


def default_grid_theme_lut() -> np.ndarray:
    return np.zeros((GRID_TYPE_LUT_SIZE,), np.int32)
