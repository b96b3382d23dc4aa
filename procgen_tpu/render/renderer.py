"""Renderer: (64, 64, 3) uint8 observations, designed for TPU.

Two-tier design (the key deviation from the reference's per-frame QPainter
raster, game.cpp:77-91):

1. ``render_static_env`` -- background + grid tiles, rendered once per
   *level* (at levelgen/queue-pregen time) and cached in
   ``EnvState.static_layer``.  This is the gather-heavy pass; amortized over
   the episode it is nearly free.
2. ``render_frame`` -- per step: entities composited over the cached layer
   using one-hot selection matmuls (MXU work, no per-pixel gathers; for an
   axis-aligned sprite, nearest sampling is separable, so
   ``OHy @ tex @ OHx`` picks exactly the same texels a gather would --
   bit-identical, since each output pixel receives exactly one product).

``render_env`` is the direct single-pass path (static + entities in one go),
used for parity/golden tests and for center-agent games whose view moves
every frame (their static cache would be invalid; a world-space cache is the
planned optimization).

Draw-order semantics follow bag.cpp:819-1012: background, grid cells
(x-major, RENDER_EPS overlap resolved toward the later-drawn cell), entities
by render_z in {-1, 0, 1} passes in slot order, velocity-info HUD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu import fmath as fm
from procgen_tpu import objects as O
from procgen_tpu.engine import entity_ops as eo
from procgen_tpu.state import F32, I32, EnvState

RES = 64
RENDER_EPS = F32(0.02)  # bag.cpp:14


def update_view_params(gd, cfg, state: EnvState) -> EnvState:
    """prepare_for_drawing (bag.cpp:819-838) at rect_height = 64.

    Called from the step path so the serialized view fields stay current even
    when frames are skipped."""
    mw = state.main_width.astype(F32)
    mh = state.main_height.astype(F32)
    if gd.center_agent(cfg):
        cx, cy, visibility = gd.choose_center(cfg, state)
    else:
        cx = mw * F32(0.5)
        cy = mh * F32(0.5)
        visibility = jnp.maximum(jnp.maximum(mw, mh), state.min_visibility)
    # raw_unit = 64 / visibility is a FLOAT division (bag.cpp:831); XLA's
    # reciprocal-based f32 div is 1 ulp off IEEE, so parity divides in f64.
    raw_unit = fm.fdiv(cfg, F32(64.0), visibility)
    unit = raw_unit  # rect_height == 64
    # view_dim = 64.0 / raw_unit is a DOUBLE division narrowed on assignment
    # (the 64.0 literal, bag.cpp:834)
    view_dim = fm.fdiv(cfg, F32(64.0), raw_unit)
    x_off = unit * (cx - view_dim / 2)
    y_off = unit * (cy - view_dim / 2)
    return state.replace(
        center_x=cx, center_y=cy, visibility=visibility,
        unit=unit, view_dim=view_dim, x_off=x_off, y_off=y_off,
    )


def _pixel_world_coords(state, res: int = RES):
    # centers expressed in 64-pixel units regardless of res, so all screen
    # math (view transform, HUD rects) is resolution-independent
    scale = F32(RES / res)
    sx = (jnp.arange(res, dtype=F32) + 0.5) * scale  # column centers
    sy = (jnp.arange(res, dtype=F32) + 0.5) * scale  # row centers
    SX = sx[None, :]
    SY = sy[:, None]
    wx = (SX + state.x_off) / state.unit
    wy = state.view_dim - (SY - state.y_off) / state.unit
    return SX, SY, wx, wy


def _sample_atlas(atlas, dims, slot, u, v, reflected):
    """Nearest gather from atlas[slot] at normalized (u, v); u flips when
    reflected (mirrored asset, bag.cpp:121-122)."""
    w = dims[slot, 0]
    h = dims[slot, 1]
    su = jnp.clip((u * w.astype(F32)).astype(I32), 0, w - 1)
    sv = jnp.clip((v * h.astype(F32)).astype(I32), 0, h - 1)
    su = jnp.where(reflected, w - 1 - su, su)
    texel = atlas[slot, sv, su]
    rgb = texel[..., :3].astype(F32)
    a = texel[..., 3].astype(F32) / 255.0
    return rgb, a


def render_static_env(gd, cfg, state: EnvState, pack, parts=("bg", "grid"), res: int = RES) -> jax.Array:
    """Background + grid layer for the current level -> (64, 64, 3) uint8.

    Gather-based; runs once per level (levelgen-time), not per step.
    ``parts`` selects the passes (grid-dynamic games cache bg only)."""
    atlas = jnp.asarray(pack.atlas)
    dims = jnp.asarray(pack.dims)
    slot_lut = jnp.asarray(pack.slot_lut)
    bg_atlas = jnp.asarray(pack.bg_atlas)
    bg_dims = jnp.asarray(pack.bg_dims)
    grid_image_lut = jnp.asarray(pack.grid_image_lut)
    grid_theme_lut = jnp.asarray(pack.grid_theme_lut)

    SX, SY, wx, wy = _pixel_world_coords(state, res)
    mw = state.main_width.astype(F32)
    mh = state.main_height.astype(F32)
    unit, view_dim = state.unit, state.view_dim
    x_off, y_off = state.x_off, state.y_off

    out = jnp.zeros((res, res, 3), F32)  # black fill (bag.cpp:980)

    # ---- background (bag.cpp:979-1007) ----
    if cfg.use_backgrounds and "bg" in parts:
        bgi = state.background_index
        bgw = bg_dims[bgi, 0].astype(F32)
        bgh = bg_dims[bgi, 1].astype(F32)
        m_x0 = -x_off
        m_y0 = (view_dim - mh) * unit + y_off
        m_w = mw * unit
        m_h = mh * unit
        if gd.bg_tile_ratio < 0:
            # tile_image vertically over the main rect (bag.cpp:842-853)
            n_t = jnp.maximum(
                (m_h / (m_w * F32(-gd.bg_tile_ratio))).astype(I32), 1
            ).astype(F32)
            u = (SX - m_x0) / m_w
            vraw = (SY - m_y0) / (m_h / n_t)
            v = vraw - jnp.floor(vraw)
            inside = (u >= 0) & (u < 1) & (SY >= m_y0) & (SY < m_y0 + m_h)
        else:
            bg_ar = bgw / bgh
            world_ar = mw / mh
            offset_x = state.bg_pct_x * (bg_ar - world_ar)
            bx0 = m_x0 + m_w * (-offset_x)
            bw = m_w * (bg_ar / world_ar)
            u = (SX - bx0) / bw
            v = (SY - m_y0) / m_h
            inside = (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
        su = jnp.clip((u * bgw).astype(I32), 0, bg_dims[bgi, 0] - 1)
        sv = jnp.clip((v * bgh).astype(I32), 0, bg_dims[bgi, 1] - 1)
        col = bg_atlas[bgi, sv + 0 * su, su].astype(F32)
        col = jnp.broadcast_to(col, (res, res, 3))
        out = jnp.where(inside[..., None], col, out)

    # ---- grid tiles (bag.cpp:941-955) ----
    if "grid" not in parts:
        return jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)
    cxi = jnp.floor(wx + RENDER_EPS).astype(I32)  # (1, 64)
    cyi = jnp.floor(wy + RENDER_EPS).astype(I32)  # (64, 1)
    in_grid = (cxi >= 0) & (cxi < state.main_width) & (cyi >= 0) & (
        cyi < state.main_height
    )
    grid_at = state.grid[
        jnp.clip(cyi, 0, state.grid.shape[0] - 1),
        jnp.clip(cxi, 0, state.grid.shape[1] - 1),
    ]
    if gd.center_agent(cfg):
        # cells outside the world render as out_of_bounds_object; the drawn
        # window is center +- (visibility/2 + 1) (bag.cpp:928-939)
        margin = state.visibility / 2 + 1
        low_x = (state.center_x - margin).astype(I32)
        high_x = (state.center_x + margin).astype(I32)
        low_y = (state.center_y - margin).astype(I32)
        high_y = (state.center_y + margin).astype(I32)
        in_window = (
            (cxi >= low_x) & (cxi <= high_x) & (cyi >= low_y) & (cyi <= high_y)
        )
        cell_type = jnp.where(in_grid, grid_at, state.out_of_bounds_object)
        cell_valid = in_window & (cell_type != O.INVALID_OBJ)
    else:
        cell_type = jnp.where(in_grid, grid_at, O.INVALID_OBJ)
        cell_valid = in_grid & (cell_type != O.INVALID_OBJ)

    cell_type_c = jnp.clip(cell_type, 0, grid_image_lut.shape[0] - 1)
    img_type = grid_image_lut[cell_type_c]
    theme = grid_theme_lut[cell_type_c]
    gts = gd.grid_theme_state(cfg, state)
    if gts is not None:
        theme = jnp.where(
            jnp.asarray(pack.grid_themed_mask)[cell_type_c], gts, theme
        )
    has_asset = (img_type >= 0) & (img_type < O.MAX_ASSETS)
    draw_cell = cell_valid & has_asset & (cell_type != O.SPACE)
    slot = slot_lut[
        jnp.clip(img_type, 0, O.MAX_ASSETS - 1), jnp.clip(theme, 0, 9)
    ]
    draw_cell = draw_cell & (slot >= 0)
    cu = (wx - (cxi.astype(F32) - RENDER_EPS)) / (1 + 2 * RENDER_EPS)
    cv = ((cyi.astype(F32) + 1 + RENDER_EPS) - wy) / (1 + 2 * RENDER_EPS)
    rgb, a = _sample_atlas(
        atlas, dims, jnp.clip(slot, 0), jnp.clip(cu, 0.0, 0.9999),
        jnp.clip(cv, 0.0, 0.9999), jnp.asarray(False),
    )
    a = jnp.where(draw_cell, a, 0.0)
    out = rgb * a[..., None] + out * (1 - a[..., None])
    return jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)


def render_grid_over(gd, cfg, state: EnvState, pack, canvas_f32, res: int = RES) -> jax.Array:
    """Gather-based grid pass blended over an existing f32 canvas (used by
    the direct path for grid-dynamic games)."""
    return _grid_pass_gather(gd, cfg, state, pack, canvas_f32, res)


def _grid_pass_gather(gd, cfg, state: EnvState, pack, out, res: int = RES):
    """The grid-tile pass of render_static_env over a given f32 canvas."""
    atlas = jnp.asarray(pack.atlas)
    dims = jnp.asarray(pack.dims)
    slot_lut = jnp.asarray(pack.slot_lut)
    grid_image_lut = jnp.asarray(pack.grid_image_lut)
    grid_theme_lut = jnp.asarray(pack.grid_theme_lut)
    _, _, wx, wy = _pixel_world_coords(state, res)
    cxi = jnp.floor(wx + RENDER_EPS).astype(I32)
    cyi = jnp.floor(wy + RENDER_EPS).astype(I32)
    in_grid = (cxi >= 0) & (cxi < state.main_width) & (cyi >= 0) & (
        cyi < state.main_height
    )
    grid_at = state.grid[
        jnp.clip(cyi, 0, state.grid.shape[0] - 1),
        jnp.clip(cxi, 0, state.grid.shape[1] - 1),
    ]
    if gd.center_agent(cfg):
        margin = state.visibility / 2 + 1
        low_x = (state.center_x - margin).astype(I32)
        high_x = (state.center_x + margin).astype(I32)
        low_y = (state.center_y - margin).astype(I32)
        high_y = (state.center_y + margin).astype(I32)
        in_window = (
            (cxi >= low_x) & (cxi <= high_x) & (cyi >= low_y) & (cyi <= high_y)
        )
        cell_type = jnp.where(in_grid, grid_at, state.out_of_bounds_object)
        cell_valid = in_window & (cell_type != O.INVALID_OBJ)
    else:
        cell_type = jnp.where(in_grid, grid_at, O.INVALID_OBJ)
        cell_valid = in_grid & (cell_type != O.INVALID_OBJ)
    cell_type_c = jnp.clip(cell_type, 0, grid_image_lut.shape[0] - 1)
    img_type = grid_image_lut[cell_type_c]
    theme = grid_theme_lut[cell_type_c]
    gts = gd.grid_theme_state(cfg, state)
    if gts is not None:
        theme = jnp.where(
            jnp.asarray(pack.grid_themed_mask)[cell_type_c], gts, theme
        )
    has_asset = (img_type >= 0) & (img_type < O.MAX_ASSETS)
    draw_cell = cell_valid & has_asset & (cell_type != O.SPACE)
    slot = slot_lut[
        jnp.clip(img_type, 0, O.MAX_ASSETS - 1), jnp.clip(theme, 0, 9)
    ]
    draw_cell = draw_cell & (slot >= 0)
    cu = (wx - (cxi.astype(F32) - RENDER_EPS)) / (1 + 2 * RENDER_EPS)
    cv = ((cyi.astype(F32) + 1 + RENDER_EPS) - wy) / (1 + 2 * RENDER_EPS)
    rgb, a = _sample_atlas(
        atlas, dims, jnp.clip(slot, 0), jnp.clip(cu, 0.0, 0.9999),
        jnp.clip(cv, 0.0, 0.9999), jnp.asarray(False),
    )
    a = jnp.where(draw_cell, a, 0.0)
    out = rgb * a[..., None] + out * (1 - a[..., None])
    out = _grid_color_rects(gd, cfg, cell_type_c, cell_valid, cu, cv, out)
    return out


def _grid_color_rects(gd, cfg, cell_type_c, cell_valid, cu, cv, out):
    """Per-game draw_grid_obj color rects (e.g. chaser orbs)."""
    crl = gd.grid_color_rect_lut(cfg)
    if crl is None:
        return out
    dim_lut, rgb_lut = (jnp.asarray(a) for a in crl)
    d = dim_lut[cell_type_c]
    lo = (1 - d) / 2
    hi = (1 + d) / 2
    inside = cell_valid & (d > 0) & (cu >= lo) & (cu < hi) & (cv >= lo) & (cv < hi)
    col = rgb_lut[cell_type_c].astype(F32)
    return jnp.where(inside[..., None], col, out)


def _entity_draw_order(ents):
    """render_z passes -1/0/1, slot-ascending within each (bag.cpp:957-958,
    1060-1066); dead slots sort last."""
    E = ents.capacity
    key = (ents.render_z + 1) * E + jnp.arange(E)
    key = jnp.where(ents.alive, key, 10 * E + jnp.arange(E))
    return jnp.argsort(key)


def _entity_rect(state, ents, i):
    """get_object_rect (bag.cpp:811-817) -> screen-space (x0, y0, w, h)."""
    unit, view_dim = state.unit, state.view_dim
    x, y = ents.x[i], ents.y[i]
    rx, ry = ents.rx[i], ents.ry[i]
    abs_c = ents.use_abs_coords[i]
    r_x0 = jnp.where(
        abs_c, view_dim * (x - rx) * unit, (x - rx) * unit - state.x_off
    )
    r_y0 = jnp.where(
        abs_c,
        view_dim * (y + ry) * unit,
        (view_dim - (y + ry)) * unit + state.y_off,
    )
    r_w = jnp.where(abs_c, 2 * view_dim * rx * unit, 2 * rx * unit)
    r_h = jnp.where(abs_c, 2 * view_dim * ry * unit, 2 * ry * unit)
    return r_x0, r_y0, r_w, r_h


def _composite_entities_gather(gd, cfg, state, pack, out, z_filter="all", res: int = RES):
    """Reference path: per-pixel gather sampling with rotation support."""
    atlas = jnp.asarray(pack.atlas)
    dims = jnp.asarray(pack.dims)
    slot_lut = jnp.asarray(pack.slot_lut)
    ents = state.ents
    E = ents.capacity
    order = _entity_draw_order(ents)
    SX, SY, _, _ = _pixel_world_coords(state, res)
    draw_mask = gd.entity_draw_mask(cfg, state)
    img_override = gd.entity_image_override(cfg, state)

    def draw_one(k, out):
        i = order[k]
        ok = ents.alive[i]
        if draw_mask is not None:
            ok = ok & draw_mask[i]
        if z_filter == "neg":
            ok = ok & (ents.render_z[i] < 0)
        elif z_filter == "nonneg":
            ok = ok & (ents.render_z[i] >= 0)
        r_x0, r_y0, r_w, r_h = _entity_rect(state, ents, i)
        img_t = ents.image_type[i] if img_override is None else img_override[i]
        e_slot = slot_lut[
            jnp.clip(img_t, 0, O.MAX_ASSETS - 1),
            jnp.clip(ents.image_theme[i], 0, 9),
        ]
        ok = ok & (img_t >= 0) & (img_t < O.MAX_ASSETS) & (e_slot >= 0)

        # monochrome: solid fill of the unadjusted rect, no rotation /
        # tiling / opacity (draw_image -> draw_grid_obj, bag.cpp:884-886)
        mono = cfg.use_monochrome_assets
        adj = None if mono else gd.image_rect_adjust(img_t)
        if adj is not None:
            aox, aoy, asw, ash = adj
            r_x0 = r_x0 + r_w * aox
            r_y0 = r_y0 + r_h * aoy
            r_w = r_w * asw
            r_h = r_h * ash

        rot = jnp.zeros_like(ents.rotation[i]) if mono else ents.rotation[i]
        cxp = r_x0 + r_w / 2
        cyp = r_y0 + r_h / 2
        dxp = SX - cxp
        dyp = SY - cyp
        cos_r = jnp.cos(rot)
        sin_r = jnp.sin(rot)
        lx = cos_r * dxp + sin_r * dyp
        ly = -sin_r * dxp + cos_r * dyp
        u = (lx + r_w / 2) / r_w
        v = (ly + r_h / 2) / r_h
        inside = (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
        ratio = None if mono else gd.tile_ratio_for(img_t, ents.rx[i], ents.ry[i])
        if ratio is not None:
            n_th = jnp.maximum(
                jnp.where(ratio > 0, (r_w / (r_h * jnp.abs(ratio) + 1e-9)).astype(I32), 1), 1
            )
            n_tv = jnp.maximum(
                jnp.where(ratio < 0, (r_h / (r_w * jnp.abs(ratio) + 1e-9)).astype(I32), 1), 1
            )
            unrot = rot == 0
            uraw = u * n_th.astype(F32)
            u = jnp.where(unrot & (ratio > 0), uraw - jnp.floor(uraw), u)
            vraw = v * n_tv.astype(F32)
            v = jnp.where(unrot & (ratio < 0), vraw - jnp.floor(vraw), v)
        rgb, a = _sample_atlas(
            atlas, dims, e_slot, jnp.clip(u, 0.0, 0.9999),
            jnp.clip(v, 0.0, 0.9999), ents.is_reflected[i],
        )
        a = a if mono else a * ents.alpha[i]
        a = jnp.where(inside & ok, a, 0.0)
        return rgb * a[..., None] + out * (1 - a[..., None])

    # order sorts alive entities first, so the loop can stop at the live
    # count (dynamic bound lowers to a while_loop; big win for large tables)
    n_draw = jnp.sum(ents.alive.astype(I32))
    return jax.lax.fori_loop(0, n_draw, draw_one, out)


def _composite_entities_matmul(gd, cfg, state, pack, out, z_filter="all"):
    """TPU path: separable nearest sampling via one-hot matmuls (MXU).

    Exact for rotation == 0 entities (every game currently ported); each
    output pixel is selected by exactly one product, so values match the
    gather path bit-for-bit."""
    atlas = jnp.asarray(pack.atlas).astype(F32)  # (n, Sh, Sw, 4)
    dims = jnp.asarray(pack.dims)
    slot_lut = jnp.asarray(pack.slot_lut)
    ents = state.ents
    E = ents.capacity
    Sh, Sw = atlas.shape[1], atlas.shape[2]
    order = _entity_draw_order(ents)
    px = jnp.arange(RES, dtype=F32) + 0.5
    iota_h = jnp.arange(Sh)
    iota_w = jnp.arange(Sw)
    draw_mask = gd.entity_draw_mask(cfg, state)
    img_override = gd.entity_image_override(cfg, state)

    def draw_one(k, out):
        i = order[k]
        ok = ents.alive[i]
        if draw_mask is not None:
            ok = ok & draw_mask[i]
        if z_filter == "neg":
            ok = ok & (ents.render_z[i] < 0)
        elif z_filter == "nonneg":
            ok = ok & (ents.render_z[i] >= 0)
        r_x0, r_y0, r_w, r_h = _entity_rect(state, ents, i)
        img_t = ents.image_type[i] if img_override is None else img_override[i]
        e_slot = slot_lut[
            jnp.clip(img_t, 0, O.MAX_ASSETS - 1),
            jnp.clip(ents.image_theme[i], 0, 9),
        ]
        ok = ok & (img_t >= 0) & (img_t < O.MAX_ASSETS) & (e_slot >= 0)
        w = dims[e_slot, 0]
        h = dims[e_slot, 1]

        u = (px - r_x0) / r_w  # (64,)
        v = (px - r_y0) / r_h
        in_x = (u >= 0) & (u < 1)
        in_y = (v >= 0) & (v < 1)
        ratio = gd.tile_ratio_for(img_t, ents.rx[i], ents.ry[i])
        if ratio is not None:
            # tile_image (bag.cpp:840-869); this path draws unrotated sprites
            n_th = jnp.maximum(
                jnp.where(
                    ratio > 0, (r_w / (r_h * jnp.abs(ratio) + 1e-9)).astype(I32), 1
                ), 1,
            )
            n_tv = jnp.maximum(
                jnp.where(
                    ratio < 0, (r_h / (r_w * jnp.abs(ratio) + 1e-9)).astype(I32), 1
                ), 1,
            )
            uraw = u * n_th.astype(F32)
            u = jnp.where(ratio > 0, uraw - jnp.floor(uraw), u)
            vraw = v * n_tv.astype(F32)
            v = jnp.where(ratio < 0, vraw - jnp.floor(vraw), v)
        su = jnp.clip((jnp.clip(u, 0.0, 0.9999) * w.astype(F32)).astype(I32), 0, w - 1)
        sv = jnp.clip((jnp.clip(v, 0.0, 0.9999) * h.astype(F32)).astype(I32), 0, h - 1)
        su = jnp.where(ents.is_reflected[i], w - 1 - su, su)

        ohy = ((iota_h[None, :] == sv[:, None]) & in_y[:, None] & ok).astype(F32)
        ohx = ((iota_w[:, None] == su[None, :]) & in_x[None, :]).astype(F32)
        tex = atlas[e_slot]  # (Sh, Sw, 4)
        tmp = jnp.einsum(
            "ys,swc->ywc", ohy, tex, preferred_element_type=jnp.float32
        )
        spr = jnp.einsum(
            "ywc,wx->yxc", tmp, ohx, preferred_element_type=jnp.float32
        )
        a = spr[..., 3] / 255.0 * ents.alpha[i]
        return spr[..., :3] * a[..., None] + out * (1 - a[..., None])

    n_draw = jnp.sum(ents.alive.astype(I32))
    return jax.lax.fori_loop(0, n_draw, draw_one, out)


def _paint_vel_info(gd, cfg, state, out):
    """bag.cpp:960-969."""
    if not (gd.has_useful_vel_info and cfg.paint_vel_info):
        return out
    ents = state.ents
    res = out.shape[0]
    scale = F32(RES / res)
    SX = ((jnp.arange(res, dtype=F32) + 0.5) * scale)[None, :]
    SY = ((jnp.arange(res, dtype=F32) + 0.5) * scale)[:, None]
    infodim = F32(RES * 0.2)
    s1 = jnp.clip(
        ((0.5 * ents.vx[eo.AGENT] / state.maxspeed + 0.5) * 255).astype(I32),
        0, 255,
    ).astype(F32)
    s2 = jnp.clip(
        ((0.5 * ents.vy[eo.AGENT] / state.max_jump + 0.5) * 255).astype(I32),
        0, 255,
    ).astype(F32)
    in1 = (SX < infodim) & (SY < infodim)
    in2 = (SX >= infodim) & (SX < 2 * infodim) & (SY < infodim)
    out = jnp.where(in1[..., None], s1, out)
    out = jnp.where(in2[..., None], s2, out)
    return out


def _paint_hud(gd, cfg, state, out):
    """Per-game post-entity fillRect overlays (get_abs_rect coords)."""
    hud = gd.hud_color_rects(cfg, state)
    SX, SY, _, _ = _pixel_world_coords(state, out.shape[0])
    if hud is not None:
        rects, colors = hud
        for k in range(rects.shape[0]):
            x0 = rects[k, 0] * state.unit
            y0 = rects[k, 1] * state.unit
            w = rects[k, 2] * state.unit
            h = rects[k, 3] * state.unit
            inside = (SX >= x0) & (SX < x0 + w) & (SY >= y0) & (SY < y0 + h)
            out = jnp.where(inside[..., None], colors[k].astype(F32), out)
    out = gd.hud_overlay(cfg, state, out, SX, SY)
    return out


def render_env(gd, cfg, state: EnvState, pack, res: int = RES) -> jax.Array:
    """Direct single-pass render (parity/golden path, center-agent games).

    ``res`` selects the output resolution: 64 for observations, 512 for the
    render_human info frame (vecgame.cpp:363-376; the reference renders the
    large frame with antialiasing, this path with nearest sampling)."""
    from procgen_tpu.engine.base import GameDef as _GD

    if type(gd).dynamic_background is not _GD.dynamic_background:
        # per-step custom background (starpilot's scroll); no grid content
        SX, SY, _, _ = _pixel_world_coords(state, res)
        out = jnp.zeros((res, res, 3), F32)
        out = gd.dynamic_background(cfg, state, out, SX, SY, pack)
        out = _composite_entities_gather(gd, cfg, state, pack, out, res=res)
        out = _paint_vel_info(gd, cfg, state, out)
        out = _paint_hud(gd, cfg, state, out)
        return jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)
    if getattr(gd, "grid_dynamic", False):
        out = render_static_env(gd, cfg, state, pack, parts=("bg",), res=res).astype(F32)
        out = _composite_entities_gather(gd, cfg, state, pack, out, "neg", res=res)
        out = render_grid_over(gd, cfg, state, pack, out, res=res)
        out = _composite_entities_gather(gd, cfg, state, pack, out, "nonneg", res=res)
    else:
        out = render_static_env(gd, cfg, state, pack, res=res).astype(F32)
        out = _composite_entities_gather(gd, cfg, state, pack, out, res=res)
    out = _paint_vel_info(gd, cfg, state, out)
    out = _paint_hud(gd, cfg, state, out)
    return jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)


def render_frame(gd, cfg, state: EnvState, pack) -> jax.Array:
    """Per-step frame: entities over the cached static layer (MXU path)."""
    if gd.center_agent(cfg):
        # view moves with the agent: static cache invalid, use direct path
        return render_env(gd, cfg, state, pack)
    out = state.static_layer.astype(F32)
    out = _composite_entities_matmul(gd, cfg, state, pack, out)
    out = _paint_vel_info(gd, cfg, state, out)
    out = _paint_hud(gd, cfg, state, out)
    return jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Fast paths: mip-atlas matmul sampling, batched over envs
# ---------------------------------------------------------------------------


def render_static_fast(gd, cfg, state: EnvState, pack) -> jax.Array:
    """Matmul/mip formulation of the static layer (single env; vmap-lifted).

    Background: the scaled blit is axis-aligned, so nearest sampling is
    separable; the background index folds into the row one-hot over the
    flattened mip stack.  Grid: the cell-type field upsamples to per-pixel
    slots with two one-hot matmuls, then each sprite slot is sampled
    separably and selected per pixel.  Center-agent views are translation
    only, so the same separable path applies (with the moving window and
    out-of-bounds-cell semantics of bag.cpp:928-939 folded into the slot
    field).
    """
    BR = pack.bg_res
    NB = pack.bg_mips.shape[0]
    R = pack.sprite_res
    n_slots = pack.sprite_mips.shape[0]

    SX, SY, wx, wy = _pixel_world_coords(state)
    sxv = SX[0]  # (64,) column centers
    syv = SY[:, 0]  # (64,) row centers
    wxv = wx[0]
    wyv = wy[:, 0]
    mw = state.main_width.astype(F32)
    mh = state.main_height.astype(F32)
    unit, view_dim = state.unit, state.view_dim
    x_off, y_off = state.x_off, state.y_off

    out = jnp.zeros((RES, RES, 3), F32)

    if cfg.use_backgrounds:
        bg_flat = jnp.asarray(
            pack.bg_mips.reshape(NB * BR, BR * 3), jnp.uint8
        ).astype(F32)
        bg_dims = jnp.asarray(pack.bg_dims)
        bgi = state.background_index
        bgw = bg_dims[bgi, 0].astype(F32)
        bgh = bg_dims[bgi, 1].astype(F32)
        m_x0 = -x_off
        m_y0 = (view_dim - mh) * unit + y_off
        m_w = mw * unit
        m_h = mh * unit
        if gd.bg_tile_ratio < 0:
            # vertical tiling over the main rect (bag.cpp:842-853)
            n_t = jnp.maximum(
                (m_h / (m_w * F32(-gd.bg_tile_ratio))).astype(I32), 1
            ).astype(F32)
            u = (sxv - m_x0) / m_w
            vraw = (syv - m_y0) / (m_h / n_t)
            v = vraw - jnp.floor(vraw)
            in_x = (u >= 0) & (u < 1)
            in_y = (syv >= m_y0) & (syv < m_y0 + m_h)
        else:
            bg_ar = bgw / bgh
            world_ar = mw / mh
            offset_x = state.bg_pct_x * (bg_ar - world_ar)
            bx0 = m_x0 + m_w * (-offset_x)
            bw = m_w * (bg_ar / world_ar)
            u = (sxv - bx0) / bw  # (64,)
            v = (syv - m_y0) / m_h
            in_x = (u >= 0) & (u < 1)
            in_y = (v >= 0) & (v < 1)
        su = jnp.clip((u * BR).astype(I32), 0, BR - 1)
        sv = jnp.clip((v * BR).astype(I32), 0, BR - 1)
        rows = bgi * BR + sv
        ohy = (
            (jnp.arange(NB * BR)[None, :] == rows[:, None]) & in_y[:, None]
        ).astype(F32)
        ohx = ((jnp.arange(BR)[:, None] == su[None, :]) & in_x[None, :]).astype(F32)
        tmp = jnp.einsum(
            "yr,rc->yc", ohy, bg_flat, preferred_element_type=jnp.float32
        ).reshape(RES, BR, 3)
        out = jnp.einsum(
            "ybc,bx->yxc", tmp, ohx, preferred_element_type=jnp.float32
        )

    if not getattr(gd, "grid_dynamic", False):
        out = _grid_fast_one(gd, cfg, state, pack, out)
    return jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)


def _grid_fast_one(gd, cfg, state: EnvState, pack, out) -> jax.Array:
    """Matmul grid-tile pass over an f32 canvas (single env)."""
    R = pack.sprite_res
    n_slots = pack.sprite_mips.shape[0]
    _, _, wx, wy = _pixel_world_coords(state)
    wxv = wx[0]
    wyv = wy[:, 0]

    gts = gd.grid_theme_state(cfg, state)
    if gts is None:
        grid_slot_lut = jnp.asarray(pack.grid_slot_lut)
    else:
        grid_slot_lut = jnp.asarray(pack.grid_slot_lut_themed)[
            jnp.clip(gts, 0, pack.grid_slot_lut_themed.shape[0] - 1)
        ]
    Hm, Wm = state.grid.shape
    slot_grid = grid_slot_lut[
        jnp.clip(state.grid, 0, grid_slot_lut.shape[0] - 1)
    ].astype(F32)
    cxi = jnp.floor(wxv + RENDER_EPS).astype(I32)  # (64,)
    cyi = jnp.floor(wyv + RENDER_EPS).astype(I32)
    in_cx = (cxi >= 0) & (cxi < state.main_width)
    in_cy = (cyi >= 0) & (cyi < state.main_height)
    ohgy = (
        (jnp.arange(Hm)[None, :] == cyi[:, None]) & in_cy[:, None]
    ).astype(F32)
    ohgx = ((jnp.arange(Wm)[:, None] == cxi[None, :]) & in_cx[None, :]).astype(F32)
    slot_pix = jnp.einsum(
        "yh,hw,wx->yx", ohgy, slot_grid, ohgx, preferred_element_type=jnp.float32
    ).astype(I32)  # 0 = nothing, k = sprite slot k-1

    if gd.center_agent(cfg):
        # moving-view semantics (bag.cpp:928-939): draw only the window
        # around the center, and render out-of-grid cells inside it as the
        # out_of_bounds_object -- all still axis-separable
        margin = state.visibility / 2 + 1
        low_x = (state.center_x - margin).astype(I32)
        high_x = (state.center_x + margin).astype(I32)
        low_y = (state.center_y - margin).astype(I32)
        high_y = (state.center_y + margin).astype(I32)
        in_wx = (cxi >= low_x) & (cxi <= high_x)
        in_wy = (cyi >= low_y) & (cyi <= high_y)
        in_window = in_wy[:, None] & in_wx[None, :]
        in_grid_pix = in_cy[:, None] & in_cx[None, :]
        oob_slot = grid_slot_lut[
            jnp.clip(state.out_of_bounds_object, 0, grid_slot_lut.shape[0] - 1)
        ]
        slot_pix = jnp.where(in_window & ~in_grid_pix, oob_slot, slot_pix)
        slot_pix = jnp.where(in_window, slot_pix, 0)

    cu = (wxv - (cxi.astype(F32) - RENDER_EPS)) / (1 + 2 * RENDER_EPS)
    cv = ((cyi.astype(F32) + 1 + RENDER_EPS) - wyv) / (1 + 2 * RENDER_EPS)
    tsu = jnp.clip((jnp.clip(cu, 0.0, 0.9999) * R).astype(I32), 0, R - 1)
    tsv = jnp.clip((jnp.clip(cv, 0.0, 0.9999) * R).astype(I32), 0, R - 1)
    ohty = (jnp.arange(R)[None, :] == tsv[:, None]).astype(F32)  # (64, R)
    ohtx = (jnp.arange(R)[:, None] == tsu[None, :]).astype(F32)  # (R, 64)
    mips = jnp.asarray(pack.sprite_mips).astype(F32)  # (n, R, R, 4)
    # sample every slot separably (few slots per game), select per pixel
    sampled = jnp.einsum(
        "ys,nswc,wx->nyxc", ohty, mips, ohtx, preferred_element_type=jnp.float32
    )  # (n, 64, 64, 4)
    sel = (
        slot_pix[None, :, :] == (jnp.arange(n_slots) + 1)[:, None, None]
    ).astype(F32)
    tex = jnp.einsum("nyx,nyxc->yxc", sel, sampled)
    a = tex[..., 3] / 255.0
    out = tex[..., :3] * a[..., None] + out * (1 - a[..., None])

    if gd.grid_color_rect_lut(cfg) is not None:
        type_pix = jnp.einsum(
            "yh,hw,wx->yx", ohgy, state.grid.astype(F32), ohgx,
            preferred_element_type=jnp.float32,
        ).astype(I32)
        cell_valid = in_cy[:, None] & in_cx[None, :]
        out = _grid_color_rects(
            gd, cfg,
            jnp.clip(type_pix, 0, grid_slot_lut.shape[0] - 1),
            cell_valid, cu[None, :], cv[:, None], out,
        )
    return out


def render_static_dispatch(gd, cfg, state: EnvState, pack) -> jax.Array:
    """Static layer: fast matmul path for fixed-view games, exact gather
    path for center-agent games."""
    if gd.center_agent(cfg):
        return render_static_env(gd, cfg, state, pack)
    return render_static_fast(gd, cfg, state, pack)


def render_frames(gd, cfg, states: EnvState, pack) -> jax.Array:
    """Batched per-step frames: (N, 64, 64, 3) uint8.

    Entities composite over the cached static layer.  Per sprite, only a
    ``gd.sprite_tile``-sized screen tile is touched: the sprite samples into
    the tile via bf16 one-hot matmuls (exact -- texel values <= 255 are
    representable and each output receives exactly one product, accumulated
    in f32), then blends through dynamic slices.  The draw loop's trip count
    is the *max alive count* across the batch, so capacity padding costs
    nothing."""
    if gd.entity_rotations == "free" or (
        gd.center_agent(cfg) and getattr(gd, "grid_dynamic", False)
    ):
        # arbitrary sprite angles need per-pixel rotation sampling
        return jax.vmap(lambda s: render_env(gd, cfg, s, pack))(states)

    R = pack.sprite_res
    T = getattr(gd, "sprite_tile", 16)
    # bf16 one-hot dots are exact here (texels <= 255, one product per
    # output) and 2x the MXU rate; XLA:CPU lacks bf16 dot support.
    BF = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    mips = jnp.asarray(pack.sprite_mips).astype(BF)  # (n, R, R, 4)
    slot_lut = jnp.asarray(pack.slot_lut)
    ents = states.ents
    N, E = ents.x.shape
    if gd.center_agent(cfg):
        # moving view: the bg+grid layer is recomputed each frame, still on
        # the separable matmul path (the view is translation-only)
        out = jax.vmap(
            lambda s: render_static_fast(gd, cfg, s, pack)
        )(states).astype(F32)
    else:
        out = states.static_layer.astype(F32)

    key = (ents.render_z + 1) * E + jnp.arange(E)[None, :]
    key = jnp.where(ents.alive, key, 10 * E + jnp.arange(E)[None, :])
    order = jnp.argsort(key, axis=-1)  # (N, E)
    kmax = jnp.max(jnp.sum(ents.alive, axis=-1))
    one_env = jax.tree_util.tree_map(lambda x: x[0], states)
    draw_mask_b = (
        jax.vmap(lambda s: gd.entity_draw_mask(cfg, s))(states)
        if gd.entity_draw_mask(cfg, one_env) is not None
        else None
    )
    img_override_b = (
        jax.vmap(lambda s: gd.entity_image_override(cfg, s))(states)
        if gd.entity_image_override(cfg, one_env) is not None
        else None
    )

    tloc = jnp.arange(T, dtype=F32)
    rows = jnp.arange(N)
    unit = states.unit
    view_dim = states.view_dim

    def draw_k_class(k, out, z_filter):
        i = order[:, k]  # (N,)

        def g(field):
            return getattr(ents, field)[rows, i]

        ok = g("alive")
        if draw_mask_b is not None:
            ok = ok & draw_mask_b[rows, i]
        if z_filter == "neg":
            ok = ok & (g("render_z") < 0)
        elif z_filter == "nonneg":
            ok = ok & (g("render_z") >= 0)
        x, y, rx, ry = g("x"), g("y"), g("rx"), g("ry")
        abs_c = g("use_abs_coords")
        r_x0 = jnp.where(
            abs_c, view_dim * (x - rx) * unit, (x - rx) * unit - states.x_off
        )
        r_y0 = jnp.where(
            abs_c,
            view_dim * (y + ry) * unit,
            (view_dim - (y + ry)) * unit + states.y_off,
        )
        r_w = jnp.where(abs_c, 2 * view_dim * rx * unit, 2 * rx * unit)
        r_h = jnp.where(abs_c, 2 * view_dim * ry * unit, 2 * ry * unit)

        img_t = (
            g("image_type") if img_override_b is None else img_override_b[rows, i]
        )
        e_slot = slot_lut[
            jnp.clip(img_t, 0, O.MAX_ASSETS - 1), jnp.clip(g("image_theme"), 0, 9)
        ]
        ok = ok & (img_t >= 0) & (img_t < O.MAX_ASSETS) & (e_slot >= 0)

        # per-game dest-rect adjustment (get_adjusted_image_rect)
        adj = gd.image_rect_adjust(img_t)
        if adj is not None:
            aox, aoy, asw, ash = adj
            r_x0 = r_x0 + r_w * aox
            r_y0 = r_y0 + r_h * aoy
            r_w = r_w * asw
            r_h = r_h * ash

        # axis-aligned rotation class (0, 90, 180, 270 degrees); arbitrary
        # angles use the gather path (gd.entity_rotations == "free")
        if gd.entity_rotations == "axis":
            HALF_PI = F32(np.pi / 2)
            rk = jnp.round(g("rotation") / HALF_PI).astype(I32) % 4
            c_lut = jnp.asarray([1.0, 0.0, -1.0, 0.0], F32)
            s_lut = jnp.asarray([0.0, 1.0, 0.0, -1.0], F32)
            rc = c_lut[rk]
            rs = s_lut[rk]
            swap = (rk % 2) == 1
        else:
            rc = jnp.ones_like(r_w)
            rs = jnp.zeros_like(r_w)
            swap = jnp.zeros_like(ok)

        cx = r_x0 + r_w / 2
        cy = r_y0 + r_h / 2
        # rotated sprite's screen bounding box (w/h swap for 90/270)
        bb_w = jnp.where(swap, r_h, r_w)
        bb_h = jnp.where(swap, r_w, r_h)
        tx = jnp.clip(jnp.floor(cx - bb_w / 2).astype(I32), 0, RES - T)
        ty = jnp.clip(jnp.floor(cy - bb_h / 2).astype(I32), 0, RES - T)
        gx = tx[:, None].astype(F32) + tloc[None, :] + 0.5  # (N, T) pixel centers
        gy = ty[:, None].astype(F32) + tloc[None, :] + 0.5
        dx = gx - cx[:, None]  # (N, T) along screen columns
        dy = gy - cy[:, None]  # (N, T) along screen rows

        # Inverse painter rotation: u = (c*dx + s*dy + w/2)/w,
        # v = (-s*dx + c*dy + h/2)/h.  For the axis-aligned classes, u/v
        # each depend on exactly one screen axis, keeping nearest sampling
        # separable; 90/270 additionally swap texture axes (tex transpose).
        row_coord = jnp.where(
            swap[:, None],
            (rs[:, None] * dy + r_w[:, None] / 2) / r_w[:, None],  # u (tex x)
            (rc[:, None] * dy + r_h[:, None] / 2) / r_h[:, None],  # v (tex y)
        )
        col_coord = jnp.where(
            swap[:, None],
            (-rs[:, None] * dx + r_h[:, None] / 2) / r_h[:, None],  # v
            (rc[:, None] * dx + r_w[:, None] / 2) / r_w[:, None],  # u
        )

        # inside test on the pre-tiling coordinates
        in_x = (col_coord >= 0) & (col_coord < 1)
        in_y = (row_coord >= 0) & (row_coord < 1)

        # horizontal/vertical tiling (tile_image, bag.cpp:840-869); only for
        # unrotated sprites, as in draw_image (bag.cpp:899-906)
        ratio = gd.tile_ratio_for(img_t, g("rx"), g("ry"))
        if ratio is not None:
            n_th = jnp.maximum(
                jnp.where(
                    ratio > 0,
                    (r_w / (r_h * jnp.abs(ratio) + 1e-9)).astype(I32),
                    1,
                ),
                1,
            )
            n_tv = jnp.maximum(
                jnp.where(
                    ratio < 0,
                    (r_h / (r_w * jnp.abs(ratio) + 1e-9)).astype(I32),
                    1,
                ),
                1,
            )
            unrot = rk == 0 if gd.entity_rotations == "axis" else ok | True
            do_h = unrot & (ratio > 0)
            do_v = unrot & (ratio < 0)
            uraw = col_coord * n_th[:, None].astype(F32)
            col_coord = jnp.where(
                do_h[:, None], uraw - jnp.floor(uraw), col_coord
            )
            vraw = row_coord * n_tv[:, None].astype(F32)
            row_coord = jnp.where(
                do_v[:, None], vraw - jnp.floor(vraw), row_coord
            )

        su = jnp.clip(
            (jnp.clip(col_coord, 0.0, 0.9999) * R).astype(I32), 0, R - 1
        )
        sv = jnp.clip(
            (jnp.clip(row_coord, 0.0, 0.9999) * R).astype(I32), 0, R - 1
        )
        # reflection mirrors the texture's x axis, which is indexed by the
        # column one-hot normally and by the row one-hot when axes swapped
        refl = g("is_reflected")
        su = jnp.where((refl & ~swap)[:, None], R - 1 - su, su)
        sv = jnp.where((refl & swap)[:, None], R - 1 - sv, sv)

        ohy = (
            (jnp.arange(R)[None, None, :] == sv[:, :, None])
            & in_y[:, :, None]
            & ok[:, None, None]
        ).astype(BF)  # (N, T, R)
        ohx = (
            (jnp.arange(R)[None, :, None] == su[:, None, :]) & in_x[:, None, :]
        ).astype(BF)  # (N, R, T)
        tex = mips[jnp.clip(e_slot, 0)]  # (N, R, R, 4)
        if gd.entity_rotations == "axis":
            tex = jnp.where(
                swap[:, None, None, None], jnp.swapaxes(tex, 1, 2), tex
            )
        tmp = jnp.einsum(
            "nys,nswc->nywc", ohy, tex, preferred_element_type=jnp.float32
        )
        spr = jnp.einsum(
            "nywc,nwx->nyxc",
            tmp.astype(BF),
            ohx,
            preferred_element_type=jnp.float32,
        )  # (N, T, T, 4)
        a = spr[..., 3] / 255.0 * g("alpha")[:, None, None]

        tile_old = jax.vmap(
            lambda o, yy, xx: jax.lax.dynamic_slice(o, (yy, xx, 0), (T, T, 3))
        )(out, ty, tx)
        tile_new = spr[..., :3] * a[..., None] + tile_old * (1 - a[..., None])
        return jax.vmap(
            lambda o, t, yy, xx: jax.lax.dynamic_update_slice(o, t, (yy, xx, 0))
        )(out, tile_new, ty, tx)

    if getattr(gd, "grid_dynamic", False):
        # static cache holds the background only; draw under-grid entities,
        # then the grid (fresh each frame), then the rest (bag.cpp:921-958).
        out = jax.lax.fori_loop(
            0, kmax, lambda k, o: draw_k_class(k, o, "neg"), out
        )
        out = jax.vmap(
            lambda s, o: _grid_fast_one(gd, cfg, s, pack, o)
        )(states, out)
        out = jax.lax.fori_loop(
            0, kmax, lambda k, o: draw_k_class(k, o, "nonneg"), out
        )
    else:
        out = jax.lax.fori_loop(
            0, kmax, lambda k, o: draw_k_class(k, o, "all"), out
        )
    out = _paint_vel_info_batched(gd, cfg, states, out)
    from procgen_tpu.engine.base import GameDef as _GD

    has_hud = (
        gd.hud_color_rects(cfg, jax.tree_util.tree_map(lambda x: x[0], states))
        is not None
        or type(gd).hud_overlay is not _GD.hud_overlay
    )
    if has_hud:
        out = jax.vmap(lambda s, o: _paint_hud(gd, cfg, s, o))(states, out)
    return jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)


def _paint_vel_info_batched(gd, cfg, states, out):
    if not (gd.has_useful_vel_info and cfg.paint_vel_info):
        return out
    ents = states.ents
    SX = (jnp.arange(RES, dtype=F32) + 0.5)[None, :]
    SY = (jnp.arange(RES, dtype=F32) + 0.5)[:, None]
    infodim = F32(RES * 0.2)
    s1 = jnp.clip(
        ((0.5 * ents.vx[:, eo.AGENT] / states.maxspeed + 0.5) * 255).astype(I32),
        0, 255,
    ).astype(F32)
    s2 = jnp.clip(
        ((0.5 * ents.vy[:, eo.AGENT] / states.max_jump + 0.5) * 255).astype(I32),
        0, 255,
    ).astype(F32)
    in1 = ((SX < infodim) & (SY < infodim))[None, ..., None]
    in2 = ((SX >= infodim) & (SX < 2 * infodim) & (SY < infodim))[None, ..., None]
    out = jnp.where(in1, s1[:, None, None, None], out)
    out = jnp.where(in2, s2[:, None, None, None], out)
    return out
