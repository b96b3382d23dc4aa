"""Pure-JAX compositing renderer producing (64, 64, 3) uint8 observations.

Per-pixel *gather* formulation of the reference's QPainter raster
(bag.cpp:819-1012): instead of forward-painting rects, every output pixel
computes its world coordinate, resolves the winning grid cell (draw order =
x-major ascending, so at the RENDER_EPS overlaps the higher cell wins:
``floor(w + eps)``), samples the sprite atlas nearest-neighbor, and entities
composite source-over in reference draw order (render_z -1/0/1 passes, slot
ascending within a pass, bag.cpp:1060-1066).

Written per env and vmapped.  A Pallas tile kernel is the planned follow-up
for the entity loop; this version is compiler-fused gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

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
        cx, cy = gd.choose_center(cfg, state)
        visibility = state.visibility
    else:
        cx = mw * F32(0.5)
        cy = mh * F32(0.5)
        visibility = jnp.maximum(jnp.maximum(mw, mh), state.min_visibility)
    raw_unit = 64 / visibility
    unit = raw_unit  # rect_height == 64
    view_dim = 64.0 / raw_unit
    x_off = unit * (cx - view_dim / 2)
    y_off = unit * (cy - view_dim / 2)
    return state.replace(
        center_x=cx, center_y=cy, visibility=visibility,
        unit=unit, view_dim=view_dim, x_off=x_off, y_off=y_off,
    )


def _sample_atlas(atlas, dims, slot, u, v, reflected):
    """Nearest sample of atlas[slot] at normalized (u, v); u flip when
    reflected (mirrored asset, bag.cpp:121-122).  Returns (rgb f32, a f32)."""
    w = dims[slot, 0]
    h = dims[slot, 1]
    su = jnp.clip((u * w.astype(F32)).astype(I32), 0, w - 1)
    sv = jnp.clip((v * h.astype(F32)).astype(I32), 0, h - 1)
    su = jnp.where(reflected, w - 1 - su, su)
    texel = atlas[slot, sv, su]
    rgb = texel[..., :3].astype(F32)
    a = texel[..., 3].astype(F32) / 255.0
    return rgb, a


def render_env(gd, cfg, state: EnvState, pack) -> jax.Array:
    """One env -> (64, 64, 3) uint8."""
    atlas = jnp.asarray(pack.atlas)
    dims = jnp.asarray(pack.dims)
    slot_lut = jnp.asarray(pack.slot_lut)
    bg_atlas = jnp.asarray(pack.bg_atlas)
    bg_dims = jnp.asarray(pack.bg_dims)
    grid_image_lut = jnp.asarray(pack.grid_image_lut)
    grid_theme_lut = jnp.asarray(pack.grid_theme_lut)

    unit = state.unit
    view_dim = state.view_dim
    x_off = state.x_off
    y_off = state.y_off
    mw = state.main_width.astype(F32)
    mh = state.main_height.astype(F32)

    # screen-pixel centers and their world coordinates
    sx = jnp.arange(RES, dtype=F32) + 0.5  # columns
    sy = jnp.arange(RES, dtype=F32) + 0.5  # rows (top-down)
    SX = sx[None, :]
    SY = sy[:, None]
    wx = (SX + x_off) / unit  # (1, 64) -> world x per column
    wy = view_dim - (SY - y_off) / unit  # (64, 1) -> world y per row

    out = jnp.zeros((RES, RES, 3), F32)  # black fill (bag.cpp:980)

    # ---- background (bag.cpp:979-1007) ----
    if cfg.use_backgrounds:
        bgi = state.background_index
        bgw = bg_dims[bgi, 0].astype(F32)
        bgh = bg_dims[bgi, 1].astype(F32)
        m_x0 = -x_off
        m_y0 = (view_dim - mh) * unit + y_off
        m_w = mw * unit
        m_h = mh * unit
        bg_ar = bgw / bgh
        world_ar = mw / mh
        offset_x = state.bg_pct_x * (bg_ar - world_ar)
        # adjust_rect(main_rect, (-offset_x, 0, bg_ar/world_ar, 1))
        bx0 = m_x0 + m_w * (-offset_x)
        bw = m_w * (bg_ar / world_ar)
        u = (SX - bx0) / bw
        v = (SY - m_y0) / m_h
        inside = (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
        su = jnp.clip((u * bgw).astype(I32), 0, bg_dims[bgi, 0] - 1)
        sv = jnp.clip((v * bgh).astype(I32), 0, bg_dims[bgi, 1] - 1)
        col = bg_atlas[bgi, sv + 0 * su, su].astype(F32)
        col = jnp.broadcast_to(col, (RES, RES, 3))
        out = jnp.where(inside[..., None], col, out)

    # ---- grid tiles (bag.cpp:941-955) ----
    cxi = jnp.floor(wx + RENDER_EPS).astype(I32)  # (1, 64)
    cyi = jnp.floor(wy + RENDER_EPS).astype(I32)  # (64, 1)
    in_grid = (cxi >= 0) & (cxi < state.main_width) & (cyi >= 0) & (
        cyi < state.main_height
    )
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
        cell_type = jnp.where(
            in_grid,
            state.grid[
                jnp.clip(cyi, 0, state.grid.shape[0] - 1),
                jnp.clip(cxi, 0, state.grid.shape[1] - 1),
            ],
            state.out_of_bounds_object,
        )
        cell_valid = in_window & (cell_type != O.INVALID_OBJ)
    else:
        cell_type = jnp.where(
            in_grid,
            state.grid[
                jnp.clip(cyi, 0, state.grid.shape[0] - 1),
                jnp.clip(cxi, 0, state.grid.shape[1] - 1),
            ],
            O.INVALID_OBJ,
        )
        cell_valid = in_grid & (cell_type != O.INVALID_OBJ)

    cell_type_c = jnp.clip(cell_type, 0, grid_image_lut.shape[0] - 1)
    img_type = grid_image_lut[cell_type_c]
    theme = grid_theme_lut[cell_type_c]
    has_asset = (img_type >= 0) & (img_type < O.MAX_ASSETS) & (
        img_type != O.SPACE
    )
    draw_cell = cell_valid & has_asset & (cell_type != O.SPACE)
    slot = slot_lut[
        jnp.clip(img_type, 0, O.MAX_ASSETS - 1), jnp.clip(theme, 0, 9)
    ]
    draw_cell = draw_cell & (slot >= 0)
    # uv inside the eps-inflated cell rect
    cu = (wx - (cxi.astype(F32) - RENDER_EPS)) / (1 + 2 * RENDER_EPS)
    cv = ((cyi.astype(F32) + 1 + RENDER_EPS) - wy) / (1 + 2 * RENDER_EPS)
    rgb, a = _sample_atlas(
        atlas, dims, jnp.clip(slot, 0), jnp.clip(cu, 0.0, 0.9999),
        jnp.clip(cv, 0.0, 0.9999), jnp.asarray(False),
    )
    a = jnp.where(draw_cell, a, 0.0)
    out = rgb * a[..., None] + out * (1 - a[..., None])

    # ---- entities in draw order (bag.cpp:924, 957-958) ----
    ents = state.ents
    E = ents.capacity
    draw_key = (ents.render_z + 1) * E + jnp.arange(E)
    draw_key = jnp.where(ents.alive, draw_key, 10 * E + jnp.arange(E))
    order = jnp.argsort(draw_key)

    def draw_one(k, out):
        i = order[k]
        ok = ents.alive[i]
        if hasattr(gd, "should_draw_entity_mask"):
            ok = ok & gd.should_draw_entity_mask(cfg, state)[i]
        x, y = ents.x[i], ents.y[i]
        rx, ry = ents.rx[i], ents.ry[i]
        abs_c = ents.use_abs_coords[i]
        # get_object_rect (bag.cpp:811-817)
        r_x0 = jnp.where(
            abs_c, view_dim * (x - rx) * unit, (x - rx) * unit - x_off
        )
        r_y0 = jnp.where(
            abs_c,
            view_dim * (y + ry) * unit,
            (view_dim - (y + ry)) * unit + y_off,
        )
        r_w = jnp.where(abs_c, 2 * view_dim * rx * unit, 2 * rx * unit)
        r_h = jnp.where(abs_c, 2 * view_dim * ry * unit, 2 * ry * unit)

        img_t = ents.image_type[i]
        e_theme = ents.image_theme[i]
        e_slot = slot_lut[
            jnp.clip(img_t, 0, O.MAX_ASSETS - 1), jnp.clip(e_theme, 0, 9)
        ]
        ok = ok & (img_t >= 0) & (img_t < O.MAX_ASSETS) & (e_slot >= 0)

        rot = ents.rotation[i]
        cxp = r_x0 + r_w / 2
        cyp = r_y0 + r_h / 2
        dxp = SX - cxp
        dyp = SY - cyp
        cos_r = jnp.cos(rot)
        sin_r = jnp.sin(rot)
        # inverse of painter rotation (clockwise screen rotation by rot)
        lx = cos_r * dxp + sin_r * dyp
        ly = -sin_r * dxp + cos_r * dyp
        u = (lx + r_w / 2) / r_w
        v = (ly + r_h / 2) / r_h
        inside = (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
        rgb, a = _sample_atlas(
            atlas, dims, e_slot, jnp.clip(u, 0.0, 0.9999),
            jnp.clip(v, 0.0, 0.9999), ents.is_reflected[i],
        )
        a = a * ents.alpha[i]
        a = jnp.where(inside & ok, a, 0.0)
        return rgb * a[..., None] + out * (1 - a[..., None])

    out = jax.lax.fori_loop(0, E, draw_one, out)

    # ---- paint_vel_info squares (bag.cpp:960-969) ----
    if gd.has_useful_vel_info and cfg.paint_vel_info:
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

    return jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)
