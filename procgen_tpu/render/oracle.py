"""Scalar observation oracle: the readable specification of the 64x64 obs.

procgen_tpu renders observations with TPU-native semantics -- fixed-res
sprite mips, prerendered rotation bins, separable nearest sampling and
premultiplied-alpha blending (render/fast2.py + render/pallas_compositor.py).
This module is the per-env, gather-based, entity-at-a-time *specification*
of those semantics: every float expression here mirrors the batched paths
exactly, so ``fast2.render_frames2`` and the Pallas kernel must reproduce
this oracle BIT-FOR-BIT (asserted for all 16 games in
tests/test_render_paths.py, in f32 on CPU and on TPU hardware via
tools/tpu_render_check.py).

What it models (the reference's draw pass, bag.cpp:819-1007):
  * world->screen transform and the main-rect background blit
    (bag.cpp:979-1007), including vertical bg tiling (bag.cpp:842-853),
  * grid tiles with RENDER_EPS cell overlap, the center-agent moving
    window and out-of-bounds cells (bag.cpp:921-955, 928-939),
  * entities z-sorted into render_z passes {-1, 0, 1} in slot order
    (bag.cpp:957-958, 1060-1066), nearest-sampled with reflection,
    tiling (tile_image, bag.cpp:840-869) and alpha blending,
  * the velocity-info HUD (bag.cpp:960-969) and per-game HUD rects.

Deliberate deviations from the Qt rasterizer (shared by ALL paths and
quantified against the C++ refharness in tools/pixel_conformance.py):
  * sprites/backgrounds sample fixed-resolution nearest mips instead of
    the full-resolution PNGs (pack.sprite_mips / pack.bg_mip64),
  * painter rotations quantize to ``pack.rot_bins`` prerendered bins
    (exact for axis-aligned rotations, 22.5-degree steps otherwise),
  * the static bg+grid layer is baked once per level and rounded to uint8
    (the per-frame blend starts from that uint8 canvas).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu import objects as O
from procgen_tpu.render import fast2
from procgen_tpu.render.fast2 import RES, RENDER_EPS, TWO_PI, _RF
from procgen_tpu.state import F32, I32

__all__ = ["oracle_obs", "oracle_static"]


def _px():
    return jnp.arange(RES, dtype=F32) + 0.5  # pixel centers


# ---------------------------------------------------------------------------
# Background
# ---------------------------------------------------------------------------


def _bg(gd, cfg, state, tables, bm_f32):
    """Background blit from the env's 64x64 bg mip (bag.cpp:979-1007).

    Mirrors fast2.bg_pass for one env: same u/v expressions, same clips."""
    if not cfg.use_backgrounds:
        return jnp.zeros((RES, RES, 3), F32)
    px = _px()
    mw = state.main_width.astype(F32)
    mh = state.main_height.astype(F32)
    unit, view_dim = state.unit, state.view_dim
    m_x0 = -state.x_off
    m_y0 = (view_dim - mh) * unit + state.y_off
    m_w = mw * unit
    m_h = mh * unit
    if gd.bg_tile_ratio < 0:
        n_t = jnp.maximum(
            (m_h / (m_w * F32(-gd.bg_tile_ratio))).astype(I32), 1
        ).astype(F32)
        u = (px - m_x0) / m_w
        vraw = (px - m_y0) / (m_h / n_t)
        v = vraw - jnp.floor(vraw)
        in_x = (u >= 0) & (u < 1)
        in_y = (px >= m_y0) & (px < m_y0 + m_h)
    else:
        bgd = jnp.asarray(tables.bg_dims)[state.background_index]
        bg_ar = bgd[0] / bgd[1]
        world_ar = mw / mh
        offset_x = state.bg_pct_x * (bg_ar - world_ar)
        bx0 = m_x0 + m_w * (-offset_x)
        bw = m_w * (bg_ar / world_ar)
        u = (px - bx0) / bw
        v = (px - m_y0) / m_h
        in_x = (u >= 0) & (u < 1)
        in_y = (v >= 0) & (v < 1)
    su = jnp.clip((u * RES).astype(I32), 0, RES - 1)
    sv = jnp.clip((v * RES).astype(I32), 0, RES - 1)
    texel = bm_f32[sv[:, None], su[None, :]]  # (64, 64, 3) nearest gather
    mask = (in_y[:, None] & in_x[None, :])[..., None]
    return jnp.where(mask, texel, 0.0)


def _dynamic_bg(gd, cfg, state, tables):
    """Scrolling tiled bg (starpilot.cpp:110-127); mirrors
    fast2.dynamic_bg_pass for one env."""
    if not cfg.use_backgrounds:
        return jnp.zeros((RES, RES, 3), F32)
    px = _px()
    x0, tile_w, w_total, y0, h = gd.dynamic_bg_rect(cfg, state)
    u_raw = (px - x0) / tile_w
    u = u_raw - jnp.floor(u_raw)
    v = (px - y0) / h
    in_x = (px >= x0) & (px < x0 + w_total)
    in_y = (v >= 0) & (v < 1)
    su = jnp.clip((u * RES).astype(I32), 0, RES - 1)
    sv = jnp.clip((v * RES).astype(I32), 0, RES - 1)
    bm = state.static_layer.astype(F32)  # cached selected bg mip
    texel = bm[sv[:, None], su[None, :]]
    mask = (in_y[:, None] & in_x[None, :])[..., None]
    return jnp.where(mask, texel, 0.0)


# ---------------------------------------------------------------------------
# Grid tiles
# ---------------------------------------------------------------------------


def _pixel_cells(state):
    """Per-pixel world cell indices + within-cell texel coords; mirrors
    fast2._pixel_cells for one env."""
    px = _px()
    wx = (px + state.x_off) / state.unit
    wy = state.view_dim - (px - state.y_off) / state.unit
    cxi = jnp.floor(wx + RENDER_EPS).astype(I32)
    cyi = jnp.floor(wy + RENDER_EPS).astype(I32)
    cu = (wx - (cxi.astype(F32) - RENDER_EPS)) / (1 + 2 * RENDER_EPS)
    cv = ((cyi.astype(F32) + 1 + RENDER_EPS) - wy) / (1 + 2 * RENDER_EPS)
    return cxi, cyi, cu, cv


def _grid(gd, cfg, state, tables, canvas):
    """Grid tiles (bag.cpp:941-955) blended over ``canvas``; the per-pixel
    gather statement of fast2.grid_pass's class-texture formulation."""
    K = tables.K
    n_crect = int(tables.crect_types.shape[0])
    if K == 0 and n_crect == 0:
        return canvas
    R = tables.R
    A = tables.A
    cxi, cyi, cu, cv = _pixel_cells(state)
    in_cx = (cxi >= 0) & (cxi < state.main_width)
    in_cy = (cyi >= 0) & (cyi < state.main_height)

    # class codes, 0 = draw nothing (identical comparison chain to fast2)
    code = jnp.zeros(state.grid.shape, I32)
    for j in range(K):
        code = jnp.where(state.grid == tables.gtypes[j], j + 1, code)
    for j in range(n_crect):
        code = jnp.where(
            state.grid == int(tables.crect_types[j]), K + 1 + j, code
        )
    cell_in = in_cy[:, None] & in_cx[None, :]
    code_pix = jnp.where(
        cell_in,
        code[
            jnp.clip(cyi, 0, state.grid.shape[0] - 1)[:, None],
            jnp.clip(cxi, 0, state.grid.shape[1] - 1)[None, :],
        ],
        0,
    )

    if gd.center_agent(cfg):
        # moving-view window + out-of-bounds cells (bag.cpp:928-939)
        margin = state.visibility / 2 + 1
        low_x = (state.center_x - margin).astype(I32)
        high_x = (state.center_x + margin).astype(I32)
        low_y = (state.center_y - margin).astype(I32)
        high_y = (state.center_y + margin).astype(I32)
        in_wx = (cxi >= low_x) & (cxi <= high_x)
        in_wy = (cyi >= low_y) & (cyi <= high_y)
        in_window = in_wy[:, None] & in_wx[None, :]
        oob_code = jnp.zeros((), I32)
        for j in range(K):
            oob_code = jnp.where(
                state.out_of_bounds_object == tables.gtypes[j], j + 1, oob_code
            )
        code_pix = jnp.where(in_window & ~cell_in, oob_code, code_pix)
        code_pix = jnp.where(in_window, code_pix, 0)

    if K > 0:
        theme = gd.grid_theme_state(cfg, state)
        theme_b = theme.astype(F32) if theme is not None else F32(0)
        var_mips = jnp.asarray(tables.var_flat).reshape(tables.NV, R, R, 4)
        tsu = jnp.clip((jnp.clip(cu, 0.0, 0.9999) * R).astype(I32), 0, R - 1)
        tsv = jnp.clip((jnp.clip(cv, 0.0, 0.9999) * R).astype(I32), 0, R - 1)
        for k in range(K):
            slot = tables.gbases[k] + (
                theme_b if tables.gthemed[k] else F32(0)
            )
            var_id = (slot * A).astype(I32)
            tex = var_mips[var_id]  # (R, R, 4)
            spr = tex[tsv[:, None], tsu[None, :]]  # (64, 64, 4)
            m = (code_pix == (k + 1)).astype(F32)
            a = spr[..., 3] / 255.0 * m
            canvas = spr[..., :3] * a[..., None] + canvas * (1 - a[..., None])

    for j in range(n_crect):
        d = float(tables.crect_dims[j])
        lo, hi = (1 - d) / 2, (1 + d) / 2
        inside = (
            (code_pix == K + 1 + j)
            & (cu >= lo)[None, :]
            & (cu < hi)[None, :]
            & (cv >= lo)[:, None]
            & (cv < hi)[:, None]
        )
        col = jnp.asarray(tables.crect_rgb[j], F32)
        canvas = jnp.where(inside[..., None], col, canvas)
    return canvas


# ---------------------------------------------------------------------------
# Entities
# ---------------------------------------------------------------------------


def _entity_records(gd, cfg, state, tables):
    """Per-entity draw records for one env; mirrors fast2.entity_records'
    field expressions exactly (same ops, same order)."""
    ents = state.ents
    E = ents.x.shape[0]
    A, R = tables.A, tables.R

    dm = gd.entity_draw_mask(cfg, state)
    draw_mask = dm if dm is not None else jnp.ones((E,), jnp.bool_)
    io = gd.entity_image_override(cfg, state)
    img_t = io if io is not None else ents.image_type

    # screen rect (get_object_rect, bag.cpp:811-817)
    unit, view_dim = state.unit, state.view_dim
    abs_c = ents.use_abs_coords
    r_x0 = jnp.where(
        abs_c, view_dim * (ents.x - ents.rx) * unit,
        (ents.x - ents.rx) * unit - state.x_off,
    )
    r_y0 = jnp.where(
        abs_c, view_dim * (ents.y + ents.ry) * unit,
        (view_dim - (ents.y + ents.ry)) * unit + state.y_off,
    )
    r_w = jnp.where(abs_c, 2 * view_dim * ents.rx * unit, 2 * ents.rx * unit)
    r_h = jnp.where(abs_c, 2 * view_dim * ents.ry * unit, 2 * ents.ry * unit)

    mono = cfg.use_monochrome_assets
    adj = None if mono else gd.image_rect_adjust(img_t)
    if adj is not None:
        aox, aoy, asw, ash = adj
        r_x0 = r_x0 + r_w * aox
        r_y0 = r_y0 + r_h * aoy
        r_w = r_w * asw
        r_h = r_h * ash

    # (type, theme) -> variant-atlas base slot
    TI = tables.ent_types.shape[0]
    base = jnp.full((E,), -1.0, F32)
    for j in range(TI):
        base = jnp.where(img_t == tables.ent_types[j], tables.ent_bases[j], base)
    slot = base + ents.image_theme.astype(F32)

    if A > 1:
        bin_ = jnp.mod(
            jnp.round(ents.rotation * F32(A / TWO_PI)).astype(I32), A
        )
    else:
        bin_ = jnp.zeros((E,), I32)
    bin_eff = jnp.where(ents.is_reflected & (A > 1), (A - bin_) % A, bin_)
    cs = jnp.asarray(tables.bin_cs)[bin_]
    c, s = cs[..., 0], cs[..., 1]
    bbw = jnp.abs(c) * r_w + jnp.abs(s) * r_h
    bbh = jnp.abs(s) * r_w + jnp.abs(c) * r_h
    bbx0 = r_x0 + r_w / 2 - bbw / 2
    bby0 = r_y0 + r_h / 2 - bbh / 2

    ratio = None if mono else gd.tile_ratio_for(img_t, ents.rx, ents.ry)
    n_th = jnp.ones((E,), F32)
    n_tv = jnp.ones((E,), F32)
    if ratio is not None:
        unrot = bin_ == 0
        n_th = jnp.where(
            unrot & (ratio > 0),
            jnp.maximum(
                (r_w / (r_h * jnp.abs(ratio) + 1e-9)).astype(I32), 1
            ).astype(F32),
            1.0,
        )
        n_tv = jnp.where(
            unrot & (ratio < 0),
            jnp.maximum(
                (r_h / (r_w * jnp.abs(ratio) + 1e-9)).astype(I32), 1
            ).astype(F32),
            1.0,
        )

    ok = ents.alive & draw_mask & (base >= 0)
    var = slot * A + bin_eff.astype(F32)
    alpha = jnp.ones_like(ents.alpha) if mono else ents.alpha
    refl = (
        jnp.zeros_like(ents.is_reflected.astype(F32))
        if mono
        else ents.is_reflected.astype(F32)
    )
    rec = jnp.stack(
        [
            bbx0, bby0, jnp.maximum(bbw, 1e-6), jnp.maximum(bbh, 1e-6),
            var, refl, alpha,
            ok.astype(F32), n_th, n_tv, ents.render_z.astype(F32),
        ],
        axis=-1,
    )  # (E, F)
    # z passes -1/0/1 in slot order, non-drawable last (bag.cpp:957-958)
    zb = jnp.clip(ents.render_z, -1, 1) + 1
    key = jnp.where(ok, zb * E + jnp.arange(E), 4 * E + jnp.arange(E))
    return rec[jnp.argsort(key)]


def _composite(tables, records, canvas, z_filter="all"):
    """Z-ordered nearest-sampled premultiplied blend of entity records;
    the per-entity gather statement of fast2.composite_entities."""
    E = records.shape[0]
    R = tables.R
    px = _px()
    var_mips = jnp.asarray(tables.var_flat).reshape(tables.NV, R, R, 4)

    def draw_one(k, canvas):
        rec = records[k]
        g = lambda f: rec[_RF[f]]
        ok = g("ok") > 0
        if z_filter == "neg":
            ok = ok & (g("z") < 0)
        elif z_filter == "nonneg":
            ok = ok & (g("z") >= 0)
        col = (px - g("bbx0")) / g("bbw")
        row = (px - g("bby0")) / g("bbh")
        in_x = (col >= 0) & (col < 1)
        in_y = (row >= 0) & (row < 1)
        uraw = col * g("n_th")
        u = jnp.where(g("n_th") > 1, uraw - jnp.floor(uraw), col)
        vraw = row * g("n_tv")
        v = jnp.where(g("n_tv") > 1, vraw - jnp.floor(vraw), row)
        su = jnp.clip((jnp.clip(u, 0.0, 0.9999) * R).astype(I32), 0, R - 1)
        sv = jnp.clip((jnp.clip(v, 0.0, 0.9999) * R).astype(I32), 0, R - 1)
        su = jnp.where(g("refl") > 0, R - 1 - su, su)
        tex = var_mips[g("var").astype(I32)]  # (R, R, 4)
        # premultiplied texels (the einsum/pallas paths' tex_p), rounded to
        # bf16 -- the MXU-native dtype -- ON EVERY BACKEND, so observations
        # are identical on CPU and TPU (opaque texels are integers <= 255
        # and exact; only partially-transparent sprite edges round)
        a_tex = tex[..., 3:4] * (g("alpha") / 255.0)
        tex_p = jnp.concatenate([tex[..., :3] * a_tex, a_tex], axis=-1)
        tex_p = tex_p.astype(jnp.bfloat16).astype(F32)
        spr = tex_p[sv[:, None], su[None, :]]  # (64, 64, 4)
        mask = (in_y[:, None] & in_x[None, :] & ok)[..., None]
        spr = jnp.where(mask, spr, 0.0)
        return spr[..., :3] + canvas * (1 - spr[..., 3:])

    return jax.lax.fori_loop(0, E, draw_one, canvas)


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------


def oracle_static(gd, cfg, state, pack) -> jax.Array:
    """Per-level static layer for one env -> (64, 64, 3) uint8; the scalar
    statement of fast2.render_static2."""
    from procgen_tpu.engine.base import GameDef as _GD

    tables = fast2.get_tables(gd, cfg, pack)
    dyn_bg = type(gd).dynamic_background is not _GD.dynamic_background
    bm = jnp.asarray(tables.bg_mip)[state.background_index].astype(F32)
    if gd.center_agent(cfg) or dyn_bg:
        return jnp.clip(bm + 0.5, 0, 255).astype(jnp.uint8)
    canvas = _bg(gd, cfg, state, tables, bm)
    if not getattr(gd, "grid_dynamic", False):
        canvas = _grid(gd, cfg, state, tables, canvas)
    return jnp.clip(canvas + 0.5, 0, 255).astype(jnp.uint8)


def oracle_obs(gd, cfg, state, pack) -> jax.Array:
    """One env's observation -> (64, 64, 3) uint8.  The specification the
    batched einsum path and the Pallas TPU kernel are tested against."""
    from procgen_tpu.engine.base import GameDef as _GD
    from procgen_tpu.render.renderer import _paint_hud, _paint_vel_info

    tables = fast2.get_tables(gd, cfg, pack)
    dyn_bg = type(gd).dynamic_background is not _GD.dynamic_background
    grid_dyn = bool(getattr(gd, "grid_dynamic", False))
    center = gd.center_agent(cfg)

    if dyn_bg:
        canvas = _dynamic_bg(gd, cfg, state, tables)
    elif center:
        canvas = _bg(gd, cfg, state, tables, state.static_layer.astype(F32))
    else:
        canvas = state.static_layer.astype(F32)

    records = _entity_records(gd, cfg, state, tables)
    if grid_dyn:
        canvas = _composite(tables, records, canvas, "neg")
        canvas = _grid(gd, cfg, state, tables, canvas)
        canvas = _composite(tables, records, canvas, "nonneg")
    elif center and not dyn_bg:
        canvas = _grid(gd, cfg, state, tables, canvas)
        canvas = _composite(tables, records, canvas)
    else:
        canvas = _composite(tables, records, canvas)

    canvas = _paint_vel_info(gd, cfg, state, canvas)
    canvas = _paint_hud(gd, cfg, state, canvas)
    return jnp.clip(canvas + 0.5, 0, 255).astype(jnp.uint8)
