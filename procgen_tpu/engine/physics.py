"""Sub-stepped continuous-collision physics (BasicAbstractGame core).

Behavioral counterpart of basic-abstract-game.cpp:240-372 (sub_step/push_obj),
:593-656 (basic_step_object) and :1086-1098 (step_entities), written per-env
and lifted over envs with vmap.

Order-sensitivity contract (bag.cpp:1086-1097): entities step in *reverse*
slot order.  Because the agent is always slot 0 it steps last.  For games
where the agent is the only ``smart_step`` entity (``gd.agent_only_smart``)
the non-smart Euler updates commute, so they run as one vector op and only
the agent takes the sequential sub-step path -- exact and fast.  Games with
smart enemies use the general reverse-loop path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu import fmath as fm
from procgen_tpu import objects as O
from procgen_tpu.engine import entity_ops as eo
from procgen_tpu.state import F32, I32, EnvState

POS_EPS = np.float32(-0.001)  # bag.cpp:10
SUB_STEP_MARGIN = np.float32(0.98)  # bag.cpp:276


# ---------------------------------------------------------------------------
# Grid access
# ---------------------------------------------------------------------------


def get_obj(state: EnvState, x, y):
    """bag.cpp:180-185: out_of_bounds_object outside [0,w)x[0,h).

    Implemented as a one-hot dot (not ``grid[y, x]``): under vmap the
    indexed read lowers to a TPU gather that executes row-at-a-time
    (~0.2us/row on v5e -- the profiling that shaped render/fast2).  The
    einsum is exact (grid values <= 1103 < 2^24, one product per output)
    and rides the MXU.  Accepts scalar or any-shaped ``x``/``y``."""
    x = jnp.asarray(x, I32)
    y = jnp.asarray(y, I32)
    H, W = state.grid.shape
    ohy = (y[..., None] == jnp.arange(H)).astype(F32)
    ohx = (x[..., None] == jnp.arange(W)).astype(F32)
    val = jnp.einsum(
        "...h,hw,...w->...", ohy, state.grid.astype(F32), ohx,
        preferred_element_type=jnp.float32,
    ).astype(I32)
    inside = (x >= 0) & (x < state.main_width) & (y >= 0) & (y < state.main_height)
    return jnp.where(inside, val, state.out_of_bounds_object)


def get_obj_from_floats(state: EnvState, fx, fy):
    """bag.cpp:167-174: negative floats -> OOB, else floor to cell."""
    neg = (fx < 0) | (fy < 0)
    val = get_obj(state, jnp.floor(fx).astype(I32), jnp.floor(fy).astype(I32))
    return jnp.where(neg, state.out_of_bounds_object, val)


def set_obj(state: EnvState, x, y, obj) -> EnvState:
    return state.replace(
        grid=state.grid.at[jnp.asarray(y, I32), jnp.asarray(x, I32)].set(
            jnp.asarray(obj, I32)
        )
    )


# ---------------------------------------------------------------------------
# sub_step
# ---------------------------------------------------------------------------


def sub_step(gd, cfg, state: EnvState, idxs, _vx, _vy, active):
    """One axis-separated sub-step (bag.cpp:270-372) for entity slots
    ``idxs`` (M,), all at once.  Returns (state, blocked (M,)).

    Exactness vs the reference's sequential reverse-order sweep
    (bag.cpp:1086-1097): no ported game lets one smart (sub-stepping) entity
    block, reflect off, or push another smart entity -- every blocker
    (crates, locked doors, barriers, lava walls) is a non-smart entity or a
    grid cell, and non-smart positions are fixed during the smart phase --
    so the M movers are independent and stepping them simultaneously is
    bit-equivalent.  Audited per game in step_entities' docstring.

    Entity *pushing* (push_obj, bag.cpp:240-268) keeps its two forms gated
    on gd.uses_entity_push: a vectorized all-blockers pass and a sequential
    blocker sweep (as a lax.scan over slot-sliced fields, gather-free) when
    combined with reflection; push recursion beyond depth 1 is elided.
    """
    ents = state.ents
    E = ents.capacity
    M = idxs.shape[0]
    obj = eo.read_slots(
        ents, idxs, ("x", "y", "vx", "vy", "rx", "ry", "type", "will_erase")
    )
    active = jnp.logical_and(active, ~obj["will_erase"])

    # "nx = obj->x + _vx" (bag.cpp:274-275): _vx is the vx*pct product from
    # the caller, so the add must round SEPARATELY from the product (no FMA
    # on ivybridge) -- the unpinned contraction was the 1-ulp agent-x drift
    # in bossfight/dodgeball's r5 1000-step sweep
    nx = fm.fadd32(cfg, obj["x"], _vx)
    ny = fm.fadd32(cfg, obj["y"], _vy)
    is_horizontal = _vx != 0  # (M,)

    # 4 corner probes at +-0.98*r (bag.cpp:276) in one one-hot grid dot
    di = jnp.asarray([-1.0, -1.0, 1.0, 1.0], F32)[:, None]
    dj = jnp.asarray([-1.0, 1.0, -1.0, 1.0], F32)[:, None]
    px = nx[None, :] + obj["rx"][None, :] * SUB_STEP_MARGIN * di  # (4, M)
    py = ny[None, :] + obj["ry"][None, :] * SUB_STEP_MARGIN * dj
    t2 = get_obj_from_floats(state, px, py)  # (4, M)
    block = jnp.any(
        gd.is_blocked(cfg, state, obj["type"][None, :], t2, is_horizontal[None, :]),
        axis=0,
    )
    reflect = jnp.any(
        gd.will_reflect(cfg, state, obj["type"][None, :], t2), axis=0
    )

    # Reflection off grid (bag.cpp:292-315)
    delta_x = jnp.where(
        _vx < 0,
        jnp.ceil(nx - obj["rx"]) - (nx - obj["rx"]),
        jnp.floor(nx + obj["rx"]) - (nx + obj["rx"]),
    )
    delta_y = jnp.where(
        _vy < 0,
        jnp.ceil(ny - obj["ry"]) - (ny - obj["ry"]),
        jnp.floor(ny + obj["ry"]) - (ny + obj["ry"]),
    )
    refl_x = jnp.where(is_horizontal, nx + 2 * delta_x, nx)
    refl_y = jnp.where(is_horizontal, ny, ny + 2 * delta_y)

    # Blocking clamp (bag.cpp:316-330)
    clamp_x = jnp.where(
        state.grid_step,
        obj["x"],
        jnp.where(
            _vx > 0,
            jnp.floor(nx + obj["rx"]) - obj["rx"],
            jnp.ceil(nx - obj["rx"]) + obj["rx"],
        ),
    )
    clamp_y = jnp.where(
        state.grid_step,
        obj["y"],
        jnp.where(
            _vy > 0,
            jnp.floor(ny + obj["ry"]) - obj["ry"],
            jnp.ceil(ny - obj["ry"]) + obj["ry"],
        ),
    )

    do_reflect = reflect
    do_block = jnp.logical_and(block, ~reflect)
    nx = jnp.where(do_reflect, refl_x, jnp.where(do_block & is_horizontal, clamp_x, nx))
    ny = jnp.where(do_reflect, refl_y, jnp.where(do_block & ~is_horizontal, clamp_y, ny))
    nvx = jnp.where(do_reflect & is_horizontal, -obj["vx"], obj["vx"])
    nvy = jnp.where(do_reflect & ~is_horizontal, -obj["vy"], obj["vy"])

    if gd.block_zeroes_velocity_types:
        # ninja's is_blocked zeroes throwing-star velocity as a side effect
        # when a wall probe hits (ninja.cpp:139-152): both components stop.
        zmask = jnp.zeros((M,), jnp.bool_)
        for t_ in gd.block_zeroes_velocity_types:
            zmask = zmask | (obj["type"] == t_)
        stopped = block & zmask & active
        nvx = jnp.where(stopped, 0.0, nvx)
        nvy = jnp.where(stopped, 0.0, nvy)

    # --- entity interactions (bag.cpp:335-369) ---
    block2 = jnp.zeros((M,), jnp.bool_)
    marange = jnp.arange(E)
    not_self = marange[None, :] != idxs[:, None]  # (M, E)
    tgt_all = {
        "type": ents.type[None, :],
        "image_theme": ents.image_theme[None, :],
        "y": ents.y[None, :],
        "ry": ents.ry[None, :],
    }
    if gd.uses_entity_push and not gd.uses_entity_reflect:
        # Vectorized push/block: all blockers tested at once; the clamp is
        # taken from the lowest-index blocker, which is what the reference's
        # descending sweep leaves last (simultaneous multi-blocker overlaps
        # beyond that -- stacked crates sharing a top edge -- clamp to the
        # same boundary, so the outcome matches).
        valid = (ents.alive & ~ents.will_erase)[None, :] & not_self
        coll = (
            (jnp.abs(nx[:, None] - ents.x[None, :])
             < obj["rx"][:, None] + ents.rx[None, :] + POS_EPS)
            & (jnp.abs(ny[:, None] - ents.y[None, :])
               < obj["ry"][:, None] + ents.ry[None, :] + POS_EPS)
        )
        hit = valid & coll
        blocked_mat = hit & gd.is_blocked_ents_vals(
            cfg, state, obj["type"][:, None], tgt_all, is_horizontal[:, None]
        )  # (M, E)
        block2 = jnp.any(blocked_mat, axis=1)
        m = jnp.argmin(
            jnp.where(blocked_mat, marange[None, :], E), axis=1
        )
        mc = jnp.clip(m, 0, E - 1)
        blk = eo.read_slots(ents, mc, ("x", "y", "rx", "ry"))
        rsx = blk["rx"] + obj["rx"]
        rsy = blk["ry"] + obj["ry"]
        push_dx = blk["x"] + fm.fsign(nx - blk["x"]) * rsx - nx
        push_dy = blk["y"] + fm.fsign(ny - blk["y"]) * rsy - ny
        pxp = nx + jnp.where(is_horizontal, push_dx, 0.0)
        pyp = ny + jnp.where(is_horizontal, 0.0, push_dy)
        cpx = pxp[None, :] + obj["rx"][None, :] * SUB_STEP_MARGIN * di
        cpy = pyp[None, :] + obj["ry"][None, :] * SUB_STEP_MARGIN * dj
        t3 = get_obj_from_floats(state, cpx, cpy)
        gblock = jnp.any(
            gd.is_blocked(
                cfg, state, obj["type"][None, :], t3, is_horizontal[None, :]
            ),
            axis=0,
        )
        pcl_x = jnp.where(
            push_dx > 0,
            jnp.floor(pxp + obj["rx"]) - obj["rx"],
            jnp.ceil(pxp - obj["rx"]) + obj["rx"],
        )
        pcl_y = jnp.where(
            push_dy > 0,
            jnp.floor(pyp + obj["ry"]) - obj["ry"],
            jnp.ceil(pyp - obj["ry"]) + obj["ry"],
        )
        pcl_x = jnp.where(state.grid_step, nx, pcl_x)
        pcl_y = jnp.where(state.grid_step, ny, pcl_y)
        pxp = jnp.where(gblock & is_horizontal, pcl_x, pxp)
        pyp = jnp.where(gblock & ~is_horizontal, pcl_y, pyp)
        appb = block2 & active
        nx = jnp.where(appb, pxp, nx)
        ny = jnp.where(appb, pyp, ny)
        nvx = jnp.where(appb & is_horizontal, 0.0, nvx)
        nvy = jnp.where(appb & ~is_horizontal, 0.0, nvy)
        state = gd.note_entity_blocks(
            cfg, state, idxs, blocked_mat & active[:, None], is_horizontal
        )
    elif gd.uses_entity_reflect or gd.uses_entity_push:
        # Sequential reverse sweep: each reflection/push moves the object
        # before the next (lower-index) entity is tested (bag.cpp:337-369).
        # lax.scan over slot-sliced blocker fields: leading-axis slicing is
        # gather-free; the carry is only the (M,) mover coordinates.
        rev = jnp.arange(E - 1, -1, -1)
        xs = {
            "m": rev,
            "x": ents.x[rev], "y": ents.y[rev],
            "rx": ents.rx[rev], "ry": ents.ry[rev],
            "type": ents.type[rev],
            "image_theme": ents.image_theme[rev],
            "ok": (ents.alive & ~ents.will_erase)[rev],
        }

        def body(carry, b):
            nx, ny, nvx, nvy, block2 = carry
            valid = b["ok"] & (b["m"] != idxs)  # (M,)
            coll = (
                (jnp.abs(nx - b["x"]) < obj["rx"] + b["rx"] + POS_EPS)
                & (jnp.abs(ny - b["y"]) < obj["ry"] + b["ry"] + POS_EPS)
            )
            hit = valid & coll
            tgt = {
                "type": b["type"], "image_theme": b["image_theme"],
                "y": b["y"], "ry": b["ry"],
            }
            blocked_m = hit & gd.is_blocked_ents_vals(
                cfg, state, obj["type"], tgt, is_horizontal
            )
            refl_m = (
                hit
                & ~blocked_m
                & gd.will_reflect(cfg, state, obj["type"], b["type"])
            )
            delx = b["x"] - nx
            dely = b["y"] - ny
            rsx = b["rx"] + obj["rx"]
            rsy = b["ry"] + obj["ry"]
            bounce_dx = jnp.where(_vx > 0, -2 * (rsx - delx), 2 * (rsx + delx))
            bounce_dy = jnp.where(_vy > 0, -2 * (rsy - dely), 2 * (rsy + dely))
            app = refl_m & active
            nx = jnp.where(app & is_horizontal, nx + bounce_dx, nx)
            ny = jnp.where(app & ~is_horizontal, ny + bounce_dy, ny)
            nvx = jnp.where(app & is_horizontal, -nvx, nvx)
            nvy = jnp.where(app & ~is_horizontal, -nvy, nvy)

            if gd.uses_entity_push:
                # push_obj (bag.cpp:240-268): clamp along the move axis and
                # zero the velocity component; depth >= 2 recursion elided.
                push_dx = b["x"] + fm.fsign(nx - b["x"]) * rsx - nx
                push_dy = b["y"] + fm.fsign(ny - b["y"]) * rsy - ny
                pxp = nx + jnp.where(is_horizontal, push_dx, 0.0)
                pyp = ny + jnp.where(is_horizontal, 0.0, push_dy)
                cpx = pxp[None, :] + obj["rx"][None, :] * SUB_STEP_MARGIN * di
                cpy = pyp[None, :] + obj["ry"][None, :] * SUB_STEP_MARGIN * dj
                t3 = get_obj_from_floats(state, cpx, cpy)
                gblock = jnp.any(
                    gd.is_blocked(
                        cfg, state, obj["type"][None, :], t3,
                        is_horizontal[None, :],
                    ),
                    axis=0,
                )
                pcl_x = jnp.where(
                    push_dx > 0,
                    jnp.floor(pxp + obj["rx"]) - obj["rx"],
                    jnp.ceil(pxp - obj["rx"]) + obj["rx"],
                )
                pcl_y = jnp.where(
                    push_dy > 0,
                    jnp.floor(pyp + obj["ry"]) - obj["ry"],
                    jnp.ceil(pyp - obj["ry"]) + obj["ry"],
                )
                pcl_x = jnp.where(state.grid_step, nx, pcl_x)
                pcl_y = jnp.where(state.grid_step, ny, pcl_y)
                pxp = jnp.where(gblock & is_horizontal, pcl_x, pxp)
                pyp = jnp.where(gblock & ~is_horizontal, pcl_y, pyp)
                appb = blocked_m & active
                nx = jnp.where(appb, pxp, nx)
                ny = jnp.where(appb, pyp, ny)
                nvx = jnp.where(appb & is_horizontal, 0.0, nvx)
                nvy = jnp.where(appb & ~is_horizontal, 0.0, nvy)

            block2 = block2 | blocked_m
            return (nx, ny, nvx, nvy, block2), blocked_m

        (nx, ny, nvx, nvy, block2), blocked_rev = jax.lax.scan(
            body, (nx, ny, nvx, nvy, block2), xs
        )
        blocked_mat = blocked_rev[::-1].T & active[:, None]  # (M, E)
        state = gd.note_entity_blocks(cfg, state, idxs, blocked_mat, is_horizontal)
    else:
        # No game callback can block/reflect on entities: default
        # is_blocked_ents == is_blocked(type), which only triggers for
        # WALL_OBJ-typed entities -- declared per game via uses_entity_block.
        if gd.uses_entity_block:
            coll = (
                (jnp.abs(nx[:, None] - ents.x[None, :])
                 < obj["rx"][:, None] + ents.rx[None, :] + POS_EPS)
                & (jnp.abs(ny[:, None] - ents.y[None, :])
                   < obj["ry"][:, None] + ents.ry[None, :] + POS_EPS)
            )
            valid = (ents.alive & ~ents.will_erase)[None, :] & not_self
            blocked_mat = valid & coll & gd.is_blocked_ents(
                cfg, state, obj["type"][:, None], ents.type[None, :],
                is_horizontal[:, None],
            )
            block2 = jnp.any(blocked_mat, axis=1)

    ents = eo.write_slots_masked(
        state.ents, idxs, active, x=nx, y=ny, vx=nvx, vy=nvy
    )
    return state.replace(ents=ents), jnp.logical_and(active, block | block2)


def basic_step_object(gd, cfg, state: EnvState, idxs, active=None) -> EnvState:
    """bag.cpp:593-656 for entity slots ``idxs`` (M,), stepped together
    (see sub_step's exactness note; per-entity substep counts and axis
    ordering are preserved per slot)."""
    idxs = jnp.asarray(idxs, I32)
    M = idxs.shape[0]
    if active is None:
        active = jnp.ones((M,), jnp.bool_)
    ents = state.ents
    obj0 = eo.read_slots(ents, idxs, ("vx", "vy", "type", "will_erase"))
    vx0, vy0 = obj0["vx"], obj0["vy"]
    active = jnp.logical_and(active, ~obj0["will_erase"])

    # "int(4 * sqrt(vx*vx + vy*vy))": the squares/sum are f32, sqrt is the
    # DOUBLE overload, and "4 * ..." stays double before the int truncation
    # (bag.cpp:601); "float pct = 1.0 / num_sub_steps" is a double division
    # narrowed on assignment (bag.cpp:606).
    s2 = vx0 * vx0 + vy0 * vy0
    if cfg.parity_mode:
        nss_f = (4 * jnp.sqrt(s2.astype(jnp.float64))).astype(I32)
    else:
        nss_f = (4 * jnp.sqrt(s2)).astype(I32)
    nss = jnp.maximum(nss_f, 4)
    nss = jnp.where(state.grid_step, 1, nss)
    nss = jnp.minimum(nss, gd.max_substeps)  # static safety cap
    if cfg.parity_mode:
        pct = (1.0 / nss.astype(jnp.float64)).astype(F32)
    else:
        pct = (1.0 / nss).astype(F32)

    cmp = jnp.abs(vx0) - jnp.abs(vy0)
    step_x_first = jnp.where(cmp == 0, state.step_rand_int % 2 == 0, cmp > 0)
    is_player = obj0["type"] == O.PLAYER
    step_x_first = jnp.where(is_player & (state.action_vx != 0), True, step_x_first)
    step_x_first = jnp.where(is_player & (state.action_vy != 0), False, step_x_first)

    def body(s, carry):
        state, vx_pct, vy_pct, broke = carry
        act = active & (s < nss) & ~broke
        cur = eo.read_slots(state.ents, idxs, ("vx", "vy"))
        vx = cur["vx"] * pct
        vy = cur["vy"] * pct
        # First pass moves along x if step_x_first else y; second the other.
        a1x = jnp.where(step_x_first, vx, 0.0)
        a1y = jnp.where(step_x_first, 0.0, vy)
        state, b1 = sub_step(gd, cfg, state, idxs, a1x, a1y, act)
        # The reference evaluates "obj->vx * pct" AT EACH sub_step CALL
        # (bag.cpp:634-638), so a first-axis side effect that rewrites the
        # velocity -- ninja's is_blocked zeroing a star's vx/vy on a wall
        # probe (ninja.cpp:143-147), or a reflect negation -- must be
        # visible to the second axis within the SAME sub-step.  Re-read.
        cur2 = eo.read_slots(state.ents, idxs, ("vx", "vy"))
        a2x = jnp.where(step_x_first, 0.0, cur2["vx"] * pct)
        a2y = jnp.where(step_x_first, cur2["vy"] * pct, 0.0)
        state, b2 = sub_step(gd, cfg, state, idxs, a2x, a2y, act)
        block_x = jnp.where(step_x_first, b1, b2)
        block_y = jnp.where(step_x_first, b2, b1)
        vx_pct = vx_pct + jnp.where(act & ~block_x, 1.0, 0.0)
        vy_pct = vy_pct + jnp.where(act & ~block_y, 1.0, 0.0)
        broke = broke | (block_x & block_y)
        return state, vx_pct, vy_pct, broke

    zero = jnp.zeros((M,), F32)
    state, vx_pct, vy_pct, _ = jax.lax.fori_loop(
        0, gd.max_substeps, body,
        (state, zero, zero, jnp.zeros((M,), jnp.bool_)),
    )
    nss_f32 = nss.astype(F32)
    cur = eo.read_slots(state.ents, idxs, ("vx", "vy"))
    # "vx_pct / num_sub_steps" is an IEEE f32 division (bag.cpp:651-652);
    # XLA's reciprocal-based divide is 1 ulp off for some quotients
    new_vx = cur["vx"] * fm.fdiv(cfg, vx_pct, nss_f32)
    new_vy = cur["vy"] * fm.fdiv(cfg, vy_pct, nss_f32)
    ents = eo.write_slots_masked(state.ents, idxs, active, vx=new_vx, vy=new_vy)
    return state.replace(ents=ents)


def entity_euler_step_all(ents, mask):
    """Entity::step (entity.cpp:57-82) vectorized over masked slots."""
    move = mask & ~ents.smart_step
    x = jnp.where(move, ents.x + ents.vx, ents.x)
    y = jnp.where(move, ents.y + ents.vy, ents.y)
    rotation = jnp.where(mask, ents.rotation + ents.vrot, ents.rotation)
    vx = jnp.where(mask, ents.vx * ents.friction, ents.vx)
    vy = jnp.where(mask, ents.vy * ents.friction, ents.vy)
    life_time = jnp.where(mask, ents.life_time + 1, ents.life_time)
    expired = mask & (ents.expire_time > 0) & (life_time > ents.expire_time)
    will_erase = ents.will_erase | expired
    bump = mask & (ents.type == O.EXPLOSION) & (ents.image_type < O.EXPLOSION5)
    image_type = jnp.where(bump, ents.image_type + 1, ents.image_type)
    rx = jnp.where(mask, ents.rx * ents.grow_rate, ents.rx)
    ry = jnp.where(mask, ents.ry * ents.grow_rate, ents.ry)
    alpha = jnp.where(mask, ents.alpha_decay * ents.alpha, ents.alpha)
    return ents.replace(
        x=x, y=y, rotation=rotation, vx=vx, vy=vy, life_time=life_time,
        will_erase=will_erase, image_type=image_type, rx=rx, ry=ry, alpha=alpha,
    )


def step_entities(gd, cfg, state: EnvState) -> EnvState:
    """bag.cpp:1086-1098 over the whole table.

    Non-smart entities Euler-step as one vector op (their updates commute
    and they never move as blockers mid-phase).  All smart entities then
    sub-step TOGETHER via the vectorized basic_step_object -- exact because
    no ported game has smart-vs-smart blocking/reflection/pushing:
      coinrun   agent/enemies block on crates (non-smart) + grid
      heist     agent blocks on doors/walls (non-smart) + grid
      dodgeball enemies reflect off lava-wall entities (non-smart)
      chaser/climber/ninja/caveflyer: grid blocking only
      all others: no entity interactions in the move phase
    The reference's reverse slot order therefore has no observable effect.
    """
    ents = state.ents
    if gd.agent_only_smart:
        # Slots E-1..1 are non-smart: their Euler updates commute, one vector
        # op.  Agent (slot 0, stepped last in the reference's reverse loop)
        # then takes the sub-step path against the updated positions.
        others = ents.alive & (jnp.arange(ents.capacity) != eo.AGENT)
        state = state.replace(ents=entity_euler_step_all(ents, others))
        state = basic_step_object(gd, cfg, state, jnp.asarray([eo.AGENT], I32))
        agent_mask = jnp.zeros((ents.capacity,), jnp.bool_).at[eo.AGENT].set(True)
        state = state.replace(
            ents=entity_euler_step_all(state.ents, agent_mask & state.ents.alive)
        )
        return state

    E = ents.capacity
    M = min(gd.max_smart_entities or E, E)
    nonsmart = ents.alive & ~ents.smart_step
    state = state.replace(ents=entity_euler_step_all(ents, nonsmart))

    slot = jnp.arange(E)
    smart_alive = state.ents.alive & state.ents.smart_step
    key = jnp.where(smart_alive, E - 1 - slot, 2 * E)  # descending slots first
    order = jnp.argsort(key)[:M].astype(I32)
    n_smart = jnp.sum(smart_alive.astype(jnp.int32))
    act = jnp.arange(M) < n_smart

    state = basic_step_object(gd, cfg, state, order, active=act)
    state = state.replace(
        ents=entity_euler_step_all(state.ents, smart_alive)
    )
    return state


def check_grid_collisions(gd, cfg, state: EnvState, idx, active=True) -> EnvState:
    """bag.cpp:145-165 for smart entity ``idx``: dispatch game handler over
    the <=4 overlapped cells in reference order (x asc outer, y asc inner).
    ``active`` gates the dispatch (threaded into the handler's valid mask so
    callers never need a whole-state select)."""
    ents = state.ents
    ax, ay = ents.x[idx], ents.y[idx]
    arx, ary = ents.rx[idx], ents.ry[idx]
    min_x = (ax - (arx + POS_EPS)).astype(I32)  # int() truncates toward zero
    max_x = (ax + (arx + POS_EPS)).astype(I32)
    min_y = (ay - (ary + POS_EPS)).astype(I32)
    max_y = (ay + (ary + POS_EPS)).astype(I32)
    for cx, cy, extra_valid in (
        (min_x, min_y, None),
        (min_x, max_y, max_y != min_y),
        (max_x, min_y, max_x != min_x),
        (max_x, max_y, (max_x != min_x) & (max_y != min_y)),
    ):
        # get_obj_from_floats on int coords: negative -> OOB object.
        neg = (cx < 0) | (cy < 0)
        t = jnp.where(neg, state.out_of_bounds_object, get_obj(state, cx, cy))
        valid = (t != O.SPACE) & jnp.asarray(active)
        if extra_valid is not None:
            valid = valid & extra_valid
        state = gd.handle_grid_collision(cfg, state, idx, t, cx, cy, valid)
    return state
