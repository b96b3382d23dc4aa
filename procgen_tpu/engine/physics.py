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

from procgen_tpu import objects as O
from procgen_tpu.engine import entity_ops as eo
from procgen_tpu.state import F32, I32, EnvState

POS_EPS = jnp.float32(-0.001)  # bag.cpp:10
SUB_STEP_MARGIN = jnp.float32(0.98)  # bag.cpp:276


# ---------------------------------------------------------------------------
# Grid access
# ---------------------------------------------------------------------------


def get_obj(state: EnvState, x, y):
    """bag.cpp:180-185: out_of_bounds_object outside [0,w)x[0,h)."""
    x = jnp.asarray(x, I32)
    y = jnp.asarray(y, I32)
    inside = (x >= 0) & (x < state.main_width) & (y >= 0) & (y < state.main_height)
    xc = jnp.clip(x, 0, state.grid.shape[1] - 1)
    yc = jnp.clip(y, 0, state.grid.shape[0] - 1)
    return jnp.where(inside, state.grid[yc, xc], state.out_of_bounds_object)


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


def sub_step(gd, cfg, state: EnvState, idx, _vx, _vy, active):
    """One axis-separated sub-step of entity ``idx`` (bag.cpp:270-372).

    Returns (state, blocked).  ``active`` gates all writes (per-env masking
    for envs/iterations that broke out of the substep loop).

    Entity *pushing* (push_obj, bag.cpp:240-268) is implemented below in two
    forms gated on gd.uses_entity_push: a vectorized all-blockers pass and a
    sequential reverse sweep when combined with reflection; push recursion
    beyond depth 1 (a pushed blocker pushing a third entity) is elided.
    """
    ents = state.ents
    obj = {k: getattr(ents, k)[idx] for k in ("x", "y", "vx", "vy", "rx", "ry", "type", "will_erase")}
    active = jnp.logical_and(active, ~obj["will_erase"])

    nx = obj["x"] + _vx
    ny = obj["y"] + _vy
    is_horizontal = _vx != 0

    block = jnp.asarray(False)
    reflect = jnp.asarray(False)
    for i in (0, 1):
        for j in (0, 1):
            px = nx + obj["rx"] * SUB_STEP_MARGIN * (2 * i - 1)
            py = ny + obj["ry"] * SUB_STEP_MARGIN * (2 * j - 1)
            t2 = get_obj_from_floats(state, px, py)
            block = block | gd.is_blocked(cfg, state, obj["type"], t2, is_horizontal)
            reflect = reflect | gd.will_reflect(cfg, state, obj["type"], t2)

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
        zmask = jnp.asarray(False)
        for t_ in gd.block_zeroes_velocity_types:
            zmask = zmask | (obj["type"] == t_)
        stopped = block & zmask & active
        nvx = jnp.where(stopped, 0.0, nvx)
        nvy = jnp.where(stopped, 0.0, nvy)

    # --- entity interactions (bag.cpp:335-369) ---
    block2 = jnp.asarray(False)
    if gd.uses_entity_push and not gd.uses_entity_reflect:
        # Vectorized push/block: all blockers tested at once; the clamp is
        # taken from the lowest-index blocker, which is what the reference's
        # descending sweep leaves last (simultaneous multi-blocker overlaps
        # beyond that -- stacked crates sharing a top edge -- clamp to the
        # same boundary, so the outcome matches).
        E = ents.capacity
        marange = jnp.arange(E)
        valid = ents.alive & (marange != idx) & ~ents.will_erase
        coll = (
            (jnp.abs(nx - ents.x) < obj["rx"] + ents.rx + POS_EPS)
            & (jnp.abs(ny - ents.y) < obj["ry"] + ents.ry + POS_EPS)
        )
        hit = valid & coll
        blocked_vec = hit & gd.is_blocked_ents_at(
            cfg, state, obj["type"], marange, is_horizontal
        )
        block2 = jnp.any(blocked_vec)
        m = jnp.argmin(jnp.where(blocked_vec, marange, E))
        mc = jnp.clip(m, 0, E - 1)
        rsx = ents.rx[mc] + obj["rx"]
        rsy = ents.ry[mc] + obj["ry"]
        push_dx = ents.x[mc] + jnp.sign(nx - ents.x[mc]) * rsx - nx
        push_dy = ents.y[mc] + jnp.sign(ny - ents.y[mc]) * rsy - ny
        px = nx + jnp.where(is_horizontal, push_dx, 0.0)
        py = ny + jnp.where(is_horizontal, 0.0, push_dy)
        gblock = jnp.asarray(False)
        for ii in (0, 1):
            for jj in (0, 1):
                cpx = px + obj["rx"] * SUB_STEP_MARGIN * (2 * ii - 1)
                cpy = py + obj["ry"] * SUB_STEP_MARGIN * (2 * jj - 1)
                t3 = get_obj_from_floats(state, cpx, cpy)
                gblock = gblock | gd.is_blocked(
                    cfg, state, obj["type"], t3, is_horizontal
                )
        pcl_x = jnp.where(
            push_dx > 0,
            jnp.floor(px + obj["rx"]) - obj["rx"],
            jnp.ceil(px - obj["rx"]) + obj["rx"],
        )
        pcl_y = jnp.where(
            push_dy > 0,
            jnp.floor(py + obj["ry"]) - obj["ry"],
            jnp.ceil(py - obj["ry"]) + obj["ry"],
        )
        pcl_x = jnp.where(state.grid_step, nx, pcl_x)
        pcl_y = jnp.where(state.grid_step, ny, pcl_y)
        px = jnp.where(gblock & is_horizontal, pcl_x, px)
        py = jnp.where(gblock & ~is_horizontal, pcl_y, py)
        appb = block2 & active
        nx = jnp.where(appb, px, nx)
        ny = jnp.where(appb, py, ny)
        nvx = jnp.where(appb & is_horizontal, 0.0, nvx)
        nvy = jnp.where(appb & ~is_horizontal, 0.0, nvy)
        state = gd.note_entity_blocks(
            cfg, state, idx, blocked_vec & active, is_horizontal
        )
    elif gd.uses_entity_reflect or gd.uses_entity_push:
        # Sequential reverse sweep: each reflection/push moves the object
        # before the next (lower-index) entity is tested (bag.cpp:337-369).
        E = ents.capacity

        def body(k, carry):
            nx, ny, nvx, nvy, block2, blocked_vec = carry
            m = E - 1 - k
            valid = (
                ents.alive[m]
                & (m != idx)
                & ~ents.will_erase[m]
            )
            coll = (
                (jnp.abs(nx - ents.x[m]) < obj["rx"] + ents.rx[m] + POS_EPS)
                & (jnp.abs(ny - ents.y[m]) < obj["ry"] + ents.ry[m] + POS_EPS)
            )
            hit = valid & coll
            blocked_m = hit & gd.is_blocked_ents_at(
                cfg, state, obj["type"], m, is_horizontal
            )
            refl_m = (
                hit
                & ~blocked_m
                & gd.will_reflect(cfg, state, obj["type"], ents.type[m])
            )
            delx = ents.x[m] - nx
            dely = ents.y[m] - ny
            rsx = ents.rx[m] + obj["rx"]
            rsy = ents.ry[m] + obj["ry"]
            bounce_dx = jnp.where(_vx > 0, -2 * (rsx - delx), 2 * (rsx + delx))
            bounce_dy = jnp.where(_vy > 0, -2 * (rsy - dely), 2 * (rsy + dely))
            app = refl_m & active
            nx = jnp.where(app & is_horizontal, nx + bounce_dx, nx)
            ny = jnp.where(app & ~is_horizontal, ny + bounce_dy, ny)
            nvx = jnp.where(app & is_horizontal, -nvx, nvx)
            nvy = jnp.where(app & ~is_horizontal, -nvy, nvy)

            if gd.uses_entity_push:
                # push_obj(m, obj) (bag.cpp:240-268): m clamps obj to its
                # boundary along the move axis via a recursive sub_step and
                # zeroes obj's velocity component.  The recursion's grid
                # corner-probe + clamp is reproduced; deeper entity re-checks
                # (depth >= 2, only reachable through chained overlaps the
                # ported games' geometry cannot produce) are elided.
                push_dx = (
                    ents.x[m] + jnp.sign(nx - ents.x[m]) * rsx - nx
                )
                push_dy = (
                    ents.y[m] + jnp.sign(ny - ents.y[m]) * rsy - ny
                )
                px = nx + jnp.where(is_horizontal, push_dx, 0.0)
                py = ny + jnp.where(is_horizontal, 0.0, push_dy)
                gblock = jnp.asarray(False)
                for ii in (0, 1):
                    for jj in (0, 1):
                        cpx = px + obj["rx"] * SUB_STEP_MARGIN * (2 * ii - 1)
                        cpy = py + obj["ry"] * SUB_STEP_MARGIN * (2 * jj - 1)
                        t3 = get_obj_from_floats(state, cpx, cpy)
                        gblock = gblock | gd.is_blocked(
                            cfg, state, obj["type"], t3, is_horizontal
                        )
                pcl_x = jnp.where(
                    push_dx > 0,
                    jnp.floor(px + obj["rx"]) - obj["rx"],
                    jnp.ceil(px - obj["rx"]) + obj["rx"],
                )
                pcl_y = jnp.where(
                    push_dy > 0,
                    jnp.floor(py + obj["ry"]) - obj["ry"],
                    jnp.ceil(py - obj["ry"]) + obj["ry"],
                )
                pcl_x = jnp.where(state.grid_step, nx, pcl_x)
                pcl_y = jnp.where(state.grid_step, ny, pcl_y)
                px = jnp.where(gblock & is_horizontal, pcl_x, px)
                py = jnp.where(gblock & ~is_horizontal, pcl_y, py)
                appb = blocked_m & active
                nx = jnp.where(appb, px, nx)
                ny = jnp.where(appb, py, ny)
                nvx = jnp.where(appb & is_horizontal, 0.0, nvx)
                nvy = jnp.where(appb & ~is_horizontal, 0.0, nvy)

            block2 = block2 | blocked_m
            blocked_vec = blocked_vec.at[m].set(blocked_m & active)
            return nx, ny, nvx, nvy, block2, blocked_vec

        nx, ny, nvx, nvy, block2, blocked_vec = jax.lax.fori_loop(
            0, E, body,
            (nx, ny, nvx, nvy, block2, jnp.zeros((E,), jnp.bool_)),
        )
        # games that need the identity of blocking entities (coinrun's
        # is_on_crate side effect, coinrun.cpp:187-202) observe it here
        state = gd.note_entity_blocks(cfg, state, idx, blocked_vec, is_horizontal)
    else:
        # No game callback can block/reflect on entities: default
        # is_blocked_ents == is_blocked(type), which only triggers for
        # WALL_OBJ-typed entities -- declared per game via uses_entity_block.
        if gd.uses_entity_block:
            coll = eo.entity_vs_all(ents, nx, ny, obj["rx"], obj["ry"], POS_EPS)
            valid = ents.alive & ~ents.will_erase
            valid = valid & (jnp.arange(ents.capacity) != idx)
            blocked_m = valid & coll & gd.is_blocked_ents(
                cfg, state, obj["type"], ents.type, is_horizontal
            )
            block2 = jnp.any(blocked_m)

    ents = eo.write_slot_masked(ents, idx, active, x=nx, y=ny, vx=nvx, vy=nvy)
    return state.replace(ents=ents), jnp.logical_and(active, block | block2)


def basic_step_object(gd, cfg, state: EnvState, idx, active=True) -> EnvState:
    """bag.cpp:593-656 for entity ``idx`` (masked by ``active``)."""
    ents = state.ents
    vx0 = ents.vx[idx]
    vy0 = ents.vy[idx]
    active = jnp.logical_and(jnp.asarray(active), ~ents.will_erase[idx])

    speed = jnp.sqrt(vx0 * vx0 + vy0 * vy0)
    nss_f = (4 * speed).astype(I32)
    nss = jnp.maximum(nss_f, 4)
    nss = jnp.where(state.grid_step, 1, nss)
    nss = jnp.minimum(nss, gd.max_substeps)  # static safety cap
    pct = (1.0 / nss).astype(F32)

    cmp = jnp.abs(vx0) - jnp.abs(vy0)
    step_x_first = jnp.where(cmp == 0, state.step_rand_int % 2 == 0, cmp > 0)
    is_player = ents.type[idx] == O.PLAYER
    step_x_first = jnp.where(is_player & (state.action_vx != 0), True, step_x_first)
    step_x_first = jnp.where(is_player & (state.action_vy != 0), False, step_x_first)

    def body(s, carry):
        state, vx_pct, vy_pct, broke = carry
        act = jnp.logical_and(active, jnp.logical_and(s < nss, ~broke))
        vx = state.ents.vx[idx] * pct
        vy = state.ents.vy[idx] * pct
        # First pass moves along x if step_x_first else y; second the other.
        a1x = jnp.where(step_x_first, vx, 0.0)
        a1y = jnp.where(step_x_first, 0.0, vy)
        a2x = jnp.where(step_x_first, 0.0, vx)
        a2y = jnp.where(step_x_first, vy, 0.0)
        state, b1 = sub_step(gd, cfg, state, idx, a1x, a1y, act)
        state, b2 = sub_step(gd, cfg, state, idx, a2x, a2y, act)
        block_x = jnp.where(step_x_first, b1, b2)
        block_y = jnp.where(step_x_first, b2, b1)
        vx_pct = vx_pct + jnp.where(act & ~block_x, 1.0, 0.0)
        vy_pct = vy_pct + jnp.where(act & ~block_y, 1.0, 0.0)
        broke = broke | (block_x & block_y)
        return state, vx_pct, vy_pct, broke

    state, vx_pct, vy_pct, _ = jax.lax.fori_loop(
        0, gd.max_substeps, body, (state, F32(0.0), F32(0.0), jnp.asarray(False))
    )
    nss_f32 = nss.astype(F32)
    new_vx = state.ents.vx[idx] * (vx_pct / nss_f32)
    new_vy = state.ents.vy[idx] * (vy_pct / nss_f32)
    ents = eo.write_slot_masked(state.ents, idx, active, vx=new_vx, vy=new_vy)
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
    """bag.cpp:1086-1098 over the whole table."""
    ents = state.ents
    if gd.agent_only_smart:
        # Slots E-1..1 are non-smart: their Euler updates commute, one vector
        # op.  Agent (slot 0, stepped last in the reference's reverse loop)
        # then takes the sub-step path against the updated positions.
        others = ents.alive & (jnp.arange(ents.capacity) != eo.AGENT)
        state = state.replace(ents=entity_euler_step_all(ents, others))
        state = basic_step_object(gd, cfg, state, eo.AGENT)
        agent_mask = jnp.zeros((ents.capacity,), jnp.bool_).at[eo.AGENT].set(True)
        state = state.replace(
            ents=entity_euler_step_all(state.ents, agent_mask & state.ents.alive)
        )
        return state

    # General path: non-smart Euler updates commute and never act as moving
    # blockers for the ported games (crates/orbs/lava walls are static,
    # balls/trails neither block nor reflect anything), so they run as one
    # vector op; only the <= max_smart_entities smart slots take the
    # sequential sub-step path, in the reference's reverse slot order.
    E = ents.capacity
    M = gd.max_smart_entities or E
    nonsmart = ents.alive & ~ents.smart_step
    state = state.replace(ents=entity_euler_step_all(ents, nonsmart))

    slot = jnp.arange(E)
    smart_alive = state.ents.alive & state.ents.smart_step
    key = jnp.where(smart_alive, E - 1 - slot, 2 * E)  # descending slots first
    order = jnp.argsort(key)
    n_smart = jnp.sum(smart_alive.astype(jnp.int32))

    def body(k, state):
        i = order[k]
        ok = (k < n_smart)
        state = basic_step_object(gd, cfg, state, i, active=ok)
        one = jnp.zeros((E,), jnp.bool_).at[i].set(ok)
        state = state.replace(
            ents=entity_euler_step_all(state.ents, one & state.ents.alive)
        )
        return state

    return jax.lax.fori_loop(0, M, body, state)


def check_grid_collisions(gd, cfg, state: EnvState, idx) -> EnvState:
    """bag.cpp:145-165 for smart entity ``idx``: dispatch game handler over
    the <=4 overlapped cells in reference order (x asc outer, y asc inner)."""
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
        valid = t != O.SPACE
        if extra_valid is not None:
            valid = valid & extra_valid
        state = gd.handle_grid_collision(cfg, state, idx, t, cx, cy, valid)
    return state
