"""BigFish: eat smaller fish, grow, avoid bigger (reference: games/bigfish.cpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu import objects as O
from procgen_tpu import fmath as fm
from procgen_tpu import rng as R
from procgen_tpu.config import DistributionMode
from procgen_tpu.engine import entity_ops as eo
from procgen_tpu.engine.base import GameDef, base_game_reset, base_game_step
from procgen_tpu.games import register_game
from procgen_tpu.render import assets
from procgen_tpu.state import F32, I32, EnvState

COMPLETION_BONUS = 10.0
POSITIVE_REWARD = 1.0
FISH = 2
FISH_MIN_R = F32(0.25)
FISH_MAX_R = F32(2.0)
FISH_QUOTA = 30


class BigFish(GameDef):
    name = "bigfish"
    timeout = 6000  # bigfish.cpp:25
    max_entities = 48  # unbounded in reference; ~5-13 concurrent in practice
    world_w_max = 20
    world_h_max = 20
    background_group = "water_backgrounds"  # bigfish.cpp:31-33

    FISH_ASSETS = (
        "misc_assets/fishTile_074.png",
        "misc_assets/fishTile_078.png",
        "misc_assets/fishTile_080.png",
    )

    def __init__(self, cfg):
        self.start_r = 1.0 if cfg.distribution_mode == DistributionMode.easy else 0.5
        # match_aspect_ratio uses the per-theme sprite aspect (bag.cpp:1014-1023)
        self.fish_aspects = np.asarray(
            [assets.aspect_ratio(n) for n in self.FISH_ASSETS], F32
        )

    def asset_map(self, cfg):
        # bigfish.cpp:35-43
        return {
            O.PLAYER: ["misc_assets/fishTile_072.png"],
            FISH: list(self.FISH_ASSETS),
        }

    def center_agent(self, cfg):
        return False  # bigfish.cpp:64

    def init_extra(self, cfg):
        return {
            "fish_eaten": jnp.asarray(0, I32),
            "r_inc": jnp.asarray(0.0, F32),
        }

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        # set in the ctor in the reference (bigfish.cpp:27-28)
        return state.replace(
            main_width=jnp.asarray(20, I32), main_height=jnp.asarray(20, I32)
        )

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)
        start_r = F32(self.start_r)
        r_inc = (FISH_MAX_R - start_r) / FISH_QUOTA
        ents = eo.write_slot(
            state.ents,
            eo.AGENT,
            rx=start_r,
            ry=start_r,
            y=1 + start_r,
        )
        extra = dict(state.extra)
        extra["fish_eaten"] = jnp.asarray(0, I32)
        extra["r_inc"] = r_inc
        return state.replace(ents=ents, extra=extra), rs

    def agent_collision_phase(self, cfg, state: EnvState) -> EnvState:
        """Exact reverse-order dispatch (bigfish.cpp:45-59): eating grows the
        agent mid-sweep, which can change collision/size outcomes for
        lower-index fish, so the sweep is sequential."""
        E = state.ents.capacity

        def body(k, carry):
            ents, extra, reward, done = carry
            i = E - 1 - k
            is_fish = (ents.type[i] == FISH) & ents.alive[i]
            coll = (
                (jnp.abs(ents.x[i] - ents.x[eo.AGENT])
                 < ents.rx[i] + ents.rx[eo.AGENT] + ents.collision_margin[i])
                & (jnp.abs(ents.y[i] - ents.y[eo.AGENT])
                   < ents.ry[i] + ents.ry[eo.AGENT] + ents.collision_margin[i])
            )
            hit = is_fish & coll & (i != eo.AGENT)
            bigger = ents.rx[i] > ents.rx[eo.AGENT]
            done = done | (hit & bigger)
            eat = hit & ~bigger
            reward = reward + jnp.where(eat, F32(POSITIVE_REWARD), F32(0.0))
            ents = ents.replace(
                will_erase=ents.will_erase.at[i].set(ents.will_erase[i] | eat),
                rx=ents.rx.at[eo.AGENT].add(jnp.where(eat, extra["r_inc"], 0.0)),
            )
            ents = ents.replace(
                ry=ents.ry.at[eo.AGENT].add(jnp.where(eat, extra["r_inc"], 0.0))
            )
            extra = dict(extra)
            extra["fish_eaten"] = extra["fish_eaten"] + eat.astype(I32)
            return ents, extra, reward, done

        ents, extra, reward, done = jax.lax.fori_loop(
            0, E, body, (state.ents, state.extra, state.reward, state.done)
        )
        return state.replace(ents=ents, extra=extra, reward=reward, done=done)

    def game_step(self, cfg, state: EnvState) -> EnvState:
        state = base_game_step(self, cfg, state)

        # fish spawner (bigfish.cpp:83-94); all draws gated on the 1/10 roll
        mt, roll = R.mt_randn(state.rng, 10)
        spawn = roll == 1
        mt, u_r = R.mt_rand01(mt, active=spawn)
        # C++: (FISH_MAX_R - FISH_MIN_R) * pow(rand01(), 1.4) + FISH_MIN_R
        # -- pow is double, promoting the whole expression; ONE narrowing to
        # float at the assignment (bigfish.cpp:84).  f32 on the fast path.
        if cfg.parity_mode:
            u64 = u_r.astype(jnp.float64)
            ent_r = (
                jnp.float64(FISH_MAX_R - FISH_MIN_R) * u64 ** 1.4
                + jnp.float64(FISH_MIN_R)
            ).astype(F32)
        else:
            ent_r = (FISH_MAX_R - FISH_MIN_R) * jnp.power(u_r, F32(1.4)) + FISH_MIN_R
        mt, u_y = R.mt_rand01(mt, active=spawn)
        ent_y = u_y * (state.main_height.astype(F32) - 2 * ent_r)
        mt, u_right = R.mt_rand01(mt, active=spawn)
        moves_right = u_right < F32(0.5)
        mt, u_v = R.mt_rand01(mt, active=spawn)
        # (.15 + rand01() * .25) * (+-1): double literals promote; one
        # narrowing at the assignment (bigfish.cpp:87)
        if cfg.parity_mode:
            mag64 = 0.15 + u_v.astype(jnp.float64) * 0.25
            ent_vx = (mag64 * jnp.where(moves_right, 1.0, -1.0)).astype(F32)
        else:
            ent_vx = (F32(0.15) + u_v * F32(0.25)) * jnp.where(
                moves_right, 1.0, -1.0
            )
        ent_x = jnp.where(
            moves_right, -ent_r, state.main_width.astype(F32) + ent_r
        )
        fields = eo.make_entity(ent_x, ent_y, ent_vx, 0.0, ent_r, ent_r, FISH)
        # choose_random_theme (bag.cpp:1038-1041): randn(3 themes)
        mt, theme = R.mt_randn(mt, len(self.FISH_ASSETS), active=spawn)
        fields["image_theme"] = theme
        # match_aspect_ratio (bag.cpp:1014-1023): ry = rx / aspect(theme)
        fields["ry"] = fm.fdiv(cfg, ent_r, jnp.asarray(self.fish_aspects)[theme])
        fields["is_reflected"] = ~moves_right
        ents, _ = eo.append_entity(state.ents, fields, active=spawn)
        state = state.replace(rng=mt, ents=ents)

        # quota completion (bigfish.cpp:96-100)
        full = state.extra["fish_eaten"] >= FISH_QUOTA
        state = state.replace(
            done=state.done | full,
            reward=state.reward + jnp.where(full, F32(COMPLETION_BONUS), F32(0.0)),
            level_complete=state.level_complete | full,
        )

        # facing (bigfish.cpp:102-105)
        refl = jnp.where(
            state.action_vx > 0,
            False,
            jnp.where(
                state.action_vx < 0, True, state.ents.is_reflected[eo.AGENT]
            ),
        )
        return state.replace(
            ents=eo.write_slot(state.ents, eo.AGENT, is_reflected=refl)
        )


    def serialize_extra(self, w, s, i):
        # bigfish.cpp:108-112
        w.write_int(int(s["extra.fish_eaten"][i]))
        w.write_float(s["extra.r_inc"][i])

    def deserialize_extra(self, r):
        return {"fish_eaten": r.read_int(), "r_inc": r.read_float()}


register_game("bigfish")(BigFish)
