"""Option-flag behavior: use_monochrome_assets, restrict_themes,
use_generated_assets, and joint-env master seeding (vecgame.cpp:301-314)."""

import numpy as np
import pytest

from procgen_tpu import rng as R
from procgen_tpu.config import EnvConfig
from procgen_tpu.games import make_game
from procgen_tpu.render.pack import RenderPack, color_for_type


def test_color_for_type_matches_reference_formula():
    # bag.cpp:455-481 with k=4, p1=29, p2=19
    def ref(type_, theme):
        k, kcubed, chunk = 4, 64, 64
        nt = (29 * (type_ + 1)) % kcubed
        nt = (nt + 19 * theme) % kcubed
        return (
            chunk * (nt // (k * k) + 1) - 1,
            chunk * ((nt // k) % k + 1) - 1,
            chunk * (nt % k + 1) - 1,
        )

    for t in (0, 1, 2, 15, 51, 63):
        for th in (0, 1, 3, 9):
            assert color_for_type(t, th) == ref(t, th)


def test_monochrome_pack_is_solid_colors():
    cfg = EnvConfig(env_name="coinrun", num_envs=1, use_monochrome_assets=True)
    gd = make_game(cfg)
    pack = RenderPack(gd, cfg)
    assert pack.rot_bins == 1
    # every sprite mip is one solid opaque color from the hash
    for k in range(pack.sprite_mips.shape[0]):
        mip = pack.sprite_mips[k]
        assert (mip[..., 3] == 255).all()
        assert (mip.reshape(-1, 4) == mip[0, 0]).all()


def test_restrict_themes_packs_theme0_for_nonpreserved():
    cfg = EnvConfig(env_name="coinrun", num_envs=1, restrict_themes=True)
    gd = make_game(cfg)
    pack = RenderPack(gd, cfg)
    amap = gd.asset_map(cfg)
    multi = [t for t, names in amap.items() if len(names) > 1]
    assert multi, "coinrun has multi-theme types"
    for t in multi:
        if gd.should_preserve_type_themes(t):
            continue
        base = pack.slot_lut[t, 0]
        for th in range(1, len(amap[t])):
            s = pack.slot_lut[t, th]
            assert (pack.sprite_mips[s] == pack.sprite_mips[base]).all()


def test_heist_preserves_key_themes_under_restrict():
    cfg = EnvConfig(env_name="heist", num_envs=1, restrict_themes=True)
    gd = make_game(cfg)
    pack = RenderPack(gd, cfg)
    from procgen_tpu.games.heist import KEY

    s0, s1 = pack.slot_lut[KEY, 0], pack.slot_lut[KEY, 1]
    assert not (pack.sprite_mips[s0] == pack.sprite_mips[s1]).all()


def test_generated_assets_pack_builds():
    cfg = EnvConfig(env_name="maze", num_envs=1, use_generated_assets=True)
    gd = make_game(cfg)
    pack = RenderPack(gd, cfg)
    from procgen_tpu.render.pack import PROCGEN_BG_POOL

    assert pack.bg_mip64.shape[0] == PROCGEN_BG_POOL
    # deterministic: same seed -> same sprites
    pack2 = RenderPack(gd, cfg)
    assert (pack.sprite_mips == pack2.sprite_mips).all()
    # sprites are non-trivial (not all one color)
    assert len(np.unique(pack.sprite_mips[0].reshape(-1, 4), axis=0)) > 4


@pytest.mark.parametrize("flag", ["mono", "gen"])
def test_flag_env_steps_and_renders(flag):
    from procgen_tpu.env import ProcgenTPUEnv

    kwargs = (
        dict(use_monochrome_assets=True)
        if flag == "mono"
        else dict(use_generated_assets=True)
    )
    env = ProcgenTPUEnv(num=2, env_name="maze", rand_seed=3, **kwargs)
    rew, ob, first = env.observe()
    assert ob["rgb"].shape == (2, 64, 64, 3)
    env.act(np.array([5, 7], np.int32))
    rew, ob2, first = env.observe()
    assert ob2["rgb"].dtype == np.uint8
    if flag == "gen":
        with pytest.raises(RuntimeError):
            env.get_state()


def test_joint_env_master_seed_dealing():
    """Env n (interleaved) must get the n-th draw of ONE master MT19937
    seeded with rand_seed (vecgame.cpp:301-314)."""
    from procgen_tpu.env import ProcgenJointEnv

    rand_seed = 77
    joint = ProcgenJointEnv(4, "maze,miner", rand_seed=rand_seed, render=False)
    master = R.HostMT(rand_seed)
    expect = [master.randint_full() for _ in range(4)]
    # sub-env j slot s == global env s*2 + j
    for j, env in enumerate(joint.envs):
        for s in range(env.num):
            want = expect[s * 2 + j]
            rg = R.HostMT(want & 0xFFFFFFFF)
            lo, hi = env.cfg.level_seed_low, env.cfg.level_seed_high
            want_level = lo + rg.raw() % (hi - lo)
            got = int(np.asarray(env.state.current_level_seed)[s])
            assert got == want_level, (j, s, got, want_level)
