"""Game registry: name -> GameDef factory (reference: game-registry.h)."""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register_game(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory

    return deco


def make_game(cfg):
    """Instantiate the GameDef for cfg.env_name (one instance per config)."""
    _import_all()

    name = cfg.env_name
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown env_name {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](cfg)


def _import_all():
    import procgen_tpu.games.bigfish  # noqa: F401
    import procgen_tpu.games.bossfight  # noqa: F401
    import procgen_tpu.games.caveflyer  # noqa: F401
    import procgen_tpu.games.chaser  # noqa: F401
    import procgen_tpu.games.coinrun  # noqa: F401
    import procgen_tpu.games.climber  # noqa: F401
    import procgen_tpu.games.dodgeball  # noqa: F401
    import procgen_tpu.games.fruitbot  # noqa: F401
    import procgen_tpu.games.heist  # noqa: F401
    import procgen_tpu.games.jumper  # noqa: F401
    import procgen_tpu.games.leaper  # noqa: F401
    import procgen_tpu.games.maze  # noqa: F401
    import procgen_tpu.games.miner  # noqa: F401
    import procgen_tpu.games.ninja  # noqa: F401
    import procgen_tpu.games.plunder  # noqa: F401
    import procgen_tpu.games.starpilot  # noqa: F401


def available_games():
    _import_all()
    return sorted(_REGISTRY)
