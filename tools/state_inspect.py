"""Annotated parser for reference-format state blobs: maps byte offsets to
field names so parity diffs (tools/ref_parity.py) can be localized instantly.

Layout mirrors Game::serialize (game.cpp:170-229), BasicAbstractGame::
serialize (bag.cpp:1169-1223), Entity::serialize (entity.cpp:90-134); any
trailing bytes are the per-game extras (§2.2 of SURVEY.md) and are labeled
``extra[i]`` with both int and float interpretations printed.

Usage:
    python tools/state_inspect.py dumpA.bin dumpB.bin     # diff two blobs
    python tools/state_inspect.py dump.bin --at 13939     # name one offset
"""

from __future__ import annotations

import struct
import sys

ENTITY_LAYOUT = [
    ("x", "f"), ("y", "f"), ("vx", "f"), ("vy", "f"), ("rx", "f"), ("ry", "f"),
    ("type", "i"), ("image_type", "i"), ("image_theme", "i"), ("render_z", "i"),
    ("will_erase", "i"), ("collides_with_entities", "i"),
    ("collision_margin", "f"), ("rotation", "f"), ("vrot", "f"),
    ("is_reflected", "i"), ("fire_time", "i"), ("spawn_time", "i"),
    ("life_time", "i"), ("expire_time", "i"), ("use_abs_coords", "i"),
    ("friction", "f"), ("smart_step", "i"), ("avoids_collisions", "i"),
    ("auto_erase", "i"),
    ("alpha", "f"), ("health", "f"), ("theta", "f"), ("grow_rate", "f"),
    ("alpha_decay", "f"), ("climber_spawn_x", "f"),
]

GAME_HEADER = [
    ("paint_vel_info", "i"), ("use_generated_assets", "i"),
    ("use_monochrome_assets", "i"), ("restrict_themes", "i"),
    ("use_backgrounds", "i"), ("center_agent", "i"), ("debug_mode", "i"),
    ("distribution_mode", "i"), ("use_sequential_levels", "i"),
    ("use_easy_jump", "i"), ("plain_assets", "i"), ("physics_mode", "i"),
    ("grid_step", "i"), ("level_seed_low", "i"), ("level_seed_high", "i"),
    ("game_type", "i"), ("game_n", "i"),
]

GAME_TAIL = [
    ("reward", "f"), ("done", "i"), ("level_complete", "i"), ("action", "i"),
    ("timeout", "i"), ("current_level_seed", "i"), ("prev_level_seed", "i"),
    ("episodes_remaining", "i"), ("episode_done", "i"),
    ("last_reward_timer", "i"), ("last_reward", "f"), ("default_action", "i"),
    ("fixed_asset_seed", "i"), ("cur_time", "i"), ("is_waiting_for_step", "i"),
]

BAG_TAIL = [
    ("use_procgen_background", "i"), ("background_index", "i"),
    ("bg_tile_ratio", "f"), ("bg_pct_x", "f"), ("char_dim", "f"),
    ("last_move_action", "i"), ("move_action", "i"), ("special_action", "i"),
    ("mixrate", "f"), ("maxspeed", "f"), ("max_jump", "f"),
    ("action_vx", "f"), ("action_vy", "f"), ("action_vrot", "f"),
    ("center_x", "f"), ("center_y", "f"), ("random_agent_start", "i"),
    ("has_useful_vel_info", "i"), ("step_rand_int", "i"),
]

BAG_TAIL2 = [
    ("main_width", "i"), ("main_height", "i"), ("out_of_bounds_object", "i"),
    ("unit", "f"), ("view_dim", "f"), ("x_off", "f"), ("y_off", "f"),
    ("visibility", "f"), ("min_visibility", "f"),
]


class Annot:
    """Walks a blob recording (name, offset, size, value) spans."""

    def __init__(self, data: bytes):
        self.data = data
        self.off = 0
        self.spans: list[tuple[str, int, int, object]] = []

    def _rec(self, name, size, val):
        self.spans.append((name, self.off, size, val))
        self.off += size
        return val

    def i(self, name):
        return self._rec(name, 4, struct.unpack_from("<i", self.data, self.off)[0])

    def f(self, name):
        return self._rec(name, 4, struct.unpack_from("<f", self.data, self.off)[0])

    def s(self, name):
        n = self.i(name + ".len")
        v = self.data[self.off : self.off + n].decode(errors="replace")
        return self._rec(name, n, v if len(v) < 48 else v[:45] + "...")

    def table(self, name, layout):
        for fname, t in layout:
            (self.i if t == "i" else self.f)(f"{name}.{fname}")

    def randgen(self, name):
        self.i(name + ".is_seeded")
        self.s(name + ".mt_state")


def annotate(data: bytes) -> Annot:
    a = Annot(data)
    a.i("SERIALIZE_VERSION")
    a.s("game_name")
    a.table("opts", GAME_HEADER)
    a.randgen("level_seed_rand_gen")
    a.randgen("rand_gen")
    a.table("game", GAME_TAIL)
    a.i("grid_size")
    n_ents = a.i("num_entities")
    for k in range(n_ents):
        a.table(f"ent[{k}]", ENTITY_LAYOUT)
    a.table("bag", BAG_TAIL)
    a.randgen("asset_rand_gen")
    a.table("bag", BAG_TAIL2)
    gw = a.i("grid.w")
    gh = a.i("grid.h")
    ncell = a.i("grid.len")
    assert ncell == gw * gh, (ncell, gw, gh)
    for k in range(ncell):
        a.i(f"grid[{k % gw},{k // gw}]")  # (x, y)
    k = 0
    while a.off + 4 <= len(data):
        iv = struct.unpack_from("<i", data, a.off)[0]
        fv = struct.unpack_from("<f", data, a.off)[0]
        a._rec(f"extra[{k}]", 4, f"int={iv} float={fv!r}")
        k += 1
    if a.off != len(data):
        a._rec("trailing", len(data) - a.off, data[a.off:].hex())
    return a


def find(a: Annot, off: int):
    for name, o, size, val in a.spans:
        if o <= off < o + size:
            return name, o, size, val
    return None


def fmt(v):
    return f"{v!r}" if not isinstance(v, float) else f"{v!r} ({struct.pack('<f', v).hex()})"


def diff(da: bytes, db: bytes, limit=40):
    aa, ab = annotate(da), annotate(db)
    n = 0
    for (na, oa, sa, va), (nb, ob, sb, vb) in zip(aa.spans, ab.spans):
        if na != nb or va != vb:
            print(f"  @{oa}: {na}: A={fmt(va)}  B={fmt(vb)}")
            n += 1
            if n >= limit:
                print("  ... (truncated)")
                break
    if len(aa.spans) != len(ab.spans):
        print(f"  span counts differ: A={len(aa.spans)} B={len(ab.spans)}")
    if n == 0:
        print("  identical")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("blobs", nargs="+")
    ap.add_argument("--at", type=int, default=None)
    args = ap.parse_args()
    datas = [open(p, "rb").read() for p in args.blobs]
    if args.at is not None:
        for p, d in zip(args.blobs, datas):
            hit = find(annotate(d), args.at)
            print(f"{p}: offset {args.at} -> {hit}")
    elif len(datas) == 2:
        diff(datas[0], datas[1])
    else:
        for name, o, size, val in annotate(datas[0]).spans:
            print(f"{o:8d} {size:4d}  {name} = {fmt(val)}")


if __name__ == "__main__":
    main()
