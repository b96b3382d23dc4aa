// Levelgen conformance oracle for the dodgeball game: replays the documented
// RNG call sequence of a dodgeball level reset (base draws, recursive room
// splitting with the ordered room list, border door spawn, reposition_agent,
// enemy spawns + per-enemy velocity draws) on the real std::mt19937 and
// prints entities and a stream fingerprint.
//
// Independent reimplementation from the behavioral spec in SURVEY.md;
// procgen_tpu's JAX levelgen is diffed against it in tests/test_dodgeball.py.
//
// Usage: dodgeball_oracle <seed> <mode>  (0 easy, 1 hard, 2 extreme, 3 memory)
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

const int PLAYER = 0, LAVA_WALL = 1, ENEMY = 4, DOOR = 5;
const int NUM_TOPDOWN_BACKGROUNDS = 9;

struct Gen {
    std::mt19937 g;
    int randn(int high) { return (int)((uint32_t)g() % (uint32_t)high); }
    double rand01() { return (double)g() / 4294967296.0; }
};

struct Ent { float x, y, rx, ry; int type; float vx, vy; int spawn_time; };
struct Room { float x, y, w, h; };

int main(int argc, char** argv) {
    if (argc != 3) return 1;
    int seed = atoi(argv[1]);
    int mode = atoi(argv[2]);

    float thickness = 0.3f, enemy_r = .5f, exit_r = .75f;
    float agent_r = 0.4f;
    int num_iterations, max_extra_enemies = 3;
    float world_dim = 20;
    if (mode == 0) {
        num_iterations = 2; thickness *= 2; enemy_r *= 2; agent_r = 1; exit_r *= 2;
    } else if (mode == 1) {
        num_iterations = 4; thickness *= 1.5f; enemy_r *= 1.5f; agent_r = .75f;
    } else if (mode == 2) {
        num_iterations = 8;
    } else {
        num_iterations = 16; thickness *= 1.5f; enemy_r *= 1.5f; agent_r = .75f;
        max_extra_enemies = 16; world_dim = 40;
    }
    float mw = world_dim, mh = world_dim;
    float hard_min_dim = 4 * agent_r + 2 * thickness + .5f;
    float min_dim = agent_r * 8 + .5f;

    Gen rg;
    rg.g.seed(seed);
    (void)rg.rand01();
    (void)rg.randn(NUM_TOPDOWN_BACKGROUNDS);
    float ax = (float)(rg.rand01() * (mw - 0.8f) + 0.4f);
    float ay = (float)(rg.rand01() * (mh - 0.8f) + 0.4f);
    std::vector<Ent> ents;
    ents.push_back({ax, ay, agent_r, agent_r, PLAYER, 0, 0, 0});

    std::vector<Room> rooms = {{0, 0, mw, mh}};
    auto add_room = [&](Room r) {
        if ((r.w >= min_dim || r.h >= min_dim) && r.w >= hard_min_dim &&
            r.h >= hard_min_dim)
            rooms.push_back(r);
    };
    for (int it = 0; it < num_iterations; it++) {
        if (rooms.empty()) break;
        int idx = rg.randn((int)rooms.size());
        Room room = rooms[idx];
        rooms.erase(rooms.begin() + idx);
        bool will_split_width = rg.rand01() < .5;
        bool choice2 = rg.rand01() < .5;
        if (room.w < min_dim) will_split_width = false;
        if (room.h < min_dim) will_split_width = true;
        float rx = room.x, ry = room.y, rw = room.w, rh = room.h;
        float gap = .25f * (rg.randn(3) + 1);
        float pct = 1 - gap;
        if (!will_split_width) {
            float wy, wh, remy;
            if (choice2) { wy = ry; remy = ry + pct * rh; wh = pct * rh; }
            else { wy = ry + (1 - pct) * rh; remy = ry; wh = pct * rh; }
            ents.push_back({rx + rw / 2, wy + wh / 2, thickness, wh / 2, LAVA_WALL, 0, 0, 0});
            float nextw = rw / 2 - thickness;
            add_room({rx, wy, nextw, wh});
            add_room({rx + rw / 2 + thickness, wy, nextw, wh});
            add_room({rx, remy, rw, rh - wh});
        } else {
            float wx, ww, remx;
            if (choice2) { wx = rx; remx = rx + pct * rw; ww = pct * rw; }
            else { wx = rx + (1 - pct) * rw; remx = rx; ww = pct * rw; }
            ents.push_back({wx + ww / 2, ry + rh / 2, ww / 2, thickness, LAVA_WALL, 0, 0, 0});
            float nexth = rh / 2 - thickness;
            add_room({wx, ry, ww, nexth});
            add_room({wx, ry + rh / 2 + thickness, ww, nexth});
            add_room({remx, ry, rw - ww, rh});
        }
    }

    auto rand_pos = [&](float r, float lo, float hi) {
        if (hi - lo <= 2 * r) return (hi + lo) / 2;
        return (float)((hi - lo - 2 * r) * rg.rand01() + r + lo);
    };
    auto collides = [&](float ex, float ey, float rx, float ry, const Ent& o,
                        float margin) {
        return fabs(ex - o.x) < (rx + o.rx + margin) &&
               fabs(ey - o.y) < (ry + o.ry + margin);
    };
    auto spawn = [&](float erx, float ery, int type, float bx, float by,
                     float bw, float bh) {
        float ex = rand_pos(erx, bx, bx + bw), ey = rand_pos(ery, by, by + bh);
        int count = 0;
        auto bad = [&]() {
            for (auto& o : ents)
                if (collides(ex, ey, erx, ery, o, 0)) return true;
            return false;
        };
        while (bad() && count < 100) {
            ex = rand_pos(erx, bx, bx + bw);
            ey = rand_pos(ery, by, by + bh);
            count++;
        }
        ents.push_back({ex, ey, erx, ery, type, 0, 0, 0});
    };

    float doorlen = 2 * exit_r;
    int exit_wall_choice = rg.randn(4);
    if (exit_wall_choice == 0)
        spawn(doorlen / 2, exit_r, DOOR, 0, 0, mw, 2 * exit_r);
    else if (exit_wall_choice == 1)
        spawn(doorlen / 2, exit_r, DOOR, 0, mh - 2 * exit_r, mw, 2 * exit_r);
    else if (exit_wall_choice == 2)
        spawn(exit_r, doorlen / 2, DOOR, 0, 0, 2 * exit_r, mh);
    else
        spawn(exit_r, doorlen / 2, DOOR, mw - 2 * exit_r, 0, 2 * exit_r, mh);

    int count = 0;
    do {
        ents[0].x = (float)(rg.rand01() * (mw - 2 * agent_r) + agent_r);
        ents[0].y = (float)(rg.rand01() * (mh - 2 * agent_r) + agent_r);
        count++;
        bool coll = false;
        for (size_t k = 1; k < ents.size(); k++)
            if (collides(ents[0].x, ents[0].y, agent_r, agent_r, ents[k], 0))
                coll = true;
        if (!coll) break;
    } while (count < 100);

    int num_enemies = rg.randn(max_extra_enemies + 1) + 3;
    for (int i = 0; i < num_enemies; i++)
        spawn(enemy_r, enemy_r, ENEMY, 0, 0, mw, mh);
    int enemy_theme = rg.randn(7);

    for (auto& e : ents) {
        if (e.type != ENEMY) continue;
        float vel = 0.05f * (rg.randn(2) * 2 - 1);
        if (rg.randn(2) == 0) { e.vx = vel; e.vy = 0; }
        else { e.vy = vel; e.vx = 0; }
        e.spawn_time = rg.randn(50) + 25;
    }

    printf("meta %d %d %d\n", num_enemies, enemy_theme, (int)ents.size());
    for (auto& e : ents)
        printf("ent %d %a %a %a %a %a %a %d\n", e.type, e.x, e.y, e.rx, e.ry,
               e.vx, e.vy, e.spawn_time);
    uint32_t f1 = rg.g();
    uint32_t f2 = rg.g();
    uint32_t f3 = rg.g();
    printf("fp %u %u %u\n", f1, f2, f3);
    return 0;
}
