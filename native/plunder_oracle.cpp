// Levelgen conformance oracle for the plunder game: replays the documented
// RNG call sequence of a plunder level reset (base draws, ship-type
// permutation via choose_n, lane directions/velocities, panel spawns with
// rejection sampling, legend, agent theme + reposition_agent) on the real
// std::mt19937 and prints the results and a stream fingerprint.
//
// Independent reimplementation from the behavioral spec in SURVEY.md;
// procgen_tpu's JAX levelgen is diffed against it in tests/test_plunder.py.
//
// Usage: plunder_oracle <seed> <mode> <ship_aspect_hex>  (mode: 0 easy, 1 hard)
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

const int PLAYER = 0, PLAYER_BULLET = 1, TARGET_LEGEND = 2,
          TARGET_BACKGROUND = 3, PANEL = 6, SHIP = 7;
const int NUM_WATER_SURFACE_BACKGROUNDS = 4;

struct Gen {
    std::mt19937 g;
    int randn(int high) { return (int)((uint32_t)g() % (uint32_t)high); }
    double rand01() { return (double)g() / 4294967296.0; }
};

struct Ent { float x, y, rx, ry; int type, theme; };

int main(int argc, char** argv) {
    if (argc != 4) return 1;
    int seed = atoi(argv[1]);
    int mode = atoi(argv[2]);
    float ship_aspect = strtof(argv[3], nullptr);
    float mw = 20, mh = 20;
    float r_scale = mode == 0 ? 1.5f : 1.0f;

    Gen rg;
    rg.g.seed(seed);
    (void)rg.rand01();                            // bg_pct_x
    (void)rg.randn(NUM_WATER_SURFACE_BACKGROUNDS); // background_index
    float ax = (float)(rg.rand01() * (mw - 0.8f) + 0.4f);
    float ay = (float)(rg.rand01() * (mh - 0.8f) + 0.4f);
    std::vector<Ent> ents;
    ents.push_back({ax, ay, 0.4f, 0.4f, PLAYER, 0});

    // choose_n permutation of [0..5] (randgen.cpp:50-69)
    std::vector<int> rem = {0, 1, 2, 3, 4, 5}, perm;
    while ((int)perm.size() < 6) {
        int idx = rg.randn((int)rem.size());
        perm.push_back(rem[idx]);
        rem.erase(rem.begin() + idx);
    }

    std::vector<int> lane_dirs;
    std::vector<float> lane_vels;
    for (int i = 0; i < 5; i++) {
        lane_dirs.push_back(rg.rand01() < .5 ? 1 : 0);
        lane_vels.push_back((float)(.15 + .1 * rg.rand01()));
    }

    int num_panels = mode == 0 ? 0 : rg.randn(4);
    auto rand_pos = [&](float r, float lo, float hi) {
        if (hi - lo <= 2 * r) return (hi + lo) / 2;
        return (float)((hi - lo - 2 * r) * rg.rand01() + r + lo);
    };
    auto collides = [&](float ex, float ey, float rx, float ry, const Ent& o,
                        float margin) {
        return fabs(ex - o.x) < (rx + o.rx + margin) &&
               fabs(ey - o.y) < (ry + o.ry + margin);
    };
    for (int i = 0; i < num_panels; i++) {
        float ex = rand_pos(1.2f, 0, mw), ey = rand_pos(.5f, 5, 10);
        int count = 0;
        auto bad = [&]() {
            for (auto& o : ents)
                if (collides(ex, ey, 1.2f, .5f, o, 0)) return true;
            return false;
        };
        while (bad() && count < 100) {
            ex = rand_pos(1.2f, 0, mw);
            ey = rand_pos(.5f, 5, 10);
            count++;
        }
        ents.push_back({ex, ey, 1.2f, .5f, PANEL, 0});
    }

    ents.push_back({2, 2, 2, 2, TARGET_BACKGROUND, 0});
    float leg_rx = r_scale * 1.5f, leg_ry = leg_rx / ship_aspect;
    ents.push_back({2, 2, leg_rx, leg_ry, TARGET_LEGEND, perm[0]});

    int agent_theme = perm[rg.randn(1) + 1];
    float arx = r_scale, ary = arx / ship_aspect;
    ents[0].rx = arx;
    ents[0].ry = ary;
    ents[0].theme = agent_theme;
    // reposition_agent (bag.cpp:531-539): do-while vs all entities
    int count = 0;
    do {
        ents[0].x = (float)(rg.rand01() * (mw - 2 * arx) + arx);
        ents[0].y = (float)(rg.rand01() * (mh - 2 * ary) + ary);
        count++;
        bool coll = false;
        for (size_t k = 1; k < ents.size(); k++)
            if (collides(ents[0].x, ents[0].y, arx, ary, ents[k], 0)) coll = true;
        if (!coll) break;
    } while (count < 100);
    ents[0].y = 1 + ary;
    float min_agent_x = 2 * 2.0f + arx;
    if (ents[0].x < min_agent_x) ents[0].x = min_agent_x;

    printf("meta %d %d %d\n", num_panels, agent_theme, (int)ents.size());
    printf("perm %d %d %d %d %d %d\n", perm[0], perm[1], perm[2], perm[3],
           perm[4], perm[5]);
    printf("lanes %d %d %d %d %d\n", lane_dirs[0], lane_dirs[1], lane_dirs[2],
           lane_dirs[3], lane_dirs[4]);
    printf("vels %a %a %a %a %a\n", lane_vels[0], lane_vels[1], lane_vels[2],
           lane_vels[3], lane_vels[4]);
    for (auto& e : ents)
        printf("ent %d %d %a %a %a %a\n", e.type, e.theme, e.x, e.y, e.rx, e.ry);
    uint32_t f1 = rg.g(), f2 = rg.g(), f3 = rg.g();
    printf("fp %u %u %u\n", f1, f2, f3);
    return 0;
}
