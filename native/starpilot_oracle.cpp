// Levelgen conformance oracle for the starpilot game: replays the documented
// RNG call sequence of a starpilot level reset (spawner-timeline generation)
// on the real std::mt19937 and prints the sorted spawner table and a stream
// fingerprint.
//
// Independent reimplementation from the behavioral spec in SURVEY.md;
// procgen_tpu's JAX levelgen is diffed against it in tests/test_starpilot.py.
//
// Usage: starpilot_oracle <seed> <mode> <turret_a0> <turret_a1>
//   (mode: 0 easy, 1 hard, 2 extreme; turret aspects as hex floats)
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

const int BULLET_PLAYER = 1, BULLET2 = 2, BULLET3 = 3, FLYER = 4, METEOR = 5,
          CLOUD = 6, TURRET = 7, FAST_FLYER = 8;
const int NUM_BASIC_OBJECTS = 9, NUM_SHIP_THEMES = 7;
const int SHOOTER_WIN_TIME = 500;
const float V_SCALE = 2.0f / 5.0f;
const float PI_F = 3.14159265358979323846f;
const int NUM_SPACE_BACKGROUNDS = 13;

struct Gen {
    std::mt19937 g;
    int randn(int high) { return (int)((uint32_t)g() % (uint32_t)high); }
    int randint(int lo, int hi) { return lo + (int)((uint32_t)g() % (uint32_t)(hi - lo)); }
    double rand01() { return (double)g() / 4294967296.0; }
};

struct Sp {
    float x, y, vx, vy, rx, ry, health, rotation;
    int type, theme, render_z, fire_time, spawn_time;
};

bool spawn_cmp(const Sp& a, const Sp& b) { return a.spawn_time > b.spawn_time; }

int main(int argc, char** argv) {
    if (argc != 5) return 1;
    int seed = atoi(argv[1]);
    int mode = atoi(argv[2]);
    float ta[2] = {strtof(argv[3], nullptr), strtof(argv[4], nullptr)};
    float mw = 16, mh = 16;

    float hp_vs[NUM_BASIC_OBJECTS], hp_healths[NUM_BASIC_OBJECTS];
    float hp_object_r[NUM_BASIC_OBJECTS], hp_w[NUM_BASIC_OBJECTS];
    for (int i = 0; i < NUM_BASIC_OBJECTS; i++) {
        hp_vs[i] = 1;
        hp_healths[i] = 0;
        hp_w[i] = 1;
        hp_object_r[i] = .5f;
    }
    if (mode == 0) {
        hp_w[METEOR] = hp_w[CLOUD] = hp_w[TURRET] = hp_w[FAST_FLYER] = 0;
        hp_vs[FLYER] = .75f;
        hp_vs[BULLET2] = 1.25f;
        hp_healths[TURRET] = 5;
        hp_healths[FLYER] = 2;
        hp_healths[FAST_FLYER] = 1;
    } else if (mode == 1) {
        hp_vs[BULLET2] = 2;
        hp_healths[TURRET] = 5;
        hp_healths[FLYER] = 2;
        hp_healths[FAST_FLYER] = 1;
    } else {
        hp_vs[BULLET2] = 2;
        hp_healths[TURRET] = 10;
        hp_healths[FLYER] = 5;
        hp_healths[FAST_FLYER] = 2;
    }
    hp_healths[METEOR] = 500;
    hp_vs[FAST_FLYER] = 1.5f;
    hp_vs[BULLET_PLAYER] = 2;
    hp_vs[BULLET3] = 2;
    hp_object_r[TURRET] = 2;
    hp_object_r[METEOR] = 2;
    hp_object_r[CLOUD] = 2;
    hp_w[FLYER] = 3;
    hp_w[BULLET_PLAYER] = hp_w[BULLET2] = hp_w[BULLET3] = 0;
    float total_w = 0;
    for (int i = 2; i < NUM_BASIC_OBJECTS; i++) total_w += hp_w[i];
    float hp_slow_v = .5f;
    bool can_spawn_left = mode != 0;

    Gen rg;
    rg.g.seed(seed);
    (void)rg.rand01();
    (void)rg.randn(NUM_SPACE_BACKGROUNDS);
    (void)rg.rand01();
    (void)rg.rand01();

    auto rand_pos = [&](float r, float hi) {
        if (hi <= 2 * r) return hi / 2;
        return (float)((hi - 2 * r) * rg.rand01() + r);
    };

    std::vector<Sp> spawners;
    int t = 1 + rg.randint(10, 30);
    for (int i = 0; t <= SHOOTER_WIN_TIME; i++) {
        int group_size = 1;
        float start_weight = (float)(rg.rand01() * total_w);
        float curr = start_weight;
        int type;
        for (type = 2; type < NUM_BASIC_OBJECTS; type++) {
            curr -= hp_w[type];
            if (curr <= 0) break;
        }
        if (type >= NUM_BASIC_OBJECTS) type = NUM_BASIC_OBJECTS - 1;
        float r = hp_object_r[type];
        int flyer_theme = 0;
        if (type == FLYER || type == FAST_FLYER) {
            group_size = rg.randint(0, 5) + 1;
            flyer_theme = rg.randn(NUM_SHIP_THEMES);
        }
        float y_pos = rand_pos(r, mh);
        for (int j = 0; j < group_size; j++) {
            int spawn_time = t + j * 5;
            int fire_time = rg.randint(10, 100);
            float k = 2 * PI_F / 4;
            float theta = (float)((rg.rand01() - .5) * k);
            float v_scale = hp_vs[type];
            if (rg.randint(0, 2) == 1) theta = 0;
            float health = hp_healths[type];
            if (type == METEOR || type == CLOUD) {
                theta = 0;
                v_scale = hp_slow_v;
                fire_time = -1;
            } else if (type == TURRET) {
                theta = 0;
                v_scale = hp_slow_v;
                fire_time = rg.randint(20, 30);
            }
            v_scale *= V_SCALE;
            float vx = -1 * cosf(theta) * v_scale;
            float vy = sinf(theta) * v_scale;
            bool spawn_right = true;
            float x_pos;
            if (type == FLYER || type == FAST_FLYER) {
                if (rg.rand01() > 0.9f && can_spawn_left) spawn_right = false;
            }
            if (spawn_right) {
                x_pos = mw + r;
            } else {
                x_pos = -r;
                vx *= -1;
            }
            Sp sp = {x_pos, y_pos, vx, vy, r, r, health, 0, type, 0, 0,
                     fire_time, spawn_time};
            if (type == CLOUD) {
                sp.render_z = 1;
                sp.theme = rg.randn(9);
            } else if (type == METEOR) {
                sp.theme = rg.randn(8);
            } else if (type == FLYER || type == FAST_FLYER) {
                sp.theme = flyer_theme;
                sp.rotation = ((vx > 0) ? -1 : 1) * PI_F / 2;
            } else if (type == TURRET) {
                sp.theme = rg.randn(2);
                sp.ry = sp.rx / ta[sp.theme];
            }
            spawners.push_back(sp);
        }
        t += rg.randint(10, 30);
    }
    std::stable_sort(spawners.begin(), spawners.end(), spawn_cmp);

    int agent_theme = rg.randn(1);
    (void)agent_theme;

    printf("meta %d\n", (int)spawners.size());
    for (auto& s : spawners)
        printf("sp %d %d %d %d %d %a %a %a %a %a %a %a %a\n", s.type, s.theme,
               s.render_z, s.fire_time, s.spawn_time, s.x, s.y, s.vx, s.vy,
               s.rx, s.ry, s.health, s.rotation);
    uint32_t f1 = rg.g();
    uint32_t f2 = rg.g();
    uint32_t f3 = rg.g();
    printf("fp %u %u %u\n", f1, f2, f3);
    return 0;
}
