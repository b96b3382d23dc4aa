// Levelgen conformance oracle for the fruitbot game: replays the documented
// RNG call sequence of a fruitbot level reset (base draws, wall partition,
// doors/locks, presents, good/bad object spawns with rejection sampling,
// theme sweep) on the real std::mt19937 and prints the entity list and a
// stream fingerprint.
//
// Independent reimplementation from the behavioral spec in SURVEY.md;
// procgen_tpu's JAX levelgen is diffed against it in tests/test_fruitbot.py.
// fit_aspect_ratio is omitted (no RNG; pure rx/ry rescale tested in Python).
//
// Usage: fruitbot_oracle <seed> <mode>   (mode: 0 easy, 1 hard)
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

const int PLAYER = 0, BARRIER = 1, PLAYER_BULLET = 3, BAD_OBJ = 4,
          GOOD_OBJ = 7, LOCKED_DOOR = 10, LOCK = 11, PRESENT = 12;
const float WALL_RY = 0.3f, LOCK_RX = 0.25f, LOCK_RY = 0.45f;
const float DOOR_AR = 3.25f;
const int NUM_TOPDOWN_BACKGROUNDS = 9;  // resources.cpp:900-910

struct Gen {
    std::mt19937 g;
    int randn(int high) { return (int)((uint32_t)g() % (uint32_t)high); }
    double rand01() { return (double)g() / 4294967296.0; }
};

struct Ent { float x, y, rx, ry; int type, theme; };

int main(int argc, char** argv) {
    if (argc != 3) return 1;
    int seed = atoi(argv[1]);
    int mode = atoi(argv[2]);
    int mw = mode == 0 ? 10 : 20, mh = 60;
    int num_walls = mode == 0 ? 5 : 10;
    int ogs = mode == 0 ? 2 : 6;
    double door_prob = mode == 0 ? 0.0 : 0.125;
    float min_pct = mode == 0 ? 0.2f : 0.1f;

    Gen rg;
    rg.g.seed(seed);
    (void)rg.rand01();                       // bg_pct_x
    (void)rg.randn(NUM_TOPDOWN_BACKGROUNDS); // background_index
    float ax = (float)(rg.rand01() * (mw - 0.8f) + 0.4f);
    float ay = (float)(rg.rand01() * (mh - 0.8f) + 0.4f);
    std::vector<Ent> ents;
    ents.push_back({ax, ay, 0.4f, 0.4f, PLAYER, 0});

    // partition (randgen.cpp:33-41)
    int min_sep = 4, buf_h = 4;
    int x = mh - min_sep * num_walls - buf_h;
    std::vector<int> parts(num_walls, 0);
    for (int i = 0; i < x; i++) parts[rg.randn(num_walls)]++;

    int curr_h = 0;
    for (int part : parts) {
        int dy = min_sep + part;
        curr_h += dy;
        bool use_door = (dy > 5) && rg.rand01() < door_prob;
        // add_walls(curr_h, use_door, min_pct)
        float rw = mw, ry = curr_h;
        float pct = min_pct + .2 * rg.rand01();
        if (use_door) {
            pct += 0.1f;
            float lock_pct_w = 2 * LOCK_RX / mw;
            float door_pct_w = (WALL_RY * 2 * DOOR_AR) / mw;
            int num_doors = ceil((pct - 2 * lock_pct_w) / door_pct_w);
            pct = 2 * lock_pct_w + door_pct_w * num_doors;
        }
        float gapw = pct * rw;
        float w1 = rg.rand01() * (rw - gapw);
        float w2 = rw - w1 - gapw;
        ents.push_back({w1 / 2, ry, w1 / 2, WALL_RY, BARRIER, 0});
        ents.push_back({rw - w2 / 2, ry, w2 / 2, WALL_RY, BARRIER, 0});
        if (use_door) {
            int ior = rg.randn(2);
            float lock_x = w1 + LOCK_RX + ior * (gapw - 2 * LOCK_RX);
            float door_x = w1 + gapw / 2 - (ior * 2 - 1) * LOCK_RX;
            ents.push_back({door_x, ry, gapw / 2 - LOCK_RX, WALL_RY, LOCKED_DOOR, 0});
            ents.push_back({lock_x, ry - LOCK_RY + WALL_RY, LOCK_RX, LOCK_RY, LOCK, 0});
        }
    }

    ents[0].y = ents[0].ry;  // agent->y = agent->ry

    int num_good = rg.randn(10) + 10;
    int num_bad = rg.randn(10) + 10;

    for (int i = 0; i < mw; i++) {
        int theme = rg.randn(3);
        ents.push_back({i + .5f, mh - .5f, .5f, .5f, PRESENT, theme});
    }

    // spawn_entities: reposition with agent/any-collision rejection (<=100)
    auto rand_pos = [&](float r, float lo, float hi) {
        if (hi - lo <= 2 * r) return (hi + lo) / 2;
        return (float)((hi - lo - 2 * r) * rg.rand01() + r + lo);
    };
    auto collides = [&](float ex, float ey, float r, const Ent& o, float margin) {
        return fabs(ex - o.x) < (r + o.rx + margin) &&
               fabs(ey - o.y) < (r + o.ry + margin);
    };
    auto spawn = [&](int type) {
        float ex = rand_pos(.5f, 0, mw), ey = rand_pos(.5f, 0, mh);
        int count = 0;
        auto bad_pos = [&]() {
            // has_agent_collision (margin = e1->collision_margin = 0) ||
            // has_any_collision (margin 0, all non-avoiding entities)
            if (collides(ex, ey, .5f, ents[0], 0)) return true;
            for (auto& o : ents)
                if (collides(ex, ey, .5f, o, 0)) return true;
            return false;
        };
        while (bad_pos() && count < 100) {
            ex = rand_pos(.5f, 0, mw);
            ey = rand_pos(.5f, 0, mh);
            count++;
        }
        ents.push_back({ex, ey, .5f, .5f, type, 0});
    };
    for (int i = 0; i < num_good; i++) spawn(GOOD_OBJ);
    for (int i = 0; i < num_bad; i++) spawn(BAD_OBJ);

    for (auto& e : ents)
        if (e.type == GOOD_OBJ || e.type == BAD_OBJ) e.theme = rg.randn(ogs);

    printf("meta %d %d\n", num_good, num_bad);
    printf("nents %d\n", (int)ents.size());
    for (auto& e : ents)
        printf("ent %d %d %a %a %a %a\n", e.type, e.theme, e.x, e.y, e.rx, e.ry);
    uint32_t f1 = rg.g(), f2 = rg.g(), f3 = rg.g();
    printf("fp %u %u %u\n", f1, f2, f3);
    return 0;
}
