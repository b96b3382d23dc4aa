// Levelgen conformance oracle for the climber game: replays the documented
// RNG call sequence of a climber level reset (base draws, themes, platform
// generation with enemies and coins) on the real std::mt19937 and prints the
// grid, entities and a stream fingerprint.
//
// Independent reimplementation from the behavioral spec in SURVEY.md;
// procgen_tpu's JAX levelgen is diffed against it in tests/test_climber.py.
// Note: g++ evaluates add_entity's arguments right-to-left, so the enemy
// vx draw precedes its y-offset draw (verified with a standalone probe).
//
// Usage: climber_oracle <seed> <mode>   (mode: 0 easy, 1 hard)
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

const int PLAYER = 0, COIN = 1, ENEMY = 5, WALL_MID = 15, WALL_TOP = 16;
const int SPACE = 100;
const int NUM_PLATFORM_BACKGROUNDS = 62;  // 49 platform + 13 space appended

struct Gen {
    std::mt19937 g;
    int randn(int high) { return (int)((uint32_t)g() % (uint32_t)high); }
    double rand01() { return (double)g() / 4294967296.0; }
    int choose_one(const std::vector<int>& v) { return v[randn((int)v.size())]; }
};

struct Ent { float x, y, vx; int type; };

int main(int argc, char** argv) {
    if (argc != 3) return 1;
    int seed = atoi(argv[1]);
    int mode = atoi(argv[2]);
    int mw = mode == 0 ? 16 : 20, mh = 64;
    double enemy_prob = mode == 0 ? .2 : .5;

    Gen rg;
    rg.g.seed(seed);
    (void)rg.rand01();
    (void)rg.randn(NUM_PLATFORM_BACKGROUNDS);
    (void)rg.rand01();  // agent x (overwritten)
    (void)rg.rand01();  // agent y
    int agent_theme = rg.randn(4);
    int wall_theme = rg.randn(4);

    std::vector<int> grid(mw * mh, SPACE);
    auto set_obj = [&](int x, int y, int v) { grid[y * mw + x] = v; };
    for (int x = 0; x < mw; x++) set_obj(x, 0, WALL_TOP);
    for (int y = 0; y < mh; y++) { set_obj(0, y, WALL_MID); set_obj(mw - 1, y, WALL_MID); }
    for (int x = 0; x < mw; x++) set_obj(x, mh - 1, WALL_MID);

    std::vector<Ent> ents;
    ents.push_back({1.5f, 1.5f, 0, PLAYER});

    int difficulty = rg.randn(3);
    int min_platforms = difficulty * difficulty + 1;
    int max_platforms = (difficulty + 1) * (difficulty + 1) + 1;
    int num_platforms = rg.randn(max_platforms - min_platforms + 1) + min_platforms;
    int coin_quota = 0;
    int curr_x = rg.randn(mw - 4) + 2;
    int curr_y = 0;
    int margin_x = 3;
    int max_dy = (int)(1.5f * 1.5f / (2 * 0.2f));

    for (int i = 0; i < num_platforms; i++) {
        int delta_y = rg.randn(max_dy - 3 + 1) + 3;
        bool can_spawn_enemy = (curr_x >= margin_x) && (curr_x <= mw - margin_x);
        if (can_spawn_enemy && (rg.rand01() < enemy_prob)) {
            // right-to-left arg evaluation: vx sign drawn before y offset
            float vx = .15f * (rg.randn(2) * 2 - 1);
            float ey = curr_y + rg.randn(2) + 2 + .5f;
            ents.push_back({curr_x + .5f, ey, vx, ENEMY});
        }
        curr_y += delta_y;
        int plat_len = 2 + rg.randn(10);
        int vx = rg.randn(2) * 2 - 1;
        if (curr_x < margin_x) vx = 1;
        if (curr_x > mw - margin_x) vx = -1;
        std::vector<int> candidates;
        for (int j = 0; j < plat_len; j++) {
            int nx = curr_x + (j + 1) * vx;
            if (nx <= 0 || nx >= mw - 1) break;
            candidates.push_back(nx);
            set_obj(nx, curr_y, WALL_TOP);
        }
        if (rg.rand01() < .5 || i == num_platforms - 1) {
            int coin_x = rg.choose_one(candidates);
            ents.push_back({coin_x + .5f, curr_y + 1.5f, 0, COIN});
            coin_quota += 1;
        }
        curr_x = rg.choose_one(candidates);
    }

    printf("meta %d %d %d %d %d\n", agent_theme, wall_theme, num_platforms,
           coin_quota, (int)ents.size());
    for (int y = 0; y < mh; y++) {
        for (int x = 0; x < mw; x++) printf("%d ", grid[y * mw + x]);
        printf("\n");
    }
    for (auto& e : ents) printf("ent %d %a %a %a\n", e.type, e.x, e.y, e.vx);
    uint32_t f1 = rg.g();
    uint32_t f2 = rg.g();
    uint32_t f3 = rg.g();
    printf("fp %u %u %u\n", f1, f2, f3);
    return 0;
}
