// Levelgen conformance oracle for the bossfight game: replays the documented
// RNG call sequence of a bossfight level reset (base draws, boss/shields,
// round parameters, themes, attack modes, reposition_agent, barrier spawns)
// on the real std::mt19937 and prints the results and a stream fingerprint.
//
// Independent reimplementation from the behavioral spec in SURVEY.md;
// procgen_tpu's JAX levelgen is diffed against it in tests/test_bossfight.py.
//
// Usage: bossfight_oracle <seed> <mode> <p0..p3> <b0..b3> <r0..r7>
//   mode: 0 easy, 1 hard; p/b/r = player/boss/barrier aspect ratios (hex
//   floats, as computed by the python asset pipeline)
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

const int PLAYER = 0, BOSS = 2, SHIELDS = 3, BARRIER = 7;
const float BOSS_R = 3.0f, BOTTOM_MARGIN = 6.0f;
const int NUM_SPACE_BACKGROUNDS = 13;

struct Gen {
    std::mt19937 g;
    int randn(int high) { return (int)((uint32_t)g() % (uint32_t)high); }
    double rand01() { return (double)g() / 4294967296.0; }
    bool randbool() { return rand01() > 0.5; }
};

struct Ent { float x, y, rx, ry; int type, theme; };

int main(int argc, char** argv) {
    if (argc != 19) return 1;
    int seed = atoi(argv[1]);
    int mode = atoi(argv[2]);
    float pa[4], ba[4], ra[8];
    for (int i = 0; i < 4; i++) pa[i] = strtof(argv[3 + i], nullptr);
    for (int i = 0; i < 4; i++) ba[i] = strtof(argv[7 + i], nullptr);
    for (int i = 0; i < 8; i++) ra[i] = strtof(argv[11 + i], nullptr);
    float mw = 20, mh = 20;
    int max_extra_invulnerable = mode == 0 ? 1 : 3;

    Gen rg;
    rg.g.seed(seed);
    (void)rg.rand01();
    (void)rg.randn(NUM_SPACE_BACKGROUNDS);
    float ax0 = (float)(rg.rand01() * (mw - 0.8f) + 0.4f);
    float ay0 = (float)(rg.rand01() * (mh - 0.8f) + 0.4f);
    std::vector<Ent> ents;
    ents.push_back({ax0, ay0, 0.4f, 0.4f, PLAYER, 0});

    int boss_theme = rg.randn(4);
    float boss_ry = BOSS_R / ba[boss_theme];
    ents.push_back({mw / 2, mh / 2, BOSS_R, boss_ry, BOSS, boss_theme});
    ents.push_back({mw / 2, mh / 2, 1.2f * BOSS_R, 1.2f * boss_ry, SHIELDS, 0});

    int round_health = rg.randn(9) + 1;
    int num_rounds = 1 + rg.randn(5);
    int invulnerable_duration = 2 + rg.randn(max_extra_invulnerable + 1);
    int boss_health = round_health * num_rounds;

    int agent_theme = rg.randn(4);
    int player_laser_theme = rg.randn(3);
    int boss_laser_theme = rg.randn(3);

    std::vector<int> attack_modes;
    for (int i = 0; i < num_rounds; i++) attack_modes.push_back(rg.randn(4));

    float arx = .75f, ary = arx / pa[agent_theme];
    ents[0].rx = arx;
    ents[0].ry = ary;
    ents[0].theme = agent_theme;
    auto collides = [&](float ex, float ey, float rx, float ry, const Ent& o,
                        float margin) {
        return fabs(ex - o.x) < (rx + o.rx + margin) &&
               fabs(ey - o.y) < (ry + o.ry + margin);
    };
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
    ents[0].y = ents[0].ry;

    int barriers_moves_right = rg.randbool() ? 1 : 0;

    int num_barriers = rg.randn(3) + 1;
    for (int i = 0; i < num_barriers; i++) {
        float barrier_r = 0.6f;
        float min_barrier_y = 2 * ents[0].ry + barrier_r + .5f;
        float ent_y = (float)(rg.rand01() * (BOTTOM_MARGIN - min_barrier_y - barrier_r) + min_barrier_y);
        float ent_x = (float)(rg.rand01() * (mw - 2 * barrier_r) + barrier_r);
        int theme = rg.randn(8);
        Ent e = {ent_x, ent_y, barrier_r, barrier_r / ra[theme], BARRIER, theme};
        bool coll = false;
        for (auto& o : ents)
            if (collides(e.x, e.y, e.rx, e.ry, o, 0)) coll = true;
        if (!coll) ents.push_back(e);
    }

    printf("meta %d %d %d %d %d %d %d %d %d\n", boss_theme, round_health,
           num_rounds, invulnerable_duration, boss_health, agent_theme,
           player_laser_theme, boss_laser_theme, barriers_moves_right);
    printf("modes");
    for (int m : attack_modes) printf(" %d", m);
    printf("\n");
    printf("nents %d\n", (int)ents.size());
    for (auto& e : ents)
        printf("ent %d %d %a %a %a %a\n", e.type, e.theme, e.x, e.y, e.rx, e.ry);
    uint32_t f1 = rg.g(), f2 = rg.g(), f3 = rg.g();
    printf("fp %u %u %u\n", f1, f2, f3);
    return 0;
}
