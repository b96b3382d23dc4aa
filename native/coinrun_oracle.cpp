// Levelgen conformance oracle for the coinrun game: replays the documented
// RNG call sequence of a coinrun level reset (base draws, themes, section
// generation with pits/lava/saws/enemies/crates, barriers, goal) on the real
// std::mt19937 and prints the grid, entities and a stream fingerprint.
//
// Independent reimplementation from the behavioral spec in SURVEY.md;
// procgen_tpu's JAX levelgen is diffed against it in tests/test_coinrun.py.
// g++ evaluates add_entity arguments right-to-left; the only draw inside an
// argument list is the enemy vx sign, which therefore precedes the theme
// draw of choose_random_theme.
//
// Usage: coinrun_oracle <seed> <mode>   (mode: 0 easy, 1 hard)
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

const int PLAYER = 0, GOAL = 1, SAW = 2, ENEMY = 5, WALL_MID = 15,
          WALL_TOP = 16, LAVA_MID = 17, LAVA_TOP = 18, ENEMY_BARRIER = 19,
          CRATE = 20, SPACE = 100;
const int NUM_PLATFORM_BACKGROUNDS = 62;

struct Gen {
    std::mt19937 g;
    int randn(int high) { return (int)((uint32_t)g() % (uint32_t)high); }
    double rand01() { return (double)g() / 4294967296.0; }
};

struct Ent { float x, y, vx; int type, theme; };

int main(int argc, char** argv) {
    if (argc != 3) return 1;
    int seed = atoi(argv[1]);
    int mode = atoi(argv[2]);
    int mw = 64, mh = 64;
    float gravity = 0.2f, max_jump = 1.5f, maxspeed = .5f;

    Gen rg;
    rg.g.seed(seed);
    (void)rg.rand01();
    (void)rg.randn(NUM_PLATFORM_BACKGROUNDS);
    (void)rg.rand01();
    (void)rg.rand01();
    int agent_theme = 0, wall_theme = 0;
    if (mode != 0) {
        agent_theme = rg.randn(5);
        wall_theme = rg.randn(6);
    }

    std::vector<int> grid(mw * mh, SPACE);
    auto fill = [&](int x, int y, int dx, int dy, int v) {
        for (int i = x; i < x + dx; i++)
            for (int j = y; j < y + dy; j++)
                if (i >= 0 && i < mw && j >= 0 && j < mh) grid[j * mw + i] = v;
    };
    auto fill_block_top = [&](int x, int y, int dx, int dy, int f, int t) {
        fill(x, y, dx, dy - 1, f);
        fill(x, y + dy - 1, dx, 1, t);
    };
    fill(0, 0, mw, 1, WALL_TOP);
    fill(0, 0, 1, mh, WALL_MID);
    fill(mw - 1, 0, 1, mh, WALL_MID);
    fill(0, mh - 1, mw, 1, WALL_MID);

    std::vector<Ent> ents;
    ents.push_back({1.5f, 1 + 0.5787f, 0, PLAYER, agent_theme});

    auto create_enemy = [&](int x, int y) {
        float vx = .15f * (rg.randn(2) * 2 - 1);  // right-to-left arg eval
        int theme = rg.randn(9);                  // choose_random_theme
        ents.push_back({x + .5f, y + .5f, vx, ENEMY, theme});
    };
    auto is_wall = [&](int t) { return t == WALL_MID || t == WALL_TOP; };

    int dif = rg.randn(3) + 1;
    int num_sections = rg.randn(dif) + dif;
    int curr_x = 5, curr_y = 1;
    int pit_threshold = dif;
    int danger_type = rg.randn(3);
    float _max_dy = max_jump * max_jump / (2 * gravity);
    float _max_dx = maxspeed * 2 * max_jump / gravity;
    int max_dy = (int)(_max_dy - .5f);
    int max_dx = (int)(_max_dx - .5f);
    bool allow_monsters = mode != 0;

    for (int s = 0; s < num_sections; s++) {
        if (curr_x + 15 >= mw) break;
        int dy = rg.randn(4) + 1 + (int)(dif / 3);
        if (dy > max_dy) dy = max_dy;
        if (curr_y >= 20) dy *= -1;
        else if (curr_y >= 5 && rg.randn(2) == 1) dy *= -1;
        int dx = rg.randn(2 * dif) + 3 + (int)(dif / 3);
        curr_y += dy;
        if (curr_y < 1) curr_y = 1;
        bool use_pit = (dx > 7) && (curr_y > 3) && (rg.randn(20) >= pit_threshold);
        if (use_pit) {
            int x1 = rg.randn(3) + 1;
            int x2 = rg.randn(3) + 1;
            int pit_width = dx - x1 - x2;
            if (pit_width > max_dx) { pit_width = max_dx; x2 = dx - x1 - pit_width; }
            fill_block_top(curr_x, 0, x1, curr_y, WALL_MID, WALL_TOP);
            fill_block_top(curr_x + dx - x2, 0, x2, curr_y, WALL_MID, WALL_TOP);
            int lava_height = rg.randn(curr_y - 3) + 1;
            if (danger_type == 0) {
                fill_block_top(curr_x + x1, 1, pit_width, lava_height, LAVA_MID, LAVA_TOP);
            } else if (danger_type == 1) {
                for (int ei = 0; ei < pit_width; ei++)
                    ents.push_back({curr_x + x1 + ei + .5f, 1.5f, 0, SAW, 0});
            } else if (danger_type == 2) {
                for (int ei = 0; ei < pit_width; ei++)
                    create_enemy(curr_x + x1 + ei, 1);
            }
            if (pit_width > 4) {
                int x3, w1;
                if (pit_width == 5) { x3 = 1 + rg.randn(2); w1 = 1 + rg.randn(2); }
                else if (pit_width == 6) { x3 = 2 + rg.randn(2); w1 = 1 + rg.randn(2); }
                else { x3 = 2 + rg.randn(2); int x4 = 2 + rg.randn(2); w1 = pit_width - x3 - x4; }
                fill_block_top(curr_x + x1 + x3, curr_y - 1, w1, 1, WALL_MID, WALL_TOP);
            }
        } else {
            fill_block_top(curr_x, 0, dx, curr_y, WALL_MID, WALL_TOP);
            int ob1_x = -1, ob2_x = -1;
            if (rg.randn(10) < (2 * dif) && dx > 3) {
                ob1_x = curr_x + rg.randn(dx - 2) + 1;
                ents.push_back({ob1_x + .5f, curr_y + .5f, 0, SAW, 0});
            }
            if (rg.randn(10) < dif && dx > 3 && (max_dx >= 4) && allow_monsters) {
                ob2_x = curr_x + rg.randn(dx - 2) + 1;
                create_enemy(ob2_x, curr_y);
            }
            for (int ci = 0; ci < 2; ci++) {
                int crate_x = curr_x + rg.randn(dx - 2) + 1;
                if (rg.randn(2) == 1 && ob1_x != crate_x && ob2_x != crate_x) {
                    int pile_height = rg.randn(3) + 1;
                    for (int j = 0; j < pile_height; j++) {
                        int theme = rg.randn(4);  // choose_random_theme
                        ents.push_back({crate_x + .5f, curr_y + j + .5f, 0, CRATE, theme});
                    }
                }
            }
        }
        if (!is_wall(grid[curr_y * mw + (curr_x - 1)]))
            grid[curr_y * mw + (curr_x - 1)] = ENEMY_BARRIER;
        curr_x += dx;
        grid[curr_y * mw + curr_x] = ENEMY_BARRIER;
    }

    grid[curr_y * mw + curr_x] = GOAL;
    fill_block_top(curr_x, 0, 1, curr_y, WALL_MID, WALL_TOP);
    fill(curr_x + 1, 0, mw - curr_x - 1, mh, WALL_MID);

    printf("meta %d %d %d %d %d\n", dif, danger_type, agent_theme, wall_theme,
           (int)ents.size());
    for (int y = 0; y < mh; y++) {
        for (int x = 0; x < mw; x++) printf("%d ", grid[y * mw + x]);
        printf("\n");
    }
    for (auto& e : ents)
        printf("ent %d %d %a %a %a\n", e.type, e.theme, e.x, e.y, e.vx);
    uint32_t f1 = rg.g();
    uint32_t f2 = rg.g();
    uint32_t f3 = rg.g();
    printf("fp %u %u %u\n", f1, f2, f3);
    return 0;
}
