// Levelgen conformance oracle for the ninja game: replays the documented RNG
// call sequence of a ninja level reset (base draws, difficulty, wall theme,
// section-based ledge generation with bombs, goal) on the real std::mt19937
// and prints the grid, goal and a stream fingerprint.
//
// Independent reimplementation from the behavioral spec in SURVEY.md;
// procgen_tpu's JAX levelgen is diffed against it in tests/test_ninja.py.
//
// Usage: ninja_oracle <seed> <mode>   (mode: 0 easy, 1 hard)
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

const int GOAL = 1, BOMB = 6, FIRE = 14, WALL_MID = 20, SPACE = 100;
const int NUM_PLATFORM_BACKGROUNDS = 62;

struct Gen {
    std::mt19937 g;
    int randn(int high) { return (int)((uint32_t)g() % (uint32_t)high); }
    double rand01() { return (double)g() / 4294967296.0; }
};

int main(int argc, char** argv) {
    if (argc != 3) return 1;
    int seed = atoi(argv[1]);
    int mode = atoi(argv[2]);
    int mw = 64, mh = 64;
    float max_jump = mode == 0 ? 1.25f : 1.5f;
    float gravity = 0.2f;

    Gen rg;
    rg.g.seed(seed);
    (void)rg.rand01();
    (void)rg.randn(NUM_PLATFORM_BACKGROUNDS);
    (void)rg.rand01();  // agent x (overwritten)
    (void)rg.rand01();  // agent y

    int difficulty = rg.randn(3) + 1;
    int wall_theme = rg.randn(3);

    std::vector<int> grid(mw * mh, SPACE);
    auto fill = [&](int x, int y, int dx, int dy, int v) {
        for (int i = x; i < x + dx; i++)
            for (int j = y; j < y + dy; j++)
                if (i >= 0 && i < mw && j >= 0 && j < mh) grid[j * mw + i] = v;
    };
    fill(0, 0, mw, 1, WALL_MID);
    fill(0, 0, 1, mh, WALL_MID);
    fill(mw - 1, 0, 1, mh, WALL_MID);
    fill(0, mh - 1, mw, 1, WALL_MID);

    // generate_coin_to_the_right(difficulty)
    int min_gap = difficulty - 1;
    int min_plat_w = 1, inc_dy = 4;
    if (mode == 0) {
        min_gap -= 1;
        if (min_gap < 0) min_gap = 0;
        min_plat_w = 3;
        inc_dy = 2;
    }
    float bomb_prob = .25f * (difficulty - 1);
    int max_gap_inc = difficulty == 1 ? 1 : 2;
    int num_sections = rg.randn(difficulty) + difficulty;
    int start_x = 5;
    int curr_x = start_x;
    int curr_y = mh / 2;
    int min_y = curr_y;
    float _max_dy = max_jump * max_jump / (2 * gravity);
    int max_dy = (int)(_max_dy - .5f);

    fill(0, 0, start_x, curr_y, WALL_MID);
    fill(0, curr_y + 8, start_x, mh - curr_y - 8, WALL_MID);

    for (int i = 0; i < num_sections; i++) {
        int prev_x = curr_x;
        int prev_y = curr_y;
        int num_edges = rg.randn(2) + 1;
        int max_y = -1;
        int last_edge_y = -1;
        for (int j = 0; j < num_edges; j++) {
            curr_x = prev_x + j;
            if (curr_x + 15 >= mw) break;
            curr_y = prev_y;
            int dy = rg.randn(inc_dy) + 1 + (int)(difficulty / 3);
            if (dy > max_dy) dy = max_dy;
            if (curr_y >= mh - 15) dy *= -1;
            else if (curr_y >= 5 && rg.rand01() < .4) dy *= -1;
            curr_y += dy;
            if (curr_y < 3) curr_y = 3;
            if (abs(curr_y - last_edge_y) <= 1) curr_y = last_edge_y + 2;
            int dx = min_plat_w + rg.randn(3);
            fill(curr_x, curr_y - 1, dx, 1, WALL_MID);
            curr_x += dx;
            curr_x += min_gap + rg.randn(max_gap_inc + 1);
            if (curr_y > max_y) max_y = curr_y;
            if (curr_y < min_y) min_y = curr_y;
            last_edge_y = curr_y;
        }
        if (rg.rand01() < bomb_prob) {
            int bx = rg.randn(curr_x - prev_x + 1) + prev_x;
            if (bx >= 0 && bx < mw && max_y + 2 >= 0 && max_y + 2 < mh)
                grid[(max_y + 2) * mw + bx] = BOMB;
        }
        int ceiling_start = max_y - 1 + 11;
        fill(prev_x, ceiling_start, curr_x - prev_x, mh - ceiling_start, WALL_MID);
    }

    int goal_theme = rg.randn(6);
    float goal_x = curr_x + .5f, goal_y = curr_y + .5f;
    fill(curr_x, curr_y - 1, 1, 1, WALL_MID);
    fill(curr_x, curr_y + 6, 1, mh - curr_y - 6, WALL_MID);
    int fire_y = min_y - 2;
    if (fire_y < 1) fire_y = 1;
    fill(start_x, 0, mw - start_x, fire_y, WALL_MID);
    fill(start_x, fire_y, mw - start_x, 1, FIRE);
    fill(curr_x + 1, 0, mw - curr_x - 1, mh, WALL_MID);

    printf("meta %d %d %d %a %a\n", difficulty, wall_theme, goal_theme,
           goal_x, goal_y);
    for (int y = 0; y < mh; y++) {
        for (int x = 0; x < mw; x++) printf("%d ", grid[y * mw + x]);
        printf("\n");
    }
    uint32_t f1 = rg.g();
    uint32_t f2 = rg.g();
    uint32_t f3 = rg.g();
    printf("fp %u %u %u\n", f1, f2, f3);
    return 0;
}
