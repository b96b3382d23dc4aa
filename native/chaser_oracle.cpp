// Levelgen conformance oracle for the chaser game: replays the documented
// RNG call sequence of a chaser level reset (base draws, no-dead-ends maze,
// quadrant orb placement via simple_choose, agent/egg placement) on the real
// std::mt19937 and prints the world grid, entities and a stream fingerprint.
//
// Independent reimplementation from the behavioral spec in SURVEY.md;
// procgen_tpu's JAX levelgen is diffed against it in tests/test_chaser.py.
//
// Usage: chaser_oracle <seed> <mode>   (mode: 0 easy, 1 hard, 2 extreme)
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <set>
#include <random>
#include <vector>

const int WALL = 51, SPACE = 100;
const int LARGE_ORB = 2, ENEMY_EGG = 4, MAZE_WALL = 5;
const int MARKER = 1001, ORB = 1002;

struct Gen {
    std::mt19937 g;
    int randn(int high) { return (int)((uint32_t)g() % (uint32_t)high); }
    float rand01() { return (float)((double)g() / 4294967296.0); }
    std::vector<int> simple_choose(int n, int k) {
        std::vector<int> chosen(k, 0);
        std::set<int> s;
        for (int i = 0; i < k; i++) {
            int next = randn(n);
            while (s.count(next)) next = randn(n);
            chosen[i] = next;
            s.insert(next);
        }
        return chosen;
    }
};

struct Ent { float x, y; int type; };

int main(int argc, char** argv) {
    if (argc != 3) return 1;
    int seed = atoi(argv[1]);
    int mode = atoi(argv[2]);
    int md, total_enemies, extra_orb_sign;
    if (mode == 0) { md = 11; total_enemies = 3; extra_orb_sign = 0; }
    else if (mode == 1) { md = 13; total_enemies = 3; extra_orb_sign = -1; }
    else { md = 19; total_enemies = 5; extra_orb_sign = 1; }

    Gen rg;
    rg.g.seed(seed);
    (void)rg.rand01();           // bg_pct_x
    (void)rg.randn(1);           // background_index (topdown_simple: 1)
    (void)rg.rand01();           // agent x (random_agent_start)
    (void)rg.rand01();           // agent y

    // --- maze (no dead ends) on md x md ---
    int ad = md + 2;
    std::vector<int> grid(ad * ad, WALL);
    grid[1 * ad + 1] = 0;
    {
        std::vector<int> labels(md * md);
        for (size_t i = 0; i < labels.size(); i++) labels[i] = (int)i;
        struct W4 { int x1, y1, x2, y2; };
        std::vector<W4> walls;
        for (int i = 1; i < md; i += 2)
            for (int j = 0; j < md; j += 2)
                if (i > 0 && i < md - 1) walls.push_back({i - 1, j, i + 1, j});
        for (int i = 0; i < md; i += 2)
            for (int j = 1; j < md; j += 2)
                if (j > 0 && j < md - 1) walls.push_back({i, j - 1, i, j + 1});
        auto set_free = [&](int x, int y) { grid[(y + 1) * ad + (x + 1)] = SPACE; };
        while (!walls.empty()) {
            int n = rg.randn((int)walls.size());
            W4 w = walls[n];
            int s0 = labels[md * w.y1 + w.x1];
            int s1 = labels[md * w.y2 + w.x2];
            int x0 = (w.x1 + w.x2) / 2, y0 = (w.y1 + w.y2) / 2;
            if (grid[(y0 + 1) * ad + (x0 + 1)] == WALL && s0 != s1) {
                set_free(w.x1, w.y1); set_free(x0, y0); set_free(w.x2, w.y2);
                for (auto& l : labels) if (l == s0) l = s1;
                labels[md * y0 + x0] = s1;
            }
            walls.erase(walls.begin() + n);
        }
        // no dead ends: ascending flat scan (mazegen.cpp:189-210)
        auto get_obj = [&](int idx) {
            int x = idx % ad, y = idx / ad;
            if (x <= 0 || x >= ad - 1 || y <= 0 || y >= ad - 1) return -1;
            return grid[idx];
        };
        const int dd[4] = {-1, -ad, ad, 1};
        for (int i = 0; i < ad * ad; i++) {
            if (get_obj(i) != SPACE) continue;
            int nsp = 0;
            std::vector<int> awall;
            for (int d : dd) {
                int v = get_obj(i + d);
                if (v == SPACE) nsp++;
                if (v == WALL) awall.push_back(i + d);
            }
            if (nsp == 1 && !awall.empty())
                grid[awall[rg.randn((int)awall.size())]] = SPACE;
        }
    }

    // --- world copy + quadrant orbs (chaser.cpp:179-232) ---
    std::vector<int> wg(md * md);
    std::vector<std::vector<int>> quadrants(4);
    std::vector<int> orbs_for_quadrant;
    int extra_quad = rg.randn(4);
    for (int i = 0; i < 4; i++)
        orbs_for_quadrant.push_back(1 + (i == extra_quad ? extra_orb_sign : 0));
    for (int i = 0; i < md; i++)
        for (int j = 0; j < md; j++) {
            int obj = grid[(j + 1) * ad + (i + 1)];
            wg[j * md + i] = obj == WALL ? MAZE_WALL : obj;
            if (obj == SPACE) {
                int idx = j * md + i;
                int q = (i >= md / 2.0 ? 1 : 0) * 2 + (j >= md / 2.0 ? 1 : 0);
                quadrants[q].push_back(idx);
            }
        }
    std::vector<Ent> ents;
    for (int q = 0; q < 4; q++) {
        int num_orbs = orbs_for_quadrant[q];
        auto sel = rg.simple_choose((int)quadrants[q].size(), num_orbs);
        for (int j : sel) {
            int cell = quadrants[q][j];
            ents.push_back({(float)(cell % md) + .5f, (float)(cell / md) + .5f, LARGE_ORB});
            wg[cell] = MARKER;
        }
    }
    std::vector<int> free_cells;
    for (int i = 0; i < md * md; i++)
        if (wg[i] == SPACE) free_cells.push_back(i);
    auto sel = rg.simple_choose((int)free_cells.size(), 1 + total_enemies);
    int start = free_cells[sel[0]];
    float agent_x = (start % md) + .5f, agent_y = (start / md) + .5f;
    for (int i = 0; i < total_enemies; i++) {
        int cell = free_cells[sel[i + 1]];
        wg[cell] = MARKER;
        ents.push_back({(float)(cell % md) + .5f, (float)(cell / md) + .5f, ENEMY_EGG});
    }
    int total_orbs = (int)free_cells.size();
    for (int cell : free_cells) wg[cell] = ORB;
    for (int i = 0; i < md * md; i++)
        if (wg[i] == MARKER) wg[i] = SPACE;

    printf("meta %d %d\n", total_orbs, extra_quad);
    printf("agent %a %a\n", agent_x, agent_y);
    for (int y = 0; y < md; y++) {
        for (int x = 0; x < md; x++) printf("%d ", wg[y * md + x]);
        printf("\n");
    }
    printf("nents %d\n", (int)ents.size());
    for (auto& e : ents) printf("ent %d %a %a\n", e.type, e.x, e.y);
    uint32_t f1 = rg.g(), f2 = rg.g(), f3 = rg.g();
    printf("fp %u %u %u\n", f1, f2, f3);
    return 0;
}
