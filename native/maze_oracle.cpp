// Levelgen conformance oracle for the maze game: replays the documented RNG
// call sequence of a maze level reset (background draws, maze_dim draw,
// Kruskal maze with erase-ordered wall list, goal placement) on the real
// std::mt19937 and prints the resulting world grid plus a stream fingerprint.
//
// This is an independent reimplementation from the behavioral spec in
// SURVEY.md (union-find via a flat label array rather than per-cell sets);
// procgen_tpu's JAX levelgen is diffed against it in tests/test_mazegen.py.
//
// Usage: maze_oracle <seed> <world_dim>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

struct Gen {
    std::mt19937 g;
    int randn(int high) { return (int)((uint32_t)g() % (uint32_t)high); }
    float rand01() { return (float)((double)g() / 4294967296.0); }
};

int main(int argc, char** argv) {
    if (argc != 3) return 1;
    int seed = atoi(argv[1]);
    int world_dim = atoi(argv[2]);
    const int WALL = 51, SPACE = 100, GOAL = 2;

    Gen rg;
    rg.g.seed(seed);

    float bg_pct_x = rg.rand01();
    int bg_index = rg.randn(9);  // topdown_backgrounds has 9 entries
    uint32_t bg_bits;
    memcpy(&bg_bits, &bg_pct_x, 4);

    int maze_dim = rg.randn((world_dim - 1) / 2) * 2 + 3;
    int margin = (world_dim - maze_dim) / 2;
    int AD = maze_dim + 2;

    std::vector<int> grid(AD * AD, WALL);  // [y * AD + x]
    grid[1 * AD + 1] = 0;
    std::vector<int> labels(maze_dim * maze_dim);
    for (size_t i = 0; i < labels.size(); i++) labels[i] = (int)i;

    struct W4 { int x1, y1, x2, y2; };
    std::vector<W4> walls;
    for (int i = 1; i < maze_dim; i += 2)
        for (int j = 0; j < maze_dim; j += 2)
            if (i > 0 && i < maze_dim - 1) walls.push_back({i - 1, j, i + 1, j});
    for (int i = 0; i < maze_dim; i += 2)
        for (int j = 1; j < maze_dim; j += 2)
            if (j > 0 && j < maze_dim - 1) walls.push_back({i, j - 1, i, j + 1});

    std::vector<int> free_cells;
    std::vector<char> in_free(maze_dim * maze_dim, 0);
    auto set_free = [&](int x, int y) {
        grid[(y + 1) * AD + (x + 1)] = SPACE;
        int cell = maze_dim * y + x;
        if (!in_free[cell]) {
            free_cells.push_back(cell);
            in_free[cell] = 1;
        }
    };

    while (!walls.empty()) {
        int n = rg.randn((int)walls.size());
        W4 w = walls[n];
        int s0 = labels[maze_dim * w.y1 + w.x1];
        int s1 = labels[maze_dim * w.y2 + w.x2];
        int x0 = (w.x1 + w.x2) / 2, y0 = (w.y1 + w.y2) / 2;
        if (grid[(y0 + 1) * AD + (x0 + 1)] == WALL && s0 != s1) {
            set_free(w.x1, w.y1);
            set_free(x0, y0);
            set_free(w.x2, w.y2);
            for (auto& l : labels)
                if (l == s0) l = s1;
            labels[maze_dim * y0 + x0] = s1;
        }
        walls.erase(walls.begin() + n);
    }

    int m = rg.randn((int)free_cells.size());
    while (free_cells[m] == -1 || free_cells[m] == 0)
        m = rg.randn((int)free_cells.size());
    int cell = free_cells[m];
    free_cells[m] = -1;
    grid[(cell / maze_dim + 1) * AD + (cell % maze_dim + 1)] = GOAL;

    printf("bg %08x %d\n", bg_bits, bg_index);
    printf("maze_dim %d\n", maze_dim);
    for (int y = 0; y < world_dim; y++) {
        for (int x = 0; x < world_dim; x++) {
            int v = WALL;
            int mi = x - margin, mj = y - margin;
            if (mi >= 0 && mi < maze_dim && mj >= 0 && mj < maze_dim)
                v = grid[(mj + 1) * AD + (mi + 1)];
            printf("%d ", v);
        }
        printf("\n");
    }
    uint32_t f1 = rg.g();
    uint32_t f2 = rg.g();
    uint32_t f3 = rg.g();
    printf("fp %u %u %u\n", f1, f2, f3);
    return 0;
}
