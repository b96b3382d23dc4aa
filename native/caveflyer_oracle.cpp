// Levelgen conformance oracle for the caveflyer game: replays the documented
// RNG call sequence of a caveflyer level reset (noise, CA smoothing, best
// room, agent/goal, BFS path prune, object placement) on the real
// std::mt19937 and prints the grid, entities and a stream fingerprint.
//
// Independent reimplementation from the behavioral spec in SURVEY.md;
// procgen_tpu's JAX levelgen is diffed against it in tests/test_caveflyer.py.
// Operand-order notes (g++): in the enemy velocity expression the left
// factor's rand01 draw precedes the sign randn.
//
// Usage: caveflyer_oracle <seed> <mode>  (0 easy, 1 hard, 3 memory)
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <queue>
#include <random>
#include <set>
#include <vector>

const int PLAYER = 0, GOAL = 1, OBSTACLE = 2, TARGET = 3, ENEMY = 5,
          CAVEWALL = 8, WALL = 51, SPACE = 100, MARKER = 1003;
const int NUM_SPACE_BACKGROUNDS = 13;

struct Gen {
    std::mt19937 g;
    int randn(int high) { return (int)((uint32_t)g() % (uint32_t)high); }
    double rand01() { return (double)g() / 4294967296.0; }
    std::vector<int> simple_choose(int n, int k) {
        std::vector<int> chosen;
        std::set<int> s;
        for (int i = 0; i < k; i++) {
            int next = randn(n);
            while (s.count(next)) next = randn(n);
            chosen.push_back(next);
            s.insert(next);
        }
        return chosen;
    }
};

int W;
std::vector<int> grid;
int get_obj(int idx) {
    if (idx < 0 || idx >= W * W) return WALL;  // oob object during levelgen
    return grid[idx];
}
int get_obj(int x, int y) {
    if (x < 0 || x >= W || y < 0 || y >= W) return WALL;
    return grid[y * W + x];
}
int to_idx(int x, int y) {
    if (x < 0 || x >= W || y < 0 || y >= W) return -1;
    return y * W + x;
}

void ca_update() {
    std::vector<int> next(W * W);
    for (int i = 0; i < W * W; i++) {
        int x = i % W, y = i / W, n = 0;
        for (int a = -1; a <= 1; a++)
            for (int b = -1; b <= 1; b++)
                if (get_obj(x + a, y + b) == WALL) n++;
        next[i] = n >= 5 ? WALL : SPACE;
    }
    grid = next;
}

void build_room(int idx, std::set<int>& room) {
    if (get_obj(idx) != SPACE) return;
    std::queue<int> q;
    q.push(idx);
    while (!q.empty()) {
        int c = q.front();
        q.pop();
        if (get_obj(c) != SPACE) continue;
        int x = c % W, y = c / W;
        for (int a = -1; a <= 1; a++)
            for (int b = -1; b <= 1; b++)
                if ((a == 0 || b == 0) && (a + b != 0)) {
                    int n = to_idx(x + a, y + b);
                    if (!room.count(n) && get_obj(n) == SPACE) {
                        q.push(n);
                        room.insert(n);
                    }
                }
    }
}

void find_best_room(std::set<int>& best) {
    std::set<int> all;
    int best_size = -1;
    for (int i = 0; i < W * W; i++) {
        if (get_obj(i) == SPACE && !all.count(i)) {
            std::set<int> room;
            build_room(i, room);
            all.insert(room.begin(), room.end());
            if ((int)room.size() > best_size) {
                best_size = (int)room.size();
                best = room;
            }
        }
    }
}

void find_path(int src, int dst, std::vector<int>& path) {
    std::set<int> covered;
    std::vector<int> expanded, parents;
    if (get_obj(src) != SPACE) return;
    expanded.push_back(src);
    parents.push_back(-1);
    size_t search = 0;
    while (search < expanded.size()) {
        int c = expanded[search];
        if (c == dst) break;
        int x = c % W, y = c / W;
        for (auto [a, b] : {std::pair{-1, 0}, {0, -1}, {0, 1}, {1, 0}}) {
            int n = to_idx(x + a, y + b);
            if (!covered.count(n) && get_obj(n) == SPACE) {
                expanded.push_back(n);
                parents.push_back((int)search);
                covered.insert(n);
            }
        }
        search++;
    }
    if (search < expanded.size() && expanded[search] == dst) {
        std::vector<int> tmp;
        int k = (int)search;
        while (k >= 0) {
            tmp.push_back(expanded[k]);
            k = parents[k];
        }
        for (int j = (int)tmp.size() - 1; j >= 0; j--) path.push_back(tmp[j]);
    }
}

void expand_room(std::set<int>& s, int n) {
    std::set<int> curr(s);
    for (int loop = 0; loop < n; loop++) {
        std::set<int> next;
        for (int c : curr) {
            if (get_obj(c) != SPACE) continue;
            int x = c % W, y = c / W;
            for (int a = -1; a <= 1; a++)
                for (int b = -1; b <= 1; b++)
                    if (a != 0 || b != 0) {
                        int ni = to_idx(x + a, y + b);
                        if (!s.count(ni) && get_obj(ni) == SPACE) {
                            s.insert(ni);
                            next.insert(ni);
                        }
                    }
        }
        curr = next;
    }
}

struct Ent { float x, y, vx, vy; int type; };

int main(int argc, char** argv) {
    if (argc != 3) return 1;
    int seed = atoi(argv[1]);
    int mode = atoi(argv[2]);
    W = mode == 0 ? 30 : (mode == 3 ? 60 : 40);
    bool memory = mode == 3;

    Gen rg;
    rg.g.seed(seed);
    (void)rg.rand01();
    (void)rg.randn(NUM_SPACE_BACKGROUNDS);
    float ax = (float)(rg.rand01() * (W - 0.8f) + 0.4f);
    float ay = (float)(rg.rand01() * (W - 0.8f) + 0.4f);
    std::vector<Ent> ents;
    ents.push_back({ax, ay, 0, 0, PLAYER});

    grid.assign(W * W, SPACE);
    for (int i = 0; i < W * W; i++)
        grid[i] = rg.rand01() < .5 ? WALL : SPACE;
    for (int it = 0; it < 4; it++) ca_update();

    std::set<int> best;
    find_best_room(best);
    for (int i = 0; i < W * W; i++) grid[i] = WALL;
    std::vector<int> free_cells;
    for (int i : best) {
        grid[i] = SPACE;
        free_cells.push_back(i);
    }
    auto sel = rg.simple_choose((int)free_cells.size(), 2);
    int agent_cell = free_cells[sel[0]];
    int goal_cell = free_cells[sel[1]];
    ents[0].x = (agent_cell % W) + .5f;
    ents[0].y = (agent_cell / W) + .5f;
    ents.push_back({(goal_cell % W) + .5f, (goal_cell / W) + .5f, 0, 0, GOAL});

    std::vector<int> goal_path;
    find_path(agent_cell, goal_cell, goal_path);

    if (!memory) {
        std::set<int> wide(goal_path.begin(), goal_path.end());
        expand_room(wide, 4);
        for (int i = 0; i < W * W; i++) grid[i] = WALL;
        for (int i : wide) grid[i] = SPACE;
    }
    for (int it = 0; it < 4; it++) {
        ca_update();
        for (int i : goal_path) grid[i] = SPACE;
    }
    for (int i : goal_path) grid[i] = MARKER;

    free_cells.clear();
    for (int i = 0; i < W * W; i++) {
        if (grid[i] == SPACE) free_cells.push_back(i);
        else if (grid[i] == WALL) grid[i] = CAVEWALL;
    }
    int chunk = (int)free_cells.size() / 80;
    int num_objs = 3 * chunk;
    auto osel = rg.simple_choose((int)free_cells.size(), num_objs);
    for (int i = 0; i < num_objs; i++) {
        int val = free_cells[osel[i]];
        float x = (val % W) + .5f, y = (val / W) + .5f;
        if (i < chunk) {
            ents.push_back({x, y, 0, 0, OBSTACLE});
        } else if (i < 2 * chunk) {
            ents.push_back({x, y, 0, 0, TARGET});
        } else {
            float vel = (float)((.1 * rg.rand01() + .1) * (rg.randn(2) * 2 - 1));
            float vx = 0, vy = 0;
            if (rg.rand01() < .5) vx = vel;
            else vy = vel;
            ents.push_back({x, y, vx, vy, ENEMY});
        }
    }
    for (int i = 0; i < W * W; i++)
        if (grid[i] == MARKER) grid[i] = SPACE;

    printf("meta %d %d\n", num_objs, (int)ents.size());
    for (int y = 0; y < W; y++) {
        for (int x = 0; x < W; x++) printf("%d ", grid[y * W + x]);
        printf("\n");
    }
    for (auto& e : ents)
        printf("ent %d %a %a %a %a\n", e.type, e.x, e.y, e.vx, e.vy);
    uint32_t f1 = rg.g();
    uint32_t f2 = rg.g();
    uint32_t f3 = rg.g();
    printf("fp %u %u %u\n", f1, f2, f3);
    return 0;
}
