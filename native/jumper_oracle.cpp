// Levelgen conformance oracle for the jumper game: replays the documented
// RNG call sequence of a jumper level reset (maze-biased CA noise, border,
// best room, goal/agent picks, BFS path prune, spikes, wall fixes, top caps)
// on the real std::mt19937 and prints the grid, entities and a fingerprint.
//
// Independent reimplementation from the behavioral spec in SURVEY.md;
// procgen_tpu's JAX levelgen is diffed against it in tests/test_jumper.py.
//
// Usage: jumper_oracle <seed> <mode>  (0 easy, 1 hard, 3 memory)
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <queue>
#include <random>
#include <set>
#include <vector>

const int PLAYER = 0, GOAL = 1, SPIKE = 2, CAVEWALL = 6, CAVEWALL_TOP = 7;
const int WALL = 51, SPACE = 100;
const int NUM_PLATFORM_BACKGROUNDS = 62;
const int MAZE_SCALE = 3;

struct Gen {
    std::mt19937 g;
    int randn(int high) { return (int)((uint32_t)g() % (uint32_t)high); }
    double rand01() { return (double)g() / 4294967296.0; }
};

int W;
std::vector<int> grid;
int get_obj(int x, int y) {
    if (x < 0 || x >= W || y < 0 || y >= W) return WALL;  // oob during gen
    return grid[y * W + x];
}
int to_idx(int x, int y) {
    if (x < 0 || x >= W || y < 0 || y >= W) return -1;
    return y * W + x;
}
int get_obj_i(int idx) {
    if (idx < 0 || idx >= W * W) return WALL;
    return grid[idx];
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
    if (get_obj_i(idx) != SPACE) return;
    std::queue<int> q;
    q.push(idx);
    while (!q.empty()) {
        int c = q.front();
        q.pop();
        if (get_obj_i(c) != SPACE) continue;
        int x = c % W, y = c / W;
        for (int a = -1; a <= 1; a++)
            for (int b = -1; b <= 1; b++)
                if ((a == 0 || b == 0) && (a + b != 0)) {
                    int n = to_idx(x + a, y + b);
                    if (!room.count(n) && get_obj_i(n) == SPACE) {
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
        if (get_obj_i(i) == SPACE && !all.count(i)) {
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
    if (get_obj_i(src) != SPACE) return;
    expanded.push_back(src);
    parents.push_back(-1);
    size_t search = 0;
    while (search < expanded.size()) {
        int c = expanded[search];
        if (c == dst) break;
        int x = c % W, y = c / W;
        for (auto [a, b] : {std::pair{-1, 0}, {0, -1}, {0, 1}, {1, 0}}) {
            int n = to_idx(x + a, y + b);
            if (!covered.count(n) && get_obj_i(n) == SPACE) {
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
            if (get_obj_i(c) != SPACE) continue;
            int x = c % W, y = c / W;
            for (int a = -1; a <= 1; a++)
                for (int b = -1; b <= 1; b++)
                    if (a != 0 || b != 0) {
                        int ni = to_idx(x + a, y + b);
                        if (!s.count(ni) && get_obj_i(ni) == SPACE) {
                            s.insert(ni);
                            next.insert(ni);
                        }
                    }
        }
        curr = next;
    }
}

bool is_space_on_ground(int x, int y) {
    if (get_obj(x, y) != SPACE) return false;
    if (get_obj(x, y + 1) != SPACE) return false;
    int below = get_obj(x, y - 1);
    return below == CAVEWALL || below == WALL;  // oob object is WALL here
}
bool is_left_wall(int x, int y) {
    return get_obj(x, y) == CAVEWALL && get_obj(x + 1, y) == SPACE;
}
bool is_right_wall(int x, int y) {
    return get_obj(x, y) == CAVEWALL && get_obj(x - 1, y) == SPACE;
}

struct Ent { float x, y; int type; };

int main(int argc, char** argv) {
    if (argc != 3) return 1;
    int seed = atoi(argv[1]);
    int mode = atoi(argv[2]);
    W = mode == 0 ? 20 : (mode == 3 ? 45 : 40);
    bool memory = mode == 3;
    double spike_prob = memory ? 0.0 : 0.2;

    Gen rg;
    rg.g.seed(seed);
    (void)rg.rand01();
    (void)rg.randn(NUM_PLATFORM_BACKGROUNDS);
    (void)rg.rand01();
    (void)rg.rand01();

    int wall_theme = rg.randn(4);

    // maze (no dead ends) on maze_dim = W / 3 (jumper.cpp:245-247)
    int md = W / MAZE_SCALE;
    int ad = md + 2;
    std::vector<int> mg(ad * ad, WALL);
    mg[1 * ad + 1] = 0;
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
        auto set_free = [&](int x, int y) { mg[(y + 1) * ad + (x + 1)] = SPACE; };
        while (!walls.empty()) {
            int n = rg.randn((int)walls.size());
            W4 w = walls[n];
            int s0 = labels[md * w.y1 + w.x1];
            int s1 = labels[md * w.y2 + w.x2];
            int x0 = (w.x1 + w.x2) / 2, y0 = (w.y1 + w.y2) / 2;
            if (mg[(y0 + 1) * ad + (x0 + 1)] == WALL && s0 != s1) {
                set_free(w.x1, w.y1);
                set_free(x0, y0);
                set_free(w.x2, w.y2);
                for (auto& l : labels)
                    if (l == s0) l = s1;
                labels[md * y0 + x0] = s1;
            }
            walls.erase(walls.begin() + n);
        }
        auto gobj = [&](int idx) {
            int x = idx % ad, y = idx / ad;
            if (x <= 0 || x >= ad - 1 || y <= 0 || y >= ad - 1) return -1;
            return mg[idx];
        };
        const int dd[4] = {-1, -ad, ad, 1};
        for (int i = 0; i < ad * ad; i++) {
            if (gobj(i) != SPACE) continue;
            int nsp = 0;
            std::vector<int> awall;
            for (int d : dd) {
                int v = gobj(i + d);
                if (v == SPACE) nsp++;
                if (v == WALL) awall.push_back(i + d);
            }
            if (nsp == 1 && !awall.empty())
                mg[awall[rg.randn((int)awall.size())]] = SPACE;
        }
    }

    grid.assign(W * W, SPACE);
    for (int i = 0; i < W * W; i++) {
        int obj = mg[((i / W) / MAZE_SCALE + 1) * ad + ((i % W) / MAZE_SCALE + 1)];
        double prob = obj == WALL ? .8 : .2;
        grid[i] = rg.rand01() < prob ? WALL : SPACE;
    }
    for (int it = 0; it < 2; it++) ca_update();
    for (int i = 0; i < W; i++) {
        grid[0 * W + i] = CAVEWALL;
        grid[(W - 1) * W + i] = CAVEWALL;
        grid[i * W + 0] = CAVEWALL;
        grid[i * W + (W - 1)] = CAVEWALL;
    }

    std::set<int> best;
    find_best_room(best);
    for (int i = 0; i < W * W; i++) grid[i] = CAVEWALL;
    std::vector<int> free_cells;
    for (int i : best) {
        grid[i] = SPACE;
        free_cells.push_back(i);
    }
    int goal_cell = free_cells[rg.randn((int)free_cells.size())];

    std::vector<int> agent_candidates;
    for (int i = 0; i < W * W; i++)
        if (is_space_on_ground(i % W, i / W)) agent_candidates.push_back(i);
    int agent_cell = agent_candidates[rg.randn((int)agent_candidates.size())];

    std::vector<int> goal_path;
    find_path(agent_cell, goal_cell, goal_path);

    if (!memory) {
        std::set<int> wide(goal_path.begin(), goal_path.end());
        expand_room(wide, 4);
        for (int i = 0; i < W * W; i++) grid[i] = CAVEWALL;
        for (int i : wide) grid[i] = SPACE;
    }

    std::vector<Ent> ents;
    ents.push_back({(agent_cell % W) + .5f, (agent_cell / W) + .4f, PLAYER});
    ents.push_back({(goal_cell % W) + .5f, (goal_cell / W) + .5f, GOAL});

    for (int i = 0; i < W * W; i++) {
        int x = i % W, y = i / W;
        if (is_space_on_ground(x, y) &&
            (is_space_on_ground(x - 1, y) && is_space_on_ground(x + 1, y))) {
            if (rg.rand01() < spike_prob) grid[y * W + x] = SPIKE;
        }
    }
    for (int i = 0; i < W * W; i++) {
        int x = i % W, y = i / W;
        if (is_left_wall(x, y) && is_left_wall(x, y + 1) && is_left_wall(x, y + 2))
            grid[(y + rg.randn(3)) * W + x] = SPACE;
        if (is_right_wall(x, y) && is_right_wall(x, y + 1) && is_right_wall(x, y + 2))
            grid[(y + rg.randn(3)) * W + x] = SPACE;
    }

    for (int i = 0; i < W * W; i++) {
        if (grid[i] == SPIKE) {
            grid[i] = SPACE;
            ents.push_back({(i % W) + .5f, (i / W) + .4f, SPIKE});
        }
    }
    for (int i = 0; i < W * W; i++) {
        int x = i % W, y = i / W;
        if (get_obj(x, y) == CAVEWALL && get_obj(x, y + 1) == SPACE)
            grid[y * W + x] = CAVEWALL_TOP;
    }

    printf("meta %d %d %d\n", wall_theme, (int)ents.size(), goal_cell);
    for (int y = 0; y < W; y++) {
        for (int x = 0; x < W; x++) printf("%d ", grid[y * W + x]);
        printf("\n");
    }
    for (auto& e : ents) printf("ent %d %a %a\n", e.type, e.x, e.y);
    uint32_t f1 = rg.g();
    uint32_t f2 = rg.g();
    uint32_t f3 = rg.g();
    printf("fp %u %u %u\n", f1, f2, f3);
    return 0;
}
