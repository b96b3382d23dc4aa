// Levelgen conformance oracle for the heist game: replays the documented RNG
// call sequence of a heist level reset (base draws, difficulty/num_keys,
// Kruskal maze, generate_maze_with_doors with std::set BFS semantics,
// offsets, entity spawns with rejection) on the real std::mt19937 and prints
// the world grid, the entity table and a stream fingerprint.
//
// Independent reimplementation from the behavioral spec in SURVEY.md;
// procgen_tpu's JAX levelgen is diffed against it in tests/test_heist.py.
//
// Usage: heist_oracle <seed> <mode>   (mode: 0 easy, 1 hard, 10 memory)
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <set>
#include <vector>

const int WALL = 51, SPACE = 100, EXIT_OBJ = 52, AGENT_OBJ = 53;
const int DOOR_OBJ = 200, KEY_OBJ = 300, INVALID = -1;
const int LOCKED_DOOR = 1, KEY = 2, EXIT = 9, PLAYER = 0;

struct Gen {
    std::mt19937 g;
    int randn(int high) { return (int)((uint32_t)g() % (uint32_t)high); }
    float rand01() { return (float)((double)g() / 4294967296.0); }
    int choose_one(const std::vector<int>& v) { return v[randn((int)v.size())]; }
    std::vector<int> choose_n(const std::vector<int>& elems, int n) {
        std::vector<int> chosen, rem(elems);
        if (n > (int)elems.size()) return rem;
        while ((int)chosen.size() < n) {
            int k = randn((int)rem.size());
            chosen.push_back(rem[k]);
            rem.erase(rem.begin() + k);
        }
        return chosen;
    }
};

struct Maze {
    Gen* rg;
    int md, ad;
    std::vector<int> grid;  // [y * ad + x]
    Maze(Gen* g, int maze_dim) : rg(g), md(maze_dim), ad(maze_dim + 2) {}

    int get_obj(int idx) {
        int x = idx % ad, y = idx / ad;
        if (x <= 0 || x >= ad - 1 || y <= 0 || y >= ad - 1) return INVALID;
        return grid[idx];
    }
    void neighbors(int idx, int type, std::vector<int>& out) {
        int x = idx % ad, y = idx / ad;
        out.clear();
        const int dd[4][2] = {{-1, 0}, {0, -1}, {0, 1}, {1, 0}};
        for (auto& d : dd) {
            int n = (y + d[1]) * ad + (x + d[0]);
            if (get_obj(n) == type) out.push_back(n);
        }
    }
    int expand_to_type(std::set<int>& s0, std::set<int>& s1, int type) {
        std::set<int> curr = s0;
        std::vector<int> telems, aspace;
        while (!curr.empty()) {
            std::set<int> next;
            for (int elem : curr) {
                neighbors(elem, type, telems);
                neighbors(elem, SPACE, aspace);
                for (int j : aspace)
                    if (!s0.count(j) && !s1.count(j)) { next.insert(j); s1.insert(j); }
                if (!telems.empty()) return telems[0];
            }
            curr = next;
        }
        return -1;
    }
    void generate() {
        grid.assign(ad * ad, WALL);
        grid[1 * ad + 1] = 0;
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
            int n = rg->randn((int)walls.size());
            W4 w = walls[n];
            int s0 = labels[md * w.y1 + w.x1];
            int s1 = labels[md * w.y2 + w.x2];
            int x0 = (w.x1 + w.x2) / 2, y0 = (w.y1 + w.y2) / 2;
            if (grid[(y0 + 1) * ad + (x0 + 1)] == WALL && s0 != s1) {
                set_free(w.x1, w.y1);
                set_free(x0, y0);
                set_free(w.x2, w.y2);
                for (auto& l : labels)
                    if (l == s0) l = s1;
                labels[md * y0 + x0] = s1;
            }
            walls.erase(walls.begin() + n);
        }
    }
    void generate_with_doors(int num_doors) {
        generate();
        std::vector<int> forks, aspace, awall;
        for (int i = 0; i < ad * ad; i++)
            if (get_obj(i) == SPACE) {
                neighbors(i, SPACE, aspace);
                neighbors(i, WALL, awall);
                if ((int)aspace.size() > 2) forks.push_back(i);
            }
        std::vector<int> chosen = rg->choose_n(forks, num_doors);
        num_doors = (int)chosen.size();
        for (int i : chosen) grid[i] = DOOR_OBJ;

        int agent_cell;
        {
            std::vector<int> sc;
            for (int i = 0; i < ad * ad; i++)
                if (get_obj(i) == SPACE) sc.push_back(i);
            std::vector<int> dn;
            do {
                agent_cell = rg->choose_one(sc);
                neighbors(agent_cell, DOOR_OBJ, dn);
            } while (!dn.empty());
            grid[agent_cell] = AGENT_OBJ;
        }
        std::set<int> s0;
        s0.insert(agent_cell);
        for (int dn = 0; dn < num_doors + 1; dn++) {
            std::set<int> s1;
            int found_door = -1;
            if (dn < num_doors) {
                found_door = expand_to_type(s0, s1, DOOR_OBJ);
                grid[found_door] = DOOR_OBJ + dn + 1;
                s0.insert(s1.begin(), s1.end());
            }
            expand_to_type(s0, s1, -999);
            std::vector<int> sc(s1.begin(), s1.end());
            int key_cell = rg->choose_one(sc);
            grid[key_cell] = dn == num_doors ? EXIT_OBJ : (KEY_OBJ + dn + 1);
            s0.insert(s1.begin(), s1.end());
            if (found_door >= 0) s0.insert(found_door);
        }
    }
};

struct Ent { float x, y, rx, ry; int type, theme; };

int main(int argc, char** argv) {
    if (argc != 3) return 1;
    int seed = atoi(argv[1]);
    int mode = atoi(argv[2]);
    int world_dim = mode == 0 ? 9 : (mode == 1 ? 13 : 23);

    Gen rg;
    rg.g.seed(seed);

    float bg_pct_x = rg.rand01();
    int bg_index = rg.randn(9);  // topdown_backgrounds: 9 entries
    (void)bg_pct_x; (void)bg_index;
    float agent_x = rg.rand01() * (world_dim - 0.8f) + 0.4f;
    float agent_y = rg.rand01() * (world_dim - 0.8f) + 0.4f;
    (void)agent_x; (void)agent_y;

    int max_diff = (world_dim - 5) / 2;
    int difficulty = rg.randn(max_diff + 1);
    int num_keys = mode == 10 ? rg.randn(4) : difficulty + rg.randn(2);
    if (num_keys > 3) num_keys = 3;
    int maze_dim = difficulty * 2 + 5;
    float maze_scale = 1.0f;

    std::vector<Ent> ents;
    Ent agent{-1.f, -1.f, 0.375f * maze_scale, 0.375f * maze_scale, PLAYER, 0};

    Maze mg(&rg, maze_dim);
    mg.generate_with_doors(num_keys);

    int off_x = rg.randn(world_dim - maze_dim + 1);
    int off_y = rg.randn(world_dim - maze_dim + 1);

    std::vector<int> wgrid(world_dim * world_dim, WALL);

    auto has_coll = [&](float x, float y, float rx, float ry, const Ent& e,
                        float margin) {
        return fabsf(x - e.x) < rx + e.rx + margin &&
               fabsf(y - e.y) < ry + e.ry + margin;
    };
    auto rand_pos = [&](float r, float mn, float mx) {
        if (mx - mn <= 2 * r) return (mx + mn) / 2;
        return (mx - mn - 2 * r) * rg.rand01() + r + mn;
    };
    auto spawn = [&](float r, int type, float bx, float by, float w, float h) {
        Ent e{0, 0, r, r, type, 0};
        e.x = rand_pos(r, bx, bx + w);
        e.y = rand_pos(r, by, by + h);
        int count = 0;
        auto bad = [&]() {
            if (type != PLAYER && has_coll(e.x, e.y, e.rx, e.ry, agent, 0)) return true;
            for (int i = (int)ents.size() - 1; i >= 0; i--)
                if (has_coll(e.x, e.y, e.rx, e.ry, ents[i], 0)) return true;
            // has_any_collision also tests vs the agent (entities[0])
            if (has_coll(e.x, e.y, e.rx, e.ry, agent, 0)) return true;
            return false;
        };
        while (bad() && count < 100) {
            e.x = rand_pos(r, bx, bx + w);
            e.y = rand_pos(r, by, by + h);
            count++;
        }
        return e;
    };

    for (int i = 0; i < maze_dim; i++) {
        for (int j = 0; j < maze_dim; j++) {
            int x = off_x + i, y = off_y + j;
            int obj = mg.grid[(j + 1) * mg.ad + (i + 1)];
            float obj_x = (x + .5f) * maze_scale, obj_y = (y + .5f) * maze_scale;
            if (obj != WALL) wgrid[y * world_dim + x] = SPACE;
            if (obj >= KEY_OBJ) {
                Ent e = spawn(.375f * maze_scale, KEY, maze_scale * x,
                              maze_scale * y, maze_scale, maze_scale);
                e.theme = obj - KEY_OBJ - 1;
                ents.push_back(e);
            } else if (obj >= DOOR_OBJ) {
                Ent e{obj_x, obj_y, maze_scale / 2, maze_scale / 2, LOCKED_DOOR,
                      obj - DOOR_OBJ - 1};
                ents.push_back(e);
            } else if (obj == EXIT_OBJ) {
                Ent e = spawn(.375f * maze_scale, EXIT, maze_scale * x,
                              maze_scale * y, maze_scale, maze_scale);
                ents.push_back(e);
            } else if (obj == AGENT_OBJ) {
                agent.x = obj_x;
                agent.y = obj_y;
            }
        }
    }

    printf("meta %d %d %d %d\n", num_keys, maze_dim, off_x, off_y);
    printf("agent %a %a\n", agent.x, agent.y);
    for (int y = 0; y < world_dim; y++) {
        for (int x = 0; x < world_dim; x++) printf("%d ", wgrid[y * world_dim + x]);
        printf("\n");
    }
    printf("nents %d\n", (int)ents.size());
    for (auto& e : ents)
        printf("ent %d %d %a %a\n", e.type, e.theme, e.x, e.y);
    uint32_t f1 = rg.g(), f2 = rg.g(), f3 = rg.g();
    printf("fp %u %u %u\n", f1, f2, f3);
    return 0;
}
