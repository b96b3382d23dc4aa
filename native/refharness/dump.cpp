// Golden-rollout dumper: drives the REFERENCE procgen implementation
// (compiled Qt-free from /root/reference/procgen/src against the stub
// headers in qtstub/) through the libenv C ABI and records, per step:
// actions, rewards, first flags, info ints, and full get_state byte blobs.
//
// This implements the data-producing half of the reference's own
// state_test.py:65-124 conformance protocol; tests/test_ref_parity.py
// replays the same actions through procgen_tpu and diffs everything.
//
// Usage: refdump <game> <num_envs> <steps> <rand_seed> <num_levels>
//                <start_level> <dist_mode> <out_path> [actions_path]
//
// Output format (little-endian):
//   int32 num_envs, int32 steps
//   initial: per env: int32 state_len, bytes; float rew[N]; uint8 first[N]
//   per step: int32 actions[N]; float rew[N]; uint8 first[N];
//             int32 prev_level_seed[N]; uint8 prev_level_complete[N];
//             int32 level_seed[N];
//             per env: int32 state_len, bytes
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>

#include "libenv.h"

#ifdef PIXDUMP_REAL_QT
// Real-Qt pixel build (qtreal/ ABI-shim headers + libQt5Gui): additionally
// dumps the reference's actual Qt-rasterized 64x64 rgb observations to
// <out>.rgb, for tools/pixel_conformance.py.  Needs a QGuiApplication so
// the raster paint engine initializes; run under QT_QPA_PLATFORM=offscreen.
#include <QImage>
#endif

extern "C" {
LIBENV_API int get_state(libenv_env *handle, int env_idx, char *data, int length);
LIBENV_API void set_state(libenv_env *handle, int env_idx, char *data, int length);
}

static const int MAX_STATE_SIZE = 1 << 20;  // env.py:12

struct OptBuilder {
    std::vector<libenv_option> items;
    std::vector<std::string> str_store;
    std::vector<int32_t> int_store;
    std::vector<uint8_t> bool_store;

    OptBuilder() {
        str_store.reserve(64);
        int_store.reserve(64);
        bool_store.reserve(64);
    }
    void add_str(const char *name, const std::string &v) {
        str_store.push_back(v);
        libenv_option o{};
        snprintf(o.name, sizeof(o.name), "%s", name);
        o.dtype = LIBENV_DTYPE_UINT8;
        o.count = (int)str_store.back().size();
        o.data = (void *)str_store.back().data();
        items.push_back(o);
    }
    void add_int(const char *name, int32_t v) {
        int_store.push_back(v);
        libenv_option o{};
        snprintf(o.name, sizeof(o.name), "%s", name);
        o.dtype = LIBENV_DTYPE_INT32;
        o.count = 1;
        o.data = (void *)&int_store.back();
        items.push_back(o);
    }
    void add_bool(const char *name, bool v) {
        bool_store.push_back(v ? 1 : 0);
        libenv_option o{};
        snprintf(o.name, sizeof(o.name), "%s", name);
        o.dtype = LIBENV_DTYPE_UINT8;
        o.count = 1;
        o.data = (void *)&bool_store.back();
        items.push_back(o);
    }
    libenv_options build() {
        libenv_options o;
        o.items = items.data();
        o.count = (int)items.size();
        return o;
    }
};

int main(int argc, char **argv) {
    if (argc < 9) {
        fprintf(stderr,
                "usage: %s <game> <num_envs> <steps> <rand_seed> "
                "<num_levels> <start_level> <dist_mode> <out> [actions]\n",
                argv[0]);
        return 2;
    }
    std::string game = argv[1];
#ifdef PIXDUMP_REAL_QT
    setenv("QT_QPA_PLATFORM", "offscreen", 0);
    static int qt_argc = 1;
    static char *qt_argv[] = {argv[0], nullptr};
    new QGuiApplication(qt_argc, qt_argv);  // leaked intentionally
#endif
    int num_envs = atoi(argv[2]);
    int steps = atoi(argv[3]);
    int rand_seed = atoi(argv[4]);
    int num_levels = atoi(argv[5]);
    int start_level = atoi(argv[6]);
    int dist_mode = atoi(argv[7]);
    const char *out_path = argv[8];

    OptBuilder ob;
    // option set mirrors procgen/env.py:97-124 defaults
    ob.add_str("env_name", game);
    ob.add_int("num_levels", num_levels);
    ob.add_int("start_level", start_level);
    ob.add_int("num_actions", 15);
    ob.add_int("rand_seed", rand_seed);
    ob.add_int("num_threads", 0);
    // real asset tree: the stub QImage parses PNG IHDR dims, which feed
    // fit/match_aspect_ratio -> serialized entity rx/ry
    ob.add_str("resource_root", "/root/reference/procgen/data/assets/");
    ob.add_bool("render_human", false);
    ob.add_bool("use_generated_assets", false);
    ob.add_bool("paint_vel_info", false);
    ob.add_bool("use_monochrome_assets", false);
    ob.add_bool("restrict_themes", false);
    ob.add_bool("use_backgrounds", true);
    ob.add_bool("center_agent", true);
    ob.add_bool("use_sequential_levels", false);
    ob.add_int("distribution_mode", dist_mode);

    libenv_env *env = libenv_make(num_envs, ob.build());

    int n_ob = libenv_get_tensortypes(env, LIBENV_SPACE_OBSERVATION, nullptr);
    int n_ac = libenv_get_tensortypes(env, LIBENV_SPACE_ACTION, nullptr);
    int n_info = libenv_get_tensortypes(env, LIBENV_SPACE_INFO, nullptr);
    std::vector<libenv_tensortype> ob_t(n_ob), ac_t(n_ac), info_t(n_info);
    libenv_get_tensortypes(env, LIBENV_SPACE_OBSERVATION, ob_t.data());
    libenv_get_tensortypes(env, LIBENV_SPACE_ACTION, ac_t.data());
    libenv_get_tensortypes(env, LIBENV_SPACE_INFO, info_t.data());

    auto nbytes = [](const libenv_tensortype &t) {
        int n = 1;
        for (int i = 0; i < t.ndim; i++)
            n *= t.shape[i];
        int sz = t.dtype == LIBENV_DTYPE_UINT8 ? 1 : 4;
        return n * sz;
    };

    // space-major pointer arrays (vecgame.cpp:30-40 convert_bufs layout)
    std::vector<std::vector<uint8_t>> storage;
    auto alloc_space = [&](std::vector<libenv_tensortype> &ts) {
        std::vector<void *> ptrs(ts.size() * num_envs);
        for (size_t s = 0; s < ts.size(); s++) {
            for (int e = 0; e < num_envs; e++) {
                storage.emplace_back(nbytes(ts[s]));
                ptrs[s * num_envs + e] = storage.back().data();
            }
        }
        return ptrs;
    };
    storage.reserve((n_ob + n_ac + n_info) * num_envs + 2);
    auto ob_ptrs = alloc_space(ob_t);
    auto ac_ptrs = alloc_space(ac_t);
    auto info_ptrs = alloc_space(info_t);
    std::vector<float> rew(num_envs);
    std::vector<uint8_t> first(num_envs);

    libenv_buffers bufs;
    bufs.ob = ob_ptrs.data();
    bufs.ac = ac_ptrs.data();
    bufs.info = info_ptrs.data();
    bufs.rew = rew.data();
    bufs.first = first.data();
    libenv_set_buffers(env, &bufs);  // performs initial reset+observe
    libenv_observe(env);

    int i_pls = -1, i_plc = -1, i_ls = -1;
    for (int i = 0; i < n_info; i++) {
        if (!strcmp(info_t[i].name, "prev_level_seed")) i_pls = i;
        if (!strcmp(info_t[i].name, "prev_level_complete")) i_plc = i;
        if (!strcmp(info_t[i].name, "level_seed")) i_ls = i;
    }

    FILE *f = fopen(out_path, "wb");
    if (!f) { perror("fopen"); return 1; }
    auto w32 = [&](int32_t v) { fwrite(&v, 4, 1, f); };
    w32(num_envs);
    w32(steps);

    std::vector<char> state(MAX_STATE_SIZE);
    auto dump_states = [&]() {
        for (int e = 0; e < num_envs; e++) {
            int len = get_state(env, e, state.data(), MAX_STATE_SIZE);
            w32(len);
            fwrite(state.data(), 1, len, f);
        }
    };
    auto dump_rf = [&]() {
        fwrite(rew.data(), 4, num_envs, f);
        fwrite(first.data(), 1, num_envs, f);
    };
    auto dump_info = [&]() {
        for (int e = 0; e < num_envs; e++)
            w32(*(int32_t *)info_ptrs[(size_t)i_pls * num_envs + e]);
        for (int e = 0; e < num_envs; e++)
            fwrite(info_ptrs[(size_t)i_plc * num_envs + e], 1, 1, f);
        for (int e = 0; e < num_envs; e++)
            w32(*(int32_t *)info_ptrs[(size_t)i_ls * num_envs + e]);
    };

    int i_rgb = -1, rgb_bytes = 0;
    FILE *frgb = nullptr;
#ifdef PIXDUMP_REAL_QT
    for (int i = 0; i < n_ob; i++)
        if (!strcmp(ob_t[i].name, "rgb")) { i_rgb = i; rgb_bytes = nbytes(ob_t[i]); }
    if (i_rgb >= 0) {
        std::string p = std::string(out_path) + ".rgb";
        frgb = fopen(p.c_str(), "wb");
        int32_t hdr[3] = {num_envs, steps + 1, rgb_bytes};
        fwrite(hdr, 4, 3, frgb);
    }
#endif
    auto dump_rgb = [&]() {
        if (!frgb)
            return;
        for (int e = 0; e < num_envs; e++)
            fwrite(ob_ptrs[(size_t)i_rgb * num_envs + e], 1, rgb_bytes, frgb);
    };

    dump_states();
    dump_rf();
    dump_rgb();

    // deterministic action stream (recorded in the dump; the Python replay
    // reads it back rather than re-deriving it)
    std::mt19937 arng(777 + rand_seed);
    std::vector<int32_t> acts(num_envs);
    for (int t = 0; t < steps; t++) {
        for (int e = 0; e < num_envs; e++) {
            acts[e] = (int32_t)(arng() % 15);
            *(int32_t *)ac_ptrs[e] = acts[e];
        }
        libenv_act(env);
        libenv_observe(env);
        fwrite(acts.data(), 4, num_envs, f);
        dump_rf();
        dump_info();
        dump_states();
        dump_rgb();
    }
    if (frgb)
        fclose(frgb);
    fclose(f);
    libenv_close(env);
    fprintf(stderr, "dumped %s x%d envs x%d steps -> %s\n", game.c_str(),
            num_envs, steps, out_path);
    return 0;
}
