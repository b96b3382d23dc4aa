// Conformance oracle for procgen_tpu.rng: dumps std::mt19937 output streams
// and the RandGen-style derived values (reference: procgen/src/randgen.cpp)
// so the JAX implementation can be diffed bit-for-bit against libstdc++.
//
// Usage: mt19937_oracle <seed> <n_draws>
// Emits lines: raw=<u32> randint_0_7=<i> rand01=<float-bits-hex>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>

int main(int argc, char** argv) {
    if (argc != 3) {
        fprintf(stderr, "usage: %s <seed> <n_draws>\n", argv[0]);
        return 1;
    }
    int seed = atoi(argv[1]);
    int n = atoi(argv[2]);
    // Stream A: raw draws.
    {
        std::mt19937 gen;
        gen.seed(seed);
        for (int i = 0; i < n; i++) {
            printf("raw %u\n", (uint32_t)gen());
        }
    }
    // Stream B: randint(low=3, high=17) -> low + x % (high-low).
    {
        std::mt19937 gen;
        gen.seed(seed);
        for (int i = 0; i < n; i++) {
            uint32_t x = gen();
            uint32_t range = 17 - 3;
            printf("randint %d\n", 3 + (int)(x % range));
        }
    }
    // Stream C: rand01 -> float((double)x / ((double)max + 1)), printed as bits.
    {
        std::mt19937 gen;
        gen.seed(seed);
        for (int i = 0; i < n; i++) {
            uint32_t x = gen();
            float f = (float)((double)(x) / ((double)(gen.max()) + 1));
            union { float f; uint32_t u; } pun;
            pun.f = f;
            printf("rand01 %08x\n", pun.u);
        }
    }
    // Stream D: full-width signed randint() = (int)gen().
    {
        std::mt19937 gen;
        gen.seed(seed);
        for (int i = 0; i < n; i++) {
            printf("randfull %d\n", (int)gen());
        }
    }
    return 0;
}
