// Reference local-search oracle: run the UNMODIFIED reference local_search
// (from /root/reference/include/local_search.hpp) on a dumped phase-1 kernel
// (tools/kernel_dump.py binary format), mirroring GNN_VC's phase-2 adaptive
// step-size driver (reference: src/GNN_VC.cpp:336-358).
//
// Purpose: differential localization of local-search quality gaps — given
// OUR kernel + initial cover, does the reference search converge better?
// Deterministic (no RNG), so one run per kernel suffices; trajectory is
// reported in both step space and wall-clock.
//
// Usage: ls_oracle <kernel.kern> <seconds> [max_steps]
// Output: CSV lines "traj,<steps>,<sec>,<best_cost+c0>,<best_seen+c0>"
//         on every improvement batch and every 256 batches, then a final
//         "final,<steps>,<sec>,<best+c0>,<best_seen+c0>,<steps_per_sec>".

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <optional>
#include <vector>

#include "local_search.hpp"

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s kernel.kern seconds [max_steps]\n", argv[0]);
        return 2;
    }
    FILE *f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 2; }
    char magic[8];
    if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "MWVCKRN1", 8) != 0) {
        fprintf(stderr, "bad magic\n");
        return 2;
    }
    uint32_t n, m;
    uint64_t c0;
    fread(&n, 4, 1, f);
    fread(&m, 4, 1, f);
    fread(&c0, 8, 1, f);
    std::vector<uint32_t> w(n), eu(m), ev(m);
    std::vector<uint8_t> s0(n);
    fread(w.data(), 4, n, f);
    fread(eu.data(), 4, m, f);
    fread(ev.data(), 4, m, f);
    fread(s0.data(), 1, n, f);
    fclose(f);

    double t_max = atof(argv[2]);
    uint64_t max_steps = argc > 3 ? strtoull(argv[3], nullptr, 10) : ~0ull;

    std::vector<std::pair<uint32_t, uint32_t>> edges(m);
    for (uint32_t i = 0; i < m; ++i) edges[i] = {eu[i], ev[i]};
    std::vector<std::optional<bool>> vc(n);
    for (uint32_t i = 0; i < n; ++i) vc[i] = (bool)s0[i];

    local_search ls(n, m, w, edges, vc);

    auto t2 = std::chrono::high_resolution_clock::now();
    auto el = [&] {
        return std::chrono::duration<double>(
                   std::chrono::high_resolution_clock::now() - t2)
            .count();
    };
    size_t step_size = 1 << 16;
    uint64_t total = 0, batch = 0;
    printf("init,0,0.0,%llu,%llu\n",
           (unsigned long long)(ls.get_best_cost() + c0),
           (unsigned long long)(ls.get_best_cost() + c0));
    while (el() < t_max && total < max_steps) {
        total += step_size;
        batch++;
        // reference passes an effectively unbounded per-call time budget
        // (GNN_VC.cpp:343 computes remaining with a sign slip); outer loop
        // enforces the cutoff — mirror that.
        bool improved = ls.search((uint32_t)step_size, 1e18);
        if (improved) {
            step_size = std::min(step_size * 2, (size_t)1 << 16);
            printf("traj,%llu,%.2f,%llu,%llu\n", (unsigned long long)total,
                   el(), (unsigned long long)(ls.get_best_cost() + c0),
                   (unsigned long long)(ls.get_best_seen() + c0));
        } else {
            step_size = std::max(step_size / 2, (size_t)1 << 10);
        }
        if (batch % 4096 == 0) {
            printf("tick,%llu,%.2f,%llu,%llu\n", (unsigned long long)total,
                   el(), (unsigned long long)(ls.get_best_cost() + c0),
                   (unsigned long long)(ls.get_best_seen() + c0));
            fflush(stdout);
        }
    }
    double sec = el();
    printf("final,%llu,%.2f,%llu,%llu,%.0f\n", (unsigned long long)total, sec,
           (unsigned long long)(ls.get_best_cost() + c0),
           (unsigned long long)(ls.get_best_seen() + c0), total / sec);
    return 0;
}
