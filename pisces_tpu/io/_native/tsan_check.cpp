// ThreadSanitizer stress harness for the native I/O module.
//
// The production scheduler runs concurrent (bam, chr) jobs, each owning a
// private BamFile handle but sharing the process (the reference's
// one-job-owns-one-block discipline, RegionStateManager.cs:336-439). This
// harness drives that exact concurrency shape — per-thread handles, full
// decode + pileup + accessor reads — under -fsanitize=thread, so any
// shared mutable state in pisces_io.cpp (like round 2's g_pileup global)
// is reported as a data race instead of a latent segfault.
//
// Build + run:  make tsan && ./tsan_check <bam> [n_threads] [iters]
// Exit 0 = clean; TSan aborts non-zero on any race.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void* bam_open(const char* path, int n_threads);
void bam_close(void* h);
int64_t bam_decode(void* h, int want_ref_id);
int64_t bam_n_records(void* h);
int64_t bam_pileup(void* h, const uint8_t* keep, int min_bq, int anchor_size,
                   int block_size, const int64_t* anchored_pos,
                   int64_t n_anchored, const int8_t* base_dirs);
const int32_t* pileup_counts_t(void* h);
const int64_t* pileup_block_keys(void* h);
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <bam> [n_threads] [iters]\n", argv[0]);
    return 2;
  }
  const char* path = argv[1];
  int n_threads = argc > 2 ? atoi(argv[2]) : 8;
  int iters = argc > 3 ? atoi(argv[3]) : 4;

  std::vector<std::thread> threads;
  std::vector<long long> sums(n_threads, 0);
  for (int t = 0; t < n_threads; t++) {
    threads.emplace_back([&, t]() {
      for (int it = 0; it < iters; it++) {
        void* h = bam_open(path, 2);
        if (!h) {
          fprintf(stderr, "thread %d: open failed\n", t);
          exit(3);
        }
        int64_t n = bam_decode(h, -1);
        std::vector<uint8_t> keep(n, 1);
        int64_t nb = bam_pileup(h, keep.data(), 20, 5, 1000, nullptr, 0,
                                nullptr);
        const int32_t* counts = pileup_counts_t(h);
        const int64_t* bkeys = pileup_block_keys(h);
        long long s = 0;
        for (int64_t i = 0; i < nb * 1000 * 18; i++) s += counts[i];
        for (int64_t i = 0; i < nb; i++) s += bkeys[i];
        sums[t] += s;
        bam_close(h);
      }
    });
  }
  for (auto& th : threads) th.join();
  for (int t = 1; t < n_threads; t++) {
    if (sums[t] != sums[0]) {
      fprintf(stderr, "MISMATCH: thread %d sum %lld != %lld\n", t, sums[t],
              sums[0]);
      return 4;
    }
  }
  printf("tsan_check ok: %d threads x %d iters, checksum %lld\n", n_threads,
         iters, sums[0]);
  return 0;
}
