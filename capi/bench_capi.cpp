// Multithreaded scalar CPU decode benchmark over the C-ABI shim.
//
// Stands in for the reference Rust build (no Rust toolchain in this
// environment — see BASELINE.md): ldpc_toolbox.cpp implements the
// reference's numeric semantics (arithmetic.rs, flooding.rs,
// horizontal_layered.rs) as scalar C++, and this driver reproduces the
// reference BER harness's threading model — one decoder per worker
// thread, num_cpus workers by default (reference src/cli/ber.rs:84-86),
// decoded-info throughput = 1e-6 * k * frames / elapsed
// (src/simulation/ber.rs:574).
//
// Usage: bench_capi <alist_file> <implementation> <max_iter> <ebn0_db>
//                   <rate> <seconds> [threads]
// Prints one JSON line: {"impl": ..., "threads": N, "frames": N,
//                        "mbps": X, "avg_iters": X}

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include "ldpc_toolbox.h"

namespace {

struct AlistDims {
  size_t n = 0, m = 0;
};

AlistDims alist_dims(const std::string &text) {
  AlistDims d;
  std::sscanf(text.c_str(), "%zu %zu", &d.n, &d.m);
  return d;
}

std::string read_file(const char *path) {
  std::FILE *f = std::fopen(path, "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path);
    std::exit(1);
  }
  std::string out;
  char buf[1 << 16];
  size_t r;
  while ((r = std::fread(buf, 1, sizeof buf, f)) > 0) out.append(buf, r);
  std::fclose(f);
  return out;
}

struct Worker {
  uint64_t frames = 0;
  uint64_t iters = 0;
};

}  // namespace

int main(int argc, char **argv) {
  if (argc < 7) {
    std::fprintf(stderr,
                 "usage: %s <alist> <impl> <max_iter> <ebn0_db> <rate> "
                 "<seconds> [threads]\n",
                 argv[0]);
    return 2;
  }
  const char *alist_path = argv[1];
  const char *impl = argv[2];
  const uint32_t max_iter = static_cast<uint32_t>(std::atoi(argv[3]));
  const double ebn0_db = std::atof(argv[4]);
  const double rate = std::atof(argv[5]);
  const double seconds = std::atof(argv[6]);
  unsigned threads = argc > 7 ? static_cast<unsigned>(std::atoi(argv[7]))
                              : std::thread::hardware_concurrency();
  if (threads == 0) threads = 1;

  const std::string alist = read_file(alist_path);
  const AlistDims dims = alist_dims(alist);
  const size_t n = dims.n;
  const size_t k = dims.n - dims.m;

  // AWGN LLRs for the all-zero codeword (valid for any linear code):
  // matches bench.py's make_llrs: sigma^2 = 1/(2*rate*ebn0),
  // x = -1 + sigma*z, llr = -2x/sigma^2.
  const double ebn0 = std::pow(10.0, 0.1 * ebn0_db);
  const double sigma = std::sqrt(0.5 / (rate * ebn0));

  const size_t pool_frames = 8;  // distinct noise realizations per worker
  std::atomic<bool> stop{false};
  std::vector<Worker> results(threads);
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (unsigned t = 0; t < threads; ++t) {
    pool.emplace_back([&, t] {
      void *dec = ldpc_toolbox_decoder_ctor_alist_string(alist.c_str(), impl, "");
      if (!dec) {
        std::fprintf(stderr, "bad implementation %s\n", impl);
        std::exit(1);
      }
      std::mt19937_64 rng(0xC0FFEE + t);
      std::normal_distribution<double> gauss(0.0, 1.0);
      std::vector<std::vector<double>> llrs(pool_frames,
                                            std::vector<double>(n));
      for (auto &frame : llrs)
        for (size_t v = 0; v < n; ++v) {
          const double x = -1.0 + sigma * gauss(rng);
          frame[v] = -2.0 / (sigma * sigma) * x;
        }
      std::vector<uint8_t> out(n);
      Worker w;
      size_t f = 0;
      while (!stop.load(std::memory_order_relaxed)) {
        const int32_t it = ldpc_toolbox_decoder_decode_f64(
            dec, out.data(), out.size(), llrs[f].data(), llrs[f].size(),
            max_iter);
        w.frames += 1;
        w.iters += it > 0 ? static_cast<uint64_t>(it) : max_iter;
        f = (f + 1) % pool_frames;
      }
      ldpc_toolbox_decoder_dtor(dec);
      results[t] = w;
    });
  }

  const auto t0 = std::chrono::steady_clock::now();
  std::this_thread::sleep_for(std::chrono::duration<double>(seconds));
  stop.store(true);
  for (auto &th : pool) th.join();
  const double elapsed =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();

  uint64_t frames = 0, iters = 0;
  for (const auto &w : results) {
    frames += w.frames;
    iters += w.iters;
  }
  const double mbps = 1e-6 * static_cast<double>(k) *
                      static_cast<double>(frames) / elapsed;
  std::printf(
      "{\"impl\": \"%s\", \"threads\": %u, \"frames\": %llu, \"mbps\": %.3f, "
      "\"avg_iters\": %.2f}\n",
      impl, threads, static_cast<unsigned long long>(frames), mbps,
      frames ? static_cast<double>(iters) / static_cast<double>(frames) : 0.0);
  return 0;
}
