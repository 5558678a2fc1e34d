// Minimal native serving binary: the C++ twin of `interactive_emulator
// interactive_mode` (same pipe protocol), proving the embedding API serves
// the snapshot contract with zero Python. Dispatches on the snapshot's
// magic token: dense multivariate (v1-v3) and multi-fidelity snapshots.
// Usage: madai_query <state_file>
#include <cstdio>
#include <iostream>

#include "madai_tpu/emulator.hpp"

int main(int argc, char** argv) {
  if (argc != 2) {
    std::fprintf(stderr, "usage: %s <state_file>\n", argv[0]);
    return 2;
  }
  try {
    auto emu = madai_tpu::LoadEmulatorAuto(std::string(argv[1]));
    const int d = emu->number_of_parameters();
    std::printf("%d\n", d);
    for (const auto& s : emu->parameter_names()) std::printf("%s\n", s.c_str());
    std::printf("%d\n", 2 * emu->number_of_outputs());
    for (const auto& s : emu->output_names())
      std::printf("mean_%s\n", s.c_str());
    for (const auto& s : emu->output_names())
      std::printf("variance_%s\n", s.c_str());
    std::fflush(stdout);
    std::vector<double> x(d), means, vars;
    while (true) {
      for (int k = 0; k < d; ++k)
        if (!(std::cin >> x[k])) return 0;  // EOF mid-header is a clean stop
      emu->QueryEmulator(x, means, vars);
      for (double v : means) std::printf("%.17g\n", v);
      for (double v : vars) std::printf("%.17g\n", v);
      std::fflush(stdout);
    }
  } catch (const std::exception& e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
}
