// C++ embedding API for trained madaiemulator_tpu snapshots.
//
// Native equivalent of the reference's EmuPlusPlus class (ref:
// src/EmuPlusPlus.{h,cc} — class Emulator: ctor(statefile),
// QueryEmulator(point, means, errors); reference mount empty this round,
// SURVEY.md §0). Consumers (e.g. an MCMC calibration framework written in
// C++) link this library and serve predictions in-process with zero Python
// or JAX dependency; the math mirrors madaiemulator_tpu/models/gp.py
// exactly, so the Python test suite cross-checks both implementations on
// the same snapshot files.
//
// Scope: serve-time only (load + query). Training stays on the TPU path.

#pragma once

#include <cstddef>
#include <istream>
#include <stdexcept>
#include <string>
#include <vector>

namespace madai_tpu {

enum class Covariance {
  kPowerExponential,
  kMatern32,
  kMatern52,
  // ARD variants: per-dimension length scales feeding the same Matern
  // polynomial (extension past the reference's isotropic Matern)
  kMatern32Ard,
  kMatern52Ard,
};

struct Snapshot {
  int version = 0;
  Covariance cov = Covariance::kPowerExponential;
  double power_exp_alpha = 2.0;
  int regression_order = 0;
  bool predict_variance_includes_nugget = true;
  bool pca_standardize = true;
  int nparams = 0, noutputs = 0, npoints = 0, ncomponents = 0;
  std::vector<std::string> param_names, output_names;
  std::vector<double> mins, ranges;        // (d), (d)
  std::vector<double> ymean, ystd;         // (t), (t)
  std::vector<double> eigenvalues;         // (r)
  std::vector<double> U;                   // (t*r), row-major
  std::vector<double> X;                   // (n*d), scaled design
  std::vector<double> Z;                   // (n*r), PC scores
  std::vector<double> thetas;              // (r*ntheta): amp, nugget, ls...
  std::vector<double> noise;  // (n*r) PC-space obs-noise variances, or empty
  // v3 gradient-enhanced payload (empty for value-only snapshots):
  // PC-space gradient observations / known gradient-noise variances,
  // ((n*d) x r) row-major with point-major/dim-inner rows — the layout of
  // MultivariateEmulator.dZ flattened over (point, dim).
  std::vector<double> dZ;
  std::vector<double> dZ_noise;
  int ntheta() const;
};

// Parses the MADAIEMULATOR_TPU_SNAPSHOT v1/v2/v3 text format (v2 appends a
// per-point PC-space observation-noise block; v3 adds explicit payload
// flags + trailing PC-space gradient blocks for gradient-enhanced
// emulators; madaiemulator_tpu/io/snapshot.py is the writer). Throws
// std::runtime_error.
Snapshot LoadSnapshot(std::istream& in);
Snapshot LoadSnapshotFile(const std::string& path);

class Emulator {
 public:
  explicit Emulator(const std::string& statefile);
  explicit Emulator(const Snapshot& snapshot);

  int number_of_parameters() const { return s_.nparams; }
  int number_of_outputs() const { return s_.noutputs; }

  // Posterior mean and variance per output at one raw (unscaled) point x.
  // means/errors are resized to noutputs. "errors" carries variances, like
  // the reference's QueryEmulator.
  void QueryEmulator(const std::vector<double>& x, std::vector<double>& means,
                     std::vector<double>& errors) const;

 private:
  // nr = training rows: n for value-only snapshots, n*(1+d) for
  // gradient-enhanced (v3) ones — the joint (value, gradient) system of
  // models/gp.py training_gram/training_basis/training_targets.
  struct ComponentState {
    std::vector<double> L;       // (nr*nr) lower Cholesky of C
    std::vector<double> alpha;   // (nr) = C^-1 (z - H beta)
    std::vector<double> beta;    // (p)
    std::vector<double> LA;      // (p*p) lower Cholesky of H^T C^-1 H
    std::vector<double> LinvH;   // (nr*p) = L^-1 H
  };
  void Precompute();
  void PredictComponent(int c, const std::vector<double>& xs, double* mean,
                        double* var) const;
  double Kernel(const double* a, const double* b, const double* theta) const;
  // gradient-enhanced (v3) helpers — mirror ops/kernels.py joint_cross:
  // (g, g', g'') of the radial profile at scaled sqdist S (amp excluded)
  void G012(double S, double* g, double* g1, double* g2) const;
  double LengthScale(const double* theta, int k) const;
  double ScaledSqdist(const double* a, const double* b,
                      const double* theta) const;
  double GradPriorScale() const;  // c_g = -2 g'(0)

  Snapshot s_;
  int p_ = 0;       // regression basis size
  int nrows_ = 0;   // training rows: n, or n*(1+d) with gradients
  std::vector<ComponentState> comps_;
};

}  // namespace madai_tpu
