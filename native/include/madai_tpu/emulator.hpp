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
#include <memory>
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

// Common serving interface over every snapshot family (dense multivariate
// v1-v3 and multi-fidelity) so embedding consumers, the pipe binary, and
// the C ABI dispatch on the file's magic token instead of its class.
class EmulatorBase {
 public:
  virtual ~EmulatorBase() = default;
  virtual int number_of_parameters() const = 0;
  virtual int number_of_outputs() const = 0;
  virtual const std::vector<std::string>& parameter_names() const = 0;
  virtual const std::vector<std::string>& output_names() const = 0;
  // Posterior mean and variance per output at one raw (unscaled) point x.
  // means/errors are resized to noutputs. "errors" carries variances, like
  // the reference's QueryEmulator.
  virtual void QueryEmulator(const std::vector<double>& x,
                             std::vector<double>& means,
                             std::vector<double>& errors) const = 0;
};

// Sniffs the magic token and constructs the matching emulator class.
std::unique_ptr<EmulatorBase> LoadEmulatorAuto(const std::string& path);

class Emulator : public EmulatorBase {
 public:
  explicit Emulator(const std::string& statefile);
  explicit Emulator(const Snapshot& snapshot);

  int number_of_parameters() const override { return s_.nparams; }
  int number_of_outputs() const override { return s_.noutputs; }
  const std::vector<std::string>& parameter_names() const override {
    return s_.param_names;
  }
  const std::vector<std::string>& output_names() const override {
    return s_.output_names;
  }

  void QueryEmulator(const std::vector<double>& x, std::vector<double>& means,
                     std::vector<double>& errors) const override;

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

// --- Multi-fidelity (AR(1) co-kriging) snapshots ---------------------------
// Grammar: MADAIEMULATOR_TPU_SNAPSHOT_MF 1 (io/snapshot.py
// write_snapshot_multifidelity). The payload is per-LEVEL scalar GPs; each
// level >= 1 carries one extra GLS basis column (the lower level's value at
// its design) whose coefficient is the AR(1) scale rho
// (models/multifidelity.py, Le Gratiet's recursive form).

struct MFLevel {
  int npoints = 0;
  bool has_noise = false;
  std::vector<double> theta;  // v1: (ntheta); v2: (r*ntheta) per component
  double rho = 0.0;           // v1 stored AR(1) scale (levels >= 1)
  std::vector<double> X;      // (n_k * d), scaled design
  std::vector<double> y;      // v1: (n_k) targets; v2: Z (n_k * r) scores
  std::vector<double> h;      // v1: (n_k); v2: H (n_k * r) lower columns
  std::vector<double> noise;  // v1: (n_k); v2: (n_k * r), or empty
  std::vector<double> rhos;   // v2: (r) per-component AR(1) scales
};

struct MFSnapshot {
  int version = 0;
  Covariance cov = Covariance::kPowerExponential;
  double power_exp_alpha = 2.0;
  int regression_order = 0;
  bool predict_variance_includes_nugget = true;
  int nparams = 0;
  // version 2 (multivariate): shared PCA block — io/snapshot.py
  // write_snapshot_multifidelity_mv; v1 leaves these at t = r = 1/empty
  int noutputs = 1, ncomponents = 1;
  std::vector<double> ymean, ystd;  // (t), (t)  [v2]
  std::vector<double> eigenvalues;  // (r)       [v2]
  std::vector<double> U;            // (t*r)     [v2]
  std::vector<std::string> param_names, output_names;
  std::vector<double> mins, ranges;  // (d), (d)
  std::vector<MFLevel> levels;
  int ntheta() const;
};

MFSnapshot LoadSnapshotMF(std::istream& in);
MFSnapshot LoadSnapshotMFFile(const std::string& path);

// Recursive co-kriging serving: level 0 is an ordinary GLS GP; level k's
// query basis gains the level-(k-1) recursive mean as its last column, and
// the variance propagates rho_k^2 * var_{k-1} + varGP_k
// (models/multifidelity.py _predict_recursive).
class MultiFidelityEmulator : public EmulatorBase {
 public:
  explicit MultiFidelityEmulator(const std::string& statefile);
  explicit MultiFidelityEmulator(const MFSnapshot& snapshot);

  int number_of_parameters() const override { return s_.nparams; }
  int number_of_outputs() const override {
    return s_.version >= 2 ? s_.noutputs : 1;
  }
  int number_of_levels() const { return (int)s_.levels.size(); }
  const std::vector<std::string>& parameter_names() const override {
    return s_.param_names;
  }
  const std::vector<std::string>& output_names() const override {
    return s_.output_names;
  }

  void QueryEmulator(const std::vector<double>& x, std::vector<double>& means,
                     std::vector<double>& errors) const override;

 private:
  struct LevelState {
    int p = 0;                   // basis width: p_poly (+1 for k >= 1)
    std::vector<double> L;       // (n*n) lower Cholesky of C
    std::vector<double> alpha;   // (n) = C^-1 (y - H beta)
    std::vector<double> beta;    // (p); beta.back() == rho for k >= 1
    std::vector<double> LA;      // (p*p) lower Cholesky of H^T C^-1 H
    std::vector<double> LinvH;   // (n*p) = L^-1 H
  };
  LevelState BuildLevelState(const double* X, const double* y,
                             const double* h, const double* noise,
                             const double* theta, int n, bool has_lower) const;
  // one recursion step: GP predict at xs with the lower level's recursive
  // mean riding as the last basis value (has_lower); returns the mean and
  // writes the GP-only variance to *var_gp
  double QueryLevel(const LevelState& st, const double* X,
                    const double* theta, int n, const double* xs,
                    double lower_mean, bool has_lower, double* var_gp) const;
  void Precompute();

  MFSnapshot s_;
  // v1: one state per level; v2: (level, component) row-major [k*r + c]
  std::vector<LevelState> levels_;
};

// --- Sparse (SGPR) snapshots ------------------------------------------------
// Grammar: MADAIEMULATOR_TPU_SNAPSHOT_SGPR 1 (io/snapshot.py
// write_snapshot_sparse). Uniquely among the snapshot families the payload
// IS the O(m^2) serve state (models/sparse.py SGPRServeState) — the
// training set can be a million points, so nothing is rebuilt on load.

struct SGPRSnapshot {
  int version = 0;
  Covariance cov = Covariance::kPowerExponential;
  double power_exp_alpha = 2.0;
  int regression_order = 0;
  bool predict_variance_includes_nugget = true;
  bool pca_standardize = true;
  int nparams = 0, noutputs = 0, ninducing = 0, ncomponents = 0;
  std::vector<std::string> param_names, output_names;
  std::vector<double> mins, ranges;  // (d), (d)
  std::vector<double> ymean, ystd;   // (t), (t)
  std::vector<double> eigenvalues;   // (r)
  std::vector<double> U;             // (t*r)
  std::vector<double> Z;             // (m*d) shared inducing points, scaled
  std::vector<double> thetas;        // (r*ntheta)
  // per-component serve blocks, concatenated over components:
  std::vector<double> Lm;    // (r*m*m) lower chol(K_mm + jitter)
  std::vector<double> LB;    // (r*m*m) lower chol(I + A A^T)
  std::vector<double> c;     // (r*m)
  std::vector<double> beta;  // (r*p), p = 1 + order*d
  std::vector<double> LA;    // (r*p*p)
  std::vector<double> E;     // (r*m*p) GLS variance operator
  int ntheta() const;
  int p() const { return 1 + regression_order * nparams; }
};

SGPRSnapshot LoadSnapshotSGPR(std::istream& in);
SGPRSnapshot LoadSnapshotSGPRFile(const std::string& path);

// Sparse serving: mean = h.beta + v2^T c, var = k** - ||v1||^2 + ||v2||^2
// + ||LA^-1 (h - E^T v1)||^2 with v1 = Lm^-1 k_m(x*), v2 = LB^-1 v1, then
// PCA reconstruction (models/sparse.py predict_sgpr / FORMATS.md §2c).
class SparseEmulator : public EmulatorBase {
 public:
  explicit SparseEmulator(const std::string& statefile);
  explicit SparseEmulator(const SGPRSnapshot& snapshot);

  int number_of_parameters() const override { return s_.nparams; }
  int number_of_outputs() const override { return s_.noutputs; }
  const std::vector<std::string>& parameter_names() const override {
    return s_.param_names;
  }
  const std::vector<std::string>& output_names() const override {
    return s_.output_names;
  }

  void QueryEmulator(const std::vector<double>& x, std::vector<double>& means,
                     std::vector<double>& errors) const override;

 private:
  void PredictComponent(int comp, const std::vector<double>& xs, double* mean,
                        double* var) const;
  SGPRSnapshot s_;
};

}  // namespace madai_tpu
