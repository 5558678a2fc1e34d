// Implementation of the C++ embedding API. Self-contained dense linear
// algebra (no GSL/LAPACK dependency, unlike the reference): unblocked
// Cholesky + triangular solves are ample for serve-time N (the TPU path owns
// large-N work). Math mirrors madaiemulator_tpu/models/gp.py:
//   C = K + (nugget + jitter)I ; H poly basis ; A = H^T C^-1 H
//   beta = A^-1 H^T C^-1 z ; alpha = C^-1 (z - H beta)
//   mean = h.beta + k*.alpha
//   var  = k(x,x) - ||L^-1 k*||^2 + ||LA^-1 (h - LinvH^T L^-1 k*)||^2
// then PCA reconstruction as in models/multivariate.py. Gradient-enhanced
// (v3) snapshots extend the same GLS system to the joint value+gradient
// rows of ops/kernels.py gram_joint / models/gp.py training_basis: the
// training dimension becomes n*(1+d) and k* gains analytic
// kernel-derivative rows; the query surface is unchanged.

#include "madai_tpu/emulator.hpp"

#include <cmath>
#include <cstring>
#include <fstream>
#include <limits>
#include <sstream>

namespace madai_tpu {

namespace {

// ---- tokenizer matching the Python readers: '#' comments, whitespace ----
class Tokens {
 public:
  explicit Tokens(std::istream& in) : in_(in) {}
  std::string Next() {
    std::string tok;
    while (true) {
      if (pos_ >= line_.size()) {
        if (!std::getline(in_, line_)) throw std::runtime_error("snapshot ended early");
        auto hash = line_.find('#');
        if (hash != std::string::npos) line_.resize(hash);
        pos_ = 0;
      }
      while (pos_ < line_.size() && std::isspace((unsigned char)line_[pos_])) pos_++;
      if (pos_ >= line_.size()) continue;
      size_t start = pos_;
      while (pos_ < line_.size() && !std::isspace((unsigned char)line_[pos_])) pos_++;
      tok = line_.substr(start, pos_ - start);
      return tok;
    }
  }
  double NextDouble() { return std::stod(Next()); }
  int NextInt() { return std::stoi(Next()); }

 private:
  std::istream& in_;
  std::string line_;
  size_t pos_ = 0;
};

Covariance ParseCovariance(const std::string& cov) {
  if (cov == "power_exponential" || cov == "gaussian")
    return Covariance::kPowerExponential;
  if (cov == "matern32") return Covariance::kMatern32;
  if (cov == "matern52") return Covariance::kMatern52;
  if (cov == "matern32_ard") return Covariance::kMatern32Ard;
  if (cov == "matern52_ard") return Covariance::kMatern52Ard;
  throw std::runtime_error("unknown covariance " + cov);
}

void Expect(Tokens& t, const char* name) {
  std::string got = t.Next();
  if (got != name)
    throw std::runtime_error(std::string("snapshot: expected '") + name +
                             "', got '" + got + "'");
}

// lower-triangular Cholesky in place; returns false if not SPD
bool CholeskyLower(std::vector<double>& a, int n) {
  for (int j = 0; j < n; ++j) {
    double d = a[j * n + j];
    for (int k = 0; k < j; ++k) d -= a[j * n + k] * a[j * n + k];
    if (!(d > 0.0) || !std::isfinite(d)) return false;
    double dj = std::sqrt(d);
    a[j * n + j] = dj;
    for (int i = j + 1; i < n; ++i) {
      double s = a[i * n + j];
      for (int k = 0; k < j; ++k) s -= a[i * n + k] * a[j * n + k];
      a[i * n + j] = s / dj;
    }
  }
  for (int i = 0; i < n; ++i)
    for (int j = i + 1; j < n; ++j) a[i * n + j] = 0.0;
  return true;
}

// solve L x = b in place (forward substitution), L (n*n) lower
void SolveLower(const std::vector<double>& L, int n, double* b) {
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * b[k];
    b[i] = s / L[i * n + i];
  }
}

// solve L^T x = b in place (back substitution)
void SolveUpperT(const std::vector<double>& L, int n, double* b) {
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * b[k];
    b[i] = s / L[i * n + i];
  }
}

// kernel evaluation shared by the dense and multi-fidelity emulators;
// theta layout [amp, nugget, length scales...] (reference natural space)
double KernelEval(Covariance cov, double pe_alpha, int d, const double* a,
                  const double* b, const double* theta) {
  const double amp = theta[0];
  if (cov == Covariance::kPowerExponential) {
    double acc = 0.0;
    for (int k = 0; k < d; ++k) {
      double dk = std::fabs(a[k] - b[k]) / theta[2 + k];
      acc += (pe_alpha == 2.0) ? dk * dk : std::pow(dk, pe_alpha);
    }
    return amp * std::exp(-0.5 * acc);
  }
  const bool ard =
      cov == Covariance::kMatern32Ard || cov == Covariance::kMatern52Ard;
  double r2 = 0.0;
  for (int k = 0; k < d; ++k) {
    double dk = (a[k] - b[k]) / theta[ard ? 2 + k : 2];
    r2 += dk * dk;
  }
  double r = std::sqrt(r2);
  if (cov == Covariance::kMatern32 || cov == Covariance::kMatern32Ard) {
    double sq = std::sqrt(3.0) * r;
    return amp * (1.0 + sq) * std::exp(-sq);
  }
  double sq = std::sqrt(5.0) * r;
  return amp * (1.0 + sq + sq * sq / 3.0) * std::exp(-sq);
}

// polynomial regression basis row h(x) (no cross terms, matching
// models/gp.py regression_basis): [1, x^1 per dim, ..., x^order per dim]
void PolyBasisRow(const double* xs, int d, int order, double* row) {
  row[0] = 1.0;
  int col = 1;
  for (int q = 1; q <= order; ++q)
    for (int k = 0; k < d; ++k) row[col++] = std::pow(xs[k], q);
}

}  // namespace

int Snapshot::ntheta() const {
  const bool ard = cov == Covariance::kPowerExponential ||
                   cov == Covariance::kMatern32Ard ||
                   cov == Covariance::kMatern52Ard;
  return 2 + (ard ? nparams : 1);
}

Snapshot LoadSnapshot(std::istream& in) {
  Tokens t(in);
  if (t.Next() != "MADAIEMULATOR_TPU_SNAPSHOT")
    throw std::runtime_error("not a madaiemulator_tpu snapshot");
  Snapshot s;
  s.version = t.NextInt();
  if (s.version < 1 || s.version > 3)
    throw std::runtime_error(
        "unsupported snapshot version " + std::to_string(s.version) +
        " (this reader implements versions 1-3)");
  Expect(t, "covariance");
  s.cov = ParseCovariance(t.Next());
  Expect(t, "power_exp_alpha");
  s.power_exp_alpha = t.NextDouble();
  Expect(t, "regression_order");
  s.regression_order = t.NextInt();
  Expect(t, "predict_variance_includes_nugget");
  s.predict_variance_includes_nugget = t.NextInt() != 0;
  Expect(t, "pca_standardize");
  s.pca_standardize = t.NextInt() != 0;
  // v3: explicit payload flags govern which trailing blocks are present
  // (io/snapshot.py write_snapshot); v2's noise block is unconditional.
  bool has_noise = false, has_gradients = false, has_gradient_noise = false;
  if (s.version >= 3) {
    Expect(t, "has_noise");
    has_noise = t.NextInt() != 0;
    Expect(t, "has_gradients");
    has_gradients = t.NextInt() != 0;
    Expect(t, "has_gradient_noise");
    has_gradient_noise = t.NextInt() != 0;
    if (has_gradient_noise && !has_gradients)
      throw std::runtime_error(
          "snapshot: gradient-noise block without gradients");
  } else if (s.version == 2) {
    has_noise = true;
  }
  if (has_gradients) {
    // gradient observations need a radial profile twice differentiable at
    // zero distance (ops/kernels.py _require_grad_family)
    const bool ok =
        (s.cov == Covariance::kPowerExponential && s.power_exp_alpha == 2.0) ||
        s.cov == Covariance::kMatern52 || s.cov == Covariance::kMatern52Ard;
    if (!ok)
      throw std::runtime_error(
          "snapshot: gradient-enhanced payload with a covariance family "
          "that has no twice-differentiable radial profile");
  }
  Expect(t, "nparams");
  s.nparams = t.NextInt();
  Expect(t, "noutputs");
  s.noutputs = t.NextInt();
  Expect(t, "npoints");
  s.npoints = t.NextInt();
  Expect(t, "ncomponents");
  s.ncomponents = t.NextInt();
  if (s.nparams < 1 || s.noutputs < 1 || s.npoints < 1 || s.ncomponents < 1)
    throw std::runtime_error("snapshot: bad dimensions");
  for (int i = 0; i < s.nparams; ++i) s.param_names.push_back(t.Next());
  for (int i = 0; i < s.noutputs; ++i) s.output_names.push_back(t.Next());
  auto vec = [&t](int k) {
    std::vector<double> v(k);
    for (int i = 0; i < k; ++i) v[i] = t.NextDouble();
    return v;
  };
  s.mins = vec(s.nparams);
  s.ranges = vec(s.nparams);
  s.ymean = vec(s.noutputs);
  s.ystd = vec(s.noutputs);
  s.eigenvalues = vec(s.ncomponents);
  s.U = vec(s.noutputs * s.ncomponents);
  s.X = vec(s.npoints * s.nparams);
  s.Z = vec(s.npoints * s.ncomponents);
  s.thetas = vec(s.ncomponents * s.ntheta());
  if (has_noise)  // per-point PC-space noise block (n x r)
    s.noise = vec(s.npoints * s.ncomponents);
  if (has_gradients)  // PC-space gradients ((n*d) x r, point-major)
    s.dZ = vec(s.npoints * s.nparams * s.ncomponents);
  if (has_gradient_noise)
    s.dZ_noise = vec(s.npoints * s.nparams * s.ncomponents);
  return s;
}

Snapshot LoadSnapshotFile(const std::string& path) {
  std::ifstream f(path);
  if (!f) throw std::runtime_error("cannot open snapshot: " + path);
  return LoadSnapshot(f);
}

Emulator::Emulator(const std::string& statefile)
    : Emulator(LoadSnapshotFile(statefile)) {}

Emulator::Emulator(const Snapshot& snapshot) : s_(snapshot) {
  p_ = 1 + s_.regression_order * s_.nparams;
  Precompute();
}

double Emulator::Kernel(const double* a, const double* b,
                        const double* theta) const {
  return KernelEval(s_.cov, s_.power_exp_alpha, s_.nparams, a, b, theta);
}

double Emulator::LengthScale(const double* theta, int k) const {
  const bool ard = s_.cov == Covariance::kPowerExponential ||
                   s_.cov == Covariance::kMatern32Ard ||
                   s_.cov == Covariance::kMatern52Ard;
  return theta[ard ? 2 + k : 2];
}

double Emulator::ScaledSqdist(const double* a, const double* b,
                              const double* theta) const {
  double acc = 0.0;
  for (int k = 0; k < s_.nparams; ++k) {
    double dk = (a[k] - b[k]) / LengthScale(theta, k);
    acc += dk * dk;
  }
  return acc;
}

// (g, g', g'') of the radial profile at scaled sqdist S, amp excluded —
// mirrors ops/kernels.py _g012 for the grad-capable families only
// (power_exponential alpha=2, matern52[_ard]); LoadSnapshot guards this.
void Emulator::G012(double S, double* g, double* g1, double* g2) const {
  if (s_.cov == Covariance::kPowerExponential) {
    double e = std::exp(-0.5 * S);
    *g = e;
    *g1 = -0.5 * e;
    *g2 = 0.25 * e;
    return;
  }
  // Matern-5/2: g(s) = (1 + sqrt(5) r + 5 s / 3) e^{-sqrt(5) r}, r=sqrt(s)
  double r = std::sqrt(S);
  double sq5 = std::sqrt(5.0);
  double e = std::exp(-sq5 * r);
  *g = (1.0 + sq5 * r + (5.0 / 3.0) * S) * e;
  *g1 = -(5.0 / 6.0) * (1.0 + sq5 * r) * e;
  *g2 = (25.0 / 12.0) * e;
}

double Emulator::GradPriorScale() const {
  // c_g = -2 g'(0): prior Var(df/dx_a) = amp * c_g / ell_a^2
  return s_.cov == Covariance::kPowerExponential ? 1.0 : 5.0 / 3.0;
}

void Emulator::Precompute() {
  const int n = s_.npoints, d = s_.nparams, r = s_.ncomponents;
  const int nt = s_.ntheta();
  const bool grad = !s_.dZ.empty();
  nrows_ = grad ? n * (1 + d) : n;
  const int m = nrows_;
  comps_.resize(r);
  // regression basis H (m*p), shared across components. With gradient
  // observations (v3) the basis gains the derivative rows dh/dx in the
  // same (point, dim) row-major order as the joint covariance
  // (models/gp.py training_basis / regression_basis_grad).
  std::vector<double> H(m * p_, 0.0);
  for (int i = 0; i < n; ++i) {
    H[i * p_] = 1.0;
    int col = 1;
    for (int q = 1; q <= s_.regression_order; ++q)
      for (int k = 0; k < d; ++k)
        H[i * p_ + col++] = std::pow(s_.X[i * d + k], q);
  }
  if (grad) {
    // row n + i*d + a holds d/dx_a h(X_i); the basis has no cross terms,
    // so each power-q block's only nonzero is column 1+(q-1)*d+a
    for (int i = 0; i < n; ++i)
      for (int a = 0; a < d; ++a) {
        double* row = &H[(n + i * d + a) * p_];
        for (int q = 1; q <= s_.regression_order; ++q)
          row[1 + (q - 1) * d + a] =
              q * std::pow(s_.X[i * d + a], q - 1);
      }
  }
  for (int c = 0; c < r; ++c) {
    const double* th = &s_.thetas[c * nt];
    const double amp = th[0];
    ComponentState& st = comps_[c];
    st.L.assign(m * m, 0.0);
    for (int i = 0; i < n; ++i)
      for (int j = 0; j <= i; ++j) {
        double v = Kernel(&s_.X[i * d], &s_.X[j * d], th);
        st.L[i * m + j] = v;
        st.L[j * m + i] = v;
      }
    if (grad) {
      // joint value+gradient blocks (ops/kernels.py joint_cross with
      // grad_rows=grad_cols=True): Dw_a = (X_i - X_j)_a / ell_a^2
      for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j) {
          double S = ScaledSqdist(&s_.X[i * d], &s_.X[j * d], th);
          double g, g1, g2;
          G012(S, &g, &g1, &g2);
          for (int a = 0; a < d; ++a) {
            const double ea = LengthScale(th, a);
            const double dwa =
                (s_.X[i * d + a] - s_.X[j * d + a]) / (ea * ea);
            // Cov(df/dx_a(X_i), f(X_j)) = +2 amp g' Dw_a
            st.L[(n + i * d + a) * m + j] = 2.0 * amp * g1 * dwa;
            // Cov(f(X_i), df/dx_a(X_j)) = -2 amp g' Dw_a
            st.L[i * m + (n + j * d + a)] = -2.0 * amp * g1 * dwa;
            for (int b = 0; b < d; ++b) {
              const double eb = LengthScale(th, b);
              const double dwb =
                  (s_.X[i * d + b] - s_.X[j * d + b]) / (eb * eb);
              // Cov(df/dx_a(X_i), df/dx_b(X_j))
              double gg = -4.0 * amp * g2 * dwa * dwb;
              if (a == b) gg -= 2.0 * amp * g1 / (ea * ea);
              st.L[(n + i * d + a) * m + (n + j * d + b)] = gg;
            }
          }
        }
    }
    const double nugget = th[1];
    for (int i = 0; i < n; ++i) st.L[i * m + i] += nugget;
    if (!s_.noise.empty())  // heteroscedastic known observation noise
      for (int i = 0; i < n; ++i) st.L[i * m + i] += s_.noise[i * r + c];
    if (grad) {
      // gradient rows carry the same relative regularization in gradient
      // units, nugget * c_g / ell_a^2, plus known gradient noise
      // (ops/kernels.py gram_joint; jitter is 0 at f64)
      const double cg = GradPriorScale();
      for (int i = 0; i < n; ++i)
        for (int a = 0; a < d; ++a) {
          const int idx = n + i * d + a;
          const double ea = LengthScale(th, a);
          st.L[idx * m + idx] += nugget * cg / (ea * ea);
          if (!s_.dZ_noise.empty())
            st.L[idx * m + idx] += s_.dZ_noise[(i * d + a) * r + c];
        }
    }
    if (!CholeskyLower(st.L, m))
      throw std::runtime_error("snapshot covariance is not SPD");
    // training targets: z, extended with row-major flattened gradients
    std::vector<double> z(m);
    for (int i = 0; i < n; ++i) z[i] = s_.Z[i * r + c];
    if (grad)
      for (int i = 0; i < n * d; ++i) z[n + i] = s_.dZ[i * r + c];
    // LinvH = L^-1 H, column by column
    st.LinvH.assign(m * p_, 0.0);
    std::vector<double> colbuf(m);
    for (int j = 0; j < p_; ++j) {
      for (int i = 0; i < m; ++i) colbuf[i] = H[i * p_ + j];
      SolveLower(st.L, m, colbuf.data());
      for (int i = 0; i < m; ++i) st.LinvH[i * p_ + j] = colbuf[i];
    }
    // A = LinvH^T LinvH ; LA = chol(A)
    st.LA.assign(p_ * p_, 0.0);
    for (int a = 0; a < p_; ++a)
      for (int b = 0; b <= a; ++b) {
        double sum = 0.0;
        for (int i = 0; i < m; ++i)
          sum += st.LinvH[i * p_ + a] * st.LinvH[i * p_ + b];
        st.LA[a * p_ + b] = sum;
        st.LA[b * p_ + a] = sum;
      }
    if (!CholeskyLower(st.LA, p_))
      throw std::runtime_error("regression normal matrix is not SPD");
    // beta = A^-1 LinvH^T (L^-1 z)
    std::vector<double> Linvz = z;
    SolveLower(st.L, m, Linvz.data());
    st.beta.assign(p_, 0.0);
    for (int a = 0; a < p_; ++a) {
      double sum = 0.0;
      for (int i = 0; i < m; ++i) sum += st.LinvH[i * p_ + a] * Linvz[i];
      st.beta[a] = sum;
    }
    SolveLower(st.LA, p_, st.beta.data());
    SolveUpperT(st.LA, p_, st.beta.data());
    // alpha = C^-1 (z - H beta)
    st.alpha.assign(m, 0.0);
    for (int i = 0; i < m; ++i) {
      double hb = 0.0;
      for (int a = 0; a < p_; ++a) hb += H[i * p_ + a] * st.beta[a];
      st.alpha[i] = z[i] - hb;
    }
    SolveLower(st.L, m, st.alpha.data());
    SolveUpperT(st.L, m, st.alpha.data());
  }
}

void Emulator::PredictComponent(int c, const std::vector<double>& xs,
                                double* mean, double* var) const {
  const int n = s_.npoints, d = s_.nparams;
  const int nt = s_.ntheta();
  const bool grad = !s_.dZ.empty();
  const int m_rows = nrows_;
  const double* th = &s_.thetas[c * nt];
  const double amp = th[0];
  const ComponentState& st = comps_[c];
  // k*: value rows, then (v3) gradient rows
  // Cov(df/dx_a(X_i), f(x*)) = +2 amp g'(S) (X_i - x*)_a / ell_a^2
  std::vector<double> ks(m_rows);
  for (int i = 0; i < n; ++i) ks[i] = Kernel(&s_.X[i * d], xs.data(), th);
  if (grad)
    for (int i = 0; i < n; ++i) {
      double S = ScaledSqdist(&s_.X[i * d], xs.data(), th);
      double g, g1, g2;
      G012(S, &g, &g1, &g2);
      for (int a = 0; a < d; ++a) {
        const double ea = LengthScale(th, a);
        ks[n + i * d + a] =
            2.0 * amp * g1 * (s_.X[i * d + a] - xs[a]) / (ea * ea);
      }
    }
  std::vector<double> h(p_);
  PolyBasisRow(xs.data(), d, s_.regression_order, h.data());
  double m = 0.0;
  for (int a = 0; a < p_; ++a) m += h[a] * st.beta[a];
  for (int i = 0; i < m_rows; ++i) m += ks[i] * st.alpha[i];
  *mean = m;
  // v = L^-1 k*
  std::vector<double> v = ks;
  SolveLower(st.L, m_rows, v.data());
  double kss = th[0] + (s_.predict_variance_includes_nugget ? th[1] : 0.0);
  double vv = 0.0;
  for (int i = 0; i < m_rows; ++i) vv += v[i] * v[i];
  // g = h - LinvH^T v ; w = LA^-1 g
  std::vector<double> g(p_);
  for (int a = 0; a < p_; ++a) {
    double s = h[a];
    for (int i = 0; i < m_rows; ++i) s -= st.LinvH[i * p_ + a] * v[i];
    g[a] = s;
  }
  SolveLower(st.LA, p_, g.data());
  double ww = 0.0;
  for (int a = 0; a < p_; ++a) ww += g[a] * g[a];
  double out = kss - vv + ww;
  *var = out > 0.0 ? out : 0.0;
}

void Emulator::QueryEmulator(const std::vector<double>& x,
                             std::vector<double>& means,
                             std::vector<double>& errors) const {
  const int d = s_.nparams, t = s_.noutputs, r = s_.ncomponents;
  if ((int)x.size() != d)
    throw std::invalid_argument("QueryEmulator: wrong point dimension");
  std::vector<double> xs(d);
  for (int k = 0; k < d; ++k) xs[k] = (x[k] - s_.mins[k]) / s_.ranges[k];
  std::vector<double> m_pc(r), v_pc(r);
  for (int c = 0; c < r; ++c) PredictComponent(c, xs, &m_pc[c], &v_pc[c]);
  means.assign(t, 0.0);
  errors.assign(t, 0.0);
  for (int j = 0; j < t; ++j) {
    double mj = 0.0, vj = 0.0;
    for (int c = 0; c < r; ++c) {
      const double u = s_.U[j * r + c];
      mj += std::sqrt(s_.eigenvalues[c]) * u * m_pc[c];
      vj += s_.eigenvalues[c] * u * u * v_pc[c];
    }
    means[j] = s_.ymean[j] + s_.ystd[j] * mj;
    errors[j] = s_.ystd[j] * s_.ystd[j] * vj;
  }
}

// ---------------------------------------------------------------------------
// Multi-fidelity (AR(1) co-kriging) serving — io/snapshot.py
// write_snapshot_multifidelity grammar, models/multifidelity.py math.
// ---------------------------------------------------------------------------

int MFSnapshot::ntheta() const {
  const bool ard = cov == Covariance::kPowerExponential ||
                   cov == Covariance::kMatern32Ard ||
                   cov == Covariance::kMatern52Ard;
  return 2 + (ard ? nparams : 1);
}

MFSnapshot LoadSnapshotMF(std::istream& in) {
  Tokens t(in);
  if (t.Next() != "MADAIEMULATOR_TPU_SNAPSHOT_MF")
    throw std::runtime_error("not a multi-fidelity snapshot");
  MFSnapshot s;
  s.version = t.NextInt();
  if (s.version != 1 && s.version != 2)
    throw std::runtime_error("unsupported multi-fidelity snapshot version " +
                             std::to_string(s.version));
  Expect(t, "covariance");
  s.cov = ParseCovariance(t.Next());
  Expect(t, "power_exp_alpha");
  s.power_exp_alpha = t.NextDouble();
  Expect(t, "regression_order");
  s.regression_order = t.NextInt();
  Expect(t, "predict_variance_includes_nugget");
  s.predict_variance_includes_nugget = t.NextInt() != 0;
  if (s.version >= 2) {
    Expect(t, "pca_standardize");
    t.NextInt();  // metadata; ystd is applied directly
  }
  Expect(t, "nparams");
  s.nparams = t.NextInt();
  if (s.version >= 2) {
    Expect(t, "noutputs");
    s.noutputs = t.NextInt();
    Expect(t, "ncomponents");
    s.ncomponents = t.NextInt();
  }
  Expect(t, "nlevels");
  const int L = t.NextInt();
  if (L < 1) throw std::runtime_error("snapshot: nlevels < 1");
  const int d = s.nparams;
  const int r = s.ncomponents;
  for (int k = 0; k < d; ++k) s.param_names.push_back(t.Next());
  for (int j = 0; j < s.noutputs; ++j) s.output_names.push_back(t.Next());
  auto vec = [&t](int k) {
    std::vector<double> v(k);
    for (int i = 0; i < k; ++i) v[i] = t.NextDouble();
    return v;
  };
  s.mins = vec(d);
  s.ranges = vec(d);
  if (s.version >= 2) {
    s.ymean = vec(s.noutputs);
    s.ystd = vec(s.noutputs);
    s.eigenvalues = vec(r);
    s.U = vec(s.noutputs * r);
  }
  const int nt = s.ntheta();
  for (int k = 0; k < L; ++k) {
    Expect(t, "level");
    if (t.NextInt() != k)
      throw std::runtime_error("snapshot: levels out of order");
    MFLevel lv;
    lv.npoints = t.NextInt();
    lv.has_noise = t.NextInt() != 0;
    if (s.version >= 2) {
      lv.theta = vec(r * nt);
      if (k > 0) {
        Expect(t, "rho");
        lv.rhos = vec(r);
      }
      lv.X = vec(lv.npoints * d);
      lv.y = vec(lv.npoints * r);  // Z scores, (n * r) row-major
      if (k > 0) lv.h = vec(lv.npoints * r);
      if (lv.has_noise) lv.noise = vec(lv.npoints * r);
    } else {
      lv.theta = vec(nt);
      if (k > 0) {
        Expect(t, "rho");
        lv.rho = t.NextDouble();
      }
      lv.X = vec(lv.npoints * d);
      lv.y = vec(lv.npoints);
      if (k > 0) lv.h = vec(lv.npoints);
      if (lv.has_noise) lv.noise = vec(lv.npoints);
    }
    s.levels.push_back(std::move(lv));
  }
  return s;
}

MFSnapshot LoadSnapshotMFFile(const std::string& path) {
  std::ifstream f(path);
  if (!f) throw std::runtime_error("cannot open " + path);
  return LoadSnapshotMF(f);
}

MultiFidelityEmulator::MultiFidelityEmulator(const std::string& statefile)
    : MultiFidelityEmulator(LoadSnapshotMFFile(statefile)) {}

MultiFidelityEmulator::MultiFidelityEmulator(const MFSnapshot& snapshot)
    : s_(snapshot) {
  Precompute();
}

// Build one (level, component) GLS factorization: C = K + nugget I
// (+ known noise), H = poly basis (+ the lower-fidelity column whose GLS
// coefficient is rho). X is strided (n x d); y/h/noise are per-component
// columns gathered by the caller.
MultiFidelityEmulator::LevelState MultiFidelityEmulator::BuildLevelState(
    const double* X, const double* y, const double* h, const double* noise,
    const double* theta, int n, bool has_lower) const {
  const int d = s_.nparams;
  const int p = 1 + s_.regression_order * d + (has_lower ? 1 : 0);
  LevelState st;
  st.p = p;
  st.L.assign(n * n, 0.0);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j <= i; ++j) {
      double v = KernelEval(s_.cov, s_.power_exp_alpha, d, &X[i * d],
                            &X[j * d], theta);
      st.L[i * n + j] = v;
      st.L[j * n + i] = v;
    }
  for (int i = 0; i < n; ++i) {
    st.L[i * n + i] += theta[1];
    if (noise) st.L[i * n + i] += noise[i];
  }
  if (!CholeskyLower(st.L, n))
    throw std::runtime_error("multi-fidelity level covariance is not SPD");
  std::vector<double> H(n * p, 0.0);
  for (int i = 0; i < n; ++i) {
    PolyBasisRow(&X[i * d], d, s_.regression_order, &H[i * p]);
    if (has_lower) H[i * p + p - 1] = h[i];
  }
  st.LinvH.assign(n * p, 0.0);
  std::vector<double> colbuf(n);
  for (int j = 0; j < p; ++j) {
    for (int i = 0; i < n; ++i) colbuf[i] = H[i * p + j];
    SolveLower(st.L, n, colbuf.data());
    for (int i = 0; i < n; ++i) st.LinvH[i * p + j] = colbuf[i];
  }
  st.LA.assign(p * p, 0.0);
  for (int a = 0; a < p; ++a)
    for (int b = 0; b <= a; ++b) {
      double sum = 0.0;
      for (int i = 0; i < n; ++i)
        sum += st.LinvH[i * p + a] * st.LinvH[i * p + b];
      st.LA[a * p + b] = sum;
      st.LA[b * p + a] = sum;
    }
  if (!CholeskyLower(st.LA, p))
    throw std::runtime_error(
        "multi-fidelity regression normal matrix is not SPD");
  std::vector<double> Linvy(y, y + n);
  SolveLower(st.L, n, Linvy.data());
  st.beta.assign(p, 0.0);
  for (int a = 0; a < p; ++a) {
    double sum = 0.0;
    for (int i = 0; i < n; ++i) sum += st.LinvH[i * p + a] * Linvy[i];
    st.beta[a] = sum;
  }
  SolveLower(st.LA, p, st.beta.data());
  SolveUpperT(st.LA, p, st.beta.data());
  st.alpha.assign(n, 0.0);
  for (int i = 0; i < n; ++i) {
    double hb = 0.0;
    for (int a = 0; a < p; ++a) hb += H[i * p + a] * st.beta[a];
    st.alpha[i] = y[i] - hb;
  }
  SolveLower(st.L, n, st.alpha.data());
  SolveUpperT(st.L, n, st.alpha.data());
  return st;
}

void MultiFidelityEmulator::Precompute() {
  const int L = (int)s_.levels.size();
  const int nt = s_.ntheta();
  if (s_.version >= 2) {
    const int r = s_.ncomponents;
    levels_.clear();
    levels_.reserve(L * r);
    std::vector<double> ycol, hcol, nzcol;
    for (int k = 0; k < L; ++k) {
      const MFLevel& lv = s_.levels[k];
      const int n = lv.npoints;
      for (int c = 0; c < r; ++c) {
        ycol.resize(n);
        for (int i = 0; i < n; ++i) ycol[i] = lv.y[i * r + c];
        const double* hp = nullptr;
        if (k > 0) {
          hcol.resize(n);
          for (int i = 0; i < n; ++i) hcol[i] = lv.h[i * r + c];
          hp = hcol.data();
        }
        const double* nzp = nullptr;
        if (lv.has_noise) {
          nzcol.resize(n);
          for (int i = 0; i < n; ++i) nzcol[i] = lv.noise[i * r + c];
          nzp = nzcol.data();
        }
        levels_.push_back(BuildLevelState(lv.X.data(), ycol.data(), hp, nzp,
                                          &lv.theta[c * nt], n, k > 0));
      }
    }
    return;
  }
  levels_.clear();
  levels_.reserve(L);
  for (int k = 0; k < L; ++k) {
    const MFLevel& lv = s_.levels[k];
    levels_.push_back(BuildLevelState(
        lv.X.data(), lv.y.data(), k > 0 ? lv.h.data() : nullptr,
        lv.has_noise ? lv.noise.data() : nullptr, lv.theta.data(),
        lv.npoints, k > 0));
  }
}

double MultiFidelityEmulator::QueryLevel(const LevelState& st,
                                         const double* X, const double* theta,
                                         int n, const double* xs,
                                         double lower_mean, bool has_lower,
                                         double* var_gp) const {
  const int d = s_.nparams;
  const int p = st.p;
  std::vector<double> ks(n);
  for (int i = 0; i < n; ++i)
    ks[i] = KernelEval(s_.cov, s_.power_exp_alpha, d, &X[i * d], xs, theta);
  std::vector<double> h(p);
  PolyBasisRow(xs, d, s_.regression_order, h.data());
  if (has_lower) h[p - 1] = lower_mean;
  double m = 0.0;
  for (int a = 0; a < p; ++a) m += h[a] * st.beta[a];
  for (int i = 0; i < n; ++i) m += ks[i] * st.alpha[i];
  std::vector<double> v = ks;
  SolveLower(st.L, n, v.data());
  double kss = theta[0] +
               (s_.predict_variance_includes_nugget ? theta[1] : 0.0);
  double vv = 0.0;
  for (int i = 0; i < n; ++i) vv += v[i] * v[i];
  std::vector<double> g(p);
  for (int a = 0; a < p; ++a) {
    double sum = h[a];
    for (int i = 0; i < n; ++i) sum -= st.LinvH[i * p + a] * v[i];
    g[a] = sum;
  }
  SolveLower(st.LA, p, g.data());
  double ww = 0.0;
  for (int a = 0; a < p; ++a) ww += g[a] * g[a];
  double out = kss - vv + ww;
  *var_gp = out > 0.0 ? out : 0.0;
  return m;
}

void MultiFidelityEmulator::QueryEmulator(const std::vector<double>& x,
                                          std::vector<double>& means,
                                          std::vector<double>& errors) const {
  const int d = s_.nparams;
  if ((int)x.size() != d)
    throw std::invalid_argument("QueryEmulator: wrong point dimension");
  std::vector<double> xs(d);
  for (int k = 0; k < d; ++k) xs[k] = (x[k] - s_.mins[k]) / s_.ranges[k];
  const int nt = s_.ntheta();
  if (s_.version >= 2) {
    // componentwise recursion in score space, then the PCA rotation —
    // models/multifidelity.py _predict_recursive_mv +
    // models/multivariate.py reconstruct_observables
    const int r = s_.ncomponents, t = s_.noutputs;
    std::vector<double> m_pc(r, 0.0), v_pc(r, 0.0);
    for (int c = 0; c < r; ++c) {
      double mean = 0.0, var = 0.0;
      for (size_t k = 0; k < s_.levels.size(); ++k) {
        const MFLevel& lv = s_.levels[k];
        double var_gp = 0.0;
        const double rho = k > 0 ? lv.rhos[c] : 0.0;
        mean = QueryLevel(levels_[k * r + c], lv.X.data(),
                          &lv.theta[c * nt], lv.npoints, xs.data(), mean,
                          k > 0, &var_gp);
        var = (k > 0 ? rho * rho * var : 0.0) + var_gp;
      }
      m_pc[c] = mean;
      v_pc[c] = var;
    }
    means.assign(t, 0.0);
    errors.assign(t, 0.0);
    for (int j = 0; j < t; ++j) {
      double mj = 0.0, vj = 0.0;
      for (int c = 0; c < r; ++c) {
        const double u = s_.U[j * r + c];
        mj += std::sqrt(s_.eigenvalues[c]) * u * m_pc[c];
        vj += s_.eigenvalues[c] * u * u * v_pc[c];
      }
      means[j] = s_.ymean[j] + s_.ystd[j] * mj;
      errors[j] = s_.ystd[j] * s_.ystd[j] * vj;
    }
    return;
  }
  // recursive serve (models/multifidelity.py _predict_recursive):
  // mean_k = h.beta + k*.alpha with the level-(k-1) recursive mean as the
  // last basis column; var_k = rho_k^2 var_{k-1} + varGP_k.
  double mean = 0.0, var = 0.0;
  for (size_t k = 0; k < s_.levels.size(); ++k) {
    const MFLevel& lv = s_.levels[k];
    double var_gp = 0.0;
    mean = QueryLevel(levels_[k], lv.X.data(), lv.theta.data(), lv.npoints,
                      xs.data(), mean, k > 0, &var_gp);
    var = (k > 0 ? lv.rho * lv.rho * var : 0.0) + var_gp;
  }
  means.assign(1, mean);
  errors.assign(1, var);
}

// ---------------------------------------------------------------------------
// Sparse (SGPR) serving — io/snapshot.py write_snapshot_sparse grammar,
// models/sparse.py predict_sgpr math. The payload IS the serve state.
// ---------------------------------------------------------------------------

int SGPRSnapshot::ntheta() const {
  const bool ard = cov == Covariance::kPowerExponential ||
                   cov == Covariance::kMatern32Ard ||
                   cov == Covariance::kMatern52Ard;
  return 2 + (ard ? nparams : 1);
}

SGPRSnapshot LoadSnapshotSGPR(std::istream& in) {
  Tokens t(in);
  if (t.Next() != "MADAIEMULATOR_TPU_SNAPSHOT_SGPR")
    throw std::runtime_error("not a sparse (SGPR) snapshot");
  SGPRSnapshot s;
  s.version = t.NextInt();
  if (s.version != 1)
    throw std::runtime_error("unsupported sparse snapshot version " +
                             std::to_string(s.version));
  Expect(t, "covariance");
  s.cov = ParseCovariance(t.Next());
  Expect(t, "power_exp_alpha");
  s.power_exp_alpha = t.NextDouble();
  Expect(t, "regression_order");
  s.regression_order = t.NextInt();
  Expect(t, "predict_variance_includes_nugget");
  s.predict_variance_includes_nugget = t.NextInt() != 0;
  Expect(t, "pca_standardize");
  s.pca_standardize = t.NextInt() != 0;
  Expect(t, "nparams");
  s.nparams = t.NextInt();
  Expect(t, "noutputs");
  s.noutputs = t.NextInt();
  Expect(t, "ninducing");
  s.ninducing = t.NextInt();
  Expect(t, "ncomponents");
  s.ncomponents = t.NextInt();
  const int d = s.nparams, tt = s.noutputs, m = s.ninducing,
            r = s.ncomponents, p = s.p();
  for (int k = 0; k < d; ++k) s.param_names.push_back(t.Next());
  for (int k = 0; k < tt; ++k) s.output_names.push_back(t.Next());
  auto vec = [&t](int k) {
    std::vector<double> v(k);
    for (int i = 0; i < k; ++i) v[i] = t.NextDouble();
    return v;
  };
  s.mins = vec(d);
  s.ranges = vec(d);
  s.ymean = vec(tt);
  s.ystd = vec(tt);
  s.eigenvalues = vec(r);
  s.U = vec(tt * r);
  s.Z = vec(m * d);
  s.thetas = vec(r * s.ntheta());
  s.Lm.reserve(r * m * m);
  s.LB.reserve(r * m * m);
  s.c.reserve(r * m);
  s.beta.reserve(r * p);
  s.LA.reserve(r * p * p);
  s.E.reserve(r * m * p);
  auto append = [&](std::vector<double>& dst, int k) {
    for (int i = 0; i < k; ++i) dst.push_back(t.NextDouble());
  };
  for (int comp = 0; comp < r; ++comp) {
    append(s.Lm, m * m);
    append(s.LB, m * m);
    append(s.c, m);
    append(s.beta, p);
    append(s.LA, p * p);
    append(s.E, m * p);
  }
  return s;
}

SGPRSnapshot LoadSnapshotSGPRFile(const std::string& path) {
  std::ifstream f(path);
  if (!f) throw std::runtime_error("cannot open " + path);
  return LoadSnapshotSGPR(f);
}

SparseEmulator::SparseEmulator(const std::string& statefile)
    : SparseEmulator(LoadSnapshotSGPRFile(statefile)) {}

SparseEmulator::SparseEmulator(const SGPRSnapshot& snapshot) : s_(snapshot) {}

void SparseEmulator::PredictComponent(int comp, const std::vector<double>& xs,
                                      double* mean, double* var) const {
  const int d = s_.nparams, m = s_.ninducing, p = s_.p();
  const int nt = s_.ntheta();
  const double* th = &s_.thetas[comp * nt];
  const double* Lm = &s_.Lm[comp * m * m];
  const double* LB = &s_.LB[comp * m * m];
  const double* cv = &s_.c[comp * m];
  const double* beta = &s_.beta[comp * p];
  const double* LA = &s_.LA[comp * p * p];
  const double* E = &s_.E[comp * m * p];
  // v1 = Lm^-1 k_m(x*), v2 = LB^-1 v1 (forward substitution on raw ptrs)
  std::vector<double> v1(m);
  for (int i = 0; i < m; ++i)
    v1[i] = KernelEval(s_.cov, s_.power_exp_alpha, d, &s_.Z[i * d],
                       xs.data(), th);
  for (int i = 0; i < m; ++i) {
    double sum = v1[i];
    for (int k = 0; k < i; ++k) sum -= Lm[i * m + k] * v1[k];
    v1[i] = sum / Lm[i * m + i];
  }
  std::vector<double> v2 = v1;
  for (int i = 0; i < m; ++i) {
    double sum = v2[i];
    for (int k = 0; k < i; ++k) sum -= LB[i * m + k] * v2[k];
    v2[i] = sum / LB[i * m + i];
  }
  std::vector<double> h(p);
  PolyBasisRow(xs.data(), d, s_.regression_order, h.data());
  double mu = 0.0;
  for (int a = 0; a < p; ++a) mu += h[a] * beta[a];
  for (int i = 0; i < m; ++i) mu += v2[i] * cv[i];
  *mean = mu;
  double kss = th[0] + (s_.predict_variance_includes_nugget ? th[1] : 0.0);
  double n1 = 0.0, n2 = 0.0;
  for (int i = 0; i < m; ++i) {
    n1 += v1[i] * v1[i];
    n2 += v2[i] * v2[i];
  }
  // g = h - E^T v1 ; w = LA^-1 g
  std::vector<double> g(p);
  for (int a = 0; a < p; ++a) {
    double sum = h[a];
    for (int i = 0; i < m; ++i) sum -= E[i * p + a] * v1[i];
    g[a] = sum;
  }
  for (int a = 0; a < p; ++a) {
    double sum = g[a];
    for (int k = 0; k < a; ++k) sum -= LA[a * p + k] * g[k];
    g[a] = sum / LA[a * p + a];
  }
  double nw = 0.0;
  for (int a = 0; a < p; ++a) nw += g[a] * g[a];
  double out = kss - n1 + n2 + nw;
  *var = out > 0.0 ? out : 0.0;
}

void SparseEmulator::QueryEmulator(const std::vector<double>& x,
                                   std::vector<double>& means,
                                   std::vector<double>& errors) const {
  const int d = s_.nparams, t = s_.noutputs, r = s_.ncomponents;
  if ((int)x.size() != d)
    throw std::invalid_argument("QueryEmulator: wrong point dimension");
  std::vector<double> xs(d);
  for (int k = 0; k < d; ++k) xs[k] = (x[k] - s_.mins[k]) / s_.ranges[k];
  std::vector<double> m_pc(r), v_pc(r);
  for (int comp = 0; comp < r; ++comp)
    PredictComponent(comp, xs, &m_pc[comp], &v_pc[comp]);
  means.assign(t, 0.0);
  errors.assign(t, 0.0);
  for (int j = 0; j < t; ++j) {
    double mj = 0.0, vj = 0.0;
    for (int comp = 0; comp < r; ++comp) {
      const double u = s_.U[j * r + comp];
      mj += std::sqrt(s_.eigenvalues[comp]) * u * m_pc[comp];
      vj += s_.eigenvalues[comp] * u * u * v_pc[comp];
    }
    means[j] = s_.ymean[j] + s_.ystd[j] * mj;
    errors[j] = s_.ystd[j] * s_.ystd[j] * vj;
  }
}

std::unique_ptr<EmulatorBase> LoadEmulatorAuto(const std::string& path) {
  std::ifstream f(path);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::string magic;
  f >> magic;
  f.close();
  if (magic == "MADAIEMULATOR_TPU_SNAPSHOT_MF")
    return std::unique_ptr<EmulatorBase>(new MultiFidelityEmulator(path));
  if (magic == "MADAIEMULATOR_TPU_SNAPSHOT_SGPR")
    return std::unique_ptr<EmulatorBase>(new SparseEmulator(path));
  return std::unique_ptr<EmulatorBase>(new Emulator(path));
}

}  // namespace madai_tpu

// ---------------------------------------------------------------------------
// C ABI for ctypes / FFI consumers (the moral equivalent of the reference's
// R-binding .C() surface, ref: src/libRbind/rbind.c). Dispatches on the
// snapshot's magic token: dense multivariate (v1-v3) and multi-fidelity
// snapshots serve through the same four functions.
// ---------------------------------------------------------------------------

extern "C" {

void* madai_emulator_load(const char* path, char* err, int errlen) {
  try {
    return madai_tpu::LoadEmulatorAuto(std::string(path)).release();
  } catch (const std::exception& e) {
    if (err && errlen > 0) std::snprintf(err, errlen, "%s", e.what());
    return nullptr;
  }
}

int madai_emulator_nparams(void* h) {
  return static_cast<madai_tpu::EmulatorBase*>(h)->number_of_parameters();
}

int madai_emulator_noutputs(void* h) {
  return static_cast<madai_tpu::EmulatorBase*>(h)->number_of_outputs();
}

// x: (nparams), means/vars: (noutputs). Returns 0 on success.
int madai_emulator_query(void* h, const double* x, double* means,
                         double* vars) {
  try {
    auto* e = static_cast<madai_tpu::EmulatorBase*>(h);
    std::vector<double> xv(x, x + e->number_of_parameters());
    std::vector<double> m, v;
    e->QueryEmulator(xv, m, v);
    std::memcpy(means, m.data(), m.size() * sizeof(double));
    std::memcpy(vars, v.data(), v.size() * sizeof(double));
    return 0;
  } catch (const std::exception&) {
    return 1;
  }
}

void madai_emulator_free(void* h) {
  delete static_cast<madai_tpu::EmulatorBase*>(h);
}

}  // extern "C"
