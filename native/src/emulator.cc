// Implementation of the C++ embedding API. Self-contained dense linear
// algebra (no GSL/LAPACK dependency, unlike the reference): unblocked
// Cholesky + triangular solves are ample for serve-time N (the TPU path owns
// large-N work). Math mirrors madaiemulator_tpu/models/gp.py:
//   C = K + (nugget + jitter)I ; H poly basis ; A = H^T C^-1 H
//   beta = A^-1 H^T C^-1 z ; alpha = C^-1 (z - H beta)
//   mean = h.beta + k*.alpha
//   var  = k(x,x) - ||L^-1 k*||^2 + ||LA^-1 (h - LinvH^T L^-1 k*)||^2
// then PCA reconstruction as in models/multivariate.py.

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
  if (s.version != 1 && s.version != 2)
    throw std::runtime_error(
        "unsupported snapshot version " + std::to_string(s.version) +
        " (this reader implements versions 1-2; version 3 carries "
        "gradient-enhanced payloads served by the JAX path only)");
  Expect(t, "covariance");
  std::string cov = t.Next();
  if (cov == "power_exponential" || cov == "gaussian")
    s.cov = Covariance::kPowerExponential;
  else if (cov == "matern32")
    s.cov = Covariance::kMatern32;
  else if (cov == "matern52")
    s.cov = Covariance::kMatern52;
  else if (cov == "matern32_ard")
    s.cov = Covariance::kMatern32Ard;
  else if (cov == "matern52_ard")
    s.cov = Covariance::kMatern52Ard;
  else
    throw std::runtime_error("unknown covariance " + cov);
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
  if (s.version >= 2)  // trailing per-point PC-space noise block (n x r)
    s.noise = vec(s.npoints * s.ncomponents);
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
  const double amp = theta[0];
  if (s_.cov == Covariance::kPowerExponential) {
    double acc = 0.0;
    for (int k = 0; k < s_.nparams; ++k) {
      double dk = std::fabs(a[k] - b[k]) / theta[2 + k];
      acc += (s_.power_exp_alpha == 2.0) ? dk * dk
                                         : std::pow(dk, s_.power_exp_alpha);
    }
    return amp * std::exp(-0.5 * acc);
  }
  const bool ard = s_.cov == Covariance::kMatern32Ard ||
                   s_.cov == Covariance::kMatern52Ard;
  double r2 = 0.0;
  for (int k = 0; k < s_.nparams; ++k) {
    double dk = (a[k] - b[k]) / theta[ard ? 2 + k : 2];
    r2 += dk * dk;
  }
  double r = std::sqrt(r2);
  if (s_.cov == Covariance::kMatern32 || s_.cov == Covariance::kMatern32Ard) {
    double sq = std::sqrt(3.0) * r;
    return amp * (1.0 + sq) * std::exp(-sq);
  }
  double sq = std::sqrt(5.0) * r;
  return amp * (1.0 + sq + sq * sq / 3.0) * std::exp(-sq);
}

void Emulator::Precompute() {
  const int n = s_.npoints, d = s_.nparams, r = s_.ncomponents;
  const int nt = s_.ntheta();
  comps_.resize(r);
  // regression basis H (n*p), shared across components
  std::vector<double> H(n * p_);
  for (int i = 0; i < n; ++i) {
    H[i * p_] = 1.0;
    int col = 1;
    for (int q = 1; q <= s_.regression_order; ++q)
      for (int k = 0; k < d; ++k)
        H[i * p_ + col++] = std::pow(s_.X[i * d + k], q);
  }
  for (int c = 0; c < r; ++c) {
    const double* th = &s_.thetas[c * nt];
    ComponentState& st = comps_[c];
    st.L.assign(n * n, 0.0);
    for (int i = 0; i < n; ++i)
      for (int j = 0; j <= i; ++j) {
        double v = Kernel(&s_.X[i * d], &s_.X[j * d], th);
        st.L[i * n + j] = v;
        st.L[j * n + i] = v;
      }
    const double nugget = th[1];
    for (int i = 0; i < n; ++i) st.L[i * n + i] += nugget;
    if (!s_.noise.empty())  // heteroscedastic known observation noise
      for (int i = 0; i < n; ++i) st.L[i * n + i] += s_.noise[i * r + c];
    if (!CholeskyLower(st.L, n))
      throw std::runtime_error("snapshot covariance is not SPD");
    // LinvH = L^-1 H, column by column
    st.LinvH.assign(n * p_, 0.0);
    std::vector<double> colbuf(n);
    for (int j = 0; j < p_; ++j) {
      for (int i = 0; i < n; ++i) colbuf[i] = H[i * p_ + j];
      SolveLower(st.L, n, colbuf.data());
      for (int i = 0; i < n; ++i) st.LinvH[i * p_ + j] = colbuf[i];
    }
    // A = LinvH^T LinvH ; LA = chol(A)
    st.LA.assign(p_ * p_, 0.0);
    for (int a = 0; a < p_; ++a)
      for (int b = 0; b <= a; ++b) {
        double sum = 0.0;
        for (int i = 0; i < n; ++i)
          sum += st.LinvH[i * p_ + a] * st.LinvH[i * p_ + b];
        st.LA[a * p_ + b] = sum;
        st.LA[b * p_ + a] = sum;
      }
    if (!CholeskyLower(st.LA, p_))
      throw std::runtime_error("regression normal matrix is not SPD");
    // beta = A^-1 LinvH^T (L^-1 z)
    std::vector<double> Linvz(n);
    for (int i = 0; i < n; ++i) Linvz[i] = s_.Z[i * r + c];
    SolveLower(st.L, n, Linvz.data());
    st.beta.assign(p_, 0.0);
    for (int a = 0; a < p_; ++a) {
      double sum = 0.0;
      for (int i = 0; i < n; ++i) sum += st.LinvH[i * p_ + a] * Linvz[i];
      st.beta[a] = sum;
    }
    SolveLower(st.LA, p_, st.beta.data());
    SolveUpperT(st.LA, p_, st.beta.data());
    // alpha = C^-1 (z - H beta)
    st.alpha.assign(n, 0.0);
    for (int i = 0; i < n; ++i) {
      double hb = 0.0;
      for (int a = 0; a < p_; ++a) hb += H[i * p_ + a] * st.beta[a];
      st.alpha[i] = s_.Z[i * r + c] - hb;
    }
    SolveLower(st.L, n, st.alpha.data());
    SolveUpperT(st.L, n, st.alpha.data());
  }
}

void Emulator::PredictComponent(int c, const std::vector<double>& xs,
                                double* mean, double* var) const {
  const int n = s_.npoints, d = s_.nparams;
  const int nt = s_.ntheta();
  const double* th = &s_.thetas[c * nt];
  const ComponentState& st = comps_[c];
  // k* and h(x*)
  std::vector<double> ks(n);
  for (int i = 0; i < n; ++i) ks[i] = Kernel(&s_.X[i * d], xs.data(), th);
  std::vector<double> h(p_);
  h[0] = 1.0;
  {
    int col = 1;
    for (int q = 1; q <= s_.regression_order; ++q)
      for (int k = 0; k < d; ++k) h[col++] = std::pow(xs[k], q);
  }
  double m = 0.0;
  for (int a = 0; a < p_; ++a) m += h[a] * st.beta[a];
  for (int i = 0; i < n; ++i) m += ks[i] * st.alpha[i];
  *mean = m;
  // v = L^-1 k*
  std::vector<double> v = ks;
  SolveLower(st.L, n, v.data());
  double kss = th[0] + (s_.predict_variance_includes_nugget ? th[1] : 0.0);
  double vv = 0.0;
  for (int i = 0; i < n; ++i) vv += v[i] * v[i];
  // g = h - LinvH^T v ; w = LA^-1 g
  std::vector<double> g(p_);
  for (int a = 0; a < p_; ++a) {
    double s = h[a];
    for (int i = 0; i < n; ++i) s -= st.LinvH[i * p_ + a] * v[i];
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

}  // namespace madai_tpu

// ---------------------------------------------------------------------------
// C ABI for ctypes / FFI consumers (the moral equivalent of the reference's
// R-binding .C() surface, ref: src/libRbind/rbind.c).
// ---------------------------------------------------------------------------

extern "C" {

void* madai_emulator_load(const char* path, char* err, int errlen) {
  try {
    return new madai_tpu::Emulator(std::string(path));
  } catch (const std::exception& e) {
    if (err && errlen > 0) std::snprintf(err, errlen, "%s", e.what());
    return nullptr;
  }
}

int madai_emulator_nparams(void* h) {
  return static_cast<madai_tpu::Emulator*>(h)->number_of_parameters();
}

int madai_emulator_noutputs(void* h) {
  return static_cast<madai_tpu::Emulator*>(h)->number_of_outputs();
}

// x: (nparams), means/vars: (noutputs). Returns 0 on success.
int madai_emulator_query(void* h, const double* x, double* means,
                         double* vars) {
  try {
    auto* e = static_cast<madai_tpu::Emulator*>(h);
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
  delete static_cast<madai_tpu::Emulator*>(h);
}

}  // extern "C"
