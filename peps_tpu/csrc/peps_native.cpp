// Native sampler-support library for peps_tpu.
//
// The reference implements its runtime layer (configuration containers,
// statistics, MPI orchestration) in C++ (include/qlpeps/vmc_basic/
// configuration.h, monte_carlo_tools/statistics.h). The TPU rebuild keeps
// the compute path in XLA; this library provides the host-side hot paths
// that are awkward or slow in Python:
//   * multiset-permutation enumeration of fixed-occupancy configuration
//     sectors (exact-summation evaluators, Sz-sector tooling),
//   * sqrt(N) uniform binning statistics over (samples x chains) arrays,
//   * autocorrelation functions / integrated autocorrelation time.
// Exposed with a C ABI for ctypes.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Count multiset permutations (n! / prod counts!) with overflow clamp.
long long count_sector_configs(int n_sites, int d, const int* counts) {
  long double res = 1.0L;
  int placed = 0;
  for (int s = 0; s < d; ++s) {
    for (int k = 1; k <= counts[s]; ++k) {
      ++placed;
      res = res * placed / k;
    }
  }
  if (placed != n_sites) return -1;
  if (res > 9e17L) return -2;
  return (long long)(res + 0.5L);
}

// Enumerate all fixed-occupancy configurations in lexicographic order.
// out: [max_out * n_sites] int32 row-major. Returns number written, or -1 on
// bad counts, -(needed) if max_out too small.
long long enumerate_sector_configs(int n_sites, int d, const int* counts,
                                   int32_t* out, long long max_out) {
  long long total = count_sector_configs(n_sites, d, counts);
  if (total < 0) return -1;
  if (total > max_out) return -total;
  std::vector<int32_t> cur(n_sites);
  {
    int idx = 0;
    for (int s = 0; s < d; ++s)
      for (int k = 0; k < counts[s]; ++k) cur[idx++] = s;
  }
  long long row = 0;
  do {
    std::copy(cur.begin(), cur.end(), out + row * n_sites);
    ++row;
  } while (std::next_permutation(cur.begin(), cur.end()));
  return row;
}

// sqrt(N)-uniform-bin mean and standard error over [s, c] samples
// (reference: MeanAndBinnedErrorSqrtNUniformBin, statistics.h:147).
void binned_stats(const double* samples, long long s, long long c,
                  double* mean_out, double* stderr_out) {
  long long nbins = (long long)std::sqrt((double)s);
  if (nbins < 1) nbins = 1;
  long long bin_len = s / nbins;
  if (bin_len < 1) { bin_len = 1; nbins = s; }
  long long usable = nbins * bin_len;
  std::vector<double> bins;
  bins.reserve((size_t)(nbins * c));
  for (long long ch = 0; ch < c; ++ch) {
    for (long long b = 0; b < nbins; ++b) {
      double acc = 0.0;
      for (long long i = 0; i < bin_len; ++i)
        acc += samples[(b * bin_len + i) * c + ch];
      bins.push_back(acc / bin_len);
    }
  }
  double m = 0.0;
  for (double v : bins) m += v;
  m /= bins.size();
  double var = 0.0;
  for (double v : bins) var += (v - m) * (v - m);
  long long n_indep = (long long)bins.size();
  *mean_out = m;
  *stderr_out = n_indep > 1 ? std::sqrt(var / (n_indep * (n_indep - 1)))
                            : 0.0;
  (void)usable;
}

// Normalized autocorrelation over axis 0 of [n, c]; out[max_lag+1].
void autocorrelation(const double* x, long long n, long long c,
                     long long max_lag, double* out) {
  std::vector<double> mean(c, 0.0);
  for (long long i = 0; i < n; ++i)
    for (long long ch = 0; ch < c; ++ch) mean[ch] += x[i * c + ch];
  for (long long ch = 0; ch < c; ++ch) mean[ch] /= n;
  double var = 0.0;
  for (long long i = 0; i < n; ++i)
    for (long long ch = 0; ch < c; ++ch) {
      double d0 = x[i * c + ch] - mean[ch];
      var += d0 * d0;
    }
  var /= (double)(n * c);
  if (var <= 0) var = 1e-300;
  for (long long lag = 0; lag <= max_lag; ++lag) {
    double acc = 0.0;
    long long cnt = 0;
    for (long long i = 0; i + lag < n; ++i)
      for (long long ch = 0; ch < c; ++ch) {
        acc += (x[i * c + ch] - mean[ch]) * (x[(i + lag) * c + ch] - mean[ch]);
        ++cnt;
      }
    out[lag] = acc / (cnt * var);
  }
}

double integrated_autocorr_time(const double* x, long long n, long long c,
                                long long max_lag) {
  std::vector<double> rho(max_lag + 1);
  autocorrelation(x, n, c, max_lag, rho.data());
  double tau = 0.5;
  for (long long lag = 1; lag <= max_lag; ++lag) {
    if (rho[lag] <= 0) break;
    tau += rho[lag];
  }
  return tau;
}

}  // extern "C"
