"""Monte Carlo statistics: means, binned errors, autocorrelation.

Reference: `vmc_basic/monte_carlo_tools/statistics.h`
(`MeanAndBinnedErrorSqrtNUniformBin` :147) and the measurer's autocorrelation
helpers (`monte_carlo_peps_measurer.h:54-114`).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mean_and_binned_error_batch(samples: jnp.ndarray):
    """Vectorized binned statistics over trailing observable axes.

    samples: [S, C, K] (sweeps x chains x observables). Returns
    (means [K], stderrs [K]) with sqrt(S) binning along the sweep axis —
    one fused reduction instead of K python-loop iterations (reference:
    the measurer's per-key statistics, monte_carlo_peps_measurer.h)."""
    samples = jnp.asarray(samples)
    s, c, k = samples.shape
    nbins = max(int(np.sqrt(s)), 1)
    bin_len = s // nbins
    usable = nbins * bin_len
    binned = samples[:usable].reshape(nbins, bin_len, c, k).mean(axis=1)
    binned = binned.reshape(nbins * c, k)
    mean = jnp.mean(binned, axis=0)
    n_indep = nbins * c
    if n_indep > 1:
        var = jnp.var(binned, axis=0)
    else:
        var = jnp.zeros_like(mean)
    stderr = jnp.sqrt(var / max(n_indep - 1, 1))
    return mean, stderr


def weighted_mean_and_binned_error_batch(samples, log_weights):
    """Self-normalized importance-sampling statistics with binned jackknife
    errors (for umbrella-sampled estimators, e.g. the hole-attraction-biased
    pair-correlation pass: samples drawn from |psi e^J|^2, log_weights =
    -2 J so that E_|psi|^2[X] = sum(w X) / sum(w)).

    samples: [S, C, K]; log_weights: [S, C]. Bins of ~sqrt(S) along the
    sweep axis absorb autocorrelation; (bin, chain) blocks are treated as
    independent and the ratio estimator's error comes from leave-one-block-
    out jackknife (a plain binned stderr is biased for ratios).

    Returns (means [K], stderrs [K])."""
    samples = jnp.asarray(samples)
    lw = jnp.asarray(log_weights)
    s, c, k = samples.shape
    w = jnp.exp(lw - jnp.max(lw))[..., None]            # [S, C, 1]
    nbins = max(int(np.sqrt(s)), 1)
    bin_len = s // nbins
    usable = nbins * bin_len
    num = (w * samples)[:usable].reshape(nbins, bin_len, c, k).sum(axis=1)
    den = jnp.broadcast_to(w, (s, c, k))[:usable].reshape(
        nbins, bin_len, c, k).sum(axis=1)
    num = num.reshape(nbins * c, k)
    den = den.reshape(nbins * c, k)
    tot_num = jnp.sum(num, axis=0)
    tot_den = jnp.sum(den, axis=0)
    mean = tot_num / tot_den
    nb = nbins * c
    if nb > 1:
        # jackknife: theta_(i) with block i removed
        jk = (tot_num[None] - num) / (tot_den[None] - den)
        jk_mean = jnp.mean(jk, axis=0)
        var = (nb - 1) / nb * jnp.sum((jk - jk_mean) ** 2, axis=0)
        stderr = jnp.sqrt(var)
    else:
        stderr = jnp.zeros_like(mean)
    return mean, stderr


def mean_and_binned_error(samples: jnp.ndarray):
    """samples: [S] or [S, C] (sweeps x chains). Bins of size ~sqrt(S) along
    the sweep axis absorb autocorrelation; chains are independent.

    Returns (mean, stderr)."""
    samples = jnp.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    s, c = samples.shape
    nbins = max(int(np.sqrt(s)), 1)
    bin_len = s // nbins
    usable = nbins * bin_len
    binned = samples[:usable].reshape(nbins, bin_len, c).mean(axis=1)  # [B, C]
    mean = jnp.mean(binned)
    n_indep = nbins * c
    var = jnp.var(binned) if n_indep > 1 else jnp.zeros_like(mean)
    stderr = jnp.sqrt(var / jnp.maximum(n_indep - 1, 1))
    return mean, stderr


def autocorrelation(samples: np.ndarray, max_lag: int | None = None) -> np.ndarray:
    """Normalized autocorrelation function along axis 0 (host-side)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    s = x.shape[0]
    if max_lag is None:
        max_lag = min(s // 4, 100)
    xc = x - x.mean(axis=0, keepdims=True)
    var = (xc ** 2).mean()
    out = np.empty(max_lag + 1)
    for lag in range(max_lag + 1):
        out[lag] = (xc[:s - lag] * xc[lag:]).mean() / max(var, 1e-300)
    return out


def integrated_autocorrelation_time(samples: np.ndarray) -> float:
    """tau_int = 1/2 + sum rho(lag), truncated at first negative."""
    rho = autocorrelation(samples)
    tau = 0.5
    for lag in range(1, len(rho)):
        if rho[lag] <= 0:
            break
        tau += rho[lag]
    return float(tau)
