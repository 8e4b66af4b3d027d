"""Multi-scale RBF maximum mean discrepancy for scalar samples.

Same estimator as the reference (evaluation/mmd.py:6-63): median-free
bandwidth = mean pairwise squared distance over the pooled sample, a
5-kernel x2 bandwidth ladder, biased V-statistic. Vectorised NumPy with
chunking; the pairwise-sum bandwidth uses the closed form
sum_ij (x_i-x_j)^2 = 2n*sum(x^2) - 2*(sum x)^2 for scalar inputs.
"""

from __future__ import annotations

import numpy as np

__all__ = ["compute_mmd"]


def _kernel_sum(a: np.ndarray, b: np.ndarray, bandwidths, chunk: int = 4096):
    """sum over kernels k of sum_ij exp(-(a_i-b_j)^2 / bw_k)."""
    total = 0.0
    for i in range(0, len(a), chunk):
        d2 = (a[i : i + chunk, None] - b[None, :]) ** 2
        for bw in bandwidths:
            total += float(np.exp(-d2 / bw).sum())
    return total


def compute_mmd(source, target, kernel_mul: float = 2.0, kernel_num: int = 5,
                fix_sigma=None) -> float:
    source = np.asarray(source, np.float64).reshape(-1)
    target = np.asarray(target, np.float64).reshape(-1)
    n_s, n_t = len(source), len(target)
    if n_s == 0 or n_t == 0:
        return float("nan")
    total = np.concatenate([source, target])
    n = n_s + n_t

    if fix_sigma:
        bandwidth = float(fix_sigma)
    else:
        s1 = total.sum()
        s2 = (total**2).sum()
        bandwidth = float(2 * n * s2 - 2 * s1 * s1) / (n * n - n)

    bandwidth /= kernel_mul ** (kernel_num // 2)
    bandwidths = [bandwidth * (kernel_mul**i) for i in range(kernel_num)]

    xx = _kernel_sum(source, source, bandwidths) / (n_s * n_s)
    yy = _kernel_sum(target, target, bandwidths) / (n_t * n_t)
    xy = _kernel_sum(source, target, bandwidths) / (n_s * n_t)
    return xx + yy - 2 * xy
