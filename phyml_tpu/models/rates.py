"""Rates-across-sites: discrete Gamma, +I, FreeRate.

Parity target: the reference's DiscreteGamma (stats.c:1974, the
Yang 1994 discretization with mean or median binning) and the t_ras
settings (utilities.h:1218-1263, Update_RAS models.c:669).

Everything here is jittable and differentiable: the Gamma quantile is
computed with Newton iterations on the regularized incomplete gamma
(jax.scipy.special.gammainc) from a Wilson-Hilferty start, so alpha
optimization can run inside one compiled program (the reference has
to call out to host code for this; we do not).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammainc, gammaln


def gamma_icdf(p, alpha, n_newton: int = 40):
    """Quantile of Gamma(shape=alpha, scale=1) via Newton in log-x.

    Accurate to ~1e-12 (fp64) / fp32 precision across
    alpha in [1e-3, 1e3], p in (0, 1).
    """
    p = jnp.asarray(p)
    alpha = jnp.asarray(alpha)
    # Wilson-Hilferty starting point (chi^2_{2a}/2)
    z = jnp.sqrt(2.0) * _erfinv_approx(2.0 * p - 1.0)
    c = 1.0 - 1.0 / (9.0 * alpha) + z / (3.0 * jnp.sqrt(alpha))
    x0 = alpha * jnp.clip(c, 1e-3, None) ** 3
    x0 = jnp.clip(x0, 1e-30, None)
    y0 = jnp.log(x0)

    def body(_, y):
        x = jnp.exp(y)
        f = gammainc(alpha, x) - p
        # d/dy gammainc(a, e^y) = pdf(e^y) * e^y
        logpdf_y = alpha * y - x - gammaln(alpha)
        step = f * jnp.exp(-logpdf_y)
        return y - jnp.clip(step, -2.0, 2.0)

    y = jax.lax.fori_loop(0, n_newton, body, y0)
    return jnp.exp(y)


def _erfinv_approx(x):
    """Inverse error function (Giles 2010 polynomial), adequate as a
    Newton starting point."""
    w = -jnp.log(jnp.clip((1.0 - x) * (1.0 + x), 1e-30, None))
    w_small = w - 2.5
    p_small = 2.81022636e-08
    for c in (3.43273939e-07, -3.5233877e-06, -4.39150654e-06,
              0.00021858087, -0.00125372503, -0.00417768164,
              0.246640727, 1.50140941):
        p_small = p_small * w_small + c
    w_big = jnp.sqrt(jnp.clip(w, 1e-30, None)) - 3.0
    p_big = -0.000200214257
    for c in (0.000100950558, 0.00134934322, -0.00367342844,
              0.00573950773, -0.0076224613, 0.00943887047,
              1.00167406, 2.83297682):
        p_big = p_big * w_big + c
    return jnp.where(w < 5.0, p_small, p_big) * x


def discrete_gamma(alpha, n_cat: int, median: bool = False):
    """Return (rates [n_cat], probs [n_cat]) for the mean-one discrete
    Gamma (reference DiscreteGamma stats.c:1974).

    mean binning: r_k = K * (P(a+1, q_{k+1}) - P(a+1, q_k)) with q_k
    the shape-a unit-scale quantiles at k/K; median binning: scaled
    bin medians.  Rates are renormalized to mean exactly 1.
    """
    K = n_cat
    probs = jnp.full((K,), 1.0 / K)
    if K == 1:
        return jnp.ones((1,)), probs
    if median:
        qs = gamma_icdf(
            (2.0 * jnp.arange(K) + 1.0) / (2.0 * K), alpha
        )
        rates = qs / alpha
    else:
        cuts = gamma_icdf(jnp.arange(1, K) / K, alpha)
        cum = gammainc(alpha + 1.0, cuts)
        cum = jnp.concatenate(
            [jnp.zeros((1,)), cum, jnp.ones((1,))]
        )
        rates = K * jnp.diff(cum)
    rates = rates / jnp.sum(rates * probs)
    return rates, probs


def freerate_normalize(raw_rates, raw_weights):
    """FreeRate model (reference: ras->free_mixt_rates, Update_RAS
    models.c:700-740): softmax weights, rates scaled so the weighted
    mean rate is 1."""
    w = jax.nn.softmax(raw_weights)
    r = jnp.exp(raw_rates)
    r = r / jnp.sum(w * r)
    return r, w


# NOTE: the +I invariant fraction is NOT folded into the class rates in
# the reference (gamma rates keep mean 1 regardless of pinv); it enters
# only in the root likelihood mix:
#   L_site = (1 - pinv) * sum_c w_c L_c + pinv * pi[invar_state]
# (lk.c:820-837).  The likelihood engine implements exactly that.
