"""Clock / rate-across-lineage models (≙ rates.c, t_rate
utilities.h:1761-1870).

The reference supports STRICTCLOCK, LOGNORMAL (uncorrelated
lognormal), THORNE (autocorrelated geometric Brownian motion) and
GUINDON (branch-integrated) rate models; `RATES_Lk` (rates.c:27)
scores the per-edge relative rates under the chosen model and
`RATES_Update_One_Edge_Length` (rates.c:1244) maps
(clock, rate, duration) -> substitution length.  Here each model is a
pure log-density over the vector of per-edge log-rates, traced into
the MCMC's joint posterior.

All densities are functions of:
  log_r   [n_nodes]  log relative rate on the edge above each node
                     (root entry ignored)
  dt      [n_nodes]  edge durations (root entry 0)
  parent  [n_nodes]  parent ids
  nu      scalar     rate-variation hyperparameter (autocorrelation
                     variance per unit time for THORNE, log-sd for
                     LOGNORMAL)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

LOG2PI = float(np.log(2.0 * np.pi))

STRICT = "strict"
LOGNORMAL = "lognormal"
THORNE = "thorne"
GUINDON = "guindon"


@dataclass(frozen=True)
class RateModel:
    """Relative-rate prior over lineages.

    kind: 'strict' | 'lognormal' | 'thorne' | 'guindon'.
    'guindon' (Guindon 2012, the reference's branch-length-integrated
    model) shares the Thorne autocorrelated prior over branch-average
    rates; its likelihood additionally integrates P(t) over
    within-branch rate variation via the Gamma MGF
    (LikelihoodEngine.loglik_mgf ≙ PMat_MGF_Gamma models.c:1044).
    """

    kind: str = LOGNORMAL

    @property
    def n_free_rates(self) -> int:
        return 0 if self.kind == STRICT else 1  # per-edge vector used/not

    def log_prior(self, log_r, dt, parent, nu, root: int):
        """Joint log-density of per-edge log relative rates
        (≙ RATES_Lk rates.c:27 dispatching on the model)."""
        nu = jnp.maximum(nu, 1e-10)
        mask = jnp.ones_like(log_r).at[root].set(0.0)
        n_edges = jnp.sum(mask)
        if self.kind == STRICT:
            return jnp.asarray(0.0, dtype=log_r.dtype)
        if self.kind == LOGNORMAL:
            # iid: log r_e ~ N(-nu^2/2, nu^2)  => E[r_e] = 1
            mu = -0.5 * nu * nu
            z = (log_r - mu) / nu
            lp = -0.5 * (z * z + LOG2PI) - jnp.log(nu)
            return jnp.sum(lp * mask)
        # THORNE / GUINDON: geometric Brownian motion down the tree:
        # log r_child ~ N(log r_parent - nu*dt/2, nu*dt)
        # (mean-correction keeps E[r_child | r_parent] = r_parent,
        #  matching the reference's autocorrelated THORNE model)
        var = jnp.maximum(nu * dt, 1e-12)
        anc = jnp.where(parent == root, 0.0, log_r[parent])
        mu = anc - 0.5 * var
        z = (log_r - mu) / jnp.sqrt(var)
        lp = -0.5 * (z * z + LOG2PI) - 0.5 * jnp.log(var)
        return jnp.sum(lp * mask)

    def rates(self, log_r, root: int):
        """Per-edge relative rates r_e = exp(log_r); pinned to 1 under
        the strict clock and at the (meaningless) root slot."""
        if self.kind == STRICT:
            return jnp.ones_like(log_r)
        return jnp.exp(log_r).at[root].set(1.0)
