"""Node-time priors and calibrations (≙ times.c, date.c calibrations).

The reference's TIMES_Lk dispatches on the tree-generating model:
birth-death with incomplete sampling (times.c:1610), Yule
(times.c:445-660), coalescent with constant or exponentially growing
effective size (times.c:851/:938), and calibrated-uniform
(times.c:417).  Calibrations are per-clade bounds/densities attached
to MRCA nodes (`t_cal`/`t_clad` utilities.h:2197-2227, read from XML
by XML_Read_Calibration xml.c:2417).

Here each prior is a pure log-density over the internal-height vector;
calibrations become differentiable soft/hard bound terms added to the
joint posterior.  Everything is jnp-traceable for the jitted MCMC.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

BIRTHDEATH = "birthdeath"
YULE = "yule"
COALESCENT = "coalescent"
EXPCOALESCENT = "expcoalescent"
UNIFORM = "uniform"
CALYULE = "calibrated_yule"   # invitee.c mixture over calibrations

NEG_INF = -1e30


@dataclass(frozen=True)
class Calibration:
    """Clade calibration: bounds on the MRCA height of `taxa`
    (≙ t_cal utilities.h:2197; XML <calibration> with <lower>/<upper>).
    node is resolved against a TimeTree at setup."""
    taxa: tuple
    lower: float = 0.0
    upper: float = float("inf")
    node: int = -1

    def resolved(self, tt) -> "Calibration":
        idx = [tt.names.index(t) if isinstance(t, str) else int(t)
               for t in self.taxa]
        node = tt.mrca(idx) if len(idx) > 1 else idx[0]
        return Calibration(taxa=self.taxa, lower=self.lower,
                           upper=self.upper, node=node)


@dataclass(frozen=True)
class TimePrior:
    """Prior over node heights.

    kind: 'yule' | 'birthdeath' | 'coalescent' | 'expcoalescent' |
    'uniform'.  Hyperparameters enter via the MCMC state so they can
    be sampled:
      yule/birthdeath: birth (lambda), death (mu)
      coalescent: theta (= 2*Ne in pairwise-rate units)
      expcoalescent: theta0, growth g  (Ne(t) = N0 * exp(-g t))
    """

    kind: str = BIRTHDEATH
    calibrations: tuple = field(default_factory=tuple)
    # 'calibrated_yule' only: MultiCalibration tuple (clade-choice
    # mixtures, invitee.c); plain calibrations are auto-converted
    multi_calibrations: tuple = field(default_factory=tuple)
    # resolved CalibratedYule engine (set by resolve())
    calyule: object = field(default=None, compare=False)

    def resolve(self, tt) -> "TimePrior":
        from dataclasses import replace

        from phyml_tpu.bayes.invitee import (
            CalibratedYule, CladeChoice, MultiCalibration,
        )
        out = TimePrior(
            kind=self.kind,
            calibrations=tuple(c.resolved(tt)
                               for c in self.calibrations),
            multi_calibrations=self.multi_calibrations,
        )
        if self.kind == CALYULE:
            mcals = list(self.multi_calibrations)
            # plain bounds calibrations become single-choice mixtures
            # and are NOT double-counted by log_calibrations
            mcals += [
                MultiCalibration(choices=(CladeChoice(taxa=c.taxa),),
                                 lower=c.lower, upper=c.upper)
                for c in self.calibrations
            ]
            out = replace(out, calibrations=(),
                          calyule=CalibratedYule(tt, tuple(mcals)))
        return out

    # ------------------------------------------------------------------
    def log_prior(self, heights, n_otu: int, hyper: dict):
        """log p(node heights | hyper) (≙ TIMES_Lk)."""
        n_nodes = heights.shape[0]
        root = n_nodes - 1
        internal = heights[n_otu:]
        t_root = heights[root]
        if self.kind == CALYULE:
            # mixture over calibration combinations of root-
            # conditioned truncated-exponential orders
            # (TIMES_Calib_Cond_Prob invitee.c:718)
            return self.calyule.log_prior(heights, hyper["birth"])
        if self.kind == UNIFORM:
            # calibrated-uniform (times.c:417): flat within the
            # feasible region; the MCMC's bound-respecting moves plus
            # calibration terms do the conditioning
            return jnp.asarray(0.0, dtype=heights.dtype)
        if self.kind in (YULE, BIRTHDEATH):
            b = jnp.maximum(hyper["birth"], 1e-10)
            d = (jnp.zeros_like(b) if self.kind == YULE
                 else jnp.maximum(hyper["death"], 0.0))
            # Density of internal node ages CONDITIONED on the root
            # age under the reconstructed birth-death process with
            # complete sampling (≙ TIMES_Lk_Birth_Death times.c:1610;
            # Yang & Rannala 1997 eq. 6 with rho = 1): each of the
            # n-2 non-root internal nodes contributes
            #   log b + log p1(t) - log nut1(troot)
            # where p1(t) = (b-d)^2 e^{-(b-d)t} / (b - d e^{-(b-d)t})^2
            # and nut1(s) = 1 - pt(s) e^{-(b-d)s},
            #       pt(s) = (b-d)/(b - d e^{-(b-d)s}).
            # b < d is hard-rejected (times.c:1634: return UNLIKELY).
            ti = jnp.abs(internal[:-1])          # non-root internals
            troot = jnp.abs(t_root)
            bmd = b - d
            n = n_otu

            # --- general case b > d > 0 (times.c:1672-1706) ---------
            bmd_s = jnp.where(bmd > 1e-8, bmd, 1.0)   # guard NaNs in
            d_s = jnp.maximum(d, 1e-300)              # unused branches
            den_root = jnp.maximum(b - d_s * jnp.exp(-bmd_s * troot),
                                   1e-300)
            pt = bmd_s / den_root
            nut1 = jnp.maximum(1.0 - pt * jnp.exp(-bmd_s * troot),
                               1e-300)
            log_p1 = (2.0 * jnp.log(bmd_s) - bmd_s * ti
                      - 2.0 * jnp.log(jnp.maximum(
                          b - d_s * jnp.exp(-bmd_s * ti), 1e-300)))
            lp_gen = jnp.sum(jnp.log(b) + log_p1 - jnp.log(nut1))

            # --- Yule case d ~ 0 (times.c:1714-1738) ----------------
            lognut1_y = jnp.log(jnp.maximum(-jnp.expm1(-b * troot),
                                            1e-300))
            lp_yule = jnp.sum(jnp.log(b) - b * ti - lognut1_y)

            # --- critical case b ~ d (times.c:1761-1786; Yang &
            # Rannala eq. 7 with rho = 1) ----------------------------
            lp_crit = jnp.sum(jnp.log1p(d)
                              - 2.0 * jnp.log1p(d_s * ti))

            lp = jnp.where(d < 1e-8, lp_yule,
                           jnp.where(jnp.abs(bmd) < 1e-8, lp_crit,
                                     lp_gen))
            lp = lp + jax.scipy.special.gammaln(float(n) - 1.0)
            return jnp.where(bmd < -1e-8,
                             jnp.asarray(NEG_INF, dtype=heights.dtype),
                             lp)
        if self.kind == COALESCENT:
            theta = jnp.maximum(hyper["theta"], 1e-10)
            return self._coalescent_lp(
                heights, n_otu,
                rate=lambda t: 2.0 / theta,
                cum=lambda a, b: 2.0 * (b - a) / theta)
        if self.kind == EXPCOALESCENT:
            theta = jnp.maximum(hyper["theta"], 1e-10)
            g = hyper["growth"]
            # Ne(t) = N0 e^{-g t} looking backwards => pairwise rate
            # 2/theta * e^{g t}; integral analytic
            return self._coalescent_lp(
                heights, n_otu,
                rate=lambda t: (2.0 / theta) * jnp.exp(g * t),
                cum=lambda a, b: jnp.where(
                    jnp.abs(g) < 1e-12,
                    2.0 * (b - a) / theta,
                    (2.0 / (theta * jnp.where(jnp.abs(g) < 1e-12, 1.0, g)))
                    * (jnp.exp(g * b) - jnp.exp(g * a))))
        raise ValueError(self.kind)

    def _coalescent_lp(self, heights, n_otu, rate, cum):
        """Piecewise-interval coalescent density with serial sampling
        (≙ TIMES_Lk_Coalescent times.c:851)."""
        n_nodes = heights.shape[0]
        delta = jnp.concatenate([
            jnp.ones((n_otu,), dtype=heights.dtype),
            -jnp.ones((n_nodes - n_otu,), dtype=heights.dtype),
        ])
        order = jnp.argsort(heights)
        t = heights[order]
        d = delta[order]
        k = jnp.cumsum(d)                       # lineages after event i
        kk = k[:-1]                             # on interval (t_i, t_{i+1})
        pair = kk * (kk - 1.0) / 2.0
        waiting = -pair * cum(t[:-1], t[1:])
        coal_rate = rate(t[1:])
        coal = jnp.where(d[1:] < 0,
                         jnp.log(jnp.maximum(coal_rate, 1e-300)), 0.0)
        return jnp.sum(waiting) + jnp.sum(coal)

    # ------------------------------------------------------------------
    def log_calibrations(self, heights):
        """Hard-bound calibration terms: 0 inside [lower, upper],
        -inf outside (≙ the calibrated-node uniform densities of
        date.c/invitee.c; soft densities can be added per-calibration
        later)."""
        if not self.calibrations:
            return jnp.asarray(0.0, dtype=heights.dtype)
        lp = jnp.asarray(0.0, dtype=heights.dtype)
        for c in self.calibrations:
            h = heights[c.node]
            ok = (h >= c.lower) & (h <= (c.upper
                                         if np.isfinite(c.upper)
                                         else 1e30))
            lp = lp + jnp.where(ok, 0.0, NEG_INF)
        return lp

    def hyper_names(self) -> tuple:
        # NB: no "rho" — the reference's conditioned density fixes
        # the sampling fraction at 1 (times.c:1610) and never samples
        # it, so it is not a chain parameter here either.
        return {
            YULE: ("birth",),
            CALYULE: ("birth",),
            BIRTHDEATH: ("birth", "death"),
            COALESCENT: ("theta",),
            EXPCOALESCENT: ("theta", "growth"),
            UNIFORM: (),
        }[self.kind]

    def default_hyper(self) -> dict:
        return {
            "birth": jnp.asarray(1.0), "death": jnp.asarray(0.5),
            "theta": jnp.asarray(1.0),
            "growth": jnp.asarray(0.0),
        }
