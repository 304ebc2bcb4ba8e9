"""Substitution-model configuration and jittable class-system builder.

A `SubstModel` is the static description (model family, number of rate
classes, what's free); `class_system(params)` turns a parameter pytree
into the per-class eigensystem the likelihood engine consumes:

    lam   [C, ns]       eigenvalues with the class rate folded in
    V     [C, ns, ns]   right eigenvectors
    Vinv  [C, ns, ns]
    pi    [C, ns]       per-class stationary frequencies
    w     [C]           class weights
    pinv  scalar        invariant fraction (0 when disabled)

This single structure subsumes the reference's t_mod + t_ras + the
entire mixt.c chained-tree machinery (mixt.c:20-601): a PhyML
"mixture" is just more classes with their own (Q, rate, weight, pi),
i.e. a bigger leading axis here.  Gamma-across-sites: one Q, C rates
(Update_RAS models.c:669).  LG4X: four Qs, four free rates/weights.
Covarion (M4): one bigger Q (ns*K states).

Reference parity notes:
  * GTR rates are exp(log-rates) grouped by a 6-char custom string and
    normalized by the G<->T rate (Update_Qmat_GTR models.c:487-510).
  * Frequencies: 'empirical' (counted from data, the default for DNA),
    'model' (the empirical AA matrix's frequencies, default for AA),
    'optimize' (ML, via softmax of unconstrained logits), or 'fixed'
    user values (cl.c -f handling).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax.numpy as jnp
import jax.nn
import numpy as np

from phyml_tpu.models import dna as dna_mod
from phyml_tpu.models import matrices
from phyml_tpu.models.covarion import (
    m4_exchangeabilities, m4_hidden_system,
)
from phyml_tpu.models.eigen import build_q, reversible_eigen
from phyml_tpu.models.rates import discrete_gamma, freerate_normalize

RR_MIN, RR_MAX = 0.01, 100.0  # utilities.h clamps for GTR rates


@dataclass
class SubstModel:
    datatype: str = "nt"              # "nt" | "aa" | "generic"
    name: str = "HKY85"
    # custom-alphabet state count (-d generic, utilities.h:303): the
    # engine is ns-generic, so a JC-type model over any alphabet size
    # works end to end (reference: whichmodel=JC69, uniform freqs,
    # init.c:1519-1533)
    generic_ns: int = 0
    # CUSTOMAA: (S [20,20], pi [20]) numpy pair from a PAML rate file
    # (--aa_rate_file, cl.c:560-570); overrides the empirical table
    custom_aa: Any = None
    n_classes: int = 4                # gamma / freerate classes
    gamma_median: bool = False
    invar: bool = False               # +I
    freerate: bool = False
    freqs_mode: str | None = None     # empirical|model|optimize|fixed
    # (None resolves to the reference default: 'empirical' for DNA,
    #  'model' for AA - init.c defaults / cl.c -f handling)
    fixed_freqs: Any = None           # np [ns] when freqs_mode == fixed
    custom_string: str = "012345"     # DNA CUSTOM grouping
    # Mixture components: list of (S [ns,ns], pi [ns]) numpy pairs.
    # When set, n_classes == len(components) and each class has its own
    # Q (LG4X-style); otherwise a single Q is shared across classes.
    components: list | None = None
    # Covarion (M4, m4.c): n_hidden rate classes over the observed
    # process; cov_mode selects the hidden-multiplier parameterization
    # ('fixed' = plain --cov, 'alpha' = --cov_alpha discrete-gamma,
    # 'free' = --cov_free free freqs+multipliers; m4.c:338-396)
    covarion: bool = False
    n_hidden: int = 3
    cov_mode: str = "fixed"
    # which scalar parameters are optimized (used by the optimizer)
    optimize_kappa: bool = True
    optimize_alpha: bool = True
    optimize_pinv: bool = False
    optimize_rr: bool = True
    optimize_freqs: bool = False
    optimize_cov: bool = True

    def __post_init__(self):
        self.name = self.name.upper()
        if self.datatype == "generic":
            if self.generic_ns < 2:
                raise ValueError("generic datatype needs generic_ns")
            # reference: uniform state frequencies, all rates equal
            # (init.c:1519-1533)
            self.name = "GENERIC"
            self.freqs_mode = "fixed"
            self.fixed_freqs = np.full(self.generic_ns,
                                       1.0 / self.generic_ns)
        if self.freqs_mode is None:
            # reference default is empirical (counted) frequencies for
            # BOTH data types: run G's stats file prints the proteic
            # alignment's observed frequencies, not LG's table
            # (cl.c -f handling; -f m selects the model table)
            self.freqs_mode = "empirical"
        if self.name in ("JC69", "K80"):
            # these models fix pi = 1/4 (utilities.h model defs;
            # stats output shows f(.) = 0.25 regardless of data)
            self.freqs_mode = "fixed"
            self.fixed_freqs = np.full(4, 0.25)
        if self.covarion:
            if self.is_mixture:
                raise ValueError("covarion cannot combine with "
                                 "matrix mixtures")
            if self.n_hidden < 2:
                raise ValueError("covarion needs >= 2 hidden classes")

    # ------------------------------------------------------------------
    @property
    def obs_ns(self) -> int:
        """Observed (alphabet) states - what tips are encoded over."""
        if self.components is not None:
            return int(self.components[0][0].shape[-1])
        if self.datatype == "generic":
            return self.generic_ns
        return 4 if self.datatype == "nt" else 20

    @property
    def ns(self) -> int:
        """Process states: obs_ns, times n_hidden under covarion
        (mod->ns = n_o * n_h, init.c:6406)."""
        if self.covarion:
            return self.obs_ns * self.n_hidden
        return self.obs_ns

    @property
    def is_mixture(self) -> bool:
        return self.components is not None

    def init_params(self, obs_freqs: np.ndarray | None = None) -> dict:
        """Default parameter pytree (reference defaults:
        Set_Defaults_Model init.c:669 - kappa 4, alpha 1, pinv 0)."""
        p: dict[str, Any] = {}
        ns = self.obs_ns
        if self.datatype == "nt":
            if self.name in ("K80", "HKY85", "F84", "TN93"):
                p["kappa"] = jnp.asarray(4.0)
            if self.name == "TN93":
                p["lambda"] = jnp.asarray(1.0)
            if self.name in ("GTR", "CUSTOM"):
                cmap, n_rr = dna_mod.parse_custom_string(
                    self.custom_string if self.name == "CUSTOM"
                    else "012345"
                )
                p["rr_val"] = jnp.zeros(n_rr)  # log-rates
        if self.n_classes > 1 and not self.freerate and not self.is_mixture:
            p["alpha"] = jnp.asarray(1.0)
        if self.is_mixture or self.freerate:
            p["class_rates_raw"] = jnp.zeros(self.n_classes)
            p["class_weights_raw"] = jnp.zeros(self.n_classes)
            if self.is_mixture and self.n_classes > 1:
                pass
        if self.invar:
            p["pinv"] = jnp.asarray(0.2)
        if self.covarion:
            # M4 defaults: delta = 1, cov alpha = 1, free-mode raws
            # h_fq_unscaled = 1, multipl_unscaled = [0..n_h-1]
            # (M4_Init_Model init.c:6431-6436)
            p["cov_delta"] = jnp.asarray(1.0)
            if self.cov_mode == "alpha":
                p["cov_alpha"] = jnp.asarray(1.0)
            elif self.cov_mode == "free":
                p["cov_h_fq_raw"] = jnp.ones(self.n_hidden)
                p["cov_multipl_raw"] = jnp.arange(
                    self.n_hidden, dtype=jnp.float64
                )
        if self.freqs_mode == "optimize":
            base = obs_freqs if obs_freqs is not None else np.full(ns, 1 / ns)
            p["freqs_raw"] = jnp.log(jnp.asarray(base, dtype=jnp.float64))
        elif self.freqs_mode == "empirical":
            if obs_freqs is None:
                raise ValueError("empirical freqs need observed counts")
            p["freqs_const"] = jnp.asarray(obs_freqs)
        elif self.freqs_mode == "fixed":
            p["freqs_const"] = jnp.asarray(self.fixed_freqs)
        # 'model' mode: frequencies come from the component table(s)
        return p

    # ------------------------------------------------------------------
    def _frequencies(self, params, comp_pi):
        """Per-class OBSERVED-state pi [C, obs_ns]."""
        C, ns = self.n_classes, self.obs_ns
        if self.freqs_mode == "optimize":
            pi = jax.nn.softmax(params["freqs_raw"])
            return jnp.broadcast_to(pi, (C, ns))
        if self.freqs_mode in ("empirical", "fixed"):
            pi = params["freqs_const"]
            pi = pi / jnp.sum(pi)
            return jnp.broadcast_to(pi, (C, ns))
        # 'model': per-component table frequencies
        return comp_pi

    def class_system(self, params: dict, fold_rates: bool = True):
        """params -> (lam, V, Vinv, pi, w, pinv), all jnp.

        fold_rates=False returns the unit-mean-rate eigenvalues
        (used by ML pairwise distances, which the reference computes
        with the discrete-gamma distribution disabled, lk.c:1817-1824).
        """
        C, ns = self.n_classes, self.obs_ns

        # --- per-class rates & weights -------------------------------
        if self.is_mixture or self.freerate:
            rates, w = freerate_normalize(
                params["class_rates_raw"], params["class_weights_raw"]
            )
        elif C > 1:
            rates, w = discrete_gamma(
                params["alpha"], C, median=self.gamma_median
            )
        else:
            rates = jnp.ones((1,))
            w = jnp.ones((1,))

        # --- per-class exchangeabilities & base freqs -----------------
        if self.is_mixture:
            S = jnp.stack([jnp.asarray(s) for s, _ in self.components])
            comp_pi = jnp.stack(
                [jnp.asarray(p_) for _, p_ in self.components]
            )
        elif self.datatype == "generic":
            # JC over the custom alphabet: unit exchangeabilities
            S = jnp.broadcast_to(
                jnp.ones((ns, ns)) - jnp.eye(ns), (C, ns, ns))
            comp_pi = None
        elif self.datatype == "aa":
            if self.custom_aa is not None:
                S_np, pi_np = self.custom_aa
            else:
                S_np, pi_np = matrices.empirical_aa(self.name)
            S = jnp.broadcast_to(jnp.asarray(S_np), (C, ns, ns))
            comp_pi = jnp.broadcast_to(jnp.asarray(pi_np), (C, ns))
        else:
            dparams = dict(params)
            if self.name == "F84":
                # lambda recomputed from current freqs & kappa
                pi_now = self._frequencies(params, None)[0]
                lam_f84 = _f84_lambda_jnp(pi_now, params["kappa"])
                dparams["lambda"] = lam_f84
            cmap = None
            if self.name == "CUSTOM":
                cmap_np, _ = dna_mod.parse_custom_string(self.custom_string)
                cmap = jnp.asarray(cmap_np)
                dparams["rr"] = jnp.clip(
                    jnp.exp(params["rr_val"]), RR_MIN, RR_MAX
                )
            elif self.name == "GTR":
                rr6 = jnp.exp(params["rr_val"])
                rr6 = jnp.clip(rr6 / rr6[5], RR_MIN, RR_MAX)
                dparams["rr"] = rr6
            S1 = dna_mod.exchangeabilities(self.name, dparams, cmap)
            S = jnp.broadcast_to(S1, (C, ns, ns))
            comp_pi = None

        pi = self._frequencies(params, comp_pi)

        # --- eigensystem (batched over classes) -----------------------
        if self.covarion:
            # M4: blow the observed system up to n_hidden * obs_ns
            # states (m4.c:324 M4_Update_Qmat); the M4 normalization
            # (observed substitutions only) replaces the mean-rate-1
            # scaling, so eigen runs with normalize=False.
            E = self._m4_observed_exch(params, S[0], pi[0])
            h_fq, multipl = m4_hidden_system(self, params)
            S_big, pi_big = m4_exchangeabilities(
                E, pi[0], h_fq, multipl, params["cov_delta"]
            )
            S = jnp.broadcast_to(S_big, (C, self.ns, self.ns))
            pi = jnp.broadcast_to(pi_big, (C, self.ns))
            lam, V, Vinv = reversible_eigen(S, pi, normalize=False)
        else:
            lam, V, Vinv = reversible_eigen(S, pi)
        pinv = params.get("pinv", jnp.asarray(0.0))
        if fold_rates:
            lam = lam * rates[:, None]  # fold class rate into eigenvalues
            if self.invar:
                # Branch lengths follow the reference's FILE convention
                # (expected substitutions per site INCLUDING the never-
                # changing invariant fraction): internally the variable-
                # site process runs on t/(1-pinv)
                # (Br_Len_Not_Involving_Invar utilities.c:4155, applied
                # to user trees in main.c:237 and inverted on output).
                # Folding 1/(1-pinv) into the eigenvalues is exactly
                # equivalent and keeps every tree array in file units.
                lam = lam / jnp.maximum(1.0 - pinv, 1e-8)
        return lam, V, Vinv, pi, w, pinv

    def _m4_observed_exch(self, params, S_base, o_pi):
        """Observed-state exchangeabilities the M4 big-Q uses.

        For DNA models other than GTR/CUSTOM the reference overwrites
        the observed rates with the kappa1/kappa2 transition pattern
        (m4.c:411-431, with A<->G = kappa2, C<->T = kappa1 - NOTE
        this is flipped relative to PMat_TN93's convention).  For
        GTR/CUSTOM/AA it seeds them from the base model's normalized
        Q-matrix upper triangle (M4_Init_Model init.c:6417-6425),
        which bakes one factor of pi_j into the 'exchangeability'.
        """
        if self.datatype == "nt" and self.name not in ("GTR", "CUSTOM"):
            kappa = params.get("kappa", jnp.asarray(4.0))
            if self.name == "F84":
                lam_p = _f84_lambda_jnp(o_pi, kappa)
            elif self.name == "TN93":
                lam_p = params["lambda"]
            else:
                lam_p = jnp.asarray(1.0)
            kappa2 = kappa * 2.0 / (1.0 + lam_p)
            kappa1 = kappa2 * lam_p
            E = jnp.ones((4, 4))
            E = E.at[0, 2].set(kappa2).at[2, 0].set(kappa2)
            E = E.at[1, 3].set(kappa1).at[3, 1].set(kappa1)
            return E
        q = build_q(S_base, o_pi)
        n_o = q.shape[-1]
        upper = jnp.triu(jnp.maximum(q, 1e-5), k=1)
        return upper + upper.T


def _f84_lambda_jnp(pi, kappa):
    A, C, G, T = pi[0], pi[1], pi[2], pi[3]
    R, Y = A + G, C + T
    kappa = jnp.clip(kappa, 1e-5, None)
    return (Y + (R - Y) / (2.0 * kappa)) / (R - (R - Y) / (2.0 * kappa))


def lg4x_model() -> SubstModel:
    """The LG4X 4-matrix mixture (Le, Dang & Gascuel 2012), matching
    the reference's examples/lg4x XML setup (4 partitionless classes
    with free rates and weights)."""
    comps = [matrices.empirical_aa(n)
             for n in ("lg4x_1", "lg4x_2", "lg4x_3", "lg4x_4")]
    return SubstModel(
        datatype="aa", name="LG4X", n_classes=4, freerate=True,
        freqs_mode="model", components=comps,
    )
