"""Covarion (M4) model: Markov-modulated substitution process.

The reference builds one big (n_o * n_h)^2 rate matrix (M4_Update_Qmat
m4.c:324-523): n_h hidden rate classes, each scaling the observed
substitution process by a multiplier, plus a switching process between
hidden classes (rate delta) that leaves the observed state unchanged.
States are indexed s = h * n_o + o (m4.c:408-409).  Construction:

  * diagonal blocks (observed substitutions within hidden class h):
    the base model's generic Q (exchangeabilities x freqs, mean rate 1
    under o_fq: Update_Qmat_Generic models.c:430) times multipl[h],
    then globally rescaled so the expected number of OBSERVED
    substitutions per unit branch length is 1 (m4.c:463-474) - the
    switching events do not count toward branch length;
  * off-diagonal blocks (hidden-class switches, same observed state):
    delta * h_fq[h'] / mr_h with mr_h = 1 - sum h_fq^2 (the generic
    normalization of the all-ones switch exchangeabilities,
    m4.c:479-504);
  * stationary distribution pi[s] = o_fq[o] * h_fq[h] (m4.c:408).

The big Q is reversible w.r.t. that pi, so instead of the reference's
dense nonsymmetric eigensolver we express it as a symmetric
exchangeability matrix S_big (Q = S_big o pi_big off-diagonal) built
from two Kronecker products, and reuse the batched pi-symmetrized
`eigh` path (models/eigen.py) with the mean-rate normalization
DISABLED (the M4 normalization above already happened and is
intentionally partial).

Hidden-class multipliers (m4.c:338-396):
  * 'fixed'  (plain --cov):  multipl = [0, 1, ..., n_h-1], h_fq uniform
    (M4_Init_Model init.c:6415-6436) - class 0 is an "off" state;
  * 'alpha'  (--cov_alpha):  multipl = DiscreteGamma(cov_alpha) rates,
    h_fq uniform (m4.c:339-343);
  * 'free'   (--cov_free):   free h_fq (clipped to [0.01,0.99] and
    renormalized, m4.c:352-363) and free multipliers rescaled so
    sum h_fq*multipl = 1 (m4.c:365-370).
"""

from __future__ import annotations

import jax.numpy as jnp

from phyml_tpu.models.rates import discrete_gamma


def m4_hidden_free(h_fq_raw, multipl_raw):
    """The reference's --cov_free reparameterization (m4.c:344-396):
    returns (h_fq, multipl) with h_fq in [0.01, 0.99] summing to 1 and
    sum(h_fq * multipl) == 1."""
    h = jnp.abs(h_fq_raw)
    h = h / jnp.sum(h)
    # the reference's clip-renormalize do-while converges in a couple
    # of iterations; a fixed unrolled count is jit-friendly
    for _ in range(4):
        h = jnp.clip(h, 0.01, 0.99)
        h = h / jnp.sum(h)
    m = jnp.abs(multipl_raw)
    m = multipl_raw / jnp.sum(m * h)
    return h, m


def m4_exchangeabilities(E, o_fq, h_fq, multipl, delta):
    """Big-state symmetric exchangeabilities + stationary frequencies.

    E       [n_o, n_o]  symmetric observed-state exchangeabilities
    o_fq    [n_o]       observed-state frequencies
    h_fq    [n_h]       hidden-class frequencies
    multipl [n_h]       hidden-class rate multipliers
    delta   scalar      switching rate

    Returns (S_big [ns, ns], pi_big [ns]) with ns = n_h * n_o such
    that Q_ij = S_big_ij * pi_big_j (i != j, diagonal = -rowsum, NO
    further normalization) reproduces M4_Update_Qmat exactly.
    """
    n_o = E.shape[-1]
    n_h = h_fq.shape[-1]
    eye_o = jnp.eye(n_o, dtype=E.dtype)

    # mean rate of the base observed block under o_fq (the generic
    # normalization, models.c:470-479)
    q_off = E * o_fq[None, :] * (1.0 - eye_o)
    mr_o = jnp.sum(o_fq[:, None] * q_off)

    # global observed-substitution rate across hidden classes
    # (m4.c:465-471 reduces to this because each block has mean 1)
    mr = jnp.sum(h_fq * multipl)

    # switch-matrix normalization (generic with all-ones rr)
    mr_h = 1.0 - jnp.sum(h_fq * h_fq)

    # Q same-h block: (E/mr_o) * o_fq[j] * multipl[h] / mr
    #   = S_big * pi_big[j] with pi_big[j] = h_fq[h] * o_fq[o_j]
    #   -> S_big = E * multipl[h] / (mr_o * h_fq[h] * mr)
    diag_part = jnp.kron(
        jnp.diag(multipl / (h_fq * mr)), E / mr_o
    )
    # Q switch entry (same o): delta * h_fq[h'] / mr_h
    #   -> S_big = delta / (mr_h * o_fq[o])
    switch_part = jnp.kron(
        1.0 - jnp.eye(n_h, dtype=E.dtype),
        jnp.diag(delta / (mr_h * o_fq)),
    )
    S_big = diag_part + switch_part
    pi_big = jnp.kron(h_fq, o_fq)
    return S_big, pi_big


def m4_hidden_system(model, params):
    """(h_fq, multipl) from the model's covarion mode + params."""
    n_h = model.n_hidden
    if model.cov_mode == "free":
        return m4_hidden_free(params["cov_h_fq_raw"],
                              params["cov_multipl_raw"])
    if model.cov_mode == "alpha":
        multipl, h_fq = discrete_gamma(params["cov_alpha"], n_h)
        return h_fq, multipl
    # 'fixed': M4_Init_Model defaults (init.c:6433-6436)
    h_fq = jnp.full((n_h,), 1.0 / n_h)
    multipl = jnp.arange(n_h, dtype=jnp.float64).astype(h_fq.dtype)
    return h_fq, multipl
