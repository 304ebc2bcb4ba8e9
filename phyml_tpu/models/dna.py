"""Nucleotide substitution models as symmetric exchangeabilities.

Every reversible DNA model is expressed as Q_ij = S_ij * pi_j with a
symmetric exchangeability matrix S, normalized to mean rate 1
(-sum_i pi_i Q_ii = 1), exactly the construction of the reference's
Update_Qmat_HKY / Update_Qmat_TN93 / Update_Qmat_GTR
(models.c:549/588/487).  Unlike the reference, which special-cases
closed-form P(t) for JC69/K80/TN93 (models.c:23/45/84) and uses a
nonsymmetric eigensolver otherwise (eigen.c:43), we always go through
the pi-symmetrized eigendecomposition (models/eigen.py) — one batched
code path for every model, which is what XLA wants.

Model ids mirror utilities.h:385-392.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

DNA_MODELS = ("JC69", "K80", "F81", "HKY85", "F84", "TN93", "GTR", "CUSTOM")

# index pairs for the 6 unordered rates in reference order
# (rr_num order, models.c:487): AC AG AT CG CT GT
RR_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
TRANSITIONS = ((0, 2), (1, 3))  # A<->G, C<->T


def exchangeabilities(model: str, params: dict, custom_map=None):
    """Symmetric S [4,4] (diagonal irrelevant) as a jnp array.

    params may contain 'kappa' (ts/tv multiplier), 'lambda'
    (TN93 purine/pyrimidine transition ratio), 'rr' ([6] or
    [n_classes] GTR/custom relative rates).
    """
    model = model.upper()
    if model in ("JC69", "F81"):
        return jnp.ones((4, 4))
    if model in ("K80", "HKY85"):
        kappa = params["kappa"]
        S = jnp.ones((4, 4))
        S = S.at[0, 2].set(kappa).at[2, 0].set(kappa)
        S = S.at[1, 3].set(kappa).at[3, 1].set(kappa)
        return S
    if model == "TN93":
        kappa, lam = params["kappa"], params["lambda"]
        S = jnp.ones((4, 4))
        S = S.at[0, 2].set(kappa * lam).at[2, 0].set(kappa * lam)
        S = S.at[1, 3].set(kappa).at[3, 1].set(kappa)
        return S
    if model == "F84":
        # reference: PMat_TN93 with kappa2 = 2k/(1+lambda),
        # kappa1 = kappa2*lambda, lambda from Get_Lambda_F84
        # (models.c:105-114, :173)
        kappa, lam = params["kappa"], params["lambda"]
        kappa2 = kappa * 2.0 / (1.0 + lam)
        kappa1 = kappa2 * lam
        S = jnp.ones((4, 4))
        S = S.at[0, 2].set(kappa1).at[2, 0].set(kappa1)
        S = S.at[1, 3].set(kappa2).at[3, 1].set(kappa2)
        return S
    if model in ("GTR", "CUSTOM"):
        rr = params["rr"]
        if custom_map is not None:
            rr = rr[custom_map]  # expand rate classes -> 6 rates
        S = jnp.ones((4, 4))
        for k, (i, j) in enumerate(RR_PAIRS):
            S = S.at[i, j].set(rr[k]).at[j, i].set(rr[k])
        return S
    raise ValueError(f"unknown DNA model {model!r}")


def f84_lambda(pi: np.ndarray, kappa: float) -> float:
    """Reference Get_Lambda_F84 (models.c:173): solve for the TN93
    lambda that realizes F84's single ts/tv ratio given frequencies."""
    A, C, G, T = (float(x) for x in pi)
    R, Y = A + G, C + T
    kappa = max(kappa, 1e-5)
    while True:
        lam = (Y + (R - Y) / (2.0 * kappa)) / (R - (R - Y) / (2.0 * kappa))
        if lam >= 0.0:
            return lam
        kappa += kappa / 10.0


def parse_custom_string(s: str) -> tuple[np.ndarray, int]:
    """Reference Translate_Custom_Mod_String (models.c:628): a 6-char
    string like '012210' groups the 6 GTR rates into shared classes.
    Returns (map [6] -> class index, n_classes)."""
    if len(s) != 6:
        raise ValueError("custom model string must have 6 characters")
    classes: dict[str, int] = {}
    idx = np.zeros(6, dtype=np.int32)
    for i, ch in enumerate(s):
        if ch not in classes:
            classes[ch] = len(classes)
        idx[i] = classes[ch]
    return idx, len(classes)
