"""Sequence simulation along a tree (the reference's `evolve` binary,
evolve.c:16 EVOLVE_Main / :1197 EVOLVE_Seq).

Host-side numpy: sample the root state from the stationary
distribution, walk the rooted tree sampling child states from P(t)
rows, with per-site rate classes drawn from the model's mixture
(discrete Gamma / FreeRate) and optional invariant sites.
"""

from __future__ import annotations

import numpy as np

from phyml_tpu.datatypes import AA_STATES, NT_STATES
from phyml_tpu.models.eigen import pmat


def simulate_alignment(
    topo,
    model,
    params,
    n_sites: int,
    rng: np.random.Generator,
):
    """Returns (names, seqs: list[str]) simulated under the model.

    Reference parity: per-site rate class sampling mirrors
    EVOLVE_Seq's use of the RAS distribution; +I sites are constant.
    """
    import jax.numpy as jnp

    lam, V, Vinv, pi, w, pinv = model.class_system(params)
    lam = np.asarray(lam, dtype=np.float64)
    V = np.asarray(V, dtype=np.float64)
    Vinv = np.asarray(Vinv, dtype=np.float64)
    pi = np.asarray(pi, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    pinv = float(np.asarray(pinv))
    C, ns = lam.shape

    rv = topo.rooted()
    n = rv.n_otu

    # per-site class (C = invariant sentinel) and root state
    cls = rng.choice(C, size=n_sites, p=w / w.sum())
    invar = rng.random(n_sites) < pinv
    root_pi = (pi * w[:, None]).sum(0)
    root_pi /= root_pi.sum()
    states = np.zeros((2 * n - 1, n_sites), dtype=np.int64)
    root = rv.n_nodes - 1
    states[root] = rng.choice(ns, size=n_sites, p=root_pi)

    # per-node, per-class transition matrices (class rate folded in lam)
    t = np.broadcast_to(rv.node_blen[:, None], (rv.n_nodes, C))
    P = np.asarray(
        pmat(jnp.asarray(lam), jnp.asarray(V), jnp.asarray(Vinv),
             jnp.asarray(t)),
        dtype=np.float64,
    )                                            # [N, C, ns, ns]
    P = np.clip(P, 0.0, None)
    P /= P.sum(-1, keepdims=True)

    # preorder: parents before children = reverse postorder
    order = list(range(rv.n_internal - 1, -1, -1))
    for i in order:
        u = n + i
        for child in rv.child[i]:
            child = int(child)
            # cumulative-prob sampling vectorized over sites
            probs = P[child, cls, states[u], :]       # [n_sites, ns]
            cum = probs.cumsum(axis=1)
            r = rng.random(n_sites)[:, None]
            s = (r > cum).sum(axis=1)
            s = np.where(invar, states[u], s)
            states[child] = np.clip(s, 0, ns - 1)

    alphabet = NT_STATES if ns == 4 else AA_STATES
    names = [f"T{i:04d}" for i in range(n)]
    seqs = ["".join(alphabet[s] for s in states[i]) for i in range(n)]
    return names, seqs


def write_phylip(path: str, names, seqs) -> None:
    """Sequential PHYLIP (readable by both frameworks)."""
    with open(path, "w") as fh:
        fh.write(f" {len(names)} {len(seqs[0])}\n")
        for nm, sq in zip(names, seqs):
            fh.write(f"{nm:<10s}  {sq}\n")
