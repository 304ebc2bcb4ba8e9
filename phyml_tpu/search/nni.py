"""Simultaneous NNI hill-climbing, all edges scored in one pass.

The reference's NNI machinery (Simu simu.c:30, Check_NNI_Five_Branches
alrt.c:32) walks edges one at a time, each evaluation touching the
tree in place.  Here every internal edge's three configurations are
scored from ONE up+down likelihood pass: for the edge (u, v) with
children a, b of v and sibling s, using the cached inside partials
(pup) and outside partials (out),

    L_cfg(t) = sum_i (Vinv x_cfg)_i (V^T y_cfg)_i e^{lam_i t}

with (x, y) = (A.B, G.S) | (A.S, G.B) | (B.S, G.A) - the eigen-LR
dot-product trick applied to all three NNI configurations of all
edges at once, followed by vectorized Newton on every configuration's
central branch length (the reference optimizes the central edge per
NNI too: NNI_Neigh_BL alrt.c:338).

Swap application follows the reference's "simultaneous NNI" strategy
(Make_N_Swap simu.c:229): sort positive-gain swaps, greedily apply a
node-disjoint subset, re-optimize branch lengths, and fall back to
the single best swap if the joint application hurt the likelihood.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from phyml_tpu.ops.likelihood import TreeArrays, tree_arrays
from phyml_tpu.optim.blen import BL_MIN, BL_MAX, optimize_branch_lengths

_N_NEWTON = 12


def candidate_arrays(rv):
    """Host-side: for each internal unrooted edge, the rooted ids
    (v, u, a, b, s).  Shape is always [n_otu - 3, 5]."""
    n = rv.n_otu
    rows = []
    for v in range(n, rv.n_nodes - 1):
        u = int(rv.parent[v])
        if u == rv.root:
            continue
        i_v = v - n
        a, b = (int(x) for x in rv.child[i_v])
        i_u = u - n
        c0, c1 = (int(x) for x in rv.child[i_u])
        s = c1 if c0 == v else c0
        rows.append((v, u, a, b, s))
    out = np.asarray(rows, dtype=np.int32)
    assert out.shape == (n - 3, 5)
    return out


def _make_nni_scorer(engine):
    def scorer(params, tree: TreeArrays, cand):
        lam, V, Vinv, pi, w, pinv = engine._system(params)
        pmats = engine._pmats(lam, V, Vinv,
                              tree.blen.astype(engine.dtype))
        pup, clv, sc = engine._up_pass(pmats, tree.child)
        out, sc_out = engine._down_pass(pmats, tree.child, pup, sc, pi)

        v, u, a, b, s = (cand[:, k] for k in range(5))
        A, B, S = pup[a], pup[b], pup[s]              # [E, C, ns, P]
        # outside partial transported through u's own edge:
        # out[v] = (P_u^T out[u]) . pup[s], so the config-independent
        # outside factor at the central edge is G = P_u^T out[u]
        G = jnp.einsum("ecwz,ecwp->eczp", pmats[u], out[u],
                       precision=jax.lax.Precision.HIGHEST)
        sc_tot = sc[a] + sc[b] + sc[s] + sc_out[u]    # [E, C, P]

        x = jnp.stack([A * B, A * S, B * S], axis=1)  # [E, 3, C, ns, P]
        y = jnp.stack([G * S, G * B, G * A], axis=1)
        bx = jnp.einsum("ciy,ekcyp->ekcip", Vinv, x,
                        precision=jax.lax.Precision.HIGHEST)
        ay = jnp.einsum("czi,ekczp->ekcip", V, y,
                        precision=jax.lax.Precision.HIGHEST)
        d = ay * bx                                    # [E, 3, C, ns, P]
        sc_d = sc_tot[:, None]                         # [E, 1, C, P]
        sc_d = jnp.broadcast_to(sc_d, d.shape[:2] + sc_tot.shape[1:])

        aux = dict(
            lam=lam, w=w, pinv=pinv,
            inv_lk=engine._inv_lk(pi, w) if engine.model.invar
            else jnp.zeros((engine.P,), dtype=engine.dtype),
        )

        t0 = jnp.clip(tree.blen[v], BL_MIN, BL_MAX)
        t = jnp.broadcast_to(t0[:, None], d.shape[:2])

        def body(_, t):
            _, d1, d2 = engine.edge_lnl_terms(d, sc_d, aux, t)
            newton = t - d1 / jnp.where(d2 < 0, d2, -1.0)
            probe = jnp.where(d1 > 0, t * 3.0, t / 3.0)
            tn = jnp.where(d2 < -1e-12, newton, probe)
            tn = jnp.clip(tn, t / 3.0, t * 3.0)
            return jnp.clip(tn, BL_MIN, BL_MAX)

        t = jax.lax.fori_loop(0, _N_NEWTON, body, t)
        lnl, _, _ = engine.edge_lnl_terms(d, sc_d, aux, t)  # [E, 3]
        return lnl, t

    return jax.jit(scorer)


def nni_scores(engine, params, tree: TreeArrays, cand: np.ndarray):
    """(lnl [E, 3], t_opt [E, 3]): likelihood of the current config
    (col 0) and both NNI alternatives (cols 1, 2) of every internal
    edge, each with its central branch length Newton-optimized."""
    fn = getattr(engine, "_nni_scorer_fn", None)
    if fn is None:
        fn = _make_nni_scorer(engine)
        engine._nni_scorer_fn = fn
    lnl, t = fn(params, tree, jnp.asarray(cand))
    return np.asarray(lnl), np.asarray(t)


def _apply_swaps(topo, rv, cand, chosen, t_opt):
    """Apply the chosen (edge_index, cfg) swaps on the host topology.
    cfg 1 swaps b<->s, cfg 2 swaps a<->s."""
    uid = rv.unrooted_id
    for ei, cfg in chosen:
        v, u, a, b, s = (int(x) for x in cand[ei])
        mover = b if cfg == 1 else a
        topo = topo.swap_across(
            int(rv.node_to_edge[mover]), int(uid[mover]),
            int(rv.node_to_edge[s]), int(uid[s]),
        )
        topo.blen[int(rv.node_to_edge[v])] = float(t_opt[ei, cfg])
    return topo


def _select_disjoint(cand, gains, min_gain):
    """Greedy best-first selection of node-disjoint positive swaps.
    Returns list of (edge_index, cfg)."""
    order = np.dstack(np.unravel_index(
        np.argsort(-gains, axis=None), gains.shape
    ))[0]
    used: set[int] = set()
    chosen = []
    for ei, k in order:
        cfg = k + 1
        if gains[ei, k] <= min_gain:
            break
        nodes = set(int(x) for x in cand[ei])
        if nodes & used:
            continue
        used |= nodes
        chosen.append((int(ei), int(cfg)))
    return chosen


def nni_round(engine, params, topo, lnl0=None, min_gain: float = 1e-4,
              blen_tol: float = 1e-4):
    """One simultaneous-NNI round: optimize branch lengths, score all
    edges, apply the best node-disjoint set of improving swaps (with
    single-swap fallback).  Returns (topo, lnL, n_applied)."""
    rv = topo.rooted()
    ta = tree_arrays(rv, dtype=engine.dtype)
    ta, lnl = optimize_branch_lengths(engine, params, ta, tol=blen_tol)
    topo.set_blen_from_rooted(rv, np.asarray(ta.blen))

    cand = candidate_arrays(rv)
    lnl_cfg, t_opt = nni_scores(engine, params, ta, cand)
    gains = lnl_cfg[:, 1:] - lnl_cfg[:, [0]]
    chosen = _select_disjoint(cand, gains, min_gain)
    if not chosen:
        return topo, lnl, 0

    new_topo = _apply_swaps(topo.copy(), rv, cand, chosen, t_opt)
    ta2 = tree_arrays(new_topo.rooted(), dtype=engine.dtype)
    ta2, lnl2 = optimize_branch_lengths(engine, params, ta2,
                                        tol=blen_tol)
    if lnl2 <= lnl and len(chosen) > 1:
        # joint application hurt: fall back to the best single swap
        # (reference: Mov_Backward_Topo_Bl simu.c:395)
        chosen = chosen[:1]
        new_topo = _apply_swaps(topo.copy(), rv, cand, chosen, t_opt)
        ta2 = tree_arrays(new_topo.rooted(), dtype=engine.dtype)
        ta2, lnl2 = optimize_branch_lengths(engine, params, ta2,
                                            tol=blen_tol)
    if lnl2 <= lnl:
        return topo, lnl, 0
    new_topo.set_blen_from_rooted(new_topo.rooted(), np.asarray(ta2.blen))
    return new_topo, lnl2, len(chosen)
