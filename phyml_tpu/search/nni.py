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


def _nni_scorer_core(engine):
    """Scores every internal edge's 3 configurations with the FOUR
    local branch lengths (central + the three adjacent pendants)
    jointly optimized by coordinate Newton - the batched equivalent
    of the reference's 5-branch NNI evaluation (alrt.c:32
    Check_NNI_Five_Branches; only the grandparent edge u stays
    fixed)."""
    from phyml_tpu.models.eigen import pmat as _pmat

    _P = jax.lax.Precision.HIGHEST

    def scorer(sys, tree: TreeArrays, cand, weights):
        lam, V, Vinv, pi, w, pinv = sys
        pmats = engine._pmats(lam, V, Vinv,
                              tree.blen.astype(engine.dtype))
        pup, clv, sc = engine._up_pass(pmats, tree.child)
        out, sc_out = engine._down_pass(pmats, tree.child, pup, sc, pi)

        v, u, a, b, s = (cand[:, k] for k in range(5))
        # out[v] = (P_u^T out[u]) . pup[s]: the config-independent
        # outside factor above the central edge
        G = jnp.einsum("ecwz,ecwp->eczp", pmats[u], out[u],
                       precision=_P)
        sc_tot = sc[a] + sc[b] + sc[s] + sc_out[u]    # [E, C, P]

        aux = dict(
            lam=lam, w=w, pinv=pinv, weights=weights,
            inv_lk=engine._inv_lk(pi, w) if engine.model.invar
            else jnp.zeros((engine.P,), dtype=engine.dtype),
        )
        C = engine.C

        def newton(d, t, iters=5):
            sc_d = jnp.broadcast_to(
                sc_tot[:, None], d.shape[:2] + sc_tot.shape[1:]
            )

            def body(_, t):
                _, d1, d2 = engine.edge_lnl_terms(d, sc_d, aux, t)
                nt = t - d1 / jnp.where(d2 < 0, d2, -1.0)
                probe = jnp.where(d1 > 0, t * 3.0, t / 3.0)
                tn = jnp.where(d2 < -1e-12, nt, probe)
                return jnp.clip(jnp.clip(tn, t / 3.0, t * 3.0),
                                BL_MIN, BL_MAX).astype(t.dtype)
            return jax.lax.fori_loop(0, iters, body, t)

        def dots(x, y):
            bx = jnp.einsum("ciy,ekcyp->ekcip", Vinv, x, precision=_P)
            ay = jnp.einsum("czi,ekczp->ekcip", V, y, precision=_P)
            return ay * bx

        def P_of(t):
            """t [E, 3] -> P [E, 3, C, ns, ns]."""
            E = t.shape[0]
            p = _pmat(lam, V, Vinv,
                      t.reshape(-1)[:, None] *
                      jnp.ones((1, C), dtype=engine.dtype))
            return p.reshape(E, 3, C, engine.ns, engine.ns)

        def push(P, x):
            """P [E,3,C,ns,ns] @ x [E,3,C,ns,P] (or [E,1,...]
            broadcast)."""
            return jnp.einsum("ekcxy,ekcyp->ekcxp", P, x, precision=_P)

        def pushT(P, x):
            return jnp.einsum("ekcyx,ekcyp->ekcxp", P, x, precision=_P)

        E3 = (cand.shape[0], 3)
        # per-config subtree roles: children (x1, x2) and sibling x3
        C1 = jnp.stack([clv[a], clv[a], clv[b]], 1)   # [E, 3, C, ns, P]
        C2 = jnp.stack([clv[b], clv[s], clv[s]], 1)
        C3 = jnp.stack([clv[s], clv[b], clv[a]], 1)
        t1 = jnp.stack([tree.blen[a], tree.blen[a], tree.blen[b]], 1)
        t2 = jnp.stack([tree.blen[b], tree.blen[s], tree.blen[s]], 1)
        t3 = jnp.stack([tree.blen[s], tree.blen[b], tree.blen[a]], 1)
        tc = jnp.broadcast_to(tree.blen[v][:, None], E3)
        t1, t2, t3, tc = (jnp.clip(t, BL_MIN, BL_MAX)
                          for t in (t1, t2, t3, tc))
        Gb = G[:, None]                                # [E, 1, C, ns, P]

        def cycle(_, ts):
            t1, t2, t3, tc = ts
            Q1 = push(P_of(t1), C1)
            Q2 = push(P_of(t2), C2)
            Q3 = push(P_of(t3), C3)
            # central edge
            tc = newton(dots(Q1 * Q2, Gb * Q3), tc)
            Pc = P_of(tc)
            # pendant 1: W = Pc^T (G.Q3)
            W = pushT(Pc, Gb * Q3)
            t1 = newton(dots(C1, W * Q2), t1)
            Q1 = push(P_of(t1), C1)
            # pendant 2
            t2 = newton(dots(C2, W * Q1), t2)
            Q2 = push(P_of(t2), C2)
            # pendant 3 (sibling)
            t3 = newton(dots(C3, Gb * push(Pc, Q1 * Q2)), t3)
            return t1, t2, t3, tc

        t1, t2, t3, tc = jax.lax.fori_loop(
            0, 2, cycle, (t1, t2, t3, tc)
        )
        Q1 = push(P_of(t1), C1)
        Q2 = push(P_of(t2), C2)
        Q3 = push(P_of(t3), C3)
        d = dots(Q1 * Q2, Gb * Q3)
        sc_d = jnp.broadcast_to(
            sc_tot[:, None], d.shape[:2] + sc_tot.shape[1:]
        )
        site, _, _ = engine.edge_site_terms(d, sc_d, aux, tc)
        lnl = jnp.sum(
            site.astype(jnp.float64) * aux["weights"], axis=-1
        )                                              # [E, 3]
        return lnl, (t1, t2, t3, tc), site

    return scorer


def _make_nni_scorer(engine):
    return jax.jit(engine.bind_data(_nni_scorer_core(engine)))


def nni_scores_batched(engine, params, trees, cands, weights):
    """NNI scoring for a BATCH of replicates in one dispatch: trees
    stacked TreeArrays, cands [R, E, 5], weights [R, P].  Returns
    (lnl [R, E, 3], t_opt tuple of [R, E, 3]) as numpy."""
    fn = getattr(engine, "_nni_scorer_batched_fn", None)
    if fn is None:
        core = _nni_scorer_core(engine)
        fn = jax.jit(engine.bind_data(
            jax.vmap(core, in_axes=(None, 0, 0, 0))))
        engine._nni_scorer_batched_fn = fn
    lnl, ts, _ = fn(engine.data(), engine.system_of(params), trees,
                    jnp.asarray(cands), weights)
    return np.asarray(lnl), tuple(np.asarray(t) for t in ts)


def nni_scores(engine, params, tree: TreeArrays, cand: np.ndarray,
               weights=None, return_site=False):
    """(lnl [E, 3], (t1, t2, t3, tc) each [E, 3][, site [E, 3, P]]):
    likelihood of the current config (col 0) and both NNI alternatives
    (cols 1, 2) of every internal edge, the four local branch lengths
    optimized.  return_site=True adds the per-site log-likelihoods
    (the reference's log_lks_aLRT, used by SH/RELL supports)."""
    fn = getattr(engine, "_nni_scorer_fn", None)
    if fn is None:
        fn = _make_nni_scorer(engine)
        engine._nni_scorer_fn = fn
    weights = engine.weights if weights is None else weights
    lnl, ts, site = fn(engine.data(), engine.system_of(params), tree,
                       jnp.asarray(cand), weights)
    out = (np.asarray(lnl), tuple(np.asarray(t) for t in ts))
    if return_site:
        out = out + (np.asarray(site),)
    return out


def _apply_swaps(topo, rv, cand, chosen, t_opt):
    """Apply the chosen (edge_index, cfg) swaps on the host topology.
    cfg 1 swaps b<->s, cfg 2 swaps a<->s.  t_opt = (t1, t2, t3, tc)
    arrays from nni_scores; all four local branch lengths are written
    (per-config role order: cfg1 -> (a, s | b), cfg2 -> (b, s | a),
    cfg0 -> (a, b | s))."""
    t1, t2, t3, tc = t_opt
    uid = rv.unrooted_id
    roles = {0: ("a", "b", "s"), 1: ("a", "s", "b"), 2: ("b", "s", "a")}
    for ei, cfg in chosen:
        v, u, a, b, s = (int(x) for x in cand[ei])
        mover = b if cfg == 1 else a
        topo = topo.swap_across(
            int(rv.node_to_edge[mover]), int(uid[mover]),
            int(rv.node_to_edge[s]), int(uid[s]),
        )
        # post-swap, each moved subtree hangs on the OTHER's edge id
        e_a, e_b, e_s = (int(rv.node_to_edge[x]) for x in (a, b, s))
        if cfg == 1:        # b <-> s
            edge_of = {"a": e_a, "b": e_s, "s": e_b}
        else:               # a <-> s
            edge_of = {"a": e_s, "b": e_b, "s": e_a}
        r1, r2, r3 = roles[cfg]
        topo.blen[int(rv.node_to_edge[v])] = float(tc[ei, cfg])
        topo.blen[edge_of[r1]] = float(t1[ei, cfg])
        topo.blen[edge_of[r2]] = float(t2[ei, cfg])
        topo.blen[edge_of[r3]] = float(t3[ei, cfg])
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
              blen_tol: float = 1e-4, weights=None, accept_topo=None):
    """One simultaneous-NNI round: optimize branch lengths, score all
    edges, apply the best node-disjoint set of improving swaps (with
    single-swap fallback).  Returns (topo, lnL, n_applied).

    accept_topo (optional): predicate on the post-swap Topology;
    swaps whose application would violate it are dropped (constraint
    search, reference --constraint_file)."""
    rv = topo.rooted()
    ta = tree_arrays(rv, dtype=engine.dtype)
    ta, lnl = optimize_branch_lengths(engine, params, ta, tol=blen_tol,
                                      weights=weights)
    topo.set_blen_from_rooted(rv, np.asarray(ta.blen))

    cand = candidate_arrays(rv)
    lnl_cfg, t_opt = nni_scores(engine, params, ta, cand,
                                weights=weights)
    gains = lnl_cfg[:, 1:] - lnl_cfg[:, [0]]
    chosen = _select_disjoint(cand, gains, min_gain)
    if accept_topo is not None:
        chosen = [
            mv for mv in chosen
            if accept_topo(_apply_swaps(topo.copy(), rv, cand, [mv],
                                        t_opt))
        ]
    if not chosen:
        return topo, lnl, 0

    new_topo = _apply_swaps(topo.copy(), rv, cand, chosen, t_opt)
    ta2 = tree_arrays(new_topo.rooted(), dtype=engine.dtype)
    ta2, lnl2 = optimize_branch_lengths(engine, params, ta2,
                                        tol=blen_tol, weights=weights)
    if lnl2 <= lnl and len(chosen) > 1:
        # joint application hurt: fall back to the best single swap
        # (reference: Mov_Backward_Topo_Bl simu.c:395)
        chosen = chosen[:1]
        new_topo = _apply_swaps(topo.copy(), rv, cand, chosen, t_opt)
        ta2 = tree_arrays(new_topo.rooted(), dtype=engine.dtype)
        ta2, lnl2 = optimize_branch_lengths(engine, params, ta2,
                                            tol=blen_tol,
                                            weights=weights)
    if lnl2 <= lnl:
        return topo, lnl, 0
    new_topo.set_blen_from_rooted(new_topo.rooted(), np.asarray(ta2.blen))
    return new_topo, lnl2, len(chosen)
