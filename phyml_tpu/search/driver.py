"""Search drivers: NNI hill-climb (Simu_Loop) and full ML pipeline.

Reference flow (simu.c:22 Simu_Loop): repeat { NNI rounds until no
swap improves } alternated with model-parameter optimization until
the joint gain stalls.
"""

from __future__ import annotations

import numpy as np

from phyml_tpu.ops.likelihood import tree_arrays
from phyml_tpu.optim.round import optimize_scalars, round_optimize
from phyml_tpu.search.nni import nni_round
from phyml_tpu.search.spr import (
    apply_spr, prune_candidates, spr_move_arrays, spr_round,
)


def nni_search(
    engine,
    model,
    params,
    topo,
    opt_params: bool = True,
    tol: float = 1e-3,
    max_outer: int = 20,
    max_inner: int = 50,
    verbose: bool = False,
    weights=None,
    trace=None,
    accept_topo=None,
    spr_escape: bool = True,
):
    """NNI topology search with interleaved parameter optimization.
    Returns (topo, params, lnL).  accept_topo: optional topology
    predicate (constraint search, --constraint_file).

    spr_escape: when the NNI neighborhood is exhausted, try single
    one-move-at-a-time SPR sweeps to hop NNI-local optima.  The
    reference's NNI mode has comparable escape power built into
    Simu_Loop (simu.c:22: simultaneous lambda-damped swap sets with
    backtracking, five-branch optimization); a plain best-swap NNI
    measurably stalls ~2.4 lnL short of it on examples/proteic."""
    lnl = -np.inf
    escapes_left = 8
    rng_esc = np.random.default_rng(17)
    for outer in range(max_outer):
        # inner NNI loop until no improving swap
        for _ in range(max_inner):
            topo, lnl_new, n_swaps = nni_round(
                engine, params, topo, weights=weights,
                accept_topo=accept_topo)
            if verbose:
                print(f"  nni: lnL {lnl_new:.5f} ({n_swaps} swaps)")
            if trace is not None and n_swaps:
                trace.snapshot(topo, lnl_new)
            if n_swaps == 0:
                break
        if opt_params:
            rv = topo.rooted()
            params, ta, lnl_new = round_optimize(
                engine, model, params,
                tree_arrays(rv, dtype=engine.dtype), max_rounds=3,
                weights=weights,
            )
            topo.set_blen_from_rooted(rv, np.asarray(ta.blen))
            if verbose:
                print(f"  params: lnL {lnl_new:.5f}")
        if lnl_new - lnl < tol:
            if spr_escape and escapes_left > 0:
                escapes_left -= 1
                topo2, lnl_esc, n_esc = spr_round(
                    engine, params, topo, rng=rng_esc,
                    weights=weights, accept_topo=accept_topo,
                    max_apply=1)
                if n_esc and lnl_esc > lnl_new:
                    topo, lnl = topo2, lnl_esc
                    if verbose:
                        print(f"  spr escape: lnL {lnl_esc:.5f}")
                    if trace is not None:
                        trace.snapshot(topo, lnl_esc)
                    continue
            lnl = max(lnl, lnl_new)
            break
        lnl = lnl_new
    # final branch-length + parameter polish
    params, ta, lnl = round_optimize(
        engine, model, params,
        tree_arrays(topo.rooted(), dtype=engine.dtype),
        opt_params=opt_params, weights=weights,
    )
    rv = topo.rooted()
    topo.set_blen_from_rooted(rv, np.asarray(ta.blen))
    return topo, params, lnl


def spr_search(
    engine,
    model,
    params,
    topo,
    opt_params: bool = True,
    tol: float = 1e-2,
    max_outer: int = 15,
    seed: int = 0,
    verbose: bool = False,
    weights=None,
    trace=None,
    accept_topo=None,
    five_branch: bool = True,
):
    """SPR topology search with interleaved parameter optimization and
    a final NNI polish (reference: Global_Spr_Search spr.c:764, which
    runs SPR rounds then Check_NNI_Five_Branches; five_branch=False
    skips that polish, --no_five_branch cl.c case 41).
    Returns (topo, params, lnL)."""
    rng = np.random.default_rng(seed)
    lnl = -np.inf
    fine_done = False
    for outer in range(max_outer):
        topo, lnl_spr, n_moves = spr_round(
            engine, params, topo, rng=rng, weights=weights,
            accept_topo=accept_topo,
        )
        if verbose:
            print(f"  spr: lnL {lnl_spr:.5f} ({n_moves} moves)")
        if trace is not None and n_moves:
            trace.snapshot(topo, lnl_spr)
        rv = topo.rooted()
        params, ta, lnl_new = round_optimize(
            engine, model, params,
            tree_arrays(rv, dtype=engine.dtype),
            opt_params=opt_params, max_rounds=3, weights=weights,
        )
        topo.set_blen_from_rooted(rv, np.asarray(ta.blen))
        if verbose:
            print(f"  params: lnL {lnl_new:.5f}")
        if n_moves == 0 and lnl_new - lnl < tol:
            if not fine_done:
                # one serial fine sweep at convergence: the block-
                # greedy rounds can settle in a slightly different
                # basin than one-move-at-a-time application (the
                # reference's semantics, spr.c:1380); a single
                # batch_k=1 sweep recovers it
                fine_done = True
                # max_apply=1 gives one-move-at-a-time application
                # (the reference's spr.c:1380 semantics) at batched
                # scoring cost: with the default batch_k one dispatch
                # scores every candidate, vs ~n_candidates dispatches
                # for batch_k=1 (~12 s of pure host sync per sweep on
                # the tunneled TPU); loop until no move improves
                n_fine_total = 0
                for _ in range(12):
                    topo, lnl_fine, n_fine = spr_round(
                        engine, params, topo, rng=rng,
                        weights=weights, accept_topo=accept_topo,
                        max_apply=1,
                    )
                    n_fine_total += n_fine
                    if n_fine == 0:
                        break
                if verbose:
                    print(f"  spr fine: lnL {lnl_fine:.5f} "
                          f"({n_fine_total} moves)")
                if n_fine_total:
                    lnl = lnl_fine
                    continue
            lnl = max(lnl, lnl_new)
            break
        lnl = lnl_new
    if not five_branch:
        # --no_five_branch: return straight from SPR convergence
        return topo, params, lnl
    # NNI polish + final joint optimization
    return nni_search(
        engine, model, params, topo,
        opt_params=opt_params, verbose=verbose, weights=weights,
        trace=trace, accept_topo=accept_topo,
    )


def perturb_topology(topo, rng, k: int = 3):
    """Apply k random SPR moves (random prune subtree, random valid
    regraft target, lengths split in half) — the perturbation step of
    the iterated search below.  Equivalent in role to the reference's
    random-tree restarts (--rand_start), but local: a few moves keep
    most of the converged structure."""
    topo = topo.copy()
    for _ in range(k):
        rv = topo.rooted()
        cands = [v for v in prune_candidates(rv)
                 if int(rv.parent[v]) != rv.n_nodes - 1]
        if not cands:
            break
        v = int(rng.choice(cands))
        _, valid = spr_move_arrays(rv, v)
        u = int(rv.parent[v])
        s_row = rv.child[u - rv.n_otu]
        sib = int(s_row[1] if int(s_row[0]) == v else s_row[0])
        link_edges = {int(rv.node_to_edge[u]),
                      int(rv.node_to_edge[sib])}
        targets = [t for t in range(rv.n_nodes)
                   if valid[t]
                   and int(rv.node_to_edge[t]) not in link_edges]
        if not targets:
            continue
        t = int(rng.choice(targets))
        t_e = float(topo.blen[int(rv.node_to_edge[t])])
        t_p = float(rv.node_blen[v])
        try:
            topo = apply_spr(topo, rv, v, t, t_e / 2, t_e / 2, t_p)
        except (ValueError, AssertionError):
            continue
    return topo


def ml_search(
    engine,
    model,
    params,
    topo,
    kind: str = "spr",
    retries: int = 4,
    perturb_k: int = 3,
    opt_params: bool = True,
    seed: int = 0,
    verbose: bool = False,
    weights=None,
    trace=None,
    accept_topo=None,
    tol: float | None = None,
    five_branch: bool = True,
):
    """Iterated hill-climb: run the chosen search, then retry from
    small random perturbations of the best tree, keeping the best
    final state (ratchet-style).  The ML landscape on real data has
    tight multi-move traps — on examples/proteic 2 of 3 random SPR
    orders stall 2.4 lnL short of the optimum a third one reaches —
    and single-trajectory searches (including the reference's,
    spr.c:764) are seed-lucky.  Returns (topo, params, lnL)."""
    search = spr_search if kind.lower() == "spr" else nni_search

    def run(p0, t0, s, opt_p):
        kw = dict(opt_params=opt_p, verbose=verbose, weights=weights,
                  trace=trace, accept_topo=accept_topo)
        if tol is not None:
            # --min_diff_lk_global (cl.c case 17): the outer-loop
            # convergence window of the topology search
            kw["tol"] = tol
        if search is spr_search:
            return search(engine, model, dict(p0), t0, seed=s,
                          five_branch=five_branch, **kw)
        return search(engine, model, dict(p0), t0, **kw)

    from phyml_tpu.optim.blen import optimize_branch_lengths

    def probe(p0, t0, s):
        """Raw SPR sweeps + branch lengths with parameters FROZEN at
        the incumbent's (already near-optimal) values: a fair
        comparison against the incumbent at the same parameters, at a
        fraction of a full search's cost."""
        rng_p = np.random.default_rng(s)
        t = t0
        # coarse min_gain: the probe only needs to find its way back
        # to (or past) the incumbent's basin, not to polish — chasing
        # sub-0.05 gains here doubles the sweep count for nothing
        for _ in range(4):
            t, lnl_p, n_p = spr_round(engine, p0, t, rng=rng_p,
                                      weights=weights,
                                      accept_topo=accept_topo,
                                      min_gain=0.05)
            if n_p == 0:
                break
        ta_p, lnl_p = optimize_branch_lengths(
            engine, p0, tree_arrays(t.rooted(), dtype=engine.dtype),
            weights=weights)
        t.set_blen_from_rooted(t.rooted(), np.asarray(ta_p.blen))
        return t, dict(p0), float(lnl_p)

    best = run(params, topo.copy(), seed, opt_params)
    rng = np.random.default_rng(seed + 99991)
    for r in range(retries):
        t0 = perturb_topology(best[0], rng, k=perturb_k)
        cand = probe(best[1], t0, seed + 7 * (r + 1))
        # a probe must win by a meaningful margin: blen-tolerance
        # noise (~1e-3) would otherwise trigger the expensive full
        # re-optimization on every retry
        if cand[2] > best[2] + 0.01:
            if opt_params:
                p2, ta2, lnl2 = round_optimize(
                    engine, model, dict(best[1]),
                    tree_arrays(cand[0].rooted(),
                                dtype=engine.dtype),
                    weights=weights)
                cand[0].set_blen_from_rooted(cand[0].rooted(),
                                             np.asarray(ta2.blen))
                cand = (cand[0], p2, lnl2)
            if verbose:
                print(f"  retry {r + 1}: improved "
                      f"{best[2]:.5f} -> {cand[2]:.5f}")
            if cand[2] > best[2]:
                best = cand
        else:
            if verbose:
                print(f"  retry {r + 1}: no improvement "
                      f"({cand[2]:.5f} <= {best[2]:.5f})")
            # adaptive stop: a failed probe from the incumbent's
            # neighborhood is evidence it is a solid optimum; keep
            # probing only while probes keep winning (retries caps
            # the total)
            break
    return best
