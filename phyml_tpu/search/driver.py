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
from phyml_tpu.search.spr import spr_round


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
):
    """NNI topology search with interleaved parameter optimization.
    Returns (topo, params, lnL).  accept_topo: optional topology
    predicate (constraint search, --constraint_file)."""
    lnl = -np.inf
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
):
    """SPR topology search with interleaved parameter optimization and
    a final NNI polish (reference: Global_Spr_Search spr.c:764, which
    runs SPR rounds then Check_NNI_Five_Branches).
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
                topo, lnl_fine, n_fine = spr_round(
                    engine, params, topo, rng=rng, weights=weights,
                    accept_topo=accept_topo, batch_k=1,
                )
                if verbose:
                    print(f"  spr fine: lnL {lnl_fine:.5f} "
                          f"({n_fine} moves)")
                if n_fine:
                    lnl = lnl_fine
                    continue
            lnl = max(lnl, lnl_new)
            break
        lnl = lnl_new
    # NNI polish + final joint optimization
    return nni_search(
        engine, model, params, topo,
        opt_params=opt_params, verbose=verbose, weights=weights,
        trace=trace, accept_topo=accept_topo,
    )
