"""Branch supports: bootstrap, aLRT family, aBayes, SH, TBE.

Reference: Bootstrap (utilities.c:3884) resamples site weights and
re-runs the whole search per replicate; aLRT/aBayes/SH (alrt.c:172
aLRT, :918 Statistics_To_Probabilities, :1091 Statistics_to_RELL,
:1148 Statistics_To_SH) compare each internal edge's best NNI
configuration against the alternatives; TBE (tbe.c) replaces presence
/absence with transfer distance.

TPU-native differences:
  * A bootstrap replicate is just a different pattern-weight vector —
    no data copies, no re-compilation (weights are traced arguments
    throughout the stack).  Replicates are embarrassingly parallel
    across hosts (mpi_boot.c's farming collapses to a loop here and a
    jax.distributed process-grid split in multi-host runs).
  * All three NNI-configuration likelihoods of every edge, and their
    per-site vectors, come from the one batched 5-branch NNI scorer.
  * RELL/SH resampling is vectorized: a [B, P] multinomial weight
    matrix and three [P] site-loglik vectors per edge -> one matmul.
"""

from __future__ import annotations

import numpy as np

from phyml_tpu.ops.likelihood import tree_arrays
from phyml_tpu.search.nni import candidate_arrays, nni_scores


# ----------------------------------------------------------------------
# aLRT / aBayes / SH (alrt.c)
# ----------------------------------------------------------------------

def _chi2_sf_1df(x):
    """Survival function of chi^2 with 1 df (no scipy dependency)."""
    from math import erfc, sqrt
    return erfc(sqrt(max(x, 0.0) / 2.0))


def alrt_supports(
    engine,
    model,
    params,
    topo,
    method: str = "abayes",
    n_rell: int = 10000,
    seed: int = 0,
    weights=None,
):
    """Per-internal-edge supports; returns {unrooted edge id: value}.

    method: 'alrt-stat' (raw 2*delta lnL), 'alrt-chi2' (1 - p under
    the 0.5 chi2_0 + 0.5 chi2_1 mixture), 'abayes', 'sh' (SH-aLRT),
    'rell'.
    """
    rv = topo.rooted()
    ta = tree_arrays(rv, dtype=engine.dtype)
    cand = candidate_arrays(rv)
    lnl_cfg, _, site = nni_scores(engine, params, ta, cand,
                                  weights=weights, return_site=True)
    w = np.asarray(engine.weights if weights is None else weights)
    n_sites = int(round(w.sum()))
    out: dict[int, float] = {}

    if method in ("sh", "rell"):
        rng = np.random.default_rng(seed)
        # one RELL weight matrix shared by all edges (alrt.c draws
        # fresh samples per edge; sharing only correlates edges, not
        # the per-edge marginal distribution)
        p = w / w.sum()
        W = rng.multinomial(n_sites, p, size=n_rell).astype(np.float64)

    for k, row in enumerate(cand):
        v = int(row[0])
        eid = int(rv.node_to_edge[v])
        l0, l1, l2 = (float(x) for x in lnl_cfg[k])
        best_alt = max(l1, l2)
        stat = 2.0 * (l0 - best_alt)
        if l0 < best_alt - 1e-9 and method in ("alrt-stat",
                                               "alrt-chi2"):
            # NNI scoring re-optimized the five local branch lengths
            # (the scorer's joint Newton ≙ alrt.c:338 NNI_Neigh_BL);
            # if the current config STILL loses, the LRT statistic is
            # 0 by definition (aLRT assumes NNI-optimality, alrt.c).
            # aBayes/SH/RELL remain well-defined and are computed
            # from the actual likelihoods below.
            out[eid] = 0.0
            continue
        if method == "alrt-stat":
            out[eid] = stat
        elif method == "alrt-chi2":
            out[eid] = 1.0 - 0.5 * _chi2_sf_1df(stat)
        elif method == "abayes":
            m = max(l0, l1, l2)
            e = np.exp([l0 - m, l1 - m, l2 - m])
            out[eid] = float(e[0] / e.sum())
        elif method == "rell":
            sums = W @ site[k].T          # [B, 3]
            out[eid] = float(
                (sums[:, 0] >= sums[:, 1:].max(axis=1)).mean()
            )
        elif method == "sh":
            c = (site[k] * w).sum(axis=1)         # observed totals [3]
            srt = np.sort(c)[::-1]
            delta_obs = srt[0] - srt[1]
            sums = W @ site[k].T - c              # centered [B, 3]
            s_srt = np.sort(sums, axis=1)
            delta_local = s_srt[:, 2] - s_srt[:, 1]
            out[eid] = float((delta_obs > delta_local).mean())
        else:
            raise ValueError(f"unknown aLRT method {method!r}")
    return out


# ----------------------------------------------------------------------
# Bootstrap (utilities.c:3884 / mpi_boot.c)
# ----------------------------------------------------------------------

def bootstrap_supports(
    engine,
    model,
    params,
    best_topo,
    n_replicates: int = 100,
    search: str = "nni",
    seed: int = 0,
    bayesian: bool = False,
    tbe: bool = False,
    verbose: bool = False,
    keep_trees: bool = False,
    replicate_indices=None,
):
    """Bootstrap branch supports for best_topo's internal edges.

    Per replicate: resample pattern weights (multinomial over the
    original sites; Dirichlet-weight "Bayesian bootstrap" when
    bayesian=True, stats.c:5236), rebuild a BioNJ start, run the
    chosen search, count recovered bipartitions (Compare_Bip
    utilities.c:4972) or accumulate transfer distances (tbe=True).
    Seeding is per-replicate (seed + rep ≙ srand(seed+rank),
    main.c:84) so results are independent of farming layout.
    Returns {edge id: support in [0, 1]} (plus the replicate trees if
    keep_trees).

    replicate_indices (optional): run only this subset of replicate
    ids; supports are then COUNTS (not divided) over that subset —
    the distributed farming primitive (parallel.boot)."""
    from phyml_tpu.search.bionj import bionj_start
    from phyml_tpu.search.driver import nni_search, spr_search

    aln = engine.aln
    ref_bips = best_topo.bipartitions()
    counts = {eid: 0.0 for eid in ref_bips.values()}
    n = best_topo.n_otu
    trees = []
    partial = replicate_indices is not None
    reps = (range(n_replicates) if replicate_indices is None
            else list(replicate_indices))

    ref_masks = _bip_masks(best_topo, ref_bips, n)

    for rep in reps:
        rng = np.random.default_rng(seed + rep)
        if bayesian:
            site_w = rng.dirichlet(np.ones(aln.n_sites)) * aln.n_sites
            pat_w = np.zeros(aln.n_patterns)
            np.add.at(pat_w, aln.site_to_pattern, site_w)
        else:
            pat_w = aln.resample_weights(rng)
        wpad = np.zeros(engine.P)
        wpad[:aln.n_patterns] = pat_w
        import jax.numpy as jnp
        wrep = jnp.asarray(wpad)

        p_rep = dict(params)
        topo = bionj_start(engine, p_rep, weights=wrep)
        searcher = spr_search if search == "spr" else nni_search
        topo, p_rep, lnl = searcher(
            engine, model, p_rep, topo, weights=wrep
        )
        if keep_trees:
            trees.append(topo)
        if tbe:
            rep_masks = _all_bip_masks(topo, n)
            for eid, mask in ref_masks.items():
                psz = min(mask.sum(), n - mask.sum())
                if psz <= 1:
                    continue
                d = _min_transfer_dist(mask, rep_masks, n)
                counts[eid] += max(0.0, 1.0 - d / (psz - 1))
        else:
            rep_bips = set(topo.bipartitions().keys())
            for bip, eid in ref_bips.items():
                if bip in rep_bips:
                    counts[eid] += 1.0
        if verbose:
            print(f"  bootstrap replicate {rep + 1}/{n_replicates}: "
                  f"lnL {lnl:.3f}")

    if partial:
        return (counts, trees) if keep_trees else counts
    support = {eid: c / n_replicates for eid, c in counts.items()}
    return (support, trees) if keep_trees else support


def _bip_masks(topo, bips, n):
    out = {}
    for bip, eid in bips.items():
        m = np.zeros(n, dtype=bool)
        m[list(bip)] = True
        out[eid] = m
    return out


def _all_bip_masks(topo, n):
    return np.stack([
        _mask_of(bip, n) for bip in topo.bipartitions().keys()
    ]) if topo.n_otu > 3 else np.zeros((0, n), dtype=bool)


def _mask_of(bip, n):
    m = np.zeros(n, dtype=bool)
    m[list(bip)] = True
    return m


def _min_transfer_dist(mask, rep_masks, n):
    """Transfer distance of one reference bipartition to a replicate
    tree = min Hamming distance over the replicate's bipartitions and
    their complements (tbe.c; Lemoine et al. 2018)."""
    if len(rep_masks) == 0:
        return min(mask.sum(), n - mask.sum())
    xor = rep_masks ^ mask
    h = xor.sum(axis=1)
    return int(np.minimum(h, n - h).min())


def bootstrap_supports_batched(
    engine,
    model,
    params,
    best_topo,
    n_replicates: int = 100,
    seed: int = 0,
    bayesian: bool = False,
    tbe: bool = False,
    verbose: bool = False,
    keep_trees: bool = False,
    max_rounds: int = 25,
    min_gain: float = 1e-4,
    rep_chunk: int | None = None,
):
    """Device-batched bootstrap: ALL replicates advance together.

    Per round, every replicate's branch-length optimization runs as
    one vmapped on-device while_loop and every replicate's NNI
    scoring as one vmapped dispatch over the replicate weight matrix
    (the mpi_boot.c:100-117 farming idea turned into a batch axis);
    the host only applies each replicate's best node-disjoint swaps.
    Model parameters stay FROZEN at the ML estimates — the
    rapid-bootstrap approximation; bootstrap_supports re-estimates
    them per replicate (the reference's exact behavior) at serial
    cost.  Returns {edge id: support in [0, 1]}.

    rep_chunk bounds how many replicates ride in one device batch
    (the vmapped scorers materialize ~[B, n_nodes, C, ns, P] tensors;
    at BASELINE-config-5 scale 100 replicates would blow HBM).  The
    default caps the working set at a few GB; per-replicate seeding
    makes the chunked result identical to the single-batch one.
    """
    import jax.numpy as jnp

    from phyml_tpu.optim.blen import optimize_branch_lengths_batched
    from phyml_tpu.ops.likelihood import TreeArrays, tree_arrays
    from phyml_tpu.search.bionj import bionj_start
    from phyml_tpu.search.nni import (
        _apply_swaps, _select_disjoint, candidate_arrays,
        nni_scores_batched,
    )

    if rep_chunk is None:
        per_rep = engine.n_nodes * engine.C * engine.ns * engine.P \
            * 4 * 6
        rep_chunk = max(1, min(n_replicates, int(3e9 // per_rep)))
    if rep_chunk < n_replicates:
        counts_all: dict = {}
        trees_all: list = []
        done = 0
        while done < n_replicates:
            m = min(rep_chunk, n_replicates - done)
            out = bootstrap_supports_batched(
                engine, model, params, best_topo, n_replicates=m,
                seed=seed + done, bayesian=bayesian, tbe=tbe,
                verbose=verbose, keep_trees=keep_trees,
                max_rounds=max_rounds, min_gain=min_gain,
                rep_chunk=m)
            sup = out[0] if keep_trees else out
            for eid, s in sup.items():
                counts_all[eid] = counts_all.get(eid, 0.0) + s * m
            if keep_trees:
                trees_all.extend(out[1])
            done += m
        supports = {eid: c / n_replicates
                    for eid, c in counts_all.items()}
        return (supports, trees_all) if keep_trees else supports

    aln = engine.aln
    n = best_topo.n_otu
    ref_bips = best_topo.bipartitions()
    counts = {eid: 0.0 for eid in ref_bips.values()}
    ref_masks = _bip_masks(best_topo, ref_bips, n)

    # replicate weight matrix (per-replicate seeding as in the serial
    # path, so both paths draw identical replicates)
    W = np.zeros((n_replicates, engine.P))
    for rep in range(n_replicates):
        rng = np.random.default_rng(seed + rep)
        if bayesian:
            site_w = rng.dirichlet(np.ones(aln.n_sites)) * aln.n_sites
            pat_w = np.zeros(aln.n_patterns)
            np.add.at(pat_w, aln.site_to_pattern, site_w)
        else:
            pat_w = aln.resample_weights(rng)
        W[rep, :aln.n_patterns] = pat_w
    W_j = jnp.asarray(W)

    # starting trees (host BioNJ per replicate; distances on device)
    topos = [bionj_start(engine, params, weights=W_j[r])
             for r in range(n_replicates)]
    active = np.ones(n_replicates, dtype=bool)

    for rnd in range(max_rounds):
        rvs = [t.rooted() for t in topos]
        tas = [tree_arrays(rv, dtype=engine.dtype) for rv in rvs]
        trees = TreeArrays(
            child=jnp.stack([t.child for t in tas]),
            blen=jnp.stack([t.blen for t in tas]))
        trees, lnls = optimize_branch_lengths_batched(
            engine, params, trees, W_j)
        blens = np.asarray(trees.blen)
        cands = np.stack([candidate_arrays(rv) for rv in rvs])
        lnl_cfg, t_opt = nni_scores_batched(engine, params, trees,
                                            cands, W_j)
        n_changed = 0
        for r in range(n_replicates):
            if not active[r]:
                continue
            topos[r].set_blen_from_rooted(rvs[r], blens[r])
            gains = lnl_cfg[r][:, 1:] - lnl_cfg[r][:, [0]]
            chosen = _select_disjoint(cands[r], gains, min_gain)
            if not chosen:
                active[r] = False
                continue
            topos[r] = _apply_swaps(
                topos[r].copy(), rvs[r], cands[r], chosen,
                tuple(t[r] for t in t_opt))
            n_changed += 1
        if verbose:
            print(f"  boot round {rnd}: {int(active.sum())} active, "
                  f"{n_changed} changed")
        if not active.any():
            break

    trees_out = []
    for rep in range(n_replicates):
        topo = topos[rep]
        if keep_trees:
            trees_out.append(topo)
        if tbe:
            rep_masks = _all_bip_masks(topo, n)
            for eid, mask in ref_masks.items():
                psz = min(mask.sum(), n - mask.sum())
                if psz <= 1:
                    continue
                d = _min_transfer_dist(mask, rep_masks, n)
                counts[eid] += max(0.0, 1.0 - d / (psz - 1))
        else:
            rep_bips = set(topo.bipartitions().keys())
            for bip, eid in ref_bips.items():
                if bip in rep_bips:
                    counts[eid] += 1.0
    supports = {eid: c / n_replicates for eid, c in counts.items()}
    if keep_trees:
        return supports, trees_out
    return supports
