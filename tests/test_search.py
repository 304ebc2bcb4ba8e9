"""Topology search: scorer exactness and full-search parity.

Golden targets (tests/golden/): config E/F = GTR+G4 on examples/
nucleic with NNI/SPR search, reference lnL -5382.35991.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from phyml_tpu.models.substitution import SubstModel
from phyml_tpu.ops.likelihood import LikelihoodEngine, tree_arrays
from phyml_tpu.search.bionj import bionj, bionj_start
from phyml_tpu.search.nni import (
    candidate_arrays, nni_scores, _apply_swaps,
)
from phyml_tpu.search.spr import (
    apply_spr, spr_move_arrays, spr_scores,
)

GOLDEN_EF = -5382.35991


@pytest.fixture(scope="module")
def gtr_setup(nucleic, ref_tree_a):
    m = SubstModel(datatype="nt", name="GTR", n_classes=4)
    eng = LikelihoodEngine(nucleic, m, dtype=jnp.float64)
    p = m.init_params(nucleic.obs_state_freqs)
    return m, eng, p, ref_tree_a


def test_nni_scorer_matches_direct_evaluation(gtr_setup):
    m, eng, p, topo = gtr_setup
    rv = topo.rooted()
    ta = tree_arrays(rv, dtype=jnp.float64)
    cand = candidate_arrays(rv)
    lnl_cfg, t_opt = nni_scores(eng, p, ta, cand)
    for ei, cfg in ((3, 1), (20, 2)):
        t2 = _apply_swaps(topo.copy(), rv, cand, [(ei, cfg)], t_opt)
        direct = float(eng.loglik(
            p, tree_arrays(t2.rooted(), dtype=jnp.float64)
        ))
        assert abs(lnl_cfg[ei, cfg] - direct) < 1e-8


def test_spr_scorer_matches_direct_evaluation(gtr_setup):
    m, eng, p, topo = gtr_setup
    rv = topo.rooted()
    ta = tree_arrays(rv, dtype=jnp.float64)
    for v in (5, 60):
        mask, valid = spr_move_arrays(rv, v)
        lnl_t, t1, t2, tp = spr_scores(eng, p, ta, mask, v, valid)
        u = int(rv.parent[v])
        srow = rv.child[u - rv.n_otu]
        sib = int(srow[1] if int(srow[0]) == v else srow[0])
        targets = [t for t in np.where(valid)[0] if t not in (u, sib)]
        for t in (targets[0], targets[-1]):
            new = apply_spr(topo, rv, v, int(t), float(t1[t]),
                            float(t2[t]), float(tp[t]))
            direct = float(eng.loglik(
                p, tree_arrays(new.rooted(), dtype=jnp.float64)
            ))
            assert abs(lnl_t[t] - direct) < 1e-8


def test_bionj_recovers_reference_start(nucleic, ref_tree_a):
    m = SubstModel(datatype="nt", name="JC69", n_classes=1)
    eng = LikelihoodEngine(nucleic, m, dtype=jnp.float64)
    p = m.init_params(nucleic.obs_state_freqs)
    topo = bionj_start(eng, p)
    # close to the reference's BioNJ tree, and at least as good
    assert topo.rf_distance(ref_tree_a) <= 6
    l_ours = float(eng.loglik(
        p, tree_arrays(topo.rooted(), dtype=jnp.float64)))
    l_ref = float(eng.loglik(
        p, tree_arrays(ref_tree_a.rooted(), dtype=jnp.float64)))
    assert l_ours >= l_ref - 1.0


def test_bionj_perfect_additive_distances():
    # distances from a known tree must reconstruct it exactly
    from phyml_tpu.topology import Topology
    rng = np.random.default_rng(7)
    true = Topology.random(12, rng, mean_blen=0.3)
    adj = true.adjacency()
    n = 12
    D = np.zeros((n, n))
    import collections
    for s in range(n):
        dist = {s: 0.0}
        dq = collections.deque([s])
        while dq:
            x = dq.popleft()
            for (y, e) in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + true.blen[e]
                    dq.append(y)
        for t in range(n):
            D[s, t] = dist[t]
    rec = bionj(D)
    assert rec.rf_distance(true) == 0


@pytest.mark.slow
def test_spr_search_reaches_reference_lnl(nucleic):
    m = SubstModel(datatype="nt", name="GTR", n_classes=4)
    eng = LikelihoodEngine(nucleic, m, dtype=jnp.float64)
    p = m.init_params(nucleic.obs_state_freqs)
    from phyml_tpu.search.driver import spr_search
    topo = bionj_start(eng, p)
    topo, p, lnl = spr_search(eng, m, p, topo)
    # 0.05 window: the block-greedy SPR (one dispatch scores a whole
    # block of prune candidates) deterministically lands within a few
    # hundredths of a log unit of the golden run's optimum; the
    # reference binary's own run-to-run spread on this config is
    # larger (measured -5382.479 with -s SPR --r_seed 1 vs the golden
    # -5382.360) — per SURVEY hard-part 3 the bar is same-or-better
    # final lnL class, not trajectory identity
    assert lnl >= GOLDEN_EF - 0.05


@pytest.mark.slow
def test_serial_spr_reaches_exact_optimum(nucleic):
    """Exact-optimum ratchet (VERDICT r3 #10): one-move-at-a-time SPR
    sweeps (the reference's spr.c:1380 semantics) from the BioNJ
    start, alternated with parameter optimization, must reach the
    golden optimum to the tight pre-block tolerance — keeps the block
    path's 0.05 window from quietly widening further."""
    from phyml_tpu.optim.round import round_optimize
    from phyml_tpu.search.spr import spr_round

    m = SubstModel(datatype="nt", name="GTR", n_classes=4)
    eng = LikelihoodEngine(nucleic, m, dtype=jnp.float64)
    p = m.init_params(nucleic.obs_state_freqs)
    topo = bionj_start(eng, p)
    rng = np.random.default_rng(0)
    lnl = -np.inf
    for _ in range(12):
        topo, lnl_spr, n_moves = spr_round(eng, p, topo, rng=rng,
                                           batch_k=1)
        p, ta, lnl = round_optimize(
            eng, m, p, tree_arrays(topo.rooted(), dtype=jnp.float64),
            max_rounds=3)
        topo.set_blen_from_rooted(topo.rooted(), np.asarray(ta.blen))
        if n_moves == 0:
            break
    # NNI polish, as the reference's Global_Spr_Search ends with
    # Check_NNI_Five_Branches (spr.c:764)
    from phyml_tpu.search.driver import nni_search
    topo, p, lnl = nni_search(eng, m, p, topo)
    assert lnl >= GOLDEN_EF - 0.01


def test_stepwise_addition_parsimony_tree(nucleic):
    """Stepwise addition (Stepwise_Add_Pars pars.c:948): valid
    topology whose parsimony score beats random trees and approaches
    the reference ML tree's score (golden A: 847 steps)."""
    import jax.numpy as jnp
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.ops.likelihood import LikelihoodEngine
    from phyml_tpu.ops.parsimony import parsimony_score
    from phyml_tpu.search.stepwise import stepwise_addition_tree
    from phyml_tpu.topology import Topology

    rng = np.random.default_rng(8)
    topo = stepwise_addition_tree(nucleic, rng)
    topo.validate()
    assert sorted(
        int(x) for e in topo.edges for x in e if x < nucleic.n_otu
    ) == list(range(nucleic.n_otu))

    model = SubstModel(datatype="nt", name="JC69", n_classes=1)
    eng = LikelihoodEngine(nucleic, model, dtype=jnp.float64)
    p_sw = parsimony_score(eng, topo)
    p_rand = parsimony_score(
        eng, Topology.random(nucleic.n_otu, rng))
    assert p_sw < p_rand
    # golden ML tree scores 847; greedy addition should land close
    assert p_sw < 1000


def test_no_five_branch_and_tol_plumbing(nucleic):
    """--no_five_branch must skip the closing NNI polish (cl.c case
    41) and --min_diff_lk_global must loosen the convergence window
    (case 17); both ride through ml_search.  A loose tol with the
    polish disabled converges in fewer rounds to a (possibly) lower
    lnl — the result must still be a valid tree with finite lnL, and
    a tight-tol run must be at least as good."""
    from phyml_tpu.search.driver import ml_search

    m = SubstModel(datatype="nt", name="GTR", n_classes=4)
    eng = LikelihoodEngine(nucleic, m, dtype=jnp.float64)
    p = m.init_params(nucleic.obs_state_freqs)
    topo0 = bionj_start(eng, p)
    topo_l, p_l, lnl_loose = ml_search(
        eng, m, dict(p), topo0.copy(), kind="spr", retries=0,
        tol=5.0, five_branch=False)
    assert np.isfinite(lnl_loose)
    assert topo_l.rooted().n_otu == nucleic.n_otu
    topo_t, p_t, lnl_tight = ml_search(
        eng, m, dict(p), topo0.copy(), kind="spr", retries=0)
    assert lnl_tight >= lnl_loose - 1e-6
