"""Cross-validation tests (reference: cv.c).

The reference's CV is reachable only through the XML front end and a
commented-out evolve workbench; there is no CLI run to diff against.
Correctness is established by brute force: the batched leave-one-out
predictive distribution must equal the renormalized per-state site
likelihoods obtained by substituting each possible state at the cell.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from phyml_tpu.io.alignment import compact
from phyml_tpu.models.substitution import SubstModel
from phyml_tpu.ops.crossval import (
    kfold_col_cv, mask_cells, roc_points, tip_cv, tip_predictive_probs,
)
from phyml_tpu.ops.likelihood import LikelihoodEngine, tree_arrays
from phyml_tpu.topology import Topology


def _problem(n_otu=6, n_sites=30, seed=5, n_classes=2):
    rng = np.random.default_rng(seed)
    states = rng.integers(0, 4, size=(n_otu, n_sites))
    enc = np.zeros((n_otu, n_sites, 4))
    for i in range(n_otu):
        enc[i, np.arange(n_sites), states[i]] = 1.0
    aln = compact(enc, [f"t{i}" for i in range(n_otu)], "nt")
    topo = Topology.random(n_otu, rng, mean_blen=0.25)
    m = SubstModel(datatype="nt", name="HKY85", n_classes=n_classes)
    eng = LikelihoodEngine(aln, m, dtype=jnp.float64, pattern_pad=16)
    p = m.init_params(aln.obs_state_freqs)
    ta = tree_arrays(topo.rooted(), dtype=jnp.float64)
    return aln, topo, m, eng, p, ta


def test_tip_predictive_matches_brute_force():
    aln, topo, m, eng, p, ta = _problem()
    probs = tip_predictive_probs(eng, p, ta)

    # brute force: swap each state into the cell, renormalize the
    # per-pattern likelihood
    for (tax, pat) in [(0, 0), (3, 5), (5, aln.n_patterns - 1)]:
        cell_lk = np.zeros(4)
        for x in range(4):
            aln2 = mask_cells(aln, [])
            partials = np.array(aln.partials)
            partials[tax, pat, :] = 0.0
            partials[tax, pat, x] = 1.0
            aln2.partials = partials
            eng2 = LikelihoodEngine(aln2, m, dtype=jnp.float64,
                                    pattern_pad=16)
            site = np.asarray(eng2.site_logliks(p, ta))
            cell_lk[x] = site[pat]
        brute = np.exp(cell_lk - cell_lk.max())
        brute /= brute.sum()
        np.testing.assert_allclose(probs[tax, pat], brute,
                                   rtol=1e-8, atol=1e-12)


def test_tip_cv_outputs():
    aln, topo, m, eng, p, ta = _problem(seed=9)
    res = tip_cv(eng, p, ta)
    probs = res["probs"]
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-10)
    assert res["score"] < 0.0
    # truth entries are valid state ids for unambiguous data
    assert (res["truth"] >= 0).all()
    # predictive prob of truth should beat the uniform baseline
    assert res["score"] > np.log(0.25) * 3


def test_tip_cv_covarion_marginalizes():
    """Under covarion the predictive distribution must be over the 4
    observed states (hidden classes summed out)."""
    aln, topo, _, _, _, ta = _problem(seed=2)
    m = SubstModel(datatype="nt", name="HKY85", n_classes=1,
                   covarion=True)
    eng = LikelihoodEngine(aln, m, dtype=jnp.float64, pattern_pad=16)
    p = m.init_params(aln.obs_state_freqs)
    probs = tip_predictive_probs(eng, p, ta)
    assert probs.shape[-1] == 4
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-10)


def test_kfold_col_cv_runs():
    aln, topo, m, eng, p, ta = _problem(seed=4)
    total, per_fold = kfold_col_cv(
        eng, m, p, ta, n_folds=3,
        rng=np.random.default_rng(0), opt_blen=False,
    )
    assert len(per_fold) == 3
    assert np.isfinite(total) and total < 0.0
    assert abs(total - sum(per_fold)) < 1e-9


def test_roc_points():
    # needs data with real phylogenetic signal (iid-random columns
    # give a diagonal ROC): simulate along the tree
    from phyml_tpu.evolve import simulate_alignment
    from phyml_tpu.datatypes import encode_sequences

    rng = np.random.default_rng(12)
    topo = Topology.random(8, rng, mean_blen=0.15)
    m = SubstModel(datatype="nt", name="HKY85", n_classes=2)
    p = m.init_params(np.full(4, 0.25))
    names, seqs = simulate_alignment(topo, m, p, 60, rng)
    enc = encode_sequences(seqs, "nt")
    aln = compact(enc, names, "nt")
    eng = LikelihoodEngine(aln, m, dtype=jnp.float64, pattern_pad=16)
    p = m.init_params(aln.obs_state_freqs)
    ta = tree_arrays(topo.rooted(), dtype=jnp.float64)
    res = tip_cv(eng, p, ta)
    fpr, tpr = roc_points(res["probs"], res["truth"], n_thresholds=21)
    assert fpr[0] == 1.0 and tpr[0] == 1.0      # threshold 0
    assert fpr[-1] <= fpr[0] and tpr[-1] <= tpr[0]
    # informative classifier: TPR dominates FPR on average
    assert tpr.mean() > fpr.mean()
