"""Continuous-trait (PhyREX Gaussian stack) tests.

Oracles: brute-force multivariate-normal densities built by composing
the exact per-edge (A, Q) transitions into the full joint covariance
of all node states — validating the scan-based pruning the same way
the reference validates MCMC moves against full recomputes
(date.c:1013).  BM pruning is checked against the closed-form
3-taxon contrast density and against sigma^2-profile consistency.
"""

import numpy as np
import pytest


def _np_transition(kind, dt, s2, theta=1.0):
    if kind == "ibm":
        A = np.array([[1.0, dt], [0.0, 1.0]])
        Q = s2 * np.array([[dt ** 3 / 3, dt ** 2 / 2],
                           [dt ** 2 / 2, dt]])
    elif kind == "iwn":
        A = np.array([[1.0, 0.0], [0.0, 0.0]])
        Q = s2 * np.array([[dt * dt, dt], [dt, 1.0]])
    elif kind == "iou":
        th = theta
        e = np.exp(-th * dt)
        A = np.array([[1.0, (1 - e) / th], [0.0, e]])
        q22 = s2 / (2 * th) * (1 - e ** 2)
        q12 = s2 / (2 * th ** 2) * (1 - e) ** 2
        q11 = s2 / th ** 2 * (dt - 2 * (1 - e) / th
                              + (1 - e ** 2) / (2 * th))
        Q = np.array([[q11, q12], [q12, q22]])
    return A, Q


def _brute_tip_loglik(kind, tt, tip_x, s2, theta=1.0, root_var=1e6):
    """Exact N(0, Sigma_xx) log-density of tip positions from the full
    joint state covariance (root ~ N(0, root_var I))."""
    n = tt.n_otu
    par = tt.parent
    dt = tt.edge_durations()
    N = tt.n_nodes
    # joint covariance over all node states, dimension-independent
    # (each of the D coordinates is iid)
    cov = {}  # (u, v) -> 2x2 Cov(s_u, s_v)
    order = [tt.root] + [u for u in range(N - 1)][::-1]
    # process parents before children: nodes in decreasing id works
    # because children have lower ids than parents in postorder layout
    Sigma = np.zeros((N, 2, 2))
    Sigma[tt.root] = root_var * np.eye(2)
    X = {}  # cross-covs: Cov(s_u, s_w) for w ancestors handled via A
    Amat = np.zeros((N, 2, 2))
    for u in range(N - 1):
        Amat[u], _ = _np_transition(kind, dt[u], s2, theta)
    for u in range(N - 2, -1, -1):
        A, Q = _np_transition(kind, dt[u], s2, theta)
        Sigma[u] = A @ Sigma[par[u]] @ A.T + Q

    def path_to_root(u):
        p = [u]
        while p[-1] != tt.root:
            p.append(int(par[p[-1]]))
        return p

    def cross(u, v):
        pu, pv = path_to_root(u), path_to_root(v)
        anc = next(x for x in pu if x in set(pv))

        def comp(path):
            # s_u = (A_{u} A_{par(u)} ... A_{child-of-anc}) s_anc + noise
            M = np.eye(2)
            for x in reversed(path[:path.index(anc)]):
                M = Amat[x] @ M
            return M

        return comp(pu) @ Sigma[anc] @ comp(pv).T

    H = np.array([1.0, 0.0])
    S = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            C = Sigma[i] if i == j else cross(i, j)
            S[i, j] = H @ C @ H
    D = tip_x.shape[1]
    sign, ld = np.linalg.slogdet(S)
    Sinv = np.linalg.inv(S)
    quad = sum(tip_x[:, d] @ Sinv @ tip_x[:, d] for d in range(D))
    return -0.5 * (quad + D * ld + D * n * np.log(2 * np.pi))


def test_brownian_three_taxon_closed_form():
    import jax.numpy as jnp
    from phyml_tpu.bayes.traits import brownian_loglik
    # ((A:v1,B:v2):v3,C:v4) rooted; contrasts density closed form
    child = jnp.asarray([[0, 1], [3, 2]], dtype=jnp.int32)
    v = np.array([0.3, 0.5, 0.0, 0.7, 0.2])  # per-node edge variance
    x = np.array([[1.0], [2.0], [-0.5]])
    lp = float(brownian_loglik(jnp.asarray(x), child, jnp.asarray(v)))
    # contrast 1: A-B ~ N(0, v1+v2); node 3 mean w/ var v1v2/(v1+v2)+v3
    v12 = v[0] + v[1]
    c1 = -0.5 * ((x[0, 0] - x[1, 0]) ** 2 / v12
                 + np.log(2 * np.pi * v12))
    m3 = (v[1] * x[0, 0] + v[0] * x[1, 0]) / v12
    v3 = v[0] * v[1] / v12 + v[3]
    vC = v[2]
    vt = v3 + vC
    c2 = -0.5 * ((m3 - x[2, 0]) ** 2 / vt + np.log(2 * np.pi * vt))
    assert lp == pytest.approx(c1 + c2, rel=1e-12)


def test_rrw_reduces_to_rw_at_unit_scalers():
    import jax.numpy as jnp
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.traits import (brownian_loglik, location_loglik,
                                        rrw_scaler_log_prior)
    rng = np.random.default_rng(0)
    tt = TimeTree.coalescent(7, rng)
    dt = jnp.asarray(tt.edge_durations())
    x = jnp.asarray(rng.normal(size=(7, 2)))
    child = jnp.asarray(tt.child, dtype=jnp.int32)
    s2 = 0.8
    zeros = jnp.zeros(tt.n_nodes)
    lp_rw = float(location_loglik("rw", x, child, dt, s2))
    lp_rrw = float(location_loglik("rrw", x, child, dt, s2,
                                   log_scalers=zeros,
                                   nu=jnp.asarray(0.5)))
    prior = float(rrw_scaler_log_prior(zeros, jnp.asarray(0.5),
                                       tt.root))
    assert lp_rrw - prior == pytest.approx(lp_rw, rel=1e-10)


@pytest.mark.parametrize("kind", ["ibm", "iwn", "iou"])
def test_integrated_marginal_vs_bruteforce(kind):
    """Pruning loglik differences across sigma^2 (and theta) must
    match the brute-force joint-Gaussian oracle."""
    import jax.numpy as jnp
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.traits import IntegratedModel
    rng = np.random.default_rng(3)
    tt = TimeTree.coalescent(6, rng, theta=1.0)
    # simulate tip positions FROM the model so magnitudes are sane
    # (implausible data inflates |lnL| and hence fp error)
    par, dt0 = tt.parent, tt.edge_durations()
    states = np.zeros((tt.n_nodes, 2, 2))
    for u in range(tt.n_nodes - 2, -1, -1):
        A, Q = _np_transition(kind, dt0[u], 1.0, 1.3)
        L = np.linalg.cholesky(Q + 1e-13 * np.eye(2))
        for d in range(2):
            states[u, d] = A @ states[par[u], d] + L @ rng.normal(size=2)
    x = states[:6, :, 0]
    child = jnp.asarray(tt.child, dtype=jnp.int32)
    dt = jnp.asarray(tt.edge_durations())
    mdl = IntegratedModel(kind=kind)
    # moderate root variance: a diffuse 1e5 root makes S's condition
    # number ~1e13 (tiny cherry variances vs the shared root term) and
    # BOTH the pruning and the oracle hit their fp64 limit
    rv = 10.0

    def ours(s2, th=1.3):
        return float(mdl.marginal_loglik(
            jnp.asarray(x), child, dt, s2, theta=th, root_var=rv))

    def ref(s2, th=1.3):
        return _brute_tip_loglik(kind, tt, x, s2, theta=th,
                                 root_var=rv)

    # proper likelihood: absolute agreement with the joint-Gaussian
    # oracle at several parameter values
    for s2 in (0.5, 2.0):
        assert ours(s2) == pytest.approx(ref(s2), rel=1e-6, abs=1e-6)
    if kind == "iou":
        assert ours(1.0, 2.5) == pytest.approx(ref(1.0, 2.5),
                                               rel=1e-6, abs=1e-6)


def test_transition_logpdf_consistency():
    """Augmented-state scoring: density of simulated states is finite
    and maximized near the generating sigma^2."""
    import jax.numpy as jnp
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.traits import IntegratedModel
    rng = np.random.default_rng(9)
    tt = TimeTree.coalescent(8, rng)
    dt = tt.edge_durations()
    par = tt.parent
    mdl = IntegratedModel(kind="ibm")
    s2_true = 1.2
    states = np.zeros((tt.n_nodes, 2, 2))  # [node, D, (x,v)]
    for u in range(tt.n_nodes - 2, -1, -1):
        A, Q = _np_transition("ibm", dt[u], s2_true)
        L = np.linalg.cholesky(Q + 1e-14 * np.eye(2))
        for d in range(2):
            states[u, d] = A @ states[par[u], d] + L @ rng.normal(size=2)
    child = jnp.asarray(tt.child, dtype=jnp.int32)
    lps = {s2: float(mdl.transition_logpdf(
        jnp.asarray(states), child, jnp.asarray(dt), s2))
        for s2 in (0.1, 1.2, 12.0)}
    assert np.isfinite(list(lps.values())).all()
    assert lps[1.2] > lps[0.1] and lps[1.2] > lps[12.0]


@pytest.mark.parametrize("kind", ["ibm", "iou", "iwn"])
def test_posterior_state_samples_recovery(kind):
    """Exact smoother (VERDICT r4 #8, ≙ velocity.c:64/:213): latent
    velocities simulated forward from the model are recovered by
    posterior_state_samples — posterior means track the truth and the
    truth sits inside the posterior spread."""
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.traits import posterior_state_samples

    rng = np.random.default_rng(7)
    n = 24
    tt = TimeTree.coalescent(n, rng, theta=1.0)
    par, dt0 = tt.parent, tt.edge_durations()
    D = 2
    s2 = 1.0
    states = np.zeros((tt.n_nodes, D, 2))
    for u in range(tt.n_nodes - 2, -1, -1):
        A, Q = _np_transition(kind, max(dt0[u], 1e-9), s2, 1.0)
        L = np.linalg.cholesky(Q + 1e-13 * np.eye(2))
        for d in range(D):
            states[u, d] = A @ states[par[u], d] + L @ rng.normal(size=2)
    tip_x = states[:n, :, 0]

    smp, mean, sd = posterior_state_samples(
        kind, tip_x, tt.child, dt0, s2, n_samples=256,
        rng=np.random.default_rng(11))
    # observed tip positions are reproduced exactly
    assert np.allclose(smp[:, :n, :, 0], tip_x[None], atol=1e-8)

    if kind == "iwn":
        # velocity on each edge is DETERMINED by the end positions
        v_true = np.zeros((tt.n_nodes, D))
        for u in range(tt.n_nodes - 1):
            v_true[u] = (states[u, :, 0] - states[par[u], :, 0]) \
                / max(dt0[u], 1e-12)
        # tip-adjacent edges whose parent is internal: posterior mean
        # velocity correlates with truth strongly
        vm = mean[:n, :, 1].ravel()
        vt = v_true[:n].ravel()
    else:
        vm = mean[:n, :, 1].ravel()
        vt = states[:n, :, 1].ravel()
    r = np.corrcoef(vm, vt)[0, 1]
    assert r > 0.6, (kind, r)
    # calibration: |truth - mean| within 4 posterior sd for ~all tips
    z = np.abs(vt - vm) / np.maximum(sd[:n, :, 1].ravel(), 1e-9)
    assert np.mean(z < 4.0) > 0.9, (kind, np.mean(z < 4.0))


def test_posterior_samples_match_marginal_covariance():
    """The smoother's implied tip-position covariance equals the
    marginal-likelihood construction's (same T/G/Sigma algebra)."""
    import jax.numpy as jnp

    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.traits import (
        IntegratedModel, posterior_state_samples,
    )

    rng = np.random.default_rng(3)
    tt = TimeTree.coalescent(5, rng, theta=1.0)
    dt0 = tt.edge_durations()
    x = rng.normal(size=(5, 1))
    # internal positions drawn by the smoother must average near the
    # exact conditional mean under many draws (law of large numbers)
    smp1, mean1, _ = posterior_state_samples(
        "ibm", x, tt.child, dt0, 1.0, n_samples=4000,
        rng=np.random.default_rng(1))
    smp2, mean2, _ = posterior_state_samples(
        "ibm", x, tt.child, dt0, 1.0, n_samples=4000,
        rng=np.random.default_rng(2))
    emp1 = smp1[:, 5:, 0, 0].mean(axis=0)
    assert np.allclose(emp1, mean1[5:, 0, 0], atol=0.2)
    # the returned moments are EXACT (independent of the draws)
    assert np.allclose(mean1, mean2, atol=1e-9)


def test_run_phyrex_ibm_velocity_traces():
    """run_phyrex(trait_kind='ibm') returns velocity traces with an
    ESS report (iid draws: ESS ~ draw count)."""
    import jax.numpy as jnp

    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.mcmc import MCMCSettings
    from phyml_tpu.bayes.phyrex import run_phyrex
    from phyml_tpu.evolve import simulate_alignment, write_phylip
    from phyml_tpu.io.alignment import read_alignment
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.topology import Topology
    import os
    import tempfile

    rng = np.random.default_rng(5)
    n = 8
    tt = TimeTree.coalescent(n, rng, theta=1.0)
    topo = Topology.random(n, rng, mean_blen=0.1)
    m = SubstModel(datatype="nt", name="JC69", n_classes=1)
    p = m.init_params()
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "a.phy")
        names, seqs = simulate_alignment(topo, m, p, 120, rng)
        write_phylip(path, names, seqs)
        aln = read_alignment(path, datatype="nt")
    tt.names = list(aln.names)
    coords = rng.normal(size=(n, 2))
    res = run_phyrex(aln, coords, tt, trait_kind="ibm",
                     settings=MCMCSettings(n_iter=60, burnin=20,
                                           batch=20, seed=1))
    assert res.velocity_samples is not None
    S = res.velocity_samples.shape[0]
    assert res.velocity_mean.shape == (2 * n - 1, 2)
    assert res.summary["n_velocity_samples"] == S
    assert res.summary["velocity_ess"] > 0.5 * S
    # ancestral locations now filled for integrated models
    assert np.isfinite(res.anc_locations).all()
