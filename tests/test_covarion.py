"""Covarion (M4) model tests.

The covarion feature is bit-rotted in the reference release: the
`--cov*` CLI options fail to compile under -DM4 (cl.c:709 references a
removed s_opt field, cl.c:710 assigns a double to a scalar_dbl*), the
CLI never allocates m4mod (only the interactive menu does,
interface.c:114), and the menu flow calls M4_Init_Model before
M4_Make_Complete has allocated its arrays (interface.c:116-118) - so
no front end of the shipped reference can actually run it.  Parity is
therefore established at the construction level: `ref_m4_qmat` below
is a literal transcription of M4_Update_Qmat (m4.c:324-523) +
Update_Qmat_Generic (models.c:430-482), and the likelihood is checked
against an independent brute-force expm pruning.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from phyml_tpu.models.covarion import (
    m4_exchangeabilities, m4_hidden_system,
)
from phyml_tpu.models.substitution import SubstModel
from phyml_tpu.ops.likelihood import LikelihoodEngine, tree_arrays
from phyml_tpu.topology import Topology


def generic_qmat(rr_upper, pi):
    """Update_Qmat_Generic (models.c:430): q_ij = rr_ij * pi_j,
    normalized to mean rate 1; rr given as a symmetric matrix."""
    ns = len(pi)
    q = rr_upper * pi[None, :]
    np.fill_diagonal(q, 0.0)
    np.fill_diagonal(q, -q.sum(axis=1))
    mr = -np.sum(pi * np.diag(q))
    return q / mr


def ref_m4_qmat(E, o_fq, h_fq, multipl, delta):
    """Literal transcription of M4_Update_Qmat (m4.c:324-523)."""
    n_o, n_h = len(o_fq), len(h_fq)
    n_s = n_o * n_h

    o_mat = generic_qmat(E, o_fq)          # m4.c:434
    pi = np.array([o_fq[i % n_o] * h_fq[i // n_o] for i in range(n_s)])

    q = np.zeros((n_s, n_s))
    # diagonal blocks (m4.c:448-461)
    for i in range(n_s):
        for j in range(i + 1, n_s):
            if j // n_o == i // n_o:
                q[i, j] = o_mat[i % n_o, j % n_o] * multipl[i // n_o]
                q[j, i] = q[i, j] * o_fq[i % n_o] / o_fq[j % n_o]
    # observed-substitution normalization (m4.c:463-474)
    mr = sum(
        q[i].sum() * o_fq[i % n_o] * h_fq[i // n_o] for i in range(n_s)
    )
    q /= mr
    # switching blocks (m4.c:479-504)
    h_mat = generic_qmat(np.ones((n_h, n_h)), h_fq) * delta
    for i in range(n_s):
        for j in range(i + 1, n_s):
            if j // n_o != i // n_o and i % n_o == j % n_o:
                q[i, j] = h_mat[i // n_o, j // n_o]
                q[j, i] = q[i, j] * h_fq[i // n_o] / h_fq[j // n_o]
    np.fill_diagonal(q, 0.0)
    np.fill_diagonal(q, -q.sum(axis=1))
    return q, pi


def our_m4_qmat(E, o_fq, h_fq, multipl, delta):
    S, pi = m4_exchangeabilities(
        jnp.asarray(E), jnp.asarray(o_fq), jnp.asarray(h_fq),
        jnp.asarray(multipl), jnp.asarray(delta),
    )
    S, pi = np.asarray(S), np.asarray(pi)
    q = S * pi[None, :]
    np.fill_diagonal(q, 0.0)
    np.fill_diagonal(q, -q.sum(axis=1))
    return q, pi


CASES = [
    # (o_fq, h_fq, multipl, delta, kappa)
    (np.array([0.29, 0.18, 0.26, 0.27]), np.full(3, 1 / 3),
     np.array([0.0, 1.0, 2.0]), 1.0, 4.0),
    (np.array([0.25, 0.25, 0.25, 0.25]), np.array([0.6, 0.4]),
     np.array([0.3, 2.05]), 0.37, 2.0),
    (np.array([0.4, 0.1, 0.2, 0.3]), np.array([0.2, 0.3, 0.5]),
     np.array([0.1, 0.7, 1.54]), 3.3, 7.5),
]


@pytest.mark.parametrize("o_fq,h_fq,multipl,delta,kappa", CASES)
def test_m4_qmat_matches_reference_construction(
    o_fq, h_fq, multipl, delta, kappa
):
    E = np.ones((4, 4))
    E[0, 2] = E[2, 0] = kappa
    E[1, 3] = E[3, 1] = kappa
    q_ref, pi_ref = ref_m4_qmat(E, o_fq, h_fq, multipl, delta)
    q_our, pi_our = our_m4_qmat(E, o_fq, h_fq, multipl, delta)
    np.testing.assert_allclose(pi_our, pi_ref, rtol=1e-12)
    np.testing.assert_allclose(q_our, q_ref, rtol=1e-10, atol=1e-14)
    # reversibility w.r.t. pi (what makes the eigh path valid)
    flux = pi_ref[:, None] * q_ref
    np.testing.assert_allclose(flux, flux.T, rtol=1e-9, atol=1e-13)
    # stationarity
    np.testing.assert_allclose(pi_ref @ q_ref, 0.0, atol=1e-12)


def test_m4_hidden_defaults():
    """Plain --cov: multipl = [0..n_h-1], h_fq uniform
    (M4_Init_Model init.c:6433-6436)."""
    m = SubstModel(datatype="nt", name="HKY85", n_classes=1,
                   covarion=True)
    p = m.init_params(np.full(4, 0.25))
    h_fq, multipl = m4_hidden_system(m, p)
    np.testing.assert_allclose(np.asarray(h_fq), 1 / 3)
    np.testing.assert_allclose(np.asarray(multipl), [0.0, 1.0, 2.0])
    assert m.ns == 12 and m.obs_ns == 4


def _random_problem(n_otu=6, n_sites=40, seed=7):
    from phyml_tpu.io.alignment import compact
    rng = np.random.default_rng(seed)
    states = rng.integers(0, 4, size=(n_otu, n_sites))
    enc = np.zeros((n_otu, n_sites, 4))
    for i in range(n_otu):
        enc[i, np.arange(n_sites), states[i]] = 1.0
    aln = compact(enc, [f"t{i}" for i in range(n_otu)], "nt")
    topo = Topology.random(n_otu, rng, mean_blen=0.3)
    return aln, topo


def _brute_force_lnl(aln, topo, q, pi, rates, wts):
    """Independent pruning: scipy expm per branch, python recursion."""
    from scipy.linalg import expm
    rv = topo.rooted()
    n = aln.n_otu
    tips = aln.partials  # [n_otu, P, ns_obs]
    ns = q.shape[0]
    reps = ns // tips.shape[2]
    tips = np.tile(tips, (1, 1, reps))  # [n_otu, P, ns]

    total = 0.0
    P_pat = aln.n_patterns
    site_l = np.zeros((len(rates), P_pat))
    for c, (r, w) in enumerate(zip(rates, wts)):
        pmats = [expm(q * r * t) for t in rv.node_blen]

        def below(u):
            if u < n:
                return tips[u]  # [P, ns]
            c0, c1 = rv.child[u - n]
            l0 = below(c0) @ pmats[c0].T
            l1 = below(c1) @ pmats[c1].T
            return l0 * l1

        root = 2 * n - 2
        lroot = below(root)
        site_l[c] = lroot @ pi
    mix = (np.asarray(wts)[:, None] * site_l).sum(axis=0)
    total = float(np.sum(np.log(mix) * aln.weights))
    return total


def test_m4_lnl_vs_brute_force():
    aln, topo = _random_problem()
    m = SubstModel(datatype="nt", name="HKY85", n_classes=2,
                   covarion=True)
    eng = LikelihoodEngine(aln, m, dtype=jnp.float64, pattern_pad=16)
    p = m.init_params(aln.obs_state_freqs)
    p["cov_delta"] = jnp.asarray(0.8)
    ta = tree_arrays(topo.rooted(), dtype=jnp.float64)
    ours = float(eng.loglik(p, ta))

    lam, V, Vinv, pi, w, _ = m.class_system(p, fold_rates=False)
    q = np.asarray(V[0]) @ np.diag(np.asarray(lam[0])) @ np.asarray(Vinv[0])
    from phyml_tpu.models.rates import discrete_gamma
    rates, wts = discrete_gamma(p["alpha"], 2)
    brute = _brute_force_lnl(aln, topo, q, np.asarray(pi[0]),
                             np.asarray(rates), np.asarray(wts))
    assert abs(ours - brute) < 1e-8, (ours, brute)


def test_m4_delta_zero_equals_rate_mixture():
    """With delta=0 the hidden classes never switch: the model is
    exactly a mixture over hidden classes with weights h_fq and rates
    multipl (normalized), here [0,1,2]/1 with uniform weights - i.e.
    a FreeRate-style 3-class mixture of the same HKY process."""
    aln, topo = _random_problem(seed=11)
    ta = tree_arrays(topo.rooted(), dtype=jnp.float64)

    m_cov = SubstModel(datatype="nt", name="HKY85", n_classes=1,
                       covarion=True)
    eng_cov = LikelihoodEngine(aln, m_cov, dtype=jnp.float64,
                               pattern_pad=16)
    p_cov = m_cov.init_params(aln.obs_state_freqs)
    p_cov["cov_delta"] = jnp.asarray(0.0)
    lnl_cov = float(eng_cov.loglik(p_cov, ta))

    m_mix = SubstModel(datatype="nt", name="HKY85", n_classes=3,
                       freerate=True)
    eng_mix = LikelihoodEngine(aln, m_mix, dtype=jnp.float64,
                               pattern_pad=16)
    p_mix = m_mix.init_params(aln.obs_state_freqs)
    # freerate_normalize: rates = exp(raw)/sum(w*exp(raw)); want
    # [0, 1, 2] -> use raws log([eps, 1, 2]) with uniform weights
    eps = 1e-12
    raw = np.log(np.array([eps, 1.0, 2.0]))
    p_mix["class_rates_raw"] = jnp.asarray(raw)
    p_mix["class_weights_raw"] = jnp.zeros(3)
    lnl_mix = float(eng_mix.loglik(p_mix, ta))
    assert abs(lnl_cov - lnl_mix) < 1e-6, (lnl_cov, lnl_mix)


def test_m4_optimization_improves():
    """Round-optimize the covarion params; lnL must go up and the
    run must stay finite (exercises the cov_delta Brent slot)."""
    from phyml_tpu.optim.round import optimize_scalars
    aln, topo = _random_problem(seed=3)
    m = SubstModel(datatype="nt", name="HKY85", n_classes=1,
                   covarion=True, cov_mode="alpha",
                   optimize_alpha=False)
    eng = LikelihoodEngine(aln, m, dtype=jnp.float64, pattern_pad=16)
    p = m.init_params(aln.obs_state_freqs)
    ta = tree_arrays(topo.rooted(), dtype=jnp.float64)
    lnl0 = float(eng.loglik(p, ta))
    p2, lnl1 = optimize_scalars(eng, m, p, ta)
    assert np.isfinite(lnl1) and lnl1 >= lnl0


def test_m4_hidden_class_decode(tmp_path):
    """Hidden-class posterior decode (M4_Post_Prob_H_Class_Edge_Site
    m4.c:679, VERDICT r3 #9): per-node per-site class posteriors sum
    to one, and the decode report file is written."""
    from phyml_tpu.ops.ancestral import (
        m4_class_posteriors, write_m4_decode,
    )

    aln, topo = _random_problem()
    m = SubstModel(datatype="nt", name="HKY85", n_classes=1,
                   covarion=True, n_hidden=3)
    eng = LikelihoodEngine(aln, m, dtype=jnp.float64, pattern_pad=16)
    p = m.init_params(aln.obs_state_freqs)
    ta = tree_arrays(topo.rooted(), dtype=jnp.float64)

    post = m4_class_posteriors(eng, p, ta)
    assert post.shape == (eng.n_internal, eng.P, 3)
    real = np.asarray(post)[:, :aln.n_patterns, :]
    assert np.allclose(real.sum(axis=-1), 1.0, atol=1e-8)
    assert np.all(real >= -1e-12)

    out = tmp_path / "decode.txt"
    write_m4_decode(str(out), eng, p, ta)
    lines = out.read_text().strip().splitlines()
    # header x2 + one row per SITE
    assert len(lines) == 2 + aln.weights.sum()

    # a non-covarion model must be rejected
    m2 = SubstModel(datatype="nt", name="HKY85", n_classes=2)
    e2 = LikelihoodEngine(aln, m2, dtype=jnp.float64, pattern_pad=16)
    with pytest.raises(ValueError):
        m4_class_posteriors(e2, m2.init_params(aln.obs_state_freqs),
                            ta)
