"""Bayesian tier tests: time-trees, priors, and MCMC correctness.

Strategy (the reference has none — built per SURVEY.md §4): unit-test
the prior densities against closed forms, validate the chronogram
machinery, and run short chains checking (a) the reference's own
runtime invariant — incrementally tracked lnL equals a from-scratch
recompute (≙ date.c:1013-1031 consistency asserts) — and (b) that
sampling under a constant-size coalescent prior with no data moves
heights while respecting feasibility.
"""

import numpy as np
import pytest


def _sim_alignment(tt, rng, n_sites=120, kappa=4.0):
    """Simulate nt data down the chronogram under HKY85, clock=1."""
    from phyml_tpu.evolve import simulate_alignment
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.topology import Topology

    # convert rooted tree to an unrooted Topology for the simulator
    # by suppressing the root node
    n = tt.n_otu
    par = tt.parent
    dt = tt.edge_durations()
    edges = []
    blen = []
    # map: tips keep ids; internal non-root keep ids (minus nothing)
    for u in range(tt.n_nodes - 1):
        p = par[u]
        if p == tt.root:
            continue
        edges.append((u, p))
        blen.append(dt[u])
    r0, r1 = tt.child[-1]
    edges.append((int(r0), int(r1)))
    blen.append(dt[r0] + dt[r1])
    topo = Topology(n, np.asarray(edges), np.asarray(blen))
    model = SubstModel(datatype="nt", name="HKY85", n_classes=1)
    params = model.init_params(np.full(4, 0.25))
    params["kappa"] = kappa
    from phyml_tpu.datatypes import encode_sequences
    from phyml_tpu.io.alignment import compact
    _, seqs = simulate_alignment(topo, model, params, n_sites, rng)
    return compact(encode_sequences(seqs, "nt"), list(tt.names), "nt")


def test_timetree_roundtrip_and_mrca():
    from phyml_tpu.bayes.chrono import TimeTree
    rng = np.random.default_rng(0)
    tt = TimeTree.coalescent(8, rng)
    tt.validate()
    dt = tt.edge_durations()
    assert dt[tt.root] == 0.0
    assert np.all(dt[:-1] >= 0)
    # MRCA of all tips is the root
    assert tt.mrca(list(range(8))) == tt.root
    # MRCA of a cherry is its parent
    c0, c1 = tt.child[0]
    if c0 < 8 and c1 < 8:
        assert tt.mrca([int(c0), int(c1)]) == 8
    nwk = tt.to_newick()
    assert nwk.endswith(";") and nwk.count("(") == 7


def test_from_topology_feasible():
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.topology import Topology
    rng = np.random.default_rng(1)
    topo = Topology.random(10, rng)
    tt = TimeTree.from_topology(topo, names=[f"t{i}" for i in range(10)])
    tt.validate()
    assert tt.heights[tt.root] == tt.heights.max()


def test_coalescent_prior_closed_form():
    """Constant-Ne Kingman density: for 3 contemporaneous tips with
    coalescences at t1 < t2, log p = -3 dt1/theta - dt2... computed
    directly: waiting k=3 over (0,t1) rate 3*2/2 * 2/theta = 6/theta,
    k=2 over (t1,t2) rate 2/theta; each coalescence adds
    log(2/theta)."""
    import jax.numpy as jnp
    from phyml_tpu.bayes.times import TimePrior
    theta = 2.5
    t1, t2 = 0.3, 1.1
    heights = jnp.asarray([0.0, 0.0, 0.0, t1, t2])
    prior = TimePrior(kind="coalescent")
    lp = float(prior.log_prior(heights, 3, {"theta": jnp.asarray(theta)}))
    expect = (-3.0 * (2.0 / theta) * t1
              - 1.0 * (2.0 / theta) * (t2 - t1)
              + 2 * np.log(2.0 / theta))
    assert lp == pytest.approx(expect, rel=1e-10)


def test_yule_vs_birthdeath_consistency():
    """Yule == birth-death with mu=0."""
    import jax.numpy as jnp
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.times import TimePrior
    rng = np.random.default_rng(2)
    tt = TimeTree.coalescent(6, rng)
    h = jnp.asarray(tt.heights)
    hy = {"birth": jnp.asarray(1.3)}
    hbd = {"birth": jnp.asarray(1.3), "death": jnp.asarray(0.0)}
    lp_y = float(TimePrior(kind="yule").log_prior(h, 6, hy))
    lp_bd = float(TimePrior(kind="birthdeath").log_prior(h, 6, hbd))
    assert lp_y == pytest.approx(lp_bd, rel=1e-8)


def test_birthdeath_conditioned_closed_form():
    """Reference TIMES_Lk_Birth_Death (times.c:1610): per non-root
    internal node at age t, lnL += log b + logp1(t) - log nut1(troot)
    with p1 from Yang & Rannala 1997 eq. 6 (rho=1), plus lgamma(n-1);
    death >= birth is hard-rejected (times.c:1634)."""
    import math

    import jax.numpy as jnp
    from phyml_tpu.bayes.times import TimePrior

    b, d = 2.0, 0.8
    t1, troot = 0.4, 1.0
    # 3 tips at height 0; internals at t1 and troot (root last)
    h = jnp.asarray([0.0, 0.0, 0.0, t1, troot])
    prior = TimePrior(kind="birthdeath")
    lp = float(prior.log_prior(
        h, 3, {"birth": jnp.asarray(b), "death": jnp.asarray(d)}))

    bmd = b - d
    logp1 = (2 * math.log(bmd) - bmd * t1
             - 2 * math.log(b - d * math.exp(-bmd * t1)))
    pt = bmd / (b - d * math.exp(-bmd * troot))
    nut1 = 1.0 - pt * math.exp(-bmd * troot)
    expect = (math.log(b) + logp1 - math.log(nut1)
              + math.lgamma(3 - 1))
    assert lp == pytest.approx(expect, rel=1e-10)

    # death > birth: reject, never evaluate garbage logs
    lp_bad = float(prior.log_prior(
        h, 3, {"birth": jnp.asarray(0.5), "death": jnp.asarray(2.0)}))
    assert lp_bad < -1e20


def test_fastlk_normal_approx_parity():
    """The --fastlk quadratic surface must match the exact lnL at the
    expansion point and to o(|db|^2) nearby (≙ Lk_Normal_Approx
    lk.c:2521 being trustworthy near the optimum)."""
    import jax.numpy as jnp
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.ops.likelihood import LikelihoodEngine, TreeArrays
    from phyml_tpu.optim.fastlk import fit_normal_approx
    from phyml_tpu.topology import Topology

    rng = np.random.default_rng(9)
    from phyml_tpu.bayes.chrono import TimeTree
    tt = TimeTree.coalescent(6, rng, theta=0.5)
    aln = _sim_alignment(tt, rng, n_sites=200)
    model = SubstModel(datatype="nt", name="HKY85", n_classes=1)
    engine = LikelihoodEngine(aln, model)
    params = model.init_params(aln.obs_state_freqs)

    h = tt.heights
    dt = h[tt.parent] - h
    dt[tt.root] = 0.0
    tree = TreeArrays(
        child=jnp.asarray(tt.child, dtype=jnp.int32),
        blen=jnp.asarray(np.maximum(dt, 1e-6), dtype=engine.dtype))
    na = fit_normal_approx(engine, params, tree, engine.weights)

    exact0 = float(engine._loglik(params, tree, engine.weights))
    assert float(na.loglik(tree.blen)) == pytest.approx(exact0,
                                                        abs=1e-4)
    db = 1e-3 * np.asarray(
        rng.standard_normal(engine.n_nodes), dtype=np.float32)
    db[-1] = 0.0
    b1 = tree.blen + jnp.asarray(np.abs(db))
    exact1 = float(engine._loglik(
        params, TreeArrays(child=tree.child, blen=b1),
        engine.weights))
    assert float(na.loglik(b1)) == pytest.approx(exact1, abs=0.05)


def test_mcmc_fastlk_chain():
    """A short fastlk chain runs, stays finite, and its cached lnL is
    the quadratic surface's value (the reference's --fastlk contract)."""
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.mcmc import MCMC, MCMCSettings
    from phyml_tpu.bayes.rates import RateModel
    from phyml_tpu.bayes.times import TimePrior
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.ops.likelihood import LikelihoodEngine

    rng = np.random.default_rng(13)
    tt = TimeTree.coalescent(5, rng, theta=0.4)
    aln = _sim_alignment(tt, rng, n_sites=100)
    model = SubstModel(datatype="nt", name="HKY85", n_classes=1)
    engine = LikelihoodEngine(aln, model)
    params = model.init_params(aln.obs_state_freqs)

    mcmc = MCMC(engine, model, params, tt,
                RateModel(kind="strict"), TimePrior(kind="coalescent"),
                MCMCSettings(n_iter=200, burnin=100, batch=50, seed=4),
                fastlk=True)
    st, trace, acc = mcmc.run()
    assert np.isfinite(trace[:, 0]).all()
    assert float(st.lnL) == pytest.approx(float(mcmc._lnL(st)),
                                          abs=1e-6)


def test_lognormal_rate_prior_mean_one():
    """The iid lognormal rate prior is the N(-nu^2/2, nu^2) density of
    log r — check against scipy-free closed form at a point."""
    import jax.numpy as jnp
    from phyml_tpu.bayes.rates import RateModel
    rm = RateModel(kind="lognormal")
    n_nodes = 5
    log_r = jnp.asarray([0.1, -0.2, 0.05, 0.3, 999.0])  # root slot last
    dt = jnp.ones(n_nodes)
    parent = jnp.asarray([4, 4, 4, 4, 4])
    nu = 0.4
    lp = float(rm.log_prior(log_r, dt, parent, jnp.asarray(nu), 4))
    mu = -0.5 * nu * nu
    z = (np.asarray(log_r[:4]) - mu) / nu
    expect = np.sum(-0.5 * (z * z + np.log(2 * np.pi)) - np.log(nu))
    assert lp == pytest.approx(expect, rel=1e-10)


def test_calibration_bounds():
    import jax.numpy as jnp
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.times import Calibration, TimePrior
    rng = np.random.default_rng(3)
    tt = TimeTree.coalescent(6, rng)
    root_h = tt.heights[tt.root]
    prior = TimePrior(kind="yule", calibrations=(
        Calibration(taxa=tuple(tt.names), lower=root_h * 0.5,
                    upper=root_h * 2.0),
    )).resolve(tt)
    h = jnp.asarray(tt.heights)
    assert float(prior.log_calibrations(h)) == 0.0
    bad = h.at[tt.root].set(root_h * 3.0)
    assert float(prior.log_calibrations(bad)) < -1e20


def test_mcmc_consistency_and_sampling():
    """Short real-data chain: cached lnL must equal a from-scratch
    recompute at the end (≙ date.c:1013 DEBUG assert); heights stay
    feasible; acceptance rates are sane; the clock posterior moves
    toward the simulated truth's scale."""
    import jax.numpy as jnp
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.mcmc import MCMC, MCMCSettings
    from phyml_tpu.bayes.rates import RateModel
    from phyml_tpu.bayes.times import TimePrior
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.ops.likelihood import LikelihoodEngine

    rng = np.random.default_rng(7)
    tt = TimeTree.coalescent(6, rng, theta=0.4)
    aln = _sim_alignment(tt, rng, n_sites=150)

    model = SubstModel(datatype="nt", name="HKY85", n_classes=1)
    engine = LikelihoodEngine(aln, model)
    params = model.init_params(aln.obs_state_freqs)

    mcmc = MCMC(engine, model, params, tt, RateModel(kind="lognormal"),
                TimePrior(kind="coalescent"),
                MCMCSettings(n_iter=400, burnin=200, batch=100,
                             seed=11))
    st, trace, acc = mcmc.run()

    # (a) incremental lnL == recompute
    lnL_re = float(mcmc._lnL(st))
    assert float(st.lnL) == pytest.approx(lnL_re, abs=1e-6)
    # (b) feasibility
    heights = np.asarray(st.heights)
    par = np.asarray(mcmc.parent)
    dt = heights[par] - heights
    dt[tt.root] = 0.0
    assert dt.min() >= -1e-9
    # (c) the chain moved and the posterior did not collapse
    assert np.isfinite(trace[:, 0]).all()
    assert trace[:, 0].std() > 0
    tried = acc[np.asarray(mcmc.move_w) > 0]
    assert np.all(tried <= 1.0)


def test_run_phytime_driver(tmp_path):
    """End-to-end driver: trace file written, chronogram parseable,
    summary fields populated."""
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.date import print_summary, run_phytime
    from phyml_tpu.bayes.mcmc import MCMCSettings
    from phyml_tpu.bayes.times import Calibration
    import io

    rng = np.random.default_rng(5)
    tt = TimeTree.coalescent(5, rng, theta=0.5)
    aln = _sim_alignment(tt, rng, n_sites=100)
    root_h = tt.heights[tt.root]
    res = run_phytime(
        aln, tt, rate_kind="strict", prior_kind="yule",
        calibrations=[Calibration(taxa=tuple(tt.names),
                                  lower=0.5 * root_h,
                                  upper=2.0 * root_h)],
        settings=MCMCSettings(n_iter=200, burnin=100, batch=50,
                              seed=3),
        trace_path=str(tmp_path / "trace.tsv"),
    )
    txt = (tmp_path / "trace.tsv").read_text()
    assert txt.startswith("iter\t")
    assert len(txt.splitlines()) > 5
    assert res.summary["root_height"] >= 0.5 * root_h - 1e-9
    assert res.summary["root_height"] <= 2.0 * root_h + 1e-9
    buf = io.StringIO()
    print_summary(res, out=buf)
    assert "chronogram" in buf.getvalue()


def test_calibrations_from_xml(tmp_path):
    from phyml_tpu.bayes.date import calibrations_from_xml
    xml = """<phytime>
      <clade id="c1"><taxon value="A"/><taxon value="B"/></clade>
      <calibration clade.id="c1"><lower>10</lower><upper>20</upper>
      </calibration>
    </phytime>"""
    p = tmp_path / "cal.xml"
    p.write_text(xml)
    cals = calibrations_from_xml(str(p))
    assert len(cals) == 1
    assert cals[0].taxa == ("A", "B")
    assert cals[0].lower == 10.0 and cals[0].upper == 20.0


def test_calibrated_yule_closed_form():
    """Single node, single combination: truncated-exponential density
    (≙ TIMES_Lk_Yule_Order_Root_Cond times.c:1526)."""
    import math

    import jax.numpy as jnp
    from phyml_tpu.bayes.invitee import yule_order_root_cond

    b = 1.7
    h1, hroot = 0.6, 2.0
    lo_b, hi_b = 0.2, 1.5
    heights = jnp.asarray([0.0, 0.0, 0.0, h1, hroot])
    lo = jnp.asarray([0.0, 0.0, 0.0, lo_b, 0.0])
    hi = jnp.asarray([np.inf, np.inf, np.inf, hi_b, np.inf])
    got = float(yule_order_root_cond(heights, 3, jnp.asarray(b), lo, hi))
    expect = (math.log(b) - b * h1
              - math.log(math.exp(-b * lo_b) - math.exp(-b * hi_b)))
    assert got == pytest.approx(expect, rel=1e-10)
    # outside the window: reject
    bad = heights.at[3].set(1.9)
    assert float(yule_order_root_cond(bad, 3, jnp.asarray(b), lo,
                                      hi)) < -1e20


def test_calibrated_yule_combination_mixture():
    """Two candidate clades for one calibration: the prior is the
    probability-weighted mixture over combinations
    (TIMES_Calib_Cond_Prob invitee.c:718)."""
    import jax.numpy as jnp
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.invitee import (
        CalibratedYule, CladeChoice, MultiCalibration,
    )

    rng = np.random.default_rng(21)
    tt = TimeTree.coalescent(6, rng)
    names = tt.names
    cal = MultiCalibration(
        choices=(CladeChoice(taxa=(names[0], names[1]), proba=0.7),
                 CladeChoice(taxa=(names[2], names[3]), proba=0.3)),
        lower=0.0, upper=float(tt.heights.max()) * 2,
    )
    cy = CalibratedYule(tt, (cal,))
    assert cy.n_combos == 2
    h = jnp.asarray(tt.heights)
    b = jnp.asarray(1.0)
    mix = float(cy.log_prior(h, b))
    # manual mixture from the per-combo densities
    from phyml_tpu.bayes.invitee import yule_order_root_cond
    v = [float(yule_order_root_cond(h, 6, b, cy.lo[i], cy.hi[i]))
         for i in range(2)]
    expect = np.log(0.7 * np.exp(v[0]) + 0.3 * np.exp(v[1]))
    assert mix == pytest.approx(expect, rel=1e-8)


def test_calibrated_yule_mcmc():
    """A short chain under the calibrated-Yule prior respects the
    calibration window and samples birth."""
    import jax.numpy as jnp
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.mcmc import MCMC, MCMCSettings
    from phyml_tpu.bayes.rates import RateModel
    from phyml_tpu.bayes.times import Calibration, TimePrior
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.ops.likelihood import LikelihoodEngine

    rng = np.random.default_rng(31)
    tt = TimeTree.coalescent(5, rng, theta=0.5)
    aln = _sim_alignment(tt, rng, n_sites=80)
    model = SubstModel(datatype="nt", name="HKY85", n_classes=1)
    engine = LikelihoodEngine(aln, model)
    params = model.init_params(aln.obs_state_freqs)
    root_h = float(tt.heights[tt.root])
    prior = TimePrior(kind="calibrated_yule", calibrations=(
        Calibration(taxa=tuple(tt.names), lower=0.5 * root_h,
                    upper=2.0 * root_h),))
    mcmc = MCMC(engine, model, params, tt, RateModel(kind="strict"),
                prior, MCMCSettings(n_iter=300, burnin=150, batch=75,
                                    seed=6))
    st, trace, acc = mcmc.run()
    assert np.isfinite(trace[:, 0]).all()
    h_root = float(st.heights[tt.root])
    assert 0.5 * root_h - 1e-9 <= h_root <= 2.0 * root_h + 1e-9
    assert float(st.lnL) == pytest.approx(float(mcmc._lnL(st)),
                                          abs=1e-6)


def test_mcmc_topology_moves_recover_true_tree():
    """Tree-moving chain (narrow exchange + time-SPR, ≙ mcmc.c's
    MCMC_Prune_Regraft family) started from a WRONG topology must
    recover the simulated one as the posterior mode on a 6-taxon
    problem with strong signal (VERDICT r2 item 6)."""
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.mcmc import MCMC, MCMCSettings
    from phyml_tpu.bayes.rates import RateModel
    from phyml_tpu.bayes.times import TimePrior
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.ops.likelihood import LikelihoodEngine

    rng = np.random.default_rng(12)
    tt_true = TimeTree.coalescent(6, rng, theta=0.6)
    aln = _sim_alignment(tt_true, rng, n_sites=600)

    def clades(child):
        """Set of tip-sets of the internal nodes (rooted clades)."""
        n = 6
        below = {t: frozenset([t]) for t in range(n)}
        out = set()
        for i in range(n - 1):
            c0, c1 = int(child[i, 0]), int(child[i, 1])
            below[n + i] = below[c0] | below[c1]
            out.add(below[n + i])
        return frozenset(out)

    true_clades = clades(tt_true.child)

    # wrong start: a different random coalescent tree over same tips
    rng2 = np.random.default_rng(99)
    tt_start = TimeTree.coalescent(6, rng2, theta=0.6)
    tt_start.names = list(tt_true.names)
    assert clades(tt_start.child) != true_clades

    model = SubstModel(datatype="nt", name="HKY85", n_classes=1)
    engine = LikelihoodEngine(aln, model)
    params = model.init_params(aln.obs_state_freqs)

    mcmc = MCMC(engine, model, params, tt_start,
                RateModel(kind="strict"), TimePrior(kind="coalescent"),
                MCMCSettings(n_iter=600, burnin=200, batch=100,
                             seed=3),
                sample_topology=True, topo_moves_per_batch=30)
    st, trace, acc = mcmc.run()

    assert mcmc.topo_accepts > 0
    # posterior mode over the sampled topologies = the true topology
    from collections import Counter
    post = Counter(clades(ch) for it, ch in mcmc.topo_samples
                   if it > 200)
    mode, n_mode = post.most_common(1)[0]
    assert mode == true_clades, (
        f"posterior mode != truth ({n_mode}/{sum(post.values())})")
    # chain-cached posterior must equal recompute after tree moves
    lnL_re = float(mcmc._lnL(st))
    assert float(st.lnL) == pytest.approx(lnL_re, abs=1e-6)
    # ESS report exists
    assert mcmc.ess["lnL"] > 1


def test_phytime_xml_example_runs(tmp_path):
    """The shipped phytime XML example must execute end-to-end via
    run_xml (DATE_XML date.c:37): trace, stats, chronogram written."""
    import shutil
    from phyml_tpu.io.xmlcfg import run_xml

    d = tmp_path / "pt"
    shutil.copytree("/root/reference/examples/phytime", d)
    rc = run_xml(str(d / "dating_example.xml"), quiet=True,
                 mcmc_iter_cap=120)
    assert rc == 0
    assert (d / "out_example_phyml_trace.txt").exists()
    assert (d / "out_example_chronogram.txt").exists()
    nwk = (d / "out_example_chronogram.txt").read_text()
    assert nwk.strip().endswith(";")


def test_phyrex_xml_example_runs(tmp_path):
    """The shipped phyrex flu example (36 taxa + coordinates) must
    execute end-to-end via run_xml (PHYREX_XML phyrex.c:37), jointly
    sampling the genealogy."""
    import shutil
    from phyml_tpu.io.xmlcfg import run_xml

    d = tmp_path / "px"
    shutil.copytree("/root/reference/examples/phyrex", d)
    rc = run_xml(str(d / "flu.xml"), quiet=True, mcmc_iter_cap=60)
    assert rc == 0
    stats = (d / "out_example_phyml_stats.txt").read_text()
    assert "root location" in stats
    assert (d / "out_example_phyml_trace.txt").exists()


def test_read_coordinates_substring_match():
    from phyml_tpu.io.xmlcfg import read_coordinates
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                     delete=False) as fh:
        fh.write("# state.name lon lat\n"
                 "|South_Carolina| -81.16 33.83\n"
                 "|Alabama| -86.90 32.31\n")
        p = fh.name
    try:
        xy = read_coordinates(
            p, ["CY1|South_Carolina|12_13|H1N1", "A|Alabama|x"])
        assert xy[0][0] == pytest.approx(-81.16)
        assert xy[1][1] == pytest.approx(32.31)
    finally:
        os.unlink(p)


def test_mcmc_checkpoint_resume(tmp_path):
    """A chain killed mid-run resumes from its checkpoint: state,
    iteration count, tuned steps, and PRNG key survive (green-field;
    reference checkpoint.c is an empty stub)."""
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.mcmc import MCMC, MCMCSettings
    from phyml_tpu.bayes.rates import RateModel
    from phyml_tpu.bayes.times import TimePrior
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.ops.likelihood import LikelihoodEngine

    rng = np.random.default_rng(17)
    tt = TimeTree.coalescent(5, rng, theta=0.5)
    aln = _sim_alignment(tt, rng, n_sites=100)
    model = SubstModel(datatype="nt", name="HKY85", n_classes=1)
    engine = LikelihoodEngine(aln, model)
    params = model.init_params(aln.obs_state_freqs)

    def make(n_iter):
        return MCMC(engine, model, params, tt,
                    RateModel(kind="strict"),
                    TimePrior(kind="coalescent"),
                    MCMCSettings(n_iter=n_iter, burnin=50, batch=50,
                                 seed=5))

    ck = str(tmp_path / "chain.npz")
    # run 100 iterations and checkpoint at the end
    m1 = make(100)
    st1, _, _ = m1.run(checkpoint_path=ck, checkpoint_every_s=0.0)
    assert (tmp_path / "chain.npz").exists()

    # "restart" with a longer target: resumes at 100, runs to 200
    m2 = make(200)
    st2, trace2, _ = m2.run(checkpoint_path=ck,
                            checkpoint_every_s=0.0)
    assert trace2.shape[0] == 100          # only the remaining 100
    lnL_re = float(m2._lnL(st2))
    assert float(st2.lnL) == pytest.approx(lnL_re, abs=1e-6)


@pytest.mark.slow
def test_phytime_mixing_ess(tmp_path):
    """ESS/1000 iterations on the shipped phytime example — the
    mixing-regression ratchet (VERDICT r3 #5 / r4 #5).

    History on the 4000-iter protocol: r3 measured posterior 0.85,
    lnL 0.89, root_height 1.21, log_clock 1.50; r4's move additions
    lifted these to ~2.2-3.0.  r5 adds the time-slice family, the
    covarion moves, weighted/root SPR variants and — the qualitative
    jump — a preconditioned MALA move over (all heights, clock,
    rates, substitution scalars) whose gradients flow through the
    likelihood scan (impossible in the autodiff-free C reference).
    Because ~half the catalog is now EXACTLY lnL-invariant (which
    deflates the lnL-series ESS artifactually) and the 4000-iter
    estimator has huge seed variance, the protocol moves to 8000
    iterations; r5 measures (seeds 1-3, after the time-slice
    Hastings fix): posterior 3.01-5.17, lnL 1.93-4.34, root_height
    2.55-4.12, log_clock 2.74-3.80.  Thresholds sit under the
    3-seed minimum so a mixing regression fails and seed noise does
    not."""
    import numpy as np

    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.date import run_phytime
    from phyml_tpu.bayes.diagnostics import ess_report
    from phyml_tpu.bayes.mcmc import MCMCSettings
    from phyml_tpu.io.alignment import read_alignment
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.ops.likelihood import LikelihoodEngine, tree_arrays
    from phyml_tpu.optim.blen import optimize_branch_lengths
    from phyml_tpu.search.bionj import bionj_start

    aln = read_alignment("/root/reference/examples/phytime/seq.txt",
                         datatype="nt")
    model = SubstModel(datatype="nt", name="HKY85", n_classes=4)
    eng = LikelihoodEngine(aln, model)
    p = model.init_params(aln.obs_state_freqs)
    topo = bionj_start(eng, p)
    ta = tree_arrays(topo.rooted(), dtype=eng.dtype)
    ta, _ = optimize_branch_lengths(eng, p, ta)
    topo.set_blen_from_rooted(topo.rooted(), np.asarray(ta.blen))
    tt = TimeTree.from_topology(topo, names=list(aln.names))
    res = run_phytime(
        aln, tt, model=model, rate_kind="lognormal",
        settings=MCMCSettings(n_iter=8000, burnin=2000, thin=1,
                              seed=1))
    ess = {k: v / 6.0
           for k, v in ess_report(res.trace,
                                  burnin_rows=2000).items()}
    assert ess["lnL"] >= 1.7, ess          # r5 band: 1.93-4.34
    assert ess["posterior"] >= 2.5, ess    # r5 band: 3.01-5.17
    assert ess["log_clock"] >= 2.0, ess    # r5 band: 2.74-3.80
    assert ess["root_height"] >= 2.0, ess  # r5 band: 2.55-4.12


def test_phytime_xml_mutmap(tmp_path):
    """mutmap="yes" on the XML root writes sampled substitution
    histories (the reference's mutmap path: phyrex.c ->
    ancestral.c:411; VERDICT r3 #9)."""
    import shutil
    from phyml_tpu.io.xmlcfg import run_xml

    d = tmp_path / "pt"
    shutil.copytree("/root/reference/examples/phytime", d)
    xml = (d / "dating_example.xml").read_text()
    xml = xml.replace('mutmap="no"', 'mutmap="yes"', 1)
    (d / "dating_example.xml").write_text(xml)
    rc = run_xml(str(d / "dating_example.xml"), quiet=True,
                 mcmc_iter_cap=60)
    assert rc == 0
    mm = d / "out_example_phyml_mutmap.txt"
    assert mm.exists()
    lines = mm.read_text().strip().splitlines()
    assert lines[0].startswith("#")
    # at least some substitutions sampled on a real dataset
    assert len(lines) > 10
    u, p, t, s_from, s_to = lines[1].split("\t")
    assert int(s_from) != int(s_to)
    assert float(t) >= 0
