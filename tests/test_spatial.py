"""SLFV event-disk model (slfv.c) and discrete-landscape competition
phylogeography (geo.c) tests: closed-form single-event checks plus
simulator/MCMC smoke coverage."""

import numpy as np
import pytest
from scipy.stats import norm


def _one_disk_state():
    """2 tips, one disk at h=1 hitting both (their parent is node 2)."""
    from phyml_tpu.bayes.slfv import SLFVState
    coord = np.array([[1.0, 1.0], [3.0, 1.0], [2.0, 2.0]])
    return SLFVState(
        n_otu=2,
        coord=coord,
        h_node=np.array([0.0, 0.0, 1.0]),
        parent=np.array([2, 2, -1]),
        h_disk=np.array([1.0]),
        centr=np.array([[2.0, 1.0]]),
        hit=np.array([2]),
    )


def test_slfv_loglik_closed_form():
    from phyml_tpu.bayes.slfv import SLFVParams, slfv_loglik

    st = _one_disk_state()
    p = SLFVParams(lbda=0.7, mu=0.4, rad=1.5,
                   lim_lo=(0.0, 0.0), lim_up=(5.0, 4.0))
    got = float(slfv_loglik(st, p))

    # hand computation, mirroring SLFV_Lk_Gaussian_Core slfv.c:711 +
    # TIMES_Lk_SLFV times.c:2751
    c = np.array([2.0, 1.0])
    expect = 0.0
    for x in (st.coord[0], st.coord[1]):       # both lineages hit
        d2 = np.sum((x - c) ** 2)
        expect += np.log(p.mu) - d2 / (2 * p.rad ** 2)
    # parent location ~ trunc normal per dim around the center
    for d in range(2):
        z = (st.coord[2, d] - c[d]) / p.rad
        lo = (p.lim_lo[d] - c[d]) / p.rad
        up = (p.lim_up[d] - c[d]) / p.rad
        expect += (norm.logpdf(z) - np.log(p.rad)
                   - np.log(norm.cdf(up) - norm.cdf(lo)))
    # disk center uniform over the habitat
    expect += -np.log(5.0) - np.log(4.0)
    # Poisson event times: 1 event over total span 1.0
    expect += np.log(p.lbda) - p.lbda * 1.0
    assert got == pytest.approx(expect, rel=1e-8)


def test_slfv_reject_outside_habitat():
    from phyml_tpu.bayes.slfv import SLFVParams, slfv_loglik
    st = _one_disk_state()
    p = SLFVParams(lim_lo=(0.0, 0.0), lim_up=(2.5, 4.0))  # tip 1 outside
    assert float(slfv_loglik(st, p)) < -1e20


def test_slfv_simulate_and_mcmc():
    from phyml_tpu.bayes.slfv import (
        SLFVParams, simulate_slfv, slfv_loglik, slfv_param_mcmc,
        state_to_timetree,
    )
    rng = np.random.default_rng(2)
    p = SLFVParams(lbda=1.0, mu=0.8, rad=2.5,
                   lim_lo=(0.0, 0.0), lim_up=(6.0, 6.0))
    st = simulate_slfv(5, p, rng)
    assert st.n_otu == 5
    assert (st.parent >= 0).sum() == st.n_ldsk - 1
    lnl = float(slfv_loglik(st, p))
    assert np.isfinite(lnl)
    # the generating parameters should not be wildly beaten by a
    # broken likelihood: check the chain runs and stays finite
    p_fit, trace = slfv_param_mcmc(st, SLFVParams(
        lbda=0.5, mu=0.5, rad=1.0, lim_lo=p.lim_lo, lim_up=p.lim_up),
        n_iter=300, seed=1)
    assert np.isfinite(trace[:, 0]).all()
    assert trace[-1, 0] >= trace[0, 0] - 5.0
    # genealogy extraction: binary merges -> TimeTree
    tt = state_to_timetree(st)
    tt.validate()


def _tiny_timetree():
    """3 tips at 0; node 3 at 0.5 joins (0, 1); root 4 at 1.0."""
    from phyml_tpu.bayes.chrono import TimeTree
    return TimeTree(
        n_otu=3,
        child=np.array([[0, 1], [3, 2]]),
        heights=np.array([0.0, 0.0, 0.0, 0.5, 1.0]),
        names=["a", "b", "c"],
    )


def test_geo_loglik_closed_form():
    from phyml_tpu.bayes.geo import GeoModel

    tt = _tiny_timetree()
    coords = np.array([[0.0, 0.0], [1.0, 0.0]])
    tip_loc = np.array([0, 1, 0])
    gm = GeoModel(coords, tt, tip_loc)
    sigma, lbda, tau = 0.8, 0.3, 1.2
    # internal: node 3 -> loc 0, root 4 -> loc 0
    got = float(gm.loglik(np.array([0, 0]), sigma, lbda, tau))

    # hand computation (GEO_Lk geo.c:682): root split (dep 0) sends
    # the arrival to loc 0 (child 3 inherits 0, child 2 has 0 ->
    # arr = 0); occupancy during slice (1.0, 0.5): {0: 2}.
    L = 2
    f = np.exp(-np.array([[0.0, 1.0], [1.0, 0.0]])
               / (2 * sigma ** 2)) / L
    occ = np.array([2, 0])
    lbda_j = np.where(occ > 0, lbda, 1.0)
    r = f * lbda_j[None, :] * tau
    R = (r * occ[:, None]).sum()
    # node 3 event: dep = 0, children (0 -> loc0 inherits, 1 -> loc1)
    expect = -R * (1.0 - 0.5) + np.log(r[0, 1])
    assert got == pytest.approx(expect, rel=1e-8)


def test_geo_infeasible_labeling_rejected():
    from phyml_tpu.bayes.geo import GeoModel
    tt = _tiny_timetree()
    coords = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]])
    tip_loc = np.array([0, 1, 0])
    gm = GeoModel(coords, tt, tip_loc)
    # node 3's location (2) matches neither child (0, 1): reject
    assert float(gm.loglik(np.array([2, 0]), 1.0, 1.0, 1.0)) < -1e20


def test_geo_mcmc_runs():
    from phyml_tpu.bayes.chrono import TimeTree
    from phyml_tpu.bayes.geo import GeoModel
    rng = np.random.default_rng(7)
    tt = TimeTree.coalescent(8, rng)
    coords = rng.random((4, 2)) * 3.0
    tip_loc = rng.integers(0, 4, size=8)
    gm = GeoModel(coords, tt, tip_loc)
    s, lb, ta, iloc, trace = gm.mcmc(n_iter=400, seed=3)
    assert np.isfinite(trace[:, 0]).all()
    assert s > 0 and lb > 0 and ta > 0
    # labeling stayed feasible
    assert float(gm.loglik(iloc, s, lb, ta)) > -1e20
