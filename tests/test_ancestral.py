"""Ancestral reconstruction: invariants + golden parity vs the
reference binary's --ancestral output (ancestral.c:527)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phyml_tpu.models.substitution import SubstModel
from phyml_tpu.ops.ancestral import (
    map_mutations, marginal_posteriors, mask_to_char, mpee_decode,
    sample_ancestral,
)
from phyml_tpu.ops.likelihood import LikelihoodEngine, tree_arrays
from phyml_tpu.topology import Topology

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def setup(nucleic, ref_tree_a):
    model = SubstModel(datatype="nt", name="HKY85", n_classes=4)
    eng = LikelihoodEngine(nucleic, model, dtype=jnp.float64)
    params = model.init_params(nucleic.obs_state_freqs)
    rv = ref_tree_a.rooted()
    ta = tree_arrays(rv, dtype=jnp.float64)
    return eng, model, params, rv, ta


def test_posteriors_normalized(setup, nucleic):
    eng, model, params, rv, ta = setup
    probs = marginal_posteriors(eng, params, ta)
    assert probs.shape == (eng.n_internal - 1, eng.P, 4)
    p = np.asarray(probs)[:, : nucleic.n_patterns, :]
    sums = p.sum(axis=-1)
    assert np.allclose(sums, 1.0, atol=1e-8)
    assert (p >= -1e-12).all()


def test_posterior_concentrates_on_cherry_state():
    # two identical tips joined by near-zero branches: the posterior
    # at their parent must concentrate on the shared tip state.
    rng = np.random.default_rng(0)
    topo = Topology.random(4, rng)
    topo.blen[:] = 1e-6
    from phyml_tpu.io.alignment import compact
    enc = np.zeros((4, 8, 4), dtype=np.float32)
    enc[:, :, 2] = 1.0                     # all tips state G
    aln = compact(enc, ["a", "b", "c", "d"], "nt")
    model = SubstModel(datatype="nt", name="JC69", n_classes=1)
    eng = LikelihoodEngine(aln, model, dtype=jnp.float64)
    ta = tree_arrays(topo.rooted(), dtype=jnp.float64)
    probs = np.asarray(marginal_posteriors(
        eng, model.init_params(), ta))[:, : aln.n_patterns]
    assert (probs[:, :, 2] > 0.999).all()


def test_mpee_unambiguous_and_uniform():
    p = np.array([0.97, 0.01, 0.01, 0.01])
    assert mpee_decode(p) == 0b1000
    assert mask_to_char(0b1000, "nt") == "A"
    # exactly uniform probs: all ambiguity levels tie at (ns-1)/ns and
    # the reference's strict-< argmin keeps level 0 (MPEE_Score
    # ancestral.c:1014-1021) -> single top-sorted state
    u = np.full(4, 0.25)
    assert mpee_decode(u) == 0b1000
    assert mask_to_char(0b1111, "nt") == "X"
    # two dominant states -> 2-state ambiguity set
    p2 = np.array([0.49, 0.49, 0.01, 0.01])
    m = int(mpee_decode(p2))
    assert m == 0b1100
    assert mask_to_char(m, "nt") == "M"   # A or C


def test_joint_sampling_matches_marginals(setup, nucleic):
    eng, model, params, rv, ta = setup
    probs = np.asarray(marginal_posteriors(eng, params, ta))
    node_row, pat = 3, 0
    draws = []
    for s in range(40):
        _, states = sample_ancestral(eng, params, ta,
                                     jax.random.PRNGKey(s))
        draws.append(int(np.asarray(states)[eng.n_otu + node_row, pat]))
    freq = np.bincount(draws, minlength=4) / len(draws)
    assert np.abs(freq - probs[node_row, pat]).max() < 0.25


def test_map_mutations_endpoint_consistency(setup):
    eng, model, params, rv, ta = setup
    cls, states = sample_ancestral(eng, params, ta, jax.random.PRNGKey(7))
    rng = np.random.default_rng(1)
    events = map_mutations(eng, params, ta, cls, states, rng,
                           sites=np.arange(3))
    states = np.asarray(states)
    blen = np.asarray(ta.blen)
    # replaying each (node, site)'s events from the parent state must
    # land on the node's sampled state
    child = np.asarray(ta.child)
    parent = {}
    for i in range(eng.n_internal):
        parent[int(child[i, 0])] = eng.n_otu + i
        parent[int(child[i, 1])] = eng.n_otu + i
    bykey = {}
    for (u, p, t, s_from, s_to) in events:
        assert 0.0 < t <= blen[u] + 1e-12
        bykey.setdefault((u, p), []).append((t, s_from, s_to))
    for u in range(eng.n_nodes - 1):
        for p in range(3):
            s = int(states[parent[u], p])
            for (t, s_from, s_to) in sorted(bykey.get((u, p), [])):
                assert s_from == s
                s = s_to
            assert s == int(states[u, p])


REF_ANC = os.path.join(GOLDEN, "nucleic_H_ancestral_seq.txt")


@pytest.mark.skipif(not os.path.exists(REF_ANC),
                    reason="golden ancestral file not generated")
def test_golden_parity_marginals(nucleic, ref_tree_a):
    """Reference: phyml -i nucleic -m HKY85 -c 1 -u refA -o r
    --ancestral -b 0 --no_memory_check --leave_duplicates -t 4.0.
    Node labels are mapped between implementations via bipartitions
    of the two ancestral trees."""
    from phyml_tpu.io.newick import parse_newick_labeled

    model = SubstModel(datatype="nt", name="HKY85", n_classes=1,
                       freqs_mode="empirical")
    eng = LikelihoodEngine(nucleic, model, dtype=jnp.float64)
    params = model.init_params(nucleic.obs_state_freqs)
    params["kappa"] = jnp.asarray(4.0)
    rv = ref_tree_a.rooted()
    ta = tree_arrays(rv, dtype=jnp.float64)
    probs = np.asarray(marginal_posteriors(eng, params, ta))

    # ours: rooted internal index -> clade (tip name frozenset)
    child = np.asarray(ta.child)
    clades_ours = {}
    n = eng.n_otu

    def clade(u):
        if u < n:
            return frozenset([nucleic.names[u]])
        i = u - n
        return clades_ours.setdefault(
            u, clade(int(child[i, 0])) | clade(int(child[i, 1])))

    all_tips = frozenset(nucleic.names)
    ours_by_clade = {}
    for i in range(eng.n_internal - 1):
        c = clade(n + i)
        ours_by_clade[min(c, all_tips - c, key=sorted)] = i

    # reference ancestral tree: label -> clade
    with open(os.path.join(GOLDEN, "nucleic_H_ancestral_tree.txt")) as fh:
        ref_clades = parse_newick_labeled(fh.read())

    # reference table: site, label -> probs
    ref = {}
    with open(REF_ANC) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 7 and parts[0].isdigit():
                site, label = int(parts[0]), parts[1]
                ref[(site, label)] = np.array(
                    [float(x) for x in parts[2:6]])

    s2p = nucleic.site_to_pattern
    n_checked = 0
    for label, cset in ref_clades.items():
        key = min(cset, all_tips - cset, key=sorted)
        if key not in ours_by_clade:
            continue
        row = ours_by_clade[key]
        for site in (1, 100, 443, 886):
            if (site, label) not in ref:
                continue
            ours = probs[row, s2p[site - 1]]
            assert np.abs(ours - ref[(site, label)]).max() < 1e-4, (
                f"site {site} label {label}: {ours} vs {ref[(site, label)]}"
            )
            n_checked += 1
    assert n_checked >= 100
