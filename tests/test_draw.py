"""Tree drawing tests (reference: draw.c)."""

import numpy as np

from phyml_tpu.io.draw import ascii_tree, tree_layout, write_postscript
from phyml_tpu.topology import Topology


def test_layout_geometry():
    rng = np.random.default_rng(1)
    topo = Topology.random(12, rng, mean_blen=0.2)
    xs, ys, order, rv = tree_layout(topo, [f"t{i}" for i in range(12)])
    n = 12
    # x is the cumulative branch length from the root
    for i in range(n - 1):
        u = n + i
        for c in (int(rv.child[i, 0]), int(rv.child[i, 1])):
            assert abs(xs[c] - xs[u] - max(rv.node_blen[c], 0)) < 1e-12
    # tips occupy distinct integer rows
    assert sorted(ys[:n]) == list(range(n))
    # internal y between its children's
    for i in range(n - 1):
        u = n + i
        c0, c1 = int(rv.child[i, 0]), int(rv.child[i, 1])
        assert min(ys[c0], ys[c1]) <= ys[u] <= max(ys[c0], ys[c1])


def test_postscript_well_formed(tmp_path):
    rng = np.random.default_rng(2)
    topo = Topology.random(7, rng)
    names = [f"sp (x{i})" for i in range(7)]  # needs escaping
    p = write_postscript(str(tmp_path / "t.ps"), topo, names)
    text = open(p).read()
    assert text.startswith("%!PS-Adobe-3.0")
    assert text.rstrip().endswith("%%EOF")
    assert text.count("showpage") == 1
    # every tip name rendered, parens escaped
    assert text.count(r"\(") == 7 and text.count(r"\)") == 7
    # connectors: one 3-segment path per (internal node, child)
    assert text.count("newpath") == 2 * (7 - 1) + 1  # + scale bar


def test_ascii_tree_contains_all_names():
    rng = np.random.default_rng(3)
    topo = Topology.random(9, rng)
    names = [f"taxon_{i}" for i in range(9)]
    art = ascii_tree(topo, names)
    for nm in names:
        assert nm in art
