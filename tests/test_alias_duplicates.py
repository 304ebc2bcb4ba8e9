"""Subpattern aliasing (Alias_Subpatt utilities.c:13528) and
duplicate-taxon removal/reinsertion (Remove_Duplicates
utilities.c:2675, Insert_Duplicates main.c:389)."""

import numpy as np


def _toy_aln(seqs, names=None):
    from phyml_tpu.datatypes import encode_sequences
    from phyml_tpu.io.alignment import compact

    names = names or [f"t{i}" for i in range(len(seqs))]
    return compact(encode_sequences(seqs, "nt"), names, "nt")


def test_subpattern_ids_match_bruteforce():
    from phyml_tpu.ops.alias import subpattern_ids, tip_pattern_codes
    from phyml_tpu.topology import Topology

    rng = np.random.default_rng(5)
    seqs = ["".join(rng.choice(list("ACGT-"), 40)) for _ in range(6)]
    aln = _toy_aln(seqs)
    topo = Topology.random(6, rng)
    rv = topo.rooted()
    codes = tip_pattern_codes(aln)
    ids = subpattern_ids(codes, rv.child)

    # brute force: per node, the tuple of tip codes inside the subtree
    n = aln.n_otu
    members = {u: [u] for u in range(n)}
    for i, (c0, c1) in enumerate(np.asarray(rv.child)):
        members[n + i] = members[int(c0)] + members[int(c1)]
    for u, tips in members.items():
        sub = codes[sorted(tips)]               # [k, P]
        for p in range(aln.n_patterns):
            for q in range(aln.n_patterns):
                same_ids = ids[u, p] == ids[u, q]
                same_sub = bool((sub[:, p] == sub[:, q]).all())
                assert same_ids == same_sub, (u, p, q)


def test_alias_stats_report(nucleic):
    from phyml_tpu.ops.alias import alias_stats

    rng = np.random.default_rng(0)
    from phyml_tpu.topology import Topology
    topo = Topology.random(nucleic.n_otu, rng)
    rep = alias_stats(nucleic, topo.rooted().child)
    # near the leaves most patterns alias: redundancy strictly > 1
    assert rep.redundancy > 1.0
    assert "redundancy" in str(rep)


def test_alias_compaction_roundtrip():
    from phyml_tpu.ops.alias import alias_compaction

    ids = np.asarray([0, 1, 0, 2, 1, 0], dtype=np.int32)
    first, inv = alias_compaction(ids)
    assert list(ids[first][inv]) == list(ids)
    vals = np.asarray([10.0, 20.0, 30.0])       # one per unique id
    full = vals[inv]
    assert list(full) == [10.0, 20.0, 10.0, 30.0, 20.0, 10.0]


def test_find_and_drop_duplicates():
    from phyml_tpu.io.alignment import drop_taxa, find_duplicate_taxa

    seqs = ["ACGTACGT", "ACGAACGA", "ACGTACGT", "TTGTACGA",
            "ACGAACGA", "CCGTACGT"]
    aln = _toy_aln(seqs)
    pairs = find_duplicate_taxa(aln)
    assert (2, 0) in pairs and (4, 1) in pairs and len(pairs) == 2
    red = drop_taxa(aln, [d for d, _ in pairs])
    assert red.n_otu == 4
    assert red.names == ["t0", "t1", "t3", "t5"]
    assert red.n_sites == aln.n_sites


def test_without_leaves_prunes_and_renumbers():
    from phyml_tpu.topology import Topology

    rng = np.random.default_rng(1)
    topo = Topology.random(8, rng, mean_blen=0.2)
    pruned = topo.without_leaves({2, 5})
    assert pruned.n_otu == 6
    pruned.validate()
    # total length shrinks exactly by the two pendant edges (merged
    # internal edges keep summed length)
    adj = topo.adjacency()
    drop_pend = sum(topo.blen[adj[t][0][1]] for t in (2, 5))
    # pruning can suppress internal nodes; total = old - pendants
    assert np.isclose(pruned.blen.sum(), topo.blen.sum() - drop_pend)


def test_duplicate_roundtrip_likelihood(tmp_path):
    """End-to-end: dup removal must not change the reduced-tree lnL,
    and reinsertion restores all taxa at zero distance."""
    from phyml_tpu.io.newick import (
        insert_duplicate_leaves, leaf_names, parse_newick,
    )

    nwk = "((a:0.1,b:0.2):0.05,(c:0.1,d:0.3):0.02,e:0.4);"
    out = insert_duplicate_leaves(nwk, [("x", "b"), ("y", "b"),
                                        ("z", "e")])
    got = sorted(leaf_names(parse_newick(out)))
    assert got == ["a", "b", "c", "d", "e", "x", "y", "z"]
    assert ":0.20000000" in out          # b's pendant length preserved


def test_duplicate_reinsertion_keeps_support_labels():
    """Reinsertion must preserve internal support labels (bootstrap /
    aLRT values written as internal-node labels); the reference's
    Insert_Duplicates does (round-2 advisor finding)."""
    from phyml_tpu.io.newick import insert_duplicate_leaves

    nwk = "((a:0.1,b:0.2)0.97:0.05,(c:0.1,d:0.3)0.42:0.02,e:0.4);"
    out = insert_duplicate_leaves(nwk, [("x", "b")])
    assert "0.97" in out
    assert "0.42" in out
