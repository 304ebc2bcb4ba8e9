"""I/O layer tests: PHYLIP/FASTA/NEXUS parsing, newick round trips,
pattern compression invariants."""

import numpy as np
import pytest

from phyml_tpu import datatypes
from phyml_tpu.io.alignment import compact, read_alignment
from phyml_tpu.io.fasta import parse_fasta, write_fasta
from phyml_tpu.io.newick import leaf_names, parse_newick, write_newick
from phyml_tpu.io.phylip import parse_phylip, write_phylip
from phyml_tpu.topology import Topology


def test_phylip_nucleic(nucleic):
    assert nucleic.n_otu == 54
    assert nucleic.n_sites == 886
    # the reference finds 382 distinct patterns for this alignment
    assert nucleic.n_patterns == 382
    assert nucleic.weights.sum() == 886


def test_phylip_proteic(proteic):
    assert proteic.n_otu == 37
    assert proteic.n_sites == 547
    assert proteic.ns == 20


def test_empirical_freqs_match_reference(nucleic):
    # golden: reference Get_Base_Freqs on examples/nucleic
    # (tests/golden/nucleic_B_phyml_stats.txt)
    f = nucleic.obs_state_freqs
    assert np.allclose(
        f, [0.25229, 0.21152, 0.30687, 0.22932], atol=1e-4
    )


def test_phylip_roundtrip():
    names = ["alpha", "b", "ccc"]
    seqs = ["ACGTACGTACGT" * 8, "ACGTACGTTCGT" * 8, "ACG-ACGTACNT" * 8]
    text = write_phylip(names, seqs)
    n2, s2 = parse_phylip(text)
    assert n2 == names and s2 == seqs


def test_phylip_sequential():
    text = " 2 10\ntaxA ACGTA\nCGTAC\ntaxB TTTTT\nAAAAA\n"
    names, seqs = parse_phylip(text, interleaved=False)
    assert names == ["taxA", "taxB"]
    assert seqs == ["ACGTACGTAC", "TTTTTAAAAA"]


def test_fasta_roundtrip():
    names, seqs = ["x", "y"], ["ACGT" * 30, "TGCA" * 30]
    n2, s2 = parse_fasta(write_fasta(names, seqs))
    assert n2 == names and s2 == seqs


def test_nexus_dna(tmp_path):
    nx = tmp_path / "t.nxs"
    nx.write_text(
        "[ comment ]\n#NEXUS\nBEGIN DATA;\n"
        "DIMENSIONS NTAX=3 NCHAR=8;\n"
        "FORMAT DATATYPE=DNA MISSING=? GAP=-;\nMATRIX\n"
        "a ACGTACGT\nb ACGTACGA\nc AC-TACG?\n;\nEND;\n"
    )
    aln = read_alignment(str(nx))
    assert aln.n_otu == 3
    assert aln.n_sites == 8
    assert aln.datatype == "nt"


def test_newick_roundtrip():
    s = "((a:0.1,b:0.2)90:0.05,(c:0.3,d:0.4):0.06,e:0.5);"
    node = parse_newick(s)
    assert leaf_names(node) == ["a", "b", "c", "d", "e"]
    topo = Topology.from_newick(s, ["a", "b", "c", "d", "e"])
    topo.validate()
    out = topo.to_newick(["a", "b", "c", "d", "e"])
    topo2 = Topology.from_newick(out, ["a", "b", "c", "d", "e"])
    assert topo.rf_distance(topo2) == 0
    assert abs(topo.blen.sum() - topo2.blen.sum()) < 1e-9


def test_newick_rooted_input_unrooted():
    # bifurcating root must be suppressed into an unrooted topology
    s = "((a:0.1,b:0.2):0.05,(c:0.3,d:0.4):0.06);"
    topo = Topology.from_newick(s, ["a", "b", "c", "d"])
    topo.validate()
    assert topo.n_edges == 5
    # root edge length merged: 0.05 + 0.06
    assert abs(topo.blen.sum() - (0.1 + 0.2 + 0.3 + 0.4 + 0.11)) < 1e-12


def test_ambiguity_encoding():
    enc = datatypes.encode_sequences(["ARN-"], "nt")
    assert np.array_equal(enc[0, 0], [1, 0, 0, 0])
    assert np.array_equal(enc[0, 1], [1, 0, 1, 0])   # R = A|G
    assert np.array_equal(enc[0, 2], [1, 1, 1, 1])   # N
    assert np.array_equal(enc[0, 3], [1, 1, 1, 1])   # gap


def test_compact_weights_and_invariants():
    seqs = ["AAGA", "AAGA", "AACA"]
    enc = datatypes.encode_sequences(seqs, "nt")
    aln = compact(enc, ["a", "b", "c"], "nt")
    # patterns: (A,A,A) x2 ... sites 0,1,3 -> A pattern? site3: A,A,A same
    assert aln.n_patterns == 2
    assert sorted(aln.weights.tolist()) == [1.0, 3.0]
    # invariant state of the AAA pattern is A (index 0)
    inv = aln.invariant
    assert 0 in inv.tolist()


def test_invariant_requires_definite_state():
    # all-gap column is NOT invariant (Assign_State semantics)
    enc = datatypes.encode_sequences(["A-", "A-", "A-"], "nt")
    aln = compact(enc, ["a", "b", "c"], "nt")
    pat_allgap = aln.site_to_pattern[1]
    assert aln.invariant[pat_allgap] == -1
    assert aln.invariant[aln.site_to_pattern[0]] == 0


def test_site_weights_resample():
    rng = np.random.default_rng(0)
    enc = datatypes.encode_sequences(["ACGT", "ACGA"], "nt")
    aln = compact(enc, ["a", "b"], "nt")
    w = aln.resample_weights(rng)
    assert w.sum() == aln.n_sites


def test_evolve_cli(tmp_path, monkeypatch):
    """The evolve CLI (reference: the evolve binary, EVOLVE_Main
    evolve.c:16) simulates a coalescent tree + alignment and can
    re-simulate along the written tree."""
    from phyml_tpu.evolve import main
    from phyml_tpu.io.alignment import read_alignment
    from phyml_tpu.topology import Topology

    monkeypatch.chdir(tmp_path)
    rc = main(["--coalescent", "8", "--theta", "0.5", "-l", "120",
               "-m", "HKY85", "-o", "sim", "--r_seed", "7"])
    assert rc == 0
    aln = read_alignment(str(tmp_path / "sim.phy"), datatype="nt")
    assert aln.n_otu == 8 and aln.n_sites == 120
    topo = Topology.from_newick(
        (tmp_path / "sim_true_tree.txt").read_text(), aln.names)
    topo.validate()

    rc = main(["-u", "sim_true_tree.txt", "-l", "60", "-m", "JC69",
               "-o", "sim2", "--r_seed", "8"])
    assert rc == 0
    aln2 = read_alignment(str(tmp_path / "sim2.phy"), datatype="nt")
    assert aln2.n_sites == 60
