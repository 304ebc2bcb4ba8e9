"""Partitioned (multi-gene) analysis tests (≙ mixt.c partition chains
scored by MIXT_Lk mixt.c:730 and assembled from <partitionelem> XML)."""

import numpy as np
import pytest


def _two_partitions(n_otu=8, seed=0):
    """Simulate two genes down the SAME topology under different
    models; return (topo_true, [(aln, model, params)])."""
    from phyml_tpu.datatypes import encode_sequences
    from phyml_tpu.evolve import simulate_alignment
    from phyml_tpu.io.alignment import compact
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.topology import Topology

    rng = np.random.default_rng(seed)
    topo = Topology.random(n_otu, rng, mean_blen=0.12)
    names = [f"t{i}" for i in range(n_otu)]
    out = []
    for k, (name, n_sites) in enumerate((("HKY85", 400), ("GTR", 300))):
        model = SubstModel(datatype="nt", name=name, n_classes=1)
        params = model.init_params(np.full(4, 0.25))
        if name == "HKY85":
            params["kappa"] = 6.0
        _, seqs = simulate_alignment(topo, model, params, n_sites, rng)
        aln = compact(encode_sequences(seqs, "nt"), names, "nt")
        out.append((aln, model, params))
    return topo, out


def test_joint_loglik_is_sum():
    import jax.numpy as jnp
    from phyml_tpu.ops.likelihood import LikelihoodEngine, tree_arrays
    from phyml_tpu.search.partitioned import Partition, joint_loglik

    topo, gens = _two_partitions()
    parts, singles = [], []
    for aln, model, params in gens:
        eng = LikelihoodEngine(aln, model, dtype=jnp.float64)
        params = model.init_params(aln.obs_state_freqs)
        parts.append(Partition(eng, model, params))
        ta = tree_arrays(topo.rooted(), dtype=eng.dtype)
        singles.append(float(eng.loglik(params, ta)))
    tot = joint_loglik(parts, [topo, topo])
    assert tot == pytest.approx(sum(singles), abs=1e-6)


def test_partitioned_search_recovers_topology():
    """Start from a random wrong tree; the combined-likelihood search
    must reach (or beat) the generating topology's joint lnL, with all
    partition copies structurally identical."""
    import jax.numpy as jnp
    from phyml_tpu.ops.likelihood import LikelihoodEngine
    from phyml_tpu.search.partitioned import (
        Partition, joint_loglik, partitioned_search,
    )
    from phyml_tpu.topology import Topology

    topo_true, gens = _two_partitions(n_otu=7, seed=3)
    parts = []
    for aln, model, _ in gens:
        eng = LikelihoodEngine(aln, model, dtype=jnp.float64)
        parts.append(Partition(eng, model,
                               model.init_params(aln.obs_state_freqs)))

    rng = np.random.default_rng(99)
    topo0 = Topology.random(7, rng)
    topos, parts2, lnl = partitioned_search(parts, topo0, search="NNI",
                                            max_outer=6)
    # identical structure across partitions
    for t in topos[1:]:
        assert t.rf_distance(topos[0]) == 0
    # per-partition lengths actually differ (unlinked lengths)
    assert not np.allclose(topos[0].blen, topos[1].blen)
    # joint lnL at least as good as the true-topology baseline
    base = joint_loglik(parts2, [topo_true] * len(parts2))
    assert lnl >= base - 0.5
    assert topos[0].rf_distance(topo_true) == 0


def test_reorder_taxa():
    from phyml_tpu.search.partitioned import reorder_taxa
    topo, gens = _two_partitions(n_otu=5, seed=1)
    aln = gens[0][0]
    names2 = list(reversed(aln.names))
    out = reorder_taxa(aln, names2)
    assert out.names == names2
    assert np.array_equal(out.partials[0], aln.partials[-1])
    with pytest.raises(ValueError):
        reorder_taxa(aln, ["x"] * aln.n_otu)


def test_xml_two_partitions(tmp_path):
    """End-to-end: a two-<partitionelem> XML runs the combined search
    and writes per-partition stats naming the combined lnL."""
    from phyml_tpu.evolve import write_phylip
    from phyml_tpu.io.xmlcfg import run_xml

    topo, gens = _two_partitions(n_otu=6, seed=5)
    files = []
    for k, (aln, model, params) in enumerate(gens):
        # write back the simulated data as phylip
        p = tmp_path / f"gene{k}.phy"
        # reconstruct sequences from site patterns via site_to_pattern
        states = "ACGT"
        seqs = []
        for i in range(aln.n_otu):
            pat = aln.partials[i][aln.site_to_pattern]
            idx = pat.argmax(axis=1)
            amb = pat.sum(axis=1) > 1
            seqs.append("".join(
                "N" if amb[j] else states[idx[j]]
                for j in range(pat.shape[0])))
        write_phylip(str(p), aln.names, seqs)
        files.append(p.name)

    xml = f"""<phyml run.id="pp" output.file="joint">
      <topology><instance id="T1" init.tree="bionj" search="nni"
                optimise.tree="yes"/></topology>
      <ratematrices><instance id="M1" model="HKY85"/>
                    <instance id="M2" model="GTR"/></ratematrices>
      <siterates><instance id="R1" init.value="1.0"/>
        <weights family="gamma" alpha="1.0"/></siterates>
      <equfreqs><instance id="F1" freqs="empirical"/></equfreqs>
      <branchlengths><instance id="L1" optimise.lens="yes"/>
                     <instance id="L2" optimise.lens="yes"/>
      </branchlengths>
      <partitionelem file.name="{files[0]}" data.type="nt"
                     interleaved="no">
        <mixtureelem list="T1"/>
        <mixtureelem list="M1"/>
        <mixtureelem list="F1"/>
        <mixtureelem list="R1"/>
        <mixtureelem list="L1"/>
      </partitionelem>
      <partitionelem file.name="{files[1]}" data.type="nt"
                     interleaved="no">
        <mixtureelem list="T1"/>
        <mixtureelem list="M2"/>
        <mixtureelem list="F1"/>
        <mixtureelem list="R1"/>
        <mixtureelem list="L2"/>
      </partitionelem>
    </phyml>"""
    xml_path = tmp_path / "joint.xml"
    xml_path.write_text(xml)
    assert run_xml(str(xml_path), quiet=True) == 0
    stats1 = (tmp_path / "joint_part1_phyml_stats.txt").read_text()
    stats2 = (tmp_path / "joint_part2_phyml_stats.txt").read_text()
    assert "Combined log-likelihood" in stats1
    assert "Combined log-likelihood" in stats2
    t1 = (tmp_path / "joint_part1_phyml_tree.txt").read_text()
    t2 = (tmp_path / "joint_part2_phyml_tree.txt").read_text()
    assert t1.strip().endswith(";") and t2.strip().endswith(";")
