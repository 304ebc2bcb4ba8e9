"""End-to-end CLI runs against golden reference outputs."""

import os
import shutil

import numpy as np
import pytest

from phyml_tpu.cli import main

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
EXAMPLES = "/root/reference/examples"


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    shutil.copy(os.path.join(EXAMPLES, "nucleic"), tmp_path)
    shutil.copy(os.path.join(GOLDEN, "ref_tree_A.nwk"), tmp_path)
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _stats_value(path, key):
    with open(path) as fh:
        for line in fh:
            if key in line:
                return float(line.split()[-1])
    raise KeyError(key)


def test_cli_fixed_tree_eval(workdir):
    # golden A: JC69, no optimization -> -6172.70828
    rc = main(["-i", "nucleic", "-d", "nt", "-m", "JC69", "-c", "1",
               "-u", "ref_tree_A.nwk", "-b", "0", "-o", "n",
               "--quiet", "--r_seed", "1"])
    assert rc == 0
    lnl = _stats_value(workdir / "nucleic_phyml_stats.txt",
                       "Log-likelihood:")
    assert abs(lnl - (-6172.70828)) < 5e-3
    pars = _stats_value(workdir / "nucleic_phyml_stats.txt",
                        "Parsimony:")
    assert pars == 847  # golden A stats


def test_cli_lr_optimization(workdir):
    # golden D: HKY85+G4, -o lr, kappa/alpha estimated -> -5432.64350
    rc = main(["-i", "nucleic", "-d", "nt", "-m", "HKY85", "-c", "4",
               "-a", "e", "-t", "e", "-u", "ref_tree_A.nwk",
               "-b", "0", "-o", "lr", "--quiet", "--r_seed", "1",
               "--run_id", "D"])
    assert rc == 0
    stats = workdir / "nucleic_D_phyml_stats.txt"
    lnl = _stats_value(stats, "Log-likelihood:")
    assert lnl >= -5432.64350 - 5e-3
    assert lnl <= -5432.0
    assert abs(_stats_value(stats, "Parsimony:") - 847) < 0.5


def test_cli_abayes_supports(workdir):
    rc = main(["-i", "nucleic", "-d", "nt", "-m", "HKY85", "-c", "4",
               "-u", "ref_tree_A.nwk", "-b", "-5", "-o", "lr",
               "--quiet", "--r_seed", "1", "--run_id", "AB"])
    assert rc == 0
    with open(workdir / "nucleic_AB_phyml_tree.txt") as fh:
        tree_text = fh.read()
    # supports appear as labels after ')'
    assert ")0." in tree_text or ")1." in tree_text


def test_cli_site_lnl_dump(workdir, nucleic):
    rc = main(["-i", "nucleic", "-d", "nt", "-m", "JC69", "-c", "1",
               "-u", "ref_tree_A.nwk", "-b", "0", "-o", "n",
               "--quiet", "--r_seed", "1", "--print_site_lnl",
               "--run_id", "S"])
    assert rc == 0
    # compare per-site lnLs to the reference dump (golden A)
    ours = {}
    with open(workdir / "nucleic_S_phyml_lk.txt") as fh:
        next(fh)
        for line in fh:
            i, v = line.split()
            ours[int(i)] = float(v)
    ref = {}
    with open(os.path.join(GOLDEN, "nucleic_A_phyml_lk.txt")) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2 and parts[0].isdigit():
                # reference dumps P(D|M), not the log
                ref[int(parts[0])] = np.log(float(parts[1]))
    common = set(ours) & set(ref)
    assert len(common) == 886
    diffs = [abs(ours[i] - ref[i]) for i in common]
    assert max(diffs) < 1e-3


def test_cli_xml_lg4x(tmp_path, monkeypatch):
    xml = open(os.path.join(EXAMPLES, "lg4x", "lg4x.xml")).read()
    xml = xml.replace("../examples/lg4x",
                      os.path.join(EXAMPLES, "lg4x"))
    xml = xml.replace("../examples/proteic",
                      os.path.join(EXAMPLES, "proteic"))
    p = tmp_path / "lg4x.xml"
    p.write_text(xml)
    monkeypatch.chdir(tmp_path)
    rc = main(["--xml", str(p), "-i", "ignored", "--quiet"])
    assert rc == 0
    stats = tmp_path / "lg4x.tests_phyml_stats.txt"
    lnl = _stats_value(stats, "Log-likelihood:")
    # reference on ITS OWN BioNJ tree reaches -12323.74; ours uses an
    # ML-distance BioNJ tree (topology fixed by the XML), so only
    # sanity-bound here; same-topology parity is covered elsewhere
    assert -12500 < lnl < -12300


def test_trace_outputs(tmp_path):
    """--print_trace / --json_trace write improvement snapshots
    (io.c fp_out_trace + JSON_Tree_Io io.c:6737)."""
    import json
    import shutil

    import numpy as np
    from phyml_tpu.cli import main
    from phyml_tpu.evolve import simulate_alignment, write_phylip
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.topology import Topology

    rng = np.random.default_rng(4)
    topo = Topology.random(8, rng, mean_blen=0.15)
    model = SubstModel(datatype="nt", name="HKY85", n_classes=1)
    params = model.init_params(np.full(4, 0.25))
    _, seqs = simulate_alignment(topo, model, params, 300, rng)
    p = tmp_path / "tr.phy"
    write_phylip(str(p), [f"t{i}" for i in range(8)], seqs)

    rc = main(["-i", str(p), "-m", "HKY85", "-c", "1", "-o", "tlr",
               "-s", "NNI", "-b", "0", "--rand_start",
               "--n_rand_starts", "1", "--r_seed", "5",
               "--print_trace", "--json_trace", "--quiet"])
    assert rc == 0
    nwk_lines = (tmp_path / "tr.phy_phyml_trace.txt").read_text() \
        .strip().splitlines()
    assert len(nwk_lines) >= 1
    assert all(ln.endswith(";") for ln in nwk_lines)
    states = json.loads((tmp_path / "tr.phy_phyml_trace.json")
                        .read_text())
    assert len(states) == len(nwk_lines)
    assert states[0]["state"]["state_num"] == 0
    lnls = [s["state"]["lnL"] for s in states]
    assert lnls == sorted(lnls)  # improvements only


def _sim_phy(tmp_path, n_otu=8, n_sites=250, seed=9, fname="m.phy"):
    from phyml_tpu.evolve import simulate_alignment, write_phylip
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.topology import Topology

    rng = np.random.default_rng(seed)
    topo = Topology.random(n_otu, rng, mean_blen=0.15)
    model = SubstModel(datatype="nt", name="HKY85", n_classes=1)
    params = model.init_params(np.full(4, 0.25))
    names = [f"t{i}" for i in range(n_otu)]
    _, seqs = simulate_alignment(topo, model, params, n_sites, rng)
    p = tmp_path / fname
    write_phylip(str(p), names, seqs)
    return p, names, topo


def test_cli_multiple_datasets(tmp_path):
    """-n/--multiple: both data sets analyzed; tree + stats files get
    one entry per set (main.c:108 per-data-set loop)."""
    p1, _, _ = _sim_phy(tmp_path, seed=9, fname="a.phy")
    p2, _, _ = _sim_phy(tmp_path, seed=10, fname="b.phy")
    multi = tmp_path / "multi.phy"
    multi.write_text(p1.read_text() + p2.read_text())

    rc = main(["-i", str(multi), "-n", "2", "-m", "HKY85", "-c", "1",
               "-o", "lr", "-b", "0", "--rand_start",
               "--n_rand_starts", "1", "--r_seed", "3", "--quiet"])
    assert rc == 0
    trees = (tmp_path / "multi.phy_phyml_tree.txt").read_text() \
        .strip().splitlines()
    assert len(trees) == 2
    stats = (tmp_path / "multi.phy_phyml_stats.txt").read_text()
    assert stats.count("Log-likelihood:") == 2


def test_cli_search_best_and_rand_starts(tmp_path):
    """-s BEST runs NNI and SPR; --n_rand_starts loops starts.  The
    final lnL must be >= a single NNI search from BioNJ."""
    p, _, _ = _sim_phy(tmp_path, seed=11)
    rc = main(["-i", str(p), "-m", "HKY85", "-c", "1", "-o", "tlr",
               "-s", "BEST", "-b", "0", "--rand_start",
               "--n_rand_starts", "2", "--r_seed", "4", "--quiet"])
    assert rc == 0
    lnl_best = _stats_value(str(p) + "_phyml_stats.txt",
                            "Log-likelihood:")

    rc = main(["-i", str(p), "-m", "HKY85", "-c", "1", "-o", "tlr",
               "-s", "NNI", "-b", "0", "--r_seed", "4", "--quiet",
               "--run_id", "nni"])
    assert rc == 0
    lnl_nni = _stats_value(str(p) + "_nni_phyml_stats.txt",
                           "Log-likelihood:")
    assert lnl_best >= lnl_nni - 1e-3


def test_cli_constraint_file(tmp_path):
    """--constraint_file: the output tree contains every constraint
    clade, whatever the data say."""
    from phyml_tpu.io.newick import parse_newick
    from phyml_tpu.search.constraint import Constraint
    from phyml_tpu.topology import Topology

    p, names, _ = _sim_phy(tmp_path, seed=12)
    cons = tmp_path / "cons.nwk"
    # force an (arbitrary) clade the ML tree is unlikely to have
    cons.write_text("((t0,t3,t5),(t1,t2,t4,t6,t7));")

    rc = main(["-i", str(p), "-m", "HKY85", "-c", "1", "-o", "tlr",
               "-s", "NNI", "-b", "0", "--r_seed", "6", "--quiet",
               "--constraint_file", str(cons)])
    assert rc == 0
    out = (tmp_path / "m.phy_phyml_tree.txt").read_text()
    got = Topology.from_newick(out, names)
    c = Constraint(parse_newick(cons.read_text()), names)
    assert c.is_compatible(got)


def test_xml_spatialmodel_parsing(tmp_path):
    """<spatialmodel> name mapping (phyrex.c:320-331) and the SLFV
    default when the element is absent (init.c:6097)."""
    from phyml_tpu.io.xmlcfg import parse_xml

    base = (
        '<phyrex run.id="t" output.file="o" mcmc.chain.len="100">'
        "{SM}"
        '<topology><instance id="T1" init.tree="bionj"/></topology>'
        '<ratematrices id="RM1">'
        '<instance id="M1" model="HKY85"/></ratematrices>'
        '<siterates id="SR1"><instance id="R1" init.value="1.0"/>'
        '<weights id="D1" family="gamma">'
        '<instance appliesto="R1" value="1.0"/></weights></siterates>'
        '<equfreqs id="EF1"><instance id="F1"/></equfreqs>'
        '<branchlengths id="BL1"><instance id="L1"/></branchlengths>'
        '<partitionelem id="p1" file.name="x.phy" data.type="nt">'
        '<mixtureelem list="T1"/><mixtureelem list="M1"/>'
        '<mixtureelem list="F1"/><mixtureelem list="R1"/>'
        '<mixtureelem list="L1"/></partitionelem>'
        "</phyrex>"
    )
    cases = {
        "": "slfv",                                   # absent -> SLFV
        '<spatialmodel name="slfv"/>': "slfv",
        '<spatialmodel name="rrw+lognormal"/>': "rrw",
        '<spatialmodel name="rrw+gamma"/>': "rrw",
        '<spatialmodel name="rw"/>': "rw",
        '<spatialmodel name="ibm"/>': "ibm",
        '<spatialmodel name="riwn"/>': "iwn",
        '<spatialmodel name="iou"/>': "iou",
    }
    for sm, expect in cases.items():
        f = tmp_path / "t.xml"
        f.write_text(base.replace("{SM}", sm))
        assert parse_xml(str(f))["spatialmodel"] == expect, sm
    f = tmp_path / "t.xml"
    f.write_text(base.replace("{SM}", '<spatialmodel name="bogus"/>'))
    import pytest
    with pytest.raises(ValueError):
        parse_xml(str(f))


def test_no_gap_matches_reference_counts():
    """--no_gap strips columns with gaps/ambiguity before compression
    (cl.c case 38 io->rm_ambigu).  The reference binary reports '156
    patterns found (out of a total of 396 sites)' for
    examples/nucleic under --no_gap; the filter must agree exactly."""
    from phyml_tpu.io.alignment import (
        read_alignment, remove_ambiguous_patterns,
    )

    aln = read_alignment(os.path.join(EXAMPLES, "nucleic"),
                         datatype="nt")
    filt = remove_ambiguous_patterns(aln)
    assert filt.n_sites == 396
    assert filt.n_patterns == 156
    # every kept cell is a definite single state
    assert (filt.partials.sum(axis=-1) == 1.0).all()
    # weights still count the kept sites
    assert filt.weights.sum() == 396


def test_cli_reference_option_aliases(workdir):
    """The reference's alternative long-option spellings parse to the
    same destinations (cl.c:35-135: print_site_lk==print_site_lnl,
    anc==ancestral, freerate(s)==free_rate, inputtree==-u,
    nclasses==-c)."""
    from phyml_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args(["-i", "x", "--anc", "--print_site_lk",
                      "--freerates", "--nclasses", "6",
                      "--inputtree", "t.nwk", "--no_five_branch",
                      "--min_diff_lk_global", "0.05", "--no_gap",
                      "--mutmap", "--alias_subpatt", "--append"])
    assert a.ancestral and a.print_site_lnl and a.free_rates
    assert a.n_classes == 6 and a.user_tree == "t.nwk"
    assert a.no_five_branch and a.min_diff_lk_global == 0.05
    assert a.no_gap and a.mutmap and a.alias_subpatt and a.append


def test_cli_mutmap_output(workdir):
    rc = main(["-i", "nucleic", "-d", "nt", "-m", "HKY85", "-c", "4",
               "-u", "ref_tree_A.nwk", "-b", "0", "-o", "n",
               "--mutmap", "--quiet", "--r_seed", "5"])
    assert rc == 0
    path = workdir / "nucleic_phyml_mutmap.txt"
    lines = [l for l in open(path) if not l.startswith("#")]
    assert len(lines) > 100          # a real history, not an empty file
    for l in lines[:20]:
        u, p, t, s_from, s_to = l.split()
        assert float(t) >= 0.0 and s_from != s_to
