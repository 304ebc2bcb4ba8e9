"""Interactive menu tests (≙ interface.c: the PHYLIP-style front end
entered when phyml runs with no arguments, io.c:4373)."""

import io

import numpy as np
import pytest


def _drive(keys, input_file="/root/reference/examples/nucleic"):
    from phyml_tpu.interface import launch_interface
    out = io.StringIO()
    rc = launch_interface(input_file=input_file, instream=iter(keys),
                          outstream=out, run=False)
    assert rc == 0
    return launch_interface.last_args, out.getvalue()


def test_defaults_launch():
    args, screen = _drive(["Y"])
    assert args.model == "HKY85"
    assert args.n_classes == 4
    assert args.optimize == "tlr"
    assert args.search == "NNI"
    assert "Menu : Input Data" in screen


def test_model_toggles():
    # page to model menu, cycle model HKY85 -> F84 -> TN93 -> GTR,
    # set 6 categories, estimate alpha
    args, screen = _drive(["+", "M", "M", "M", "C", "6", "A", "e", "Y"])
    assert args.model == "GTR"
    assert args.n_classes == 6
    assert args.alpha == "e"
    assert "Menu : Substitution Model" in screen


def test_datatype_switch_changes_model_family():
    args, _ = _drive(["D", "Y"])
    assert args.datatype == "aa"
    assert args.model == "LG"


def test_search_and_support():
    # search page: switch to SPR; support page: bootstrap 25 + TBE
    args, _ = _drive(["+", "+", "S", "+", "B", "B", "B", "B", "B",
                      "25", "y", "Y"])
    assert args.search == "SPR"
    assert args.bootstrap == 25
    assert args.tbe is True


def test_alrt_cycle():
    # B once -> aLRT statistics (-1)
    args, _ = _drive(["+", "+", "+", "B", "Y"])
    assert args.bootstrap == -1


def test_quit():
    from phyml_tpu.interface import launch_interface
    out = io.StringIO()
    rc = launch_interface(input_file="x", instream=iter(["Q"]),
                          outstream=out, run=False)
    assert rc == 1


def test_end_to_end_tiny_run(tmp_path):
    """Menu-configured run on a tiny simulated alignment: fixed tree
    eval only (topology off, lengths+rates on) completes and writes
    outputs."""
    from phyml_tpu.evolve import simulate_alignment, write_phylip
    from phyml_tpu.interface import launch_interface
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.topology import Topology

    rng = np.random.default_rng(0)
    topo = Topology.random(5, rng)
    model = SubstModel(datatype="nt", name="HKY85", n_classes=1)
    params = model.init_params(np.full(4, 0.25))
    _, seqs = simulate_alignment(topo, model, params, 60, rng)
    p = tmp_path / "tiny.phy"
    write_phylip(str(p), [f"t{i}" for i in range(5)], seqs)

    out = io.StringIO()
    # model menu: 1 rate category; search menu: topology off
    rc = launch_interface(
        input_file=str(p),
        instream=iter(["+", "R", "+", "O", "Y"]),
        outstream=out, run=True)
    assert rc == 0
    assert (tmp_path / "tiny.phy_phyml_stats.txt").exists()
    assert (tmp_path / "tiny.phy_phyml_tree.txt").exists()
