"""Optimizer parity vs golden reference runs C and D.

Golden provenance (tests/golden/*_phyml_stats.txt):
  C: phyml -i nucleic -m HKY85 -t 4 -c 4 -a 1 -v 0 -u ref_tree_A -o l
  D: phyml -i nucleic -m HKY85 -c 4 -a e -t e -u ref_tree_A -o lr
Both from the reference binary compiled from /root/reference.
"""

import jax.numpy as jnp
import numpy as np

from phyml_tpu.models.substitution import SubstModel
from phyml_tpu.ops.likelihood import LikelihoodEngine, tree_arrays
from phyml_tpu.optim import optimize_branch_lengths, round_optimize

GOLDEN_C = -5601.25464
GOLDEN_D = -5432.64350


def test_branch_length_optimization_parity(nucleic, ref_tree_a):
    m = SubstModel(datatype="nt", name="HKY85", n_classes=4)
    eng = LikelihoodEngine(nucleic, m, dtype=jnp.float64)
    p = m.init_params(nucleic.obs_state_freqs)
    ta = tree_arrays(ref_tree_a.rooted(), dtype=jnp.float64)
    ta2, lnl = optimize_branch_lengths(eng, p, ta)
    # must reach at least the reference optimum (minus rounding slack)
    assert lnl >= GOLDEN_C - 5e-3
    # ... without exceeding it implausibly (same model, same topology)
    assert lnl <= GOLDEN_C + 0.5
    # optimized lengths stay in the legal range
    blen = np.asarray(ta2.blen)
    root_zero = int(np.asarray(ta2.child)[-1, 1])
    mask = np.ones(len(blen), bool)
    mask[[root_zero, len(blen) - 1]] = False
    assert (blen[mask] >= 1e-8 - 1e-12).all()
    assert (blen[mask] <= 100.0).all()


def test_round_optimize_parity(nucleic, ref_tree_a):
    m = SubstModel(datatype="nt", name="HKY85", n_classes=4)
    eng = LikelihoodEngine(nucleic, m, dtype=jnp.float64)
    p = m.init_params(nucleic.obs_state_freqs)
    ta = tree_arrays(ref_tree_a.rooted(), dtype=jnp.float64)
    p2, ta2, lnl = round_optimize(eng, m, p, ta)
    assert lnl >= GOLDEN_D - 5e-3
    assert lnl <= GOLDEN_D + 0.5
    assert abs(float(p2["kappa"]) - 5.198) < 0.05
    assert abs(float(p2["alpha"]) - 0.220) < 0.01


def test_brent_quadratic():
    from phyml_tpu.optim.brent import brent_maximize
    x, fx = brent_maximize(lambda x: -(x - 1.7) ** 2, -10, 10)
    assert abs(x - 1.7) < 1e-3
