"""Bayesian tier: clock models, node-time priors, MCMC, dating.

TPU-native replacement of the reference's PhyTime stack (date.c,
rates.c, times.c, mcmc.c): the chain state is a pytree, every move is
a branch of one jitted `lax.switch`, and whole sweeps run on-device
under `lax.scan` — the 14,901-line hand-rolled move zoo of mcmc.c
collapses into a table of (proposal, Hastings) pairs evaluated against
a single joint log-posterior.
"""

from phyml_tpu.bayes.chrono import TimeTree
from phyml_tpu.bayes.rates import RateModel
from phyml_tpu.bayes.times import Calibration, TimePrior
from phyml_tpu.bayes.mcmc import MCMC, MCMCSettings

__all__ = [
    "TimeTree", "RateModel", "TimePrior", "Calibration",
    "MCMC", "MCMCSettings",
]
