from phyml_tpu.optim.blen import optimize_branch_lengths
from phyml_tpu.optim.brent import brent_maximize
from phyml_tpu.optim.round import round_optimize
