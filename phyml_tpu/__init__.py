"""phyml_tpu — a TPU-native phylogenetic maximum-likelihood framework.

A from-scratch reimplementation of the capabilities of PhyML
(stephaneguindon/phyml) designed for TPU hardware: the Felsenstein
pruning recursion is a batched JAX/Pallas program over site patterns,
P(t) matrices come from a symmetric eigendecomposition batched over
(edge, rate-class), branch-length optimization uses the eigen-LR
reparameterization (per-site dot products -> O(ns) Newton steps with a
single psum per iteration), and bootstrap replicates are farmed
data-parallel over a device mesh.

Reference behavioral parity targets: PhyML 3.3.20260528
(see SURVEY.md at the repo root for the file:line map).
"""

__version__ = "0.1.0"

from phyml_tpu.io.alignment import Alignment, read_alignment
from phyml_tpu.topology import Topology
from phyml_tpu.models.substitution import SubstModel
from phyml_tpu.ops.likelihood import LikelihoodEngine
