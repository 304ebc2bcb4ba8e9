import numpy as np
import jax, jax.numpy as jnp
from phyml_tpu.io.alignment import read_alignment
from phyml_tpu.models.substitution import SubstModel
from phyml_tpu.topology import Topology
from phyml_tpu.ops.likelihood import LikelihoodEngine, tree_arrays
from phyml_tpu.evolve import simulate_alignment, write_phylip
import tempfile

rng = np.random.default_rng(7)
topo = Topology.random(16, rng, mean_blen=0.08)
model = SubstModel(datatype="nt", name="GTR", n_classes=4,
                   freqs_mode="fixed",
                   fixed_freqs=np.array([0.3, 0.2, 0.3, 0.2]))
params = model.init_params()
params["alpha"] = jnp.asarray(0.7)
names, seqs = simulate_alignment(topo, model, params, 300, rng)
with tempfile.NamedTemporaryFile("w", suffix=".phy", delete=False) as fh:
    path = fh.name
write_phylip(path, names, seqs)
aln = read_alignment(path, datatype="nt")
topo = Topology.from_newick(topo.to_newick(names), aln.names)
ta = tree_arrays(topo.rooted())

eng = LikelihoodEngine(aln, model, use_pallas=True)
eng_s = LikelihoodEngine(aln, model, use_pallas=False)
n = aln.n_patterns
print("tileP:", eng.pallas_tile, eng.P, "scanP:", eng_s.P, "pat:", n)

site_s = np.asarray(eng_s.site_logliks(params, ta))[:n]
site_c = np.asarray(eng.site_logliks(params, ta))[:n]
site_i = np.asarray(eng._site_loglik_fused(params, ta, interpret=True))[:n]
print("compiled max|d|:", np.abs(site_c - site_s).max())
print("interp   max|d|:", np.abs(site_i - site_s).max())
print("lnl pallas:", float(eng.loglik(params, ta)),
      "scan:", float(eng_s.loglik(params, ta)))
bad = np.argsort(-np.abs(site_c - site_s))[:5]
print("worst:", bad, (site_c - site_s)[bad])
