import time
import numpy as np
import jax, jax.numpy as jnp

from phyml_tpu.io.alignment import read_alignment
from phyml_tpu.models.substitution import SubstModel
from phyml_tpu.topology import Topology
from phyml_tpu.ops.likelihood import LikelihoodEngine, tree_arrays
from phyml_tpu.evolve import simulate_alignment, write_phylip

print("backend:", jax.default_backend())
rng = np.random.default_rng(7)
topo = Topology.random(64, rng, mean_blen=0.08)
model = SubstModel(datatype="nt", name="GTR", n_classes=4,
                   freqs_mode="fixed",
                   fixed_freqs=np.array([0.3, 0.2, 0.3, 0.2]))
params = model.init_params()
params["alpha"] = jnp.asarray(0.7)
names, seqs = simulate_alignment(topo, model, params, 2000, rng)
import tempfile, os
with tempfile.NamedTemporaryFile("w", suffix=".phy", delete=False) as fh:
    path = fh.name
write_phylip(path, names, seqs)
aln = read_alignment(path, datatype="nt")
topo = Topology.from_newick(topo.to_newick(names), aln.names)

eng_p = LikelihoodEngine(aln, model, use_pallas=True)
eng_s = LikelihoodEngine(aln, model, use_pallas=False)
ta = tree_arrays(topo.rooted())
print("tile:", eng_p.pallas_tile, "P:", eng_p.P, "patterns:", aln.n_patterns)

l_p = eng_p.loglik(params, ta)
l_s = eng_s.loglik(params, ta)
print("pallas:", float(l_p), "scan:", float(l_s), "diff:", float(l_p - l_s))

for eng, name in [(eng_s, "scan"), (eng_p, "pallas")]:
    f = lambda: eng.loglik(params, ta).block_until_ready()
    f()
    n = 30
    t0 = time.perf_counter(); [f() for _ in range(n)]
    dt = (time.perf_counter() - t0) / n
    su = (eng.n_otu - 1) * eng.C * aln.n_patterns / dt
    print(f"{name}: {dt*1e3:.2f} ms/eval, {su/1e6:.1f}M site-updates/s")
