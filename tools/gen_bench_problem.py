"""Generate a bench.py problem (alignment + tree) in a CHILD process.

bench.py measures launch-pipelined dispatch rates; on the
remote-attached TPU runtime the FIRST device->host read-back
permanently degrades every subsequent dispatch in the process
(measured: 17 us -> 773 us per dispatch).  simulate_alignment reads
the eigensystem back to the host, so problem generation must never
run inside the benchmarking process — bench.py shells out to this
script instead.

Usage: gen_bench_problem.py <nt|aa> <n_taxa> <n_sites> <seed>
                            <aln_path> <tree_path>

The RNG consumption order exactly mirrors bench._build_problem so the
generated data (and therefore every cached reference timing keyed on
it) is byte-identical to what earlier in-process generation produced.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    datatype, n_taxa, n_sites, seed, aln_path, tree_path = sys.argv[1:7]
    n_taxa, n_sites, seed = int(n_taxa), int(n_sites), int(seed)

    import jax.numpy as jnp
    from phyml_tpu.evolve import simulate_alignment, write_phylip
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.topology import Topology

    rng = np.random.default_rng(seed)
    topo = Topology.random(n_taxa, rng, mean_blen=0.08)
    if datatype == "nt":
        model = SubstModel(datatype="nt", name="GTR", n_classes=4,
                           freqs_mode="fixed",
                           fixed_freqs=np.array([0.3, 0.2, 0.3, 0.2]))
        params = model.init_params()
        params["rr_val"] = jnp.log(jnp.asarray(
            [1.2, 3.0, 0.8, 1.1, 4.0, 1.0]))
        params["alpha"] = jnp.asarray(0.7)
    else:
        model = SubstModel(datatype="aa", name="LG", n_classes=4,
                           freqs_mode="model")
        params = model.init_params()
        params["alpha"] = jnp.asarray(0.9)

    names, seqs = simulate_alignment(topo, model, params, n_sites, rng)
    write_phylip(aln_path, names, seqs)
    with open(tree_path, "w") as fh:
        fh.write(topo.to_newick(names))


if __name__ == "__main__":
    main()
