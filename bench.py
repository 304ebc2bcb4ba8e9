"""Benchmark: CLV throughput + branch-length-optimization speedup
vs the reference PhyML binary on an identical task.

Prints ONE JSON line:
  {"metric": ..., "value": <CLV site-updates/sec/chip>,
   "unit": "site-updates/s", "vs_baseline": <wall-clock speedup>}

Task (BASELINE.md config-1 scaled up): synthetic GTR+Gamma4 alignment
(N_TAXA x N_SITES, simulated with phyml_tpu.evolve along a random
tree), fixed topology, optimize all branch lengths.

  * value: full-likelihood CLV site-updates/sec on this chip, where
    one site-update = one (internal node, pattern, rate class)
    partial-CLV update (the ns x ns matvec of lk.c:1659 /
    avx.c:301).  Measured over repeated jitted evaluations.
  * vs_baseline: (reference branch-length-optimization wall-clock) /
    (ours), both excluding setup (reference: -o n run subtracted;
    ours: compile excluded by warmup).  Reference binary is built
    from /root/reference by tools/build_reference.sh; its timing is
    cached in bench_baseline.json keyed by the task config.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# persistent XLA compile cache: the bench compiles several large
# programs (CLV kernel, branch-length Newton); the remote compile
# service takes minutes per program, and the default cache thresholds
# skip writing entirely on this backend — zero them explicitly
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

N_TAXA = 128
N_SITES = 4096
SEED = 20260817
# True branch-length optimum of this exact (seeded) problem, computed
# with the float64 scan path on CPU (optimize_branch_lengths from the
# BioNJ-free fixed topology; both the f64-from-scratch optimum and the
# f64 re-evaluation of the TPU-converged tree agree to 2e-3).  Round
# 1's bench printed -225166.41 here, which was a kernel ACCURACY bug
# (the old log-scaling overestimated lnL by ~30 units), not a better
# optimizer: perf changes must stay anchored to this number.
TRUE_OPT_LNL = -225196.81
LNL_TOL = 1.5  # f32 site-loglik accumulation noise at |lnL|~2e5
BASELINE_CACHE = os.path.join(os.path.dirname(__file__),
                              "bench_baseline.json")
REF_BIN = "/tmp/phyml-bin"


def _build_problem():
    import jax.numpy as jnp

    from phyml_tpu.io.alignment import read_alignment
    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.evolve import simulate_alignment, write_phylip
    from phyml_tpu.topology import Topology

    rng = np.random.default_rng(SEED)
    topo = Topology.random(N_TAXA, rng, mean_blen=0.08)
    model = SubstModel(datatype="nt", name="GTR", n_classes=4,
                       freqs_mode="fixed",
                       fixed_freqs=np.array([0.3, 0.2, 0.3, 0.2]))
    params = model.init_params()
    params["rr_val"] = jnp.log(jnp.asarray(
        [1.2, 3.0, 0.8, 1.1, 4.0, 1.0]))
    params["alpha"] = jnp.asarray(0.7)

    workdir = "/tmp/phyml_bench"
    os.makedirs(workdir, exist_ok=True)
    aln_path = os.path.join(workdir, "bench.phy")
    tree_path = os.path.join(workdir, "bench.nwk")
    if not os.path.exists(aln_path):
        names, seqs = simulate_alignment(topo, model, params, N_SITES,
                                         rng)
        write_phylip(aln_path, names, seqs)
        with open(tree_path, "w") as fh:
            fh.write(topo.to_newick(names))
    aln = read_alignment(aln_path, datatype="nt")
    with open(tree_path) as fh:
        topo = Topology.from_newick(fh.read(), aln.names)
    return aln, topo, workdir, aln_path, tree_path


def _load_cache():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as fh:
            return json.load(fh)
    return {}


def _save_cache(cache):
    with open(BASELINE_CACHE, "w") as fh:
        json.dump(cache, fh)


def _ensure_ref_bin():
    if not os.path.exists(REF_BIN):
        subprocess.run(
            ["sh", os.path.join(os.path.dirname(__file__), "tools",
                                "build_reference.sh"), REF_BIN],
            check=True, capture_output=True)


def _measure_reference(aln_path, tree_path):
    """Reference branch-length-optimization seconds (setup-subtracted)."""
    cache = _load_cache()
    if cache.get("config") == [N_TAXA, N_SITES, SEED]:
        return cache["ref_opt_seconds"]
    _ensure_ref_bin()
    common = [REF_BIN, "-i", aln_path, "-d", "nt", "-m", "GTR",
              "-c", "4", "-a", "0.7", "-u", tree_path, "-b", "0",
              "--no_memory_check", "--leave_duplicates",
              "-f", "0.3,0.2,0.3,0.2"]
    times = {}
    for mode in ("n", "l"):
        t0 = time.monotonic()
        subprocess.run(common + ["-o", mode], check=True,
                       capture_output=True)
        times[mode] = time.monotonic() - t0
    ref_opt = max(times["l"] - times["n"], 1e-3)
    cache.update({"config": [N_TAXA, N_SITES, SEED],
                  "ref_opt_seconds": ref_opt,
                  "ref_setup_seconds": times["n"]})
    _save_cache(cache)
    return ref_opt


# ----------------------------------------------------------------------
# End-to-end search benchmarks (BASELINE.md configs 2-4): wall-clock
# to the ML tree, ours (over the tunnel, compile warmed in-process)
# vs the reference binary run locally on the same host.
# ----------------------------------------------------------------------

E2E_CONFIGS = {
    "c2_nucleic_gtr_spr": {
        "ref_cmd": lambda: [REF_BIN, "-i", "/tmp/bench_nucleic.phy",
                            "-d", "nt", "-m", "GTR", "-c", "4",
                            "-a", "e", "-s", "SPR", "-b", "0",
                            "-o", "tlr", "--no_memory_check",
                            "--r_seed", "1"],
        "data": ("/root/reference/examples/nucleic", "nt",
                 "/tmp/bench_nucleic.phy"),
        "min_lnl": -5382.45,     # reference's own -s SPR run: -5382.479
    },
    "c3_proteic_lg_nni": {
        "ref_cmd": lambda: [REF_BIN, "-i", "/tmp/bench_proteic.phy",
                            "-d", "aa", "-m", "LG", "-c", "4",
                            "-a", "e", "-v", "e", "-s", "NNI",
                            "-b", "0", "-o", "tlr",
                            "--no_memory_check", "-f", "e",
                            "--r_seed", "1"],
        "data": ("/root/reference/examples/proteic", "aa",
                 "/tmp/bench_proteic.phy"),
        "min_lnl": -12435.40,    # reference NNI run: -12435.287
    },
    "c4_lg4x_mixture": {
        # the shipped examples/lg4x/lg4x.xml analysis (4 custom
        # matrices + freerates; reference final lnL -12323.738)
        "ref_cmd": None,         # measured via the XML (see below)
        "data": ("/root/reference/examples/proteic", "aa",
                 "/tmp/bench_proteic.phy"),
        "min_lnl": -12323.90,
    },
}


def _measure_reference_e2e(name):
    cache = _load_cache()
    key = f"ref_e2e_{name}"
    if key in cache:
        return cache[key]
    _ensure_ref_bin()
    cfg = E2E_CONFIGS[name]
    src, dtyp, path = cfg["data"]
    if not os.path.exists(path):
        import shutil
        shutil.copy(src, path)
    t0 = time.monotonic()
    if cfg["ref_cmd"] is None:
        # lg4x XML: paths inside the xml are relative to ../examples
        subprocess.run([REF_BIN, "--xml=../examples/lg4x/lg4x.xml"],
                       cwd="/tmp/phyml-ref/src", check=True,
                       capture_output=True)
    else:
        subprocess.run(cfg["ref_cmd"](), check=True,
                       capture_output=True)
    dt = time.monotonic() - t0
    cache[key] = dt
    _save_cache(cache)
    return dt


def _run_ours_e2e(name):
    """(seconds, lnL): our iterated search, timed after an in-process
    warm run (compiles excluded; the persistent cache makes CLI runs
    pay this once per problem shape, not per analysis)."""
    import jax.numpy as jnp

    from phyml_tpu.io.alignment import read_alignment
    from phyml_tpu.models.substitution import SubstModel, lg4x_model
    from phyml_tpu.ops.likelihood import LikelihoodEngine
    from phyml_tpu.search.bionj import bionj_start
    from phyml_tpu.search.driver import ml_search

    src, dtyp, _ = E2E_CONFIGS[name]["data"]
    aln = read_alignment(src, datatype=dtyp)
    if name == "c2_nucleic_gtr_spr":
        model = SubstModel(datatype="nt", name="GTR", n_classes=4)
        kind = "spr"
    elif name == "c3_proteic_lg_nni":
        model = SubstModel(datatype="aa", name="LG", n_classes=4,
                           invar=True, freqs_mode="empirical")
        model.optimize_pinv = True
        kind = "nni"
    else:
        model = lg4x_model()
        kind = "spr"
    engine = LikelihoodEngine(aln, model, dtype=jnp.float32)

    def once():
        t0 = time.monotonic()
        params = model.init_params(
            aln.obs_state_freqs if model.freqs_mode == "empirical"
            else None)
        topo = bionj_start(engine, params)
        topo, params, lnl = ml_search(engine, model, params, topo,
                                      kind=kind)
        return time.monotonic() - t0, float(lnl)

    once()                                     # warm (compiles)
    dt, lnl = once()
    return dt, lnl


def main():
    import jax
    import jax.numpy as jnp

    from phyml_tpu.models.substitution import SubstModel
    from phyml_tpu.ops.likelihood import LikelihoodEngine, tree_arrays
    from phyml_tpu.optim.blen import optimize_branch_lengths

    aln, topo, workdir, aln_path, tree_path = _build_problem()
    ref_opt_s = _measure_reference(aln_path, tree_path)

    model = SubstModel(datatype="nt", name="GTR", n_classes=4,
                       freqs_mode="fixed",
                       fixed_freqs=np.array([0.3, 0.2, 0.3, 0.2]))
    params = model.init_params()
    params["rr_val"] = jnp.log(jnp.asarray(
        [1.2, 3.0, 0.8, 1.1, 4.0, 1.0]))
    params["alpha"] = jnp.asarray(0.7)

    eng = LikelihoodEngine(aln, model, dtype=jnp.float32)
    ta = tree_arrays(topo.rooted(), dtype=jnp.float32)

    # --- CLV throughput (pure full-likelihood evaluations) ----------
    # The TPU here is reached through a tunnel whose remote-compile
    # service adds multi-ms (sometimes multi-minute) stalls when any
    # program compile overlaps the measurement; take the best of
    # several trials after a thorough warmup so the number reflects
    # steady-state device throughput, not tunnel noise.
    eng.loglik(params, ta).block_until_ready()     # compile
    n_evals = 50
    best_dt = float("inf")
    for _trial in range(5):
        t0 = time.monotonic()
        for _ in range(n_evals):
            lnl = eng.loglik(params, ta)
        lnl.block_until_ready()
        best_dt = min(best_dt, time.monotonic() - t0)
    updates = n_evals * eng.n_internal * eng.C * aln.n_patterns
    clv_rate = updates / best_dt

    # --- branch-length optimization speedup -------------------------
    # warm the compile caches with one full throwaway run (compiles
    # the round program AND the backtracking branch), then best-of-3
    optimize_branch_lengths(eng, params, ta)
    ours_opt_s = float("inf")
    for _trial in range(3):
        t0 = time.monotonic()
        ta2, lnl_opt = optimize_branch_lengths(eng, params, ta)
        ours_opt_s = min(ours_opt_s, time.monotonic() - t0)
    speedup = ref_opt_s / ours_opt_s

    # convergence guard: the optimizer must reach the known f64
    # optimum (and the kernel must REPORT it accurately) — speed is
    # worthless if either regresses
    assert abs(lnl_opt - TRUE_OPT_LNL) < LNL_TOL, (
        f"optimized lnL {lnl_opt:.2f} drifted from the true optimum "
        f"{TRUE_OPT_LNL:.2f} (tol {LNL_TOL})"
    )

    # --- bootstrap throughput (BASELINE config 5 derivative) --------
    # 24 nucleic NNI replicates, device-batched (one vmapped blen +
    # NNI dispatch per round across ALL replicates) vs the serial
    # per-replicate loop extrapolated from 4 replicates
    def _bootstrap_bench():
        from phyml_tpu.io.alignment import read_alignment
        from phyml_tpu.ops.likelihood import LikelihoodEngine
        from phyml_tpu.search.bionj import bionj_start
        from phyml_tpu.search.driver import ml_search
        from phyml_tpu.search.support import (
            bootstrap_supports, bootstrap_supports_batched,
        )

        aln_n = read_alignment("/root/reference/examples/nucleic",
                               datatype="nt")
        model_n = SubstModel(datatype="nt", name="GTR", n_classes=4)
        eng_n = LikelihoodEngine(aln_n, model_n, dtype=jnp.float32)
        p_n = model_n.init_params(aln_n.obs_state_freqs)
        topo_n = bionj_start(eng_n, p_n)
        topo_n, p_n, _ = ml_search(eng_n, model_n, p_n, topo_n,
                                   kind="nni", retries=1)
        bootstrap_supports_batched(eng_n, model_n, p_n, topo_n,
                                   n_replicates=4, seed=0)  # warm
        t0 = time.monotonic()
        bootstrap_supports_batched(eng_n, model_n, p_n, topo_n,
                                   n_replicates=24, seed=100)
        batched_hr = 24 * 3600.0 / (time.monotonic() - t0)
        bootstrap_supports(eng_n, model_n, p_n, topo_n,
                           n_replicates=1, search="nni", seed=0)
        t0 = time.monotonic()
        bootstrap_supports(eng_n, model_n, p_n, topo_n,
                           n_replicates=4, search="nni", seed=100)
        serial_hr = 4 * 3600.0 / (time.monotonic() - t0)
        return batched_hr, serial_hr

    boot_hr, boot_serial_hr = _bootstrap_bench()

    # --- end-to-end search wall-clock (BASELINE configs 2-4) --------
    e2e = {}
    for name in E2E_CONFIGS:
        ref_s = _measure_reference_e2e(name)
        ours_s, lnl = _run_ours_e2e(name)
        assert lnl >= E2E_CONFIGS[name]["min_lnl"], (
            f"{name}: search lnL {lnl:.3f} regressed below "
            f"{E2E_CONFIGS[name]['min_lnl']}"
        )
        e2e[name] = dict(ours_s=round(ours_s, 2),
                         ref_s=round(ref_s, 2),
                         speedup=round(ref_s / ours_s, 2),
                         lnl=round(lnl, 3))

    print(json.dumps({
        "metric": "CLV site-updates/sec/chip (GTR+Gamma4, "
                  f"{N_TAXA}x{N_SITES}nt)",
        "value": round(clv_rate, 1),
        "unit": "site-updates/s",
        "vs_baseline": round(speedup, 3),
    }))
    print(f"# blen-opt: ours {ours_opt_s:.2f}s (lnL {float(lnl_opt):.2f}) "
          f"vs reference {ref_opt_s:.2f}s",
          file=sys.stderr)
    for name, d in e2e.items():
        print(f"# e2e {name}: ours {d['ours_s']}s vs reference "
              f"{d['ref_s']}s (speedup {d['speedup']}x, "
              f"lnL {d['lnl']})", file=sys.stderr)
    print(f"# bootstrap (nucleic NNI): batched {boot_hr:.0f} reps/hr "
          f"vs serial {boot_serial_hr:.0f} reps/hr "
          f"({boot_hr / boot_serial_hr:.1f}x)", file=sys.stderr)
    e2e["bootstrap_reps_per_hr"] = dict(
        batched=round(boot_hr), serial=round(boot_serial_hr))
    with open(os.path.join(os.path.dirname(__file__),
                           "E2E.json"), "w") as fh:
        json.dump(e2e, fh, indent=1)


if __name__ == "__main__":
    main()
