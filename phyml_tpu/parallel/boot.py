"""Distributed bootstrap farming (the mpi_boot.c replacement).

Reference flow (mpi_boot.c:27 Bootstrap_MPI): every MPI rank runs the
full replicate pipeline for replicates r, r+P, r+2P... with per-rank
seeds (srand(seed+rank), main.c:84); replicate tree strings travel to
rank 0 (MPI_Ssend/Recv, mpi_boot.c:313-314) and the per-edge
bipartition counts reduce with MPI_Reduce(SUM) (mpi_boot.c:335-342).

TPU-native design: processes come from `jax.distributed.initialize`
(one per host; each owns its local chips, so within a replicate the
search uses the host's devices).  Replicates are round-robin over
process ids with per-REPLICATE seeds (stronger than the reference's
per-rank seeds: counts are bit-identical regardless of the farming
layout).  The count reduction is a single psum-equivalent over a
dense per-edge vector via multihost allgather; no strings cross the
wire.

Single-process (including the virtual CPU mesh) this degrades to the
serial loop and returns identical counts — the layout-independence
contract is tested in tests/test_multichip.py.
"""

from __future__ import annotations

import numpy as np


def replicate_shard(n_replicates: int, process_index: int,
                    process_count: int) -> list[int]:
    """Round-robin replicate ids for one process
    (mpi_boot.c:106-117: rank r handles r, r+P, r+2P, ...)."""
    return list(range(process_index, n_replicates, process_count))


def initialize_distributed(**kwargs) -> tuple[int, int]:
    """jax.distributed.initialize from the standard env variables
    (JAX_COORDINATOR_ADDRESS / num_processes / process_id or a cluster
    scheduler).  Returns (process_index, process_count).  Safe to call
    in single-process runs: initialization errors degrade to (0, 1)."""
    import jax

    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        pass
    return jax.process_index(), jax.process_count()


def run_bootstrap_distributed(
    engine,
    model,
    params,
    best_topo,
    n_replicates: int = 100,
    search: str = "nni",
    seed: int = 0,
    bayesian: bool = False,
    tbe: bool = False,
    verbose: bool = False,
):
    """Bootstrap supports with replicates farmed over jax processes.

    Every process calls this with identical arguments (SPMD, like the
    reference's phyml-mpi binary); the returned {edge id: support}
    dict is identical on every process.
    """
    import jax

    from phyml_tpu.search.support import bootstrap_supports

    pid = jax.process_index()
    nproc = jax.process_count()
    mine = replicate_shard(n_replicates, pid, nproc)
    counts = bootstrap_supports(
        engine, model, params, best_topo,
        n_replicates=n_replicates, search=search, seed=seed,
        bayesian=bayesian, tbe=tbe,
        verbose=verbose and pid == 0,
        replicate_indices=mine,
    )
    eids = sorted(counts.keys())
    local = np.asarray([counts[e] for e in eids], dtype=np.float64)
    total = _sum_across_processes(local)
    return {e: float(c) / n_replicates for e, c in zip(eids, total)}


def _sum_across_processes(local: np.ndarray) -> np.ndarray:
    """Global SUM of a small per-edge count vector across jax
    processes (≙ MPI_Reduce(..., MPI_SUM, 0) mpi_boot.c:335, but
    allreduce-style so every process holds the result)."""
    import jax

    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(local)
    return np.asarray(gathered).sum(axis=0)
