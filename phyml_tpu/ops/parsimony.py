"""Fitch parsimony as a bit-parallel device scan.

Reference: pars.c (Pars pars.c:20, Update_Partial_Pars pars.c:239) —
union/intersection state sets as bit vectors (`ui` fields,
utilities.h:776), weighted step counts.  Here the state set of every
(node, pattern) is an int32 bitmask and the postorder combine is one
lax.scan — the same schedule as the likelihood up-pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _tip_masks(aln, P_pad: int) -> np.ndarray:
    """[n_otu, P] int32 bitmasks of compatible states per pattern."""
    compat = (aln.partials > 0)                     # [n_otu, P_raw, ns]
    ns = aln.ns
    bits = (compat.astype(np.int64) <<
            np.arange(ns, dtype=np.int64)[None, None, :]).sum(-1)
    pad = P_pad - bits.shape[1]
    full = (1 << ns) - 1
    bits = np.pad(bits, ((0, 0), (0, pad)), constant_values=full)
    return bits.astype(np.int32)


def _make_pars_fn(engine):
    n = engine.n_otu

    def pars(masks, child, weights):
        state = jnp.zeros((engine.n_nodes, engine.P), dtype=jnp.int32)
        state = state.at[:n].set(masks)
        steps = jnp.zeros((engine.P,), dtype=jnp.float64)

        def step(carry, i):
            state, steps = carry
            m0 = state[child[i, 0]]
            m1 = state[child[i, 1]]
            inter = m0 & m1
            miss = inter == 0
            new = jnp.where(miss, m0 | m1, inter)
            steps = steps + miss.astype(jnp.float64) * weights
            return (state.at[n + i].set(new), steps), None

        (state, steps), _ = lax.scan(
            step, (state, steps), jnp.arange(engine.n_internal)
        )
        return jnp.sum(steps)

    return jax.jit(pars)


def parsimony_score(engine, topo, weights=None) -> int:
    """Weighted Fitch parsimony score of the topology (reference:
    Pars pars.c:20 with site weights)."""
    fn = getattr(engine, "_pars_fn", None)
    if fn is None:
        fn = _make_pars_fn(engine)
        engine._pars_fn = fn
    masks = getattr(engine, "_pars_masks", None)
    if masks is None:
        masks = jnp.asarray(_tip_masks(engine.aln, engine.P))
        engine._pars_masks = masks
    rv = topo.rooted()
    child = jnp.asarray(rv.child, dtype=jnp.int32)
    w = engine.weights if weights is None else weights
    # zero out padding columns (their all-ones masks never add steps,
    # but replicate weight vectors may carry nonzero pads)
    return int(fn(masks, child, w))
