"""Normal approximation of the branch-length likelihood surface
(≙ the reference's --fastlk path: Hessian of lnL wrt branch lengths,
stats.c:2147 Hessian / stats.c:2522 gradient, consumed by
Lk_Normal_Approx lk.c:2521 — the Guindon-2010 speed trick for
PhyTime's MCMC).

TPU-native: the reference builds the Hessian by central finite
differences over edge lengths (stats.c:2147).  Here it is one
`jax.hessian` of the compiled likelihood — exact second derivatives
through the whole pruning recursion — and the approximation

    lnL(b) ~= lnL0 + g.(b-b0) + (b-b0)' H (b-b0) / 2

replaces the full traversal inside MCMC moves, turning each
likelihood evaluation into a vector-matrix-vector product.  Wired
into the bayes tier as `MCMC(..., fastlk=True)` /
`run_phytime(..., fastlk=True)`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from phyml_tpu.ops.likelihood import TreeArrays


class NormalApprox(NamedTuple):
    b0: jnp.ndarray       # [n_nodes] expansion point (branch lengths)
    lnL0: jnp.ndarray
    grad: jnp.ndarray     # [n_nodes]
    hess: jnp.ndarray     # [n_nodes, n_nodes]
    mask: jnp.ndarray     # 1 for real free edges (root slot 0)

    def loglik(self, blen):
        d = (blen - self.b0) * self.mask
        return (self.lnL0 + self.grad @ d
                + 0.5 * d @ (self.hess @ d))


def fit_normal_approx(engine, params, tree: TreeArrays,
                      weights=None) -> NormalApprox:
    """Expand lnL around the given branch lengths.  Call at a (near-)
    optimal tree: the reference requires the same (dLk ~ 0) for the
    approximation to be trustworthy."""
    w = engine._w(weights)
    child = tree.child
    n_nodes = engine.n_nodes

    # engine data threaded as arguments (bind_data) so the jitted
    # value/grad/hessian programs carry no multi-MB constants
    f = engine.bind_data(
        lambda blen: engine._loglik(params, TreeArrays(child=child,
                                                       blen=blen), w))
    b0 = tree.blen
    data = engine.data()
    lnL0 = jax.jit(f)(data, b0)
    grad = jax.jit(jax.grad(f, argnums=1))(data, b0)
    hess = jax.jit(jax.hessian(f, argnums=1))(data, b0)
    mask = jnp.ones(n_nodes, dtype=b0.dtype).at[n_nodes - 1].set(0.0)
    return NormalApprox(b0=b0, lnL0=jnp.asarray(lnL0), grad=grad,
                        hess=hess, mask=mask)
