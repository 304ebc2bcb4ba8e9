"""Fused Felsenstein-pruning Pallas kernel (TPU).

This is the TPU replacement for the reference's SIMD likelihood
kernels (avx.c:301 AVX_Update_Partial_Lk, avx.c:110
AVX_Lk_Core_One_Class_No_Eigen_Lr, sse.c equivalents): one
`pallas_call` executes the ENTIRE postorder CLV recursion plus the
root class-mixing reduction for a tile of site patterns, with every
intermediate conditional-likelihood vector held in VMEM.

Why a kernel at all: the `lax.scan` formulation in likelihood.py
materializes the [n_nodes, C, ns, P] partial-likelihood tensor in HBM
and re-reads each node's partials when its parent is processed - at
~2 HBM round trips per (node, class, state, pattern) cell the scan is
bandwidth-bound far below the VPU/MXU roofline.  Site patterns are
embarrassingly parallel, so for a tile of T patterns the whole
traversal fits on-chip: the kernel reads tips and P-matrices from HBM
once, keeps the pup/scale buffers ([n_nodes, C, ns, T] and
[n_nodes, C, T]) as VMEM scratch, and writes back only the per-pattern
mixed log-likelihood - O(n_nodes * C * ns) flops per HBM byte instead
of O(1).

Grid: one program per pattern tile.  The postorder child table rides
in as a scalar-prefetch operand (SMEM) and drives dynamic indexing
into the VMEM scratch, exactly mirroring TreeArrays.child.

The kernel computes, per pattern p of the tile:

    lse[p] = logsumexp_c( log w_c + sc_root[c, p]
                          + log sum_x pi[c, x] * clv_root[c, x, p] )

i.e. the variable-rate part of the site log-likelihood (Lk_Core
lk.c:767-860 without the +I mix, which the caller applies - see
LikelihoodEngine._root_site_loglik).  Scaling uses the same
exact-log-accumulator scheme as the scan path (replacing the 2^256
block scaling of lk.c:1748-1758), so results agree with the scan path
to float32 roundoff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Whole-kernel VMEM budget: per-core VMEM is 16 MB; leave headroom
# for compiler overheads.  tile_size charges the scratch buffers PLUS
# the double-buffered operands (P-matrices, tip tile, output) against
# it — budgeting scratch alone overflowed VMEM by ~4 MB on 37-taxon
# AA mixtures (measured r4: 20.2 MB against the 16 MB limit).
_VMEM_BUDGET = 12 * 1024 * 1024
_LANE = 128


_LN2 = 0.6931471805599453


def _uppass_kernel(child_ref, tips_ref, pmats_ref, pi_ref, logw_ref,
                   lse_ref, pup_scr, sc_scr, *, n_otu, n_int, C, ns,
                   tiny):
    """One pattern tile: full postorder pass + root reduction.

    child_ref : SMEM int32 [n_int, 2]   (scalar prefetch)
    tips_ref  : VMEM [n_otu, ns, T]     tip partials for this tile
    pmats_ref : VMEM [n_nodes, C, ns, ns]
    pi_ref    : VMEM [C, ns]            per-class stationary freqs
    logw_ref  : VMEM [C, 1]             log class weights
    lse_ref   : VMEM [1, T]             output site log-likelihood
    pup_scr   : VMEM [n_nodes, C, ns, T]
    sc_scr    : VMEM [n_nodes, C, T]    accumulated scale, log2 units

    Two kernel-level optimizations over the naive per-node loop (both
    validated against the lax.scan path to f32 roundoff):

      * All leaf matvecs run as ONE dot_general batched over
        (n_otu * C) instead of an n_otu-iteration loop - only the
        internal recursion is inherently sequential.
      * Rescaling uses exponent-bit arithmetic instead of log/divide:
        the shared per-(class, pattern) scale factor is the exact
        power of two 2^(127-e) extracted from the float32 exponent
        field of the column max, so each step costs one multiply and
        an int add - no transcendentals, and the scaling itself is
        EXACT (a power-of-two multiply never rounds).  The scale
        accumulator is therefore in log2 units, converted once by
        ln(2) at the root.  This replaces the reference's 2^256-block
        scheme (utilities.h:493-520, lk.c:1748-1758).
    """
    T = tips_ref.shape[-1]

    # Leaves, one shot: [n_otu*C, ns, ns] x [n_otu*C, ns, T].
    # Exact tip partials need no scaling (values in [0, 1]).
    xb = jnp.broadcast_to(
        tips_ref[:][:, None], (n_otu, C, ns, T)
    ).reshape(n_otu * C, ns, T)
    pm_leaf = pmats_ref[0:n_otu].reshape(n_otu * C, ns, ns)
    dn = (((2,), (1,)), ((0,), (0,)))
    # precision=HIGHEST is load-bearing: the default lets Mosaic run
    # f32 matmuls through single-pass bf16 MXU passes, a ~2^-10
    # relative error per P-matrix product that compounds down the
    # tree to ~1e-2 per-site log-likelihood error.
    pup_scr[0:n_otu] = lax.dot_general(
        pm_leaf, xb, dn, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    ).reshape(n_otu, C, ns, T)
    sc_scr[0:n_otu] = jnp.zeros_like(sc_scr[0:n_otu])

    # Internal nodes except the root row: combine children, rescale,
    # push through the parent edge's P-matrix.
    def matvec(pm, x):
        # DNA-sized states: an explicit ns-term FMA chain on the VPU
        # is both exact in f32 and faster than tpu.matmul (measured
        # 0.82ms vs 0.94ms full-tree on v5e); for AA/covarion state
        # counts the dot_general (MXU, f32-precision passes) wins.
        if ns <= 8:
            acc = pm[:, :, 0][:, :, None] * x[:, 0][:, None, :]
            for y in range(1, ns):
                acc = acc + pm[:, :, y][:, :, None] * x[:, y][:, None, :]
            return acc
        return lax.dot_general(
            pm, x, dn, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)

    def internal(i, _):
        c0 = child_ref[i, 0]
        c1 = child_ref[i, 1]
        u = n_otu + i
        x = pup_scr[c0] * pup_scr[c1]                     # [C, ns, T]
        m = jnp.maximum(jnp.max(x, axis=1), tiny)         # [C, T]
        bits = lax.bitcast_convert_type(m, jnp.int32)
        e = (bits >> 23) & 0xFF                           # biased exp
        factor = lax.bitcast_convert_type((254 - e) << 23,
                                          jnp.float32)    # 2^(127-e)
        x = x * factor[:, None, :]
        sc_scr[u] = sc_scr[c0] + sc_scr[c1] + \
            (e - 127).astype(jnp.float32)
        pup_scr[u] = matvec(pmats_ref[u], x)
        return 0
    # note (r5, measured true-synced): predicating the rescale to
    # every second step via pl.when saves no time - the predication
    # overhead cancels the skipped VPU ops - so every step rescales

    lax.fori_loop(0, n_int - 1, internal, 0, unroll=n_int - 1)

    # Root row: product of the two root children, dot with pi, mix
    # classes in log space (logsumexp over C).
    r0 = child_ref[n_int - 1, 0]
    r1 = child_ref[n_int - 1, 1]
    x = pup_scr[r0] * pup_scr[r1]                         # [C, ns, T]
    lroot = jnp.sum(pi_ref[:][:, :, None] * x, axis=1)    # [C, T]
    lroot = jnp.maximum(lroot, tiny)
    a = logw_ref[:] + (sc_scr[r0] + sc_scr[r1]) * _LN2 + jnp.log(lroot)
    amax = jnp.max(a, axis=0, keepdims=True)              # [1, T]
    lse_ref[:] = amax + jnp.log(
        jnp.sum(jnp.exp(a - amax), axis=0, keepdims=True))


def tile_size(n_nodes: int, C: int, ns: int, n_otu: int | None = None,
              budget: int = _VMEM_BUDGET) -> int:
    """Largest lane-aligned tile such that scratch + double-buffered
    operands fit the VMEM budget, or 0 if even a 128-pattern tile does
    not fit (caller falls back to the lax.scan path)."""
    if n_otu is None:
        n_otu = (n_nodes + 1) // 2
    pmats_bytes = n_nodes * C * ns * ns * 4 * 2      # double-buffered
    bytes_per_col = (n_nodes * C * (ns + 1) * 4      # pup + sc scratch
                     + n_otu * ns * 4 * 2            # tip tile, 2x
                     + 4 * 2)                        # output row, 2x
    avail = budget - pmats_bytes
    if avail <= 0:
        return 0
    t = (avail // bytes_per_col) // _LANE * _LANE
    return min(int(t), 2048)


@functools.partial(
    jax.jit, static_argnames=("n_otu", "n_int", "C", "ns", "T",
                              "interpret"))
def uppass_site_lse(child, tips, pmats, pi, logw, *, n_otu, n_int, C,
                    ns, T, interpret=False):
    """Variable-rate site log-likelihood [P] via the fused kernel.

    tips [n_otu, ns, P] float32, P a multiple of T; pmats
    [n_nodes, C, ns, ns]; pi [C, ns]; logw [C]. child int32 [n_int, 2].
    """
    n_nodes = n_otu + n_int
    P = tips.shape[-1]
    tiny = float(np.finfo(np.float32).tiny)

    kern = functools.partial(
        _uppass_kernel, n_otu=n_otu, n_int=n_int, C=C, ns=ns,
        tiny=tiny)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // T,),
        in_specs=[
            pl.BlockSpec((n_otu, ns, T), lambda p, c: (0, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_nodes, C, ns, ns),
                         lambda p, c: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, ns), lambda p, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda p, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T), lambda p, c: (0, p),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_nodes, C, ns, T), jnp.float32),
            pltpu.VMEM((n_nodes, C, T), jnp.float32),
        ],
    )
    flops = 2 * n_nodes * C * ns * ns * P + 4 * n_nodes * C * ns * P
    # Trace the kernel with 32-bit default ints even when the caller
    # session runs jax_enable_x64: the kernel's index arithmetic must
    # stay int32 for Mosaic, and every operand is cast explicitly.
    with jax.enable_x64(False):
        lse = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(tips.size + pmats.size + P) * 4,
                transcendentals=n_nodes * C * P,
            ),
            interpret=interpret,
        )(
            child.astype(jnp.int32),
            tips.astype(jnp.float32),
            pmats.astype(jnp.float32),
            pi.astype(jnp.float32),
            logw.astype(jnp.float32).reshape(C, 1),
        )
    return lse[0]
