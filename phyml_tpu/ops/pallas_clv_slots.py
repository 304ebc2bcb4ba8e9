"""Slot-allocated fused Felsenstein kernel: O(log n) VMEM scratch.

The whole-traversal kernel in pallas_clv.py keeps EVERY node's
partial in VMEM ([n_nodes, C, ns, T] scratch), which silently falls
back to the HBM-bound lax.scan path once n_nodes*C*(ns+1)*4 bytes per
pattern column outgrows VMEM — >~500 taxa DNA, >~120 taxa AA (the r3
verdict's "kernel scale cliff").

This variant observes that each node's partial is consumed exactly
once (by its parent), so a register-allocation schedule bounds the
LIVE set: evaluating the heavier child subtree first (Sethi-Ullman
ordering) needs at most ceil(log2(n_otu)) + 1 simultaneous partials.
The host builds, per topology, a schedule of steps

    (child0 src, child1 src, destination slot, node ids)

where a source is either a tip id (the tip CLV is read from the tips
operand and is class-independent) or a slot id, and the kernel walks
it with a scratch of S = ceil(log2 n) + 2 slots of [C, ns, T] — a
~n/log(n) scratch reduction that removes the cliff entirely (1000+
taxa DNA and 500+ taxa AA stay fused in VMEM).

Each consumption performs exactly one per-class (ns x ns) matvec
P(t_child) @ clv_child (the avx.c:301 kernel's work), so total matmul
work equals the dense kernel's; the only overhead is one masked
select per child to pick the tip-vs-slot source.

The schedule arrays ride in via scalar prefetch (SMEM), like the
child table of the dense kernel.  Scaling uses the same exact
exponent-bit scheme.  Reference counterparts: avx.c:301
AVX_Update_Partial_Lk, lk.c:767 Lk_Core; the slot schedule replaces
the reference's per-edge p_lk storage (its memory ceiling is
n_edges * ns * n_patterns doubles, utilities.h:735).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_VMEM_BUDGET = 12 * 1024 * 1024


def build_slot_schedule(n_otu: int, child: np.ndarray):
    """Per-topology kernel schedule with Sethi-Ullman slot bounds.

    child: postorder [n_int, 2] (RootedView layout; the last row is
    the root).  Returns (sched int32 [n_int, 7], n_slots) where
    sched[i] = (c0_id, c0_is_tip, c0_slot, c1_id, c1_is_tip, c1_slot,
    dst_slot); steps are emitted in a re-ordered postorder (heavier
    subtree first) and the LAST step computes the root's combined
    partial into its dst slot.
    """
    child = np.asarray(child)
    n_int = child.shape[0]
    n_nodes = n_otu + n_int
    root = n_nodes - 1

    kids = {n_otu + i: (int(child[i, 0]), int(child[i, 1]))
            for i in range(n_int)}

    # Sethi-Ullman register need per node
    need = np.ones(n_nodes, dtype=np.int64)
    for i in range(n_int):
        u = n_otu + i
        a, b = kids[u]
        na, nb = need[a], need[b]
        need[u] = max(na, nb) if na != nb else na + 1

    steps = []
    slot_of: dict[int, int] = {}
    free: list[int] = []
    n_slots = 0

    def alloc() -> int:
        nonlocal n_slots
        if free:
            return free.pop()
        n_slots += 1
        return n_slots - 1

    def emit(u: int):
        """Iterative heavy-child-first postorder with slot reuse."""
        stack = [(u, False)]
        while stack:
            v, expanded = stack.pop()
            if v < n_otu:
                continue
            a, b = kids[v]
            if not expanded:
                stack.append((v, True))
                # heavier child first minimizes the live set
                first, second = (a, b) if need[a] >= need[b] else (b, a)
                stack.append((second, False))
                stack.append((first, False))
                continue
            row = []
            for c in (a, b):
                if c < n_otu:
                    row += [c, 1, 0]
                else:
                    s = slot_of.pop(c)
                    free.append(s)
                    row += [c, 0, s]
            dst = alloc()
            slot_of[v] = dst
            steps.append(row + [dst])

    emit(root)
    assert len(steps) == n_int
    return np.asarray(steps, dtype=np.int32), n_slots


def slot_tile_size(n_otu: int, n_slots: int, C: int, ns: int,
                   budget: int = _VMEM_BUDGET) -> int:
    """Largest lane-aligned tile fitting scratch + operands in VMEM."""
    n_nodes = 2 * n_otu - 1
    pmats_bytes = n_nodes * C * ns * ns * 4 * 2    # double-buffered
    per_col = (n_slots * C * (ns + 1) * 4          # slots + scales
               + n_otu * ns * 4 * 2                # tip tile, 2x
               + 4 * 2)                            # output row
    avail = budget - pmats_bytes
    if avail <= 0:
        return 0
    t = (avail // per_col) // _LANE * _LANE
    # cap at 1024: near the VMEM ceiling the tile's double-buffered
    # operand copies stop overlapping with compute (measured r4:
    # T=2048 runs ~25% slower than T=1024 on the 128x4096 problem)
    return min(int(t), 1024)


def _slot_kernel(sched_ref, tips_ref, pmats_ref, pi_ref, logw_ref,
                 lse_ref, slot_scr, sc_scr, *, n_otu, n_int, C, ns,
                 n_slots, tiny):
    """One pattern tile over the slot schedule.

    sched_ref : SMEM int32 [n_int, 7]
    tips_ref  : VMEM [n_otu, ns, T]  (class-independent tip CLVs)
    pmats_ref : VMEM [n_nodes, C, ns, ns]
    slot_scr  : VMEM [n_slots, C, ns, T]
    sc_scr    : VMEM [n_slots, C, T]   (log2-unit scale accumulators)
    """
    T = tips_ref.shape[-1]
    dn = (((2,), (1,)), ((0,), (0,)))

    def matvec(pm, x):
        # see pallas_clv._uppass_kernel: VPU FMA chain for DNA-sized
        # states, MXU dot_general for AA/covarion
        if ns <= 8:
            acc = pm[:, :, 0][:, :, None] * x[:, 0][:, None, :]
            for y in range(1, ns):
                acc = acc + pm[:, :, y][:, :, None] \
                    * x[:, y][:, None, :]
            return acc
        return lax.dot_general(
            pm, x, dn, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)

    def child_pup(cid, is_tip, slot):
        # both sources are read with safe indices and the tip/slot
        # choice is a vector select; exactly one matvec either way
        tip_clv = jnp.broadcast_to(
            tips_ref[jnp.where(is_tip == 1, cid, 0)][None],
            (C, ns, T))
        slot_clv = slot_scr[jnp.where(is_tip == 1, 0, slot)]
        clv = jnp.where(is_tip == 1, tip_clv, slot_clv)
        sc = jnp.where(is_tip == 1,
                       jnp.zeros((C, T), jnp.float32),
                       sc_scr[jnp.where(is_tip == 1, 0, slot)])
        return matvec(pmats_ref[cid], clv), sc

    def step(i, _):
        c0 = sched_ref[i, 0]
        t0 = sched_ref[i, 1]
        s0 = sched_ref[i, 2]
        c1 = sched_ref[i, 3]
        t1 = sched_ref[i, 4]
        s1 = sched_ref[i, 5]
        dst = sched_ref[i, 6]
        p0, sca = child_pup(c0, t0, s0)
        p1, scb = child_pup(c1, t1, s1)
        x = p0 * p1                                       # [C, ns, T]
        m = jnp.maximum(jnp.max(x, axis=1), tiny)         # [C, T]
        bits = lax.bitcast_convert_type(m, jnp.int32)
        e = (bits >> 23) & 0xFF
        factor = lax.bitcast_convert_type((254 - e) << 23,
                                          jnp.float32)    # 2^(127-e)
        slot_scr[dst] = x * factor[:, None, :]
        sc_scr[dst] = sca + scb + (e - 127).astype(jnp.float32)
        return 0

    lax.fori_loop(0, n_int, step, 0, unroll=n_int)

    root_dst = sched_ref[n_int - 1, 6]
    x = slot_scr[root_dst]
    lroot = jnp.sum(pi_ref[:][:, :, None] * x, axis=1)    # [C, T]
    lroot = jnp.maximum(lroot, tiny)
    a = logw_ref[:] + sc_scr[root_dst] * 0.6931471805599453 \
        + jnp.log(lroot)
    amax = jnp.max(a, axis=0, keepdims=True)
    lse_ref[:] = amax + jnp.log(
        jnp.sum(jnp.exp(a - amax), axis=0, keepdims=True))


@functools.partial(
    jax.jit, static_argnames=("n_otu", "n_int", "C", "ns", "n_slots",
                              "T", "interpret"))
def uppass_site_lse_slots(sched, tips, pmats, pi, logw, *, n_otu,
                          n_int, C, ns, n_slots, T, interpret=False):
    """Variable-rate site log-likelihood [P] via the slot kernel.

    sched int32 [n_int, 7] from build_slot_schedule; tips
    [n_otu, ns, P] float32 with P a multiple of T; pmats
    [n_nodes, C, ns, ns]; pi [C, ns]; logw [C].
    """
    n_nodes = n_otu + n_int
    P = tips.shape[-1]
    tiny = float(np.finfo(np.float32).tiny)

    kern = functools.partial(
        _slot_kernel, n_otu=n_otu, n_int=n_int, C=C, ns=ns,
        n_slots=n_slots, tiny=tiny)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // T,),
        in_specs=[
            pl.BlockSpec((n_otu, ns, T), lambda p, s: (0, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_nodes, C, ns, ns),
                         lambda p, s: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, ns), lambda p, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda p, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T), lambda p, s: (0, p),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_slots, C, ns, T), jnp.float32),
            pltpu.VMEM((n_slots, C, T), jnp.float32),
        ],
    )
    flops = 2 * n_nodes * C * ns * ns * P + 4 * n_nodes * C * ns * P
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
            sched.astype(jnp.int32),
            tips.astype(jnp.float32),
            pmats.astype(jnp.float32),
            pi.astype(jnp.float32),
            logw.astype(jnp.float32).reshape(C, 1),
        )
    return lse[0]


# ----------------------------------------------------------------------
# Streamed variant: P-matrices and tip rows DMA'd from HBM per step
# ----------------------------------------------------------------------

def slot_stream_tile_size(n_otu: int, n_slots: int, C: int, ns: int,
                          budget: int = 14 * 1024 * 1024) -> int:
    """Tile for uppass_site_lse_slots_stream: pmats/tips live in HBM
    and are fetched per schedule step into double-buffered rings, so
    VMEM holds only the slot scratch.  This removes the slot kernel's
    own ceiling (pmats [n_nodes, C, ns, ns] VMEM-resident), which
    killed it at ~400-taxon AA; the streamed variant runs 1000+ taxa
    AA and arbitrary DNA."""
    lpad = -(-ns // _LANE) * _LANE
    spad = ns if ns in (1, 2, 4, 8) else -(-ns // 8) * 8
    per_col = (n_slots * C * (ns + 1) * 4    # slots + scales
               + 4 * spad * 4               # tip ring
               + 4 * 2)                     # output row
    fixed = 2 * 2 * C * spad * lpad * 4     # pm ring
    avail = budget - fixed
    if avail <= 0:
        return 0
    t = (avail // per_col) // _LANE * _LANE
    return min(int(t), 1024)


def _slot_stream_kernel(sched_ref, tips_hbm, pmats_hbm, pi_ref,
                        logw_ref, lse_ref, slot_scr, sc_scr, pm_ring,
                        tip_ring, sem_pm, sem_tip, *, n_otu, n_int, C,
                        ns, spad, n_slots, T, tiny):
    """Slot kernel with per-step DMA of P-matrices and tip rows.

    sched_ref : SMEM int32 [n_int, 7] (build_slot_schedule)
    tips_hbm  : HBM [n_otu, spad, P]
    pmats_hbm : HBM [n_nodes, C, spad, lpad]
    """
    off = pl.program_id(0) * T
    dn = (((2,), (1,)), ((0,), (0,)))

    def matvec(pm, x):
        if ns <= 8:
            acc = pm[:, :, 0][:, :, None] * x[:, 0][:, None, :]
            for y in range(1, ns):
                acc = acc + pm[:, :, y][:, :, None] \
                    * x[:, y][:, None, :]
            return acc
        return lax.dot_general(
            pm, x, dn, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)

    def fetch(i, slot):
        c0 = sched_ref[i, 0]
        c1 = sched_ref[i, 3]
        pltpu.make_async_copy(pmats_hbm.at[c0], pm_ring.at[slot, 0],
                              sem_pm.at[slot, 0]).start()
        pltpu.make_async_copy(pmats_hbm.at[c1], pm_ring.at[slot, 1],
                              sem_pm.at[slot, 1]).start()
        t0 = jnp.minimum(c0, n_otu - 1)
        t1 = jnp.minimum(c1, n_otu - 1)
        pltpu.make_async_copy(tips_hbm.at[t0, :, pl.ds(off, T)],
                              tip_ring.at[slot, 0],
                              sem_tip.at[slot, 0]).start()
        pltpu.make_async_copy(tips_hbm.at[t1, :, pl.ds(off, T)],
                              tip_ring.at[slot, 1],
                              sem_tip.at[slot, 1]).start()

    def fetch_wait(slot):
        for j in range(2):
            pltpu.make_async_copy(pmats_hbm.at[0],
                                  pm_ring.at[slot, j],
                                  sem_pm.at[slot, j]).wait()
            pltpu.make_async_copy(tips_hbm.at[0, :, pl.ds(0, T)],
                                  tip_ring.at[slot, j],
                                  sem_tip.at[slot, j]).wait()

    def child_pup(ring, is_tip, slot, j):
        tip_clv = jnp.broadcast_to(
            tip_ring[ring, j][0:ns][None], (C, ns, T))
        slot_clv = slot_scr[jnp.where(is_tip == 1, 0, slot)]
        clv = jnp.where(is_tip == 1, tip_clv, slot_clv)
        sc = jnp.where(is_tip == 1,
                       jnp.zeros((C, T), jnp.float32),
                       sc_scr[jnp.where(is_tip == 1, 0, slot)])
        return matvec(pm_ring[ring, j, :, 0:ns, 0:ns], clv), sc

    fetch(0, 0)

    def step(i, _):
        ring = lax.rem(i, 2)

        @pl.when(i + 1 < n_int)
        def _():
            fetch(i + 1, 1 - ring)
        fetch_wait(ring)
        t0 = sched_ref[i, 1]
        s0 = sched_ref[i, 2]
        t1 = sched_ref[i, 4]
        s1 = sched_ref[i, 5]
        dst = sched_ref[i, 6]
        p0, sca = child_pup(ring, t0, s0, 0)
        p1, scb = child_pup(ring, t1, s1, 1)
        x = p0 * p1
        m = jnp.maximum(jnp.max(x, axis=1), tiny)
        bits = lax.bitcast_convert_type(m, jnp.int32)
        e = (bits >> 23) & 0xFF
        factor = lax.bitcast_convert_type((254 - e) << 23,
                                          jnp.float32)
        slot_scr[dst] = x * factor[:, None, :]
        sc_scr[dst] = sca + scb + (e - 127).astype(jnp.float32)
        return 0

    lax.fori_loop(0, n_int, step, 0, unroll=n_int)

    root_dst = sched_ref[n_int - 1, 6]
    x = slot_scr[root_dst]
    lroot = jnp.sum(pi_ref[:][:, :, None] * x, axis=1)
    lroot = jnp.maximum(lroot, tiny)
    a = logw_ref[:] + sc_scr[root_dst] * 0.6931471805599453 \
        + jnp.log(lroot)
    amax = jnp.max(a, axis=0, keepdims=True)
    lse_ref[:] = amax + jnp.log(
        jnp.sum(jnp.exp(a - amax), axis=0, keepdims=True))


@functools.partial(
    jax.jit, static_argnames=("n_otu", "n_int", "C", "ns", "n_slots",
                              "T", "interpret"))
def uppass_site_lse_slots_stream(sched, tips, pmats, pi, logw, *,
                                 n_otu, n_int, C, ns, n_slots, T,
                                 interpret=False):
    """Streamed twin of uppass_site_lse_slots (same contract); use
    when slot_tile_size returns 0 but slot_stream_tile_size is
    positive (very large AA/covarion problems)."""
    n_nodes = n_otu + n_int
    P = tips.shape[-1]
    tiny = float(np.finfo(np.float32).tiny)
    lpad = -(-ns // _LANE) * _LANE
    spad = ns if ns in (1, 2, 4, 8) else -(-ns // 8) * 8

    kern = functools.partial(
        _slot_stream_kernel, n_otu=n_otu, n_int=n_int, C=C, ns=ns,
        spad=spad, n_slots=n_slots, T=T, tiny=tiny)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # tips (spad)
            pl.BlockSpec(memory_space=pltpu.HBM),   # pmats (padded)
            pl.BlockSpec((C, ns), lambda p, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda p, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T), lambda p, s: (0, p),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_slots, C, ns, T), jnp.float32),
            pltpu.VMEM((n_slots, C, T), jnp.float32),
            pltpu.VMEM((2, 2, C, spad, lpad), jnp.float32),
            pltpu.VMEM((2, 2, spad, T), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    flops = 2 * n_nodes * C * ns * ns * P + 4 * n_nodes * C * ns * P
    pm_pad = jnp.pad(pmats.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, spad - ns),
                      (0, lpad - ns)))
    tips_pad = jnp.pad(tips.astype(jnp.float32),
                       ((0, 0), (0, spad - ns), (0, 0)))
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
            sched.astype(jnp.int32),
            tips_pad,
            pm_pad,
            pi.astype(jnp.float32),
            logw.astype(jnp.float32).reshape(C, 1),
        )
    return lse[0]
