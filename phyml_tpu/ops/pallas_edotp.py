"""Fused up+down+edge-dotprods Pallas kernel (TPU).

The branch-length optimizer and the search scorers consume, for every
edge u, the eigen-basis dot products

    d[u]  = (V^T O_u) * (V^-1 C_u)          [C, ns, P]
    sc_d[u] = sc_out[u] + sc[u]             [C, P]

(LikelihoodEngine.edge_dotprods_sys; reference Update_Eigen_Lr
lk.c:1038 + dLk lk.c:655).  The scan formulation runs TWO whole-tree
lax.scans (up + down) plus two projection einsums, materializing
pup/clv/out [n_nodes, C, ns, P] in HBM several times over — the
bandwidth-bound pattern the fused likelihood kernel exists to avoid,
and it is the hot 90% of a real analysis (every Newton round, every
NNI/SPR sweep starts here).

This kernel performs the ENTIRE computation per pattern tile in VMEM:
one postorder sweep storing the rescaled internal partials (clv), one
reverse sweep computing outside partials and writing d/sc_d straight
to the output — HBM traffic becomes tips+pmats read once, d written
once.  Tip partials are read from the tips operand on the fly (they
are class-independent), so scratch is clv+out for INTERNAL nodes
only.  Scaling uses the exact exponent-bit scheme of pallas_clv.py,
converted to natural-log units at the output so the Newton code
(edge_lnl_terms) is unchanged.

The d rows for the root and the zero-length root child are written
but meaningless (the callers mask them, exactly as with the scan
path).
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
_LN2 = 0.6931471805599453


def edotp_tile_size(n_otu: int, C: int, ns: int,
                    budget: int = _VMEM_BUDGET) -> int:
    """Largest lane-aligned tile: scratch (clv+sc+out+sc_out for
    internal nodes) + double-buffered operands + the d/sc_d output
    blocks must fit VMEM.  0 -> caller keeps the scan path."""
    n_int = n_otu - 1
    n_nodes = 2 * n_otu - 1
    pmats_bytes = (n_nodes * C * ns * ns + 3 * C * ns * ns) * 4 * 2
    per_col = (2 * n_int * C * (ns + 1) * 4     # clv+sc, out+sc_out
               + n_otu * ns * 4 * 2             # tips tile, 2x
               + n_nodes * C * (ns + 1) * 4 * 2)  # d + sc_d out, 2x
    avail = budget - pmats_bytes
    if avail <= 0:
        return 0
    t = (avail // per_col) // _LANE * _LANE
    return min(int(t), 1024)


def edotp_stream_tile_size(n_otu: int, C: int, ns: int,
                           budget: int = 14 * 1024 * 1024) -> int:
    """Tile for the STREAMED variant (edge_dotprods_pallas_stream):
    P-matrices AND tip rows are DMA'd from HBM per step (double-
    buffered rings driven by the SMEM child table) and d/sc_d rows
    are DMA'd back to HBM per node, so VMEM holds only the internal
    clv/out scratch plus small rings.  This removes the all-VMEM
    kernel's cliffs: active at 200-taxon DNA and 128-taxon AA, where
    edotp_tile_size returns 0.  0 -> scan fallback."""
    n_int = n_otu - 1
    lpad = -(-ns // _LANE) * _LANE
    spad = ns if ns in (1, 2, 4, 8) else -(-ns // 8) * 8
    per_col = (2 * n_int * C * (ns + 1) * 4   # clv+sc, out+sc_out
               + 4 * C * spad * 4 + 4 * C * 4  # d/scd staging rings
               + 4 * spad * 4)                # tip ring
    fixed = 2 * 3 * C * spad * lpad * 4       # pm ring
    avail = budget - fixed
    if avail <= 0:
        return 0
    t = (avail // per_col) // _LANE * _LANE
    return min(int(t), 1024)


def _edotp_stream_kernel(child_ref, tips_hbm, pmats_hbm, V_ref,
                         Vinv_ref, pi_ref, d_hbm, scd_hbm, clv_scr,
                         sc_scr, out_scr, sco_scr, pm_ring, tip_ring,
                         d_stage, scd_stage, sem_pm, sem_tip, sem_d,
                         sem_scd, *, n_otu, n_int, C, ns, spad, T,
                         tiny):
    """Streamed up+down+dotprods: one pattern tile.

    Differences from _edotp_kernel:
      * pmats (lane-padded to [n_nodes, C, ns, 128k]) and tip rows
        live in HBM; each step's child/parent matrices and (possible)
        tip rows are DMA'd into 2-deep rings with one-step prefetch
        driven by the SMEM child table.  Tip fetches are issued
        unconditionally with clamped ids (a wasted ~10 KB fetch for
        internal children costs less than divergent semaphore
        bookkeeping).
      * d/sc_d outputs live in HBM; each node's row is written to a
        VMEM staging slot and copied out asynchronously (2-deep ring),
        so no [n_nodes, C, ns, T] block ever occupies VMEM.
    """
    off = pl.program_id(0) * T

    def mv(pm, x):
        if ns <= 8:
            acc = pm[:, :, 0][:, :, None] * x[:, 0][:, None, :]
            for y in range(1, ns):
                acc = acc + pm[:, :, y][:, :, None] \
                    * x[:, y][:, None, :]
            return acc
        return lax.dot_general(
            pm, x, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)

    def mvT(pm, x):
        if ns <= 8:
            acc = pm[:, 0, :][:, :, None] * x[:, 0][:, None, :]
            for w in range(1, ns):
                acc = acc + pm[:, w, :][:, :, None] \
                    * x[:, w][:, None, :]
            return acc
        return lax.dot_general(
            pm, x, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)

    def pm_of(slot, j):
        return pm_ring[slot, j, :, 0:ns, 0:ns]

    def fetch(i, slot, with_parent):
        """Start DMA of step i's matrices + tip rows into ring slot."""
        c0 = child_ref[i, 0]
        c1 = child_ref[i, 1]
        pltpu.make_async_copy(pmats_hbm.at[c0], pm_ring.at[slot, 0],
                              sem_pm.at[slot, 0]).start()
        pltpu.make_async_copy(pmats_hbm.at[c1], pm_ring.at[slot, 1],
                              sem_pm.at[slot, 1]).start()
        pltpu.make_async_copy(pmats_hbm.at[n_otu + i],
                              pm_ring.at[slot, 2],
                              sem_pm.at[slot, 2]).start()
        t0 = jnp.minimum(c0, n_otu - 1)
        t1 = jnp.minimum(c1, n_otu - 1)
        pltpu.make_async_copy(tips_hbm.at[t0, :, pl.ds(off, T)],
                              tip_ring.at[slot, 0],
                              sem_tip.at[slot, 0]).start()
        pltpu.make_async_copy(tips_hbm.at[t1, :, pl.ds(off, T)],
                              tip_ring.at[slot, 1],
                              sem_tip.at[slot, 1]).start()

    def fetch_wait(slot):
        for j in range(3):
            pltpu.make_async_copy(pmats_hbm.at[0],
                                  pm_ring.at[slot, j],
                                  sem_pm.at[slot, j]).wait()
        for j in range(2):
            pltpu.make_async_copy(tips_hbm.at[0, :, pl.ds(0, T)],
                                  tip_ring.at[slot, j],
                                  sem_tip.at[slot, j]).wait()

    def child_clv(cid, slot, j):
        """(clv, sc) of node cid; tips come from the ring."""
        is_tip = cid < n_otu
        tip = jnp.broadcast_to(tip_ring[slot, j][0:ns][None],
                               (C, ns, T))
        idx = jnp.where(is_tip, 0, cid - n_otu)
        clv = jnp.where(is_tip, tip, clv_scr[idx])
        sc = jnp.where(is_tip, jnp.zeros((C, T), jnp.float32),
                       sc_scr[idx])
        return clv, sc

    def rescale(x):
        m = jnp.maximum(jnp.max(x, axis=1), tiny)
        bits = lax.bitcast_convert_type(m, jnp.int32)
        e = (bits >> 23) & 0xFF
        factor = lax.bitcast_convert_type((254 - e) << 23,
                                          jnp.float32)
        return x * factor[:, None, :], (e - 127).astype(jnp.float32)

    # ---- up sweep ---------------------------------------------------
    fetch(0, 0, False)

    def up(i, _):
        slot = lax.rem(i, 2)

        @pl.when(i + 1 < n_int)
        def _():
            fetch(i + 1, 1 - slot, False)
        fetch_wait(slot)
        c0 = child_ref[i, 0]
        c1 = child_ref[i, 1]
        x0, s0 = child_clv(c0, slot, 0)
        x1, s1 = child_clv(c1, slot, 1)
        x = mv(pm_of(slot, 0), x0) * mv(pm_of(slot, 1), x1)
        x, ds = rescale(x)
        clv_scr[i] = x
        sc_scr[i] = s0 + s1 + ds
        return 0

    lax.fori_loop(0, n_int, up, 0, unroll=n_int)

    # ---- down sweep + streamed d ------------------------------------
    def emit_wait(slot, j):
        pltpu.make_async_copy(d_stage.at[slot, j],
                              d_hbm.at[0, :, :, pl.ds(0, T)],
                              sem_d.at[slot, j]).wait()
        pltpu.make_async_copy(scd_stage.at[slot, j],
                              scd_hbm.at[0, :, pl.ds(0, T)],
                              sem_scd.at[slot, j]).wait()

    def emit(slot, j, node, x, sx, o, sco):
        a = mvT(V_ref[:], o)          # [C, spad, T], zero tail rows
        b = mv(Vinv_ref[:], x)        # [C, spad, T], zero tail rows
        d_stage[slot, j] = a * b
        scd_stage[slot, j] = (sco + sx) * _LN2
        pltpu.make_async_copy(d_stage.at[slot, j],
                              d_hbm.at[node, :, :, pl.ds(off, T)],
                              sem_d.at[slot, j]).start()
        pltpu.make_async_copy(scd_stage.at[slot, j],
                              scd_hbm.at[node, :, pl.ds(off, T)],
                              sem_scd.at[slot, j]).start()

    fetch(n_int - 1, 0, True)

    def down(k, _):
        i = n_int - 1 - k
        slot = lax.rem(k, 2)

        @pl.when(k + 1 < n_int)
        def _():
            fetch(n_int - 2 - k, 1 - slot, True)
        fetch_wait(slot)
        u_is_root = i == n_int - 1
        c0 = child_ref[i, 0]
        c1 = child_ref[i, 1]
        x0, s0 = child_clv(c0, slot, 0)
        x1, s1 = child_clv(c1, slot, 1)
        p0 = mv(pm_of(slot, 0), x0)
        p1 = mv(pm_of(slot, 1), x1)
        o_u = out_scr[jnp.where(u_is_root, 0, i)]
        sco_u = sco_scr[jnp.where(u_is_root, 0, i)]
        grand = mvT(pm_of(slot, 2), o_u)
        pi_b = jnp.broadcast_to(pi_ref[:][:, :, None], (C, ns, T))
        g0 = jnp.where(u_is_root, pi_b, grand)
        sg = jnp.where(u_is_root, jnp.zeros((C, T), jnp.float32),
                       sco_u)
        o0, e0 = rescale(g0 * p1)
        o1, e1 = rescale(g0 * p0)
        sco0 = sg + s1 + e0
        sco1 = sg + s0 + e1
        i0 = jnp.maximum(c0 - n_otu, 0)
        i1 = jnp.maximum(c1 - n_otu, 0)

        @pl.when(c0 >= n_otu)
        def _():
            out_scr[i0] = o0
            sco_scr[i0] = sco0

        @pl.when(c1 >= n_otu)
        def _():
            out_scr[i1] = o1
            sco_scr[i1] = sco1

        @pl.when(k >= 2)
        def _():
            emit_wait(slot, 0)
            emit_wait(slot, 1)
        emit(slot, 0, c0, x0, s0, o0, sco0)
        emit(slot, 1, c1, x1, s1, o1, sco1)
        return 0

    lax.fori_loop(0, n_int, down, 0, unroll=n_int)
    # drain the last (up to two) steps' output copies
    for back in range(min(2, n_int)):
        slot = (n_int - 1 - back) % 2
        emit_wait(slot, 0)
        emit_wait(slot, 1)
    # root row: meaningless but must be deterministic
    d_stage[0, 0] = jnp.zeros((C, spad, T), jnp.float32)
    scd_stage[0, 0] = jnp.zeros((C, T), jnp.float32)
    root = n_otu + n_int - 1
    pltpu.make_async_copy(d_stage.at[0, 0],
                          d_hbm.at[root, :, :, pl.ds(off, T)],
                          sem_d.at[0, 0]).start()
    pltpu.make_async_copy(scd_stage.at[0, 0],
                          scd_hbm.at[root, :, pl.ds(off, T)],
                          sem_scd.at[0, 0]).start()
    emit_wait(0, 0)


@functools.partial(
    jax.jit, static_argnames=("n_otu", "n_int", "C", "ns", "T",
                              "interpret"))
def edge_dotprods_pallas_stream(child, tips, pmats, V, Vinv, pi, *,
                                n_otu, n_int, C, ns, T,
                                interpret=False):
    """Streamed-variant twin of edge_dotprods_pallas (same contract);
    use when edotp_tile_size returns 0 but edotp_stream_tile_size is
    positive."""
    n_nodes = n_otu + n_int
    P = tips.shape[-1]
    tiny = float(np.finfo(np.float32).tiny)

    lpad = -(-ns // _LANE) * _LANE
    spad = ns if ns in (1, 2, 4, 8) else -(-ns // 8) * 8
    kern = functools.partial(
        _edotp_stream_kernel, n_otu=n_otu, n_int=n_int, C=C, ns=ns,
        spad=spad, T=T, tiny=tiny)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # tips (spad)
            pl.BlockSpec(memory_space=pltpu.HBM),   # pmats (padded)
            pl.BlockSpec((C, ns, spad), lambda p, c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, spad, ns), lambda p, c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, ns), lambda p, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_int, C, ns, T), jnp.float32),
            pltpu.VMEM((n_int, C, T), jnp.float32),
            pltpu.VMEM((n_int, C, ns, T), jnp.float32),
            pltpu.VMEM((n_int, C, T), jnp.float32),
            pltpu.VMEM((2, 3, C, spad, lpad), jnp.float32),
            pltpu.VMEM((2, 2, spad, T), jnp.float32),
            pltpu.VMEM((2, 2, C, spad, T), jnp.float32),
            pltpu.VMEM((2, 2, C, T), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    flops = 9 * 2 * n_nodes * C * ns * ns * P
    pm_pad = jnp.pad(pmats.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, spad - ns),
                      (0, lpad - ns)))
    tips_pad = jnp.pad(tips.astype(jnp.float32),
                       ((0, 0), (0, spad - ns), (0, 0)))
    v_pad = jnp.pad(V.astype(jnp.float32),
                    ((0, 0), (0, 0), (0, spad - ns)))
    vinv_pad = jnp.pad(Vinv.astype(jnp.float32),
                       ((0, 0), (0, spad - ns), (0, 0)))
    with jax.enable_x64(False):
        d, scd = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((n_nodes, C, spad, P),
                                     jnp.float32),
                jax.ShapeDtypeStruct((n_nodes, C, P), jnp.float32),
            ],
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(tips.size + pmats.size
                                + n_nodes * C * (ns + 1) * P) * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(
            child.astype(jnp.int32),
            tips_pad,
            pm_pad,
            v_pad,
            vinv_pad,
            pi.astype(jnp.float32),
        )
    if spad != ns:
        d = d[:, :, :ns, :]
    return d, scd


def _edotp_kernel(child_ref, tips_ref, pmats_ref, V_ref, Vinv_ref,
                  pi_ref, d_ref, scd_ref, clv_scr, sc_scr, out_scr,
                  sco_scr, *, n_otu, n_int, C, ns, tiny):
    """One pattern tile: postorder clv sweep + reverse outside sweep,
    d/sc_d written per node.

    child_ref : SMEM int32 [n_int, 2]
    tips_ref  : VMEM [n_otu, ns, T]
    pmats_ref : VMEM [n_nodes, C, ns, ns]
    V_ref     : VMEM [C, ns, ns]     right eigenvectors
    Vinv_ref  : VMEM [C, ns, ns]
    pi_ref    : VMEM [C, ns]
    d_ref     : VMEM out [n_nodes, C, ns, T]
    scd_ref   : VMEM out [n_nodes, C, T]   (natural-log units)
    clv_scr   : VMEM [n_int, C, ns, T]     internal rescaled partials
    sc_scr    : VMEM [n_int, C, T]         log2-unit scales
    out_scr   : VMEM [n_int, C, ns, T]     internal outside partials
    sco_scr   : VMEM [n_int, C, T]
    """
    T = tips_ref.shape[-1]

    def mv(pm, x):
        """per-class pm @ x: [C,ns,ns] x [C,ns,T] -> [C,ns,T]."""
        if ns <= 8:
            acc = pm[:, :, 0][:, :, None] * x[:, 0][:, None, :]
            for y in range(1, ns):
                acc = acc + pm[:, :, y][:, :, None] \
                    * x[:, y][:, None, :]
            return acc
        return lax.dot_general(
            pm, x, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)

    def mvT(pm, x):
        """per-class pm^T @ x (contract the FIRST matrix axis)."""
        if ns <= 8:
            acc = pm[:, 0, :][:, :, None] * x[:, 0][:, None, :]
            for w in range(1, ns):
                acc = acc + pm[:, w, :][:, :, None] \
                    * x[:, w][:, None, :]
            return acc
        return lax.dot_general(
            pm, x, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)

    def child_clv(cid):
        """(clv, sc) of node cid: tips from the tips operand
        (class-independent, scale 0), internal from scratch."""
        is_tip = cid < n_otu
        tip = jnp.broadcast_to(
            tips_ref[jnp.where(is_tip, cid, 0)][None], (C, ns, T))
        idx = jnp.where(is_tip, 0, cid - n_otu)
        clv = jnp.where(is_tip, tip, clv_scr[idx])
        sc = jnp.where(is_tip, jnp.zeros((C, T), jnp.float32),
                       sc_scr[idx])
        return clv, sc

    def rescale(x):
        m = jnp.maximum(jnp.max(x, axis=1), tiny)         # [C, T]
        bits = lax.bitcast_convert_type(m, jnp.int32)
        e = (bits >> 23) & 0xFF
        factor = lax.bitcast_convert_type((254 - e) << 23,
                                          jnp.float32)    # 2^(127-e)
        return x * factor[:, None, :], (e - 127).astype(jnp.float32)

    # ---- up sweep: internal clv (pre-push partials) -----------------
    def up(i, _):
        c0 = child_ref[i, 0]
        c1 = child_ref[i, 1]
        x0, s0 = child_clv(c0)
        x1, s1 = child_clv(c1)
        x = mv(pmats_ref[c0], x0) * mv(pmats_ref[c1], x1)
        x, ds = rescale(x)
        clv_scr[i] = x
        sc_scr[i] = s0 + s1 + ds
        return 0

    lax.fori_loop(0, n_int, up, 0, unroll=n_int)

    # ---- down sweep: outside partials + d per node ------------------
    def emit(node, o, sco):
        """d[node] = (V^T o) * (Vinv clv_node); sc_d natural log."""
        x, sx = child_clv(node)
        a = mvT(V_ref[:], o)
        b = mv(Vinv_ref[:], x)
        d_ref[node] = a * b
        scd_ref[node] = (sco + sx) * _LN2

    def down(k, _):
        i = n_int - 1 - k                 # root row first
        u_is_root = i == n_int - 1
        c0 = child_ref[i, 0]
        c1 = child_ref[i, 1]
        x0, s0 = child_clv(c0)
        x1, s1 = child_clv(c1)
        p0 = mv(pmats_ref[c0], x0)
        p1 = mv(pmats_ref[c1], x1)
        # outside of this node (meaningless at the root row)
        o_u = out_scr[jnp.where(u_is_root, 0, i)]
        sco_u = sco_scr[jnp.where(u_is_root, 0, i)]
        grand = mvT(pmats_ref[n_otu + i], o_u)
        pi_b = jnp.broadcast_to(pi_ref[:][:, :, None], (C, ns, T))
        g0 = jnp.where(u_is_root, pi_b, grand)
        sg = jnp.where(u_is_root, jnp.zeros((C, T), jnp.float32),
                       sco_u)
        o0, e0 = rescale(g0 * p1)
        o1, e1 = rescale(g0 * p0)
        sco0 = sg + s1 + e0
        sco1 = sg + s0 + e1
        # stash outside partials for internal children (indices
        # clamped so the disabled branch never sees a negative slot)
        i0 = jnp.maximum(c0 - n_otu, 0)
        i1 = jnp.maximum(c1 - n_otu, 0)

        @pl.when(c0 >= n_otu)
        def _():
            out_scr[i0] = o0
            sco_scr[i0] = sco0

        @pl.when(c1 >= n_otu)
        def _():
            out_scr[i1] = o1
            sco_scr[i1] = sco1
        emit(c0, o0, sco0)
        emit(c1, o1, sco1)
        return 0

    lax.fori_loop(0, n_int, down, 0, unroll=n_int)
    # root row: meaningless but must be written
    d_ref[n_otu + n_int - 1] = jnp.zeros((C, ns, T), jnp.float32)
    scd_ref[n_otu + n_int - 1] = jnp.zeros((C, T), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("n_otu", "n_int", "C", "ns", "T",
                              "interpret"))
def edge_dotprods_pallas(child, tips, pmats, V, Vinv, pi, *, n_otu,
                         n_int, C, ns, T, interpret=False):
    """(d [n_nodes, C, ns, P], sc_d [n_nodes, C, P]) via the fused
    kernel; P a multiple of T.  Matches
    LikelihoodEngine.edge_dotprods_sys's (d, sc_d) to f32 roundoff."""
    n_nodes = n_otu + n_int
    P = tips.shape[-1]
    tiny = float(np.finfo(np.float32).tiny)

    kern = functools.partial(
        _edotp_kernel, n_otu=n_otu, n_int=n_int, C=C, ns=ns,
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
            pl.BlockSpec((C, ns, ns), lambda p, c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, ns, ns), lambda p, c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, ns), lambda p, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_nodes, C, ns, T),
                         lambda p, c: (0, 0, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_nodes, C, T), lambda p, c: (0, 0, p),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_int, C, ns, T), jnp.float32),
            pltpu.VMEM((n_int, C, T), jnp.float32),
            pltpu.VMEM((n_int, C, ns, T), jnp.float32),
            pltpu.VMEM((n_int, C, T), jnp.float32),
        ],
    )
    flops = 9 * 2 * n_nodes * C * ns * ns * P
    with jax.enable_x64(False):
        d, scd = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((n_nodes, C, ns, P),
                                     jnp.float32),
                jax.ShapeDtypeStruct((n_nodes, C, P), jnp.float32),
            ],
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(tips.size + pmats.size
                                + n_nodes * C * (ns + 1) * P) * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(
            child.astype(jnp.int32),
            tips.astype(jnp.float32),
            pmats.astype(jnp.float32),
            V.astype(jnp.float32),
            Vinv.astype(jnp.float32),
            pi.astype(jnp.float32),
        )
    return d, scd
