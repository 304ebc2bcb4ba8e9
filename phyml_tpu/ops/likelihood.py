"""The likelihood engine: Felsenstein pruning as one compiled program.

This is the TPU-native replacement for the reference's hot core
(lk.c:443 Lk, lk.c:1659 Core_Default_Update_Partial_Lk, the SIMD
kernels avx.c/sse.c, and the per-edge conditional-likelihood storage
of t_edge).  Design:

  * Topology is *data*: a postorder child table (int32 [n_int, 2]) and
    a branch-length vector indexed by rooted node.  Every topology of
    the same taxon count runs the same XLA executable - no recompiles
    during tree search.
  * The up (postorder) pass is a `lax.scan` over internal nodes.  Each
    step combines two child partials (elementwise product), rescales
    per (class, pattern) with an exact log accumulator (replacing the
    reference's 2^256-block scheme, utilities.h:493-520 +
    lk.c:1748-1758), and pushes through the edge's P(t) as an
    (ns x ns) @ (ns x P) matmul batched over classes - MXU/VPU work
    with the pattern axis on the 128-lane dimension.
  * The down (preorder) pass produces, for every node u, the "outside"
    partial O[u] (the likelihood of all data outside subtree(u),
    conditional on the state at u's parent, with the stationary
    distribution folded in at the root).  This generalizes the
    reference's per-edge p_lk_left/p_lk_rght pairs.
  * Per-edge eigen-basis dot products d_i = (V^T O)_i (V^-1 up)_i give
    L_site(t) = sum_i d_i exp(lam_i t) for *every* edge at once -
    the eigen-LR reparameterization (lk.c:1038 Update_Eigen_Lr,
    lk.c:655 dLk) vectorized over all edges, which powers the
    parallel-Newton branch-length optimizer.
  * Class mixing (Gamma / FreeRate / LG4X mixtures) is a leading axis;
    the +I invariant fraction mixes at the root exactly as
    lk.c:820-837.  All per-site logs accumulate in float64.

Sites (patterns) are the sharding axis: all arrays carry the pattern
dimension last, and `parallel/mesh.py` shards it across devices; the
only cross-device communication is the final weighted reduction.
"""

from __future__ import annotations

import collections
import logging
import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from phyml_tpu.io.alignment import Alignment
from phyml_tpu.models.eigen import pmat, pmat_mgf_gamma
from phyml_tpu.models.substitution import SubstModel

_PREC = lax.Precision.HIGHEST  # fp32 matmuls must not round to bf16


class TreeArrays(NamedTuple):
    """Device-side topology + branch lengths (see topology.RootedView)."""
    child: jnp.ndarray   # int32 [n_internal, 2], postorder, last row=root
    blen: jnp.ndarray    # [n_nodes] edge length to parent (root slot 0)


class Partials(NamedTuple):
    """All per-node conditional likelihoods from one full pass."""
    clv: jnp.ndarray     # [n_nodes, C, ns, P] normalized below-partials
    pup: jnp.ndarray     # [n_nodes, C, ns, P] P(t_u) @ clv[u]
    sc: jnp.ndarray      # [n_nodes, C, P] log-scale of clv/pup
    out: jnp.ndarray     # [n_nodes, C, ns, P] outside partials O[u]
    sc_out: jnp.ndarray  # [n_nodes, C, P]


# host-side child tables, keyed by the DEVICE array's id: the slot
# kernel needs the concrete topology to build its schedule, and a
# device->host read-back of the child array would both cost a full
# sync AND permanently degrade every subsequent dispatch on the
# remote-attached TPU runtime (measured r4: ~0.03 ms -> ~1.2 ms per
# dispatch, irreversible for the process).  Entries hold a strong
# reference to the device array so ids cannot be reused.  Eviction is
# LRU one-at-a-time (an all-at-once clear() would silently drop LIVE
# trees to sched=None scan fallbacks mid-analysis).
_HOST_CHILD: collections.OrderedDict = collections.OrderedDict()
_HOST_CHILD_CAP = 4096

_log = logging.getLogger("phyml_tpu")


def tree_arrays(rv, dtype=jnp.float32) -> TreeArrays:
    child = jnp.asarray(rv.child, dtype=jnp.int32)
    _HOST_CHILD[id(child)] = (child, np.asarray(rv.child))
    _HOST_CHILD.move_to_end(id(child))
    while len(_HOST_CHILD) > _HOST_CHILD_CAP:
        _HOST_CHILD.popitem(last=False)
    return TreeArrays(
        child=child,
        blen=jnp.asarray(rv.node_blen, dtype=dtype),
    )


class LikelihoodEngine:
    """Compiled likelihood programs for one (alignment, model) pair."""

    def __init__(
        self,
        aln: Alignment,
        model: SubstModel,
        dtype=jnp.float32,
        pattern_pad: int = 128,
        use_pallas: bool | None = None,
    ):
        """To run SPMD over a device mesh, build the engine then
        re-place the pattern-axis arrays with a sharding
        (parallel.mesh.shard_pattern_arrays): sites are the data-
        parallel axis, and XLA turns the weighted per-site reduction
        into the program's only collective (replacing mpi_boot.c)."""
        self.aln = aln
        self.model = model
        self.dtype = dtype
        self.n_otu = aln.n_otu
        self.ns = model.ns
        self.C = model.n_classes
        self.n_nodes = 2 * self.n_otu - 1
        self.n_internal = self.n_otu - 1

        # Fused Pallas kernel (ops/pallas_clv.py) replaces the scan up
        # pass on TPU whenever the per-tile scratch fits VMEM; the
        # pattern axis is padded to a multiple of its tile.
        from phyml_tpu.ops.pallas_clv import tile_size
        if use_pallas is None:
            use_pallas = (jax.default_backend() == "tpu"
                          and dtype == jnp.float32)
        tile = tile_size(self.n_nodes, self.C, self.ns, self.n_otu)
        self.pallas_tile = tile if (use_pallas and tile >= 128) else 0
        # Slot-allocated kernel (ops/pallas_clv_slots.py): O(log n)
        # scratch instead of O(n_nodes) — bigger tiles on every
        # problem and no scale cliff.  It needs a host-built schedule
        # per topology, so it serves the HOST entry points (loglik /
        # site_logliks); traced-topology callers (search scorers,
        # vmapped batch evals) keep the dense kernel or the scan.
        from phyml_tpu.ops.pallas_clv_slots import slot_tile_size
        self.slot_count = int(math.ceil(
            math.log2(max(self.n_otu, 2)))) + 2
        st = slot_tile_size(self.n_otu, self.slot_count, self.C,
                            self.ns)
        self.slot_tile = st if (use_pallas and st >= 128) else 0
        # streamed slot variant: pmats/tips DMA'd from HBM per step;
        # covers problems past even the slot kernel's pmats-in-VMEM
        # ceiling (~400-taxon AA)
        from phyml_tpu.ops.pallas_clv_slots import slot_stream_tile_size
        sst = 0
        if use_pallas and not self.slot_tile:
            sst = slot_stream_tile_size(self.n_otu, self.slot_count,
                                        self.C, self.ns)
        self.slot_stream_tile = sst if sst >= 128 else 0
        self._sched_cache: collections.OrderedDict = \
            collections.OrderedDict()
        self._sched_warned = False
        # P-matrix cache for host entry points: pmats depend only on
        # (eigensystem, branch lengths); repeated evaluations of the
        # same tree (bootstrap weight resampling, support statistics,
        # parameter-held sweeps) skip the ~25 us pmat dispatch
        # entirely (measured r5: 37 -> 28 us per full likelihood).
        self._pm_cache: collections.OrderedDict = \
            collections.OrderedDict()
        # off-TPU the kernel runs in interpret mode (tests force
        # use_pallas=True on the virtual CPU mesh)
        self.pallas_interpret = bool(self.pallas_tile) and \
            jax.default_backend() != "tpu"
        # optional SPMD mesh: set by parallel.mesh.sharded_engine; the
        # fused kernel then runs per-shard under shard_map
        self._mesh = None
        self._shard_axis = None

        P_raw = aln.n_patterns
        quantum = pattern_pad
        self.P = max(quantum, int(
            math.ceil(P_raw / quantum) * quantum
        ))
        # align the padded pattern count with the dominant kernel's
        # tile: padding to the bare lane quantum can land on a prime
        # multiple of 128 (e.g. 3932 patterns -> P=3968=31*128) that
        # forces the divisibility loops below down to a 128-wide tile,
        # ~3x slower than the VMEM-optimal tile.  Only when the caller
        # did not demand a custom quantum (sharded engines pad to
        # 128*n_shards).
        if use_pallas and quantum == 128:
            # choose P to MINIMIZE padded work over the lane-aligned
            # tile choices of the preferred kernel (slot where it
            # fits: 13.0e9 vs 7.4e9 true-synced updates/s vs dense),
            # tie-breaking toward the largest tile: padding to the
            # kernel's maximum tile can double the padded pattern
            # count on small alignments (460 patterns -> P=2048 at
            # T=1024 vs P=512 at T=512), and the scan-path scorers
            # pay that padding in real compute
            tq_cap = st if st >= 128 else (
                tile if tile >= 128 else (sst if sst >= 128 else 0))
            if tq_cap:
                best_pc, best_t = None, 0
                for t_ in range(128, tq_cap + 1, 128):
                    pc = int(math.ceil(P_raw / t_) * t_)
                    if best_pc is None or pc < best_pc or \
                            (pc == best_pc and t_ > best_t):
                        best_pc, best_t = pc, t_
                self.P = max(best_pc, 128)
        pad = self.P - P_raw
        # both kernel tiles must divide the padded pattern count;
        # padding to the lane quantum (not to a tile) keeps P minimal
        # and lets the slot kernel pick its largest fitting tile
        # (e.g. P=4096 -> T=2048 instead of P=4224 -> T=1408)
        while self.pallas_tile and self.P % self.pallas_tile:
            self.pallas_tile -= 128
        if self.pallas_tile < 128:
            self.pallas_tile = 0
        while self.slot_tile and self.P % self.slot_tile:
            self.slot_tile -= 128
        if self.slot_tile < 128:
            self.slot_tile = 0
        while self.slot_stream_tile and self.P % self.slot_stream_tile:
            self.slot_stream_tile -= 128
        if self.slot_stream_tile < 128:
            self.slot_stream_tile = 0
        # fused up+down+dotprods kernel (ops/pallas_edotp.py) for the
        # optimizer/search hot path; 0 -> scan fallback
        from phyml_tpu.ops.pallas_edotp import edotp_tile_size
        et = edotp_tile_size(self.n_otu, self.C, self.ns)
        self.edotp_tile = et if (use_pallas and dtype == jnp.float32
                                 and et >= 128) else 0
        while self.edotp_tile and self.P % self.edotp_tile:
            self.edotp_tile -= 128
        if self.edotp_tile < 128:
            self.edotp_tile = 0
        # streamed variant: outputs + pmats DMA'd to/from HBM, so it
        # stays active far beyond the all-VMEM kernel's ceiling
        # (200-taxon DNA, 128-taxon AA); used only when the all-VMEM
        # kernel does not fit (it is faster where it does).
        from phyml_tpu.ops.pallas_edotp import edotp_stream_tile_size
        self.edotp_stream_tile = 0
        if not self.edotp_tile and use_pallas and dtype == jnp.float32:
            est = edotp_stream_tile_size(self.n_otu, self.C, self.ns)
            self.edotp_stream_tile = est if est >= 128 else 0
            while self.edotp_stream_tile and \
                    self.P % self.edotp_stream_tile:
                self.edotp_stream_tile -= 128
            if self.edotp_stream_tile < 128:
                self.edotp_stream_tile = 0
        self._interp = jax.default_backend() != "tpu"

        tips = np.transpose(aln.partials, (0, 2, 1))  # [n_otu, ns, P_raw]
        tips = np.pad(tips, ((0, 0), (0, 0), (0, pad)),
                      constant_values=1.0)
        if self.ns != tips.shape[1]:
            # covarion: replicate the observed-state tip vector for
            # every hidden class (M4_Init_Partial_Lk_Tips m4.c:528)
            tips = np.tile(tips, (1, self.ns // tips.shape[1], 1))
        self.tips = jnp.asarray(tips, dtype=dtype)
        self.weights = jnp.asarray(
            np.pad(aln.weights, (0, pad)), dtype=jnp.float64
        )
        inv = np.pad(aln.invariant, (0, pad), constant_values=-1)
        self.invar_state = jnp.asarray(np.maximum(inv, 0),
                                       dtype=jnp.int32)
        self.invar_ok = jnp.asarray(inv >= 0, dtype=dtype)

        self._tiny = np.finfo(np.float32).tiny if dtype == jnp.float32 \
            else np.finfo(np.float64).tiny

        # compiled entry points (weights default to the alignment's
        # pattern counts; bootstrap passes resampled vectors).
        # ALL device data (tips, invariant masks) rides in as jit
        # ARGUMENTS via bind_data, never as closure constants: on the
        # tunneled TPU runtime, programs with multi-MB embedded
        # constants execute ~20x slower (measured 0.79 ms vs 0.034 ms
        # per full-likelihood eval) and degrade every subsequent
        # dispatch in the process.
        self._jit_loglik = jax.jit(self.bind_data(self._loglik))
        self._jit_loglik_full = jax.jit(
            self.bind_data(self._loglik_full))
        self._jit_site_logliks = jax.jit(
            self.bind_data(self._site_logliks))
        # host-cached eigensystem path: the eigendecomposition only
        # changes when model parameters change (the reference runs
        # Update_Eigen models.c:881 once per parameter update, then
        # PMat per edge), so host-driven loops (branch-length rounds,
        # bootstrap scoring, search scorers) reuse one device-resident
        # system instead of re-tracing eigh into every program —
        # measured ~2x on the full-likelihood eval
        self._jit_system = jax.jit(self._system)
        self._jit_loglik_sys = jax.jit(self.bind_data(self._loglik_sys))
        self._jit_site_logliks_sys = jax.jit(
            self.bind_data(self._site_logliks_sys))
        self._sys_cache = None

    # ------------------------------------------------------------------
    # device-data threading: tips + invariant masks as jit arguments
    # ------------------------------------------------------------------
    def data(self):
        """The engine's device-resident data arrays, to be passed as
        the first argument of any bind_data-wrapped jitted program."""
        return (self.tips, self.invar_state, self.invar_ok)

    def bind_data(self, fn):
        """Wrap fn so its first argument is the data() tuple: during
        tracing the engine attributes are swapped for the traced
        values, so every internal method reads traced arguments
        instead of baking device arrays into the program."""
        # NB: no functools.wraps — copying fn's signature would make
        # jax.jit resolve static_argnames against the UNSHIFTED
        # argument positions (the data tuple prepends one)
        def wrapped(data, *args, **kw):
            old = (self.tips, self.invar_state, self.invar_ok)
            self.tips, self.invar_state, self.invar_ok = data
            try:
                return fn(*args, **kw)
            finally:
                self.tips, self.invar_state, self.invar_ok = old

        return wrapped

    def _w(self, weights):
        return self.weights if weights is None else weights

    def system_of(self, params):
        """Device-resident (lam, V, Vinv, pi, w, pinv), cached by the
        CONTENT identity of the params dict: its tree structure plus
        the object identity of every leaf.  jax/np arrays are replaced
        (never mutated) when a parameter changes, so a stale hit would
        require writing into an existing ndarray in place — guarded
        against dict-level mutation (params["alpha"] = x), which dict-
        identity keying silently missed."""
        leaves, treedef = jax.tree_util.tree_flatten(params)
        key = (treedef, tuple(id(l) for l in leaves))
        hit = self._sys_cache
        if hit is not None and hit[0] == key:
            return hit[2]
        sys = self._jit_system(params)
        # keep a strong ref to the leaves so their ids cannot be reused
        self._sys_cache = (key, leaves, sys)
        return sys

    def invalidate_system_cache(self):
        self._sys_cache = None

    def _slot_sched(self, child):
        """Per-topology slot schedule (host-built; see
        pallas_clv_slots.build_slot_schedule).  Cached FIRST by the
        child array's object identity — np.asarray(child) costs a
        full device->host sync (~40 ms on a remote-attached TPU), so
        repeated evaluations of the same TreeArrays must not pay it —
        then by the topology bytes.  The identity entries keep strong
        references to the child arrays so ids cannot be reused."""
        from phyml_tpu.ops.pallas_clv_slots import build_slot_schedule
        hit = self._sched_cache.get(id(child))
        if hit is not None:
            self._sched_cache.move_to_end(id(child))
            return hit[1]
        host = _HOST_CHILD.get(id(child))
        if host is None:
            # child did not come through tree_arrays (e.g. built
            # inside another trace): reading it back from the device
            # would poison the dispatch path — caller must fall back
            if not self._sched_warned:
                self._sched_warned = True
                _log.info(
                    "slot-kernel path unavailable for a topology not "
                    "built via tree_arrays(); using the scan fallback "
                    "(logged once)")
            return None
        child_np = host[1]
        sched, n_slots = build_slot_schedule(self.n_otu, child_np)
        assert n_slots <= self.slot_count, (n_slots, self.slot_count)
        sched = jnp.asarray(sched)
        self._sched_cache[id(child)] = (child, sched)
        while len(self._sched_cache) > 1024:
            self._sched_cache.popitem(last=False)
        return sched

    # ------------------------------------------------------------------
    # host-side P-matrix cache (system x branch-length identity)
    # ------------------------------------------------------------------
    def _pm_get(self, sys, tree):
        key = (id(sys), id(tree.blen))
        hit = self._pm_cache.get(key)
        if hit is None:
            return None
        self._pm_cache.move_to_end(key)
        return hit[2]

    def _pm_store(self, sys, tree, pmats):
        # strong refs to sys and blen keep their ids from being reused
        self._pm_cache[(id(sys), id(tree.blen))] = (sys, tree.blen,
                                                    pmats)
        while len(self._pm_cache) > 32:
            self._pm_cache.popitem(last=False)

    def _site_logliks_slots_pm(self, sys, pmats, sched):
        from phyml_tpu.ops.pallas_clv_slots import (
            uppass_site_lse_slots, uppass_site_lse_slots_stream,
        )
        lam, V, Vinv, pi, w, pinv = sys
        logw = jnp.log(jnp.maximum(w, self._tiny))
        if self.slot_tile:
            lse = uppass_site_lse_slots(
                sched, self.tips, pmats, pi, logw,
                n_otu=self.n_otu, n_int=self.n_internal, C=self.C,
                ns=self.ns, n_slots=self.slot_count,
                T=self.slot_tile, interpret=self._interp)
        else:
            lse = uppass_site_lse_slots_stream(
                sched, self.tips, pmats, pi, logw,
                n_otu=self.n_otu, n_int=self.n_internal, C=self.C,
                ns=self.ns, n_slots=self.slot_count,
                T=self.slot_stream_tile, interpret=self._interp)
        return self._mix_invar(lse.astype(self.dtype), pi, w, pinv)

    def _site_logliks_slots(self, sys, tree, sched):
        lam, V, Vinv, pi, w, pinv = sys
        pmats = self._pmats(lam, V, Vinv, tree.blen.astype(self.dtype))
        return self._site_logliks_slots_pm(sys, pmats, sched)

    def _jit_cached(self, name, f):
        fn = getattr(self, name, None)
        if fn is None:
            fn = jax.jit(self.bind_data(f))
            setattr(self, name, fn)
        return fn

    @property
    def _jit_loglik_slots2(self):
        def f(sys, tree, sched, weights):
            lam, V, Vinv, pi, w, pinv = sys
            pmats = self._pmats(lam, V, Vinv,
                                tree.blen.astype(self.dtype))
            site = self._site_logliks_slots_pm(sys, pmats, sched)
            return jnp.sum(site.astype(jnp.float64) * weights), pmats
        return self._jit_cached("_jit_loglik_slots2_", f)

    @property
    def _jit_loglik_slots_pm(self):
        def f(sys, pmats, sched, weights):
            site = self._site_logliks_slots_pm(sys, pmats, sched)
            return jnp.sum(site.astype(jnp.float64) * weights)
        return self._jit_cached("_jit_loglik_slots_pm_", f)

    @property
    def _jit_site_logliks_slots(self):
        return self._jit_cached("_jit_site_logliks_slots_",
                                self._site_logliks_slots)

    @property
    def _jit_site_logliks_slots_pm(self):
        return self._jit_cached("_jit_site_logliks_slots_pm_",
                                self._site_logliks_slots_pm)

    @property
    def _jit_loglik_sys2(self):
        def f(sys, tree, weights):
            lam, V, Vinv, pi, w, pinv = sys
            pmats = self._pmats(lam, V, Vinv,
                                tree.blen.astype(self.dtype))
            site = self._site_logliks_pm(sys, pmats, tree.child)
            return jnp.sum(site.astype(jnp.float64) * weights), pmats
        return self._jit_cached("_jit_loglik_sys2_", f)

    @property
    def _jit_loglik_pm(self):
        def f(sys, pmats, child, weights):
            site = self._site_logliks_pm(sys, pmats, child)
            return jnp.sum(site.astype(jnp.float64) * weights)
        return self._jit_cached("_jit_loglik_pm_", f)

    @property
    def _jit_site_logliks_pm(self):
        return self._jit_cached("_jit_site_logliks_pm_",
                                self._site_logliks_pm)

    def _use_slot(self):
        return ((self.slot_tile or
                 getattr(self, "slot_stream_tile", 0))
                and self._mesh is None)

    def loglik(self, params, tree, weights=None):
        sys = self.system_of(params)
        # slot path preferred wherever a host-built schedule exists:
        # its O(log n) scratch makes dynamic slot indexing far cheaper
        # than the dense kernel's node-indexed scratch (measured r5
        # true-synced on 128x4096 GTR+Gamma4: 13.0e9 vs 7.4e9
        # updates/s); dense remains the traced-topology fallback
        if self._use_slot():
            sched = self._slot_sched(tree.child)
            if sched is not None:
                pm = self._pm_get(sys, tree)
                if pm is not None:
                    return self._jit_loglik_slots_pm(
                        self.data(), sys, pm, sched, self._w(weights))
                lnl, pmats = self._jit_loglik_slots2(
                    self.data(), sys, tree, sched, self._w(weights))
                self._pm_store(sys, tree, pmats)
                return lnl
        if self._mesh is not None:
            return self._jit_loglik_sys(self.data(), sys, tree,
                                        self._w(weights))
        pm = self._pm_get(sys, tree)
        if pm is not None:
            return self._jit_loglik_pm(self.data(), sys, pm,
                                       tree.child, self._w(weights))
        lnl, pmats = self._jit_loglik_sys2(self.data(), sys, tree,
                                           self._w(weights))
        self._pm_store(sys, tree, pmats)
        return lnl

    def site_logliks(self, params, tree):
        sys = self.system_of(params)
        if self._use_slot():
            sched = self._slot_sched(tree.child)
            if sched is not None:
                pm = self._pm_get(sys, tree)
                if pm is not None:
                    return self._jit_site_logliks_slots_pm(
                        self.data(), sys, pm, sched)
                return self._jit_site_logliks_slots(
                    self.data(), sys, tree, sched)
        if self._mesh is None:
            pm = self._pm_get(sys, tree)
            if pm is not None:
                return self._jit_site_logliks_pm(self.data(), sys, pm,
                                                 tree.child)
        return self._jit_site_logliks_sys(self.data(), sys, tree)

    def loglik_full(self, params, tree, weights=None):
        return self._jit_loglik_full(self.data(), params, tree,
                                     self._w(weights))

    # ------------------------------------------------------------------
    # model plumbing
    # ------------------------------------------------------------------
    def _system(self, params):
        lam, V, Vinv, pi, w, pinv = self.model.class_system(params)
        if "il_sigma" in params:
            # Integrated-length (IL) model (reference --il,
            # gamma_mgf_bl cl.c:430-434): each branch length is
            # Gamma-distributed with mean t and variance t*sigma, and
            # E[P(L)] = V diag((1-lam*sigma)^(-t/sigma)) V^-1
            #         = V diag(exp(t*mu)) V^-1,
            # with mu = -log(1-lam*sigma)/sigma — an exponential
            # family in t again.  Substituting mu for lam here makes
            # EVERY downstream path (fused kernels, scans, eigen-LR
            # Newton, NNI/SPR scorers, full topology search) exact
            # under IL with zero further changes; the reference
            # instead special-cases PMat (models.c:1044) and falls
            # back to per-edge Brent for lengths.
            sig = jnp.exp(params["il_sigma"])
            lam_il = -jnp.log(jnp.maximum(1.0 - lam * sig, 1e-30)) \
                / jnp.maximum(sig, 1e-30)
            lam = jnp.where(sig > 1e-12, lam_il, lam)
        c = lambda x: jnp.asarray(x, dtype=self.dtype)
        return c(lam), c(V), c(Vinv), c(pi), c(w), c(pinv)

    def _pmats(self, lam, V, Vinv, blen):
        """P [n_nodes, C, ns, ns]; class rates are folded into lam."""
        t = jnp.broadcast_to(blen[:, None], (self.n_nodes, self.C))
        return pmat(lam, V, Vinv, t.astype(self.dtype))

    # ------------------------------------------------------------------
    # up (postorder) pass
    # ------------------------------------------------------------------
    def _up_pass(self, pmats, child, mask=None):
        """mask (optional) [n_internal, 2] in {0., 1.}: a 1 makes the
        corresponding child contribute a unit factor, i.e. the node
        behaves as if that child subtree were pruned.  Because P
        matrices of the same Q compose (P(a)P(b) = P(a+b)), the
        resulting partials are exactly those of the healed tree with
        the two link edges merged - the device-side equivalent of the
        reference's Prune_Subtree (utilities.c:6152)."""
        n, C, ns, P = self.n_otu, self.C, self.ns, self.P
        dtype = self.dtype

        pup = jnp.zeros((self.n_nodes, C, ns, P), dtype=dtype)
        clv = jnp.zeros((self.n_nodes, C, ns, P), dtype=dtype)
        sc = jnp.zeros((self.n_nodes, C, P), dtype=dtype)

        tip_clv = jnp.broadcast_to(
            self.tips[:, None, :, :], (n, C, ns, P)
        )
        pup_tips = jnp.einsum(
            "ncxy,ncyp->ncxp", pmats[:n], tip_clv, precision=_PREC
        )
        pup = pup.at[:n].set(pup_tips)
        clv = clv.at[:n].set(tip_clv)

        def step(carry, args):
            pup, clv, sc = carry
            i, pm = args
            c0 = child[i, 0]
            c1 = child[i, 1]
            u = n + i
            if mask is None:
                p0, p1 = pup[c0], pup[c1]
                s0, s1 = sc[c0], sc[c1]
            else:
                m0 = mask[i, 0]
                m1 = mask[i, 1]
                p0 = pup[c0] * (1.0 - m0) + m0
                p1 = pup[c1] * (1.0 - m1) + m1
                s0 = sc[c0] * (1.0 - m0)
                s1 = sc[c1] * (1.0 - m1)
            x = p0 * p1                                 # [C, ns, P]
            m = jnp.max(x, axis=1, keepdims=True)
            m = jnp.maximum(m, self._tiny)
            x = x / m
            sc_u = s0 + s1 + jnp.log(m[:, 0, :])
            pup_u = jnp.einsum("cxy,cyp->cxp", pm, x, precision=_PREC)
            return (
                pup.at[u].set(pup_u),
                clv.at[u].set(x),
                sc.at[u].set(sc_u),
            ), None

        idx = jnp.arange(self.n_internal)
        (pup, clv, sc), _ = lax.scan(
            step, (pup, clv, sc), (idx, pmats[n:])
        )
        return pup, clv, sc

    # ------------------------------------------------------------------
    # down (preorder) pass
    # ------------------------------------------------------------------
    def _down_pass(self, pmats, child, pup, sc, pi, mask=None):
        """Outside partials; `mask` as in _up_pass (a masked child's
        sibling sees a unit factor in place of the masked subtree)."""
        n, C, ns, P = self.n_otu, self.C, self.ns, self.P
        out = jnp.zeros_like(pup)
        sc_out = jnp.zeros_like(sc)

        r0 = child[-1, 0]
        r1 = child[-1, 1]
        pi_b = pi[:, :, None]
        out = out.at[r0].set(pi_b * pup[r1])
        sc_out = sc_out.at[r0].set(sc[r1])
        out = out.at[r1].set(pi_b * pup[r0])
        sc_out = sc_out.at[r1].set(sc[r0])

        def step(carry, i):
            out, sc_out = carry
            u = n + i
            c0 = child[i, 0]
            c1 = child[i, 1]
            if mask is None:
                p0, p1 = pup[c0], pup[c1]
                s0, s1 = sc[c0], sc[c1]
            else:
                m0 = mask[i, 0]
                m1 = mask[i, 1]
                p0 = pup[c0] * (1.0 - m0) + m0
                p1 = pup[c1] * (1.0 - m1) + m1
                s0 = sc[c0] * (1.0 - m0)
                s1 = sc[c1] * (1.0 - m1)
            grand = jnp.einsum(
                "cwz,cwp->czp", pmats[u], out[u], precision=_PREC
            )
            o0 = grand * p1
            o1 = grand * p0
            m0_ = jnp.maximum(jnp.max(o0, axis=1, keepdims=True),
                              self._tiny)
            m1_ = jnp.maximum(jnp.max(o1, axis=1, keepdims=True),
                              self._tiny)
            base = sc_out[u]
            return (
                out.at[c0].set(o0 / m0_).at[c1].set(o1 / m1_),
                sc_out
                .at[c0].set(base + s1 + jnp.log(m0_[:, 0, :]))
                .at[c1].set(base + s0 + jnp.log(m1_[:, 0, :])),
            ), None

        # reverse preorder: internal nodes except the root row
        idx = jnp.arange(self.n_internal - 2, -1, -1)
        (out, sc_out), _ = lax.scan(step, (out, sc_out), idx)
        return out, sc_out

    # ------------------------------------------------------------------
    # root reduction
    # ------------------------------------------------------------------
    def _inv_lk(self, pi, w):
        """Per-pattern invariant-site likelihood pi[invar_state]
        (lk.c:1240), 0 for non-invariant patterns."""
        pi_mix = jnp.einsum("c,cx->x", w, pi)
        if self.model.covarion:
            # invariant patterns are defined over OBSERVED states;
            # marginalize the hidden classes out of pi
            pi_mix = pi_mix.reshape(self.model.n_hidden, -1).sum(0)
        return pi_mix[self.invar_state] * self.invar_ok

    def _root_site_loglik(self, pup, sc, pi, w, pinv):
        """log L per pattern [P], mixing classes and +I exactly as the
        reference root loop (lk.c:767-860 Lk_Core; invariant mix
        lk.c:820-837: L = (1-p) L_var + p pi[invar])."""
        root = self.n_nodes - 1
        lroot = jnp.einsum(
            "cx,cxp->cp", pi, pup[root], precision=_PREC
        )
        lroot = jnp.maximum(lroot, self._tiny)
        a = jnp.log(w)[:, None] + sc[root] + jnp.log(lroot)  # [C, P]
        lse = jax.scipy.special.logsumexp(a, axis=0)         # [P]
        return self._mix_invar(lse, pi, w, pinv)

    def _mix_invar(self, lse, pi, w, pinv):
        """Fold the +I invariant fraction into the variable-rate site
        log-likelihoods (lk.c:820-837: L = (1-p) L_var + p pi[invar])."""
        if not self.model.invar:
            return lse
        inv_lk = self._inv_lk(pi, w)
        var_part = jnp.log1p(-pinv) + lse
        inv_part = jnp.log(jnp.maximum(pinv * inv_lk, self._tiny))
        return jnp.where(
            self.invar_ok > 0,
            jnp.logaddexp(var_part, inv_part),
            var_part,
        )

    def _site_loglik_fused(self, params, tree: TreeArrays,
                           interpret=False):
        """Site log-likelihoods via the fused Pallas up-pass kernel
        (ops/pallas_clv.py) - TPU path for plain full-tree likelihood
        evaluations (bootstrap scoring, parameter Brent steps)."""
        return self._site_loglik_fused_sys(self._system(params), tree,
                                           interpret)

    def _site_loglik_fused_sys(self, sys, tree: TreeArrays,
                               interpret=None):
        lam, V, Vinv, pi, w, pinv = sys
        pmats = self._pmats(lam, V, Vinv, tree.blen.astype(self.dtype))
        return self._site_loglik_fused_pm(sys, pmats, tree.child,
                                          interpret)

    def _site_loglik_fused_pm(self, sys, pmats, child, interpret=None):
        from phyml_tpu.ops.pallas_clv import uppass_site_lse
        if interpret is None:
            interpret = self.pallas_interpret
        lam, V, Vinv, pi, w, pinv = sys
        lse = uppass_site_lse(
            child, self.tips, pmats, pi,
            jnp.log(jnp.maximum(w, self._tiny)),
            n_otu=self.n_otu, n_int=self.n_internal, C=self.C,
            ns=self.ns, T=self.pallas_tile, interpret=interpret,
        ).astype(self.dtype)
        return self._mix_invar(lse, pi, w, pinv)

    def _site_logliks_pm(self, sys, pmats, child):
        """Site log-likelihoods from precomputed P-matrices (the
        host pm-cache path; unsharded only)."""
        if self.pallas_tile and self._mesh is None:
            return self._site_loglik_fused_pm(sys, pmats, child)
        lam, V, Vinv, pi, w, pinv = sys
        pup, _, sc = self._up_pass(pmats, child)
        return self._root_site_loglik(pup, sc, pi, w, pinv)

    def attach_mesh(self, mesh, axis: str = "sites"):
        """Run the fused kernel per-shard under shard_map over `axis`
        of `mesh` (the pattern axis).  The per-site outputs stay
        sharded; the weighted reduction in _loglik_sys becomes the
        program's only collective — the TPU-native equivalent of
        mpi_boot.c's site independence."""
        self._mesh = mesh
        self._shard_axis = axis
        return self

    def _site_loglik_fused_sys_sharded(self, sys, tree: TreeArrays):
        from jax.sharding import PartitionSpec as P
        from phyml_tpu.ops.pallas_clv import uppass_site_lse

        lam, V, Vinv, pi, w, pinv = sys
        pmats = self._pmats(lam, V, Vinv, tree.blen.astype(self.dtype))
        logw = jnp.log(jnp.maximum(w, self._tiny))
        n_local = self.P // self._mesh.shape[self._shard_axis]
        T = self.pallas_tile
        while n_local % T:
            T -= 128
        interpret = self.pallas_interpret
        ax = self._shard_axis

        def local(child, tips, pmats, pi, logw):
            return uppass_site_lse(
                child, tips, pmats, pi, logw,
                n_otu=self.n_otu, n_int=self.n_internal, C=self.C,
                ns=self.ns, T=T, interpret=interpret)

        lse = jax.shard_map(
            local, mesh=self._mesh,
            in_specs=(P(), P(None, None, ax), P(), P(), P()),
            out_specs=P(ax),
            # pallas_call out_shapes carry no varying-mesh-axes info
            check_vma=False,
        )(tree.child, self.tips, pmats, pi, logw)
        return self._mix_invar(lse.astype(self.dtype), pi, w, pinv)

    # ------------------------------------------------------------------
    # public computations.  Every entry point takes the pattern-weight
    # vector as a traced ARGUMENT (not a baked closure constant) so
    # bootstrap replicates - which only change weights
    # (mpi_boot.c:119-135) - reuse the same compiled executables.
    # ------------------------------------------------------------------
    def loglik_mgf(self, params, tree, sigma, weights=None):
        """lnL with branch-length-integrated P matrices: each branch
        length is Gamma-distributed with mean blen and variance
        blen*sigma, and P is its expectation (PMat_MGF_Gamma
        models.c:1044; gamma_mgf_bl path of lk.c:2310-2323).  This is
        the exact likelihood of the Guindon 2012 relaxed clock."""
        return self._jit_loglik_mgf(self.data(),
                                    self.system_of(params), tree,
                                    jnp.asarray(sigma, self.dtype),
                                    self._w(weights))

    @property
    def _jit_loglik_mgf(self):
        fn = getattr(self, "_jit_loglik_mgf_", None)
        if fn is None:
            fn = jax.jit(self.bind_data(self._loglik_mgf_sys))
            self._jit_loglik_mgf_ = fn
        return fn

    def _loglik_mgf(self, params, tree, sigma, weights):
        """Untraced-callable MGF lnL (for use inside callers' jits)."""
        return self._loglik_mgf_sys(self._system(params), tree, sigma,
                                    weights)

    def _loglik_mgf_sys(self, sys, tree: TreeArrays, sigma, weights):
        lam, V, Vinv, pi, w, pinv = sys
        t = jnp.broadcast_to(
            tree.blen.astype(self.dtype)[:, None],
            (self.n_nodes, self.C))
        pmats = pmat_mgf_gamma(lam, V, Vinv, t, sigma)
        pup, _, sc = self._up_pass(pmats, tree.child)
        site = self._root_site_loglik(pup, sc, pi, w, pinv)
        return jnp.sum(site.astype(jnp.float64) * weights)

    def _loglik(self, params, tree: TreeArrays, weights):
        return self._loglik_sys(self._system(params), tree, weights)

    def _loglik_sys(self, sys, tree: TreeArrays, weights):
        site = self._site_logliks_sys(sys, tree)
        return jnp.sum(site.astype(jnp.float64) * weights)

    _loglik_weighted = _loglik  # vmap-friendly alias

    def _site_logliks(self, params, tree: TreeArrays):
        return self._site_logliks_sys(self._system(params), tree)

    def _site_logliks_sys(self, sys, tree: TreeArrays):
        if self.pallas_tile:
            if self._mesh is not None:
                return self._site_loglik_fused_sys_sharded(sys, tree)
            return self._site_loglik_fused_sys(sys, tree)
        lam, V, Vinv, pi, w, pinv = sys
        pmats = self._pmats(lam, V, Vinv, tree.blen.astype(self.dtype))
        pup, _, sc = self._up_pass(pmats, tree.child)
        return self._root_site_loglik(pup, sc, pi, w, pinv)

    def _loglik_full(self, params, tree: TreeArrays, weights):
        """lnL plus all partials (for edge ops / search scoring)."""
        lam, V, Vinv, pi, w, pinv = self._system(params)
        pmats = self._pmats(lam, V, Vinv, tree.blen.astype(self.dtype))
        pup, clv, sc = self._up_pass(pmats, tree.child)
        out, sc_out = self._down_pass(pmats, tree.child, pup, sc, pi)
        site = self._root_site_loglik(pup, sc, pi, w, pinv)
        lnl = jnp.sum(site.astype(jnp.float64) * weights)
        return lnl, Partials(clv=clv, pup=pup, sc=sc, out=out,
                             sc_out=sc_out)

    # ------------------------------------------------------------------
    # eigen-LR edge machinery (lk.c:1038 / lk.c:655, all edges at once)
    # ------------------------------------------------------------------
    def edge_dotprods(self, params, tree: TreeArrays, weights):
        """Eigen-basis dot products for every edge simultaneously:
        d [n_nodes, C, ns, P], sc_d [n_nodes, C, P] such that the
        per-(class, pattern) site likelihood as a function of edge-u's
        length alone is
            L_u(t)[c, p] = exp(sc_d[u, c, p]) * sum_i d[u,c,i,p] e^{lam[c,i] t}.
        The rows for the root and for the zero-length root child are
        meaningless and must be masked by the caller (they do not
        correspond to free unrooted edges)."""
        return self.edge_dotprods_sys(self._system(params), tree,
                                      weights)

    def edge_dotprods_sys(self, sys, tree: TreeArrays, weights):
        lam, V, Vinv, pi, w, pinv = sys
        pmats = self._pmats(lam, V, Vinv, tree.blen.astype(self.dtype))
        if getattr(self, "edotp_tile", 0):
            from phyml_tpu.ops.pallas_edotp import edge_dotprods_pallas
            d, sc_d = edge_dotprods_pallas(
                tree.child, self.tips, pmats, V, Vinv, pi,
                n_otu=self.n_otu, n_int=self.n_internal, C=self.C,
                ns=self.ns, T=self.edotp_tile,
                interpret=self._interp)
            d = d.astype(self.dtype)
            sc_d = sc_d.astype(self.dtype)
        elif getattr(self, "edotp_stream_tile", 0):
            from phyml_tpu.ops.pallas_edotp import (
                edge_dotprods_pallas_stream,
            )
            d, sc_d = edge_dotprods_pallas_stream(
                tree.child, self.tips, pmats, V, Vinv, pi,
                n_otu=self.n_otu, n_int=self.n_internal, C=self.C,
                ns=self.ns, T=self.edotp_stream_tile,
                interpret=self._interp)
            d = d.astype(self.dtype)
            sc_d = sc_d.astype(self.dtype)
        else:
            pup, clv, sc = self._up_pass(pmats, tree.child)
            out, sc_out = self._down_pass(pmats, tree.child, pup, sc,
                                          pi)
            b = jnp.einsum("ciy,ncyp->ncip", Vinv, clv,
                           precision=_PREC)
            a = jnp.einsum("czi,nczp->ncip", V, out, precision=_PREC)
            d = a * b
            sc_d = sc_out + sc
        aux = dict(lam=lam, w=w, pinv=pinv, weights=weights,
                   inv_lk=self._inv_lk(pi, w) if self.model.invar
                   else jnp.zeros((self.P,), dtype=self.dtype))
        return d, sc_d, aux

    def edge_site_terms(self, d_n, sc_n, aux, t):
        """Per-site (log-likelihood, dlnL, d2lnL) as a function of ONE
        edge length t, from that edge's dot products.  Shapes: site
        [..., P]; used by edge_lnl_terms (reduction) and by the
        SH/RELL branch supports, which need per-site log-likelihoods
        of the NNI configurations (alrt.c log_lks_aLRT)."""
        lam, w, pinv = aux["lam"], aux["w"], aux["pinv"]
        inv_lk = aux["inv_lk"]
        lam_b = lam[..., :, :, None]                     # [C, ns, 1]
        t_b = jnp.asarray(t)[..., None, None, None]      # scalar or [E]
        e = jnp.exp(lam_b * t_b)
        s0 = jnp.sum(d_n * e, axis=-2)                   # [..., C, P]
        s1 = jnp.sum(d_n * lam_b * e, axis=-2)
        s2 = jnp.sum(d_n * lam_b * lam_b * e, axis=-2)

        m = jnp.max(sc_n, axis=-2, keepdims=True)        # [..., 1, P]
        ew = w[:, None] * jnp.exp(sc_n - m)              # [..., C, P]
        A0 = jnp.maximum(jnp.sum(ew * s0, axis=-2), self._tiny)
        A1 = jnp.sum(ew * s1, axis=-2)
        A2 = jnp.sum(ew * s2, axis=-2)
        m = m[..., 0, :]                                 # [..., P]

        one_m_p = 1.0 - pinv
        log_var = jnp.log(one_m_p) + jnp.log(A0) + m if self.model.invar \
            else jnp.log(A0) + m
        if self.model.invar:
            inv_part = jnp.log(jnp.maximum(pinv * inv_lk, self._tiny))
            site = jnp.where(
                self.invar_ok > 0,
                jnp.logaddexp(log_var, inv_part),
                log_var,
            )
        else:
            site = log_var
        # d site / dt = (1-p) A1 e^{m - site}; stable in both regimes
        ratio = one_m_p * jnp.exp(
            jnp.log(jnp.maximum(jnp.abs(A1), self._tiny)) + m - site
        ) * jnp.sign(A1)
        ratio2 = one_m_p * jnp.exp(
            jnp.log(jnp.maximum(jnp.abs(A2), self._tiny)) + m - site
        ) * jnp.sign(A2)
        dln = ratio
        d2ln = ratio2 - ratio ** 2
        return site, dln, d2ln

    def edge_lnl_terms(self, d_n, sc_n, aux, t):
        """(lnL, dlnL, d2lnL) of the whole tree as a function of ONE
        edge length t, from that edge's dot products d_n [C, ns, P] and
        scales sc_n [C, P].  O(C*ns*P), no traversal (the reference's
        dLk, lk.c:655 + Br_Len_Spline Newton, optimiz.c:2244).
        Broadcasts: t may be [n_edges] with d_n [n_edges, C, ns, P]."""
        site, dln, d2ln = self.edge_site_terms(d_n, sc_n, aux, t)
        wts = aux["weights"]
        lnL = jnp.sum(site.astype(jnp.float64) * wts, axis=-1)
        dlnL = jnp.sum(dln.astype(jnp.float64) * wts, axis=-1)
        d2lnL = jnp.sum(d2ln.astype(jnp.float64) * wts, axis=-1)
        return lnL, dlnL, d2lnL
