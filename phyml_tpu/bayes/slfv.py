"""Spatial Lambda-Fleming-Viot model (≙ slfv.c + the SLFV branches of
phyrex.c/times.c).

The SLFV ("Etheridge-Barton") model drives PhyREX's joint inference of
genealogy and geography through a sequence of REPRODUCTION/EXTINCTION
EVENT DISKS: at rate `lbda`, an event appears at a uniform center in
the habitat; every lineage at distance d from the center is hit with
probability mu * exp(-d^2 / (2 rad^2)); hit lineages coalesce into a
parent whose location is drawn from a truncated normal around the
center (SLFV_Lk_Gaussian_Core slfv.c:711).  The event times are a
Poisson process: n_evt * log(lbda) - lbda * total_dt
(TIMES_Lk_SLFV times.c:2751).

TPU-native design: the reference walks a doubly-linked disk list
(t_dsk / t_ldsk, utilities.h:2374-2481) with per-disk recursion.
Here the augmented state is a fixed-shape struct of arrays — lineage
nodes (ldsk) with coordinates and parent pointers, disks with times,
centers and the hit id — and the likelihood is ONE masked [K, L]
computation: active-lineage masks replace the linked-list walk, so
the whole augmented density is a few einsum-shaped reductions that
jit cleanly and shard over disks.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30
LOG2PI = float(np.log(2.0 * np.pi))


@dataclass(frozen=True)
class SLFVParams:
    """Habitat is the rectangle [lim_lo, lim_up]^D (≙ mmod->lim_do/
    lim_up); defaults match PHYREX_Set_Default (phyrex.c:856:
    lbda 0.1; mu/rad data-scale)."""
    lbda: float = 0.1      # event rate per unit time
    mu: float = 0.5        # hit probability at the center
    rad: float = 1.0       # dispersal radius (sd of the hit kernel)
    lim_lo: tuple = (0.0, 0.0)
    lim_up: tuple = (10.0, 10.0)


@dataclass
class SLFVState:
    """Augmented genealogy: struct-of-arrays event-disk history.

    Lineage nodes ("ldsk"): tips are 0..n_otu-1 at height 0; each
    coalescence (disk hit) creates one new node.  Heights increase
    into the past (the reference uses negative times; only gaps
    enter the density).
      coord   [L, D]  node location
      h_node  [L]     height of the disk that created the node
                      (0 for tips)
      parent  [L]     id of the node's ancestor ldsk (-1 for the root)
    Disks (every event, hit or not):
      h_disk  [K]     height (> 0, increasing into the past)
      centr   [K, D]  event center
      hit     [K]     ldsk id created at this disk, -1 if no lineage
                      was hit
    """
    n_otu: int
    coord: np.ndarray
    h_node: np.ndarray
    parent: np.ndarray
    h_disk: np.ndarray
    centr: np.ndarray
    hit: np.ndarray

    @property
    def n_ldsk(self) -> int:
        return self.coord.shape[0]

    @property
    def n_disks(self) -> int:
        return self.h_disk.shape[0]


def slfv_loglik(state: SLFVState, params: SLFVParams):
    """Joint log-density of the augmented state: Gaussian-SLFV disk
    terms (SLFV_Lk_Gaussian slfv.c:779) + the Poisson event-time term
    (TIMES_Lk_SLFV times.c:2751).  jnp-traceable in (coords, heights,
    centers) and in (lbda, mu, rad) for parameter MCMC."""
    coord = jnp.asarray(state.coord)
    h_node = jnp.asarray(state.h_node)
    parent = np.asarray(state.parent)
    h_disk = jnp.asarray(state.h_disk)
    centr = jnp.asarray(state.centr)
    hit = np.asarray(state.hit)

    lbda = jnp.asarray(params.lbda)
    mu = jnp.asarray(params.mu)
    rad = jnp.asarray(params.rad)
    lo = jnp.asarray(params.lim_lo, dtype=coord.dtype)
    up = jnp.asarray(params.lim_up, dtype=coord.dtype)

    L = state.n_ldsk
    root = int(np.argmax(np.asarray(state.parent) < 0))

    # lineage segment l spans (h_node[l], h_parent_event[l]]
    h_end = jnp.where(jnp.asarray(parent) >= 0,
                      h_node[jnp.clip(jnp.asarray(parent), 0, L - 1)],
                      jnp.inf)

    # habitat check (PHYREX_Is_In_Ldscape): any lineage outside -> reject
    inside = jnp.all((coord >= lo) & (coord <= up))

    # [K, L] masks: lineage active at the disk / hit by the disk
    active = (h_node[None, :] < h_disk[:, None]) \
        & (h_disk[:, None] <= h_end[None, :])
    hit_np = np.asarray(hit)
    # lineage l is hit at disk k iff its parent was created at disk k
    parent_safe = np.clip(parent, 0, L - 1)
    hit_mask_np = np.zeros((state.n_disks, L), dtype=bool)
    ok = parent >= 0
    disk_of_node = np.full(L, -1, dtype=np.int64)
    for k, h in enumerate(hit_np):
        if h >= 0:
            disk_of_node[h] = k
    rows = disk_of_node[parent_safe]
    cols = np.arange(L)
    sel = ok & (rows >= 0)
    hit_mask_np[rows[sel], cols[sel]] = True
    hit_mask = jnp.asarray(hit_mask_np)

    # log prob of a hit: log(mu) - sum_d (x - c)^2 / (2 rad^2)
    d2 = jnp.sum((coord[None, :, :] - centr[:, None, :]) ** 2, axis=-1)
    log_p_hit = jnp.log(mu) - d2 / (2.0 * rad * rad)     # [K, L]
    log_p_hit = jnp.minimum(log_p_hit, -1e-10)
    log_p_miss = jnp.log(-jnp.expm1(log_p_hit))
    per = jnp.where(hit_mask, log_p_hit, log_p_miss)
    lnl = jnp.sum(jnp.where(active, per, 0.0))

    # parent-location density: truncated normal around the center
    # per dimension (Log_Dnorm_Trunc in SLFV_Lk_Gaussian_Core)
    has_hit = hit_np >= 0
    if has_hit.any():
        kids = hit_np[has_hit]
        x = coord[jnp.asarray(kids)]                     # [H, D]
        c = centr[jnp.asarray(np.nonzero(has_hit)[0])]   # [H, D]
        z = (x - c) / rad
        log_pdf = -0.5 * (z * z + LOG2PI) - jnp.log(rad)
        a = jax.scipy.stats.norm.cdf((up[None] - c) / rad)
        b = jax.scipy.stats.norm.cdf((lo[None] - c) / rad)
        lnl = lnl + jnp.sum(log_pdf
                            - jnp.log(jnp.maximum(a - b, 1e-300)))

    # disk-center density: uniform over the habitat, every disk
    lnl = lnl + state.n_disks * jnp.sum(-jnp.log(up - lo))

    # event-time Poisson term: total span young(0) -> oldest disk
    dt_total = jnp.max(h_disk) if state.n_disks else 0.0
    lnl = lnl + state.n_disks * jnp.log(lbda) - lbda * dt_total

    return jnp.where(inside, lnl, NEG_INF)


# ----------------------------------------------------------------------
# backward simulator (≙ SLFV_Simulate_Backward_Core slfv.c:1422)
# ----------------------------------------------------------------------
def simulate_slfv(n_otu: int, params: SLFVParams,
                  rng: np.random.Generator, tip_coord=None,
                  max_disks: int = 200_000) -> SLFVState:
    """Simulate the event-disk history backward from `n_otu` sampled
    lineages until their common ancestor; returns the augmented state
    (genealogy + all disks, hit or empty)."""
    D = len(params.lim_lo)
    lo = np.asarray(params.lim_lo, dtype=np.float64)
    up = np.asarray(params.lim_up, dtype=np.float64)
    if tip_coord is None:
        tip_coord = lo + (up - lo) * rng.random((n_otu, D))
    tip_coord = np.asarray(tip_coord, dtype=np.float64)

    coord = [tip_coord[i] for i in range(n_otu)]
    h_node = [0.0] * n_otu
    parent = [-1] * n_otu
    live = list(range(n_otu))

    h_disk, centr, hit = [], [], []
    h = 0.0
    while len(live) > 1:
        if len(h_disk) >= max_disks:
            raise RuntimeError("SLFV simulation exceeded max_disks; "
                               "increase mu/rad or lbda")
        h += rng.exponential(1.0 / params.lbda)
        c = lo + (up - lo) * rng.random(D)
        x = np.asarray([coord[l] for l in live])
        p_hit = params.mu * np.exp(
            -np.sum((x - c) ** 2, axis=1) / (2.0 * params.rad ** 2))
        hits = np.nonzero(rng.random(len(live)) < p_hit)[0]
        h_disk.append(h)
        centr.append(c)
        if len(hits) == 0:
            hit.append(-1)
            continue
        # all hit lineages coalesce into one parent near the center
        while True:
            pc = c + params.rad * rng.standard_normal(D)
            if np.all((pc >= lo) & (pc <= up)):
                break
        new = len(coord)
        coord.append(pc)
        h_node.append(h)
        parent.append(-1)
        for i in hits:
            parent[live[i]] = new
        live = [l for j, l in enumerate(live) if j not in set(hits)]
        live.append(new)
        hit.append(new)

    return SLFVState(
        n_otu=n_otu,
        coord=np.asarray(coord),
        h_node=np.asarray(h_node),
        parent=np.asarray(parent, dtype=np.int64),
        h_disk=np.asarray(h_disk),
        centr=np.asarray(centr),
        hit=np.asarray(hit, dtype=np.int64),
    )


def state_to_timetree(state: SLFVState):
    """Collapse the ldsk chain to the coalescent TimeTree (multiple
    mergers are resolved left-to-right into cherries, matching the
    reference's binary-tree conversion PHYREX_Ldsk_To_Tree
    phyrex.c:2530).  Only defined when every hit merged <= 2 lineages
    (`simulate_slfv` with small mu/rad rarely violates this; callers
    needing the general case should keep the ldsk representation)."""
    from phyml_tpu.bayes.chrono import TimeTree
    n = state.n_otu
    kids: dict[int, list[int]] = {}
    for l, p in enumerate(state.parent):
        if p >= 0:
            kids.setdefault(int(p), []).append(l)
    # drop pass-through nodes (single-child); map to binary merges
    merges = []

    def resolve(u: int) -> int:
        ks = kids.get(u, [])
        if not ks:
            return u
        rs = [resolve(k) for k in ks]
        if len(rs) == 1:
            return rs[0]
        node = rs[0]
        for other in rs[1:]:
            merges.append((float(state.h_node[u]), node, other))
            node = -len(merges)  # placeholder id
        return node

    root = int(np.argmax(np.asarray(state.parent) < 0))
    resolve(root)
    merges.sort(key=lambda m: m[0])
    n_nodes = 2 * n - 1
    heights = np.zeros(n_nodes)
    child = np.zeros((n - 1, 2), dtype=np.int64)
    remap: dict[int, int] = {}
    nxt = n
    for k, (h, a, b) in enumerate(merges):
        ia = remap.get(a, a) if a >= 0 else remap[a]
        ib = remap.get(b, b) if b >= 0 else remap[b]
        child[k] = (ia, ib)
        heights[nxt] = h
        remap[-(k + 1)] = nxt
        nxt += 1
    names = [f"t{i}" for i in range(n)]
    return TimeTree(n_otu=n, child=child, heights=heights, names=names)


# ----------------------------------------------------------------------
# parameter MCMC (≙ MCMC_PHYREX_Lbda / _Mu / _Radius moves in mcmc.c)
# ----------------------------------------------------------------------
def slfv_param_mcmc(state: SLFVState, params: SLFVParams,
                    n_iter: int = 2000, seed: int = 0,
                    step: float = 0.4):
    """Metropolis over (lbda, mu, rad) given the augmented history,
    log-multiplier proposals, Exp(1) priors on lbda/rad and
    Uniform(0,1) on mu.  Returns (params, trace [n_iter, 4])."""
    rng = np.random.default_rng(seed)

    def post(p: SLFVParams) -> float:
        if p.mu <= 0 or p.mu > 1 or p.lbda <= 0 or p.rad <= 0:
            return -np.inf
        lnl = float(slfv_loglik(state, p))
        return lnl - p.lbda - p.rad

    cur = params
    lp = post(cur)
    trace = np.zeros((n_iter, 4))
    for it in range(n_iter):
        which = it % 3
        m = float(np.exp(step * (rng.random() - 0.5)))
        if which == 0:
            prop = replace(cur, lbda=cur.lbda * m)
        elif which == 1:
            prop = replace(cur, mu=cur.mu * m)
        else:
            prop = replace(cur, rad=cur.rad * m)
        lp_new = post(prop)
        if np.log(rng.random()) < lp_new - lp + np.log(m):
            cur, lp = prop, lp_new
        trace[it] = (lp, cur.lbda, cur.mu, cur.rad)
    return cur, trace
