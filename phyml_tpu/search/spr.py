"""SPR search: exact all-target regraft scoring from one masked pass.

The reference's SPR cycle (spr.c:136 Spr, :226 Spr_Subtree, :369
Test_All_Spr_Targets) prunes a subtree, walks candidate regraft edges
out to a depth bound, and rescopes each by updating partials along the
path.  The TPU-native scheme here replaces the walk with closed-form
batch scoring:

  * "Prune" is a mask, not surgery: the likelihood pass treats the
    pruned child as a unit factor, which (because P(a)P(b) = P(a+b))
    yields exactly the healed tree's inside partials I_e and outside
    partials O_e at EVERY edge in one up+down pass.
  * Inserting the pruned subtree (root partial clv_p, pendant length
    t_p) into edge e, splitting its length t_e into halves, scores as

      L(e, t_p) = sum_i (Vinv clv_p)_i (V^T M_e)_i exp(lam_i t_p),
      M_e = (P(t_e/2)^T O_e) . (P(t_e/2) I_e)

    for ALL edges e simultaneously - one batched einsum, followed by
    vectorized Newton on every target's pendant length t_p.
  * Regrafting onto the pruned edge's two remnant half-edges scores
    the current topology, so "best target" >= "stay" falls out of the
    same computation; no special-cased current-tree likelihood.

A sweep visits every prunable subtree in random order (reference
randomizes edge order too, spr.c:764) and applies each improving move
immediately.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from phyml_tpu.models.eigen import pmat
from phyml_tpu.ops.likelihood import TreeArrays, tree_arrays
from phyml_tpu.optim.blen import BL_MIN, BL_MAX

_N_NEWTON = 12
_PREC = jax.lax.Precision.HIGHEST


def _spr_scorer_core(engine):
    def newton_1d(d, sc_d, aux, t, iters):
        def body(_, t):
            _, d1, d2 = engine.edge_lnl_terms(d, sc_d, aux, t)
            newton = t - d1 / jnp.where(d2 < 0, d2, -1.0)
            probe = jnp.where(d1 > 0, t * 3.0, t / 3.0)
            tn = jnp.where(d2 < -1e-12, newton, probe)
            tn = jnp.clip(tn, t / 3.0, t * 3.0)
            return jnp.clip(tn, BL_MIN, BL_MAX)
        return jax.lax.fori_loop(0, iters, body, t)

    def scorer(sys, tree: TreeArrays, mask, v, valid, weights):
        lam, V, Vinv, pi, w, pinv = sys
        pmats = engine._pmats(lam, V, Vinv,
                              tree.blen.astype(engine.dtype))
        pup, clv, sc = engine._up_pass(pmats, tree.child, mask)
        out, sc_out = engine._down_pass(pmats, tree.child, pup, sc, pi,
                                        mask)

        aux = dict(
            lam=lam, w=w, pinv=pinv, weights=weights,
            inv_lk=engine._inv_lk(pi, w) if engine.model.invar
            else jnp.zeros((engine.P,), dtype=engine.dtype),
        )
        C = engine.C
        sc_base = sc + sc_out + sc[v][None]           # [N, C, P]
        P_v = clv[v]                                  # [C, ns, P]

        def P_of(t):
            return pmat(lam, V, Vinv,
                        jnp.broadcast_to(t[:, None].astype(engine.dtype),
                                         (engine.n_nodes, C)))

        def dots(x, y):
            """d such that sum_i d_i e^{lam_i t} = sum_z y . P(t) x,
            batched over targets."""
            bx = jnp.einsum("ciy,ecyp->ecip", Vinv, x, precision=_PREC)
            ay = jnp.einsum("czi,eczp->ecip", V, y, precision=_PREC)
            return ay * bx

        # "triple" optimization (reference spr.c:1139): coordinate
        # Newton over (t1 inside-half, t2 outside-half, tp pendant)
        # for every target edge at once
        t1 = jnp.clip(tree.blen * 0.5, BL_MIN, BL_MAX)
        t2 = jnp.clip(tree.blen * 0.5, BL_MIN, BL_MAX)
        tp = jnp.clip(
            jnp.full((engine.n_nodes,), tree.blen[v],
                     dtype=engine.dtype), BL_MIN, BL_MAX)
        Pv_b = jnp.broadcast_to(P_v[None], clv.shape)

        def cycle(_, ts):
            t1, t2, tp = ts
            I1 = jnp.einsum("ecxy,ecyp->ecxp", P_of(t1), clv,
                            precision=_PREC)
            O2 = jnp.einsum("ecwz,ecwp->eczp", P_of(t2), out,
                            precision=_PREC)
            # pendant length tp: y = O2 . I1, x = clv_p
            tp = newton_1d(dots(Pv_b, O2 * I1), sc_base, aux, tp, 6)
            Pp = jnp.einsum("ecxy,cyp->ecxp", P_of(tp), P_v,
                            precision=_PREC)
            # inside half t1: y = O2 . Pp, x = I_e
            t1 = newton_1d(dots(clv, O2 * Pp), sc_base, aux, t1, 6)
            I1 = jnp.einsum("ecxy,ecyp->ecxp", P_of(t1), clv,
                            precision=_PREC)
            # outside half t2: y = O_e, x = I1 . Pp
            t2 = newton_1d(dots(I1 * Pp, out), sc_base, aux, t2, 6)
            return t1, t2, tp

        t1, t2, tp = jax.lax.fori_loop(0, 2, cycle, (t1, t2, tp))
        I1 = jnp.einsum("ecxy,ecyp->ecxp", P_of(t1), clv,
                        precision=_PREC)
        O2 = jnp.einsum("ecwz,ecwp->eczp", P_of(t2), out,
                        precision=_PREC)
        lnl, _, _ = engine.edge_lnl_terms(
            dots(Pv_b, O2 * I1), sc_base, aux, tp
        )
        lnl = jnp.where(valid, lnl, -jnp.inf)
        return lnl, t1, t2, tp

    return scorer


def _make_spr_scorer(engine):
    return jax.jit(engine.bind_data(_spr_scorer_core(engine)))


def _make_spr_scorer_batched(engine):
    """All of a BLOCK of prune candidates scored in one dispatch:
    vmap over (mask, v, valid).  On a remote-attached TPU each
    dispatch pays a ~40 ms host sync, so per-candidate scoring
    dominated the SPR sweep wall-clock ~10:1."""
    core = _spr_scorer_core(engine)
    batched = jax.vmap(core, in_axes=(None, None, 0, 0, 0, None))
    return jax.jit(engine.bind_data(batched))


def spr_scores_batched(engine, params, tree: TreeArrays, masks, vs,
                       valids, weights=None):
    """Per (candidate k, target edge e): exact regraft lnL with the
    triple lengths optimized.  masks [K, n_int, 2]; vs [K];
    valids [K, n_nodes].  Returns (lnl [K, N], t1, t2, tp [K, N])."""
    fn = getattr(engine, "_spr_scorer_batched_fn", None)
    if fn is None:
        fn = _make_spr_scorer_batched(engine)
        engine._spr_scorer_batched_fn = fn
    weights = engine.weights if weights is None else weights
    lnl, t1, t2, tp = fn(engine.data(), engine.system_of(params), tree,
                         jnp.asarray(masks),
                         jnp.asarray(vs, dtype=jnp.int32),
                         jnp.asarray(valids), weights)
    return (np.asarray(lnl), np.asarray(t1), np.asarray(t2),
            np.asarray(tp))


def spr_scores(engine, params, tree: TreeArrays, mask, v, valid,
               weights=None):
    """Per target edge e: exact lnL of regrafting subtree v onto e
    with the three junction lengths (inside half t1, outside half t2,
    pendant tp) jointly optimized.  Returns (lnl, t1, t2, tp)."""
    fn = getattr(engine, "_spr_scorer_fn", None)
    if fn is None:
        fn = _make_spr_scorer(engine)
        engine._spr_scorer_fn = fn
    weights = engine.weights if weights is None else weights
    lnl, t1, t2, tp = fn(engine.data(), engine.system_of(params), tree,
                         jnp.asarray(mask),
                         jnp.asarray(v, dtype=jnp.int32),
                         jnp.asarray(valid), weights)
    return (np.asarray(lnl), np.asarray(t1), np.asarray(t2),
            np.asarray(tp))


def _descendants(rv, v: int) -> np.ndarray:
    """Boolean [n_nodes]: nodes in subtree(v) inclusive."""
    from phyml_tpu import native
    nat = native.descendants(rv.n_otu, rv.child, v)
    if nat is not None:
        return nat
    n = rv.n_otu
    below = np.zeros(rv.n_nodes, dtype=bool)
    below[v] = True
    # children have lower indices than parents (postorder), so a
    # downward sweep propagates the flag to the whole subtree
    for i in range(rv.n_internal - 1, -1, -1):
        u = n + i
        if below[u]:
            below[rv.child[i, 0]] = True
            below[rv.child[i, 1]] = True
    return below


def prune_candidates(rv) -> list[int]:
    """Rooted nodes whose subtree can be pruned: everything except the
    root and its two children (pruning a root child is re-rooting)."""
    r0, r1 = (int(x) for x in rv.child[-1])
    return [x for x in range(rv.n_nodes - 1) if x not in (r0, r1)]


def spr_move_arrays(rv, v: int):
    """(mask [n_int, 2], valid [n_nodes]) for pruning subtree v."""
    n = rv.n_otu
    u = int(rv.parent[v])
    i_u = u - n
    slot = 0 if int(rv.child[i_u, 0]) == v else 1
    mask = np.zeros((rv.n_internal, 2), dtype=np.float32)
    mask[i_u, slot] = 1.0
    below = _descendants(rv, v)
    valid = ~below
    valid[rv.n_nodes - 1] = False        # root has no edge
    # the zero-length root child duplicates the root edge (the tip-0
    # side carries the full length); scoring it would use a different
    # split point than apply_spr produces
    valid[int(rv.child[-1, 1])] = False
    valid[u] = True                      # remnant half-edge: "stay"
    valid[v] = False
    return mask, valid


def apply_spr(topo, rv, v: int, target: int, t1: float, t2: float,
              t_p: float):
    """Host surgery: regraft subtree v onto target's edge.  t1 is the
    inside (child-of-target) half, t2 the outside half, t_p the
    pruned pendant edge length."""
    uid = rv.unrooted_id
    u = int(rv.parent[v])
    prune_edge = int(rv.node_to_edge[v])
    # which endpoint of prune_edge is the link (= u's unrooted id)?
    link_unrooted = int(uid[u])
    e0, e1 = (int(x) for x in topo.edges[prune_edge])
    # side indexes the MOVING subtree's endpoint; link sits at side^1
    side = 0 if e1 == link_unrooted else 1
    assert topo.edges[prune_edge][side ^ 1] == link_unrooted
    regraft_edge = int(rv.node_to_edge[target])
    inside_unrooted = int(uid[target])
    p_end = int(topo.edges[regraft_edge][0])
    new, ey = topo.spr(prune_edge, side, regraft_edge,
                       return_new_edge=True)
    # regraft_edge now carries (p, link); ey carries (link, q);
    # the inside node sat at endpoint p or q of the original edge
    if p_end == inside_unrooted:
        e_in, e_out = regraft_edge, ey
    else:
        e_in, e_out = ey, regraft_edge
    new.blen[e_in] = float(np.clip(t1, BL_MIN, BL_MAX))
    new.blen[e_out] = float(np.clip(t2, BL_MIN, BL_MAX))
    new.blen[prune_edge] = float(np.clip(t_p, BL_MIN, BL_MAX))
    return new


def _batched_tree_loglik(engine):
    """lnL of a stacked batch of TreeArrays in one dispatch."""
    fn = getattr(engine, "_batched_tree_loglik_fn", None)
    if fn is None:
        def eval_trees(sys, trees, weights):
            return jax.vmap(
                lambda t: engine._loglik_sys(sys, t, weights)
            )(trees)

        fn = jax.jit(engine.bind_data(eval_trees))
        engine._batched_tree_loglik_fn = fn
    return fn


def _move_footprint(topo, rv, v: int, target: int):
    """(edge ids, unrooted node ids) a v->target regraft edits: the
    prune edge, the two heal edges at the link, and the split target
    edge, plus their endpoints.  Two moves with disjoint footprints
    commute on the edge list (each edits only its own entries)."""
    uid = rv.unrooted_id
    u = int(rv.parent[v])
    link = int(uid[u])
    prune_edge = int(rv.node_to_edge[v])
    regraft_edge = int(rv.node_to_edge[target])
    edges = {prune_edge, regraft_edge}
    nodes = {link, int(uid[v])}
    for eid, (a, b) in enumerate(topo.edges):
        if eid != prune_edge and (int(a) == link or int(b) == link):
            edges.add(eid)
            nodes.update((int(a), int(b)))
    p, q = (int(x) for x in topo.edges[regraft_edge])
    nodes.update((p, q))
    return edges, nodes


def _move_still_valid(cur_topo, rv, v: int, target: int) -> bool:
    """Recheck a scored move against the CURRENT edge list.

    Footprint-disjoint moves commute on the edge *entries*, but an
    earlier move in the block can relocate a subtree so that this
    move's regraft edge is now inside its own pruned component (the
    regraft would create a cycle), or adjacent to the link (a no-op
    split).  BFS from the moving endpoint of the prune edge, without
    crossing it, and reject if the regraft edge is reachable."""
    uid = rv.unrooted_id
    u = int(rv.parent[v])
    link = int(uid[u])
    moving = int(uid[v])
    prune_edge = int(rv.node_to_edge[v])
    regraft_edge = int(rv.node_to_edge[target])
    p, q = (int(x) for x in cur_topo.edges[regraft_edge])
    if p == link or q == link:
        return False                    # degenerate: regraft at link
    adj: dict[int, list[tuple[int, int]]] = {}
    for eid, (a, b) in enumerate(cur_topo.edges):
        if eid == prune_edge:
            continue
        adj.setdefault(int(a), []).append((eid, int(b)))
        adj.setdefault(int(b), []).append((eid, int(a)))
    seen_nodes = {moving}
    stack = [moving]
    while stack:
        n0 = stack.pop()
        for eid, n1 in adj.get(n0, ()):
            if eid == regraft_edge:
                return False            # target inside moving subtree
            if n1 not in seen_nodes:
                seen_nodes.add(n1)
                stack.append(n1)
    return True


def spr_round(
    engine,
    params,
    topo,
    min_gain: float = 1e-3,
    rng: np.random.Generator | None = None,
    weights=None,
    accept_topo=None,
    batch_k: int | None = None,
    max_apply: int | None = None,
):
    """One SPR sweep: prunable subtrees in random order, scored in
    BLOCKS of batch_k per device dispatch (vmapped masked passes);
    each block's improving moves are applied greedily when their
    footprints are disjoint, guarded by a joint re-evaluation with
    single-best fallback (the reference applies one move at a time,
    spr.c:1380 Try_One_Spr_Move_Triple; blocking amortizes the
    per-dispatch host sync).  Returns (topo, lnL, n_applied).

    accept_topo (optional): predicate on the post-move Topology
    (constraint search)."""
    rng = rng or np.random.default_rng(0)
    n_applied = 0
    rv = topo.rooted()
    ta = tree_arrays(rv, dtype=engine.dtype)
    lnl_cur = float(engine.loglik(params, ta, weights))
    if batch_k is None:
        # each dispatch costs a ~40-120 ms host round-trip on a
        # remote-attached TPU, so pack as many prune candidates per
        # dispatch as HBM allows: ~10 [n_nodes, C, ns, P] temporaries
        # live per candidate in the vmapped masked scorer.  Round to
        # a multiple of 32 so the padded batch shape (and hence the
        # compiled program) is stable across sweeps.
        per_cand = engine.n_nodes * engine.C * engine.ns * \
            engine.P * 4 * 10
        mem_k = (4 << 30) // max(per_cand, 1)
        want_k = len(prune_candidates(rv))
        batch_k = int(max(1, min(mem_k, 128,
                                 -(-want_k // 32) * 32)))
    if max_apply is None:
        # applying every footprint-disjoint improving move of a big
        # block is too greedy (all were scored against the pre-block
        # tree): cap the applies per block and let the outer sweep
        # loop rescore — measured on nucleic GTR+G4 this recovers the
        # serial path's final lnL at ~1 extra dispatch per sweep
        max_apply = 8
    order = [int(x) for x in rng.permutation(prune_candidates(rv))]
    pos = 0
    while pos < len(order):
        cands_now = set(prune_candidates(rv))
        block = []
        while pos < len(order) and len(block) < batch_k:
            v = order[pos]
            pos += 1
            if v in cands_now and int(rv.parent[v]) != rv.n_nodes - 1:
                block.append(v)
        if not block:
            continue
        # pad to the fixed batch size: a varying batch dimension would
        # compile a fresh program per distinct block length (minutes
        # each on the remote compile service)
        n_real = len(block)
        padded = block + [block[0]] * (batch_k - n_real)
        mv = [spr_move_arrays(rv, v) for v in padded]
        lnl_t, t1, t2, tp = spr_scores_batched(
            engine, params, ta, np.stack([m for m, _ in mv]),
            np.asarray(padded), np.stack([va for _, va in mv]),
            weights=weights)
        block = block[:n_real]

        # per candidate: the best non-"stay" target above min_gain
        proposals = []
        for k, v in enumerate(block):
            u = int(rv.parent[v])
            s_row = rv.child[u - rv.n_otu]
            sib = int(s_row[1] if int(s_row[0]) == v else s_row[0])
            link_edges = {int(rv.node_to_edge[u]),
                          int(rv.node_to_edge[sib])}
            for best in np.argsort(-lnl_t[k]):
                best = int(best)
                if int(rv.node_to_edge[best]) in link_edges:
                    break          # best remaining position = current
                if lnl_t[k, best] - lnl_cur < min_gain:
                    break
                proposals.append((float(lnl_t[k, best]), k, v, best))
                break
        if not proposals:
            continue
        proposals.sort(reverse=True)

        # greedy footprint-disjoint application on the host edge list
        new_topo = topo
        used_edges: set[int] = set()
        used_nodes: set[int] = set()
        applied_block = []
        for score, k, v, best in proposals:
            if max_apply is not None and \
                    len(applied_block) >= max_apply:
                break
            edges, nodes = _move_footprint(topo, rv, v, best)
            if (edges & used_edges) or (nodes & used_nodes):
                continue
            if not _move_still_valid(new_topo, rv, v, best):
                continue
            try:
                cand = apply_spr(new_topo, rv, v, best,
                                 float(t1[k, best]),
                                 float(t2[k, best]),
                                 float(tp[k, best]))
            except (ValueError, AssertionError):
                continue                 # stale move on edited tree
            if accept_topo is not None and not accept_topo(cand):
                continue
            new_topo = cand
            used_edges |= edges
            used_nodes |= nodes
            applied_block.append((score, k, v, best))
        if not applied_block:
            continue

        # joint guard: evaluate the joint application AND the single
        # best move in ONE batched dispatch, keep the better (or the
        # current tree if neither improves)
        rv2 = new_topo.rooted()
        ta2 = tree_arrays(rv2, dtype=engine.dtype)
        if len(applied_block) > 1:
            score, k, v, best = applied_block[0]
            single_topo = apply_spr(topo, rv, v, best,
                                    float(t1[k, best]),
                                    float(t2[k, best]),
                                    float(tp[k, best]))
            rv_s = single_topo.rooted()
            ta_s = tree_arrays(rv_s, dtype=engine.dtype)
            fn2 = _batched_tree_loglik(engine)
            trees = TreeArrays(
                child=jnp.stack([ta2.child, ta_s.child]),
                blen=jnp.stack([ta2.blen, ta_s.blen]))
            w_v = engine.weights if weights is None else weights
            vals = np.asarray(fn2(engine.data(),
                                  engine.system_of(params), trees,
                                  w_v))
            if vals[1] > vals[0]:
                new_topo, rv2, ta2 = single_topo, rv_s, ta_s
                applied_block = applied_block[:1]
                lnl_new = float(vals[1])
            else:
                lnl_new = float(vals[0])
        else:
            lnl_new = float(engine.loglik(params, ta2, weights))
        if lnl_new <= lnl_cur:
            continue                     # keep the current tree
        topo, rv, ta = new_topo, rv2, ta2
        lnl_cur = lnl_new
        n_applied += len(applied_block)
    return topo, lnl_cur, n_applied
