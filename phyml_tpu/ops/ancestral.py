"""Ancestral sequence reconstruction (reference: ancestral.c).

Three capabilities, matching the reference's feature set but
re-architected for the device:

  * Marginal posteriors (ancestral.c:527 Ancestral_Sequences /
    :609 Ancestral_Sequences_One_Node): the reference loops node by
    node, site by site, class by class, recomputing three-way products
    of conditional likelihoods.  Here the engine's one down pass
    already yields the outside partials O[u] for *every* node, so the
    joint probability of state s at node u is a single batched
    elementwise product
        joint[u, c, s, p] = (P(t_u)^T O[u])[c, s, p] * CLV[u][c, s, p]
    computed for all nodes/classes/sites at once on the device.
  * MPEE decoding (ancestral.c:906 MPEE_Infer / :995 MPEE_Score —
    Oliva et al. 2019 "minimum posterior expected error" ambiguity-
    aware state sets), vectorized over sites in NumPy.
  * Joint sampling + stochastic mutation mapping
    (ancestral.c:15 Sample_Ancestral_Seq, :345 Map_Mutations): rate
    class sampled from its per-site posterior, states sampled in one
    preorder device scan over all sites at once, and substitution
    histories drawn per edge by rejection sampling with the
    first-jump conditioning of Hobolth & Stone (2009) — the same
    scheme as the reference — on the host (trajectories are tiny,
    sequential, and data-dependent: not device work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from phyml_tpu.ops.likelihood import LikelihoodEngine, TreeArrays

_PREC = lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# marginal posteriors
# ---------------------------------------------------------------------------
def marginal_posteriors(eng: LikelihoodEngine, params, tree: TreeArrays,
                        include_root: bool = False):
    """Posterior state probabilities at every internal node.

    Returns [n_internal, P, ns] float64 (rows ordered by rooted
    internal index n_otu..2n-2; the last row is the virtual root and
    is excluded unless include_root).  Probabilities mix rate classes
    by their posterior weight and fold in the +I invariant component
    exactly as the reference does (ancestral.c:873-877:
    p_i = (1-pinv) p_i + pinv * inv_lk * pi_i, normalized by the site
    likelihood).
    """
    probs = _jit_marginals(eng)(eng.data(), params, tree)
    if include_root:
        return probs
    return probs[:-1]


def _jit_marginals(eng: LikelihoodEngine):
    if not hasattr(eng, "_jit_marginal_cache"):
        eng._jit_marginal_cache = jax.jit(
            eng.bind_data(lambda p, t: _marginals(eng, p, t)))
    return eng._jit_marginal_cache


def _marginals(eng: LikelihoodEngine, params, tree: TreeArrays):
    n = eng.n_otu
    lam, V, Vinv, pi, w, pinv = eng._system(params)
    pmats = eng._pmats(lam, V, Vinv, tree.blen.astype(eng.dtype))
    pup, clv, sc = eng._up_pass(pmats, tree.child)
    out, sc_out = eng._down_pass(pmats, tree.child, pup, sc, pi)
    site = eng._root_site_loglik(pup, sc, pi, w, pinv)  # [P] log L

    # internal nodes only (rooted indices n..2n-2)
    pm_i = pmats[n:]
    # grand[u, c, s, p] = sum_w P[u][c, w, s] * O[u][c, w, p]
    grand = jnp.einsum("ucws,ucwp->ucsp", pm_i, out[n:], precision=_PREC)
    joint = grand * clv[n:]                              # [I, C, ns, P]
    # the root row: O[root] is zero (unused); joint at the root is
    # pi-weighted below-partials instead.
    root = eng.n_nodes - 1
    joint = joint.at[-1].set(pi[:, :, None] * clv[root])
    scale = sc_out[n:] + sc[n:]                          # [I, C, P]
    scale = scale.at[-1].set(sc[root])

    m = jnp.max(scale, axis=1, keepdims=True)            # [I, 1, P]
    ew = w[None, :, None] * jnp.exp(scale - m)           # [I, C, P]
    A = jnp.einsum("ucsp,ucp->usp", joint, ew, precision=_PREC)
    A = jnp.maximum(A, eng._tiny)
    log_p = jnp.log(A) + m                               # [I, ns, P]
    if eng.model.invar:
        inv_lk = eng._inv_lk(pi, w)                      # [P]
        pi_mix = jnp.einsum("c,cx->x", w, pi)
        log_var = jnp.log1p(-pinv) + log_p
        inv_term = pinv * inv_lk[None, None, :] * pi_mix[None, :, None]
        log_inv = jnp.log(jnp.maximum(inv_term, eng._tiny))
        log_p = jnp.where(
            eng.invar_ok[None, None, :] > 0,
            jnp.logaddexp(log_var, log_inv),
            log_var,
        )
    log_post = log_p.astype(jnp.float64) - site[None, None, :]
    return jnp.transpose(jnp.exp(log_post), (0, 2, 1))   # [I, P, ns]


# ---------------------------------------------------------------------------
# MPEE decoding (ancestral.c:906 MPEE_Infer)
# ---------------------------------------------------------------------------
def mpee_decode(probs: np.ndarray, mesh: int = 50) -> np.ndarray:
    """Minimum-posterior-expected-error state sets.

    probs [..., ns] -> int bitmask array [...] where bit (ns-1-state)
    is set for every state included in the chosen ambiguity set
    (matching the reference's Integer_To_Bit convention,
    ancestral.c:1031-1034).
    """
    probs = np.asarray(probs, dtype=np.float64)
    ns = probs.shape[-1]
    flat = probs.reshape(-1, ns)
    order = np.argsort(-flat, axis=1, kind="stable")     # idx[] of ref
    cdf = np.cumsum(np.take_along_axis(flat, order, axis=1), axis=1)

    levels = np.arange(ns, dtype=np.float64)             # i = 0..ns-1
    # candidate alpha grid: alpha_j(i) = j * (i/(i+1)) / mesh
    j = np.arange(mesh + 1, dtype=np.float64)[:, None]   # [mesh+1, 1]
    a = j * (levels / (levels + 1.0))[None, :] / mesh    # [mesh+1, ns]
    with np.errstate(divide="ignore", invalid="ignore"):
        b = (ns - 1.0 - a * (levels + 1.0)) / (ns - levels - 1.0)
        # score[g, n, i] = a + (b-a)(1 - cdf[n, i]); last level fixed
        score = a[:, None, :] + \
            (b - a)[:, None, :] * (1.0 - cdf[None, :, :])
    score[:, :, ns - 1] = (ns - 1.0) / ns
    best_level = np.argmin(score, axis=2)                # [mesh+1, N]

    # majority vote over the alpha grid (reference counts identical
    # best_state bitmasks; levels map 1-1 to bitmasks given the order)
    N = flat.shape[0]
    votes = np.zeros((N, ns), dtype=np.int32)
    np.add.at(votes, (np.arange(N)[None, :].repeat(mesh + 1, 0).ravel(),
                      best_level.ravel()), 1)
    chosen = np.argmax(votes, axis=1)                    # [N]

    masks = np.zeros(N, dtype=np.int64)
    for lvl in range(ns):
        sel = chosen >= lvl
        masks[sel] += (1 << (ns - 1 - order[sel, lvl])).astype(np.int64)
    return masks.reshape(probs.shape[:-1])


def mask_to_char(mask: int, datatype: str) -> str:
    """Bitmask -> ambiguity character (reference Bit_To_Character_String)."""
    if datatype == "nt":
        order = "ACGT"
        states = [order[i] for i in range(4) if mask & (1 << (4 - 1 - i))]
        key = frozenset(states)
        table = {
            frozenset("A"): "A", frozenset("C"): "C",
            frozenset("G"): "G", frozenset("T"): "T",
            frozenset("AG"): "R", frozenset("CT"): "Y",
            frozenset("AC"): "M", frozenset("GT"): "K",
            frozenset("AT"): "W", frozenset("CG"): "S",
            frozenset("CGT"): "B", frozenset("AGT"): "D",
            frozenset("ACT"): "H", frozenset("ACG"): "V",
            frozenset("ACGT"): "X",
        }
        return table.get(key, "X")
    order = "ARNDCQEGHILKMFPSTWYV"
    states = [order[i] for i in range(20) if mask & (1 << (20 - 1 - i))]
    return states[0] if len(states) == 1 else "X"


# ---------------------------------------------------------------------------
# joint sampling (ancestral.c:15 Sample_Ancestral_Seq)
# ---------------------------------------------------------------------------
def sample_ancestral(eng: LikelihoodEngine, params, tree: TreeArrays,
                     key, from_prior: bool = False):
    """One joint sample of (rate class, ancestral states) per pattern.

    Returns (classes [P] int32, states [n_nodes, P] int32).  The rate
    class is drawn from its per-site posterior (ancestral.c:64-80;
    prior weights if from_prior), then states are sampled root-down:
    P(s_u = s | s_parent = w, data below u) ∝ P_u[w, s] CLV_u[s]
    — one preorder lax.scan for all sites simultaneously.
    """
    if not hasattr(eng, "_jit_sample_cache"):
        eng._jit_sample_cache = jax.jit(
            eng.bind_data(lambda p, t, k, fp: _sample(eng, p, t, k, fp)),
            static_argnames=("fp",),
        )
    return eng._jit_sample_cache(eng.data(), params, tree, key,
                                 fp=bool(from_prior))


def _sample(eng: LikelihoodEngine, params, tree: TreeArrays, key,
            from_prior: bool):
    n = eng.n_otu
    lam, V, Vinv, pi, w, pinv = eng._system(params)
    pmats = eng._pmats(lam, V, Vinv, tree.blen.astype(eng.dtype))
    pup, clv, sc = eng._up_pass(pmats, tree.child)
    root = eng.n_nodes - 1

    k_cls, k_root, k_scan = jax.random.split(key, 3)

    # --- rate class per pattern -------------------------------------
    lroot = jnp.einsum("cx,cxp->cp", pi, pup[root], precision=_PREC)
    if from_prior:
        logits = jnp.broadcast_to(jnp.log(w)[:, None], lroot.shape)
    else:
        logits = jnp.log(w)[:, None] + sc[root] + \
            jnp.log(jnp.maximum(lroot, eng._tiny))
    cls = jax.random.categorical(k_cls, logits.T, axis=-1)  # [P]

    # --- root state per pattern -------------------------------------
    sel = lambda x: jnp.take_along_axis(
        x, cls[None, None, :].astype(jnp.int32), axis=0
    )[0]  # [ns, P] pick each pattern's class
    root_w = pi.T[:, cls] * sel(clv[root])               # [ns, P]
    root_logit = jnp.log(jnp.maximum(root_w, eng._tiny))
    s_root = jax.random.categorical(k_root, root_logit.T, axis=-1)

    states = jnp.zeros((eng.n_nodes, eng.P), dtype=jnp.int32)
    states = states.at[root].set(s_root.astype(jnp.int32))

    # --- preorder scan: parents before children ----------------------
    # internal nodes in reverse index order = preorder
    child = tree.child
    keys = jax.random.split(k_scan, eng.n_internal)

    def step(states, args):
        i, kk = args
        u = n + i
        sw = states[u]                                   # [P] parent state
        k0, k1 = jax.random.split(kk)

        def draw(c, k):
            # trans[s, p] = P_c[class, parent_state, s] * clv[c][class, s, p]
            pm = pmats[c]                                # [C, ns, ns]
            pm_cls = pm[cls]                             # [P, ns, ns]
            row = jnp.take_along_axis(
                pm_cls, sw[:, None, None].astype(jnp.int32), axis=1
            )[:, 0, :]                                   # [P, ns]
            cl = jnp.take_along_axis(
                clv[c], cls[None, None, :].astype(jnp.int32), axis=0
            )[0]                                         # [ns, P]
            wgt = row * cl.T                             # [P, ns]
            return jax.random.categorical(
                k, jnp.log(jnp.maximum(wgt, eng._tiny)), axis=-1
            ).astype(jnp.int32)

        states = states.at[child[i, 0]].set(draw(child[i, 0], k0))
        states = states.at[child[i, 1]].set(draw(child[i, 1], k1))
        return states, None

    idx = jnp.arange(eng.n_internal - 1, -1, -1)
    states, _ = lax.scan(step, states, (idx, keys[::-1]))
    return cls.astype(jnp.int32), states


# ---------------------------------------------------------------------------
# stochastic mutation mapping (ancestral.c:345 Map_Mutations)
# ---------------------------------------------------------------------------
def map_mutations(eng: LikelihoodEngine, params, tree: TreeArrays,
                  classes, states, rng: np.random.Generator,
                  sites: np.ndarray | None = None,
                  max_iter: int = 1000):
    """Substitution histories per (edge, site) by endpoint-conditioned
    rejection sampling (Nielsen 2002 with the Hobolth-Stone 2009
    first-jump conditioning when the endpoints differ, exactly the
    scheme of ancestral.c:411-493).

    Returns a list of (node, site, t, from_state, to_state) tuples,
    with t measured from the parent end of the node's edge.
    """
    lam, V, Vinv, *_ = (np.asarray(x, dtype=np.float64)
                        for x in eng._system(params))
    # per-class rate matrices (class rate folded into lam)
    Q = np.einsum("cij,cj,cjk->cik", V, lam, Vinv)
    classes = np.asarray(classes)
    states = np.asarray(states)
    blen = np.asarray(tree.blen, dtype=np.float64)
    child = np.asarray(tree.child)
    n = eng.n_otu
    if sites is None:
        sites = np.arange(eng.aln.n_patterns)

    # jump chains: off-diagonal rows normalized
    ns = eng.ns
    jump = Q.copy()
    for c in range(jump.shape[0]):
        np.fill_diagonal(jump[c], 0.0)
        rs = jump[c].sum(axis=1, keepdims=True)
        jump[c] = np.divide(jump[c], rs, out=np.zeros_like(jump[c]),
                            where=rs > 0)

    events = []
    root = eng.n_nodes - 1
    parent = np.full(eng.n_nodes, -1, dtype=np.int64)
    for i in range(eng.n_internal):
        parent[child[i, 0]] = n + i
        parent[child[i, 1]] = n + i

    for u in range(eng.n_nodes - 1):          # every node except root
        T = blen[u]
        if T <= 0:
            continue
        for p in sites:
            c = int(classes[p])
            sa = int(states[parent[u], p]) if parent[u] != root \
                else int(states[root, p])
            sd = int(states[u, p])
            qc = Q[c]
            for _ in range(max_iter):
                traj = _sample_path(qc, jump[c], sa, sd, T, rng)
                if traj is not None:
                    break
            else:
                continue
            for (t, s_from, s_to) in traj:
                events.append((u, int(p), float(t), s_from, s_to))
    return events


def _sample_path(Q, jump, sa, sd, T, rng):
    """One rejection-sampling attempt; returns list of jumps or None."""
    t = 0.0
    s = sa
    traj = []
    first = True
    while True:
        rate = -Q[s, s]
        if first and sa != sd:
            # first jump conditioned on >=1 mutation (Hobolth-Stone 2.1)
            u = rng.random()
            if rate <= 0:
                return None
            dt = -np.log(1.0 - u * (1.0 - np.exp(-rate * T))) / rate
        else:
            dt = rng.exponential(1.0 / rate) if rate > 0 else np.inf
        first = False
        if t + dt > T:
            break
        t += dt
        s_new = int(rng.choice(len(jump[s]), p=jump[s]))
        traj.append((t, s, s_new))
        s = s_new
    return traj if s == sd else None


def m4_class_posteriors(eng: LikelihoodEngine, params,
                        tree: TreeArrays,
                        include_root: bool = True) -> np.ndarray:
    """Per-site posterior of the M4 hidden rate class at every
    internal node (the covarion decode report,
    M4_Post_Prob_H_Class_Edge_Site m4.c:679): the expanded-state
    marginals summed over the observed states within each hidden
    class.  Returns [n_internal(, -1 if not include_root), P,
    n_hidden], rows ordered by rooted internal index."""
    model = eng.model
    if not getattr(model, "covarion", False):
        raise ValueError("m4_class_posteriors needs a covarion (M4) "
                         "model")
    probs = np.asarray(marginal_posteriors(eng, params, tree,
                                           include_root=include_root))
    n_h = model.n_hidden
    obs = eng.ns // n_h
    # expanded state index = h * obs_ns + o (tips are tiled with the
    # hidden class as the major axis, likelihood.py engine init)
    out = probs.reshape(probs.shape[0], probs.shape[1], n_h, obs)
    return out.sum(axis=3)


def write_m4_decode(path: str, eng: LikelihoodEngine, params,
                    tree: TreeArrays) -> None:
    """Site-wise hidden-class decode report (≙ the reference's
    M4_Compute_Posterior_Mean_Rates output, m4.c:807): for every
    SITE, the posterior hidden-class frequencies averaged over
    internal nodes and at the root, plus the MAP class."""
    post = m4_class_posteriors(eng, params, tree)   # [I, P, H]
    site_post = post.mean(axis=0)                   # [P, H]
    root_post = post[-1]                            # [P, H]
    s2p = eng.aln.site_to_pattern
    n_h = site_post.shape[1]
    with open(path, "w") as fh:
        fh.write("# M4 hidden-rate-class posterior decode "
                 "(per site)\n")
        fh.write("# site\tMAP_class\t"
                 + "\t".join(f"mean_P(class{j})"
                             for j in range(n_h))
                 + "\t"
                 + "\t".join(f"root_P(class{j})"
                             for j in range(n_h))
                 + "\n")
        for s, p in enumerate(s2p):
            mp = site_post[p]
            rp = root_post[p]
            fh.write(f"{s + 1}\t{int(np.argmax(mp))}\t"
                     + "\t".join(f"{x:.4f}" for x in mp) + "\t"
                     + "\t".join(f"{x:.4f}" for x in rp) + "\n")
