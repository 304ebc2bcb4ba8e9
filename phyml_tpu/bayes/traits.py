"""Continuous-trait / phylogeography models on time-trees
(≙ the PhyREX Gaussian stack: rw.c, rrw.c, ibm.c, iwn.c, iou.c,
velocity.c, location.c).

All of these are linear-Gaussian models of a D-dimensional trait
(coordinates, in PhyREX) evolving along the chronogram:

  * RW    — Brownian motion, variance sigma^2 * dt per edge
            (rw.c; LOCATION_Lk dispatch location.c:40)
  * RRW   — relaxed random walk: per-edge lognormal scalers r_e,
            variance sigma^2 * r_e * dt (rrw.c)
  * IBM   — integrated Brownian motion: velocity is Brownian, the
            position integrates it (ibm.c, velocity.c)
  * IWN   — integrated white noise: velocity redrawn independently
            each edge (iwn.c)
  * IOU   — integrated Ornstein-Uhlenbeck: velocity mean-reverts with
            strength theta (iou.c)

TPU-native design: the reference walks the tree with per-node
`*_Integrated_Lk_Down` recursions (e.g. rw.c:226).  Here the two
families get the two natural JAX shapes:

  * BM/RRW: exact marginal likelihood by Felsenstein pruning over
    Gaussians ("contrasts"), a `lax.scan` over the postorder child
    table carrying (mean, variance-offset, log-norm) per node —
    dimensions vectorized, so one scan scores all D coordinates.
  * Integrated models: the state (position, velocity) is jointly
    Gaussian with exact per-edge transition (A(dt), Q(dt)); node
    states are latent and scored by `transition_logpdf`, matching the
    reference's MCMC-over-locations/velocities design
    (PHYREX_MCMC phyrex.c:1234, velocity.c), plus an exact-marginal
    Kalman-style pruning for the likelihood of tip positions.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

LOG2PI = float(np.log(2.0 * np.pi))

RW = "rw"
RRW = "rrw"
IBM = "ibm"
IWN = "iwn"
IOU = "iou"


# ----------------------------------------------------------------------
# BM / RRW: exact pruning (contrasts)
# ----------------------------------------------------------------------
def brownian_loglik(tip_x, child, edge_var):
    """Exact log-likelihood of tip values under Brownian motion with
    per-edge variances, root integrated out with an (improper) flat
    prior — the standard REML/contrast form used for RRW scoring
    (≙ RW_Lk/RRW_Lk via LOCATION_Lk location.c:40).

    tip_x    [n, D]   observed tip coordinates
    child    [n-1, 2] postorder child table (TimeTree layout)
    edge_var [2n-1]   variance accumulated on the edge above each node
                      (root slot ignored)

    Returns the summed log-density of the n-1 independent contrasts
    over all D dimensions.
    """
    n, D = tip_x.shape
    n_nodes = 2 * n - 1
    mu = jnp.zeros((n_nodes, D), dtype=tip_x.dtype)
    mu = mu.at[:n].set(tip_x)
    # extra variance on top of the node's own edge (from pruning below)
    add = jnp.zeros((n_nodes,), dtype=tip_x.dtype)
    lognorm = jnp.zeros((), dtype=tip_x.dtype)

    def step(carry, i):
        mu, add, lognorm = carry
        c0 = child[i, 0]
        c1 = child[i, 1]
        u = n + i
        v0 = edge_var[c0] + add[c0]
        v1 = edge_var[c1] + add[c1]
        vsum = v0 + v1
        diff = mu[c0] - mu[c1]
        # contrast density: each of D dims ~ N(0, vsum)
        lc = -0.5 * jnp.sum(diff * diff) / vsum \
             - 0.5 * D * (jnp.log(vsum) + LOG2PI)
        w0 = v1 / vsum
        mu_u = w0 * mu[c0] + (1.0 - w0) * mu[c1]
        add_u = v0 * v1 / vsum
        return (mu.at[u].set(mu_u), add.at[u].set(add_u),
                lognorm + lc), None

    (mu, add, lognorm), _ = lax.scan(
        step, (mu, add, lognorm), jnp.arange(n - 1))
    return lognorm


def rrw_edge_var(sigma2, dt, log_scalers, root):
    """Per-edge variances sigma^2 * r_e * dt_e for the relaxed random
    walk (rrw.c); r_e = exp(log_scalers), pinned at the root."""
    r = jnp.exp(log_scalers).at[root].set(1.0)
    return sigma2 * r * dt


def rrw_scaler_log_prior(log_scalers, nu, root):
    """iid lognormal prior on the RRW edge scalers, mean 1
    (≙ RRW_Prior rrw.c)."""
    nu = jnp.maximum(nu, 1e-10)
    mask = jnp.ones_like(log_scalers).at[root].set(0.0)
    mu = -0.5 * nu * nu
    z = (log_scalers - mu) / nu
    lp = -0.5 * (z * z + LOG2PI) - jnp.log(nu)
    return jnp.sum(lp * mask)


# ----------------------------------------------------------------------
# Integrated models: exact per-edge (A, Q) over state (position, velocity)
# ----------------------------------------------------------------------
@dataclass(frozen=True)
class IntegratedModel:
    """kind in {'ibm', 'iwn', 'iou'}; theta only used by IOU."""
    kind: str = IBM

    def transition(self, dt, sigma2, theta=1.0):
        """Returns A [.., 2, 2], Q [.., 2, 2] for state (x, v):
        x_child = A @ x_parent + w, w ~ N(0, Q).  Exact integrals:
          IBM: v Brownian;      Q = s2 [[dt^3/3, dt^2/2],[dt^2/2, dt]]
          IWN: v ~ iid N(0,s2) per edge held constant across it:
               x' = x + v' dt  => correlated (x', v') given x
          IOU: dv = -theta v dt + s dW; x integrates v (exact OU
               moments, iou.c)
        """
        dt = jnp.asarray(dt)
        z = jnp.zeros_like(dt)
        o = jnp.ones_like(dt)
        if self.kind == IBM:
            A = jnp.stack([jnp.stack([o, dt], -1),
                           jnp.stack([z, o], -1)], -2)
            q11 = sigma2 * dt ** 3 / 3.0
            q12 = sigma2 * dt ** 2 / 2.0
            q22 = sigma2 * dt
        elif self.kind == IWN:
            # v' fresh each edge; x' = x + v' dt
            A = jnp.stack([jnp.stack([o, z], -1),
                           jnp.stack([z, z], -1)], -2)
            q11 = sigma2 * dt * dt
            q12 = sigma2 * dt
            q22 = sigma2 * o
        elif self.kind == IOU:
            th = jnp.maximum(theta, 1e-8)
            e = jnp.exp(-th * dt)
            A = jnp.stack([jnp.stack([o, (1 - e) / th], -1),
                           jnp.stack([z, e], -1)], -2)
            s = sigma2 / (2 * th)
            q22 = s * (1 - e ** 2)
            q12 = (sigma2 / (2 * th ** 2)) * (1 - e) ** 2
            q11 = (sigma2 / th ** 2) * (
                dt - 2 * (1 - e) / th + (1 - e ** 2) / (2 * th))
        else:
            raise ValueError(self.kind)
        Q = jnp.stack([jnp.stack([q11, q12], -1),
                       jnp.stack([q12, q22], -1)], -2)
        return A, Q

    # ------------------------------------------------------------------
    def transition_logpdf(self, states, child, dt, sigma2, theta=1.0,
                          jitter=1e-12):
        """Joint log-density of latent node states given the root
        (flat root prior): sum over non-root nodes of
        log N(state_child ; A state_parent, Q) — the augmented-MCMC
        scoring used for velocities/locations (velocity.c, phyrex.c).

        states [n_nodes, D, 2]  (position, velocity) per node per dim
        """
        n_nodes = states.shape[0]
        n = (n_nodes + 1) // 2
        parent = _parent_from_child(child, n)
        A, Q = self.transition(dt, sigma2, theta)      # [N, 2, 2]
        mean = jnp.einsum("nij,ndj->ndi", A, states[parent])
        resid = states - mean                          # [N, D, 2]
        Qj = Q + jitter * jnp.eye(2)
        Qinv = jnp.linalg.inv(Qj)
        _, logdet = jnp.linalg.slogdet(Qj)
        quad = jnp.einsum("ndi,nij,ndj->nd", resid, Qinv, resid)
        D = states.shape[1]
        per_node = -0.5 * (quad.sum(-1) + D * (logdet + 2 * LOG2PI))
        mask = jnp.ones((n_nodes,)).at[n_nodes - 1].set(0.0)
        return jnp.sum(per_node * mask)

    # ------------------------------------------------------------------
    def marginal_loglik(self, tip_x, child, dt, sigma2, theta=1.0,
                        root_var=1e6):
        """Exact marginal log-likelihood of tip POSITIONS with all
        latent velocities and internal positions integrated out
        (replaces the reference's *_Integrated_Lk_Down recursions,
        ibm.c/iou.c).  The root state is N(0, root_var * I).

        Method (TPU-native): the state process is linear-Gaussian with
        invertible per-edge transitions (IBM/IOU), so the joint tip
        covariance has the closed form
            Cov(x_i, x_j) = h_i  G_{mrca(i,j)}  h_j^T,
        where T_u is the accumulated root->u transition product,
        h_u = H T_u (H = position row), and
        G_a = T_a^{-1} Sigma_a T_a^{-T} with Sigma_a the marginal
        state covariance at a.  Everything is batched 2x2 algebra +
        one [n, n] Cholesky — matmul work the MXU eats, and
        numerically benign (no near-singular precision assembly,
        which breaks an information-form pruning for small dt).
        IWN has singular transitions but its positions are exactly
        Brownian with per-edge variance sigma^2*dt^2, so it routes
        through the scalar path-variance construction.

        `child` must be a concrete (host) array: the MRCA table is
        topology-only and precomputed outside the trace.
        tip_x [n, D]; dt [n_nodes]; returns a proper scalar loglik.
        """
        n, D = tip_x.shape
        n_nodes = 2 * n - 1
        dtp = tip_x.dtype
        import jax.core
        if isinstance(child, jax.core.Tracer):
            # topology is CHAIN STATE (genealogy sampling with the
            # integrated models, r3 verdict #8): derive the MRCA
            # table inside the trace
            mrca = _mrca_table_traced(child, n)
            parent = _parent_from_child(child, n)
        else:
            child_np = np.asarray(child)
            mrca = jnp.asarray(_mrca_table(child_np, n),
                               dtype=jnp.int32)
            parent = _parent_from_child(jnp.asarray(child_np), n)

        if self.kind == IWN:
            # positions are BM with edge variance sigma2*dt^2: the
            # per-edge velocity is iid, so position increments are
            # independent N(0, sigma2*dt^2)
            ev = sigma2 * dt * dt
            cum = _path_cumsum(ev, parent, n_nodes)      # [n_nodes]
            S = root_var + cum[mrca]                     # [n, n]
        else:
            A, Q = self.transition(dt, sigma2, theta)    # [N, 2, 2]
            eye = jnp.eye(2, dtype=dtp)
            A = A.at[n_nodes - 1].set(eye)
            Q = Q.at[n_nodes - 1].set(jnp.zeros((2, 2), dtp))
            # reverse postorder (parents first): ids descend
            Sig0 = root_var * eye
            T0 = eye

            def down(carry, u):
                Sig, T = carry
                Su = A[u] @ Sig[parent[u]] @ A[u].T + Q[u]
                Tu = A[u] @ T[parent[u]]
                return (Sig.at[u].set(Su), T.at[u].set(Tu)), None

            Sig = jnp.zeros((n_nodes, 2, 2), dtp
                            ).at[n_nodes - 1].set(Sig0)
            T = jnp.zeros((n_nodes, 2, 2), dtp
                          ).at[n_nodes - 1].set(T0)
            (Sig, T), _ = lax.scan(
                down, (Sig, T),
                jnp.arange(n_nodes - 2, -1, -1))
            Tinv = jnp.linalg.inv(T)
            G = jnp.einsum("nij,njk,nlk->nil", Tinv, Sig, Tinv)
            h = T[:n, 0, :]                              # [n, 2]
            S = jnp.einsum("ip,ijpq,jq->ij", h, G[mrca], h)

        S = 0.5 * (S + S.T)
        # PD by construction; the regularizer only guards fp32 runs
        # (relative to machine eps so fp64 parity is untouched)
        eps = float(np.finfo(np.dtype(dtp)).eps)
        jit_scale = eps * jnp.mean(jnp.diagonal(S))
        L = jnp.linalg.cholesky(S + jit_scale * jnp.eye(n, dtype=dtp))
        z = jax.scipy.linalg.solve_triangular(L, tip_x, lower=True)
        ldet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        return -0.5 * (jnp.sum(z * z) + D * ldet
                       + D * n * LOG2PI)


def _path_cumsum(edge_val, parent, n_nodes):
    """cum[u] = sum of edge_val along the path u -> root, by pointer
    doubling: invariant S_k(u) = sum over the path u .. anc_k(u)
    (2^k-th ancestor, clamped at the root, where the value is 0)."""
    S = edge_val.at[n_nodes - 1].set(0.0)
    anc = parent
    for _ in range(int(np.ceil(np.log2(max(n_nodes, 2)))) + 1):
        S = S + S[anc]
        anc = anc[anc]
    return S


def _mrca_table_traced(child, n):
    """Traceable tip-pair MRCA table: postorder descendant-tip masks,
    then for every tip pair the SMALLEST-index node containing both
    (postorder indices increase toward the root, so the minimum is
    the lowest common ancestor).  O(n^3) bools — fine for the
    phylogeography tier's tree sizes, and jit-compatible so the
    genealogy can be chain state."""
    n_nodes = 2 * n - 1
    M0 = jnp.concatenate(
        [jnp.eye(n, dtype=bool),
         jnp.zeros((n - 1, n), dtype=bool)], axis=0)

    def step(M, i):
        row = M[child[i, 0]] | M[child[i, 1]]
        return M.at[n + i].set(row), None

    M, _ = jax.lax.scan(step, M0, jnp.arange(n - 1))
    both = M[:, :, None] & M[:, None, :]          # [n_nodes, n, n]
    idx = jnp.where(both,
                    jnp.arange(n_nodes)[:, None, None], n_nodes)
    return jnp.min(idx, axis=0).astype(jnp.int32)


def _mrca_table(child_np, n):
    """[n, n] tip-pair MRCA node ids (host-side, topology-only)."""
    n_nodes = 2 * n - 1
    parent = np.full(n_nodes, n_nodes - 1, dtype=np.int64)
    for i in range(n - 1):
        parent[child_np[i, 0]] = n + i
        parent[child_np[i, 1]] = n + i
    anc_lists = []
    for u in range(n):
        p = [u]
        while p[-1] != n_nodes - 1:
            p.append(int(parent[p[-1]]))
        anc_lists.append(p)
    M = np.zeros((n, n), dtype=np.int64)
    for i in range(n):
        si = {x: k for k, x in enumerate(anc_lists[i])}
        for j in range(n):
            M[i, j] = next(x for x in anc_lists[j] if x in si)
    return M


def _parent_from_child(child, n):
    n_nodes = 2 * n - 1
    parent = jnp.full((n_nodes,), n_nodes - 1, dtype=jnp.int32)
    rows = jnp.arange(n - 1, dtype=jnp.int32) + n
    parent = parent.at[child[:, 0]].set(rows)
    parent = parent.at[child[:, 1]].set(rows)
    return parent.at[n_nodes - 1].set(n_nodes - 1)


def _psd_sqrt(cov):
    """Symmetric square root with negative eigenvalues (conditioning
    cancellation noise) clamped to zero - Cholesky is too brittle for
    posterior covariances whose observed components are exactly
    deterministic."""
    cov = 0.5 * (cov + cov.T)
    w, U = np.linalg.eigh(cov)
    w = np.clip(w, 0.0, None)
    return U * np.sqrt(w)[None, :]


def _mrca_table_all(child_np, n):
    """[n_nodes, n_nodes] MRCA node ids for ALL node pairs (host-side,
    topology-only)."""
    n_nodes = 2 * n - 1
    parent = np.full(n_nodes, n_nodes - 1, dtype=np.int64)
    for i in range(n - 1):
        parent[child_np[i, 0]] = n + i
        parent[child_np[i, 1]] = n + i
    anc_lists = []
    for u in range(n_nodes):
        p = [u]
        while p[-1] != n_nodes - 1:
            p.append(int(parent[p[-1]]))
        anc_lists.append(p)
    M = np.zeros((n_nodes, n_nodes), dtype=np.int64)
    for i in range(n_nodes):
        si = set(anc_lists[i])
        for j in range(n_nodes):
            M[i, j] = next(x for x in anc_lists[j] if x in si)
    return M, parent


def posterior_state_samples(kind, tip_x, child, dt, sigma2,
                            theta=1.0, root_var=1e6,
                            root_vel_var=None, n_samples=64,
                            rng=None):
    """EXACT posterior samples of all latent (position, velocity)
    node states given the observed tip positions, for the integrated
    movement models.

    The reference samples velocities with Metropolis-Hastings over an
    augmented likelihood (velocity.c:64 VELOC_Augmented_Lk_Locations,
    :213 VELOC_Augmented_Lk_Velocity) and pays the usual mixing cost.
    These models are linear-Gaussian, so the posterior over every
    latent state is itself Gaussian with closed-form moments: this
    routine assembles the joint prior covariance from the per-edge
    (A, Q) transition products (the same T/G/Sigma algebra as
    marginal_loglik), conditions on the tip positions, and draws iid
    samples - effective sample size equals the number of draws by
    construction.

    IWN's transitions are singular (the velocity is redrawn each
    edge), but given positions at both edge ends the edge velocity is
    DETERMINED: v_u = (x_u - x_parent) / dt_u; so IWN routes through
    scalar Brownian smoothing of positions.

    Returns (samples [S, n_nodes, D, 2], mean [n_nodes, D, 2],
    sd [n_nodes, D, 2]); state component 0 = position, 1 = velocity
    (IWN: the velocity on the edge above the node; root velocity 0).

    root_var is the (diffuse) prior variance on the root POSITION -
    translation invariance demands it.  root_vel_var is the prior
    variance on the root VELOCITY and defaults to the PROPER data
    scale sigma2 * tree height: a diffuse velocity prior would let an
    arbitrarily large global drift mode absorb the tip-position
    signal and wreck velocity recovery (measured: correlation with
    simulated truth flips to -0.6 under a 1e6 velocity prior vs +0.8
    under the proper scale).
    """
    rng = rng or np.random.default_rng(0)
    tip_x = np.asarray(tip_x, dtype=np.float64)
    child_np = np.asarray(child)
    dt = np.asarray(dt, dtype=np.float64)
    n, D = tip_x.shape
    n_nodes = 2 * n - 1
    mrca, parent = _mrca_table_all(child_np, n)

    if kind == IWN:
        # positions are Brownian with per-edge variance s2*dt^2
        ev = (sigma2 * dt * dt).copy()
        ev[n_nodes - 1] = 0.0
        # parents have higher postorder ids, so a descending sweep
        # accumulates root->u path variances correctly
        cum = np.zeros(n_nodes)
        for u in range(n_nodes - 2, -1, -1):
            cum[u] = cum[parent[u]] + ev[u]
        C = root_var + cum[mrca]                       # [N, N]
        obs = np.arange(n)
        lat = np.arange(n, n_nodes)
        Cyy = C[np.ix_(obs, obs)]
        Cly = C[np.ix_(lat, obs)]
        Cll = C[np.ix_(lat, lat)]
        K = np.linalg.solve(Cyy, Cly.T).T              # [L, n]
        mean_lat = K @ tip_x                           # [L, D]
        cov_lat = Cll - K @ Cly.T
        L = _psd_sqrt(cov_lat)
        xs = np.empty((n_samples, n_nodes, D))
        xs[:, :n] = tip_x
        z = rng.standard_normal((n_samples, len(lat), D))
        xs[:, n:] = mean_lat + np.einsum("ij,sjd->sid", L, z)
        # velocities from increments
        smp = np.zeros((n_samples, n_nodes, D, 2))
        smp[..., 0] = xs
        dts = np.maximum(dt, 1e-12)
        for u in range(n_nodes - 1):
            smp[:, u, :, 1] = (xs[:, u] - xs[:, parent[u]]) / dts[u]
        # exact moments (positions exact; velocity moments propagate
        # linearly from the position posterior)
        mean_x = np.concatenate([tip_x, mean_lat], axis=0)
        sd_x = np.zeros((n_nodes, 1))
        sd_x[n:, 0] = np.sqrt(np.clip(np.diag(cov_lat), 0, None))
        mean = np.zeros((n_nodes, D, 2))
        sd = np.zeros((n_nodes, D, 2))
        mean[..., 0] = mean_x
        sd[..., 0] = sd_x
        cov_full = np.zeros((n_nodes, n_nodes))
        cov_full[np.ix_(range(n, n_nodes), range(n, n_nodes))] = \
            cov_lat
        for u in range(n_nodes - 1):
            pu = parent[u]
            mean[u, :, 1] = (mean_x[u] - mean_x[pu]) / dts[u]
            var_v = (cov_full[u, u] + cov_full[pu, pu]
                     - 2 * cov_full[u, pu]) / dts[u] ** 2
            sd[u, :, 1] = np.sqrt(max(var_v, 0.0))
        return smp, mean, sd

    model = IntegratedModel(kind=kind)
    import jax.numpy as _jnp
    A, Q = model.transition(_jnp.asarray(dt), sigma2, theta)
    A = np.array(A, dtype=np.float64)
    Q = np.array(Q, dtype=np.float64)
    eye = np.eye(2)
    A[n_nodes - 1] = eye
    Q[n_nodes - 1] = 0.0
    if root_vel_var is None:
        # proper prior at the natural scale: the velocity variance a
        # Brownian velocity accumulates over one tree height
        depth = np.zeros(n_nodes)
        for u in range(n_nodes - 2, -1, -1):
            depth[u] = depth[parent[u]] + dt[u]
        root_vel_var = float(sigma2) * max(float(depth.max()), 1e-6)
    T = np.zeros((n_nodes, 2, 2))
    Sig = np.zeros((n_nodes, 2, 2))
    T[n_nodes - 1] = eye
    Sig[n_nodes - 1] = np.diag([root_var, root_vel_var])
    for u in range(n_nodes - 2, -1, -1):
        p = parent[u]
        # parents always have higher postorder ids, so a descending
        # sweep visits parents first
        T[u] = A[u] @ T[p]
        Sig[u] = A[u] @ Sig[p] @ A[u].T + Q[u]
    Tinv = np.linalg.inv(T)
    G = np.einsum("nij,njk,nlk->nil", Tinv, Sig, Tinv)
    # joint covariance over all stacked states [N*2, N*2]
    C = np.einsum("uip,uwpq,wjq->uiwj", T, G[mrca], T)
    C = C.reshape(n_nodes * 2, n_nodes * 2)
    obs = 2 * np.arange(n)                 # tip position components
    lat = np.setdiff1d(np.arange(2 * n_nodes), obs)
    Cyy = C[np.ix_(obs, obs)]
    Cly = C[np.ix_(lat, obs)]
    Cll = C[np.ix_(lat, lat)]
    K = np.linalg.solve(Cyy, Cly.T).T
    mean_lat = K @ tip_x
    cov_lat = Cll - K @ Cly.T
    L = _psd_sqrt(cov_lat)
    flat = np.zeros((n_samples, 2 * n_nodes, D))
    flat[:, obs] = tip_x
    z = rng.standard_normal((n_samples, len(lat), D))
    flat[:, lat] = mean_lat + np.einsum("ij,sjd->sid", L, z)
    smp = flat.reshape(n_samples, n_nodes, 2, D).transpose(0, 1, 3, 2)
    # exact posterior moments (not sample averages)
    mean_flat = np.zeros((2 * n_nodes, D))
    mean_flat[obs] = tip_x
    mean_flat[lat] = mean_lat
    sd_flat = np.zeros((2 * n_nodes, 1))
    sd_flat[lat, 0] = np.sqrt(np.clip(np.diag(cov_lat), 0, None))
    mean = mean_flat.reshape(n_nodes, 2, D).transpose(0, 2, 1)
    sd = np.broadcast_to(
        sd_flat.reshape(n_nodes, 2, 1), (n_nodes, 2, D)
    ).transpose(0, 2, 1).copy()
    return smp, mean, sd


# ----------------------------------------------------------------------
# dispatch (≙ LOCATION_Lk location.c:40)
# ----------------------------------------------------------------------
def location_loglik(kind, tip_x, child, dt, sigma2,
                    log_scalers=None, nu=None, theta=1.0):
    """Score tip coordinates under the named movement model."""
    n = tip_x.shape[0]
    root = 2 * n - 2
    if kind == RW:
        return brownian_loglik(tip_x, child, sigma2 * dt)
    if kind == RRW:
        ev = rrw_edge_var(sigma2, dt, log_scalers, root)
        lp = brownian_loglik(tip_x, child, ev)
        return lp + rrw_scaler_log_prior(log_scalers, nu, root)
    return IntegratedModel(kind=kind).marginal_loglik(
        tip_x, child, dt, sigma2, theta)
