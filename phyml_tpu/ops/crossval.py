"""Cross-validation for model selection (reference: cv.c).

Three modes, mirroring the reference's cv_type values (xml.c:506-520):

  * tip / "maxfold" leave-one-out (CV_Tip_Cv cv.c:15): for every
    (taxon, site) cell, the predictive distribution of that tip state
    given ALL other data.  The reference masks each cell and redoes a
    branch-length optimization + partial-likelihood update per cell -
    O(n_otu * n_patterns) tree operations.  TPU-native observation:
    the outside partial out[tip] (ops/likelihood._down_pass) never
    includes the tip's own data, so the leave-one-out predictive
    probabilities for EVERY cell fall out of ONE batched down pass:
        pred[u, x, p] ~ sum_c w_c (out[u,c]^T P_c(t_u))[x, p].
    (We omit the reference's per-cell re-optimization of the tip
    branch length, an O(1/n_sites) effect; cv.c:70.)

  * kfold.col (CV_Hide_Align_At_Random_Col cv.c:213): mask whole
    columns, refit on the rest, score the summed predictive site
    log-likelihood at the masked columns (CV_Score_At_Hidden_Cols
    cv.c:442).  Because the engine takes pattern weights as a traced
    argument, "masking columns" is a zero weight - no data copies, no
    recompiles; train/test splits reuse one executable.

  * kfold.pos (CV_Hide_Align_At_Random_Pos cv.c:151 /
    _One_Per_Site cv.c:185): mask individual cells; scoring uses the
    tip-CV predictive distribution restricted to the masked cells,
    with the model refit on the masked alignment.

ROC points (reference ROC in stats.c, printed as ###model,tax,...)
are returned as arrays for the caller to write.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from phyml_tpu.models.eigen import pmat

_PREC = jax.lax.Precision.HIGHEST


def tip_predictive_probs(engine, params, tree):
    """[n_otu, P, ns_obs] leave-one-out predictive state probabilities
    for every tip cell (CV_Tip_Cv cv.c:74-99, batched)."""

    def _probs(params, tree):
        lam, V, Vinv, pi, w, pinv = engine._system(params)
        pmats = engine._pmats(lam, V, Vinv,
                              tree.blen.astype(engine.dtype))
        pup, clv, sc = engine._up_pass(pmats, tree.child)
        out, sc_out = engine._down_pass(pmats, tree.child, pup, sc, pi)
        n = engine.n_otu
        # (out^T P)[x]: likelihood of the rest of the data if tip u's
        # state were x (site likelihood = out^T P clv, and a bare tip
        # has clv = e_x).  The class mix uses the per-class scales.
        ext = jnp.einsum("uczp,uczx->ucxp", out[:n], pmats[:n],
                         precision=_PREC)
        m = jnp.max(sc_out[:n], axis=1, keepdims=True)     # [n,1,P]
        cw = w[None, :, None] * jnp.exp(sc_out[:n] - m)    # [n,C,P]
        pred = jnp.einsum("ucp,ucxp->uxp", cw, ext, precision=_PREC)
        pred = jnp.maximum(pred, engine._tiny)
        pred = pred / jnp.sum(pred, axis=1, keepdims=True)
        return jnp.transpose(pred, (0, 2, 1))              # [n,P,ns]

    probs = jax.jit(engine.bind_data(_probs))(
        engine.data(), params, tree)
    ns_obs = engine.aln.partials.shape[-1]
    probs = np.asarray(probs)[:, : engine.aln.n_patterns, :]
    if probs.shape[-1] != ns_obs:
        # covarion: predictive distribution over observed states is
        # the hidden-marginalized one
        n_h = probs.shape[-1] // ns_obs
        probs = probs.reshape(probs.shape[0], probs.shape[1],
                              n_h, ns_obs).sum(axis=2)
    return probs


def tip_cv(engine, params, tree):
    """Leave-one-out CV over all unambiguous tip cells.

    Returns dict with:
      probs   [n_otu, P, ns]  predictive state probabilities
      truth   [n_otu, P]      observed state index (-1 = ambiguous)
      logpred [n_otu, P]      log predictive prob of the truth
      score   float           weighted mean log predictive probability
                              (the model-selection criterion)
    """
    aln = engine.aln
    probs = tip_predictive_probs(engine, params, tree)
    tips = aln.partials                       # [n_otu, P, ns]
    unamb = tips.sum(axis=-1) == 1.0          # exactly one state
    truth = np.where(unamb, tips.argmax(axis=-1), -1)

    safe = np.maximum(truth, 0)
    logpred = np.log(
        np.take_along_axis(probs, safe[..., None], axis=-1)[..., 0]
    )
    logpred = np.where(unamb, logpred, 0.0)
    wts = np.asarray(aln.weights)[None, :] * unamb
    score = float((logpred * wts).sum() / wts.sum())
    return dict(probs=probs, truth=truth, logpred=logpred, score=score)


def kfold_col_cv(engine, model, params, tree, n_folds: int = 5,
                 rng=None, opt_blen: bool = True, verbose: bool = False):
    """K-fold column cross-validation (cv.c:213 + :442): patterns are
    partitioned into K folds; for each fold, refit (branch lengths +
    free scalars) with the fold's weights zeroed, then sum the
    held-out patterns' predictive site log-likelihoods.

    Returns (total heldout log-likelihood, per-fold list)."""
    from phyml_tpu.optim.round import round_optimize

    rng = np.random.default_rng() if rng is None else rng
    P_raw = engine.aln.n_patterns
    fold_of = rng.integers(0, n_folds, size=P_raw)
    base_w = np.asarray(engine.weights)        # padded [P]

    total = 0.0
    per_fold = []
    for k in range(n_folds):
        hide = np.zeros_like(base_w)
        hide[:P_raw] = fold_of == k
        train_w = jnp.asarray(base_w * (1.0 - hide))
        p_k, t_k, _ = round_optimize(
            engine, model, params, tree,
            opt_blen=opt_blen, opt_params=True, weights=train_w,
        )
        site = np.asarray(engine.site_logliks(p_k, t_k))
        held = float(np.sum(site * base_w * hide))
        per_fold.append(held)
        total += held
        if verbose:
            print(f"  fold {k + 1}/{n_folds}: heldout lnL {held:.4f}")
    return total, per_fold


def mask_cells(aln, cells):
    """Return a copy of `aln` with the given (taxon, pattern) cells
    made fully ambiguous (CV_Hide_Align_At_Given_Pos cv.c:253)."""
    import copy
    out = copy.copy(aln)
    partials = np.array(aln.partials)
    for (t, p) in cells:
        partials[t, p, :] = 1.0
    out.partials = partials
    return out


def kfold_pos_cv(engine_factory, aln, model, params, tree,
                 mask_prob: float = 0.05, rng=None,
                 opt_blen: bool = True):
    """Positional CV: mask a random subset of unambiguous cells, refit
    on the masked alignment, and score the predictive probability of
    the true states at the masked cells (cv.c:151 + :273).

    engine_factory(aln) -> LikelihoodEngine (the masked alignment
    needs its own tip tensors).  Returns (score, n_masked)."""
    from phyml_tpu.optim.round import round_optimize

    rng = np.random.default_rng() if rng is None else rng
    unamb = aln.partials.sum(axis=-1) == 1.0
    pick = (rng.random(unamb.shape) < mask_prob) & unamb
    cells = list(zip(*np.nonzero(pick)))
    if not cells:
        return 0.0, 0
    masked = mask_cells(aln, cells)
    eng_m = engine_factory(masked)
    p_m, t_m, _ = round_optimize(eng_m, model, params, tree,
                                 opt_blen=opt_blen, opt_params=True)
    probs = tip_predictive_probs(eng_m, p_m, t_m)
    truth = aln.partials.argmax(axis=-1)
    w = np.asarray(aln.weights)
    score = 0.0
    for (t, p) in cells:
        score += float(np.log(max(probs[t, p, truth[t, p]], 1e-300))
                       * w[p])
    return score, len(cells)


def roc_points(probs, truth, n_thresholds: int = 101):
    """ROC curve for the state calls (reference ROC): at threshold q,
    a (cell, state) pair is called positive when prob >= q.  Returns
    (fpr [T], tpr [T])."""
    ns = probs.shape[-1]
    flat_p = probs.reshape(-1, ns)
    ok = truth.reshape(-1) >= 0
    flat_p = flat_p[ok]
    t = truth.reshape(-1)[ok]
    is_true = np.zeros_like(flat_p, dtype=bool)
    is_true[np.arange(len(t)), t] = True

    qs = np.linspace(0.0, 1.0, n_thresholds)
    pos = flat_p[..., None] >= qs[None, None, :]     # [N, ns, T]
    tp = (pos & is_true[..., None]).sum(axis=(0, 1))
    fp = (pos & ~is_true[..., None]).sum(axis=(0, 1))
    P = is_true.sum()
    N = (~is_true).sum()
    return fp / max(N, 1), tp / max(P, 1)
