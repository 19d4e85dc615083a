"""VAR-GP: variational auto-regressive GP for continual learning.

Parity: var_gp/vargp.py (the paper's method).  Task t's variational
posterior over its inducing outputs is conditioned on ALL previous tasks'
(frozen) variational distributions through the auto-regressive chain
q(u_{<=t}|theta) (vargp.py:35-88), with an EP-style mean parameterization
(prior conditional mean + free offset, vargp.py:151) and MC-sampled
Bayesian kernel hyperparameters.

TPU-first design (see gpmath.conditional): everything is a pure function of
a parameter pytree; the whole forward does ONE batched Cholesky of the full
inducing Gram and reads every AR-chain quantity (per-task projections,
conditional prior covariance = trailing Cholesky block, prefix posteriors =
leading blocks) out of its sub-blocks.  The reference computes, per step,
t-1 growing Choleskys in compute_q + chol(K_full) + chol(S) in
linear_marginal_diag + chol(prior_cov) in forward — all collapsed here.
"""

from dataclasses import dataclass
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from vargp_tpu import gpmath
from vargp_tpu.gpmath.linalg import _HIGHEST
from vargp_tpu.kernels import (
    MLPParams,
    RBFParams,
    RBFPrior,
    cross_gram,
    deep_gram,
    default_prior,
    gram,
    gram_diag,
    init_mlp,
    init_rbf,
    kl_hypers,
    sample_hypers,
    sym_gram,
)
from vargp_tpu.likelihoods import softmax_loss, softmax_predict


class TaskPosterior(NamedTuple):
    """Frozen variational posterior of a completed task (the checkpoint
    chain entry; parity: vargp.py:17-20 where u_tril is pre-unpacked)."""

    z: jax.Array  # (O, M, D)
    u_mean: jax.Array  # (O, M, 1)
    u_tril: jax.Array  # (O, M, M)


class VARGPParams(NamedTuple):
    """Trainable parameters for the current task (parity: vargp.py:28-33 +
    kernel variational params; phi present only under DKL)."""

    z: jax.Array  # (O, M, D)
    u_mean: jax.Array  # (O, M, 1)
    u_tril_vec: jax.Array  # (O, M(M+1)/2)
    kernel: RBFParams
    phi: MLPParams | None = None


@dataclass(frozen=True)
class VARGPConfig:
    """Static model configuration (hashable -> usable as a jit static arg)."""

    M: int
    out_size: int
    in_size: int
    n_f: int = 10
    n_var_samples: int = 3
    ep_var_mean: bool = True
    map_est_hypers: bool = False
    dkl: bool = False
    jitter: float = gpmath.DEFAULT_JITTER
    # TPU fast path: invert the Gram Cholesky once (blocked, MXU matmuls)
    # instead of repeated substitution-bound triangular solves.  ~10x on the
    # measured v5e ELBO step; exact same math up to f32 rounding.
    solve_via_inverse: bool = True
    # Packing order of params.u_tril_vec: "rowmajor" (the public
    # reference-parity layout) or "filled" (fill_triangular order, whose
    # unpack is gather-free — gpmath.tril_from_filled).  The train loop
    # flips this to "filled" inside scanned device blocks, converting the
    # param at the dispatch boundary; bit-exact either way (tested).
    tril_layout: str = "rowmajor"


class ForwardResult(NamedTuple):
    f_mean: jax.Array  # (H, O, B)
    f_var: jax.Array  # (H, O, B)
    kl_hypers: jax.Array  # scalar
    kl_u: jax.Array  # scalar


# chain size (total inducing rows) above which the closed-form block-LDL
# AR-posterior construction beats the unrolled fold (measured on v5e);
# module-level so tests can exercise the large-chain paths on tiny shapes
_FAST_CHAIN_MIN_ROWS = 768


def _ar_form() -> str:
    """AR-posterior representation for equal-block chains (T >= 2, every
    chain size): "factored" (default — whitened blockdiag(w) form, skips
    the LS materialization + un-whitening; same math, ~5x less posterior-
    assembly data movement at S=1000) or "materialized" (the explicit
    scale-factor construction — the block-LDL build at S >=
    _FAST_CHAIN_MIN_ROWS, the sequential fold below it).  Unknown values
    raise — a typo must not silently change the compiled program.  Read
    (and validated) at TRACE time: already-compiled programs keep the form
    they were traced with, so changing the env var mid-process requires a
    fresh jit/trace to take effect (or to surface a typo)."""
    import os

    v = os.environ.get("VARGP_TPU_AR_FORM", "factored")
    if v not in ("factored", "materialized"):
        raise ValueError(
            f"VARGP_TPU_AR_FORM={v!r}: expected 'factored' or 'materialized'"
        )
    return v


def eval_budget_cfg(cfg, n_f: int | None = None, n_var_samples: int | None = None):
    """Config with eval-time MC budgets overridden.  None means 'keep the
    config value'; an explicit non-positive budget raises — `n_f or
    cfg.n_f` would silently substitute the training default for 0, and
    the logged budget would not be the budget that ran.  Shared by
    vargp.predict and global_svgp.predict so the override semantics
    cannot drift between the two."""
    for name, v in (("n_f", n_f), ("n_var_samples", n_var_samples)):
        if v is not None and v < 1:
            raise ValueError(f"{name}={v}: eval MC budget must be >= 1")
    if n_f is None and n_var_samples is None:
        return cfg
    from dataclasses import replace

    return replace(
        cfg,
        n_f=cfg.n_f if n_f is None else n_f,
        n_var_samples=(
            cfg.n_var_samples if n_var_samples is None else n_var_samples
        ),
    )


def _gram_fn(params: VARGPParams, cfg: VARGPConfig):
    if cfg.dkl:
        # precision threads through (the DKL cross-Gram runs bf16x3 like
        # the non-DKL one — accepting-and-dropping the kwarg silently ran
        # it at 2x MXU cost)
        return lambda theta, x, y=None, precision="highest": deep_gram(
            params.phi, theta, x, y, precision=precision
        )
    return gram


def _unpack_u_tril(params: VARGPParams, cfg: VARGPConfig) -> jax.Array:
    """Unpack the current task's variational scale factor according to
    ``cfg.tril_layout`` (values are identical in both layouts; "filled"
    avoids the gather/scatter pair — 14 ms/step at M=1024 on v5e)."""
    if cfg.tril_layout == "filled":
        return gpmath.tril_from_filled(params.u_tril_vec, cfg.M)
    if cfg.tril_layout != "rowmajor":
        raise ValueError(f"unknown tril_layout {cfg.tril_layout!r}")
    return gpmath.vec2tril(params.u_tril_vec, cfg.M)


def _concat_chain(params: VARGPParams, prev: Sequence[TaskPosterior], cfg):
    """Stack the AR chain's inducing points / means / scale factors in task
    order, current task last."""
    u_tril_t = _unpack_u_tril(params, cfg)
    z_all = jnp.concatenate([p.z for p in prev] + [params.z], axis=-2)
    u_means = [p.u_mean for p in prev] + [params.u_mean]
    u_trils = [p.u_tril for p in prev] + [u_tril_t]
    return z_all, u_means, u_trils, u_tril_t


def pad_chain(
    prev: Sequence[TaskPosterior], cfg: VARGPConfig, t_max: int
):
    """Pad the frozen chain to ``t_max - 1`` entries with inert dummies.

    Padded-chain compilation: chain length changes array shapes, so every
    task would recompile its programs.  Dummy tasks (z=0, u_mean=0,
    u_tril=I) plus Gram masking (see ``forward``) make the computation
    EXACT for the real prefix — the masked Gram is block-diagonal between
    real and pad rows, its Cholesky embeds the real factors unchanged, and
    pad rows never touch the marginal or the KLs.  One compile serves all
    tasks; the task index lives in ``chain_mask`` (a traced input).

    Returns (padded_prev, chain_mask) with chain_mask: (t_max-1,) float.
    """
    n_prev = len(prev)
    assert n_prev <= t_max - 1, (n_prev, t_max)
    dummy = TaskPosterior(
        z=jnp.zeros((cfg.out_size, cfg.M, cfg.in_size)),
        u_mean=jnp.zeros((cfg.out_size, cfg.M, 1)),
        u_tril=jnp.broadcast_to(
            jnp.eye(cfg.M), (cfg.out_size, cfg.M, cfg.M)
        ),
    )
    padded = tuple(prev) + tuple(dummy for _ in range(t_max - 1 - n_prev))
    mask = jnp.asarray(
        [1.0] * n_prev + [0.0] * (t_max - 1 - n_prev), jnp.float32
    )
    return padded, mask


def _row_mask(chain_mask: jax.Array, M: int) -> jax.Array:
    """Per-inducing-row mask over the full chain incl. the current task."""
    return jnp.concatenate(
        [jnp.repeat(chain_mask, M), jnp.ones((M,), chain_mask.dtype)]
    )


class ChainPosterior(NamedTuple):
    """Cached x-independent state of one forward pass: the hyper-samples,
    the full-chain Gram factorization, and the AR joint posterior
    q(u_{<=t}|theta).  Building this is the (sum M)^3 part of the forward;
    everything per-batch (cross-Gram + whitened marginal) is O(M^2 B).
    Eval loops build it ONCE per dataset and reuse it across batches.

    Exactly one of (LS, w_blocks) is set: LS is the materialized
    (H, O, SM, SM) joint scale factor; w_blocks is the whitened factored
    form (H, O, T, M, M) with LS == L @ blockdiag(w_blocks) (see
    gpmath.ar_joint_posterior_factored — equal-block chains skip the
    L @ ... @ L^{-1} round trip and its 120 MB relayouts).  In factored
    mode the mean is whitened too: ``mean`` is None and ``v_mean`` holds
    L^{-1} mean — every consumer needs exactly that, so storing the
    un-whitened mean would cost an (S, S) HBM read + bf16x3 round trip
    per consumer."""

    theta: jax.Array  # (H, Dth+1)
    L: jax.Array  # (H, O, SM, SM)
    L_inv: jax.Array | None
    mean: jax.Array | None  # (H, O, SM, 1) joint posterior mean
    LS: jax.Array | None  # (H, O, SM, SM) joint posterior scale factor
    z_all: jax.Array  # (O, SM, D)
    u_tril_t: jax.Array  # (O, M, M) current task's unpacked scale factor
    w_blocks: jax.Array | None = None  # (H, O, T, M, M) whitened factors
    v_mean: jax.Array | None = None  # (H, O, SM, 1) whitened mean (factored)


def build_posterior(
    params: VARGPParams,
    prev: Sequence[TaskPosterior],
    key: jax.Array,
    cfg: VARGPConfig,
    *,
    chain_mask: jax.Array | None = None,
    n_var_samples: int | None = None,
) -> ChainPosterior:
    """Sample theta and construct the AR joint posterior over the whole
    inducing chain (parity: vargp.py:127 + compute_q, :35-88)."""
    theta = sample_hypers(
        key, params.kernel,
        eval_budget_cfg(cfg, n_var_samples=n_var_samples).n_var_samples,
        map_est=cfg.map_est_hypers,
    )
    gram_ = _gram_fn(params, cfg)
    z_all, u_means, u_trils, u_tril_t = _concat_chain(params, prev, cfg)

    if cfg.dkl:
        Kzz = gram_(theta, z_all)  # (H, O, SM, SM)
    else:
        # fused-scaling symmetric Gram: no (H, O, SM, D) pre-scaled
        # broadcast (kernels.rbf.sym_gram == gram(theta, z_all), tested)
        Kzz = sym_gram(theta, z_all)
    if chain_mask is not None:
        rm = _row_mask(chain_mask, cfg.M)
        Kzz = Kzz * (rm[:, None] * rm[None, :]) + jnp.diag(1.0 - rm)
    if cfg.solve_via_inverse:
        from vargp_tpu.ops.dispatch import chol_and_inv

        L, L_inv = chol_and_inv(gpmath.add_jitter(Kzz, cfg.jitter))
    else:
        L = gpmath.cholesky(Kzz, cfg.jitter)
        L_inv = None

    M0 = u_means[0].shape[-2]
    equal_blocks = all(u.shape[-2] == M0 for u in u_means)
    if (
        L_inv is not None
        and len(u_means) >= 2
        and equal_blocks
        and _ar_form() == "factored"
    ):
        # whitened factored form: blockdiag(w) IS L^{-1} LS — never
        # materialize the (sum M)^2 LS or un-whiten it downstream.
        # Default at EVERY equal-block chain size (hardware A/B, v5e
        # 2026-08-19: flagship S=300 fold 3.26 -> 2.91 ms, S=1000
        # materialized 29.1 -> 20.96 ms; losses identical to 4 decimals).
        fpost = gpmath.ar_joint_posterior_factored(L, L_inv, u_means, u_trils)
        return ChainPosterior(
            theta=theta, L=L, L_inv=L_inv, mean=None, LS=None,
            z_all=z_all, u_tril_t=u_tril_t, w_blocks=fpost.w,
            v_mean=fpost.v,
        )
    if L_inv is not None and z_all.shape[-2] >= _FAST_CHAIN_MIN_ROWS:
        # closed-form block-LDL construction (batched matmuls, no task
        # fold) — wins at large chain sizes; the unrolled fold's smaller
        # sequential joins win below ~768 total inducing rows (measured)
        post = gpmath.ar_joint_posterior_fast(L, L_inv, u_means, u_trils)
    else:
        post = gpmath.ar_joint_posterior(L, u_means, u_trils, L_inv=L_inv)

    return ChainPosterior(
        theta=theta, L=L, L_inv=L_inv, mean=post.mean, LS=post.LS,
        z_all=z_all, u_tril_t=u_tril_t,
    )


def marginal_diag(
    cp: ChainPosterior,
    params: VARGPParams,
    x: jax.Array,
    cfg: VARGPConfig,
    *,
    chain_mask: jax.Array | None = None,
):
    """Per-batch diagonal predictive marginal from a cached posterior
    (parity: compute_pf_diag, vargp.py:90-113)."""
    # cross-Gram is never factorized: bf16x3 is accurate enough and ~2x
    # cheaper on the MXU than full f32
    if cfg.dkl:
        gram_ = _gram_fn(params, cfg)
        xb = jnp.broadcast_to(x[None], (cfg.out_size, *x.shape))
        Kzx = gram_(cp.theta, cp.z_all, xb, precision="high")  # (H, O, SM, B)
    else:
        # specialized path: x shared across class heads, never broadcast
        # to (H, O, B, D) (kernels.rbf.cross_gram)
        Kzx = cross_gram(cp.theta, cp.z_all, x, precision="high")
    if chain_mask is not None:
        Kzx = Kzx * _row_mask(chain_mask, cfg.M)[:, None]
    kxx_diag = gram_diag(cp.theta)  # (H, 1, 1)
    if cp.w_blocks is not None:
        return gpmath.whitened_marginal_diag_factored(
            cp.L_inv, cp.v_mean, cp.w_blocks, Kzx, kxx_diag
        )
    return gpmath.whitened_marginal_diag(
        cp.L, cp.mean, cp.LS, Kzx, kxx_diag, L_inv=cp.L_inv
    )


def forward(
    params: VARGPParams,
    prev: Sequence[TaskPosterior],
    prior: RBFPrior,
    x: jax.Array,
    key: jax.Array,
    cfg: VARGPConfig,
    *,
    with_kl: bool,
    chain_mask: jax.Array | None = None,
) -> ForwardResult:
    """One fused ELBO forward pass (parity: vargp.py:115-194).

    x: (B, D).  Returns diag predictive moments per hyper-sample and, when
    ``with_kl``, the two KL terms of the ELBO.  ``chain_mask`` activates
    padded-chain mode (see ``pad_chain``): Gram rows of masked-out tasks
    are zeroed with unit diagonal, which embeds the unpadded computation
    exactly.
    """
    k_hyp, k_u = jax.random.split(key)
    cp = build_posterior(params, prev, k_hyp, cfg, chain_mask=chain_mask)
    f_mean, f_var = marginal_diag(cp, params, x, cfg, chain_mask=chain_mask)

    if not with_kl:
        zero = jnp.zeros((), f_mean.dtype)
        return ForwardResult(f_mean, f_var, zero, zero)

    L, L_inv, post = cp.L, cp.L_inv, cp
    u_tril_t = cp.u_tril_t  # unpacked once in build_posterior
    klh = kl_hypers(params.kernel, prior, map_est=cfg.map_est_hypers)

    if prev:
        c = cp.z_all.shape[-2] - cfg.M
        # plain slices, NOT tri3_blocks: only 1-2 of the 3 blocks are live
        # per branch here, and a dead slice costs nothing while the fused
        # cotangent build would materialize its zeros (measured by audit)
        L11 = L[..., :c, :c]
        L21 = L[..., c:, :c]
        L22 = L[..., c:, c:]  # == chol of p(u_t | u_{<t}, theta) covariance

        # u_{<t} ~ q(u_{<t}|theta): prefix of the joint posterior, n_v draws
        # (parity: vargp.py:137-138)
        if cp.w_blocks is not None:
            # factored form: the conditional prior mean is
            # L21 L11^{-1} u_lt with u_lt = mu_lt + L11 blockdiag(w) eps,
            # so L11^{-1} u_lt = L11^{-1} mu_lt + blockdiag(w) eps EXACTLY
            # — sample in whitened space and skip both the L11 @ (sample)
            # and the L11^{-1} @ (un-sample) matmuls.  Prefix property:
            # the first t-1 blocks of w (and of the whitened mean v) ARE
            # the prefix posterior's, since L is block-lower-triangular —
            # so L11^{-1} mu_lt == v[:c] with no matmul at all.
            n_prev = c // cfg.M
            v_lt = cp.v_mean[..., :c, :]
            eps = jax.random.normal(
                k_u, (cfg.n_var_samples, *v_lt.shape[:-1]), dtype=v_lt.dtype
            )
            e4 = eps.reshape(*eps.shape[:-1], n_prev, cfg.M, 1)
            s = gpmath.mm(cp.w_blocks[..., :n_prev, :, :], e4)
            s = s.reshape(*eps.shape[:-1], c, 1)
            w = v_lt + s
        else:
            mu_lt = post.mean[..., :c, 0]
            LS_lt = post.LS[..., :c, :c]
            u_lt = gpmath.mvn_sample(
                k_u, mu_lt, LS_lt, sample_shape=(cfg.n_var_samples,)
            )

            # conditional prior mean K_{t,<t} K_{<t}^{-1} u = L21 L11^{-1} u
            if L_inv is not None:
                w = gpmath.mm(L_inv[..., :c, :c], u_lt[..., None])
            else:
                w = gpmath.tri_solve(L11, u_lt[..., None])
        prior_mu_t = gpmath.mm(L21, w)[..., 0]

        # EP-style variational mean (vargp.py:151)
        mask = 1.0 if cfg.ep_var_mean else 0.0
        var_mu_t = prior_mu_t * mask + params.u_mean[..., 0]

        L22_inv = None
        if L_inv is not None:
            # trailing diagonal block of L^{-1} is inv(L22)
            L22_inv = L_inv[..., c:, c:]
        kl = gpmath.mvn_kl(
            var_mu_t, u_tril_t, prior_mu_t, L22, Lp_inv=L22_inv
        )  # (n_v, H, O)
        kl_u = jnp.mean(jnp.sum(kl, axis=-1))
    else:
        # task 0: q(u_0) vs N(0, Kzz) (vargp.py:156-173)
        kl = gpmath.mvn_kl(
            params.u_mean[..., 0],
            u_tril_t,
            jnp.zeros_like(params.u_mean[..., 0]),
            L,
            Lp_inv=L_inv,
        )  # (H, O)
        kl_u = jnp.mean(jnp.sum(kl, axis=-1))

    return ForwardResult(f_mean, f_var, klh, kl_u)


def loss(
    params: VARGPParams,
    prev: Sequence[TaskPosterior],
    prior: RBFPrior,
    x: jax.Array,
    y: jax.Array,
    key: jax.Array,
    cfg: VARGPConfig,
    weights: jax.Array | None = None,
    chain_mask: jax.Array | None = None,
):
    """ELBO pieces (kl_hypers, kl_u, nll) — parity: vargp.py:177-194.
    The driver combines them as beta*kl_hypers + kl_u + (N/B)*nll.
    ``weights`` masks padded batch rows (static-shape batching);
    ``chain_mask`` activates padded-chain mode (one compile per
    experiment — the chained KL degenerates exactly to the task-0 KL when
    every chain slot is masked)."""
    k_fwd, k_lik = jax.random.split(key)
    out = forward(
        params, prev, prior, x, k_fwd, cfg, with_kl=True, chain_mask=chain_mask
    )
    nll = softmax_loss(k_lik, out.f_mean, out.f_var, y, cfg.n_f, weights=weights)
    return out.kl_hypers, out.kl_u, nll


def predict(
    params: VARGPParams,
    prev: Sequence[TaskPosterior],
    x: jax.Array,
    key: jax.Array,
    cfg: VARGPConfig,
    *,
    n_f: int | None = None,
    n_var_samples: int | None = None,
    chain_mask: jax.Array | None = None,
) -> jax.Array:
    """Predictive class probabilities, (B, out_size) — parity vargp.py:196-198.
    Eval-time MC budgets (n_f, n_var_samples) can be overridden, matching the
    notebooks' protocol (mnist.ipynb cell 12: n_f=50+, n_var_samples=20)."""
    cfg_eval = eval_budget_cfg(cfg, n_f=n_f, n_var_samples=n_var_samples)
    k_fwd, k_lik = jax.random.split(key)
    out = forward(
        params, prev, default_prior(_theta_size(cfg_eval)), x, k_fwd, cfg_eval,
        with_kl=False, chain_mask=chain_mask,
    )
    return softmax_predict(k_lik, out.f_mean, out.f_var, cfg_eval.n_f)


def _theta_size(cfg: VARGPConfig) -> int:
    from vargp_tpu.kernels.deep import DEFAULT_FEATURES

    return DEFAULT_FEATURES if cfg.dkl else cfg.in_size


# ---------------------------------------------------------------------------
# Construction / task chaining (parity: VARGP.create_clf, vargp.py:200-243)
# ---------------------------------------------------------------------------


def median_log_lengthscale(data: jax.Array, n_sample: int = 512) -> jax.Array:
    """Median-heuristic log-lengthscale: log of the median pairwise
    distance of a data subsample (per-dimension shared).  Guards against
    the dead-kernel regime on high-dimensional inputs where exp(-d^2/2)
    underflows at the reference's fixed init (no reference counterpart —
    opt-in via the drivers' ls_init='median')."""
    x = data[:n_sample]
    d2 = jnp.sum(jnp.square(x[:, None] - x[None]), axis=-1)
    med = jnp.sqrt(jnp.median(d2[d2 > 0]))
    return jnp.log(jnp.maximum(med, 1e-3))


def init_params(
    key: jax.Array,
    z_init: jax.Array,
    cfg: VARGPConfig,
    *,
    kernel_prior_from: RBFParams | None = None,
    phi_init: MLPParams | None = None,
    log_lengthscale_init: jax.Array | float | None = None,
) -> tuple[VARGPParams, RBFPrior]:
    """Build trainable params for a new task.

    z_init: (O, M, D) inducing inputs (typically random data rows per class,
    vargp.py:207-209).  The kernel hyperprior chains from the previous
    task's posterior when given (vargp.py:216-217); under DKL the feature
    map warm-starts from ``phi_init`` (vargp.py:219-221,234-235).
    """
    k_kern, k_u, k_phi = jax.random.split(key, 3)
    theta_size = _theta_size(cfg)

    kernel = init_rbf(k_kern, theta_size)
    if log_lengthscale_init is not None:
        ls = jnp.broadcast_to(
            jnp.asarray(log_lengthscale_init, kernel.log_mean.dtype), (theta_size,)
        )
        kernel = kernel._replace(
            log_mean=jnp.concatenate([ls, kernel.log_mean[-1:]])
        )
    if kernel_prior_from is not None:
        prior = RBFPrior(
            log_mean=kernel_prior_from.log_mean,
            log_logvar=kernel_prior_from.log_logvar,
        )
    else:
        prior = default_prior(theta_size)

    phi = None
    if cfg.dkl:
        if phi_init is not None:
            # fresh buffers: phi becomes part of the (donated) trainable
            # params while the caller's chain keeps its own copy
            phi = jax.tree_util.tree_map(jnp.copy, phi_init)
        else:
            phi = init_mlp(k_phi, cfg.in_size)

    u_mean = 0.5 * jax.random.normal(k_u, (cfg.out_size, cfg.M, 1))
    # reference init: packed identity (raw 1.0 diag) -> softplus(1) on the
    # unpacked diagonal (vargp.py:32-33); replicated for trajectory parity
    rows_cols_equal = _diag_mask_vec(cfg.M)
    u_tril_vec = jnp.broadcast_to(
        rows_cols_equal, (cfg.out_size, rows_cols_equal.shape[-1])
    )

    return (
        VARGPParams(
            z=z_init, u_mean=u_mean, u_tril_vec=u_tril_vec, kernel=kernel, phi=phi
        ),
        prior,
    )


def _diag_mask_vec(m: int) -> jax.Array:
    import numpy as np

    rows, cols = gpmath.tril_indices(m)
    return jnp.asarray((rows == cols).astype(np.float32))


def freeze_task(params: VARGPParams) -> TaskPosterior:
    """Convert a trained task's params into a frozen chain entry
    (parity: vargp.py:17-20 — unpack u_tril once, drop kernel params the way
    create_clf strips 'kernel.*' keys, vargp.py:223-229)."""
    return TaskPosterior(
        z=jax.lax.stop_gradient(params.z),
        u_mean=jax.lax.stop_gradient(params.u_mean),
        u_tril=jax.lax.stop_gradient(gpmath.vec2tril(params.u_tril_vec)),
    )


def select_inducing(key: jax.Array, data: jax.Array, M: int, out_size: int):
    """Inducing init: M random data rows per class head (vargp.py:207-209).

    When the task's train set has fewer than M rows (scaled configs, e.g.
    M=1024 on Split-Digits), rows are drawn WITH replacement — a silent
    ``permutation(...)[:M]`` truncation would hand the model a z whose row
    count disagrees with cfg.M and break every padded-chain shape
    downstream.  Duplicate inducing rows are harmless: the jittered
    factorization keeps the Gram PSD, and the optimizer separates them.
    """
    n = data.shape[0]
    keys = jax.random.split(key, out_size)
    if n >= M:
        idx = jnp.stack([jax.random.permutation(k, n)[:M] for k in keys])
    else:
        idx = jnp.stack(
            [jax.random.choice(k, n, shape=(M,), replace=True) for k in keys]
        )
    return data[idx]  # (O, M, D)
