"""L0 numerical primitives for sparse-GP math on TPU.

Pure, shape-polymorphic functions over arrays with arbitrary leading batch
dimensions (typically ``n_hypers x out_size``).  Everything here is
``jit``/``vmap``/``grad``-safe with static shapes.

Reference parity: var_gp/gp_utils.py (cholesky :5, rev_cholesky :14,
vec2tril :22, mat2trilvec :52, gp_cond :68, linear_joint :101,
linear_marginal_diag :150) — re-derived, not ported; see module docstrings.
"""

from vargp_tpu.gpmath.tril import (
    tril_indices,
    vec2tril,
    mat2trilvec,
    tril_size,
    tril_dim,
    filled_perm,
    rowmajor_to_filled,
    filled_to_rowmajor,
    tril_from_filled,
)
from vargp_tpu.gpmath.linalg import (
    DEFAULT_JITTER,
    add_jitter,
    cholesky,
    rev_cholesky,
    tri_solve,
    tri_inv,
    chol_solve,
    mm,
    mtm,
    mmt,
    rows2_blocks,
    tri3_blocks,
)
from vargp_tpu.gpmath.mvn import (
    mvn_kl,
    mvn_log_prob,
    mvn_sample,
)
from vargp_tpu.gpmath.conditional import (
    gp_cond,
    linear_joint,
    linear_marginal_diag,
    ar_joint_posterior,
    ar_joint_posterior_fast,
    ar_joint_posterior_factored,
    whitened_marginal_diag,
    whitened_marginal_diag_factored,
)

__all__ = [
    "tril_indices",
    "vec2tril",
    "mat2trilvec",
    "tril_size",
    "tril_dim",
    "filled_perm",
    "rowmajor_to_filled",
    "filled_to_rowmajor",
    "tril_from_filled",
    "DEFAULT_JITTER",
    "add_jitter",
    "cholesky",
    "rev_cholesky",
    "tri_solve",
    "tri_inv",
    "chol_solve",
    "mvn_kl",
    "mvn_log_prob",
    "mvn_sample",
    "gp_cond",
    "linear_joint",
    "linear_marginal_diag",
    "ar_joint_posterior",
    "ar_joint_posterior_fast",
    "ar_joint_posterior_factored",
    "whitened_marginal_diag",
    "whitened_marginal_diag_factored",
]
