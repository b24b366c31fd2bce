"""Sequence-parallel GP posterior prediction: shard the training-row axis.

The sequence/context-parallel analogue for this model family (SURVEY.md
§2.6: there is no attention — the N axis of the Gram/star-kernel work is
the sequence axis).  For a single filter over a model with a large training
set (the hour-long-sequence regime), the per-frame cost is dominated by the
(Ny, P) star kernel and the (Ny, Ny) x (Ny, P) variance contraction; this
module shards BOTH over the Ny axis of a mesh:

- each device holds a row shard of (X, Ay, Ky_inv),
- computes its local star-kernel shard ks_loc (Ny/n, P),
- all-gathers ks over the mesh axis (the one collective; rides ICI),
- contracts its Kinv row shard against the full ks and psums the partial
  mean/quad contributions.

Per frame, per device: O((Ny/n) P d) kernel + O((Ny/n) Ny P) matmul +
one (Ny, P) all-gather — compute scales 1/n with a single ICI-bandwidth
collective.  Exact (tested equal to the single-device path on a CPU mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import GPMDMConfig
from ..models import core
from ..ops import kernels as K


def predict_y_rowsharded(
    post: core.Posterior,
    params: core.GPMDMParams,
    Xstar: jax.Array,
    cfg: GPMDMConfig,
    mesh: Mesh,
    axis: str = "sp",
    with_noise: bool = False,
):
    """Row-sharded observation posterior == core.predict_y (exact).

    Ny must be divisible by the mesh axis size (pad the training set or
    pick the mesh accordingly).
    """
    n = mesh.shape[axis]
    Ny = post.X.shape[0]
    if Ny % n != 0:
        raise ValueError(f"Ny={Ny} not divisible by |{axis}|={n}")

    def local(X_sh, Ay_sh, Kyinv_rows, Xstar):
        # local star-kernel rows, then gather the full star kernel once
        ks_loc = K.rbf_kernel(X_sh, Xstar, params.y_log_lengthscales)  # (Ny/n, P)
        ks_full = jax.lax.all_gather(ks_loc, axis, tiled=True)  # (Ny, P)
        mean_part = jnp.matmul(
            ks_loc.T, Ay_sh, precision=jax.lax.Precision.HIGHEST
        )  # (P, D)
        kik_loc = jnp.matmul(
            Kyinv_rows, ks_full, precision=jax.lax.Precision.HIGHEST
        )  # (Ny/n, P)
        quad_part = jnp.sum(ks_loc * kik_loc, axis=0)  # (P,)
        mean = jax.lax.psum(mean_part, axis)
        quad = jax.lax.psum(quad_part, axis)
        return mean, quad

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P()),
        out_specs=(P(), P()),
    )
    mean, quad = fn(post.X, post.Ay, post.Ky_inv, Xstar)
    diag = K.y_diag_kernel(Xstar, params.y_log_sigma_n, cfg.sigma_n_num_Y, with_noise)
    diag_common = jnp.maximum(diag - quad, 1e-9)
    var = diag_common[:, None] * jnp.exp(params.y_log_lambdas)[None, :] ** -2
    return mean, var


def predict_x_all_classes_rowsharded(
    post: core.Posterior,
    params: core.GPMDMParams,
    Xstar: jax.Array,
    cfg: GPMDMConfig,
    mesh: Mesh,
    axis: str = "sp",
    with_noise: bool = False,
):
    """Row-sharded per-class dynamics posterior == core.predict_x_all_classes.

    Shards the padded per-class pair axis (n_max) over the mesh: each device
    holds (C, n_max/n, ...) slices of Xin_c / Axc / mask and the matching
    Kxc_inv row slices.  One tiled all_gather of the masked star kernel per
    class batch, then local contraction + psum.  n_max must be divisible by
    the mesh axis size.
    """
    n = mesh.shape[axis]
    n_max = post.Xin_c.shape[1]
    if n_max % n != 0:
        raise ValueError(f"n_max={n_max} not divisible by |{axis}|={n}")

    def local(Xin_sh, mask_sh, Kinv_rows, Axc_sh, Xstar):
        # Xin_sh (C, n_max/n, din); Kinv_rows (C, n_max/n, n_max);
        # Axc_sh (C, n_max/n, d)
        def per_class(Xin_b, m_b, Kinv_b, Axc_b):
            ks_loc = K.x_kernel(
                Xin_b, Xstar, params.x_log_lengthscales, params.x_log_sigma_n,
                params.x_log_lin_coeff, with_noise=False,
            ) * m_b[:, None]  # (n_max/n, P)
            mean_part = jnp.matmul(
                ks_loc.T, Axc_b, precision=jax.lax.Precision.HIGHEST
            )  # (P, d)
            return ks_loc, mean_part

        ks_loc, mean_part = jax.vmap(per_class)(Xin_sh, mask_sh, Kinv_rows, Axc_sh)
        ks_full = jax.lax.all_gather(ks_loc, axis, axis=1, tiled=True)  # (C, n_max, P)
        kik_loc = jnp.einsum(
            "cmn,cnp->cmp", Kinv_rows, ks_full, precision=jax.lax.Precision.HIGHEST
        )  # (C, n_max/n, P)
        quad_part = jnp.sum(ks_loc * kik_loc, axis=1)  # (C, P)
        return jax.lax.psum(mean_part, axis), jax.lax.psum(quad_part, axis)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, axis, None),
            P(None, axis),
            P(None, axis, None),
            P(None, axis, None),
            P(),
        ),
        out_specs=(P(), P()),
    )
    mean, quad = fn(post.Xin_c, post.mask_c, post.Kxc_inv, post.Axc, Xstar)
    diag = K.x_diag_kernel(
        Xstar, params.x_log_lin_coeff, params.x_log_sigma_n, cfg.sigma_n_num_X, with_noise
    )
    diag_common = jnp.maximum(diag[None, :] - quad, 1e-9)  # (C, P)
    var = diag_common[:, :, None] * jnp.exp(params.x_log_lambdas)[None, None, :] ** -2
    return mean, var
