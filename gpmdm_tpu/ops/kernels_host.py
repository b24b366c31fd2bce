"""Host-side (numpy, float64) mirrors of the GP kernels in ops/kernels.py.

Used by the posterior precompute paths (core.precompute_host /
sparse.precompute_host), which factor the trained Gram matrices once in f64
on the host and deploy the results in the model dtype.  Keep these formulas
in lockstep with ops/kernels.py — they are the same math, different backend.
"""

from __future__ import annotations

import numpy as np


def f64(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float64)


def fetch_tree(tree):
    """Device -> host for a whole pytree in ONE transfer, dtype-preserving.

    Per-leaf ``np.asarray(jax_array)`` pays a large fixed per-transfer
    cost on the remote-TPU transport (measured 9-63 s PER LEAF for
    kilobyte arrays under load — GPMDM.load spent 55-380 s fetching six
    tiny hyperparameter vectors).  Concatenating the raveled leaves on
    device and fetching once amortizes that to a single round trip.

    Every leaf comes back in its ORIGINAL dtype: floating device leaves
    ride the batched f64 transfer (widening is lossless) and are cast
    back; non-float device leaves (int/bool — none in current callers)
    are fetched individually so no value can quantize through a float
    round-trip; numpy leaves pass through untouched.
    """
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(tree)
    dev_idx = [
        i
        for i, l in enumerate(leaves)
        if isinstance(l, jax.Array) and jnp.issubdtype(l.dtype, jnp.floating)
    ]
    if len(dev_idx) > 1:
        flat = jnp.concatenate(
            [jnp.ravel(leaves[i]).astype(jnp.float64) for i in dev_idx]
        )
        host = np.asarray(flat)  # the one transfer
        ofs = 0
        for i in dev_idx:
            n = leaves[i].size
            leaves[i] = (
                host[ofs:ofs + n].reshape(leaves[i].shape).astype(leaves[i].dtype)
            )
            ofs += n
    return jax.tree.unflatten(
        treedef,
        [np.asarray(l) if isinstance(l, jax.Array) else l for l in leaves],
    )


def rbf(A: np.ndarray, B: np.ndarray, lengthscales: np.ndarray) -> np.ndarray:
    """Unit-signal-variance RBF (ops/kernels.rbf_kernel; reference
    gpmdm.py:436-517)."""
    d = (A[:, None, :] - B[None, :, :]) / lengthscales
    return np.exp(-np.sum(d * d, axis=2))


def linear(A: np.ndarray, B: np.ndarray, lin_w2: np.ndarray) -> np.ndarray:
    """Homogeneous linear kernel with squared weights lin_w2 = exp(coeff)^2
    (ops/kernels.linear_kernel; reference gpmdm.py:520-548)."""
    return (A * lin_w2[:-1]) @ B.T + lin_w2[-1]


def x_kernel(A: np.ndarray, B: np.ndarray, lengthscales: np.ndarray,
             lin_w2: np.ndarray) -> np.ndarray:
    """Dynamics kernel RBF + linear, no noise (ops/kernels.x_kernel)."""
    return rbf(A, B, lengthscales) + linear(A, B, lin_w2)


def class_xin_xout(X: np.ndarray, layout, cfg, pads: dict):
    """Padded per-class (Xin_c, Xout_c, mask) from the latent matrix —
    numpy mirror of sparse._class_xin_xout / core.x_nll_padded_blocks'
    assembly."""
    mask = pads["mask"]
    x_t = X[pads["idx_in"]] * mask[:, :, None]
    if cfg.dyn_back_step == 1:
        Xin_c = x_t
    else:
        Xin_c = np.concatenate([x_t, X[pads["idx_prev"]] * mask[:, :, None]], axis=2)
    Xout_c = X[pads["idx_out"]] * mask[:, :, None]
    if cfg.dyn_target == "delta":
        Xout_c = Xout_c - x_t
    return Xin_c, Xout_c, mask
