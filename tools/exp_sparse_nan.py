"""Localize the sparse-family f32 NaN on frozen hourlong params.

Round-4 diagnosis step 2 (tools/diag_train_nan.py found the hourlong f32
freeze at step ~141 with NaN confined to the x-side SGPR grads at
HEALTHY hyperparameters — unlike the exact family's linear-kernel
conditioning story).  This tool loads the frozen params
(diag_train_nan.py --save-params), rebuilds the training pads, and
evaluates every intermediate of the per-class `_sgpr_terms` chain —
Kmm, Lm, A, B, LB, c, quad, trace, nll — on the TARGET device in f32,
printing finiteness + magnitude + condition against host-f64 ground
truth, separately for the y-side and each x class.

Usage: python tools/exp_sparse_nan.py /tmp/hourlong_frozen.npz \
           [--config hourlong] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("params_npz")
    ap.add_argument("--config", default="hourlong")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp

    from train_bench_assets import CONFIGS

    from gpmdm_tpu import SparseGPMDM
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.models import sparse as S
    from gpmdm_tpu.ops import kernels as K
    from gpmdm_tpu.ops import linalg as LA

    family, n_seqs, seq_len, _, extra = CONFIGS[args.config]
    assert family == "sparse", args.config
    D, d, C = extra.get("D", 35), extra.get("d", 2), extra.get("C", 2)
    tr, lb, _, _ = synthetic.make_dataset(
        n_classes=C, n_train_seqs=n_seqs, n_test_seqs=1, seq_len=seq_len,
        D=D, **extra.get("data", {"seed": 0}),
    )
    m = SparseGPMDM(D=D, d=d, n_classes=C, dtype="float32",
                    y_sigma_n_init=0.1, x_sigma_n_init=0.1,
                    n_inducing_y=extra["m_y"], n_inducing_x=extra["m_x"],
                    **extra.get("model", {}))
    for Y, c in zip(tr, lb):
        m.add_data(Y, c)
    m.init_X()

    z = np.load(args.params_npz)
    fields = {f.name: jnp.asarray(z[f.name], dtype=jnp.float32)
              for f in dataclasses.fields(m.params)}
    params = type(m.params)(**fields)
    cfg = m.config
    pads = S._pads_jnp(m.layout, jnp.float32)
    print(json.dumps({"device": jax.devices()[0].platform}), flush=True)

    Xin_c, Xout_c, mask = S._class_xin_xout(params, cfg, pads)

    def probe(name, Kmm, Kmn, knn_diag, Yb, log_sigma, w2, n_valid, col_mask):
        """Evaluate the _sgpr_terms chain stepwise on-device (f32) and on
        host (f64); print finiteness + key magnitudes per step."""
        rec = {"gp": name}
        sigma2 = jnp.exp(log_sigma) ** 2 + S._JITTER
        if col_mask is not None:
            Kmn = Kmn * col_mask[None, :]
            knn_diag = knn_diag * col_mask
            Yb = Yb * col_mask[:, None]
        M = Kmm.shape[0]
        Lm = LA.chol_lower(Kmm, jitter=S._kuu_jitter(Kmm.dtype))
        A = LA.tri_solve(Lm, Kmn) / jnp.sqrt(sigma2)
        B = jnp.eye(M, dtype=Kmm.dtype) + jnp.matmul(
            A, A.T, precision=jax.lax.Precision.HIGHEST
        )
        LB = LA.chol_lower(B)
        AY = jnp.matmul(A, Yb, precision=jax.lax.Precision.HIGHEST)
        c = LA.tri_solve(LB, AY)
        quad = (jnp.sum(Yb * Yb, axis=0) - jnp.sum(c * c, axis=0)) / sigma2
        trace = (jnp.sum(knn_diag) - sigma2 * jnp.sum(A * A)) / sigma2
        vals = dict(Kmm=Kmm, Lm=Lm, A=A, B=B, LB=LB, c=c, quad=quad,
                    trace=trace)
        for k, v in vals.items():
            v = np.asarray(v)
            rec[k] = {
                "finite": bool(np.all(np.isfinite(v))),
                "absmax": float(np.nanmax(np.abs(v))) if v.size else 0.0,
            }
        # host-f64 condition of the two factorized matrices
        Kmm64 = np.asarray(Kmm, dtype=np.float64)
        Kmm64 = Kmm64 + S._kuu_jitter(Kmm.dtype) * np.mean(
            np.diag(Kmm64)) * np.eye(M)
        B64 = np.asarray(B, dtype=np.float64)
        for label, mat in (("Kmm_jittered", Kmm64), ("B", B64)):
            if np.all(np.isfinite(mat)):
                ev = np.linalg.eigvalsh(mat)
                rec[f"{label}_eig"] = [float(ev[0]), float(ev[-1])]
            else:
                rec[f"{label}_eig"] = "non-finite input"
        print(json.dumps(rec), flush=True)

    # y side
    Y = jnp.asarray(m.get_Y(), dtype=jnp.float32)
    Kmm = K.rbf_kernel(params.Zy, params.Zy, params.y_log_lengthscales)
    Kmn = K.rbf_kernel(params.Zy, params.X, params.y_log_lengthscales)
    probe("y", Kmm, Kmn, jnp.ones((params.X.shape[0],), jnp.float32), Y,
          params.y_log_sigma_n, jnp.exp(params.y_log_lambdas) ** 2,
          Y.shape[0], None)
    # x classes
    for ci in range(C):
        Z = params.Zx[ci]
        Kmm = K.x_kernel(Z, Z, params.x_log_lengthscales,
                         params.x_log_sigma_n, params.x_log_lin_coeff,
                         with_noise=False)
        Kmn = K.x_kernel(Z, Xin_c[ci], params.x_log_lengthscales,
                         params.x_log_sigma_n, params.x_log_lin_coeff,
                         with_noise=False)
        knn = K.x_diag_kernel(Xin_c[ci], params.x_log_lin_coeff,
                              params.x_log_sigma_n)
        probe(f"x[c{ci}]", Kmm, Kmn, knn, Xout_c[ci],
              params.x_log_sigma_n, jnp.exp(params.x_log_lambdas) ** 2,
              jnp.sum(mask[ci]), mask[ci])


if __name__ == "__main__":
    main()
