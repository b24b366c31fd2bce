"""Probe the TPU f32 Cholesky cliff on captured frozen params.

Round-4 diagnosis (tools/diag_train_nan.py on the real chip): c8n5120 f32
training NaNs at step 13 INSIDE the x-NLL forward (x-side grads NaN,
y-side finite), while the SAME per-class dynamics Grams factorize in
numpy f32 with zero jitter (cond ~1.3-6.6e6).  The TPU blocked Cholesky
is the component at the edge, and the conditioning is manufactured by
the LINEAR kernel term (diag 12-115 vs the RBF's unit scale).

This tool loads the frozen params (diag_train_nan.py --save-params),
rebuilds each class block on the TARGET device, and compares:

  A. direct chol_lower(K_x)                      (the failing path)
  B. deflated: chol(K0 = RBF + noise) + matrix-determinant-lemma for
     the rank-(d+1) linear term                  (the proposed fix)

printing logdet + quad values and finiteness for each, against host-f64
ground truth.

Usage: python tools/exp_tpu_chol.py /tmp/c8n5120_frozen.npz [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("params_npz")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--config", default="c8n5120")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from train_bench_assets import CONFIGS

    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu import GPMDM
    from gpmdm_tpu.models import core
    from gpmdm_tpu.ops import kernels as K
    from gpmdm_tpu.ops import linalg as LA
    from gpmdm_tpu.ops.layout import xin_xout

    family, n_seqs, seq_len, _, extra = CONFIGS[args.config]
    D, d, C = extra.get("D", 35), extra.get("d", 2), extra.get("C", 2)
    tr, lb, _, _ = synthetic.make_dataset(
        n_classes=C, n_train_seqs=n_seqs, n_test_seqs=1, seq_len=seq_len,
        D=D, **extra.get("data", {"seed": 0}),
    )
    m = GPMDM(D=D, d=d, n_classes=C, dtype="float32",
              y_sigma_n_init=0.1, x_sigma_n_init=0.1,
              **extra.get("model", {}))
    for Y, c in zip(tr, lb):
        m.add_data(Y, c)
    m.init_X()
    z = np.load(args.params_npz)
    import dataclasses

    m.params = type(m.params)(
        **{f.name: jnp.asarray(z[f.name], dtype=jnp.float32)
           for f in dataclasses.fields(m.params)}
    )
    p, cfg, layout = m.params, m.config, m.layout
    dev = jax.devices()[0].platform
    print(f"device={dev}", flush=True)

    Xin, Xout = xin_xout(p.X, layout, cfg.dyn_target)
    w2 = jnp.exp(p.x_log_lambdas) ** 2

    @jax.jit
    def direct_block(Xin_c, Xout_c):
        Kc = K.x_kernel(Xin_c, Xin_c, p.x_log_lengthscales, p.x_log_sigma_n,
                        p.x_log_lin_coeff, cfg.sigma_n_num_X, with_noise=True)
        Lc = LA.chol_lower(Kc)
        return LA.chol_logdet(Lc), LA.quad_trace(Lc, Xout_c, w2)

    @jax.jit
    def deflated_block(Xin_c, Xout_c):
        return core.x_block_terms_deflated(
            Xin_c, Xout_c, None, p.x_log_lengthscales, p.x_log_sigma_n,
            p.x_log_lin_coeff, w2, cfg.sigma_n_num_X,
        )

    # host f64 ground truth
    Xin64 = np.asarray(Xin, dtype=np.float64)
    Xout64 = np.asarray(Xout, dtype=np.float64)
    x_ls = np.exp(np.asarray(p.x_log_lengthscales, np.float64))
    x_sn2 = float(np.exp(np.asarray(p.x_log_sigma_n, np.float64))) ** 2 \
        + cfg.sigma_n_num_X ** 2
    x_w2 = np.exp(np.asarray(p.x_log_lin_coeff, np.float64)) ** 2
    lam2 = np.exp(np.asarray(p.x_log_lambdas, np.float64)) ** 2

    from gpmdm_tpu.ops import kernels_host as KH

    for c in range(layout.n_classes):
        lo, hi = int(layout.x_class_offsets[c]), int(layout.x_class_offsets[c + 1])
        Xin_c, Xout_c = Xin[lo:hi], Xout[lo:hi]
        B64 = Xin64[lo:hi]
        K64 = KH.x_kernel(B64, B64, x_ls, x_w2) + x_sn2 * np.eye(hi - lo)
        sign, ld64 = np.linalg.slogdet(K64)
        q64 = float(np.sum(np.linalg.solve(K64, Xout64[lo:hi])
                           * Xout64[lo:hi] * lam2[None, :]))
        ld_a, q_a = direct_block(Xin_c, Xout_c)
        ld_b, q_b = deflated_block(Xin_c, Xout_c)
        print(json.dumps({
            "class": c, "n": hi - lo,
            "f64": {"logdet": round(float(ld64), 4), "quad": round(q64, 4)},
            "direct": {"logdet": float(ld_a), "quad": float(q_a)},
            "deflated": {"logdet": float(ld_b), "quad": float(q_b)},
        }), flush=True)


if __name__ == "__main__":
    main()
