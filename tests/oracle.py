"""Independent float64 numpy oracle for the GPMDM math.

Implements the formulas from the reference documentation
(SURVEY.md section 2.2 / reference gpmdm.py) directly in dense numpy — slow
O(N^3) masked-full-matrix versions — to validate the TPU-native block
implementations against.  Written from the math, not the reference code.
"""

from __future__ import annotations

import numpy as np


def rbf(X1, X2, log_ls):
    ls = np.exp(np.asarray(log_ls, dtype=np.float64))
    A = np.asarray(X1, dtype=np.float64) / ls
    B = np.asarray(X2, dtype=np.float64) / ls
    d2 = ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1)
    return np.exp(-d2)


def lin(X1, X2, log_coeff):
    w = np.exp(np.asarray(log_coeff, dtype=np.float64)) ** 2
    A = np.concatenate([X1, np.ones((X1.shape[0], 1))], axis=1)
    B = np.concatenate([X2, np.ones((X2.shape[0], 1))], axis=1)
    return (A * w) @ B.T


def y_kernel(X1, X2, log_ls, log_sn, sn_num=0.0, noise=True):
    K = rbf(X1, X2, log_ls)
    if noise:
        K = K + (np.exp(log_sn) ** 2 + sn_num**2) * np.eye(X1.shape[0])
    return K


def x_kernel(X1, X2, log_ls, log_sn, log_coeff, sn_num=0.0, noise=True):
    K = rbf(X1, X2, log_ls) + lin(X1, X2, log_coeff)
    if noise:
        K = K + (np.exp(log_sn) ** 2 + sn_num**2) * np.eye(X1.shape[0])
    return K


def x_diag(X, log_coeff, log_sn, sn_num=0.0, noise=False):
    w = np.exp(np.asarray(log_coeff, dtype=np.float64)) ** 2
    A = np.concatenate([X, np.ones((X.shape[0], 1))], axis=1)
    d = 1.0 + ((A * w) * A).sum(-1)
    if noise:
        d = d + np.exp(log_sn) ** 2 + sn_num**2
    return d


def nll_y(Y, X, log_ls, log_lam, log_sn, sn_num=0.0):
    """L_y = D/2 log|K_y| + 1/2 tr(K_y^-1 Y W^2 Y^T) - N log|W^2|."""
    N, D = Y.shape
    K = y_kernel(X, X, log_ls, log_sn, sn_num)
    sign, logdet = np.linalg.slogdet(K)
    Kinv = np.linalg.inv(K)
    W2 = np.diag(np.exp(log_lam) ** 2)
    trace = np.trace(Kinv @ Y @ W2 @ Y.T)
    return D / 2 * logdet + 0.5 * trace - N * 2 * np.sum(log_lam)


def nll_x_masked(Xout, Xin, M, log_ls, log_lam, log_sn, log_coeff, sn_num=0.0):
    """L_x with the dense elementwise class mask M (the reference's masked
    full-matrix formulation, gpmdm.py:591-628)."""
    Nx, d = Xout.shape
    K = x_kernel(Xin, Xin, log_ls, log_sn, log_coeff, sn_num) * M
    sign, logdet = np.linalg.slogdet(K)
    Kinv = np.linalg.inv(K)
    W2 = np.diag(np.exp(log_lam) ** 2)
    trace = np.trace(Kinv @ Xout @ W2 @ Xout.T)
    return d / 2 * logdet + 0.5 * trace - Nx * 2 * np.sum(log_lam)


def predict_y(Y, X, Xstar, log_ls, log_lam, log_sn, sn_num=0.0, noise=False):
    """Observation posterior: mean = (Y^T K^-1 k*)^T; var = common * lam^-2."""
    K = y_kernel(X, X, log_ls, log_sn, sn_num)
    Kinv = np.linalg.inv(K)
    ks = rbf(X, Xstar, log_ls)
    mean = (Y.T @ Kinv @ ks).T
    diag = np.ones(Xstar.shape[0])
    if noise:
        diag = diag + np.exp(log_sn) ** 2 + sn_num**2
    common = diag - np.sum((ks.T @ Kinv) * ks.T, axis=1)
    var = common[:, None] * np.exp(log_lam)[None, :] ** -2.0
    return mean, var


def predict_x_for_class_masked(
    Xout,
    Xin,
    M_c,
    Xstar,
    log_ls,
    log_lam,
    log_sn,
    log_coeff,
    sn_num=0.0,
    jitter=1e-6,
    noise=False,
):
    """Per-class dynamics posterior via the masked-full-matrix formulation
    (reference gpmdm.py:1032-1068 + :1297-1305): invert K_x * M_c + jitter I,
    mask star-kernel rows by diag(M_c)."""
    K = x_kernel(Xin, Xin, log_ls, log_sn, log_coeff, sn_num) * M_c
    K = K + jitter * np.eye(K.shape[0])
    Kinv = np.linalg.inv(K)
    ks = x_kernel(Xin, Xstar, log_ls, log_sn, log_coeff, sn_num, noise=False)
    ks = ks * np.diag(M_c)[:, None]
    mean = (Xout.T @ Kinv @ ks).T
    common = x_diag(Xstar, log_coeff, log_sn, sn_num, noise) - np.sum(
        (ks.T @ Kinv) * ks.T, axis=1
    )
    var = common[:, None] * np.exp(log_lam)[None, :] ** -2.0
    return mean, var
