"""Classification metrics for PF evaluation.

Library form of the evaluation harness in the reference's
``notebooks/test_gpmdm_pf.ipynb`` (cells 4-5): per-frame and per-trial
confusion matrices, accuracy / precision / recall / F1, and throughput.
Written in plain numpy (no sklearn dependency).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np


def confusion_matrix(pred: np.ndarray, true: np.ndarray, n_classes: int) -> np.ndarray:
    """Counts[p, t] = #frames predicted p with actual class t (the reference
    notebook's pred x actual orientation)."""
    pred = np.asarray(pred).astype(int).ravel()
    true = np.asarray(true).astype(int).ravel()
    cm = np.zeros((n_classes, n_classes), dtype=np.int64)
    np.add.at(cm, (pred, true), 1)
    return cm


def binary_prf(cm: np.ndarray, positive: int = 0) -> Dict[str, float]:
    """Accuracy / precision / recall / F1 from a 2-class pred x actual
    confusion matrix, treating ``positive`` as the positive class."""
    tp = cm[positive, positive]
    fp = cm[positive].sum() - tp
    fn = cm[:, positive].sum() - tp
    total = cm.sum()
    acc = float(np.trace(cm) / total) if total else 0.0
    prec = float(tp / (tp + fp)) if (tp + fp) else 0.0
    rec = float(tp / (tp + fn)) if (tp + fn) else 0.0
    f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
    return {"accuracy": acc, "precision": prec, "recall": rec, "f1": f1}


def macro_prf(cm: np.ndarray) -> Dict[str, float]:
    """Macro-averaged precision/recall/F1 for >2 classes."""
    C = cm.shape[0]
    per = [binary_prf(cm, c) for c in range(C)]
    total = cm.sum()
    return {
        "accuracy": float(np.trace(cm) / total) if total else 0.0,
        "precision": float(np.mean([m["precision"] for m in per])),
        "recall": float(np.mean([m["recall"] for m in per])),
        "f1": float(np.mean([m["f1"] for m in per])),
    }


@dataclasses.dataclass
class EvalReport:
    """Aggregate PF evaluation over a set of labeled trials."""

    frame_confusion: np.ndarray  # (C, C) pred x actual, all frames
    trial_confusion: np.ndarray  # (C, C) pred x actual, one vote per trial
    frame_metrics: Dict[str, float]
    trial_metrics: Dict[str, float]
    total_frames: int
    total_wall_s: float

    @property
    def fps(self) -> float:
        return self.total_frames / self.total_wall_s if self.total_wall_s > 0 else 0.0

    def summary(self) -> str:
        f, t = self.frame_metrics, self.trial_metrics
        return (
            f"frames: acc={f['accuracy']:.4f} prec={f['precision']:.4f} "
            f"rec={f['recall']:.4f} f1={f['f1']:.4f}\n"
            f"trials: acc={t['accuracy']:.4f} f1={t['f1']:.4f}\n"
            f"throughput: {self.fps:.1f} fps ({self.total_frames} frames in "
            f"{self.total_wall_s:.2f}s)\n"
            f"frame confusion (pred x actual):\n{self.frame_confusion}\n"
            f"trial confusion (pred x actual):\n{self.trial_confusion}"
        )


def evaluate_pf(
    flt,
    test_seqs: Sequence[np.ndarray],
    test_labels: Sequence[int],
    n_classes: int,
    burn_in: int = 0,
    logger=None,
) -> EvalReport:
    """Stream every labeled trial through the filter (resetting between
    trials, as the reference notebook does) and aggregate metrics.

    A trial's vote is the majority frame prediction (reference: trial correct
    if >50% of frames correct, test_gpmdm_pf.ipynb cell 4).

    ``logger`` (utils.logging.MetricLogger) receives a structured record per
    trial (frame accuracy, fps, predicted/actual label) plus a final
    aggregate record — the SURVEY §5 first-class eval metrics.
    """
    import time

    frame_pred: List[np.ndarray] = []
    frame_true: List[np.ndarray] = []
    trial_pred: List[int] = []
    total_frames = 0
    wall = 0.0
    for i, (Z, label) in enumerate(zip(test_seqs, test_labels)):
        flt.reset()
        t0 = time.perf_counter()
        outs = flt.run(Z)
        preds = np.asarray(outs.most_likely_class)
        preds.ravel()[-1]  # touch to sync
        trial_wall = time.perf_counter() - t0
        wall += trial_wall
        total_frames += len(preds)
        preds_eval = preds[burn_in:]
        frame_pred.append(preds_eval)
        frame_true.append(np.full(len(preds_eval), label))
        # trial vote from post-burn-in frames only, consistent with the
        # frame metrics
        counts = np.bincount(preds_eval, minlength=n_classes)
        trial_pred.append(int(np.argmax(counts)))
        if logger is not None:
            logger.log(
                step=i,
                trial_frame_acc=float(np.mean(preds_eval == label)),
                trial_fps=len(preds) / trial_wall if trial_wall > 0 else 0.0,
                pred_label=trial_pred[-1],
                true_label=int(label),
            )

    fcm = confusion_matrix(np.concatenate(frame_pred), np.concatenate(frame_true), n_classes)
    tcm = confusion_matrix(np.asarray(trial_pred), np.asarray(test_labels), n_classes)
    metric = binary_prf if n_classes == 2 else macro_prf
    if logger is not None:
        fm = metric(fcm)
        logger.log(
            step=len(trial_pred),
            frame_acc=fm["accuracy"],
            frame_f1=fm["f1"],
            fps=total_frames / wall if wall > 0 else 0.0,
        )
    return EvalReport(
        frame_confusion=fcm,
        trial_confusion=tcm,
        frame_metrics=metric(fcm),
        trial_metrics=metric(tcm),
        total_frames=total_frames,
        total_wall_s=wall,
    )


def evaluate_pf_banked(
    model,
    T_matrix,
    test_seqs: Sequence[np.ndarray],
    test_labels: Sequence[int],
    num_particles: Optional[int] = None,
    burn_in: int = 0,
    seed: int = 0,
    config=None,
    mesh=None,
    logger=None,
    posterior=None,
    max_banks: Optional[int] = None,
) -> EvalReport:
    """Evaluate ALL trials in one compiled dispatch.

    The banked counterpart of :func:`evaluate_pf`: every trial gets its
    own independent filter (a bank row), sequences are zero-padded to one
    length bucket with prefix validity masks, and the whole set streams
    through ``pf_scan_bank_masked`` as a single device call — the
    reference's trial loop (test_gpmdm_pf.ipynb cell 4) collapsed into
    one batched scan.  Metrics match :func:`evaluate_pf` in distribution
    (per-trial RNG streams differ: banked filters draw from per-bank
    keys).  Pass ``mesh`` (a Mesh with a 'dp' axis) to shard the bank
    axis across devices (parallel.pf_scan_bank_sharded_masked) —
    multi-chip evaluation with zero collectives.  ``posterior`` overrides
    the model's own posterior (e.g. ``model.compressed_posterior(...)``).
    Unlike ``GPMDM_PF``, ``None`` here means the model's OWN posterior —
    measurement code must not have its configuration silently swapped;
    pass ``resolve_posterior(model, 'auto')`` for the deployment policy
    (the CLI eval does).

    ``max_banks`` caps how many filters run per device dispatch (non-mesh
    path): the banked per-class kernel tensor is (B, C, n_max, P) floats —
    at C=8, n_max=632, P=10k each bank costs ~0.4 GB of HLO temp, so a
    48-trial guard set overflows a 16 GB chip.  Chunks are padded to
    exactly ``max_banks`` rows (invalid, sliced off), so every chunk
    reuses ONE compiled executable; per-trial RNG streams depend on the
    chunking (documented — banked streams already differ from looped).

    Measured (tools/bench_banked_eval.py, one v5e, 12 trials, warm):
    banked is faster at every filter size — 1.7x at P=100 (the
    reference's eval config; the loop is dispatch-bound), 1.9x at P=1k,
    1.4x at P=10k (banks draw RNG in-scan; see pf_scan_bank).
    """
    import time

    import jax
    import jax.numpy as jnp

    from ..config import PFConfig
    from ..filter import particle_filter as pf

    B = len(test_seqs)
    n_classes = model.n_classes
    # an explicitly passed particle count always wins, matching GPMDM_PF's
    # ctor contract (particle_filter.py: config is rebuilt with
    # num_particles); otherwise config's count (or the PFConfig default)
    if config is not None and num_particles is not None:
        pfc = dataclasses.replace(config, num_particles=num_particles)
    elif config is not None:
        pfc = config
    else:
        pfc = PFConfig(num_particles=num_particles or 100)
    log_T = jnp.log(jnp.asarray(T_matrix, dtype=model.dtype))
    post = posterior if posterior is not None else model.posterior
    pf.warn_if_unsafe_exact(post, pfc)

    lengths = [len(Z) for Z in test_seqs]
    T_pad = pf.bucket_length(max(lengths))
    Zb = np.zeros((B, T_pad, model.D), dtype=np.float64)
    valid = np.zeros((B, T_pad), dtype=bool)
    for i, Z in enumerate(test_seqs):
        Zb[i, : lengths[i]] = np.asarray(Z)
        valid[i, : lengths[i]] = True
    Zb = jnp.asarray(Zb, dtype=model.dtype)
    valid_j = jnp.asarray(valid)

    def init_bank(n_banks, key=None):
        return pf.pf_init_bank(
            post, model.layout.y_class_offsets,
            key if key is not None else jax.random.PRNGKey(seed), pfc, n_banks,
        )

    if mesh is not None:
        from ..parallel import pf_scan_bank_sharded_masked

        # pad the bank to a mesh-divisible size with all-invalid rows
        # (their outputs are garbage and sliced off below)
        n_dp = mesh.shape["dp"]
        Bp = -(-B // n_dp) * n_dp
        if Bp != B:
            Zb = jnp.concatenate(
                [Zb, jnp.zeros((Bp - B, T_pad, model.D), dtype=Zb.dtype)]
            )
            valid_j = jnp.concatenate(
                [valid_j, jnp.zeros((Bp - B, T_pad), dtype=bool)]
            )
        states = init_bank(Bp)
        t0 = time.perf_counter()
        _, outs = pf_scan_bank_sharded_masked(
            states, Zb, valid_j, post, model.params, log_T,
            model.config, pfc, mesh,
        )
        preds_all = np.asarray(outs.most_likely_class)[:B]
        wall = time.perf_counter() - t0
    elif max_banks is not None and B > max_banks:
        # chunked: pad every chunk to exactly max_banks rows so ONE
        # compiled executable serves them all; invalid rows are no-ops
        scan = pf._banked_scan_jit(model.config, pfc)
        Bc = max_banks
        t0 = time.perf_counter()
        pred_chunks = []
        for j, lo in enumerate(range(0, B, Bc)):
            hi = min(lo + Bc, B)
            Zc = Zb[lo:hi]
            vc = valid_j[lo:hi]
            if hi - lo < Bc:
                Zc = jnp.concatenate(
                    [Zc, jnp.zeros((Bc - (hi - lo), T_pad, model.D), dtype=Zc.dtype)]
                )
                vc = jnp.concatenate(
                    [vc, jnp.zeros((Bc - (hi - lo), T_pad), dtype=bool)]
                )
            states_c = init_bank(
                Bc, jax.random.fold_in(jax.random.PRNGKey(seed), j)
            )
            _, outs = scan(states_c, Zc, vc, post, model.params, log_T)
            pred_chunks.append(np.asarray(outs.most_likely_class)[: hi - lo])
        preds_all = np.concatenate(pred_chunks, axis=0)  # (B, T_pad)
        wall = time.perf_counter() - t0
    else:
        # module-level jit cache keyed on (cfg, pf_cfg): repeated
        # evaluations with the same shapes reuse the compiled executable
        # (a fresh jax.jit(lambda) here recompiled on every call and the
        # reported wall always included compile time)
        scan = pf._banked_scan_jit(model.config, pfc)
        states = init_bank(B)
        t0 = time.perf_counter()
        _, outs = scan(states, Zb, valid_j, post, model.params, log_T)
        preds_all = np.asarray(outs.most_likely_class)  # (B, T_pad)
        wall = time.perf_counter() - t0

    frame_pred, frame_true, trial_pred = [], [], []
    total_frames = 0
    for i, label in enumerate(test_labels):
        preds = preds_all[i, : lengths[i]]
        total_frames += len(preds)
        pe = preds[burn_in:]
        frame_pred.append(pe)
        frame_true.append(np.full(len(pe), label))
        trial_pred.append(int(np.argmax(np.bincount(pe, minlength=n_classes))))
        if logger is not None:
            logger.log(
                step=i,
                trial_frame_acc=float(np.mean(pe == label)),
                pred_label=trial_pred[-1],
                true_label=int(label),
            )
    fcm = confusion_matrix(
        np.concatenate(frame_pred), np.concatenate(frame_true), n_classes
    )
    tcm = confusion_matrix(
        np.asarray(trial_pred), np.asarray(test_labels), n_classes
    )
    metric = binary_prf if n_classes == 2 else macro_prf
    if logger is not None:
        fm = metric(fcm)
        logger.log(
            step=B,
            frame_acc=fm["accuracy"],
            frame_f1=fm["f1"],
            fps=total_frames / wall if wall > 0 else 0.0,
        )
    return EvalReport(
        frame_confusion=fcm,
        trial_confusion=tcm,
        frame_metrics=metric(fcm),
        trial_metrics=metric(tcm),
        total_frames=total_frames,
        total_wall_s=wall,
    )
