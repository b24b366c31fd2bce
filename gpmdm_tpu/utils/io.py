"""Model persistence.

Replaces the reference's single-pickle checkpoint (`/root/reference/gpmdm/
gpmdm.py:1307-1414`, ``torch.save``/``torch.load``) with a self-contained,
non-pickle ``.npz`` checkpoint holding:

- the static config (JSON),
- all trained parameters (log-space hyperparameters + latent X),
- the raw observation sequences (so a loaded model can rebuild Xin/Xout and
  Gram matrices, exactly as the reference checkpoint does),
- optionally the Adam optimizer moments (the reference does NOT save these,
  so it cannot resume mid-training; we can).

Unlike the reference's ``load`` — which re-runs PCA just to create the X
parameter before overwriting it (gpmdm.py:1399-1402) — loading here restores
X directly.

A reader for the reference's torch ``.pth`` layout is provided for
cross-validation against reference-trained models (torch is imported lazily
and only needed there).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..config import GPMDMConfig

_PARAM_FIELDS = (
    "y_log_lengthscales",
    "y_log_lambdas",
    "y_log_sigma_n",
    "x_log_lengthscales",
    "x_log_lambdas",
    "x_log_sigma_n",
    "x_log_lin_coeff",
    "X",
)

FORMAT_VERSION = 1


def save_model(model, file_path) -> None:
    import dataclasses

    file_path = Path(file_path)
    arrays = {}
    meta = {
        "format_version": FORMAT_VERSION,
        "config": model.config.to_dict(),
        "model_class": type(model).__name__,
        "n_sequences_per_class": [
            len(seqs) for seqs in model.class_aware_observations_list
        ],
        "initialized": model.params is not None,
        "has_opt_state": model._opt_state is not None,
        # which optimizer produced _opt_state: the load path must rebuild
        # the matching treedef (lbfgs state has more leaves than adam's)
        "optimizer_name": getattr(model, "_opt_name", "adam"),
        "lbfgs_memory": getattr(model, "_lbfgs_memory", 10),
        "init_hypers": {
            k: (v.tolist() if isinstance(v, np.ndarray) else v)
            for k, v in model._init_hypers.items()
        },
    }
    if hasattr(model, "n_inducing_y"):
        meta["n_inducing_y"] = model.n_inducing_y
        meta["n_inducing_x"] = model.n_inducing_x
    for c, seqs in enumerate(model.class_aware_observations_list):
        for i, s in enumerate(seqs):
            arrays[f"obs_{c}_{i}"] = np.asarray(s)
    if model.params is not None:
        # BCGPMDM persists W in the X slot (the materialized X = K_b @ W is
        # recomputed at load time from the saved data + config lengthscale)
        params_out = getattr(model, "_params_for_save", lambda: model.params)()
        meta["param_fields"] = [f.name for f in dataclasses.fields(params_out)]
        for f in meta["param_fields"]:
            arrays[f"param_{f}"] = np.asarray(getattr(params_out, f))
    if model._opt_state is not None:
        import jax

        leaves = jax.tree.leaves(model._opt_state)
        meta["n_opt_leaves"] = len(leaves)
        for i, leaf in enumerate(leaves):
            arrays[f"opt_{i}"] = np.asarray(leaf)
    # Deployment-posterior cache: each compressed_posterior() the model has
    # built is persisted so a loaded checkpoint skips the O(N^3) host
    # eigendecomposition (29 s at Ny=5120) on its next 'auto'/'compressed'
    # deployment.  The cache is params-consistent by construction: it was
    # built from these exact params and load restores it only after the
    # posterior precompute re-derives them.
    comp = getattr(model, "_compressed_cache", None) or {}
    comp_keys, comp_idx, _seen = [], [], {}
    if comp:
        from ..filter.particle_filter import AUTO_COMPRESS_MAX_Q_FRAC
    for key, post in comp.items():
        if (key[0] is None
                and post.rank_y > AUTO_COMPRESS_MAX_Q_FRAC * post.Uy.shape[0]):
            # auto-key entry past the q = N/2 FLOP-parity bound:
            # resolve_posterior('auto') warns and deploys exact for it
            # (particle_filter.AUTO_COMPRESS_MAX_Q_FRAC), so persisting
            # would bake O(N^2)-sized never-deployed factors into the
            # checkpoint.  It stays cached in memory (GPMDM_PF
            # re-resolves per call); an EXPLICITLY pinned near-full
            # rank (key[0] set) is the user's choice and persists.
            continue
        comp_keys.append(list(key))  # (rank_y, rank_x, tol), Nones allowed
        # aliased entries (e.g. the deploy CLI maps a pinned-rank
        # posterior under the 'auto' key too) persist their arrays once
        j = _seen.get(id(post))
        if j is None:
            j = _seen[id(post)] = len(_seen)
            for f in dataclasses.fields(post):
                arrays[f"comp_{j}_{f.name}"] = np.asarray(getattr(post, f.name))
        comp_idx.append(j)
    if comp_keys:
        meta["compressed_keys"] = comp_keys
        meta["compressed_entry_idx"] = comp_idx
    # Sparsified (post-hoc SGPR distilled) deployment posteriors: same
    # persistence contract as the compressed cache — factors are small
    # (O(M^2 + M Dout) plus the latent snapshot) and params-consistent by
    # construction; load restores them after the posterior precompute.
    sp_cache = getattr(model, "_sparsified_cache", None) or {}
    sp_keys, sp_idx, _sp_seen = [], [], {}
    for key, post in sp_cache.items():
        sp_keys.append(list(key))  # (My, Mx|None) or (My, Mx|None, method)
        j = _sp_seen.get(id(post))
        if j is None:
            j = _sp_seen[id(post)] = len(_sp_seen)
            for f in dataclasses.fields(post):
                if f.metadata.get("static"):
                    continue  # e.g. `distilled` — implied True for this cache
                arrays[f"sparsified_{j}_{f.name}"] = np.asarray(getattr(post, f.name))
        sp_idx.append(j)
    if sp_keys:
        meta["sparsified_keys"] = sp_keys
        meta["sparsified_entry_idx"] = sp_idx
    # Guard-arbitrated deployment recommendation (docs/DEPLOY.md): written
    # by `deploy --sparsify` / tools/eval_asset_guard.py --bake after a
    # measured accuracy verdict; resolve_posterior('auto') honors it ahead
    # of the size thresholds.
    rec = getattr(model, "_deploy_recommendation", None)
    if rec:
        meta["deploy_recommendation"] = {
            k: (float(v) if isinstance(v, (np.floating, float))
                else int(v) if isinstance(v, (np.integer,))
                else v)
            for k, v in rec.items()
        }
    # Measured-accuracy guard receipt (tools/eval_asset_guard.py --stamp):
    # binds a banked-guard score to a params fingerprint so CI can refuse
    # any committed asset whose parameters changed without a re-measured
    # guard (tests/test_bench_assets.py; round-4 hourlong post-mortem).
    rcpt = getattr(model, "_guard_receipt", None)
    if rcpt:
        meta["guard_receipt"] = rcpt
    # Sparse posteriors are small (O(M^2 + M D) factors) but cost an
    # O(N M^2) host precompute — persist them so load skips it (~16 s at
    # Ny=108k, M=128).  Exact core.Posterior is NOT persisted: its
    # Ky_inv is O(N^2) (105 MB at Ny=5120) and load defers it lazily.
    built = getattr(model, "_posterior", None)
    if built is not None and type(built).__name__ == "SparsePosterior":
        meta["posterior_class"] = "SparsePosterior"
        for f in dataclasses.fields(built):
            if f.metadata.get("static"):
                continue  # native sparse-family posterior: distilled=False
            arrays[f"post_{f.name}"] = np.asarray(getattr(built, f.name))
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    file_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(file_path, **arrays)
    # np.savez silently appends '.npz' when the suffix is absent, which
    # would leave model.save('foo.ckpt') writing 'foo.ckpt.npz' while
    # load('foo.ckpt') fails.  Move the written file to the requested path
    # (the reference torch.save writes exactly at the given path).
    if file_path.suffix != ".npz":
        written = file_path.with_name(file_path.name + ".npz")
        if written.exists():
            os.replace(written, file_path)


def load_model(cls, file_path):
    file_path = Path(file_path)
    with np.load(file_path) as data:
        meta = json.loads(bytes(data["meta_json"]).decode("utf-8"))
        cfg = GPMDMConfig.from_dict(meta["config"])
        ih = meta["init_hypers"]
        extra = {}
        if meta.get("model_class") == "SparseGPMDM":
            from ..models.sparse_gpmdm import SparseGPMDM

            cls = SparseGPMDM
            extra = {
                "n_inducing_y": meta["n_inducing_y"],
                "n_inducing_x": meta["n_inducing_x"],
            }
        elif meta.get("model_class") == "BCGPMDM":
            from ..models.back_constrained import BCGPMDM

            cls = BCGPMDM
            extra = {"back_lengthscale": cfg.back_constraint_ls}
        model = cls(
            **extra,
            D=cfg.D,
            d=cfg.d,
            n_classes=cfg.n_classes,
            dyn_target=cfg.dyn_target,
            dyn_back_step=cfg.dyn_back_step,
            y_lambdas_init=ih["y_lambdas_init"],
            y_lengthscales_init=ih["y_lengthscales_init"],
            y_sigma_n_init=ih["y_sigma_n_init"],
            x_lambdas_init=ih["x_lambdas_init"],
            x_lengthscales_init=ih["x_lengthscales_init"],
            x_sigma_n_init=ih["x_sigma_n_init"],
            x_lin_coeff_init=ih["x_lin_coeff_init"],
            flg_train_y_lambdas=cfg.flg_train_y_lambdas,
            flg_train_y_lengthscales=cfg.flg_train_y_lengthscales,
            flg_train_y_sigma_n=cfg.flg_train_y_sigma_n,
            flg_train_x_lambdas=cfg.flg_train_x_lambdas,
            flg_train_x_lengthscales=cfg.flg_train_x_lengthscales,
            flg_train_x_sigma_n=cfg.flg_train_x_sigma_n,
            flg_train_x_lin_coeff=cfg.flg_train_x_lin_coeff,
            sigma_n_num_Y=cfg.sigma_n_num_Y,
            sigma_n_num_X=cfg.sigma_n_num_X,
            dtype=cfg.dtype,
            balance_fix=cfg.balance_fix,
        )
        # The ctor kwargs above cover the reference schema, but config
        # fields the ctor does not accept (class_jitter today; anything
        # added later) would silently revert to defaults — trust the
        # serialized config wholesale instead.  (The BCGPMDM ctor derives
        # back_constraint_ls into config itself; cfg carries the same
        # saved value, so this overwrite is consistent there too.)
        model.config = cfg
        for c, n_seq in enumerate(meta["n_sequences_per_class"]):
            for i in range(n_seq):
                model.add_data(data[f"obs_{c}_{i}"], c)
        if meta["initialized"]:
            from ..models import core

            model.layout = model._build_layout()
            dt = jnp.dtype(cfg.dtype)
            fields = meta.get("param_fields", list(_PARAM_FIELDS))
            if meta.get("model_class") == "SparseGPMDM":
                from ..models.sparse import SparseParams as _ParamCls
            else:
                _ParamCls = core.GPMDMParams
            model.params = _ParamCls(
                **{f: jnp.asarray(data[f"param_{f}"], dtype=dt) for f in fields}
            )
            # numpy originals for the posterior precompute: skips the
            # device->host fetch (first-fetch path init costs 2-450 s on
            # the remote-TPU transport)
            host_params = _ParamCls(
                **{f: np.asarray(data[f"param_{f}"], dtype=np.float64)
                   for f in fields}
            )
            if meta.get("model_class") == "BCGPMDM":
                # X slot carried W; restore config lengthscale + rematerialize
                model.config = model.config.replace(
                    back_constraint_ls=cfg.back_constraint_ls
                )
                model._W = model.params.X
            if meta.get("has_opt_state"):
                import jax
                import optax

                # Rebuild the saved optimizer's state treedef from a fresh
                # init, then overwrite the leaves with the saved state.
                opt_name = meta.get("optimizer_name", "adam")
                if opt_name == "lbfgs":
                    template = optax.lbfgs(
                        memory_size=meta.get("lbfgs_memory", 10)
                    ).init(model.params)
                else:
                    template = optax.adam(1e-3).init(model.params)
                treedef = jax.tree.structure(template)
                leaves = [
                    jnp.asarray(data[f"opt_{i}"]) for i in range(meta["n_opt_leaves"])
                ]
                model._opt_state = jax.tree.unflatten(treedef, leaves)
                model._opt_name = opt_name
                # keep the re-saved meta consistent with the restored
                # state's buffer shapes on a load->retrain->save cycle
                # (ADVICE r3)
                model._lbfgs_memory = meta.get("lbfgs_memory", 10)
            if meta.get("model_class") == "BCGPMDM":
                model._materialize()  # X <- K_b @ W, then precompute
            elif meta.get("posterior_class") == "SparsePosterior":
                # persisted factors: skip the O(N M^2) host precompute
                import dataclasses

                from ..models.sparse import SparsePosterior

                model.posterior = SparsePosterior(
                    **{
                        f.name: jnp.asarray(data[f"post_{f.name}"])
                        for f in dataclasses.fields(SparsePosterior)
                        if not f.metadata.get("static")
                    }
                )  # static `distilled` stays False: native sparse family
                model._compressed_cache = {}
            else:
                # lazy: the O(N^3) exact precompute (~30 s at Ny=5120) is
                # deferred to first posterior access — a large-N 'auto'
                # deployment that hits the persisted compressed cache
                # below never pays it (SparseGPMDM runs eagerly; its
                # precompute is O(N M^2))
                model._precompute_kernel_inverses(
                    host_params=host_params, lazy=True
                )
            comp_keys = meta.get("compressed_keys")
            if comp_keys:
                # restore AFTER the precompute (which clears the cache):
                # the persisted factors were built from these exact params
                import dataclasses

                from ..models.compressed import CompressedPosterior

                cache, built = {}, {}
                fields = [f.name for f in dataclasses.fields(CompressedPosterior)]
                # entry_idx maps keys to (possibly shared) array sets;
                # absent in pre-alias checkpoints where it is 1:1
                idxs = meta.get("compressed_entry_idx", list(range(len(comp_keys))))
                for key, j in zip(comp_keys, idxs):
                    if j not in built:
                        built[j] = CompressedPosterior(
                            **{f: jnp.asarray(data[f"comp_{j}_{f}"]) for f in fields}
                        )
                    cache[tuple(key)] = built[j]
                model._compressed_cache = cache
            sp_keys = meta.get("sparsified_keys")
            if sp_keys:
                import dataclasses

                from ..models.sparse import SparsePosterior

                cache, built = {}, {}
                fields = [f.name for f in dataclasses.fields(SparsePosterior)
                          if not f.metadata.get("static")]
                idxs = meta.get("sparsified_entry_idx", list(range(len(sp_keys))))
                for key, j in zip(sp_keys, idxs):
                    if j not in built:
                        # the sparsified cache holds post-hoc distillations
                        # by construction -> distilled=True (selects the
                        # hoisted-inverse quad default, round-5 verdict)
                        built[j] = SparsePosterior(
                            **{f: jnp.asarray(data[f"sparsified_{j}_{f}"])
                               for f in fields},
                            distilled=True,
                        )
                    cache[tuple(key)] = built[j]
                model._sparsified_cache = cache
            # restore AFTER the precompute (which clears stale verdicts):
            # the recommendation was guard-measured on these exact params
            if meta.get("deploy_recommendation"):
                model._deploy_recommendation = meta["deploy_recommendation"]
            if meta.get("guard_receipt"):
                model._guard_receipt = meta["guard_receipt"]
    return model


def load_torch_model(cls, file_path):
    """Import a reference-format torch checkpoint (gpmdm.py:1307-1346).

    The file is a torch pickle holding ``{'state_dict', 'config_dict'}``
    where config_dict carries the raw observation sequences and exp'd initial
    hyperparameters.
    """
    import torch

    save_dict = torch.load(file_path, map_location="cpu", weights_only=False)
    config_dict = save_dict["config_dict"]
    state_dict = save_dict["state_dict"]

    torch_dtype = str(config_dict.get("dtype", "torch.float64"))
    dtype = {"torch.float64": "float64", "torch.float32": "float32"}.get(
        torch_dtype, "float32"
    )

    model = cls(
        D=config_dict["D"],
        d=config_dict["d"],
        n_classes=config_dict["n_classes"],
        dyn_target=config_dict["dyn_target"],
        dyn_back_step=config_dict["dyn_back_step"],
        y_lambdas_init=np.asarray(config_dict["y_lambdas_init"]),
        y_lengthscales_init=np.asarray(config_dict["y_lengthscales_init"]),
        y_sigma_n_init=config_dict["y_sigma_n_init"],
        x_lambdas_init=np.asarray(config_dict["x_lambdas_init"]),
        x_lengthscales_init=np.asarray(config_dict["x_lengthscales_init"]),
        x_sigma_n_init=config_dict["x_sigma_n_init"],
        x_lin_coeff_init=np.asarray(config_dict["x_lin_coeff_init"]),
        sigma_n_num_Y=config_dict.get("sigma_n_num_Y", 0.0),
        sigma_n_num_X=config_dict.get("sigma_n_num_X", 0.0),
        dtype=dtype,
    )

    def to_np(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    for c, seqs in enumerate(config_dict["class_aware_observations_list"]):
        for s in seqs:
            model.add_data(to_np(s), c)

    from ..models import core

    model.layout = model._build_layout()
    dt = jnp.dtype(dtype)
    model.params = core.GPMDMParams(
        **{f: jnp.asarray(to_np(state_dict[f]), dtype=dt) for f in _PARAM_FIELDS}
    )
    model._precompute_kernel_inverses()
    return model
