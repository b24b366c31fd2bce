"""Mid-training checkpointing with atomic writes.

The reference cannot resume training: its checkpoint holds no optimizer
state (gpmdm.py:1307-1346; SURVEY.md §5 checkpoint/resume).  Here the
training loop can write a full train-state snapshot (params + Adam moments +
step counter + loss history) every K steps, atomically (tmp file + rename),
so a killed run resumes from the last snapshot.

Two backends share the same train-state schema:

- ``save_train_state`` / ``load_train_state`` — single-file ``.npz``
  (atomic tmp-file + rename), zero extra dependencies; the default.
- ``save_train_state_orbax`` / ``load_train_state_orbax`` — Orbax
  ``StandardCheckpointer`` directories, for multi-host deployments and
  interop with the broader JAX checkpoint ecosystem (async-safe atomic
  finalization is Orbax's own).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional, Tuple

import numpy as np


def save_train_state(path, params, opt_state, step: int, losses=None) -> None:
    """Atomically write {params, opt_state, step, losses} as one .npz."""
    import jax

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {}
    p_leaves, p_tree = jax.tree.flatten(params)
    for i, leaf in enumerate(p_leaves):
        arrays[f"p_{i}"] = np.asarray(leaf)
    o_leaves, _ = jax.tree.flatten(opt_state)
    for i, leaf in enumerate(o_leaves):
        arrays[f"o_{i}"] = np.asarray(leaf)
    meta = {"step": int(step), "n_params": len(p_leaves), "n_opt": len(o_leaves)}
    arrays["meta_json"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    if losses is not None:
        arrays["losses"] = np.asarray(losses)
    tmp = path.with_suffix(path.suffix + ".tmp")
    np.savez_compressed(tmp, **arrays)
    # numpy appends .npz to the tmp name
    tmp_actual = tmp if tmp.exists() else Path(str(tmp) + ".npz")
    os.replace(tmp_actual, path)


def load_train_state(path, params_template, opt_state_template) -> Tuple[Any, Any, int, Optional[np.ndarray]]:
    """Load a snapshot back into the given pytree structures.

    Returns (params, opt_state, step, losses-or-None).
    """
    import jax
    import jax.numpy as jnp

    with np.load(path) as data:
        meta = json.loads(bytes(data["meta_json"]).decode())
        p_tree = jax.tree.structure(params_template)
        p_dtypes = [l.dtype for l in jax.tree.leaves(params_template)]
        p_leaves = [
            jnp.asarray(data[f"p_{i}"], dtype=p_dtypes[i]) for i in range(meta["n_params"])
        ]
        params = jax.tree.unflatten(p_tree, p_leaves)
        o_tree = jax.tree.structure(opt_state_template)
        o_leaves = [jnp.asarray(data[f"o_{i}"]) for i in range(meta["n_opt"])]
        opt_state = jax.tree.unflatten(o_tree, o_leaves)
        losses = np.asarray(data["losses"]) if "losses" in data else None
        return params, opt_state, meta["step"], losses


def save_train_state_orbax(path, params, opt_state, step: int, losses=None) -> None:
    """Write the same train-state snapshot through Orbax (a checkpoint
    DIRECTORY, not a file).  Orbax performs its own atomic finalization."""
    import jax
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    state = {
        "params": jax.tree.leaves(params),
        "opt_state": jax.tree.leaves(opt_state),
        "step": int(step),
    }
    if losses is not None:
        state["losses"] = np.asarray(losses)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()


def load_train_state_orbax(
    path, params_template, opt_state_template
) -> Tuple[Any, Any, int, Optional[np.ndarray]]:
    """Load an Orbax snapshot back into the given pytree structures.

    Returns (params, opt_state, step, losses-or-None).
    """
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path)
    p_dtypes = [l.dtype for l in jax.tree.leaves(params_template)]
    p_leaves = [
        jnp.asarray(l, dtype=dt) for l, dt in zip(state["params"], p_dtypes)
    ]
    params = jax.tree.unflatten(jax.tree.structure(params_template), p_leaves)
    opt_state = jax.tree.unflatten(
        jax.tree.structure(opt_state_template),
        [jnp.asarray(l) for l in state["opt_state"]],
    )
    losses = np.asarray(state["losses"]) if "losses" in state else None
    return params, opt_state, int(state["step"]), losses
