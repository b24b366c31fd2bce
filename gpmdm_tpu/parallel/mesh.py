"""Device mesh helpers.

The reference has no distribution layer at all (SURVEY.md §2.6: single
process, a ``device`` kwarg threaded into tensor allocations,
gpmdm/gpmdm.py:187).  The TPU-native framework scales through
``jax.sharding.Mesh`` + shard_map/pjit instead; these helpers build the
standard meshes used by the training and particle-filter paths:

- ``ep``  — expert parallelism over per-class dynamics GPs (the per-class
  Gram/Cholesky work is embarrassingly parallel across classes),
- ``tp``  — tensor parallelism over observation dimensions (columns of Y in
  the observation NLL trace term),
- ``dp``  — data parallelism over independent particle-filter banks.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh from {axis_name: size}.  With no spec, all devices go on
    one ``dp`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {"dp": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {axis_sizes} needs {np.prod(sizes)} devices, have {len(devices)}")
    return Mesh(np.asarray(devices).reshape(sizes), names)


def make_train_mesh(
    n_devices: int | None = None, devices=None, n_classes: int | None = None
) -> Mesh:
    """('ep', 'tp') training mesh, shape-aware.

    With ``n_classes`` given, the expert axis takes the largest class-count
    factor that divides the device count — ``ep = gcd(n_classes, n)`` — so
    per-class Gram/Cholesky work spreads maximally (e.g. 8 classes on 8
    devices → a pure ep=8 mesh); the remaining devices go to the tensor
    (observation-column) axis.  Without it, falls back to a small fixed
    expert axis (2 when even, else 1).
    """
    import math

    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n_classes is not None and n_classes >= 1:
        ep = math.gcd(n_classes, n)
    else:
        ep = 2 if n % 2 == 0 and n >= 2 else 1
    return make_mesh({"ep": ep, "tp": n // ep}, devices)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
