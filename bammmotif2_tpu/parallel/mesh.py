"""Device-mesh sharding for multi-chip / multi-host scaling.

The reference is a single-process OpenMP tool (SURVEY.md 2.1); scaling here
is TPU-native by construction (BASELINE.json): the sequence set is sharded
over a ``data`` mesh axis, the (tiny) motif + background models are
replicated, and the one collective per EM iteration is the all-reduce of
the combined count tensor — inserted automatically by GSPMD because the
segment-sum reduces over the sharded sequence axis.  A second ``seed``
axis shards independent seed motifs (the TPU analogue of the reference's
OpenMP-over-motifs driver loop, done with vmap + sharding instead of
threads).

Multi-host entry: call ``jax.distributed.initialize()`` before building the
mesh; everything below is host-count agnostic.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_seed: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'seed') mesh over the available devices.

    With n_seed=1 this degrades to pure data parallelism; a single device
    yields a (1, 1) mesh so all code paths are mesh-agnostic.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    total = devices.size
    if n_data is None:
        n_data = total // n_seed
    if n_data * n_seed != total:
        raise ValueError(f"mesh {n_data}x{n_seed} != {total} devices")
    return Mesh(devices.reshape(n_data, n_seed), ("data", "seed"))


def shard_data(mesh: Mesh, cidx, lens, sentinel: int):
    """Place sequence tensors sharded over the data axis.

    cidx [S, N, L] shards on N; lens [N] shards on N.  The N axis is padded
    to a multiple of the data-axis size with empty sequences (every
    position = the sentinel LUT row, length 0 -> no valid windows, zero
    responsibility) so GSPMD partitions evenly.
    """
    import jax.numpy as jnp

    n_data = mesh.shape["data"]
    S, N, L = cidx.shape
    pad = (-N) % n_data
    if pad:
        cidx = jnp.concatenate(
            [cidx, jnp.full((S, pad, L), sentinel, cidx.dtype)], axis=1
        )
        lens = jnp.concatenate([lens, jnp.zeros((pad,), lens.dtype)])
    cidx = jax.device_put(cidx, NamedSharding(mesh, P(None, "data", None)))
    lens = jax.device_put(lens, NamedSharding(mesh, P("data")))
    return cidx, lens


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (model state) across the whole mesh."""
    return jax.device_put(
        tree, NamedSharding(mesh, P())
    )


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int, fill) -> np.ndarray:
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=fill)
