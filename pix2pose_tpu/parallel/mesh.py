"""Mesh construction and sharded training entry points.

The reference has no distributed layer at all — scale-out is 21 sequential
single-GPU jobs (``train.sh:1-21``) and every tensor lives on one device
(SURVEY.md §2.4). The TPU-native equivalent here:

- ``dp`` axis: the GAN batch is sharded across chips; XLA inserts the
  gradient all-reduces over ICI from the sharding annotations alone.
- ``obj`` axis: Pix2Pose trains ONE network PER OBJECT. We stack whole
  per-object train states on a leading axis and vmap the train step, then
  shard that axis across the mesh — N objects train simultaneously, one
  mesh, one program launch (this is the reference's `train.sh` as a single
  SPMD computation).

Both axes compose: an (obj, dp) 2D mesh trains O objects, each batch-sharded
over its dp group.

Multi-host (SURVEY.md §2.4): on a TPU pod slice each host runs one process
that sees only its local chips; :func:`init_distributed` brings up the JAX
global runtime, ``make_mesh`` then builds the mesh over the *global* device
set, and :func:`host_local_to_global` assembles per-process input shards
into one global array — each host loads only ``process_slice`` of the
batch from disk, and collectives ride ICI within a slice / DCN across
slices exactly as the sharding annotations dictate.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialize the multi-process JAX runtime (no-op when single-host).

    On TPU pods the arguments come from the environment and may all be
    None; explicit values support CPU multi-process tests. Must run
    before anything initializes the XLA backend. Idempotent. Returns
    ``(process_index, process_count)``."""
    if not jax.distributed.is_initialized() and (coordinator_address
                                                 or num_processes):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return jax.process_index(), jax.process_count()


def process_slice(n_total: int) -> slice:
    """This process's contiguous share of a length-``n_total`` batch axis
    (host-sharded input loading: each host reads only its slice)."""
    per = n_total // jax.process_count()
    if per * jax.process_count() != n_total:
        raise ValueError(f"batch {n_total} not divisible by "
                         f"{jax.process_count()} processes")
    start = per * jax.process_index()
    return slice(start, start + per)


def host_local_to_global(mesh: Mesh, batch, spec: P = None):
    """Assemble per-process local shards into global jax.Arrays.

    Each process passes ONLY its ``process_slice`` of the logical batch
    (leading axis). Single-process: equivalent to :func:`shard_batch`.
    """
    spec = spec if spec is not None else P("dp")
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        batch)


def make_mesh(axis_sizes: Sequence[int] = None,
              axis_names: Sequence[str] = ("obj", "dp"),
              devices=None) -> Mesh:
    """Create a mesh over the available devices.

    Default: all devices on ``dp`` with ``obj=1``; pass ``axis_sizes`` to
    split, e.g. ``(4, 2)`` for 4-way object-parallel x 2-way data-parallel.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (1, n)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"mesh {axis_sizes} != {n} devices")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def shard_batch(mesh: Mesh, batch, obj_axis: bool = False):
    """Place a host batch onto the mesh: leading axis over ``obj`` (if
    stacked per-object) then batch over ``dp``."""
    spec = P("obj", "dp") if obj_axis else P("dp")
    sharding = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def shard_inference_inputs(mesh: Mesh, rgbs, bboxes, det_valid, cam_ks,
                           keys):
    """Place a multi-image inference batch with the image axis sharded over
    ``dp`` — feeding :meth:`Pix2PoseEstimator.estimate_batch` then runs
    crop-sharded across the mesh (XLA splits the vmapped program; params
    stay replicated)."""
    s = NamedSharding(mesh, P("dp"))
    put = lambda x: jax.device_put(x, s)
    return put(rgbs), put(bboxes), put(det_valid), put(cam_ks), put(keys)


def make_parallel_train_step(step_fn, mesh: Mesh, object_parallel: bool):
    """Wrap a single-object GAN ``step(state, batch, sym_pool, lr, key)``
    into a mesh-parallel program.

    - ``object_parallel=False``: params replicated, batch sharded on ``dp``.
      XLA all-reduces gradients over ICI automatically.
    - ``object_parallel=True``: the caller stacks O per-object train states
      and batches on a leading axis; the step is vmapped over it and the
      stacked axis sharded over ``obj`` while each object's batch shards
      over ``dp``. One program trains O networks at once.
    """
    if object_parallel:
        vstep = jax.vmap(step_fn, in_axes=(0, 0, 0, None, 0))
        state_sharding = NamedSharding(mesh, P("obj"))
        batch_sharding = NamedSharding(mesh, P("obj", "dp"))
        sym_sharding = NamedSharding(mesh, P("obj"))
        key_sharding = NamedSharding(mesh, P("obj"))
        metric_sharding = NamedSharding(mesh, P("obj"))
        return jax.jit(
            vstep,
            in_shardings=(state_sharding, batch_sharding, sym_sharding,
                          NamedSharding(mesh, P()), key_sharding),
            out_shardings=(state_sharding, metric_sharding),
        )
    state_sharding = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P("dp"))
    return jax.jit(
        step_fn,
        in_shardings=(state_sharding, batch_sharding,
                      NamedSharding(mesh, P()), NamedSharding(mesh, P()),
                      NamedSharding(mesh, P())),
        out_shardings=(state_sharding, NamedSharding(mesh, P())),
    )
