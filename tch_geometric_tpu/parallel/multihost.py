"""Multi-host (multi-process) execution plumbing.

SURVEY §2.5 "Communication backend": the reference has no distributed
anything (no NCCL/MPI/Gloo — /root/reference/Cargo.toml:11-19); the
TPU-native answer is ``jax.distributed`` + XLA collectives, with ICI
carrying intra-slice traffic and DCN the inter-slice hops.  This module is
the thin, testable layer between a launcher and the device-count-agnostic
algorithms (dist_sampling / dist_walks / dist_budget / sharded_features —
all written against a mesh axis, so they run unchanged on 1 process or N):

* :func:`initialize` — one-call ``jax.distributed.initialize`` wrapper
  (explicit coordinator for CPU rigs / manual TPU pods; auto-detection on
  managed TPU runtimes when called with no arguments).
* :func:`make_mesh` — DCN/ICI-aware mesh: inter-process axes map to DCN
  (slowest collectives outermost), intra-process axes to ICI, via
  ``mesh_utils.create_hybrid_device_mesh``; plain mesh in one process.
* :func:`global_from_local` / :func:`local_seed_shard` — per-process data
  loading: each process materialises ONLY its shard of seeds/labels/
  features and assembles the global jax.Array without replication.

The multi-host correctness rig (scripts/run_multihost.py + tests) runs N
processes on this host over the CPU backend (Gloo collectives) and pins
that sampled trees are bit-identical to the single-process run — the same
device-count-invariance contract the virtual-mesh tests pin, now across
process boundaries.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    With no arguments, relies on the managed-runtime auto-detection (TPU
    pods); explicit arguments serve CPU rigs and hand-rolled clusters."""
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized (idempotent; touching jax.devices()
        #         here would itself initialise the backend too early)
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=int(num_processes),
                      process_id=int(process_id))
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # single-process / already-initialized
        if "already" not in str(e).lower():
            raise


def make_mesh(axis_names: Sequence[str] = ("data",),
              ici_shape: Optional[Sequence[int]] = None,
              dcn_axis: Optional[str] = None) -> Mesh:
    """Build a mesh over ALL global devices, DCN-aware when multi-process.

    Single-process: a plain mesh of the local devices reshaped to
    ``ici_shape`` (default: 1-D over all devices).

    Multi-process: ``dcn_axis`` (default: the FIRST axis name) spans
    processes over DCN; the remaining axes tile each process's devices
    over ICI — built with ``mesh_utils.create_hybrid_device_mesh`` so
    device order keeps DCN hops on the outermost axis, the layout the
    scaling-book recipe prescribes (collectives ride ICI, DCN only crosses
    the outer axis)."""
    axis_names = tuple(axis_names)
    n_proc = jax.process_count()
    if n_proc == 1:
        devs = np.array(jax.devices())
        shape = tuple(ici_shape) if ici_shape else (devs.size,)
        if len(shape) < len(axis_names):
            shape = (1,) * (len(axis_names) - len(shape)) + shape
        return Mesh(devs.reshape(shape), axis_names)

    dcn_axis = dcn_axis or axis_names[0]
    di = axis_names.index(dcn_axis)
    local = jax.local_device_count()
    if ici_shape is None:
        # all local devices on the last non-DCN axis (or the DCN axis
        # itself when it is the only axis: a pure-DP mesh)
        ici = [1] * len(axis_names)
        tgt = (di if len(axis_names) == 1 else
               next(i for i in reversed(range(len(axis_names))) if i != di))
        ici[tgt] = local
        ici_shape = ici
    ici_shape = list(ici_shape)
    # Process-major device grid: the DCN axis strides over processes
    # (process boundary = slice boundary), every other axis tiles a single
    # process's devices over ICI.  Built by hand (mesh_utils'
    # create_hybrid_device_mesh needs slice_index, which CPU rigs lack) —
    # equivalent for the one-slice-per-process topology.
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    arr = np.array(devs).reshape([n_proc] + ici_shape)
    arr = np.moveaxis(arr, 0, di)
    final = list(ici_shape)
    final[di] *= n_proc
    return Mesh(arr.reshape(final), axis_names)


def global_from_local(local: np.ndarray, mesh: Mesh,
                      spec: P) -> jax.Array:
    """Assemble a global jax.Array from THIS process's shard of the data
    (per-process data loading — no host ever holds the global array)."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local))


def replicated(value, mesh: Mesh) -> jax.Array:
    """Replicate identical host data across every device of the mesh."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), np.asarray(value))


def local_seed_shard(total: int, *, batch: Optional[int] = None
                     ) -> Tuple[int, int]:
    """This process's contiguous [lo, hi) share of a global seed range."""
    n, i = jax.process_count(), jax.process_index()
    per = -(-total // n)
    lo = min(i * per, total)
    return lo, min(lo + per, total)


def put_partitioned(tree, mesh: Mesh, spec: P):
    """device_put a host-replicated pytree with a leading-axis shard spec
    that may span processes (every process holds the same host copy; each
    materialises only its addressable shards)."""
    def put(x):
        sh = NamedSharding(mesh, spec if getattr(x, "ndim", 0) else P())
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(
            sh, _local_slice(np.asarray(x), mesh, sh))
    return jax.tree_util.tree_map(put, tree)


def _local_slice(x: np.ndarray, mesh: Mesh, sh: NamedSharding) -> np.ndarray:
    """The rows of ``x`` this process's devices address under ``sh``."""
    if x.ndim == 0 or sh.spec == P():
        return x
    # leading-axis sharding: addressable shard = contiguous block per process
    # (make_array_from_process_local_data expects the process-local block)
    n, i = jax.process_count(), jax.process_index()
    per = x.shape[0] // n
    return x[i * per: (i + 1) * per]
