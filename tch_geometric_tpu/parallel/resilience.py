"""Failure detection, barriers, and fault injection (SURVEY §5).

The reference is single-process and has none of this.  Multi-host runs here
rely on: (1) a mesh-wide barrier/heartbeat with host-side timeout for
failure detection, (2) checkpoint-restart (utils/checkpoint.py) as the
recovery unit, and (3) a fault-injection hook for the data-exchange step so
tests can exercise corruption detection.
"""
from __future__ import annotations

import concurrent.futures
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def barrier(mesh: Mesh, *, axis: str = "data",
            timeout_s: float = 60.0) -> bool:
    """Mesh-wide barrier with host-side timeout.

    Returns True when every device participated in a psum within the
    timeout; False signals a hung/failed device (caller should trigger
    checkpoint-restart)."""
    from jax import shard_map

    @functools.partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P())
    def _psum_ones(x):
        return jax.lax.psum(x.sum(keepdims=True), axis)

    n = mesh.shape[axis]
    ones = jax.device_put(jnp.ones((n,), jnp.int32),
                          NamedSharding(mesh, P(axis)))
    with concurrent.futures.ThreadPoolExecutor(1) as ex:
        fut = ex.submit(lambda: int(_psum_ones(ones)[0]))
        try:
            return fut.result(timeout=timeout_s) == n
        except concurrent.futures.TimeoutError:
            return False


def shard_checksums(x, mesh: Mesh, *, axis: str = "data") -> jax.Array:
    """Per-shard float64-ish checksum vector (one entry per device).

    Comparing checksum vectors across runs / before-after an exchange
    detects silent corruption of a shard."""
    from jax import shard_map

    @functools.partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    def _sum(xs):
        s = jnp.abs(xs.astype(jnp.float32)).sum(keepdims=True)
        return s.reshape((1,) * (xs.ndim - 1) + (1,))[..., 0].reshape(1)

    return _sum(x)


def inject_shard_fault(x, device_index: int, mesh: Mesh, *,
                       axis: str = "data", mode: str = "zero"):
    """Corrupt one device's shard (test hook for the exchange step).

    mode: 'zero' wipes the shard; 'flip' negates it."""
    from jax import shard_map

    @functools.partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    def _corrupt(xs):
        me = jax.lax.axis_index(axis)
        hit = me == device_index
        if mode == "zero":
            bad = jnp.zeros_like(xs)
        elif mode == "flip":
            bad = -xs
        else:
            raise ValueError(mode)
        return jnp.where(hit, bad, xs)

    return _corrupt(x)
