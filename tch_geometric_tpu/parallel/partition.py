"""Graph partitioning + distributed aggregation over a device mesh.

TPU-native replacement for the distributed layer the reference does not have
(SURVEY §2.5): the graph is edge-partitioned by destination block (owner
computes its rows' aggregates), and cross-partition neighbor features move
over ICI with XLA collectives inside ``shard_map``:

* :func:`ring_spmm` — ring-accumulated blockwise SpMM ("ring-attention
  shaped"): node features rotate around the ring via ``ppermute`` while each
  device consumes the edge bucket whose sources live in the currently held
  block.  P steps, each overlapping a neighbor transfer with local
  aggregation; no device ever holds more than its own feature shard.
* :func:`alltoall_gather` — the Ulysses-shaped alternative: each device
  requests the halo (boundary) rows it needs from their owners via
  ``all_to_all``, then aggregates entirely locally.

Both are exact; layout build is host-side numpy, padded to static shapes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


class RingShards(NamedTuple):
    """Edge buckets by (dst_part, src_part), padded to a common size.

    src_local / dst_local: (P, P, Emax) int32 — bucket [d, s] holds edges
    owned by dst-part d whose source lives in part s, with block-local ids.
    """

    src_local: jax.Array
    dst_local: jax.Array
    valid: jax.Array
    rows_per_part: int
    num_parts: int


def build_ring_shards(edge_index: np.ndarray, num_nodes: int,
                      num_parts: int) -> RingShards:
    """Partition COO edges by contiguous dst blocks, bucket by src block."""
    src, dst = np.asarray(edge_index[0]), np.asarray(edge_index[1])
    Rp = -(-num_nodes // num_parts)
    dpart = dst // Rp
    spart = src // Rp
    emax = 0
    buckets = {}
    for d in range(num_parts):
        for s in range(num_parts):
            m = (dpart == d) & (spart == s)
            buckets[(d, s)] = (src[m] - s * Rp, dst[m] - d * Rp)
            emax = max(emax, int(m.sum()))
    emax = max(emax, 1)
    sl = np.zeros((num_parts, num_parts, emax), np.int32)
    dl = np.zeros((num_parts, num_parts, emax), np.int32)
    va = np.zeros((num_parts, num_parts, emax), bool)
    for (d, s), (bs, bd) in buckets.items():
        n = bs.shape[0]
        sl[d, s, :n] = bs
        dl[d, s, :n] = bd
        va[d, s, :n] = True
    return RingShards(jnp.asarray(sl), jnp.asarray(dl), jnp.asarray(va),
                      Rp, num_parts)


def pad_features(x: np.ndarray, num_parts: int) -> np.ndarray:
    """Pad node features to num_parts * rows_per_part for even sharding."""
    n = x.shape[0]
    Rp = -(-n // num_parts)
    pad = num_parts * Rp - n
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


def ring_spmm(shards: RingShards, x, mesh: Mesh, *, axis: str = "data",
              agg: str = "sum"):
    """Distributed SpMM: x sharded by node block over ``axis``; each device
    aggregates its dst rows, rotating source blocks via ppermute."""
    Pn = shards.num_parts
    Rp = shards.rows_per_part

    from jax import shard_map

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis))
    def run(sl, dl, va, x_shard):
        # shapes per device: sl/dl/va (1, P, Emax), x_shard (Rp, F)
        my = jax.lax.axis_index(axis)
        sl, dl, va = sl[0], dl[0], va[0]

        def step(s, carry):
            acc, h = carry
            src_owner = (my - s) % Pn
            bs = sl[src_owner]
            bd = dl[src_owner]
            bv = va[src_owner]
            vals = jnp.where(bv[:, None], h[bs], 0.0)
            acc = acc.at[bd].add(vals)
            h = jax.lax.ppermute(h, axis,
                                 [(i, (i + 1) % Pn) for i in range(Pn)])
            return acc, h

        acc = jnp.zeros((Rp, x_shard.shape[1]), x_shard.dtype)
        # mark the carry as device-varying for shard_map's vma typing
        acc = jax.lax.pcast(acc, (axis,), to="varying")
        acc, _ = jax.lax.fori_loop(0, Pn, step, (acc, x_shard))
        return acc

    return run(shards.src_local, shards.dst_local, shards.valid, x)


def alltoall_gather(x, halo_req: jax.Array, mesh: Mesh, *,
                    axis: str = "data"):
    """Ulysses-shaped halo exchange: fetch rows by global id from owners.

    ``halo_req``: (P, P, R) int32 — halo_req[d, s, :] are block-LOCAL row
    ids device d needs from owner s (pad with 0; caller masks).  Returns
    (P, P, R, F) gathered rows, sharded so device d holds its (P, R, F).
    """
    from jax import shard_map

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(axis), P(axis)), out_specs=P(axis))
    def run(req, x_shard):
        # req (1, P, R): my requests to each owner; x_shard (Rp, F)
        req = req[0]
        # send my per-owner request lists to their owners; receive one
        # request row per requester
        owner_req = jax.lax.all_to_all(req, axis, 0, 0)   # (P, R)
        # gather locally owned rows for each requester
        rows = x_shard[owner_req]                          # (P, R, F)
        # route each requester's rows back
        back = jax.lax.all_to_all(rows, axis, 0, 0)        # (P, R, F)
        return back[None]

    return run(halo_req, x)
