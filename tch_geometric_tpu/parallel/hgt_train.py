"""End-to-end heterogeneous training: HGT sampling -> relation-typed
attention, one jitted step (BASELINE config 4: fakehetero/ogbn-mag-style).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.hgt import HGT
from ..sampling import rng
from ..sampling.hgt import _hgt_sampling_impl
from ..utils.types import rel_key


class HGTTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_hgt_trainer(
    model: HGT,
    graphs: Dict[str, Any],
    edge_types: Sequence[Tuple[str, str, str]],
    num_samples: Dict[str, Sequence[int]],
    num_hops: int,
    node_counts: Dict[str, int],
    x_tables: Dict[str, jax.Array],
    *,
    seed_type: str,
    learning_rate: float = 1e-3,
    edge_timestamps=None,
    timerange=None,
):
    """(init_fn, train_step): HGT budget sampling inside the jitted step.

    Seeds are nodes of ``seed_type``; the loss is cross-entropy on the seed
    slots of the model's ``out_type`` output.
    """
    tx = optax.adam(learning_rate)
    node_types = tuple(sorted(node_counts))
    rel_specs = tuple(sorted((rel_key(e), e[0], e[2]) for e in edge_types))
    meta = (
        node_types,
        rel_specs,
        tuple((t, tuple(int(x) for x in num_samples[t])) for t in node_types),
        int(num_hops),
        None if timerange is None else (int(timerange[0]), int(timerange[1])),
        tuple((t, int(node_counts[t])) for t in node_types),
    )

    def sample_and_gather(key, seeds):
        sample = _hgt_sampling_impl(
            key, graphs, edge_timestamps, {seed_type: seeds}, None, meta)
        feats = {}
        for t in node_types:
            nodes = jnp.clip(sample.nodes[t], 0, node_counts[t] - 1)
            xt = x_tables[t][nodes]
            feats[t] = jnp.where(sample.node_valid[t][:, None], xt, 0.0)
        edges = {r: (sample.rows[r], sample.cols[r], sample.edge_valid[r])
                 for r in sample.rows}
        return sample, feats, edges

    def loss_fn(params, key, seeds, labels):
        sample, feats, edges = sample_and_gather(key, seeds)
        logits = model.apply(params, feats, edges)
        n = seeds.shape[0]
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits[:n], labels).mean()
        return loss, logits[:n]

    def init_fn(key, seeds):
        _s, feats, edges = sample_and_gather(key, seeds)
        params = model.init(key, feats, edges)
        return HGTTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    @jax.jit
    def train_step(state: HGTTrainState, key, seeds, labels):
        step_key = rng.fold(key, state.step)
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, step_key, seeds, labels)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = (logits.argmax(-1) == labels).mean()
        return HGTTrainState(params, opt_state, state.step + 1), loss, acc

    return init_fn, train_step
