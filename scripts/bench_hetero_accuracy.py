"""Heterogeneous accuracy: sampled HGT vs untyped-GNN and MLP controls.

Typed analogue of scripts/bench_accuracy.py on `planted_hetero`
(data/ogb.py): labels on node type v0 come from a teacher that propagates
class scores through each relation with a DISTINCT class-mixing matrix, so
relation typing carries signal.  Three models on the same data/split:

* OURS: HGT trained with on-device temporal-free HGT sampling inside the
  jitted step (parallel/hgt_train.py), evaluated full-graph (all relation
  edges fed as one padded batch).
* Untyped control: our sampled GraphSAGE on the type-collapsed union graph
  (same edges/fanouts/batch/steps/schedule, types erased) — what untyped
  message passing recovers under the identical training paradigm.
* MLP control (feature-only).

With default Gaussian mixes both GNNs land within noise of each other
(the averaged mix stays learnable untyped); with ``--anti-paired`` the
opposite-sign relation pairs cancel under untyped aggregation and typing
is required — the clean separation (see BASELINE.md).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import optax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def train_hgt(xs, edge_index, y, split, hidden=64, layers=2, steps=1500,
              batch=512, lr=3e-3, seed=0, samples_per_type=(16, 12),
              heads=2):
    from tch_geometric_tpu.data import to_csc
    from tch_geometric_tpu.data.graph import make_graph
    from tch_geometric_tpu.models import HGT
    from tch_geometric_tpu.parallel import make_hgt_trainer
    from tch_geometric_tpu.utils.types import rel_key

    node_types = sorted(xs)
    node_counts = {t: xs[t].shape[0] for t in node_types}
    edge_types = sorted(edge_index)
    graphs = {}
    for e in edge_types:
        cp, ci, _ = to_csc(edge_index[e],
                           (node_counts[e[0]], node_counts[e[2]]))
        graphs[rel_key(e)] = make_graph(cp, ci, num_src=node_counts[e[0]],
                                        num_dst=node_counts[e[2]])
    x_tables = {t: jnp.asarray(v) for t, v in xs.items()}
    y_np = np.asarray(y)
    labels_all = jnp.asarray(y_np)
    c = int(y_np.max()) + 1
    rel_specs = tuple(sorted((rel_key(e), e[0], e[2]) for e in edge_types))
    model = HGT(hidden=hidden, out=c, num_layers=layers,
                node_types=tuple(node_types), rel_specs=rel_specs,
                out_type="v0", heads=heads)
    num_samples = {t: list(samples_per_type) for t in node_types}
    init_fn, train_step = make_hgt_trainer(
        model, graphs, edge_types, num_samples, layers, node_counts,
        x_tables, seed_type="v0",
        learning_rate=optax.cosine_decay_schedule(lr, steps))

    # full-graph eval: feed every relation's edges as one all-valid batch;
    # node slots are global ids per type
    full_feats = {t: x_tables[t] for t in node_types}
    full_edges = {}
    for e in edge_types:
        src, dst = edge_index[e]
        full_edges[rel_key(e)] = (jnp.asarray(src.astype(np.int32)),
                                  jnp.asarray(dst.astype(np.int32)),
                                  jnp.ones((src.shape[0],), bool))

    @jax.jit
    def infer(params):
        return model.apply(params, full_feats, full_edges).argmax(-1)

    tr, va, te = split["train"], split["valid"], split["test"]
    rng_np = np.random.default_rng(seed)
    key = jax.random.key(seed)
    state = init_fn(key, jnp.asarray(tr[:batch].astype(np.int32)))
    best = (0.0, 0.0)
    t0 = time.time()
    for s in range(steps):
        seeds = jnp.asarray(rng_np.choice(tr, batch,
                                          replace=False).astype(np.int32))
        state, loss, acc = train_step(state, key, seeds, labels_all[seeds])
        if s % 150 == 149 or s == steps - 1:
            pred = np.asarray(infer(state.params))
            a_va = float((pred[va] == y_np[va]).mean())
            a_te = float((pred[te] == y_np[te]).mean())
            if a_va > best[0]:
                best = (a_va, a_te)
            log(f"  HGT step {s:4d} loss {float(loss):.3f} val {a_va:.3f} "
                f"test {a_te:.3f}")
    log(f"HGT (sampled TPU): {time.time()-t0:.0f}s best val {best[0]:.3f} "
        f"-> test {best[1]:.3f}")
    return best[1]


def train_untyped_sage(xs, edge_index, y, split, hidden=64, steps=1500,
                       batch=512, lr=1e-2, seed=0, fanouts=(16, 12)):
    """Type-collapsed control, SAME paradigm as the HGT row: one homogeneous
    graph over the union node space (types erased), our sampled GraphSAGE
    trainer with matching fanouts/batch/steps, full-graph eval."""
    from tch_geometric_tpu.data import csc_graph_from_coo
    from tch_geometric_tpu.models import GraphSAGE
    from tch_geometric_tpu.parallel import make_gnn_trainer

    node_types = sorted(xs)
    offs, off = {}, 0
    for t in node_types:
        offs[t] = off
        off += xs[t].shape[0]
    x_all = jnp.asarray(np.concatenate([xs[t] for t in node_types]))
    edges = [np.stack([ei[0] + offs[e[0]], ei[1] + offs[e[2]]])
             for e, ei in sorted(edge_index.items())]
    graph = csc_graph_from_coo(np.concatenate(edges, axis=1), off)
    y_np = np.asarray(y)
    # labels over the union space (only v0 rows are ever used)
    labels_all = np.zeros((off,), np.int64)
    labels_all[offs["v0"]:offs["v0"] + len(y_np)] = y_np
    labels_all = jnp.asarray(labels_all)
    c = int(y_np.max()) + 1
    tr_global = split["train"] + offs["v0"]
    va_np, te_np = split["valid"], split["test"]

    model = GraphSAGE(hidden=hidden, out=c, num_layers=2)
    init_fn, train_step, _ = make_gnn_trainer(
        model, list(fanouts),
        learning_rate=optax.cosine_decay_schedule(lr, steps))
    key = jax.random.key(seed)
    rng_np = np.random.default_rng(seed)
    state = init_fn(key, graph, x_all,
                    jnp.asarray(tr_global[:batch].astype(np.int32)))

    @jax.jit
    def infer(params):
        return model.apply(params, x_all, graph).argmax(-1)

    best = (0.0, 0.0)
    for s in range(steps):
        seeds = jnp.asarray(rng_np.choice(tr_global, batch,
                                          replace=False).astype(np.int32))
        state, loss, _a = train_step(state, key, graph, x_all, seeds,
                                     labels_all[seeds])
        if s % 150 == 149 or s == steps - 1:
            pred = np.asarray(infer(state.params))[offs["v0"]:offs["v0"]
                                                   + xs["v0"].shape[0]]
            a_va = float((pred[va_np] == y_np[va_np]).mean())
            a_te = float((pred[te_np] == y_np[te_np]).mean())
            if a_va > best[0]:
                best = (a_va, a_te)
    log(f"untyped-SAGE control (sampled, same paradigm): best val "
        f"{best[0]:.3f} -> test {best[1]:.3f}")
    return best[1]


def train_mlp(xs, y, split, hidden=64, epochs=200, lr=1e-2, seed=0):
    import flax.linen as nn

    x = jnp.asarray(xs["v0"])
    y_np = np.asarray(y)
    labels = jnp.asarray(y_np)
    c = int(y_np.max()) + 1
    tr = jnp.asarray(split["train"])
    va_np, te_np = split["valid"], split["test"]

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Dense(hidden)(x))
            x = nn.relu(nn.Dense(hidden)(x))
            return nn.Dense(c)(x)

    model = MLP()
    params = model.init(jax.random.key(seed), x)
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                out[tr], labels[tr]).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    best = (0.0, 0.0)
    for ep in range(epochs):
        params, opt, _ = step(params, opt)
        if ep % 20 == 19:
            pred = np.asarray(jax.jit(model.apply)(params, x).argmax(-1))
            a_va = float((pred[va_np] == y_np[va_np]).mean())
            if a_va > best[0]:
                best = (a_va, float((pred[te_np] == y_np[te_np]).mean()))
    log(f"MLP control: best val {best[0]:.3f} -> test {best[1]:.3f}")
    return best[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--edges", type=int, default=120000)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--anti-paired", action="store_true",
                    help="opposite-mix relation pairs: untyped aggregation "
                         "cancels the signal, typed models recover it")
    ap.add_argument("--hgt-hidden", type=int, default=64)
    ap.add_argument("--hgt-heads", type=int, default=2)
    ap.add_argument("--hgt-lr", type=float, default=3e-3)
    ap.add_argument("--hgt-only", action="store_true")
    args = ap.parse_args()

    from tch_geometric_tpu.data.ogb import planted_hetero
    xs, edge_index, y, split = planted_hetero(
        nodes_per_type=args.nodes, edges_per_rel=args.edges,
        noise=args.noise, anti_paired=args.anti_paired)
    log(f"planted hetero: {len(xs)} types x {xs['v0'].shape[0]} nodes, "
        f"{len(edge_index)} rels x {args.edges} edges, "
        f"C={int(np.asarray(y).max())+1}")

    acc_hgt = train_hgt(xs, edge_index, y, split, steps=args.steps,
                        hidden=args.hgt_hidden, heads=args.hgt_heads,
                        lr=args.hgt_lr)
    if args.hgt_only:
        print(json.dumps({"acc_hgt_sampled": round(acc_hgt, 4),
                          "hidden": args.hgt_hidden,
                          "heads": args.hgt_heads, "lr": args.hgt_lr}))
        return
    acc_untyped = train_untyped_sage(xs, edge_index, y, split,
                                     steps=args.steps)
    acc_mlp = train_mlp(xs, y, split)
    print(json.dumps({
        "dataset": ("planted-hetero-antipaired" if args.anti_paired
                    else "planted-hetero"),
        "acc_hgt_sampled": round(acc_hgt, 4),
        "acc_untyped_sage_sampled": round(acc_untyped, 4),
        "acc_mlp_control": round(acc_mlp, 4),
    }))


if __name__ == "__main__":
    main()
