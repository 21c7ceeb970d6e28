"""Accuracy parity: sampled TPU GraphSAGE vs torch-CPU full-batch golden.

The north-star row "GraphSAGE at reference accuracy" (BASELINE.md) needs a
labeled graph; real OGB data needs network egress (unavailable), so we use
``planted_ogbn`` — synthetic graphs whose labels come from a fixed teacher
doing in-neighbor mean propagation (the exact aggregation family SAGE
expresses; data/ogb.py).  Three models train on the SAME data:

* torch-CPU full-batch 3-layer SAGE, architecture mirroring models/sage.py
  (``W_self h + W_neigh mean_in(h)``) — the stand-in for the reference path
  (its sampler feeds PyG ``SAGEConv``, /root/reference/examples/
  neighbor_sampling.py:21-24).
* OUR pipeline: fused on-device neighbor-sampled training (fanouts
  [15,10,5], parallel/train.py) + full-graph jitted inference for eval.
* torch MLP (feature-only control): bounds what is learnable WITHOUT
  message passing — both SAGEs must clear it by a wide margin.

Parity claim: |acc_ours - acc_torch| small, both >> MLP.

Usage: python scripts/bench_accuracy.py [--name ogbn-arxiv] [--scale 0.25]
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- torch side

def build_torch_mean_adj(edge_index, n):
    """Sparse (N,N) with row i = mean over in-neighbors of i (matches
    ops/spmm.py agg='mean' on the CSC graph)."""
    import torch
    src, dst = edge_index
    deg = np.bincount(dst, minlength=n).astype(np.float32)
    vals = 1.0 / np.maximum(deg[dst], 1.0)
    idx = torch.from_numpy(np.stack([dst, src]).astype(np.int64))
    a = torch.sparse_coo_tensor(idx, torch.from_numpy(vals.astype(np.float32)),
                                size=(n, n)).coalesce()
    return a


def train_torch_sage(data, split, hidden=256, layers=3, epochs=150,
                     lr=1e-2, seed=0, dropout=0.5):
    import torch
    import torch.nn as tnn
    torch.manual_seed(seed)
    n, f = data.x.shape
    c = int(data.y.max()) + 1
    a = build_torch_mean_adj(data.edge_index, n)
    x = torch.from_numpy(np.asarray(data.x))
    y = torch.from_numpy(np.asarray(data.y))
    tr = torch.from_numpy(split["train"])
    va = torch.from_numpy(split["valid"])
    te = torch.from_numpy(split["test"])

    dims = [f] + [hidden] * (layers - 1) + [c]
    self_lins = tnn.ModuleList(
        [tnn.Linear(dims[i], dims[i + 1]) for i in range(layers)])
    neigh_lins = tnn.ModuleList(
        [tnn.Linear(dims[i], dims[i + 1], bias=False) for i in range(layers)])
    params = list(self_lins.parameters()) + list(neigh_lins.parameters())
    opt = torch.optim.Adam(params, lr=lr)

    def forward(training=False):
        h = x
        for i in range(layers):
            agg = torch.sparse.mm(a, h)
            h = self_lins[i](h) + neigh_lins[i](agg)
            if i < layers - 1:
                h = torch.relu(h)
                h = torch.nn.functional.dropout(h, dropout, training=training)
        return h

    best_va, best_te = 0.0, 0.0
    t0 = time.time()
    for ep in range(epochs):
        opt.zero_grad()
        out = forward(training=True)
        loss = torch.nn.functional.cross_entropy(out[tr], y[tr])
        loss.backward()
        opt.step()
        if ep % 10 == 9 or ep == epochs - 1:
            with torch.no_grad():
                out = forward()
                pred = out.argmax(-1)
                va_acc = (pred[va] == y[va]).float().mean().item()
                te_acc = (pred[te] == y[te]).float().mean().item()
                if va_acc > best_va:
                    best_va, best_te = va_acc, te_acc
                log(f"  torch ep {ep:3d} loss {loss.item():.3f} "
                    f"val {va_acc:.3f} test {te_acc:.3f}")
    log(f"torch-SAGE: {time.time()-t0:.0f}s, best val {best_va:.3f} "
        f"-> test {best_te:.3f}")
    return best_te


def train_torch_sampled(data, split, hidden=256, layers=3,
                        fanouts=(15, 10, 5), batch_size=512, steps=600,
                        lr=1e-2, seed=0, dropout=0.5, eval_every=100):
    """The REFERENCE paradigm end-to-end on torch-CPU: neighbor-sampled
    minibatch training, trees drawn by our reference-parity sampler API
    (same tree semantics as /root/reference's homogeneous sampler — no
    dedup, per-layer offsets), model = PyG-style SAGE over the sampled
    edges per layer.  This is what a tch-geometric user's training loop
    actually does (reference examples/neighbor_sampling.py: sample ->
    filter_data -> SAGEConv)."""
    import torch
    import torch.nn as tnn
    import tch_geometric_tpu as tgt

    torch.manual_seed(seed)
    n, f = data.x.shape
    c = int(data.y.max()) + 1
    col_ptrs, row_indices, _perm = tgt.to_csc(data.edge_index, n)
    x = torch.from_numpy(np.asarray(data.x))
    y = torch.from_numpy(np.asarray(data.y))
    va, te = split["valid"], split["test"]

    dims = [f] + [hidden] * (layers - 1) + [c]
    self_lins = tnn.ModuleList(
        [tnn.Linear(dims[i], dims[i + 1]) for i in range(layers)])
    neigh_lins = tnn.ModuleList(
        [tnn.Linear(dims[i], dims[i + 1], bias=False) for i in range(layers)])
    params = list(self_lins.parameters()) + list(neigh_lins.parameters())
    opt = torch.optim.Adam(params, lr=lr)
    # same recipe as ours (recipe parity, not just model parity): cosine lr
    # decay + without-replacement neighbor sampling
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=steps,
                                                       eta_min=0.0)
    a_full = build_torch_mean_adj(data.edge_index, n)

    def tree_forward(samples, rows, cols, offsets, training):
        """PyG-NeighborLoader-style: each layer aggregates over all sampled
        edges, then narrows to the nodes reachable in remaining layers."""
        h = x[torch.from_numpy(samples)]
        rows_t = torch.from_numpy(rows)
        cols_t = torch.from_numpy(cols)
        # nodes at depths <= d: offsets[d][0] is the node count before hop
        # d's expansion (reference LayerOffset semantics), i.e. depths <= d;
        # the full sample list covers depths <= layers
        node_counts = [offsets[l][0] for l in range(len(offsets))] + \
                      [len(samples)]
        for i in range(layers):
            agg = torch.zeros_like(h)
            agg.index_add_(0, cols_t, h[rows_t])
            cnt = torch.zeros(h.shape[0], dtype=h.dtype)
            cnt.index_add_(0, cols_t, torch.ones_like(cols_t, dtype=h.dtype))
            agg = agg / cnt.clamp(min=1.0).unsqueeze(1)
            # update nodes at depths <= layers-1-i (deeper slots are never
            # read again); drop edges whose endpoints fall outside
            keep = node_counts[layers - 1 - i]
            h = self_lins[i](h[:keep]) + neigh_lins[i](agg[:keep])
            emask = (rows_t < keep) & (cols_t < keep)
            rows_t, cols_t = rows_t[emask], cols_t[emask]
            if i < layers - 1:
                h = torch.relu(h)
                h = torch.nn.functional.dropout(h, dropout, training=training)
        return h

    def full_forward():
        h = x
        for i in range(layers):
            agg = torch.sparse.mm(a_full, h)
            h = self_lins[i](h) + neigh_lins[i](agg)
            if i < layers - 1:
                h = torch.relu(h)
        return h

    tgt.rng_reseed(seed)
    rng_np = np.random.default_rng(seed)
    tr = split["train"]
    fl = [int(k) for k in fanouts]
    best_va, best_te = 0.0, 0.0
    t0 = time.time()
    for step in range(steps):
        seeds = rng_np.choice(tr, batch_size, replace=False)
        samples, rows, cols, _e, offs = tgt.neighbor_sampling_homogenous(
            col_ptrs, row_indices, seeds, fl,
            sampler=tgt.UniformEdgeSampler(False))
        opt.zero_grad()
        out = tree_forward(np.asarray(samples), np.asarray(rows),
                           np.asarray(cols), offs, True)
        loss = torch.nn.functional.cross_entropy(
            out[:batch_size], y[torch.from_numpy(seeds)])
        loss.backward()
        opt.step()
        sched.step()
        if step % eval_every == eval_every - 1 or step == steps - 1:
            with torch.no_grad():
                pred = full_forward().argmax(-1)
                va_acc = (pred[va] == y[va]).float().mean().item()
                te_acc = (pred[te] == y[te]).float().mean().item()
            if va_acc > best_va:
                best_va, best_te = va_acc, te_acc
            log(f"  torch-sampled step {step:4d} loss {loss.item():.3f} "
                f"val {va_acc:.3f} test {te_acc:.3f}")
    log(f"torch-SAGE sampled (reference paradigm): {time.time()-t0:.0f}s, "
        f"best val {best_va:.3f} -> test {best_te:.3f}")
    return best_te


def train_torch_mlp(data, split, hidden=256, epochs=150, lr=1e-2, seed=0):
    import torch
    import torch.nn as tnn
    torch.manual_seed(seed)
    f = data.x.shape[1]
    c = int(data.y.max()) + 1
    x = torch.from_numpy(np.asarray(data.x))
    y = torch.from_numpy(np.asarray(data.y))
    tr = torch.from_numpy(split["train"])
    va = torch.from_numpy(split["valid"])
    te = torch.from_numpy(split["test"])
    net = tnn.Sequential(tnn.Linear(f, hidden), tnn.ReLU(),
                         tnn.Linear(hidden, hidden), tnn.ReLU(),
                         tnn.Linear(hidden, c))
    opt = torch.optim.Adam(net.parameters(), lr=lr)
    best_va, best_te = 0.0, 0.0
    for ep in range(epochs):
        opt.zero_grad()
        out = net(x)
        torch.nn.functional.cross_entropy(out[tr], y[tr]).backward()
        opt.step()
        if ep % 10 == 9 or ep == epochs - 1:
            with torch.no_grad():
                pred = net(x).argmax(-1)
                va_acc = (pred[va] == y[va]).float().mean().item()
                if va_acc > best_va:
                    best_va = va_acc
                    best_te = (pred[te] == y[te]).float().mean().item()
    log(f"torch-MLP control: best val {best_va:.3f} -> test {best_te:.3f}")
    return best_te


# ----------------------------------------------------------------- ours

def train_ours(data, split, hidden=256, layers=3, fanouts=(15, 10, 5),
               batch_size=512, steps=600, lr=1e-2, seed=0,
               eval_every=100, dropout=0.5):
    from tch_geometric_tpu.models import GraphSAGE
    from tch_geometric_tpu.parallel import make_sage_trainer

    graph = data.csc()
    x = jnp.asarray(data.x)
    y_np = np.asarray(data.y)
    labels = jnp.asarray(y_np)
    c = int(y_np.max()) + 1

    import optax
    model = GraphSAGE(hidden=hidden, out=c, num_layers=layers,
                      dropout=dropout)
    # production recipe: without-replacement sampling (trainer default) +
    # cosine decay — together worth ~3 points over with-replacement +
    # constant lr on this task (BASELINE.md accuracy table)
    init_fn, train_step, _ = make_sage_trainer(
        model, list(fanouts),
        learning_rate=optax.cosine_decay_schedule(lr, steps))
    key = jax.random.key(seed)
    seeds0 = jnp.asarray(split["train"][:batch_size].astype(np.int32))
    state = init_fn(key, graph, x, seeds0)

    # full-graph jitted inference for eval (the path PyG users get from
    # model.__call__; blocked kernels kick in at products scale)
    @jax.jit
    def infer(params):
        return model.apply(params, x, graph).argmax(-1)

    rng_np = np.random.default_rng(seed)
    train_idx = split["train"]
    va, te = split["valid"], split["test"]
    best_va, best_te = 0.0, 0.0
    t0 = time.time()
    for step in range(steps):
        seeds = jnp.asarray(rng_np.choice(train_idx, batch_size,
                                          replace=False).astype(np.int32))
        state, loss, acc = train_step(state, key, graph, x, seeds,
                                      labels[seeds])
        if step % eval_every == eval_every - 1 or step == steps - 1:
            pred = np.asarray(infer(state.params))
            va_acc = float((pred[va] == y_np[va]).mean())
            te_acc = float((pred[te] == y_np[te]).mean())
            if va_acc > best_va:
                best_va, best_te = va_acc, te_acc
            log(f"  ours step {step:4d} loss {float(loss):.3f} "
                f"val {va_acc:.3f} test {te_acc:.3f}")
    log(f"ours (sampled TPU): {time.time()-t0:.0f}s, best val {best_va:.3f} "
        f"-> test {best_te:.3f}")
    return best_te


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="ogbn-arxiv")
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--dropout", type=float, default=0.5)
    ap.add_argument("--seeds", type=int, default=1,
                    help="model-init seeds per implementation (mean/std)")
    ap.add_argument("--sampled-steps", type=int, default=1000,
                    help="steps for the torch sampled-reference path "
                         "(0 = skip); it runs one seed only")
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--data-dir", default=None,
                    help="directory with REAL OGB data (graph.npz or the "
                         "raw/ csv.gz layout — data.ogb.load_ogbn_dir); "
                         "overrides the planted synthetic generator")
    args = ap.parse_args()

    if args.data_dir:
        from tch_geometric_tpu.data.ogb import load_ogbn_dir
        data, split = load_ogbn_dir(args.data_dir)
        if not split:          # no split files: random 80/10/10
            rng = np.random.default_rng(0)
            perm = rng.permutation(data.x.shape[0])
            n1, n2 = int(0.8 * len(perm)), int(0.9 * len(perm))
            split = {"train": perm[:n1], "valid": perm[n1:n2],
                     "test": perm[n2:]}
        tag = f"real:{args.data_dir}"
    else:
        from tch_geometric_tpu.data.ogb import planted_ogbn
        data, split = planted_ogbn(args.name, scale=args.scale,
                                   noise=args.noise)
        tag = f"planted {args.name} scale={args.scale}"
    n = data.x.shape[0]
    e = data.edge_index.shape[1]
    log(f"{tag}: N={n} E={e} "
        f"C={int(data.y.max())+1} train/val/test="
        f"{len(split['train'])}/{len(split['valid'])}/{len(split['test'])}")

    ours, torchs, torch_sampled = [], [], []
    for s in range(args.seeds):
        ours.append(train_ours(data, split, hidden=args.hidden,
                               steps=args.steps, dropout=args.dropout,
                               seed=s))
        if not args.skip_torch:
            torchs.append(train_torch_sage(data, split, hidden=args.hidden,
                                           epochs=args.epochs,
                                           dropout=args.dropout, seed=s))
            if s == 0 and args.sampled_steps > 0:
                # ~0.4-1 s/step on this host (the reference paradigm's actual
                # cost); one seed, separately capped
                torch_sampled.append(train_torch_sampled(
                    data, split, hidden=args.hidden,
                    steps=args.sampled_steps, dropout=args.dropout, seed=s))
    acc_mlp = train_torch_mlp(data, split, hidden=args.hidden,
                              epochs=args.epochs)

    print(json.dumps({
        "dataset": (f"real:{args.data_dir}" if args.data_dir
                    else f"planted-{args.name}"), "scale": args.scale,
        "N": n, "E": e,
        "acc_ours_sampled": round(float(np.mean(ours)), 4),
        "acc_ours_std": round(float(np.std(ours)), 4),
        "acc_torch_fullbatch": (round(float(np.mean(torchs)), 4)
                                if torchs else None),
        "acc_torch_std": (round(float(np.std(torchs)), 4)
                          if torchs else None),
        "acc_torch_sampled": (round(float(np.mean(torch_sampled)), 4)
                              if torch_sampled else None),
        "acc_mlp_control": round(acc_mlp, 4),
        "per_seed": {"ours": [round(a, 4) for a in ours],
                     "torch": [round(a, 4) for a in torchs],
                     "torch_sampled": [round(a, 4) for a in torch_sampled]},
    }))


if __name__ == "__main__":
    main()
