"""Sampled GraphSAGE accuracy at full ogbn-products scale (one chip).

The BASELINE north-star row "GraphSAGE on ogbn-products at reference
accuracy" on the planted-teacher stand-in (real OGB needs egress;
data/ogb.planted_ogbn): N=2.45M nodes, E=62M edges, 47 classes, labels from
2 rounds of mean propagation + noise.  Trains the fused sampled pipeline
(multibatch trainer, fanouts [15,10,5], B=512) with the full graph + f32
feature table resident in HBM, and evaluates with FULL-GRAPH inference over
all 62M edges via the segmented blocked-ELL path — the same configuration as
the throughput benchmarks (scripts/bench_products_scale.py), now with an
accuracy axis.

Prints one JSON line with test accuracy + throughput.
"""
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


def main(scale=1.0, steps=120, m=8, batch=512, hidden=256, dropout=0.2,
         lr=1e-2):
    from tch_geometric_tpu.data.ogb import planted_ogbn
    from tch_geometric_tpu.models import GraphSAGE
    from tch_geometric_tpu.ops.spmm_blocked import build_blocked_segmented
    from tch_geometric_tpu.parallel.train import make_multibatch_sage_trainer

    t0 = time.time()
    data, split = planted_ogbn("ogbn-products", scale=scale, noise=1.0)
    log(f"planted products scale={scale}: N={data.x.shape[0]} "
        f"E={data.edge_index.shape[1]} gen in {time.time()-t0:.0f}s")

    t0 = time.time()
    graph = data.csc()
    log(f"CSC build {time.time()-t0:.0f}s")
    x = jnp.asarray(data.x)
    y_np = np.asarray(data.y)
    labels = jnp.asarray(y_np)
    c = int(y_np.max()) + 1
    tr, va, te = split["train"], split["valid"], split["test"]

    model = GraphSAGE(hidden=hidden, out=c, num_layers=3, dtype=jnp.bfloat16,
                      dropout=dropout)
    init_fn, train_step = make_multibatch_sage_trainer(
        model, [15, 10, 5], learning_rate=lr)
    key = jax.random.key(0)
    rng_np = np.random.default_rng(0)
    seeds0 = jnp.asarray(rng_np.choice(tr, (m, batch)).astype(np.int32))
    t0 = time.time()
    state = init_fn(key, graph, x, seeds0[0])
    log(f"init {time.time()-t0:.0f}s")

    # full-graph inference via segmented blocked-ELL (fits HBM at 62M edges)
    t0 = time.time()
    indptr = np.asarray(graph.indptr)
    indices = np.asarray(graph.indices)
    seg = build_blocked_segmented(indptr, indices, num_segments=32)
    log(f"segmented blocked build {time.time()-t0:.0f}s")

    @jax.jit
    def infer(params):
        return model.apply(params, x, seg, method=GraphSAGE.blocked_forward
                           ).argmax(-1)

    best_va, best_te, t_train = 0.0, 0.0, 0.0
    for step in range(steps):
        seeds = jnp.asarray(
            rng_np.choice(tr, (m, batch)).astype(np.int32))
        t0 = time.time()
        state, losses, accs = train_step(state, key, graph, x, seeds,
                                         labels[seeds])
        jax.block_until_ready(losses)
        t_train += time.time() - t0
        if step % 20 == 19 or step == steps - 1:
            t0 = time.time()
            pred = np.asarray(infer(state.params))
            t_inf = time.time() - t0
            va_acc = float((pred[va] == y_np[va]).mean())
            te_acc = float((pred[te] == y_np[te]).mean())
            if va_acc > best_va:
                best_va, best_te = va_acc, te_acc
            log(f"step {step:4d} ({(step+1)*m} minibatches) "
                f"loss {float(losses[-1]):.3f} val {va_acc:.4f} "
                f"test {te_acc:.4f} (infer {t_inf:.1f}s)")

    mb = steps * m
    print(json.dumps({
        "dataset": "planted-ogbn-products", "scale": scale,
        "N": int(data.x.shape[0]), "E": int(data.edge_index.shape[1]),
        "test_acc": round(best_te, 4),
        "minibatches": mb,
        "ms_per_minibatch": round(t_train / mb * 1e3, 2),
    }))


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--dropout", type=float, default=0.2)
    a = ap.parse_args()
    main(scale=a.scale, steps=a.steps, dropout=a.dropout)
