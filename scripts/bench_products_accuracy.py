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
         lr=1e-2, data_dir=None, directed=False):
    from tch_geometric_tpu.data.dataset import Data
    from tch_geometric_tpu.data.ogb import load_ogbn_dir, planted_ogbn
    from tch_geometric_tpu.models import GraphSAGE
    from tch_geometric_tpu.ops.spmm_blocked import build_blocked_segmented
    from tch_geometric_tpu.parallel.train import make_multibatch_sage_trainer

    t0 = time.time()
    if data_dir is not None:
        # REAL ogbn-products (the north-star accuracy row): any mounted
        # copy in the raw download layout or a graph.npz (see
        # data/ogb.load_ogbn_dir; miniature layout fixture:
        # tests/fixtures/ogbn_products_mini).  The raw download stores
        # each undirected edge once — symmetrize unless --directed.
        data, split = load_ogbn_dir(data_dir)
        if not directed:
            ei = data.edge_index
            both = np.concatenate([ei, ei[::-1]], axis=1)
            data = Data(x=data.x, edge_index=both, y=data.y)
        if not split:
            raise SystemExit(f"{data_dir} carries no split files")
        tag = f"real:{data_dir}"
        log(f"real OGB data from {data_dir}: N={data.x.shape[0]} "
            f"E={data.edge_index.shape[1]} loaded {time.time()-t0:.0f}s")
    else:
        data, split = planted_ogbn("ogbn-products", scale=scale, noise=1.0)
        tag = "planted"
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

    import optax
    model = GraphSAGE(hidden=hidden, out=c, num_layers=3, dtype=jnp.bfloat16,
                      dropout=dropout)
    init_fn, train_step = make_multibatch_sage_trainer(
        model, [15, 10, 5],
        learning_rate=optax.cosine_decay_schedule(lr, steps * m))
    key = jax.random.key(0)
    rng_np = np.random.default_rng(0)
    seeds0 = jnp.asarray(rng_np.choice(tr, (m, batch)).astype(np.int32))
    t0 = time.time()
    state = init_fn(key, graph, x, seeds0[0])
    log(f"init {time.time()-t0:.0f}s")

    # full-graph inference via segmented blocked-ELL (fits HBM at 62M edges);
    # the host build is O(E log E) numpy (~10-30 min at 62M edges on this
    # 2-vCPU box), so cache it on disk keyed by the graph config
    t0 = time.time()
    # key by everything that determines the layout: generator name+seed+scale
    # and the segment count — a stale cache would silently evaluate over the
    # wrong adjacency
    import hashlib
    cache_tag = hashlib.sha1(
        f"{tag}_{scale}_{data.x.shape[0]}_{data.edge_index.shape[1]}"
        .encode()).hexdigest()[:12]
    cache = f"/tmp/seg_blocked_products_{cache_tag}_S32.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        from tch_geometric_tpu.ops.spmm_blocked import SegmentedBlockedCsr
        seg = SegmentedBlockedCsr(
            edge_src=jnp.asarray(z["edge_src"]),
            edge_local_row=jnp.asarray(z["edge_local_row"]),
            chunk_block=jnp.asarray(z["chunk_block"]),
            block_start=jnp.asarray(z["block_start"]),
            degree=jnp.asarray(z["degree"]),
            num_rows=int(z["num_rows"]), rows_per_block=int(z["rows_per_block"]),
            chunk_edges=int(z["chunk_edges"]),
            blocks_per_segment=int(z["blocks_per_segment"]))
        log(f"segmented blocked layout from cache {time.time()-t0:.0f}s")
    else:
        indptr = np.asarray(graph.indptr)
        indices = np.asarray(graph.indices)
        seg = build_blocked_segmented(indptr, indices, num_segments=32)
        np.savez(cache, edge_src=np.asarray(seg.edge_src),
                 edge_local_row=np.asarray(seg.edge_local_row),
                 chunk_block=np.asarray(seg.chunk_block),
                 block_start=np.asarray(seg.block_start),
                 degree=np.asarray(seg.degree),
                 num_rows=seg.num_rows, rows_per_block=seg.rows_per_block,
                 chunk_edges=seg.chunk_edges,
                 blocks_per_segment=seg.blocks_per_segment)
        log(f"segmented blocked build {time.time()-t0:.0f}s (cached)")

    # Per-layer jitted programs instead of one fused 3-layer scan-of-segments
    # program: the axon remote-compile service reproducibly drops the
    # connection ("Broken pipe") on the fused program at full products scale,
    # and smaller programs compile reliably + cache independently.
    from tch_geometric_tpu.ops.spmm_pallas import spmm_blocked_segmented

    @jax.jit
    def infer_layer(kern_self, bias_self, kern_neigh, seg, h, relu):
        agg = spmm_blocked_segmented(seg, h, agg="mean",
                                     compute_dtype=jnp.bfloat16,
                                     out_dtype=jnp.bfloat16)
        out = (h @ kern_self.astype(jnp.bfloat16) + bias_self
               + agg @ kern_neigh.astype(jnp.bfloat16))
        return jnp.where(relu, jax.nn.relu(out), out)

    def infer(params):
        p = params["params"]
        h = x.astype(jnp.bfloat16)
        for i in range(3):
            conv = p[f"conv{i}"]
            h = infer_layer(conv["lin_self"]["kernel"],
                            conv["lin_self"]["bias"].astype(jnp.bfloat16),
                            conv["lin_neigh"]["kernel"], seg, h,
                            jnp.asarray(i < 2))
        return jnp.argmax(h, axis=-1)

    best_va, best_te, t_train, mb_timed = 0.0, 0.0, 0.0, 0
    eval_every = max(20, steps // 10)
    for step in range(steps):
        seeds = jnp.asarray(
            rng_np.choice(tr, (m, batch)).astype(np.int32))
        t0 = time.time()
        state, losses, accs = train_step(state, key, graph, x, seeds,
                                         labels[seeds])
        jax.block_until_ready(losses)
        if step > 0:                      # step 0 pays the compile
            t_train += time.time() - t0
            mb_timed += m
        if step % eval_every == eval_every - 1 or step == steps - 1:
            t0 = time.time()
            try:
                pred = np.asarray(infer(state.params))
            except Exception as ex:  # axon tunnel compile service is flaky
                log(f"eval failed at step {step} ({type(ex).__name__}); "
                    "retrying once after 30s")
                time.sleep(30)
                pred = np.asarray(infer(state.params))
            t_inf = time.time() - t0
            va_acc = float((pred[va] == y_np[va]).mean())
            te_acc = float((pred[te] == y_np[te]).mean())
            if va_acc > best_va:
                best_va, best_te = va_acc, te_acc
            log(f"step {step:4d} ({(step+1)*m} minibatches) "
                f"loss {float(losses[-1]):.3f} val {va_acc:.4f} "
                f"test {te_acc:.4f} (infer {t_inf:.1f}s)")

    print(json.dumps({
        "dataset": ("ogbn-products" if data_dir else
                    "planted-ogbn-products"), "scale": scale,
        "N": int(data.x.shape[0]), "E": int(data.edge_index.shape[1]),
        "test_acc": round(best_te, 4),
        "minibatches": steps * m,
        "ms_per_minibatch": round(t_train / max(mb_timed, 1) * 1e3, 2),
    }))


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--dropout", type=float, default=0.2)
    ap.add_argument("--data-dir", default=None,
                    help="directory with REAL ogbn-products (raw csv.gz "
                         "layout or graph.npz; see data/ogb.load_ogbn_dir)")
    ap.add_argument("--directed", action="store_true",
                    help="skip the undirected symmetrization of raw edges")
    a = ap.parse_args()
    main(scale=a.scale, steps=a.steps, dropout=a.dropout,
         data_dir=a.data_dir, directed=a.directed)
