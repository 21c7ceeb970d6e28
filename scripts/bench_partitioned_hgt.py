"""Partitioned HGT trainer at hetero scale (VERDICT r3 item 4).

Measures ms/step + routing overflow of ``make_partitioned_hgt_trainer``
(nothing graph-sized replicated: per-relation adjacency sharded, per-type
feature tables interleave-sharded, distributed score^2 budget sampling)
against the replicated-topology ``make_hgt_trainer`` on the SAME graph,
model, and sampling config — the typed analogue of
bench_partitioned_products.py.  Two configs:

* planted-hetero scale: 3 types x 20k nodes, 6 relations x 120k edges
  (the scale of bench_hetero_accuracy.py's accuracy runs)
* products-class skew: 3 types x 200k nodes, 6 relations x 2M edges with
  power-law source popularity (hub stress on the owner-routed exchanges)

Semantics matched: /root/reference/src/algo/hgt_sampling.rs:138-278 (the
score^2 budget sampler these trainers embed).

Timing notes (BASELINE.md round-3): dependent state chains through the
axon tunnel pay a large per-execution round trip; independent calls
isolate device time — both are printed, the independent row is the
hardware number.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tch_geometric_tpu.data.storage import to_csc
from tch_geometric_tpu.data.graph import make_graph
from tch_geometric_tpu.models import HGT
from tch_geometric_tpu.parallel import make_hgt_trainer
from tch_geometric_tpu.parallel.dist_hgt import build_partitioned_hetero
from tch_geometric_tpu.parallel.hgt_train import make_partitioned_hgt_trainer
from tch_geometric_tpu.parallel.multihost import put_partitioned
from tch_geometric_tpu.parallel.sharded_features import (
    build_interleaved_features)
from tch_geometric_tpu.utils.types import rel_key

B = 512
F = 128
HIDDEN = 128
HEADS = 4
LAYERS = 2
SAMPLES = (128, 128)     # per type per hop (score^2 budget top-k)


def build_hetero(n_per_type: int, e_per_rel: int, *, skew: bool, seed=0):
    rng = np.random.default_rng(seed)
    node_types = ["v0", "v1", "v2"]
    node_counts = {t: n_per_type for t in node_types}
    edge_types = [(s, f"r{i}", d) for i, (s, d) in enumerate(
        [("v0", "v0"), ("v0", "v1"), ("v1", "v0"),
         ("v1", "v2"), ("v2", "v0"), ("v2", "v1")])]
    if skew:
        pop = (1.0 / (np.arange(n_per_type) + 10.0)) ** 0.8
        pop /= pop.sum()
    edge_index = {}
    for e in edge_types:
        src = (rng.choice(n_per_type, size=e_per_rel, p=pop) if skew
               else rng.integers(0, n_per_type, e_per_rel))
        dst = rng.integers(0, n_per_type, e_per_rel)
        edge_index[e] = np.stack([src, dst]).astype(np.int64)
    xs = {t: rng.normal(size=(n_per_type, F)).astype(np.float32)
          for t in node_types}
    y = rng.integers(0, 16, n_per_type).astype(np.int32)
    return node_types, node_counts, edge_types, edge_index, xs, y


def time_steps(train_step, state, args, k=10):
    # NB: block_until_ready on a remote axon buffer is NOT a true barrier;
    # only a host fetch is (bench.py / BASELINE.md).  The device queue is
    # serial, so fetching the last call's loss syncs the whole batch.
    # dependent chain (includes tunnel round trips)
    st = state
    t0 = time.perf_counter()
    for _ in range(k):
        st, loss, acc, ovf = train_step(st, *args)
    float(np.asarray(loss))
    dep = (time.perf_counter() - t0) / k
    # independent calls (device time)
    outs = []
    t0 = time.perf_counter()
    for _ in range(k):
        _s, loss, acc, ovf = train_step(state, *args)
        outs.append(loss)
    float(np.asarray(outs[-1]))
    ind = (time.perf_counter() - t0) / k
    return dep, ind, int(np.asarray(ovf)), float(np.asarray(loss))


def run_config(name: str, n_per_type: int, e_per_rel: int, skew: bool):
    print(f"=== {name}: 3 types x {n_per_type} nodes, "
          f"6 rels x {e_per_rel} edges (skew={skew}) ===", flush=True)
    (node_types, node_counts, edge_types, edge_index, xs,
     y) = build_hetero(n_per_type, e_per_rel, skew=skew)
    rel_specs = tuple(sorted((rel_key(e), e[0], e[2]) for e in edge_types))
    # HGT_MODE selects the relation-program structure of the
    # partitioned sampler: unrolled (r4 baseline, program linear in R),
    # scan (lax.scan over relations: compile halves, step 2.2x), or
    # fused (ONE batched exchange per phase carrying every relation:
    # program ~constant in R AND batched collectives).  HGT_MODEL_STACKED
    # independently picks the model's relation-loop structure (default:
    # scan for scan/fused modes, unrolled otherwise).
    mode = os.environ.get("HGT_MODE",
                          "scan" if os.environ.get("HGT_STACKED")
                          else "unrolled")
    assert mode in ("unrolled", "scan", "fused"), mode
    stacked = mode != "unrolled"
    mstk_env = os.environ.get("HGT_MODEL_STACKED")
    model_stacked = (stacked if mstk_env is None else mstk_env == "1")
    print(f"mode={mode} model_stacked={model_stacked}", flush=True)
    model = HGT(hidden=HIDDEN, out=16, num_layers=LAYERS,
                node_types=tuple(sorted(node_types)), rel_specs=rel_specs,
                out_type="v0", heads=HEADS, stacked_rels=model_stacked)
    num_samples = {t: list(SAMPLES) for t in node_types}
    seeds = np.arange(B, dtype=np.int32)
    labels = jnp.asarray(y[:B])
    key = jax.random.key(0)

    # ---- replicated-topology trainer --------------------------------
    col_ptrs, row_indices = {}, {}
    graphs = {}
    for e in edge_types:
        cp, ci, _ = to_csc(edge_index[e],
                           (node_counts[e[0]], node_counts[e[2]]))
        col_ptrs[rel_key(e)] = np.asarray(cp)
        row_indices[rel_key(e)] = np.asarray(ci)
        graphs[rel_key(e)] = make_graph(cp, ci, num_src=node_counts[e[0]],
                                        num_dst=node_counts[e[2]])
    rep_ind = None
    if not os.environ.get("HGT_SKIP_REPLICATED"):
        x_tables = {t: jnp.asarray(v) for t, v in xs.items()}
        init_fn, train_step = make_hgt_trainer(
            model, graphs, edge_types, num_samples, LAYERS, node_counts,
            x_tables, seed_type="v0", learning_rate=1e-3)
        t0 = time.time()
        state = init_fn(key, jnp.asarray(seeds))
        state, loss, acc = train_step(state, key, jnp.asarray(seeds),
                                      labels)
        float(np.asarray(loss))       # true barrier (host fetch)
        print(f"replicated compile: {time.time()-t0:.0f}s", flush=True)

        st = state
        t0 = time.perf_counter()
        K = 10
        for _ in range(K):
            st, loss, acc = train_step(st, key, jnp.asarray(seeds), labels)
        float(np.asarray(loss))
        dep = (time.perf_counter() - t0) / K
        outs = []
        t0 = time.perf_counter()
        for _ in range(K):
            _s, loss, acc = train_step(state, key, jnp.asarray(seeds),
                                       labels)
            outs.append(loss)
        float(np.asarray(outs[-1]))
        ind = (time.perf_counter() - t0) / K
        print(f"replicated HGT step: dependent {dep*1e3:.1f} ms | "
              f"device-time (independent) {ind*1e3:.1f} ms "
              f"loss={float(loss):.3f}", flush=True)
        rep_ind = ind

    # ---- fully partitioned trainer ----------------------------------
    n_dev = 1
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    rels = build_partitioned_hetero(col_ptrs, row_indices, edge_types,
                                    n_dev, node_counts=node_counts)
    init_fn, train_step, _ = make_partitioned_hgt_trainer(
        model, edge_types, num_samples, LAYERS, node_counts, mesh,
        seed_type="v0", learning_rate=1e-3, capacity_factor=2.0,
        fused=(mode == "fused"))
    with mesh:
        sh = NamedSharding(mesh, P("data"))
        if stacked:
            from tch_geometric_tpu.parallel.dist_hgt import put_stacked_rels
            rel_specs2 = sorted((rel_key(e), e[0], e[2])
                                for e in edge_types)
            rels_put = put_stacked_rels(
                rels, [r for r, _s, _d in rel_specs2], mesh, "data")
        else:
            rels_put = {r: put_partitioned(rels[r], mesh, P("data"))
                        for r in rels}
        x_put = {t: jax.device_put(
            jnp.asarray(build_interleaved_features(xs[t], n_dev)), sh)
            for t in node_types}
        t0 = time.time()
        state = init_fn(key, rels_put, x_put, seeds)
        state, loss, acc, ovf = train_step(state, key, rels_put, x_put,
                                           seeds, labels)
        float(np.asarray(loss))       # true barrier (host fetch)
        print(f"partitioned compile: {time.time()-t0:.0f}s", flush=True)
        dep, ind, ovf, loss = time_steps(
            train_step, state, (key, rels_put, x_put, seeds, labels))
        gap = "" if rep_ind is None else \
            f" gap vs replicated: {ind/rep_ind:.2f}x"
        print(f"partitioned HGT step (P={n_dev}): dependent {dep*1e3:.1f} ms"
              f" | device-time (independent) {ind*1e3:.1f} ms "
              f"loss={loss:.3f} overflow={ovf}{gap}", flush=True)


if __name__ == "__main__":
    run_config("planted-hetero scale", 20_000, 120_000, skew=False)
    if not os.environ.get("HGT_SKIP_SKEW"):
        run_config("products-class skew", 200_000, 2_000_000, skew=True)
