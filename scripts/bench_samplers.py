"""Sampler-family throughput on one chip: minibatches/s for every sampler.

BASELINE.json metric 2 asks for "sampled mini-batches/s" across the
neighbor / budget / HGT sampler families (plus walks and negative
sampling).  Each sampler is timed as K sequential device calls chained
through the RNG key (the next call's key depends on the previous call's
output) so the tunnel cannot overlap iterations; wall time is a true
pipeline measurement including dispatch.

Scales: arxiv-class homogeneous graph (N=169k, E=1.2M) for neighbor /
walks / negative; a 3-type 6-relation hetero graph (~50k nodes/type,
300k edges/rel) for hetero-neighbor / HGT / budget.
"""
import time, sys, os, json
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tch_geometric_tpu.data import csc_graph_from_coo
from tch_geometric_tpu.data.graph import make_graph
from tch_geometric_tpu.sampling import rng
from tch_geometric_tpu.sampling.neighbor import sample_neighbors
from tch_geometric_tpu.sampling.hetero_neighbor import sample_hetero_neighbors
from tch_geometric_tpu.sampling.hgt import sample_hgt
from tch_geometric_tpu.sampling.budget import sample_budget
from tch_geometric_tpu.sampling.walks import (
    _random_walk_impl, _tempo_walk_impl, _csr_from_parts)
from tch_geometric_tpu.sampling.negative import _negative_candidates
from tch_geometric_tpu.utils.config import UniformEdgeSampler, WeightedEdgeSampler
from tch_geometric_tpu.utils.metrics import MetricsLogger

K = int(os.environ.get("BENCH_K", 20))
B = int(os.environ.get("BENCH_B", 512))
SCALE = float(os.environ.get("BENCH_SCALE", 1.0))
results = {}
mlog = MetricsLogger()            # JSON-lines result records on stderr


def chain_time(name, call, key):
    """K chained calls; next key folds in previous output checksum.

    Warmup fetches the checksum to HOST: block_until_ready on a tunneled
    buffer does not wait for compile/transfer to finish, so without the
    fetch the first timed loop absorbs the graph upload (measured: a 50 MB
    graph made whichever sampler ran first look 40x slower)."""
    out, chk = call(key)
    int(jax.device_get(chk))
    t0 = time.time()
    out, chk = call(key)
    int(jax.device_get(chk))
    print(f"{name}: warm step {time.time()-t0:.2f}s", flush=True)
    # Two timed loops, keep the better: the first loop in a process still
    # absorbs one-off background work (async persistent-cache writes, a
    # retrace for the folded-key chain) even after the warm host fetch.
    best = float("inf")
    for _rep in range(2):
        t0 = time.perf_counter()
        k = key
        for _ in range(K):
            out, chk = call(k)
            k = rng.fold(k, chk)
        int(jax.device_get(chk))
        best = min(best, (time.perf_counter() - t0) / K)
    dt = best
    print(f"{name}: {dt*1e3:.2f} ms/batch -> {1/dt:.1f} batches/s", flush=True)
    mlog.event(sampler=name, ms_per_batch=round(dt * 1e3, 2),
               batches_per_s=round(1 / dt, 1))
    results[name] = round(1 / dt, 1)
    return dt


def main():
    rng_np = np.random.default_rng(0)
    N, E = int(169_343 * SCALE), int(1_166_243 * SCALE)
    ei = np.stack([rng_np.integers(0, N, E), rng_np.integers(0, N, E)])
    graph = csc_graph_from_coo(ei, N)
    # CSR view for walks/negative (same structure, swapped roles)
    csr = graph
    seeds = jnp.asarray(rng_np.integers(0, N, B).astype(np.int32))
    key = jax.random.key(0)
    zero_state = jnp.zeros((B,), jnp.int32)

    fanouts = (15, 10, 5)

    def neigh_uniform(k):
        s = sample_neighbors(graph, seeds, fanouts, key=k,
                             sampler=UniformEdgeSampler(True))
        return s, s.nodes.sum()

    def neigh_floyd(k):
        s = sample_neighbors(graph, seeds, fanouts, key=k,
                             sampler=UniformEdgeSampler(False))
        return s, s.nodes.sum()

    w = jnp.asarray(np.abs(rng_np.normal(size=E)).astype(np.float32) + 0.1)

    def neigh_weighted(k):
        s = sample_neighbors(graph, seeds, fanouts, key=k,
                             sampler=WeightedEdgeSampler(w))
        return s, s.nodes.sum()

    chain_time("neighbor[15,10,5] uniform w/ repl", neigh_uniform, key)
    chain_time("neighbor[15,10,5] uniform w/o repl (floyd)", neigh_floyd, key)
    chain_time("neighbor[15,10,5] weighted (gumbel)", neigh_weighted, key)

    # --- walks ---------------------------------------------------------
    L = 20

    def n2v(k):
        walks = _random_walk_impl(k, csr, seeds, L, 2.0, 0.5, 16)
        return walks, walks.sum().astype(jnp.int32)

    chain_time(f"node2vec walk L={L} (p=2,q=.5)", n2v, key)

    node_ts = jnp.asarray(rng_np.integers(0, 100, N).astype(np.int32))
    edge_ts = jnp.asarray(rng_np.integers(0, 100, E).astype(np.int32))
    start_ts = jnp.zeros((B,), jnp.int32)

    def tempo(k):
        walks, wts = _tempo_walk_impl(k, csr, node_ts, edge_ts, seeds,
                                      start_ts, L, jnp.int32(0),
                                      jnp.int32(100), 64)
        return walks, walks.sum().astype(jnp.int32)

    chain_time(f"tempo walk L={L}", tempo, key)

    from tch_geometric_tpu.sampling.walks import _biased_tempo_walk_impl

    def ctdne(k):
        walks, wts = _biased_tempo_walk_impl(
            k, csr, node_ts, edge_ts, seeds, start_ts, L,
            "exponential", True, 3)
        return walks, walks.sum().astype(jnp.int32)

    chain_time(f"ctdne walk L={L} exp bias retry=3", ctdne, key)

    # --- negative sampling ---------------------------------------------
    def neg(k):
        cand, ok = _negative_candidates(k, csr, seeds, N, 5, 20)
        return cand, cand.sum().astype(jnp.int32)

    chain_time("negative 5/node try=20", neg, key)

    # --- hetero: 3 types x 6 rels --------------------------------------
    NT, ER = int(50_000 * SCALE), int(300_000 * SCALE)
    node_types = ["v0", "v1", "v2"]
    edge_types = [(a, f"r{i}", b) for i, (a, b) in enumerate(
        [("v0", "v1"), ("v1", "v0"), ("v1", "v2"),
         ("v2", "v1"), ("v0", "v2"), ("v2", "v0")])]
    graphs = {}
    for (src, r, dst) in edge_types:
        ei_r = np.stack([rng_np.integers(0, NT, ER), rng_np.integers(0, NT, ER)])
        graphs[f"{src}__{r}__{dst}"] = csc_graph_from_coo(ei_r, NT)
    node_counts = {t: NT for t in node_types}
    h_inputs = {t: jnp.asarray(rng_np.integers(0, NT, B // 2).astype(np.int32))
                for t in node_types}

    def hetero_neigh(k):
        s = sample_hetero_neighbors(
            graphs, edge_types, h_inputs,
            {rk: [5, 5] for rk in graphs}, 2, key=k)
        return s, sum(v.sum() for v in s.nodes.values()).astype(jnp.int32)

    chain_time("hetero neighbor [5,5] x 6 rels", hetero_neigh, key)

    def hgt(k):
        s = sample_hgt(graphs, edge_types, h_inputs,
                       {t: [64, 64] for t in node_types}, 2,
                       node_counts=node_counts, key=k)
        return s, sum(v.sum() for v in s.nodes.values()).astype(jnp.int32)

    chain_time("hgt [64,64] x 3 types", hgt, key)

    def budget(k):
        s = sample_budget(graphs, edge_types, h_inputs,
                          {t: [8, 4] for t in node_types}, 2, key=k)
        return s, sum(v.sum() for v in s.nodes.values()).astype(jnp.int32)

    chain_time("budget [8,4] x 3 types", budget, key)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
