"""Full-graph GraphSAGE inference at ogbn-products scale on ONE chip.

The (E, F) gathered intermediate for E=62M, F=256 bf16 is ~16 GB — more
than v5e HBM — so this uses the SegmentedBlockedCsr layout: a lax.scan of
per-segment gather+MXU-contraction keeps peak memory at O(E/S * F) with
exact semantics (ops/spmm_blocked.py).

Prints layer-wise full-graph 3-layer SAGE forward wall time and edges/s.
"""
import time
import sys
import os

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tch_geometric_tpu.data.ogb import synthetic_ogbn
from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.ops import build_blocked_segmented

S = 32

t0 = time.time()
data = synthetic_ogbn("ogbn-products")
print(f"synthetic products: N={data.num_nodes} E={data.num_edges} "
      f"built {time.time()-t0:.0f}s", flush=True)

# CSC (in-neighbor) arrays for the blocked layout
t0 = time.time()
graph = data.csc()
indptr = np.asarray(graph.indptr)
indices = np.asarray(graph.indices)
print(f"CSC: {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
seg = build_blocked_segmented(indptr, indices, num_segments=S)
pad = seg.edge_src.shape[0] * seg.edge_src.shape[1] * seg.chunk_edges \
    / max(data.num_edges, 1)
print(f"segmented layout: S={S} Tp={seg.edge_src.shape[1]} "
      f"C={seg.chunk_edges} pad={pad:.3f} built {time.time()-t0:.0f}s",
      flush=True)

x = jnp.asarray(data.x).astype(jnp.bfloat16)
model = GraphSAGE(hidden=256, out=47, num_layers=3, dtype=jnp.bfloat16)

# init on a tiny segmented layout (params depend only on feature dims)
tiny_seg = build_blocked_segmented(indptr[:129], indices[: int(indptr[128])],
                                   num_segments=2)
params = model.init(jax.random.key(0), x[:128], tiny_seg,
                    method=GraphSAGE.blocked_forward)


@jax.jit
def infer(params, x, seg):
    out = model.apply(params, x, seg, method=GraphSAGE.blocked_forward)
    return out.astype(jnp.float32)


t0 = time.time()
out = infer(params, x, seg)
s = float(out.sum())
print(f"compile+first inference: {time.time()-t0:.1f}s  sum={s:.3f}",
      flush=True)

ts = []
for _ in range(3):
    t0 = time.perf_counter()
    float(infer(params, x, seg).sum())
    ts.append(time.perf_counter() - t0)
dt = float(np.median(ts))
layers = 3
print(f"full-graph 3-layer SAGE inference: {dt*1e3:.0f} ms  "
      f"({layers*data.num_edges/dt/1e9:.2f} Gedge-aggregations/s)")
