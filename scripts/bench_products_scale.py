import time, numpy as np, jax, jax.numpy as jnp, sys; sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__file__), '..'))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tch_geometric_tpu.data import csc_graph_from_coo
from tch_geometric_tpu.data.ogb import synthetic_ogbn
from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel import make_sage_trainer
from tch_geometric_tpu.parallel.train import make_multibatch_sage_trainer

t0=time.time()
data = synthetic_ogbn("ogbn-products")
print(f"synthetic products: N={data.num_nodes} E={data.num_edges} built {time.time()-t0:.0f}s", flush=True)
t0=time.time()
graph = data.csc()
print(f"CSC build (native): {time.time()-t0:.0f}s, max_degree={graph.max_degree}", flush=True)

x = jnp.asarray(data.x)          # 2.4M x 100 f32 = 980MB on HBM
labels = jnp.asarray(data.y)
B = 512
model = GraphSAGE(hidden=256, out=47, num_layers=3)
init_fn, train_step, _ = make_sage_trainer(model, [15, 10, 5], learning_rate=1e-3)
key = jax.random.key(0)
seeds = jnp.arange(B)
t0=time.time(); state = init_fn(key, graph, x, seeds); print("init:", round(time.time()-t0,1), flush=True)
t0=time.time(); state, loss, acc = train_step(state, key, graph, x, seeds, labels[seeds]); float(loss)
print("compile+step:", round(time.time()-t0,1), flush=True)
from tch_geometric_tpu.utils.metrics import MetricsLogger, trace_span
mlog = MetricsLogger()            # JSON-lines step metrics on stderr
K=10
t0=time.perf_counter()
for i in range(K):
    with trace_span("train_step"):
        state, loss, acc = train_step(state, key, graph, x, seeds, labels[seeds])
    # no host fetch here (a per-step tunnel sync would pollute the timing);
    # step_time reflects dispatch cadence, the final fetch below is the
    # barrier for the aggregate number
    mlog.step(i, batch_size=B)
float(loss)
dt=(time.perf_counter()-t0)/K
print(f"products-scale train step: {dt*1e3:.1f} ms -> {1/dt:.1f} minibatches/s  loss={float(loss):.3f}", flush=True)

# --- multibatch trainer: M minibatches per program (gather amortization),
# bf16 feature table + bf16 model compute (f32 params/optimizer) ---
M = 8
model16 = GraphSAGE(hidden=256, out=47, num_layers=3, dtype=jnp.bfloat16)
x16 = x.astype(jnp.bfloat16)
init_mb, train_mb = make_multibatch_sage_trainer(model16, [15, 10, 5], learning_rate=1e-3)
rng_np = np.random.default_rng(0)
seeds_mb = jnp.asarray(rng_np.integers(0, data.num_nodes, (M, B)).astype(np.int32))
labels_mb = labels[seeds_mb]
t0=time.time(); state = init_mb(key, graph, x16, seeds_mb[0]); print("mb init:", round(time.time()-t0,1), flush=True)
t0=time.time(); state, losses, accs = train_mb(state, key, graph, x16, seeds_mb, labels_mb); float(losses[-1])
print("mb compile+step:", round(time.time()-t0,1), flush=True)
K=5
t0=time.perf_counter()
for i in range(K):
    state, losses, accs = train_mb(state, key, graph, x16, seeds_mb, labels_mb)
float(losses[-1])
dt=(time.perf_counter()-t0)/K/M
print(f"products-scale multibatch(M={M}, bf16) step: {dt*1e3:.1f} ms/minibatch -> "
      f"{1/dt:.1f} minibatches/s  loss={float(losses[-1]):.3f}")
