import time, numpy as np, jax, jax.numpy as jnp, sys; sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__file__), '..'))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tch_geometric_tpu.data import csc_graph_from_coo
from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel import make_sage_trainer
N, E, F, B = 169_343, 1_166_243, 128, 512
rng = np.random.default_rng(0)
ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)])
graph = csc_graph_from_coo(ei, N)
x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
labels = jnp.asarray(rng.integers(0, 40, N))
model = GraphSAGE(hidden=256, out=40, num_layers=3)
init_fn, train_step, _ = make_sage_trainer(model, [15, 10, 5], learning_rate=1e-3)
key = jax.random.key(0)
seeds = jnp.arange(B)
t0=time.time()
state = init_fn(key, graph, x, seeds)
print("init:", round(time.time()-t0,1), flush=True)
t0=time.time()
state, loss, acc = train_step(state, key, graph, x, seeds, labels[seeds]); float(loss)
print("compile+step:", round(time.time()-t0,1), "s", flush=True)
K=10
t0=time.perf_counter()
for i in range(K):
    state, loss, acc = train_step(state, key, graph, x, seeds, labels[seeds])
float(loss)
dt=(time.perf_counter()-t0)/K
edges = B*15*(1+10*(1+5))
print(f"train step: {dt*1e3:.1f} ms -> {1/dt:.1f} minibatches/s ({edges/dt/1e6:.1f}M sampled-edges/s)")

# --- multibatch trainer: M batches sampled+gathered in one program,
# bf16 feature table + bf16 model compute (the production path) -------------
from tch_geometric_tpu.parallel import make_multibatch_sage_trainer
M = 8
model16 = GraphSAGE(hidden=256, out=40, num_layers=3, dtype=jnp.bfloat16)
x16 = x.astype(jnp.bfloat16)
init_m, step_m = make_multibatch_sage_trainer(model16, [15, 10, 5],
                                              learning_rate=1e-3)[:2]
seeds_m = jnp.asarray(rng.integers(0, N, (M, B)).astype(np.int32))
labels_m = labels[seeds_m]
state_m = init_m(key, graph, x16, seeds_m[0])
t0 = time.time()
state_m, losses, accs = step_m(state_m, key, graph, x16, seeds_m, labels_m)
float(losses[-1])
print("multibatch compile+step:", round(time.time()-t0, 1), "s", flush=True)
t0 = time.perf_counter()
for i in range(K):
    state_m, losses, accs = step_m(state_m, key, graph, x16, seeds_m, labels_m)
float(losses[-1])
dt = (time.perf_counter()-t0)/K/M
print(f"multibatch (M={M}, bf16) train step: {dt*1e3:.1f} ms/batch -> "
      f"{1/dt:.1f} minibatches/s ({edges/dt/1e6:.1f}M sampled-edges/s)")
