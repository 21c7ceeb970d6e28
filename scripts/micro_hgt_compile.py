"""Measure the partitioned-HGT trainer's program size + compile cost
(VERDICT r4 item 4: measure, then shrink).

Lowers `make_partitioned_hgt_trainer`'s train_step on the CPU target
(tunnel-independent) WITHOUT executing anything (eval_shape + lower on
ShapeDtypeStructs), reports StableHLO op counts and how they scale with
#relations / #hops, and optionally times the CPU compile.

Usage: JAX_PLATFORM_NAME=cpu python scripts/micro_hgt_compile.py --sweep
       python scripts/micro_hgt_compile.py --rels 6 --hops 2 [--compile]
"""
import argparse
import collections
import os
import re
import sys
import time

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "")
     + " --xla_force_host_platform_device_count=8").strip())
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

jax.config.update("jax_platforms", "cpu")

from tch_geometric_tpu.models.hgt import HGT
from tch_geometric_tpu.parallel.dist_hgt import (build_partitioned_hetero,
                                                 stack_partitioned_rels)
from tch_geometric_tpu.parallel.hgt_train import make_partitioned_hgt_trainer
from tch_geometric_tpu.parallel.sharded_features import (
    build_interleaved_features)
from tch_geometric_tpu.utils.types import rel_key


def _sds(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype)
        if hasattr(a, "dtype") or isinstance(a, (np.ndarray,)) else a, tree)


def build_case(num_rels, num_hops, Pn, hidden, heads, samples,
               nodes_per_type=2000, edges_per_rel=12000, B=64,
               mode="unrolled"):
    """3 node types, `num_rels` relations round-robin over type pairs."""
    rng_np = np.random.default_rng(0)
    types = ["a", "b", "c"]
    node_counts = {t: nodes_per_type for t in types}
    pairs = [("a", "a"), ("b", "a"), ("a", "b"), ("c", "a"), ("a", "c"),
             ("b", "c"), ("c", "b"), ("b", "b"), ("c", "c")]
    edge_types = [(pairs[i % len(pairs)][0], f"r{i}",
                   pairs[i % len(pairs)][1]) for i in range(num_rels)]
    col_ptrs, row_indices = {}, {}
    for (s, rel, d) in edge_types:
        r = rel_key((s, rel, d))
        src = rng_np.integers(0, node_counts[s], edges_per_rel)
        dst = np.sort(rng_np.integers(0, node_counts[d], edges_per_rel))
        cp = np.searchsorted(dst, np.arange(node_counts[d] + 1))
        col_ptrs[r] = cp.astype(np.int64)
        row_indices[r] = src.astype(np.int64)
    x_np = {t: rng_np.normal(size=(n, 32)).astype(np.float32)
            for t, n in node_counts.items()}
    seeds = np.arange(B, dtype=np.int32)
    labels = rng_np.integers(0, 8, B).astype(np.int32)
    rel_specs = tuple(sorted((rel_key(e), e[0], e[2]) for e in edge_types))

    mesh = Mesh(np.array(jax.devices()[:Pn]), ("data",))
    rels = build_partitioned_hetero(col_ptrs, row_indices, edge_types, Pn,
                                    node_counts=node_counts)
    model = HGT(hidden=hidden, out=8, num_layers=2,
                node_types=tuple(sorted(node_counts)),
                rel_specs=rel_specs, out_type="a", heads=heads,
                stacked_rels=(mode != "unrolled"))
    init_fn, train_step, eval_step = make_partitioned_hgt_trainer(
        model, edge_types, {t: [samples] * num_hops for t in node_counts},
        num_hops, node_counts, mesh, seed_type="a", capacity_factor=4.0,
        fused=(mode == "fused"))
    x_i = {t: build_interleaved_features(x_np[t], Pn) for t in node_counts}
    if mode != "unrolled":
        rels = stack_partitioned_rels(rels, [r for r, _s, _d in rel_specs])
    return (mesh, init_fn, train_step, rels, x_i, seeds, labels)


def measure(num_rels, num_hops, Pn, hidden, heads, samples, do_compile,
            mode="unrolled"):
    t0 = time.perf_counter()
    mesh, init_fn, train_step, rels, x_i, seeds, labels = build_case(
        num_rels, num_hops, Pn, hidden, heads, samples, mode=mode)
    t_build = time.perf_counter() - t0

    with mesh:
        t0 = time.perf_counter()
        key = jax.random.key(0)
        state_sds = jax.eval_shape(init_fn, key, _sds(rels), _sds(x_i),
                                   _sds(seeds))
        lowered = jax.jit(train_step).lower(
            state_sds, key, _sds(rels), _sds(x_i), _sds(seeds),
            _sds(labels))
        t_lower = time.perf_counter() - t0
        text = lowered.as_text()
        ops = collections.Counter(
            m.group(1) for m in re.finditer(r"=\s*\"?([a-z_]+\.[a-z_.]+)",
                                            text))
        n_ops = sum(ops.values())
        t_compile = None
        if do_compile:
            t0 = time.perf_counter()
            lowered.compile()
            t_compile = time.perf_counter() - t0
    return dict(rels=num_rels, hops=num_hops, P=Pn, ops=n_ops,
                mode=mode,
                bytes=len(text), top=ops.most_common(8),
                t_build=t_build, t_lower=t_lower, t_compile=t_compile)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rels", type=int, default=6)
    ap.add_argument("--hops", type=int, default=2)
    ap.add_argument("--P", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--sweep", action="store_true",
                    help="scale sweep over rels/hops (no compile)")
    ap.add_argument("--compile", action="store_true")
    ap.add_argument("--mode", default="unrolled",
                    choices=["unrolled", "scan", "fused"],
                    help="relation-program structure")
    ap.add_argument("--ab", action="store_true",
                    help="A/B: unrolled vs scan vs fused at this config")
    args = ap.parse_args()

    if args.sweep:
        print(f"{'plan':>9} {'rels':>5} {'hops':>5} {'HLO ops':>9} "
              f"{'MB text':>8} {'lower s':>8}")
        for mode in ("unrolled", "scan", "fused"):
            for rels, hops in ((1, 2), (3, 2), (6, 2), (6, 3)):
                r = measure(rels, hops, args.P, args.hidden, args.heads,
                            args.samples, do_compile=False, mode=mode)
                print(f"{mode:>9} {r['rels']:>5} {r['hops']:>5} "
                      f"{r['ops']:>9} {r['bytes']/1e6:>8.1f} "
                      f"{r['t_lower']:>8.1f}", flush=True)
        return

    if args.ab:
        for mode in ("unrolled", "scan", "fused"):
            r = measure(args.rels, args.hops, args.P, args.hidden,
                        args.heads, args.samples, do_compile=True,
                        mode=mode)
            print(f"{mode}: {r['ops']} ops, {r['bytes']/1e6:.1f} MB, "
                  f"lower {r['t_lower']:.1f}s, CPU compile "
                  f"{r['t_compile']:.1f}s", flush=True)
        return

    r = measure(args.rels, args.hops, args.P, args.hidden, args.heads,
                args.samples, do_compile=args.compile, mode=args.mode)
    print(f"config: rels={r['rels']} hops={r['hops']} P={r['P']} "
          f"hidden={args.hidden} heads={args.heads} samples={args.samples}")
    print(f"StableHLO ops: {r['ops']}   text: {r['bytes']/1e6:.1f} MB")
    print("top op kinds:")
    for k, v in r["top"]:
        print(f"  {k:>28} {v}")
    tc = "skipped" if r["t_compile"] is None else f"{r['t_compile']:.1f}s"
    print(f"build: {r['t_build']:.1f}s  lower: {r['t_lower']:.1f}s  "
          f"CPU compile: {tc}")


if __name__ == "__main__":
    main()
