"""Multi-host correctness rig: N processes on this host, CPU backend.

SURVEY §2.5 "Communication backend" requires real multi-process execution
(``jax.distributed.initialize`` + Gloo/XLA collectives).  This launcher
spawns N worker processes, each owning ``--local-devices`` virtual CPU
devices; workers build the global DCN-aware mesh (parallel/multihost.py),
run the config-5 distributed sampler family (neighbor, budget, CTDNE walk)
over the partitioned karate graph plus one partitioned-trainer step, and
dump their ADDRESSABLE result shards.  The launcher reassembles shards in
rank order and asserts the (1 process x 4 devices) and (2 x 2) runs are
BIT-IDENTICAL — the device-count-invariance contract, now across process
boundaries.

Run: python scripts/run_multihost.py            (compare 1x4 vs 2x2)
     python scripts/run_multihost.py --procs 4  (compare 1x4 vs 4x1)
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(args):
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}")
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from tch_geometric_tpu.parallel import multihost
    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=args.procs, process_id=args.pid)
    assert jax.process_count() == args.procs
    mesh = multihost.make_mesh(("data",))
    Pn = mesh.shape["data"]

    from tch_geometric_tpu.data.io import load_karate_graph
    from tch_geometric_tpu.data.storage import to_csc, to_csr
    from tch_geometric_tpu.parallel.dist_sampling import (
        build_partitioned_graph, dist_sample_neighbors)
    from tch_geometric_tpu.parallel.dist_budget import dist_budget_sample
    from tch_geometric_tpu.parallel.dist_walks import (
        dist_biased_tempo_random_walk, effective_edge_ts)

    x, y, edge_index = load_karate_graph()
    cp, ri, _ = to_csc(np.asarray(edge_index), 34)
    rp, ci, _ = to_csr(np.asarray(edge_index), 34)
    rng_np = np.random.default_rng(0)
    ts = effective_edge_ts(np.asarray(ci),
                           rng_np.integers(0, 100, len(np.asarray(ci))),
                           rng_np.integers(0, 100, 34))

    key = jax.random.key(42)
    seeds = np.arange(8, dtype=np.int32)

    def shards(arr):
        """This process's addressable blocks, in device-position order."""
        sh = sorted(arr.addressable_shards, key=lambda s: s.index[0].start)
        return np.concatenate([np.asarray(s.data) for s in sh])

    out = {}
    g = build_partitioned_graph(np.asarray(cp), np.asarray(ri), Pn)
    sample, ovf = dist_sample_neighbors(key, g, seeds, (4, 3), mesh,
                                        capacity_factor=8.0)
    out["nb_nodes"] = shards(sample.nodes)
    out["nb_valid"] = shards(sample.node_valid)
    out["nb_ovf"] = shards(ovf)

    sample, ovf = dist_budget_sample(key, g, seeds, (4, 3), mesh,
                                     capacity_factor=8.0)
    out["bg_nodes"] = shards(sample.nodes)
    out["bg_valid"] = shards(sample.node_valid)

    gw = build_partitioned_graph(np.asarray(rp), np.asarray(ci), Pn,
                                 edge_timestamps=ts)
    walks, wts, ovf = dist_biased_tempo_random_walk(
        key, gw, seeds, np.zeros(8, np.int32), 6, "exponential", mesh,
        retry_count=3, capacity_factor=8.0)
    out["ct_walks"] = shards(walks)
    out["ct_ts"] = shards(wts)

    from tch_geometric_tpu.parallel.dist_negative import dist_negative_sample
    nw, nacc, ovf = dist_negative_sample(key, gw, seeds, 3, 10, mesh,
                                         capacity_factor=8.0)
    out["ng_w"] = shards(nw).reshape(-1)
    out["ng_acc"] = shards(nacc).reshape(-1)

    # typed samplers over a partitioned hetero topology (VERDICT r3 item 5:
    # every distributed family in the multi-process bit-identity rig) —
    # two relations sharing the karate adjacency, seeds in type "a"
    from tch_geometric_tpu.parallel.dist_hetero import (
        dist_hetero_neighbor_sample)
    from tch_geometric_tpu.parallel.dist_hgt import (build_partitioned_hetero,
                                                     dist_hgt_sample)
    edge_types = [("a", "r0", "a"), ("b", "r1", "a")]
    node_counts = {"a": 34, "b": 34}
    cph = {"a__r0__a": np.asarray(cp), "b__r1__a": np.asarray(cp)}
    rih = {"a__r0__a": np.asarray(ri), "b__r1__a": np.asarray(ri)}
    rels = build_partitioned_hetero(cph, rih, edge_types, Pn,
                                    node_counts=node_counts)
    (dn, _dts, dnv, _dr, _dc, deptr, dev_), h_ovf = \
        dist_hetero_neighbor_sample(
            key, rels, edge_types, {"a": np.arange(8, dtype=np.int64)},
            {"a__r0__a": [3, 2], "b__r1__a": [2, 2]}, 2, mesh,
            capacity_factor=8.0)
    out["ht_nodes_a"] = shards(dn["a"])
    out["ht_valid_a"] = shards(dnv["a"])
    out["ht_nodes_b"] = shards(dn["b"])
    out["ht_eptr"] = shards(deptr["a__r0__a"])
    out["ht_ev"] = shards(dev_["a__r0__a"])

    (hn, _hts, hv, _hr, _hc, he, hev), g_ovf = dist_hgt_sample(
        key, rels, edge_types, {"a": np.arange(4)},
        {"a": [4, 4], "b": [4, 4]}, 2, mesh, node_counts=node_counts,
        capacity_factor=8.0)
    out["rep_hgt_nodes_a"] = np.asarray(hn["a"])     # replicated output
    out["rep_hgt_valid_a"] = np.asarray(hv["a"])
    out["hgt_eptr"] = shards(he["a__r0__a"])
    out["hgt_ev"] = shards(hev["a__r0__a"])

    # one partitioned-trainer step (grads psum across processes)
    from tch_geometric_tpu.models import GraphSAGE
    from tch_geometric_tpu.parallel.dist_sampling import (
        make_partitioned_trainer)
    from tch_geometric_tpu.parallel.multihost import put_partitioned
    from tch_geometric_tpu.parallel.sharded_features import (
        build_interleaved_features)
    from jax.sharding import PartitionSpec as P
    model = GraphSAGE(hidden=16, out=int(np.asarray(y).max()) + 1,
                      num_layers=2)
    init_fn, train_step, _ = make_partitioned_trainer(
        model, [4, 3], mesh, capacity_factor=8.0)
    xi = build_interleaved_features(np.asarray(x), Pn)
    lab = np.asarray(y)[:8].astype(np.int32)
    with mesh:
        gput = put_partitioned(g, mesh, P("data"))
        xput = put_partitioned(np.asarray(xi), mesh, P("data"))
        sput = put_partitioned(seeds, mesh, P("data"))
        lput = put_partitioned(lab, mesh, P("data"))
        state = init_fn(key, gput, xput, sput)
        state, loss, acc, t_ovf = train_step(state, key, gput, xput, sput,
                                             lput)
    out["train_loss"] = np.asarray([float(loss)])
    out["train_ovf"] = np.asarray([int(t_ovf)])

    np.savez(os.path.join(args.out, f"rank{args.pid}.npz"), **out)
    print(f"[rank {args.pid}] done (P={Pn}, loss={float(loss):.4f})",
          flush=True)


def assemble(outdir, procs):
    parts = [np.load(os.path.join(outdir, f"rank{i}.npz"))
             for i in range(procs)]
    keys = parts[0].files
    return {k: np.concatenate([p[k] for p in parts])
            if parts[0][k].ndim and k.split("_")[0] not in ("train", "rep")
            else parts[0][k] for k in keys}


def launch(procs, local_devices, outdir, port):
    ps = []
    for i in range(procs):
        ps.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--pid", str(i), "--procs", str(procs),
             "--local-devices", str(local_devices),
             "--coordinator", f"localhost:{port}", "--out", outdir],
            cwd=REPO))
    rcs = [p.wait(timeout=600) for p in ps]
    assert all(rc == 0 for rc in rcs), f"worker failures: {rcs}"
    return assemble(outdir, procs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--coordinator", type=str, default="localhost:12399")
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--port", type=int, default=12399)
    args = ap.parse_args()
    if args.worker:
        worker(args)
        return

    total = args.procs * args.local_devices
    with tempfile.TemporaryDirectory() as d1, \
            tempfile.TemporaryDirectory() as d2:
        print(f"== run A: 1 process x {total} devices")
        a = launch(1, total, d1, args.port)
        print(f"== run B: {args.procs} processes x {args.local_devices} "
              f"devices")
        b = launch(args.procs, args.local_devices, d2, args.port + 1)
        for k in a:
            np.testing.assert_array_equal(
                a[k], b[k], err_msg=f"multi-host mismatch in {k}")
        assert int(a["nb_ovf"].sum()) == 0
    print(json.dumps({"multihost": "bit-identical", "procs": args.procs,
                      "devices": total, "families":
                      ["neighbor", "budget", "ctdne", "negative",
                       "hetero", "hgt", "trainer"]}))


if __name__ == "__main__":
    main()
