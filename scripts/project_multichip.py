"""Analytic multi-chip projection for the partitioned trainer (r3 item 7).

Virtual-mesh weak-scaling beyond P=2 on this 2-vCPU host measures host
oversubscription, not the algorithm (BASELINE.md).  This replaces it with
an analytic projection a real slice can confirm or falsify: combine

  * the partitioned step's EXACT per-device exchange byte counts (static
    shape constants of the compiled program — the same formulas
    tests/test_scaling_accounting.py pins flat-in-P), and
  * the measured P=1 device step time at products scale (everything the
    chip does when the exchanges are loopback), with
  * v5e interconnect bandwidths,

into predicted weak-scaling step times / efficiencies at P = 4..256.

Assumptions (stated, conservative):
  A1. Weak scaling: per-device seed batch fixed at B=512, fanouts
      [15,10,5], F=100 f32 features (synthetic ogbn-products config).
  A2. Compute per device is the measured P=1 step (owner-side sampling
      work actually SHRINKS ~1/P per device since each owner samples only
      its share of requests — holding it constant is conservative).
  A3. No compute/comm overlap (XLA:TPU serializes dynamic gathers with
      collectives in practice; overlap would only improve the numbers).
  A4. ICI: v5e has 4 ICI links per chip at 400 Gbps/dir aggregate
      1600 Gbps => ~200 GB/s/chip marketing aggregate; we assume an
      EFFECTIVE all_to_all throughput of 90 GB/s per chip egress
      (~45% of aggregate — ring/torus routing and protocol overhead),
      intra-slice (v5e slices up to 256 chips are all-ICI).
  A5. Multislice (DCN) rows assume 25 GB/s/host egress shared by 8
      chips/host => ~3 GB/s/chip for the inter-slice fraction.
  A6. all_to_all moves (P-1)/P of the buffer off-chip.
"""
import os
import sys
import importlib.util

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "bench_scaling", os.path.join(REPO, "scripts", "bench_scaling.py"))
bs = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bs)

# measured on one v5e chip (scripts/bench_partitioned_products.py,
# independent-calls device time, round 4 sort-free routing):
T_COMPUTE_MS = 20.2
B_PER_DEV = 512
FANOUTS = (15, 10, 5)
F = 100
CF = 1.3

ICI_GBPS = 90.0      # effective all_to_all egress per chip (A4)
DCN_GBPS = 3.0       # per-chip share of host DCN egress (A5)


def exchange_bytes(P, *, feat_bytes=4):
    """Per-device per-step all_to_all buffer bytes, split by phase.
    Mirrors bench_scaling.partitioned_accounting but keeps the split and a
    configurable feature dtype."""
    L = B_PER_DEV
    req = resp = 0
    tree = L
    for k in FANOUTS:
        C = max(1, min(int(np.ceil(CF * L / P)), L))
        req += P * C * 3 * 4
        resp += P * C * 4 * k * 4
        L *= k
        tree += L
    Ch = max(1, min(int(np.ceil(CF * tree / P)), tree))
    halo_req = P * Ch * 4
    halo_resp = P * Ch * F * feat_bytes
    return {"sampling": req + resp, "halo_req": halo_req,
            "halo_resp": halo_resp,
            "total": req + resp + halo_req + halo_resp}


def project(P, *, feat_bytes=4, dcn_fraction=0.0):
    eb = exchange_bytes(P, feat_bytes=feat_bytes)
    offchip = eb["total"] * (P - 1) / P
    ici_bytes = offchip * (1 - dcn_fraction)
    dcn_bytes = offchip * dcn_fraction
    t_comm_ms = (ici_bytes / (ICI_GBPS * 1e9)
                 + dcn_bytes / (DCN_GBPS * 1e9)) * 1e3
    t_step = T_COMPUTE_MS + t_comm_ms
    return {"P": P, "mb_per_dev": eb["total"] / 1e6,
            "t_comm_ms": t_comm_ms, "t_step_ms": t_step,
            "eff": T_COMPUTE_MS / t_step}


N_PRODUCTS = 2_449_029     # nodes (synthetic ogbn-products config)
MODEL_BYTES = 0.83e6       # 3-layer SAGE h=256 F=100 params, f32


def project_hier(P, num_slices, *, feat_bytes=4):
    """Hierarchical multislice plan (round 5, ``hier=`` trainers):
    topology slice-replicated -> every sampling/feature EXCHANGE rides ICI
    with C = P/S owners; DCN carries only (a) one static all_gather of the
    device's own feature shard over the slice axis ((S-1) * ceil(N/P) * F
    rows — NOT per-request rows) and (b) the gradient all-reduce's
    inter-slice fraction.  Exchange formulas are the same static shape
    constants as the flat plan (tests/test_scaling_accounting.py family);
    bit-identity of the hier plan vs flat is pinned on the virtual 2x4
    mesh (tests/test_hier_partitioned.py)."""
    # measured plan cost (scripts/bench_hier_p1.py, v5e, products
    # scale, steady-state trial): flat P=1 18.9 ms vs hier (1,1) 19.1 ms
    # -> the hier plan's on-device overhead is +0.2 ms (1.012x); the
    # T_COMPUTE_MS basis therefore applies to the hier rows unchanged.
    S = num_slices
    C = P // S
    eb = exchange_bytes(C, feat_bytes=feat_bytes)   # per-device, C owners
    ici_bytes = eb["total"] * (C - 1) / C
    Np = -(-N_PRODUCTS // P)
    dcn_allgather = (S - 1) * Np * F * feat_bytes
    dcn_grads = 2 * MODEL_BYTES * (S - 1) / S       # ring all-reduce share
    dcn_bytes = dcn_allgather + dcn_grads
    t_comm_ms = (ici_bytes / (ICI_GBPS * 1e9)
                 + dcn_bytes / (DCN_GBPS * 1e9)) * 1e3
    t_step = T_COMPUTE_MS + t_comm_ms
    return {"P": P, "S": S, "ici_mb": ici_bytes / 1e6,
            "dcn_mb": dcn_bytes / 1e6, "t_comm_ms": t_comm_ms,
            "t_step_ms": t_step, "eff": T_COMPUTE_MS / t_step}


def main():
    print(f"compute (measured P=1 device time): {T_COMPUTE_MS} ms/step, "
          f"B/dev={B_PER_DEV}, fanouts {FANOUTS}, F={F}")
    for feat_bytes, tag in ((4, "f32 exchange"), (2, "bf16 exchange")):
        print(f"\n--- {tag} ---")
        print(f"{'P':>4} {'a2a MB/dev':>11} {'t_comm ms':>10} "
              f"{'t_step ms':>10} {'efficiency':>10}")
        for P in (4, 8, 16, 64, 256):
            r = project(P, feat_bytes=feat_bytes)
            print(f"{r['P']:>4} {r['mb_per_dev']:>11.1f} "
                  f"{r['t_comm_ms']:>10.2f} {r['t_step_ms']:>10.1f} "
                  f"{r['eff']*100:>9.1f}%")
        # multislice, FLAT plan: 2 slices of P/2, half the peer pairs
        # cross DCN — the round-4 efficiency collapse, kept as contrast
        r = project(512, feat_bytes=feat_bytes, dcn_fraction=0.5)
        print(f" 512 (2 slices, FLAT plan: per-request rows over DCN) "
              f"t_comm {r['t_comm_ms']:.1f} ms -> eff {r['eff']*100:.0f}%")
        # multislice, HIERARCHICAL plan (hier= trainers)
        for P, S in ((512, 2), (1024, 4)):
            h = project_hier(P, S, feat_bytes=feat_bytes)
            print(f"{P:>5} ({S} slices, HIER plan: slice-replicated "
                  f"topology + shard all_gather)\n"
                  f"      ICI {h['ici_mb']:.0f} MB/dev, DCN "
                  f"{h['dcn_mb']:.2f} MB/dev "
                  f"((S-1)*ceil(N/P)*F*{feat_bytes}B = "
                  f"{(S-1)*-(-N_PRODUCTS//P)*F*feat_bytes/1e6:.2f} MB "
                  f"all_gather + {2*MODEL_BYTES*(S-1)/S/1e6:.2f} MB grads) "
                  f"-> t_comm {h['t_comm_ms']:.1f} ms, eff "
                  f"{h['eff']*100:.0f}%")


if __name__ == "__main__":
    main()
