"""Weak-scaling accounting invariants (VERDICT item 7).

The >=70% N-host efficiency target cannot be measured on this host (the
8-device mesh oversubscribes 2 vCPUs), so the suite pins the ALGORITHMIC
requirement instead: the partitioned train step's per-device all_to_all
bytes, owner-side sample slots, and tree nodes are flat in P — exact
static quantities of the compiled program (capacity paddings are shape
constants), computed by scripts/bench_scaling.py's accounting.
"""
import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "bench_scaling", os.path.join(REPO, "scripts", "bench_scaling.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_per_device_quantities_flat_in_P():
    mod = _load()
    # P=1 is degenerate (capacity clamps to L: no padding, no exchange), so
    # the multi-device baseline is P=2
    base = mod.partitioned_accounting(2)
    for n in (4, 8):
        r = mod.partitioned_accounting(n)
        # model work exactly flat; comm/owner slots flat up to ceiling slack
        assert r["tree_nodes_per_dev"] == base["tree_nodes_per_dev"]
        assert r["a2a_bytes_per_dev"] <= base["a2a_bytes_per_dev"] * 1.10
        assert r["owner_slots_per_dev"] <= base["owner_slots_per_dev"] * 1.10
    # at production per-device batches the ceiling slack vanishes even at
    # pod scale (the only growth term is ceil() rounding of C)
    base = mod.partitioned_accounting(2, b_per_dev=512)
    for n in (16, 64, 256):
        r = mod.partitioned_accounting(n, b_per_dev=512)
        assert r["tree_nodes_per_dev"] == base["tree_nodes_per_dev"]
        assert r["a2a_bytes_per_dev"] <= base["a2a_bytes_per_dev"] * 1.02
        assert r["owner_slots_per_dev"] <= base["owner_slots_per_dev"] * 1.02


def test_comm_volume_scales_with_frontier_not_graph():
    """Comm per hop is O(frontier), independent of graph size: doubling
    fanouts doubles response bytes, per-device bytes never depend on N."""
    mod = _load()
    a = mod.partitioned_accounting(4, fanouts=(10, 5))
    b = mod.partitioned_accounting(4, fanouts=(20, 10))
    assert b["a2a_bytes_per_dev"] > 1.8 * a["a2a_bytes_per_dev"]
