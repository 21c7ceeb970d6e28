"""Golden seed-matched NumPy mirrors for EVERY remaining sampler family.

VERDICT round-1 item 5: test_golden.py covered floyd + uniform neighbor
sampling only.  Here each device program — weighted neighbor sampling,
node2vec / temporal / CTDNE walks, budget sampling, HGT sampling, negative
sampling — is re-implemented in plain NumPy *consuming the SAME
counter-based jax.random draws*, and must reproduce the jitted program
bit-exactly.  This validates slot layouts, masking, state propagation and
key discipline independently of the lax.scan/jit machinery (the class of
test that caught layout bugs for the uniform sampler in round 1).

Only the random DRAWS come from jax.random (same key, shape, dtype as the
device code); all selection, masking, layout and state logic is NumPy.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tch_geometric_tpu.data import csc_graph_from_coo
from tch_geometric_tpu.data.storage import to_csc, to_csr
from tch_geometric_tpu.sampling import rng
from tch_geometric_tpu.utils.types import NAN_TIMESTAMP

NEG = -np.inf


def _topk_np(vals, k):
    """jax.lax.top_k mirror: k largest, ties -> lowest index first."""
    order = np.argsort(-vals, axis=-1, kind="stable")[..., :k]
    return np.take_along_axis(vals, order, axis=-1), order


def _csr(edge_index, n):
    rp, ci, _ = to_csr(np.asarray(edge_index), n)
    return np.asarray(rp), np.asarray(ci)


# ---------------------------------------------------------------------------
# weighted neighbor sampling (Gumbel top-k, ELL windowed-values engine)
# ---------------------------------------------------------------------------

def golden_weighted_neighbor(key, indptr, indices, logw, seeds, fanouts,
                             max_degree):
    E = indices.shape[0]
    Pw = max_degree
    nodes = [np.asarray(seeds, np.int64)]
    valid = [np.ones(len(seeds), bool)]
    out_eptr, out_ev = [], []
    for ell, k in enumerate(fanouts):
        hop_key = rng.fold(key, ell)
        frontier, fvalid = nodes[ell], valid[ell]
        B = frontier.shape[0]
        fc = np.clip(frontier, 0, indptr.shape[0] - 2)
        starts = indptr[fc]
        deg = np.where(fvalid, indptr[fc + 1] - starts, 0)
        lane = np.arange(Pw)
        lane_ok = lane[None, :] < deg[:, None]
        logits = logw[np.minimum(starts[:, None] + lane[None, :], E - 1)]
        logits = np.where(lane_ok, logits, NEG)
        noise = np.asarray(jax.random.gumbel(hop_key, (B, Pw), jnp.float32))
        keys_ = np.where(np.isfinite(logits), logits + noise, NEG)
        vals, pos = _topk_np(keys_, k)
        v_ok = np.isfinite(vals)
        pos = np.where(v_ok, pos, 0)
        eptr = np.clip(starts[:, None] + pos, 0, E - 1)
        nbr = indices[eptr]
        nodes.append(nbr.reshape(-1))
        valid.append(v_ok.reshape(-1))
        out_eptr.append(eptr.reshape(-1))
        out_ev.append(v_ok.reshape(-1))
    return (np.concatenate(nodes), np.concatenate(valid),
            np.concatenate(out_eptr), np.concatenate(out_ev))


def test_golden_weighted_neighbor(karate):
    from tch_geometric_tpu.sampling.neighbor import sample_neighbors
    from tch_geometric_tpu.utils.config import WeightedEdgeSampler
    _x, _y, edge_index = karate
    graph = csc_graph_from_coo(edge_index, 34)
    E = int(np.asarray(graph.indices).shape[0])
    w = np.random.default_rng(0).uniform(0.1, 5.0, E).astype(np.float32)
    seeds = np.array([0, 1, 4, 5])
    key = jax.random.key(7)
    out = sample_neighbors(graph, seeds, [4, 3], key=key,
                           sampler=WeightedEdgeSampler(weights=w))
    logw = np.log(w)
    n_g, v_g, e_g, ev_g = golden_weighted_neighbor(
        key, np.asarray(graph.indptr), np.asarray(graph.indices), logw,
        seeds, [4, 3], graph.max_degree)
    np.testing.assert_array_equal(np.asarray(out.node_valid), v_g)
    np.testing.assert_array_equal(
        np.where(v_g, np.asarray(out.nodes), -1), np.where(v_g, n_g, -1))
    np.testing.assert_array_equal(np.asarray(out.edge_valid), ev_g)
    np.testing.assert_array_equal(np.asarray(out.eptr)[ev_g], e_g[ev_g])


# ---------------------------------------------------------------------------
# node2vec
# ---------------------------------------------------------------------------

def golden_node2vec(key, rp, ci, start, L, p, q, num_trials):
    B = len(start)
    inv_p, inv_q = 1.0 / np.float32(p), 1.0 / np.float32(q)
    mx = max(inv_p, np.float32(1.0), inv_q)
    prob0, prob1, prob2 = inv_p / mx, np.float32(1.0) / mx, inv_q / mx
    nbrs = [set(ci[rp[v]: rp[v + 1]].tolist()) for v in range(rp.shape[0] - 1)]
    prev = np.full(B, -1, np.int64)
    cur = np.asarray(start, np.int64).copy()
    active = np.ones(B, bool)
    walks = [cur.copy()]
    step_keys = jax.random.split(key, L)
    for skey in step_keys:
        curc = np.clip(cur, 0, rp.shape[0] - 2)
        deg = rp[curc + 1] - rp[curc]
        active = active & (deg > 0)
        chosen = np.full(B, -1, np.int64)
        accepted = np.zeros(B, bool)
        for t in range(num_trials):
            tkey = jax.random.fold_in(skey, t)
            pos = np.asarray(jax.random.randint(
                tkey, (B,), 0, jnp.asarray(np.maximum(deg, 1))))
            cand = ci[np.minimum(rp[curc] + pos, ci.shape[0] - 1)]
            is_tri = np.array([int(prev[i]) in nbrs[int(np.clip(cand[i], 0,
                               len(nbrs) - 1))] for i in range(B)])
            r = np.asarray(jax.random.uniform(jax.random.fold_in(tkey, 1),
                                              (B,)))
            is_back = cand == prev
            acc = np.where(is_back, r < prob0,
                           np.where(is_tri, r < prob1, r < prob2))
            take = ~accepted & acc
            if t == num_trials - 1:
                take = take | ~accepted
            chosen = np.where(take, cand, chosen)
            accepted = accepted | acc
        nxt = np.where(active, chosen, -1)
        prev, cur = np.where(active, cur, prev), np.where(active, nxt, cur)
        walks.append(nxt)
    return np.stack(walks, axis=1)


def test_golden_node2vec(karate):
    from tch_geometric_tpu.sampling.walks import random_walk
    _x, _y, edge_index = karate
    rp, ci = _csr(edge_index, 34)
    start = np.arange(8)
    key = jax.random.key(11)
    dev = random_walk(rp, ci, start, 10, p=2.0, q=0.5, key=key)
    gold = golden_node2vec(key, rp, ci, start, 10, 2.0, 0.5, 16)
    np.testing.assert_array_equal(dev, gold)


# ---------------------------------------------------------------------------
# temporal walk
# ---------------------------------------------------------------------------

def golden_tempo(key, rp, ci, node_ts, edge_ts, start, start_ts, L, win,
                 max_degree):
    B = len(start)
    E = ci.shape[0]
    ts_eff = np.where(edge_ts != NAN_TIMESTAMP, edge_ts, node_ts[ci])
    lo = start_ts + win[0]
    hi = start_ts + win[1]
    root_nan = start_ts == NAN_TIMESTAMP
    Pw = max(max_degree, 1)
    r_node, r_ts = np.asarray(start).copy(), np.asarray(start_ts).copy()
    cur = np.asarray(start).copy()
    walks, tss = [cur.copy()], [np.asarray(start_ts).copy()]
    step_keys = jax.random.split(key, L - 1)
    for l, skey in enumerate(step_keys):
        curc = np.clip(cur, 0, rp.shape[0] - 2)
        starts = rp[curc]
        deg = rp[curc + 1] - starts
        lane = np.arange(Pw)
        t = ts_eff[np.minimum(starts[:, None] + lane[None, :], E - 1)]
        in_win = (t >= lo[:, None]) & (t < hi[:, None])
        adm = (lane[None, :] < deg[:, None]) & (
            (t == NAN_TIMESTAMP) | root_nan[:, None] | in_win)
        noise = np.asarray(jax.random.gumbel(skey, (B, Pw), jnp.float32))
        keysv = np.where(adm, noise, NEG)
        pos1 = np.argmax(keysv, axis=-1)
        ok = np.isfinite(np.max(keysv, axis=-1))
        nxt = ci[np.minimum(starts + pos1, E - 1)]
        nxt_ts = t[np.arange(B), pos1]
        nxt = np.where(ok, nxt, r_node)
        nxt_ts = np.where(ok, nxt_ts, r_ts)
        take = np.asarray(jax.random.uniform(
            jax.random.fold_in(skey, 7), (B,))) < 1.0 / np.float32(l + 2)
        r_node = np.where(take, nxt, r_node)
        r_ts = np.where(take, nxt_ts, r_ts)
        cur = nxt
        walks.append(nxt)
        tss.append(nxt_ts)
    return np.stack(walks, 1), np.stack(tss, 1)


def test_golden_tempo(karate):
    from tch_geometric_tpu.sampling.walks import tempo_random_walk
    _x, _y, edge_index = karate
    rp, ci = _csr(edge_index, 34)
    rr = np.random.default_rng(3)
    node_ts = rr.integers(0, 100, 34)
    edge_ts = rr.integers(0, 100, ci.shape[0])
    edge_ts[rr.random(ci.shape[0]) < 0.2] = NAN_TIMESTAMP
    start = np.arange(8)
    start_ts = np.zeros(8, np.int64)
    key = jax.random.key(13)
    dev_w, dev_t = tempo_random_walk(rp, ci, node_ts, edge_ts, start,
                                     start_ts, 8, (0, 60), key=key)
    md = int((rp[1:] - rp[:-1]).max())
    g_w, g_t = golden_tempo(key, rp, ci, node_ts.astype(np.int32),
                            edge_ts.astype(np.int32), start,
                            start_ts.astype(np.int32), 8, (0, 60), md)
    np.testing.assert_array_equal(dev_w, g_w)
    np.testing.assert_array_equal(dev_t, g_t)


# ---------------------------------------------------------------------------
# CTDNE
# ---------------------------------------------------------------------------

def golden_ctdne(key, rp, ci, node_ts, edge_ts, start, start_ts, L, bias,
                 forward, retry, max_degree):
    B = len(start)
    E = ci.shape[0]
    D = max(max_degree, 1)
    ts_eff = np.where(edge_ts != NAN_TIMESTAMP, edge_ts, node_ts[ci])

    def attempt(akey):
        cur = np.asarray(start).copy()
        cur_ts = np.asarray(start_ts).copy()
        alive = np.ones(B, bool)
        steps, steps_ts = [], []
        for skey in jax.random.split(akey, L - 1):
            curc = np.clip(cur, 0, rp.shape[0] - 2)
            starts = rp[curc]
            deg = rp[curc + 1] - starts
            pos = np.arange(D)[None, :]
            t = ts_eff[np.minimum(starts[:, None] + pos, E - 1)]
            in_deg = pos < deg[:, None]
            adm = ((t == NAN_TIMESTAMP) | (cur_ts[:, None] == NAN_TIMESTAMP)
                   | (cur_ts[:, None] <= t)) & in_deg
            wt = np.where(t == NAN_TIMESTAMP, cur_ts[:, None], t)
            if bias == "exponential":
                delta = np.where(forward, cur_ts[:, None] - wt,
                                 wt - cur_ts[:, None])
                logw = delta.astype(np.float32)
            elif bias == "linear":
                key_t = np.where(adm, wt, np.iinfo(np.int32).max)
                order = np.argsort(key_t, axis=1, kind="stable")
                rank = np.argsort(order, axis=1, kind="stable")
                n_adm = adm.sum(axis=1, keepdims=True)
                logw = np.log(np.maximum(n_adm - rank, 1).astype(np.float32))
            else:
                logw = np.zeros((B, D), np.float32)
            logw = np.where(cur_ts[:, None] == NAN_TIMESTAMP, 0.0, logw)
            logw = np.where(adm, logw, NEG)
            g = np.asarray(jax.random.gumbel(skey, (B, D), jnp.float32))
            score = np.where(adm, logw + g, NEG)
            best = np.argmax(score, axis=1)
            ok = np.any(adm, axis=1) & alive
            nxt = ci[np.minimum(starts + best, E - 1)]
            nxt_ts = t[np.arange(B), best]
            cur = np.where(ok, nxt, cur)
            cur_ts = np.where(ok & (nxt_ts != NAN_TIMESTAMP), nxt_ts, cur_ts)
            alive = ok
            steps.append(np.where(ok, nxt, -1))
            steps_ts.append(np.where(ok, nxt_ts, -1))
        w = np.stack([np.asarray(start)] + steps, 1)
        t_ = np.stack([np.asarray(start_ts)] + steps_ts, 1)
        return w, t_, alive

    walks = np.full((B, L), -1, np.int64)
    tsb = np.full((B, L), -1, np.int64)
    done = np.zeros(B, bool)
    i = 0
    while i < max(retry, 1) and not done.all():
        w, t_, ok = attempt(jax.random.fold_in(key, i))
        take = ~done
        walks[take] = w[take]
        tsb[take] = t_[take]
        done |= ok
        i += 1
    return walks, tsb


@pytest.mark.parametrize("bias", ["uniform", "linear", "exponential"])
def test_golden_ctdne(karate, bias):
    from tch_geometric_tpu.sampling.walks import biased_tempo_random_walk
    _x, _y, edge_index = karate
    rp, ci = _csr(edge_index, 34)
    rr = np.random.default_rng(5)
    node_ts = rr.integers(0, 1000, 34)
    edge_ts = rr.integers(0, 1000, ci.shape[0])
    start = np.arange(8)
    start_ts = np.zeros(8, np.int64)
    key = jax.random.key(17)
    dev_w, dev_t = biased_tempo_random_walk(
        rp, ci, node_ts, edge_ts, start, start_ts, 6, bias, True, 3, key=key)
    md = int((rp[1:] - rp[:-1]).max())
    g_w, g_t = golden_ctdne(key, rp, ci, node_ts.astype(np.int32),
                            edge_ts.astype(np.int32), start,
                            start_ts.astype(np.int32), 6, bias, True, 3, md)
    np.testing.assert_array_equal(dev_w, g_w)
    np.testing.assert_array_equal(dev_t, g_t)


# ---------------------------------------------------------------------------
# budget sampling (homogeneous single-relation instance)
# ---------------------------------------------------------------------------

def golden_budget(key, cp, ri, seeds, fanouts, num_hops, ell_lanes):
    """Mirror of _budget_sampling_impl for 1 type / 1 rel (ri=0, ti=0)."""
    E = ri.shape[0]
    M = 50
    nodes = [np.asarray(seeds, np.int64)]
    valid = [np.ones(len(seeds), bool)]
    out_e, out_ev = [], []
    for ell in range(num_hops):
        k = fanouts[ell]
        frontier, fvalid = nodes[ell], valid[ell]
        B = frontier.shape[0]
        fc = np.clip(frontier, 0, cp.shape[0] - 2)
        starts = cp[fc]
        deg = np.where(fvalid, cp[fc + 1] - starts, 0)
        # fill: uniform_lane_topk(fold(key, ell, 0), deg, L, 50)
        fkey = rng.fold(key, ell, 0)
        r = np.asarray(jax.random.uniform(fkey, (B, ell_lanes), jnp.float32))
        vals = np.where(np.arange(ell_lanes)[None, :] < deg[:, None], r, NEG)
        tv, pos = _topk_np(vals, M)
        pvalid = np.isfinite(tv)
        pos = np.where(pvalid, pos, 0)
        cand_e = starts[:, None] + pos
        cand_v = ri[np.minimum(np.maximum(cand_e, 0), E - 1)]
        # select: masked_gumbel_topk(fold(key, ell, 1000), logits, k)
        skey = rng.fold(key, ell, 1000)
        logits = np.where(pvalid, 0.0, NEG)
        noise = np.asarray(jax.random.gumbel(skey, (B, M), jnp.float32))
        keys_ = np.where(np.isfinite(logits), logits + noise, NEG)
        sv, sel = _topk_np(keys_, k)
        s_ok = np.isfinite(sv)
        sel = np.where(s_ok, sel, 0)
        sel_v = np.take_along_axis(cand_v, sel, axis=1)
        sel_e = np.take_along_axis(cand_e, sel, axis=1)
        nodes.append(sel_v.reshape(-1))
        valid.append(s_ok.reshape(-1))
        out_e.append(np.where(s_ok, sel_e, 0).reshape(-1))
        out_ev.append(s_ok.reshape(-1))
    return (np.concatenate(nodes), np.concatenate(valid),
            np.concatenate(out_e), np.concatenate(out_ev))


def test_golden_budget(karate):
    from tch_geometric_tpu.data.graph import ell_width_for
    from tch_geometric_tpu.sampling.budget import sample_budget
    from tch_geometric_tpu.data.graph import make_graph
    _x, _y, edge_index = karate
    cp, ri, _ = to_csc(np.asarray(edge_index), 34)
    cp, ri = np.asarray(cp), np.asarray(ri)
    g = make_graph(cp, ri, num_src=34, num_dst=34)
    key = jax.random.key(19)
    seeds = np.arange(8, dtype=np.int64)
    out = sample_budget({"v__r__v": g}, [("v", "r", "v")],
                        {"v": seeds}, {"v": [4, 3]}, 2, key=key)
    md = int((cp[1:] - cp[:-1]).max())
    lanes = ell_width_for(md) - 2
    n_g, v_g, e_g, ev_g = golden_budget(key, cp, ri, seeds, [4, 3], 2, lanes)
    np.testing.assert_array_equal(np.asarray(out.node_valid["v"]), v_g)
    np.testing.assert_array_equal(
        np.where(v_g, np.asarray(out.nodes["v"]), -1), np.where(v_g, n_g, -1))
    np.testing.assert_array_equal(np.asarray(out.edge_valid["v__r__v"]), ev_g)
    np.testing.assert_array_equal(
        np.asarray(out.eptr["v__r__v"])[ev_g], e_g[ev_g])


# ---------------------------------------------------------------------------
# HGT sampling (homogeneous single-relation instance)
# ---------------------------------------------------------------------------

def golden_hgt(key, cp, ri, seeds, num_samples, num_hops, ell_lanes, N):
    E = ri.shape[0]
    M = 50
    score = np.zeros(N, np.float32)
    in_sample = np.zeros(N, bool)
    local_id = np.zeros(N, np.int32)
    caps = [len(seeds)] + [num_samples[l] for l in range(num_hops)]
    base = np.cumsum([0] + caps).tolist()
    C = base[-1]
    nodes = np.zeros(C, np.int64)
    nvalid = np.zeros(C, bool)
    nodes[: len(seeds)] = seeds
    nvalid[: len(seeds)] = True
    in_sample[seeds] = True
    local_id[seeds] = np.arange(len(seeds))

    def subset(fkey, w, wv):
        B = w.shape[0]
        wc = np.clip(w, 0, cp.shape[0] - 2)
        starts = cp[wc]
        deg = np.where(wv, cp[wc + 1] - starts, 0)
        r = np.asarray(jax.random.uniform(fkey, (B, ell_lanes), jnp.float32))
        vals = np.where(np.arange(ell_lanes)[None, :] < deg[:, None], r, NEG)
        tv, pos = _topk_np(vals, M)
        pvalid = np.isfinite(tv)
        pos = np.where(pvalid, pos, 0)
        eptr = np.clip(starts[:, None] + pos, 0, E - 1)
        return deg, pvalid, eptr, ri[eptr]

    def update(ukey, w, wv):
        deg, pvalid, _e, v = subset(rng.fold(ukey, 0), w, wv)
        ncount = np.minimum(deg, M)
        inv = np.where(ncount > 0, 1.0 / np.maximum(ncount, 1), 0.0
                       ).astype(np.float32)
        ok = pvalid & ~in_sample[v]
        contrib = np.where(ok, inv[:, None], 0.0).astype(np.float32)
        np.add.at(score, v, contrib)

    update(rng.fold(key, 0), np.asarray(seeds), np.ones(len(seeds), bool))
    for layer in range(num_hops):
        n = num_samples[layer]
        logits = np.where(score > 0, 2.0 * np.log(np.maximum(score, 1e-30)),
                          NEG).astype(np.float32)
        noise = np.asarray(jax.random.gumbel(
            rng.fold(key, 1, layer, 0), (N,), jnp.float32))
        keys_ = np.where(np.isfinite(logits), logits + noise, NEG)
        tv, idx = _topk_np(keys_, n)
        valid = np.isfinite(tv)
        chosen = np.where(valid, idx, 0)
        slot = base[layer + 1] + np.arange(n)
        nodes[slot] = chosen
        nvalid[slot] = valid
        cm = np.where(valid, chosen, N - 1)
        score[cm[valid]] = 0.0
        in_sample[cm[valid]] = True
        local_id[cm[valid]] = slot[valid]
        if layer < num_hops - 1:
            update(rng.fold(key, 2, layer),
                   np.where(valid, chosen, 0), valid)

    # induced adjacency
    _deg, pvalid, eptr, v = subset(rng.fold(rng.fold(key, 3), 0),
                                   nodes, nvalid)
    keep = pvalid & in_sample[v]
    rows = np.where(keep, local_id[v], 0).reshape(-1)
    return nodes, nvalid, rows, eptr.reshape(-1), keep.reshape(-1)


def test_golden_hgt(karate):
    from tch_geometric_tpu.data.graph import ell_width_for, make_graph
    from tch_geometric_tpu.sampling.hgt import sample_hgt
    _x, _y, edge_index = karate
    cp, ri, _ = to_csc(np.asarray(edge_index), 34)
    cp, ri = np.asarray(cp), np.asarray(ri)
    g = make_graph(cp, ri, num_src=34, num_dst=34)
    key = jax.random.key(23)
    seeds = np.arange(6, dtype=np.int64)
    out = sample_hgt({"v__r__v": g}, [("v", "r", "v")], {"v": seeds},
                     {"v": [8, 8]}, 2, node_counts={"v": 34}, key=key)
    md = int((cp[1:] - cp[:-1]).max())
    lanes = ell_width_for(md) - 2
    n_g, v_g, r_g, e_g, k_g = golden_hgt(key, cp, ri, seeds, [8, 8], 2,
                                         lanes, 34)
    np.testing.assert_array_equal(np.asarray(out.node_valid["v"]), v_g)
    np.testing.assert_array_equal(
        np.where(v_g, np.asarray(out.nodes["v"]), -1), np.where(v_g, n_g, -1))
    ev = np.asarray(out.edge_valid["v__r__v"])
    np.testing.assert_array_equal(ev, k_g)
    np.testing.assert_array_equal(np.asarray(out.rows["v__r__v"])[ev],
                                  r_g[ev])
    np.testing.assert_array_equal(np.asarray(out.eptr["v__r__v"])[ev],
                                  e_g[ev])


# ---------------------------------------------------------------------------
# negative sampling
# ---------------------------------------------------------------------------

def golden_negative(key, rp, ci, N, inputs, num_neg, try_count):
    B = len(inputs)
    cand = np.asarray(jax.random.randint(
        key, (B, num_neg, try_count), 0, N, dtype=jnp.int32))
    nbrs = [set(ci[rp[v]: rp[v + 1]].tolist()) for v in range(rp.shape[0] - 1)]
    v = np.asarray(inputs)
    exists = np.zeros_like(cand, bool)
    for i in range(B):
        row = nbrs[int(v[i])]
        exists[i] = np.isin(cand[i], list(row)).reshape(num_neg, try_count)
    ok = ~exists & (cand != v[:, None, None])
    first = np.argmax(ok, axis=-1)
    accepted = ok.any(-1)
    w = np.take_along_axis(cand, first[..., None], -1)[..., 0]
    return w, accepted


def test_golden_negative(karate):
    from tch_geometric_tpu.sampling.negative import (
        negative_sample_neighbors_homogenous)
    _x, _y, edge_index = karate
    rp, ci = _csr(edge_index, 34)
    inputs = np.arange(8)
    key = jax.random.key(29)
    samples, rows, cols, cnt = negative_sample_neighbors_homogenous(
        rp, ci, (34, 34), inputs, 5, 20, key=key)
    w_g, acc_g = golden_negative(key, rp, ci, 34, inputs, 5, 20)
    # reproduce the host dedup and compare the full output
    s2 = list(inputs.astype(np.int64))
    mp = {int(s): i for i, s in enumerate(inputs)}
    r2, c2 = [], []
    for i in range(8):
        for n in range(5):
            if not acc_g[i, n]:
                continue
            ww = int(w_g[i, n])
            j = mp.setdefault(ww, len(s2))
            if j == len(s2):
                s2.append(ww)
            r2.append(i)
            c2.append(j)
    assert cnt == 8
    np.testing.assert_array_equal(samples, np.asarray(s2))
    np.testing.assert_array_equal(rows, np.asarray(r2))
    np.testing.assert_array_equal(cols, np.asarray(c2))
