"""Checkpoint/resume + metrics (SURVEY §5 aux subsystems).

The reference has neither (stateless library, errors-only observability);
these pin our replacements: orbax round-trip of a full TrainState (params +
optimizer + step), resume-equivalence of the optimization trajectory, and
the JSON-lines metrics schema.
"""
import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tch_geometric_tpu.data.io import load_karate_graph
from tch_geometric_tpu.data import csc_graph_from_coo
from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel import make_sage_trainer
from tch_geometric_tpu.utils.checkpoint import (latest_step,
                                                restore_checkpoint,
                                                save_checkpoint)
from tch_geometric_tpu.utils.metrics import MetricsLogger, trace_span


@pytest.fixture(scope="module")
def setup():
    x, y, edge_index = load_karate_graph()
    graph = csc_graph_from_coo(edge_index, 34)
    x = jnp.asarray(x)
    labels = jnp.asarray(y)
    model = GraphSAGE(hidden=16, out=int(y.max()) + 1, num_layers=2)
    trainer = make_sage_trainer(model, [4, 3], learning_rate=1e-2)
    return graph, x, labels, trainer


def test_checkpoint_roundtrip_and_resume(tmp_path, setup):
    """Restoring at step k and continuing must reproduce the uninterrupted
    trajectory exactly (same counter-based keys -> same samples)."""
    graph, x, labels, (init_fn, train_step, eval_step) = setup
    key = jax.random.key(0)
    seeds = jnp.arange(8, dtype=jnp.int32)
    state = init_fn(key, graph, x, seeds)

    # uninterrupted: 4 steps
    s_full = state
    for _ in range(4):
        s_full, loss, _ = train_step(s_full, key, graph, x, seeds,
                                     labels[seeds])

    # interrupted: 2 steps -> checkpoint -> restore -> 2 more
    s_half = state
    for _ in range(2):
        s_half, _, _ = train_step(s_half, key, graph, x, seeds, labels[seeds])
    ckpt = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(ckpt, s_half, step=2)
    assert latest_step(ckpt) == 2
    restored = restore_checkpoint(ckpt, s_half, step=2)
    assert int(restored.step) == 2
    for _ in range(2):
        restored, _, _ = train_step(restored, key, graph, x, seeds,
                                    labels[seeds])

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-6),
        s_full.params, restored.params)
    assert int(restored.step) == int(s_full.step) == 4


def test_latest_step_empty(tmp_path):
    assert latest_step(str(tmp_path / "nope")) is None


def test_metrics_jsonl_schema():
    import time
    buf = io.StringIO()
    m = MetricsLogger(stream=buf)
    m.step(0, loss=1.5)
    time.sleep(0.05)  # keep dt large vs the 1e-6 s rounding of step_time_s
    m.step(1, edges=1000, batch_size=32, loss=1.2, acc=0.5)
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert lines[0] == {"step": 0, "loss": 1.5}
    rec = lines[1]
    assert rec["step"] == 1 and rec["loss"] == 1.2 and rec["acc"] == 0.5
    assert rec["step_time_s"] > 0
    assert rec["edges_per_s"] == pytest.approx(1000 / rec["step_time_s"],
                                               rel=1e-3)
    assert rec["batches_per_s"] == pytest.approx(1 / rec["step_time_s"],
                                                 rel=1e-3)


def test_trace_span_runs():
    with trace_span("unit-test-span"):
        jnp.zeros((4,)).block_until_ready()
