"""Counter-based RNG key discipline.

Replaces the reference's global ``Mutex<RefCell<SmallRng>>`` fork-per-call
(/root/reference/src/utils/random.rs:8-23) — whose draws depend on call order
and whose reseed hook is not even exposed to Python (SURVEY §7.4) — with
stateless ``jax.random`` keys derived by folding structured coordinates
(epoch, batch, hop, op) into a root key.  Draws are therefore reproducible
regardless of device count, batch partitioning, or evaluation order.
"""
from __future__ import annotations

import threading

import jax
import jax.numpy as jnp

_state = threading.local()


def seed(value: int = 0) -> jax.Array:
    """Set the process-level root key (the first-class seeding API the
    reference declares but never exposes, random.rs:14-17)."""
    _state.key = jax.random.key(value)
    return _state.key


def root_key() -> jax.Array:
    if not hasattr(_state, "key"):
        seed(0)
    return _state.key


def next_key() -> jax.Array:
    """Split one key off the process root (for non-jit convenience paths)."""
    key = root_key()
    _state.key, out = jax.random.split(key)
    return out


# Samplers fold SMALL structural coordinates (hop index, batch offset) into
# their keys, so auxiliary random consumers sharing the same base key must
# fold a LARGE tag first to land in a disjoint key subspace — e.g. dropout
# with fold(key, 1) would be bit-identical to hop 1's sampling key and its
# masks would correlate with the neighbor draws (measured: stalls training).
DROPOUT_STREAM = 0x64726F70  # "drop"


def fold(key: jax.Array, *coords: int) -> jax.Array:
    """Derive a subkey from structured coordinates.

    ``fold(key, epoch, batch, hop)`` is the device-count-independent
    replacement for the reference's sequential SmallRng forks.
    """
    for c in coords:
        key = jax.random.fold_in(key, jnp.asarray(c, dtype=jnp.uint32))
    return key
