"""Device scan kernels (pure jnp/XLA path — runs on any backend).

The hot loop of the reference (`ac_trie_search`,
``src/multifast/ahocorasick.c:199-234``) is a sequential byte-at-a-time walk
with failure-link chasing.  Here the automaton is a precomposed dense table,
so one input byte costs exactly one gather:

    ``state[t+1] = table[state[t] * C + byte_class[byte[t]]]``

The sequential dependency is over ``L`` (row length); throughput comes from
the batch dimension ``B`` (many haystacks and/or halo-overlapped chunks of
long haystacks scanned in lockstep) — the TPU-native analog of the
reference's "one automaton, many haystacks" amortization pattern.

Match output is compacted **on device**: finality is a single compare
(``state >= final_start``, see tables.py renumbering), matched positions are
extracted with a fixed-capacity ``nonzero`` (count-then-gather; the caller
retries with doubled capacity on overflow, so results are exact, never
silently truncated).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max


@functools.partial(jax.jit, static_argnames=("n_classes",))
def scan_states(
    table_flat: jax.Array,  # [S*C] int16/int32
    byte_class: jax.Array,  # [256] int32
    chunks: jax.Array,  # [B, L] uint8
    init_state: jax.Array,  # [B] int32
    n_classes: int,
) -> Tuple[jax.Array, jax.Array]:
    """Run the DFA over each row. Returns (states [B, L] int32, final [B])."""
    cls = jnp.take(byte_class, chunks.astype(jnp.int32), axis=0)  # [B, L]

    def step(state, cls_t):
        ns = jnp.take(table_flat, state * n_classes + cls_t).astype(jnp.int32)
        return ns, ns

    last, states = jax.lax.scan(step, init_state, cls.T)  # states: [L, B]
    return states.T, last


@functools.partial(
    jax.jit, static_argnames=("n_classes", "capacity")
)
def scan_and_compact(
    table_flat: jax.Array,
    byte_class: jax.Array,
    chunks: jax.Array,  # [B, L] uint8
    init_state: jax.Array,  # [B] int32
    lengths: jax.Array,  # [B] int32 valid byte count per row
    emit_from: jax.Array,  # [B] int32 first in-row position allowed to emit
    final_start: jax.Array,  # scalar int32
    n_classes: int,
    capacity: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Scan + device-side match compaction.

    Returns ``(match_idx [capacity], match_state [capacity], n_matches,
    carry_state [B])``.  ``match_idx`` holds flattened ``b * L + t`` indices
    of final positions in ascending order (i.e. reference scan order within
    each row), padded with INT32_MAX.  ``n_matches`` is the *true* number of
    final positions; if it exceeds ``capacity`` the caller must retry.

    ``emit_from`` masks halo positions: for a chunk row carrying a left halo
    of overlap bytes, positions before ``emit_from`` are owned by the
    neighboring chunk (or already reported by a previous streaming feed) and
    must not emit here.
    """
    B, L = chunks.shape
    states, carry = scan_states(table_flat, byte_class, chunks, init_state, n_classes)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    final = (
        (states >= final_start)
        & (t_idx >= emit_from[:, None])
        & (t_idx < lengths[:, None])
    )
    flat = final.reshape(-1)
    n_matches = flat.sum(dtype=jnp.int32)
    (idx,) = jnp.nonzero(flat, size=capacity, fill_value=INT32_MAX)
    idx = idx.astype(jnp.int32)
    safe = jnp.minimum(idx, B * L - 1)
    match_state = jnp.where(
        idx < INT32_MAX, jnp.take(states.reshape(-1), safe), -1
    )
    return idx, match_state, n_matches, carry
