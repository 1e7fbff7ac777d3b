"""Pallas VMEM-tile DFA scan — full-speed path for SMALL automata.

Mosaic's lane-local ``take_along_axis`` ([8,128] tiles) is the only fast
gather on v5e.  When the whole transition table fits in a handful of
128-lane banks (``S * C <= ~4096`` entries — dozens of patterns), the DFA
step becomes a pure-VPU gather+select chain and the scan runs 1024
parallel streams per kernel instance at vector speed — no scalar-gather
unit involvement at all.

Layout:

* table: ``[n_banks, 128]`` int32 banks of the flattened ``[S*C]`` table;
* streams: 1024 per block — lane (i, j) of the tile owns one chunk row;
* classes: precomputed outside (compare-select), shipped ``[L, 8, 128]``
  so each timestep reads one contiguous [8,128] tile;
* output: the state per (stream, t) as int16/int32, compacted by the
  caller with the standard XLA final-mask + nonzero machinery.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STREAMS = 1024  # 8 sublanes x 128 lanes
SUB = 8


def _kernel(n_banks: int, n_classes: int, table_ref, cls_ref, init_ref,
            out_ref, carry_ref):
    """One (stream-block, time-block) grid step.  The time axis is
    blocked so VMEM holds only ``Lb`` timesteps of classes/states per
    step (a full 4 KiB row would need ~34 MB); the running state lives
    in a scratch buffer that persists across the sequentially-iterated
    time blocks (innermost grid dim)."""
    lb = pl.program_id(1)

    @pl.when(lb == 0)
    def _():
        carry_ref[...] = init_ref[0].astype(jnp.int32)

    def step(t, state):
        c = cls_ref[0, t].astype(jnp.int32)  # [8, 128]
        idx = state * n_classes + c
        lane = idx & 127
        bank = idx >> 7
        nxt = jnp.zeros((SUB, 128), jnp.int32)
        for b in range(n_banks):
            tab8 = jnp.broadcast_to(table_ref[b][None, :], (SUB, 128))
            g = jnp.take_along_axis(tab8, lane, axis=1)
            nxt = jnp.where(bank == b, g, nxt)
        out_ref[0, t] = nxt
        return nxt

    Lb = cls_ref.shape[1]
    carry_ref[...] = jax.lax.fori_loop(0, Lb, step, carry_ref[...])


@functools.partial(
    jax.jit, static_argnames=("n_classes", "interpret")
)
def scan_states_tile(
    table_flat: jax.Array,  # [S*C] int16/int32, S*C <= n_banks*128
    byte_class: jax.Array,  # [256] int32
    used_bytes: jax.Array,  # [U] uint8
    chunks: jax.Array,  # [B, L] uint8
    init_state: jax.Array,  # [B] int32
    n_classes: int,
    lengths=None,  # [B] int32; None treats every row as full
    interpret: bool = False,
):
    """Tile-engine DFA scan. Returns (states [B, L] int32, carry [B]).

    ``carry[b]`` is the state after the last *valid* byte
    (``states[b, lengths[b]-1]``; ``init_state[b]`` for empty rows) —
    NOT ``states[:, -1]``, which pad bytes poison for rows shorter than
    ``L`` (the dense engine's contract, ops/scan_jax.py)."""
    from .scan_jax import _classes

    B, L = chunks.shape
    n_entries = table_flat.shape[0]
    n_banks = -(-n_entries // 128)
    banks = jnp.zeros((n_banks * 128,), jnp.int32).at[:n_entries].set(
        table_flat.astype(jnp.int32)
    ).reshape(n_banks, 128)

    Bp = -(-B // STREAMS) * STREAMS
    cls = _classes(chunks, byte_class, used_bytes).astype(jnp.int8)
    cls = jnp.zeros((Bp, L), jnp.int8).at[:B].set(cls)
    init = jnp.zeros((Bp,), jnp.int32).at[:B].set(init_state)
    # time axis blocked to Lb steps per grid step (VMEM); trailing pad
    # reads class 0 whose states are sliced away below
    Lb = min(max(L, 1), 1024)
    n_lb = -(-L // Lb) if L else 1
    Lp = n_lb * Lb
    # [n_blocks, Lp, 8, 128]: timestep-major tiles per 1024-stream block
    n_blocks = Bp // STREAMS
    cls_t = (
        jnp.concatenate(
            [cls, jnp.zeros((Bp, Lp - L), jnp.int8)], axis=1
        )
        .reshape(n_blocks, STREAMS, Lp)
        .transpose(0, 2, 1)
        .reshape(n_blocks, Lp, SUB, 128)
    )
    init_t = init.reshape(n_blocks, SUB, 128)

    out = pl.pallas_call(
        functools.partial(_kernel, n_banks, n_classes),
        grid=(n_blocks, n_lb),
        in_specs=[
            pl.BlockSpec((n_banks, 128), lambda i, lb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lb, SUB, 128), lambda i, lb: (i, lb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, 128), lambda i, lb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Lb, SUB, 128), lambda i, lb: (i, lb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks, Lp, SUB, 128), jnp.int32
        ),
        scratch_shapes=[pltpu.VMEM((SUB, 128), jnp.int32)],
        interpret=interpret,
    )(banks, cls_t, init_t)

    states = (
        out.reshape(n_blocks, Lp, STREAMS)
        .transpose(0, 2, 1)
        .reshape(Bp, Lp)[:B, :L]
    )
    if L == 0:
        return states, init_state
    if lengths is None:
        return states, states[:, -1]
    last_t = jnp.maximum(lengths - 1, 0)
    carry = jnp.take_along_axis(states, last_t[:, None], axis=1)[:, 0]
    return states, jnp.where(lengths > 0, carry, init_state)
