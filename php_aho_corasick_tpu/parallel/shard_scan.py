"""Data-parallel sharded scan: pjit/shard_map over the ``data`` mesh axis.

TPU-native replacement for the reference's "one automaton, many haystacks"
amortization (``README.md:7-9``): chunk rows are sharded over chips, the
transition table + byte-class map are replicated (HBM-resident per chip),
and each chip runs the same compacted scan kernel on its rows.  Collectives:

* ``psum`` — global match count (the scalar every caller needs first);
* ``pmax`` — worst per-shard buffer occupancy, drives the exact
  capacity-retry loop (a shard overflowing its fixed match buffer forces a
  doubled retry — never silent truncation);
* match buffers themselves stay sharded (out_spec ``P("data")``) and are
  fetched shard-major, which preserves global scan order because rows are
  packed document-major and shards are contiguous row blocks.

Halo handling is identical to the single-chip path: rows already carry
their left overlap (ops/matches.py pack_documents), so no neighbor
communication is needed during the scan — the halo is the sequence-parallel
story for a streaming DFA (SURVEY §2.4).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.scan_jax import INT32_MAX, scan_and_compact
from .mesh import DATA_AXIS

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "n_classes", "capacity"),
)
def _sharded_call(
    table_flat,
    byte_class,
    used_bytes,
    chunks,
    init_state,
    lengths,
    emit_from,
    final_start,
    *,
    mesh: Mesh,
    n_classes: int,
    capacity: int,
):
    data, rep = P(DATA_AXIS), P()

    def local_fn(table, bc, ub, ch, ini, ln, ef, fs):
        idx, sts, n, carry = scan_and_compact(
            table, bc, ub, ch, ini, ln, ef, fs,
            n_classes=n_classes, capacity=capacity,
        )
        shard = jax.lax.axis_index(DATA_AXIS)
        local_cells = ch.shape[0] * ch.shape[1]
        idx = jnp.where(idx < INT32_MAX, idx + shard * local_cells, idx)
        return idx[None], sts[None], n[None], carry

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, data, data, data, data, rep),
        out_specs=(data, data, data, data),
    )
    return fn(
        table_flat, byte_class, used_bytes, chunks, init_state, lengths,
        emit_from, final_start,
    )


def sharded_scan_compact(
    mesh: Mesh,
    dev_arrays: dict,
    chunks,
    init_state,
    lengths,
    emit_from,
    n_classes: int,
    capacity: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Run the compacted 1-gram scan over the mesh.

    Returns ``(idx [n_shards, capacity], states [n_shards, capacity],
    counts [n_shards], carry [B])`` — ``idx`` entries are *global*
    flattened ``row * L + t`` cell indices, ascending within each shard.
    """
    return _sharded_call(
        dev_arrays["table_flat"],
        dev_arrays["byte_class"],
        dev_arrays["used_bytes"],
        chunks,
        init_state,
        lengths,
        emit_from,
        dev_arrays["final_start"],
        mesh=mesh,
        n_classes=n_classes,
        capacity=capacity,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "n_classes", "k", "capacity"),
)
def _sharded_call_kgram(
    ktable,
    byte_class,
    used_bytes,
    chunks,
    init_state,
    lengths,
    emit_from,
    final_start,
    *,
    mesh: Mesh,
    n_classes: int,
    k: int,
    capacity: int,
):
    from ..ops.scan_jax import scan_and_compact_kgram

    data, rep = P(DATA_AXIS), P()

    def local_fn(kt, bc, ub, ch, ini, ln, ef, fs):
        idx, prevs, n, carry = scan_and_compact_kgram(
            kt, bc, ub, ch, ini, ln, ef, fs,
            n_classes=n_classes, k=k, capacity=capacity,
        )
        shard = jax.lax.axis_index(DATA_AXIS)
        local_cells = ch.shape[0] * (ch.shape[1] // k)
        idx = jnp.where(idx < INT32_MAX, idx + shard * local_cells, idx)
        return idx[None], prevs[None], n[None], carry

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, data, data, data, data, rep),
        out_specs=(data, data, data, data),
    )
    return fn(
        ktable, byte_class, used_bytes, chunks, init_state, lengths,
        emit_from, final_start,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "n_classes", "q", "offsets", "log2_bits", "salts", "shorts",
        "bloom_impl", "capacity",
    ),
)
def _sharded_call_cascade(
    bloom_words,
    byte_class,
    used_bytes,
    chunks,
    lengths,
    emit_from,
    min_long_len,
    *,
    mesh: Mesh,
    n_classes: int,
    q: int,
    offsets,
    log2_bits: int,
    salts,
    shorts,
    bloom_impl: str,
    capacity: int,
):
    from ..ops.filter_jax import filter_candidates

    data, rep = P(DATA_AXIS), P()

    def local_fn(bw, bc, ub, ch, ln, ef, mll):
        idx, n = filter_candidates(
            bw, bc, ub, ch, ln, ef, mll,
            n_classes=n_classes, q=q, offsets=offsets, log2_bits=log2_bits,
            salts=salts, shorts=shorts, bloom_impl=bloom_impl,
            capacity=capacity,
        )
        shard = jax.lax.axis_index(DATA_AXIS)
        local_cells = ch.shape[0] * ch.shape[1]
        idx = jnp.where(idx < INT32_MAX, idx + shard * local_cells, idx)
        return idx[None], n[None]

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, data, data, data, rep),
        out_specs=(data, data),
    )
    return fn(
        bloom_words, byte_class, used_bytes, chunks, lengths, emit_from,
        min_long_len,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "q", "stride", "log2_words", "salts", "shorts", "capacity",
    ),
)
def _sharded_call_cascade_sampled(
    words,
    chunks,
    lengths,
    min_long_len,
    *,
    mesh: Mesh,
    q: int,
    stride: int,
    log2_words: int,
    salts,
    shorts,
    capacity: int,
):
    from ..ops.filter_jax import filter_hits_sampled

    data, rep = P(DATA_AXIS), P()

    def local_fn(w, ch, ln, mll):
        idx, lw, sw, n = filter_hits_sampled(
            w, ch, ln, mll,
            q=q, stride=stride, log2_words=log2_words,
            salts=salts, shorts=shorts, capacity=capacity,
        )
        shard = jax.lax.axis_index(DATA_AXIS)
        # grid cells per shard: rows x ceil(row_len / stride)
        local_cells = ch.shape[0] * (-(-ch.shape[1] // stride))
        idx = jnp.where(idx < INT32_MAX, idx + shard * local_cells, idx)
        return idx[None], lw[None], sw[None], n[None]

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(rep, data, data, rep),
        out_specs=(data, data, data, data),
    )
    return fn(words, chunks, lengths, min_long_len)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "n_classes", "q", "stride", "log2_words", "salts", "shorts",
        "win_len", "cap_hits", "cap_flagged",
    ),
)
def _sharded_call_sampled_verified(
    words,
    table_flat,
    byte_class,
    used_bytes,
    chunks,
    lengths,
    min_long_len,
    final_start,
    *,
    mesh: Mesh,
    n_classes: int,
    q: int,
    stride: int,
    log2_words: int,
    salts,
    shorts,
    win_len: int,
    cap_hits: int,
    cap_flagged: int,
):
    """Sampled filter + device window verification chained inside ONE
    shard_map dispatch — each shard's flagged windows come back as global
    grid-cell ids; everything else stays on its chip."""
    from ..ops.filter_jax import filter_hits_sampled, verify_windows

    data, rep = P(DATA_AXIS), P()

    def local_fn(w, tf, bc, ub, ch, ln, mll, fs):
        idx, _lw, _sw, n = filter_hits_sampled(
            w, ch, ln, mll,
            q=q, stride=stride, log2_words=log2_words,
            salts=salts, shorts=shorts, capacity=cap_hits,
        )
        cells, nf = verify_windows(
            tf, bc, ub, ch, ln, idx, fs,
            n_classes=n_classes, stride=stride, win_len=win_len,
            capacity=cap_flagged, n_hits=cap_hits,
        )
        shard = jax.lax.axis_index(DATA_AXIS)
        local_cells = ch.shape[0] * (-(-ch.shape[1] // stride))
        cells = jnp.where(
            cells < INT32_MAX, cells + shard * local_cells, cells
        )
        return cells[None], n[None], nf[None]

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, data, data, rep, rep),
        out_specs=(data, data, data),
    )
    return fn(
        words, table_flat, byte_class, used_bytes, chunks, lengths,
        min_long_len, final_start,
    )


def sharded_sampled_verified(
    mesh: Mesh,
    cascade_model,
    chunks,
    lengths,
    cap_hits: int,
    cap_flagged: int,
):
    """Mesh wrapper for the chained sampled-filter + window-verify pass.
    Returns ``(cells [n_shards, capB] global grid ids, n_hits [n_shards],
    n_flagged [n_shards])``."""
    plan = cascade_model.plan
    dev = cascade_model.device_arrays
    dd = cascade_model.dense_model.device_arrays
    return _sharded_call_sampled_verified(
        dev["sampled_words"],
        dd["table_flat"],
        dev["byte_class"],
        dev["used_bytes"],
        chunks,
        lengths,
        dev["min_long_len"],
        dd["final_start"],
        mesh=mesh,
        n_classes=cascade_model.auto.n_classes,
        q=plan.q,
        stride=plan.stride,
        log2_words=plan.log2_words,
        salts=plan.sampled_salts,
        shorts=plan.shorts,
        win_len=cascade_model.win_len,
        cap_hits=cap_hits,
        cap_flagged=cap_flagged,
    )


def sharded_filter_hits_sampled(
    mesh: Mesh,
    cascade_model,
    chunks,
    lengths,
    capacity: int,
):
    """Sharded sampled-mode grid-hit filter.  Returns ``(grid_idx
    [n_shards, cap], long_word, short_word, counts [n_shards])`` with
    shard-globalized grid indices (host expansion: CascadeModel
    expand_hits)."""
    plan = cascade_model.plan
    dev = cascade_model.device_arrays
    return _sharded_call_cascade_sampled(
        dev["sampled_words"],
        chunks,
        lengths,
        dev["min_long_len"],
        mesh=mesh,
        q=plan.q,
        stride=plan.stride,
        log2_words=plan.log2_words,
        salts=plan.sampled_salts,
        shorts=plan.shorts,
        capacity=capacity,
    )


def sharded_filter_candidates(
    mesh: Mesh,
    cascade_model,
    chunks,
    lengths,
    emit_from,
    capacity: int,
):
    """Sharded (anchored) cascade candidate filter.  Returns
    ``(idx [n_shards, cap], counts [n_shards])`` with global flattened
    start indices."""
    plan = cascade_model.plan
    dev = cascade_model.device_arrays
    return _sharded_call_cascade(
        dev["bloom_words"],
        dev["byte_class"],
        dev["used_bytes"],
        chunks,
        lengths,
        emit_from,
        dev["min_long_len"],
        mesh=mesh,
        n_classes=cascade_model.auto.n_classes,
        q=plan.q,
        offsets=plan.offsets,
        log2_bits=plan.log2_bits,
        salts=plan.salts,
        shorts=plan.shorts,
        bloom_impl=cascade_model.bloom_impl(),
        capacity=capacity,
    )


def sharded_scan_compact_kgram(
    mesh: Mesh,
    dev_arrays: dict,
    chunks,
    init_state,
    lengths,
    emit_from,
    n_classes: int,
    k: int,
    capacity: int,
):
    """Sharded k-gram scan (see models/kgram_dfa.py).  Returns
    ``(cell_idx [n_shards, cap], prev_state [n_shards, cap],
    counts [n_shards], carry [B])`` with global cell indices."""
    return _sharded_call_kgram(
        dev_arrays["ktable"],
        dev_arrays["byte_class"],
        dev_arrays["used_bytes"],
        chunks,
        init_state,
        lengths,
        emit_from,
        dev_arrays["final_start"],
        mesh=mesh,
        n_classes=n_classes,
        k=k,
        capacity=capacity,
    )
