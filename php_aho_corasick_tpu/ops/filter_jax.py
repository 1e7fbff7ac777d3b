"""Gram-filter cascade device kernels (XLA path).

Two filter designs share this module (planning: models/cascade.py; the
reference's hot loop they replace: ``ac_trie_search``,
``src/multifast/ahocorasick.c:199-234``):

**Sampled** (``filter_hits_sampled`` + ``verify_windows`` — the TPU
headline engine).  Any occurrence of a pattern of length >= ``min_long``
covers exactly one point of a ``stride = min_long - q + 1`` lattice, so a
positional-alignment bloom (bit ``j`` set <=> some long pattern contains
this q-gram at offset ``j``) is probed only at grid points: 1/stride
gathers per byte against the v5e's ~72 M lookups/s gather wall.  Fetched
words AND together across 1-2 salted probes; nonzero words mark grid
cells whose candidate window gets an on-device dense-DFA walk
(``verify_windows``), so the match-free common case ships two scalars to
the host.  Short patterns (< q) are matched exactly by compare-select and
packed into a second per-cell bitmask.

**Anchored** (``filter_candidates`` — CPU/GPU and short-min-length sets).
Every position is tested as a potential match start against 1-3 staged
blooms of q-gram class codes at fixed in-pattern offsets; surviving starts
are compacted and verified by a vectorized host root-walk.

Soundness (both): a true occurrence always passes its filter (its grams
were inserted by construction; shorts are exact), so candidates form a
superset of true starts and exact verification removes the rest.
Capacity overflows retry doubled — output is never truncated.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .scan_jax import INT32_MAX, _classes, blocked_nonzero

KNUTH = 2654435761  # Knuth multiplicative hash constant


def gram_codes(cls: jax.Array, q: int, n_classes: int) -> jax.Array:
    """Rolling base-C q-gram codes: ``code[p]`` covers ``cls[p : p+q]``
    (positions whose gram would overrun the row read trailing zeros —
    harmless, those positions cannot start an owned full match).
    Codes wrap in int32; the bloom hash only needs determinism."""
    B, L = cls.shape
    pad = jnp.zeros((B, q - 1), jnp.int32)
    ext = jnp.concatenate([cls, pad], axis=1)
    code = jnp.zeros((B, L), jnp.int32)
    for j in range(q):
        code = code * n_classes + jax.lax.dynamic_slice_in_dim(ext, j, L, 1)
    return code


def bloom_slots(code: jax.Array, log2_bits: int, salt: int) -> jax.Array:
    """Multiplicative hash of a gram code into a bloom slot index."""
    h = (code.astype(jnp.uint32) ^ jnp.uint32(salt)) * jnp.uint32(KNUTH)
    return (h >> jnp.uint32(32 - log2_bits)).astype(jnp.int32)


def bloom_hit_take(words: jax.Array, slots: jax.Array) -> jax.Array:
    w = jnp.take(words, slots >> 5)
    return (w >> (slots & 31)) & 1


def short_pattern_mask(
    chunks: jax.Array, shorts: Sequence[bytes]
) -> jax.Array:
    """Exact start positions of short patterns via compare-select."""
    B, L = chunks.shape
    mask = jnp.zeros((B, L), jnp.bool_)
    maxs = max((len(s) for s in shorts), default=0)
    if maxs == 0:
        return mask
    pad = jnp.zeros((B, maxs), jnp.uint8)
    ext = jnp.concatenate([chunks, pad], axis=1)
    for s in shorts:
        eq = jnp.ones((B, L), jnp.bool_)
        for j, byte in enumerate(s):
            eq &= (
                jax.lax.dynamic_slice_in_dim(ext, j, L, 1)
                == jnp.uint8(byte)
            )
        mask |= eq
    return mask


#: polynomial rolling-hash base for sampled gram codes (odd => every byte
#: position keeps full weight mod 2^32; base 256 would zero out weights
#: past the 4th byte).  Shared by device kernel and host plan builder.
GRAM_BASE = 0x01000193  # FNV-1 prime


def sampled_gram_codes(
    chunks: jax.Array, q: int, stride: int
) -> jax.Array:
    """Polynomial q-gram byte codes ``sum_j byte[p+j] * GRAM_BASE^(q-1-j)``
    (wrapping int32) at the sampled grid positions ``p = m * stride`` only
    (``[B, M]``, ``M = ceil(L / stride)``) — no dense rolling-code array,
    and no byte->class lookup at all: raw bytes give a *finer* partition
    than classes (a gram containing a byte unused by every pattern can
    never equal a pattern gram), so membership filtering stays sound and
    gets strictly more selective.

    Implemented with cell-aligned reshapes/slices only (TPU vector loads
    are lane-aligned; a stride-s slice of the byte axis would relayout
    through cross-lane shuffles): position ``p + j`` lives in cell
    ``i = j // stride``, lane ``r = j % stride`` of the ``[B, M', stride]``
    reshape, so the code is a per-cell weighted reduction.  Grid grams
    overrunning the row read trailing zeros, which is harmless: such
    positions cannot be the in-row gram of a full occurrence."""
    import numpy as np

    B, L = chunks.shape
    M = -(-L // stride)
    extra = -(-q // stride)  # whole zero cells covering the gram overhang
    pad = jnp.zeros((B, (M + extra) * stride - L), chunks.dtype)
    b3 = jnp.concatenate([chunks, pad], axis=1).reshape(
        B, M + extra, stride
    )
    code = jnp.zeros((B, M), jnp.int32)
    for i in range(extra + 1):
        w = np.zeros(stride, np.int64)
        for r in range(stride):
            j = i * stride + r
            if j < q:
                w[r] = pow(GRAM_BASE, q - 1 - j, 1 << 32)
        if not w.any():
            continue
        w32 = jnp.asarray(w.astype(np.uint32).view(np.int32))
        part = b3[:, i : M + i, :].astype(jnp.int32) * w32[None, None, :]
        code = code + jnp.sum(part, axis=2, dtype=jnp.int32)
    return code


def sampled_gram_codes_planes(
    chunks: jax.Array, q: int, stride: int
) -> jax.Array:
    """:func:`sampled_gram_codes` via *cell-aligned word planes* — exact
    same codes, ~3x faster on TPU (measured: 16.5 -> 5.7 ms per 128 MiB,
    benchmarks/probe_planes2.py).

    The [B, M, stride] reshape in the general path has a minor dim of
    ``stride`` < 128, so every materialized intermediate is physically
    (8,128)-tiled at up to 16x padding — that tiling tax, not the
    arithmetic, was 36% of the round-2 filter cost.  When ``stride % 4 ==
    0`` and ``stride | L``, cell ``m``'s q gram bytes live entirely in
    words ``(stride/4)*m + j4`` for ``j4 in 0..(q-1)//4`` — each plane
    ``P_j4[b, m]`` is laid out exactly like the grid, so code assembly is
    pure elementwise byte-extract/multiply-add over [B, M] arrays with no
    sub-128 minor dim anywhere.  Word packing itself is 4 strided lane
    slices (cheap relayout, measured)."""
    import numpy as np

    B, L = chunks.shape
    assert stride % 4 == 0 and L % stride == 0, "planes path gate"
    spc = stride // 4
    M = L // stride
    words = None
    for k in range(4):
        part = chunks[:, k::4].astype(jnp.uint32) << jnp.uint32(8 * k)
        words = part if words is None else (words | part)
    n_planes = (q - 1) // 4 + 1
    planes = []
    for j4 in range(n_planes):
        shift, idx = divmod(j4, spc)
        pl = words[:, idx::spc] if spc > 1 else words
        if shift:
            pl = jnp.concatenate(
                [pl[:, shift:], jnp.zeros((B, shift), pl.dtype)], axis=1
            )
        planes.append(pl)
    code = jnp.zeros((B, M), jnp.uint32)
    for j in range(q):
        j4, k = divmod(j, 4)
        w = np.uint32(pow(GRAM_BASE, q - 1 - j, 1 << 32))
        byte = (planes[j4] >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
        code = code + byte * w
    return code.astype(jnp.int32)


def sampled_codes_best(chunks: jax.Array, q: int, stride: int) -> jax.Array:
    """Dispatch to the planes formulation when its alignment gate holds."""
    L = chunks.shape[1]
    if stride % 4 == 0 and L % stride == 0:
        return sampled_gram_codes_planes(chunks, q, stride)
    return sampled_gram_codes(chunks, q, stride)


@functools.partial(
    jax.jit,
    static_argnames=(
        "q", "stride", "log2_words", "salts", "shorts", "capacity",
    ),
)
def filter_hits_sampled(
    words: jax.Array,  # [2**log2_words] int32 positional bloom
    chunks: jax.Array,  # [B, L] uint8
    lengths: jax.Array,  # [B] int32
    min_long_len: jax.Array,  # scalar int32 (0 disables the long path)
    q: int,
    stride: int,
    log2_words: int,
    salts: Tuple[int, ...],
    shorts: Tuple[bytes, ...],
    capacity: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Strided-sampled filter with *grid-domain* compaction.

    Device-side cost lives entirely on the sampled grid (``B * ceil(L /
    stride)`` cells — the compaction/nonzero over the dense ``[B, L]``
    start domain measurably dominated the bloom gather itself on TPU, see
    docs/PERF_NOTES.md): one bloom gather per grid cell, plus a hit
    compaction over grid cells.  Each compacted hit carries two int32
    bitmask words the *host* expands into candidate starts
    (models/cascade.py expand_hits):

    * ``long_word`` — positional-bloom word of the cell's gram: bit ``j``
      => candidate long-pattern start at ``m * stride - j``;
    * ``short_word`` — exact compare-select short-pattern starts packed by
      in-cell offset: bit ``i`` => short match starting at
      ``m * stride + i``.

    Soundness: any occurrence of a long pattern at start ``t`` spans at
    least ``min_long >= q + stride - 1`` bytes, so ``[t, t + stride - 1]``
    contains exactly one grid point ``p``; the gram at ``p`` is the
    pattern's own gram at offset ``j = p - t <= stride - 1``, which the
    plan inserted with bit ``j`` set — the expanded starts are a superset
    of all true starts and host verification removes the rest.  On
    gather-starved TPUs (v5e: ~100M lookups/s) this divides the per-byte
    gather cost by ``stride`` (9x for the headline 16-byte needles, q=8).

    Returns ``(grid_idx [cap] flattened b * M + m ascending, long_word
    [cap], short_word [cap], n_hits)``; retry with doubled capacity when
    ``n_hits > capacity``."""
    B, L = chunks.shape
    M = -(-L // stride)
    code = sampled_codes_best(chunks, q, stride)
    # one probe per salt, alignment masks AND-combined: a true gram has
    # bit j set at every salted slot by construction, while stray bits
    # from fill must coincide across independent probes (rate^n_probes) —
    # the lever that keeps million-pattern filters selective.
    #
    # The gather runs as a lax.scan over NSLAB slabs of the grid: one
    # monolithic [B*M] take measures ~111 M lookups/s on v5e while the
    # same lookups chained through scan slabs reach ~132 M/s (probe5,
    # docs/PERF_NOTES.md round-2) — the slab loop pipelines index
    # computation with the gather unit instead of serializing behind one
    # giant gather.
    NSLAB = 8
    n_grid = B * M
    slab = -(-n_grid // NSLAB)
    code_flat = code.reshape(-1)
    if slab * NSLAB != n_grid:  # pad: padded cells are sliced off below
        code_flat = jnp.concatenate(
            [code_flat, jnp.zeros((slab * NSLAB - n_grid,), jnp.int32)]
        )
    code_slabs = code_flat.reshape(NSLAB, slab)

    def _probe_slab(acc, c):
        ws = None
        for salt in salts:
            h = (c.astype(jnp.uint32) ^ jnp.uint32(salt)) * jnp.uint32(KNUTH)
            widx = (h >> jnp.uint32(32 - log2_words)).astype(jnp.int32)
            probe = jnp.take(words, widx)  # THE gather
            ws = probe if ws is None else (ws & probe)
        return acc, ws

    _, w_slabs = jax.lax.scan(_probe_slab, jnp.int32(0), code_slabs)
    w = w_slabs.reshape(-1)[:n_grid].reshape(B, M)
    w = jnp.where(min_long_len > 0, w, 0)

    if shorts:
        sm = short_pattern_mask(chunks, shorts)
        sm &= (
            jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
            < lengths[:, None]
        )
        pad = jnp.zeros((B, M * stride - L), jnp.bool_)
        cell = jnp.concatenate([sm, pad], 1).reshape(B, M, stride)
        weights = (jnp.int32(1) << jnp.arange(stride, dtype=jnp.int32))
        sw = jnp.sum(cell * weights[None, None, :], axis=2, dtype=jnp.int32)
    else:
        sw = jnp.zeros((B, M), jnp.int32)

    # two-level compaction on the (sparse) grid-hit mask — see
    # scan_jax.blocked_nonzero for the cost rationale
    hit = (w | sw) != 0
    idx, n_hits = blocked_nonzero(hit.reshape(-1), capacity)
    safe = jnp.minimum(idx, B * M - 1)
    lw = jnp.where(idx < INT32_MAX, jnp.take(w.reshape(-1), safe), 0)
    swo = jnp.where(idx < INT32_MAX, jnp.take(sw.reshape(-1), safe), 0)
    return idx, lw, swo, n_hits


@functools.partial(
    jax.jit,
    static_argnames=(
        "q", "stride", "log2_rows", "salts", "log2_words", "fine_salts",
        "shorts", "capacity", "cap_coarse", "interpret",
    ),
)
def filter_hits_sampled_vmem(
    table: jax.Array,  # [k * n_banks, 128] int32 per-probe VMEM banks
    words: jax.Array,  # [2**log2_words] int32 HBM bloom (fine stage)
    chunks: jax.Array,  # [B, L] uint8
    lengths: jax.Array,  # [B] int32
    min_long_len: jax.Array,  # scalar int32 (0 disables the long path)
    q: int,
    stride: int,
    log2_rows: int,
    salts: Tuple[int, ...],
    log2_words: int,
    fine_salts: Tuple[int, ...],
    shorts: Tuple[bytes, ...],
    capacity: int,
    cap_coarse: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Strided-sampled filter, two-stage Pallas VMEM-bloom edition.

    Stage 1 (coarse, VPU): every grid cell's gram code probes ``k``
    small per-salt VMEM blooms through the bank-select kernel
    (ops/filter_pallas.bloom_word_vmem) — pure vector work, no
    scalar-gather-unit serialization.  The round-2 filter stage sat AT
    the measured ~132 M lookups/s XLA gather wall (docs/PERF_NOTES.md);
    the coarse stage replaces that per-cell gather entirely.

    Stage 2 (fine, XLA gather): only the compacted coarse survivors
    (``<= cap_coarse``, planner-bounded at ~1% of cells) re-probe the big
    HBM positional bloom — the same ``words`` the take path uses — so the
    per-cell gather cost shrinks by the coarse rejection factor.  A second
    compaction hands downstream (host expansion / window verify) the same
    contract as :func:`filter_hits_sampled`.

    Returns ``(grid_idx [cap], long_word [cap], short_word [cap],
    n_final, n_coarse)`` — retry with ``cap_coarse`` doubled when
    ``n_coarse > cap_coarse`` and with ``capacity`` doubled when
    ``n_final > capacity`` (exactness: overflow never truncates)."""
    from .filter_pallas import bloom_word_vmem

    B, L = chunks.shape
    M = -(-L // stride)
    code = sampled_codes_best(chunks, q, stride)
    w = bloom_word_vmem(table, code, salts, log2_rows, interpret=interpret)
    w = jnp.where(min_long_len > 0, w, 0)

    if shorts:
        sm = short_pattern_mask(chunks, shorts)
        sm &= (
            jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
            < lengths[:, None]
        )
        pad = jnp.zeros((B, M * stride - L), jnp.bool_)
        cell = jnp.concatenate([sm, pad], 1).reshape(B, M, stride)
        weights = (jnp.int32(1) << jnp.arange(stride, dtype=jnp.int32))
        sw = jnp.sum(cell * weights[None, None, :], axis=2, dtype=jnp.int32)
    else:
        sw = jnp.zeros((B, M), jnp.int32)

    # stage-1 compaction over the (sparse) coarse-hit mask
    hit1 = (w | sw) != 0
    idx1, n_coarse = blocked_nonzero(hit1.reshape(-1), cap_coarse)
    safe1 = jnp.minimum(idx1, B * M - 1)
    valid1 = idx1 < INT32_MAX
    lw1 = jnp.where(valid1, jnp.take(w.reshape(-1), safe1), 0)
    sw1 = jnp.where(valid1, jnp.take(sw.reshape(-1), safe1), 0)

    # stage 2: survivors re-probe the HBM bloom (gathers ∝ survivors)
    c1 = jnp.take(code.reshape(-1), safe1)
    wf = None
    for salt in fine_salts:
        h = (c1.astype(jnp.uint32) ^ jnp.uint32(salt)) * jnp.uint32(KNUTH)
        widx = (h >> jnp.uint32(32 - log2_words)).astype(jnp.int32)
        probe = jnp.take(words, widx)
        wf = probe if wf is None else (wf & probe)
    lw1 = lw1 & wf

    # stage-2 compaction: drop cells the fine probe refuted
    alive = (lw1 | sw1) != 0
    slot, n_final = blocked_nonzero(alive, capacity)
    safe2 = jnp.minimum(slot, cap_coarse - 1)
    valid2 = slot < INT32_MAX
    idx = jnp.where(valid2, jnp.take(idx1, safe2), INT32_MAX)
    lw = jnp.where(valid2, jnp.take(lw1, safe2), 0)
    swo = jnp.where(valid2, jnp.take(sw1, safe2), 0)
    return idx, lw, swo, n_final, n_coarse


@functools.partial(
    jax.jit,
    static_argnames=("n_classes", "stride", "win_len", "capacity", "n_hits"),
)
def verify_windows(
    table_flat: jax.Array,  # [S*C] int16/int32 dense transition table
    byte_class: jax.Array,
    used_bytes: jax.Array,
    chunks: jax.Array,  # [B, L] uint8, L % 4 == 0 (ROW_ALIGN)
    lengths: jax.Array,  # [B] int32
    grid_idx: jax.Array,  # [>=n_hits] int32 b*M+m hits, INT32_MAX-padded
    final_start: jax.Array,  # scalar int32
    n_classes: int,
    stride: int,
    win_len: int,  # (stride - 1) + max_pattern_len, <= 32
    capacity: int,
    n_hits: int,  # static pow2 slot count; slices grid_idx in-jit
) -> Tuple[jax.Array, jax.Array]:
    """Device verification of sampled-filter hits: walk the dense DFA over
    each hit's candidate window so only *matching* windows ever leave the
    device (the match-free common case fetches two scalars — on rigs where
    host<->device transfers are slow this beats shipping candidate buffers
    to a host verifier).

    Window of the hit at grid point ``p = m * stride``: ``[p - stride + 1,
    p + max_len)`` — it contains every occurrence whose *own* guaranteed
    hit is this cell (long starts in ``[p-stride+1, p]``, short starts in
    ``[p, p+stride)``).  The walk starts from the root at the window head,
    so any final state it reaches is a genuine in-window match; positions
    outside ``[0, length)`` contribute class 0 which pins the DFA at the
    root (unused-byte transitions all lead there).

    Returns ``(win_cell [cap] — grid ids of windows containing >= 1 final
    position, ascending, INT32_MAX-padded; n_flagged)``.  The host
    re-walks only flagged windows (work proportional to matches) and
    applies the exactly-once ownership rules (models/cascade.py
    emit_windows)."""
    B, L = chunks.shape
    M = -(-L // stride)
    H = min(n_hits, grid_idx.shape[0])
    grid_idx = grid_idx[:H]
    W = win_len
    active = grid_idx < INT32_MAX
    g = jnp.where(active, grid_idx, 0)
    b = g // M
    w0 = (g % M) * stride - (stride - 1)  # window head (may be < 0)

    j_idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    base = b * L + w0
    # Gather window bytes directly: H*W gathers, proportional to the HIT
    # count, not the corpus — at realistic hit caps this is ~100k lookups
    # (~1 ms at the measured gather rate).  An aligned-int32-word variant
    # (W/4+1 gathers/hit via bitcast_convert_type) was tried and reverted:
    # the u8[B*L/4, 4] reshape it needs gets a (8,128)-tiled layout whose
    # minor dim pads 4 -> 128, materializing a 32x-padded corpus-sized
    # scratch (17.7 GB at a 128 MiB launch — compile-time OOM).
    bidx = jnp.clip(base[:, None] + j_idx, 0, B * L - 1)
    byte = jnp.take(chunks.reshape(-1), bidx).astype(jnp.int32)

    pos = w0[:, None] + j_idx
    valid = (pos >= 0) & (pos < lengths[b][:, None]) & active[:, None]
    cls = _classes(byte.astype(jnp.uint8), byte_class, used_bytes)
    cls = jnp.where(valid, cls, 0)

    # unrolled walk (W <= 32 static): lax.scan's per-step loop overhead
    # measurably dominates these small [H] gathers on the remote backend
    state = jnp.zeros((H,), jnp.int32)
    flagged = jnp.zeros((H,), jnp.bool_)
    for j in range(W):
        state = jnp.take(table_flat, state * n_classes + cls[:, j]).astype(
            jnp.int32
        )
        flagged |= (state >= final_start) & valid[:, j]
    n_flagged = flagged.sum(dtype=jnp.int32)
    (slot,) = jnp.nonzero(flagged, size=capacity, fill_value=INT32_MAX)
    safe = jnp.minimum(slot, H - 1)
    win_cell = jnp.where(
        slot < INT32_MAX, jnp.take(grid_idx, safe), INT32_MAX
    )
    return win_cell, n_flagged


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_classes", "n_dense", "stride", "win_len", "capacity", "n_hits",
    ),
)
def verify_windows_compressed(
    dense_flat: jax.Array,  # [D*C] int32 dense-bank rows
    meta: jax.Array,  # [S-D] int32 packed (skip * EXC_PACK + exc_class + 1)
    exc_target: jax.Array,  # [S-D] int32
    byte_class: jax.Array,
    used_bytes: jax.Array,
    chunks: jax.Array,  # [B, L] uint8
    lengths: jax.Array,  # [B] int32
    grid_idx: jax.Array,  # [>=n_hits] int32 b*M+m hits, INT32_MAX-padded
    dense_final_start: jax.Array,  # scalar int32
    final_start: jax.Array,  # scalar int32
    n_classes: int,
    n_dense: int,
    stride: int,
    win_len: int,
    capacity: int,
    n_hits: int,
) -> Tuple[jax.Array, jax.Array]:
    """Compressed-table analog of :func:`verify_windows`: the per-step
    walk is the fixed 3-gather compressed lookup
    (ops/scan_jax.scan_states_compressed) and finality the two-range
    predicate — this is what lets the sampled cascade (the fast engine)
    run on byte-dense signature-scale sets whose dense ``[S, C]`` table
    exceeds HBM (SURVEY §7; core/tables.CompressedAutomaton)."""
    from ..core.tables import EXC_PACK

    B, L = chunks.shape
    M = -(-L // stride)
    H = min(n_hits, grid_idx.shape[0])
    grid_idx = grid_idx[:H]
    W = win_len
    active = grid_idx < INT32_MAX
    g = jnp.where(active, grid_idx, 0)
    b = g // M
    w0 = (g % M) * stride - (stride - 1)

    j_idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    base = b * L + w0
    bidx = jnp.clip(base[:, None] + j_idx, 0, B * L - 1)
    byte = jnp.take(chunks.reshape(-1), bidx).astype(jnp.int32)

    pos = w0[:, None] + j_idx
    valid = (pos >= 0) & (pos < lengths[b][:, None]) & active[:, None]
    cls = _classes(byte.astype(jnp.uint8), byte_class, used_bytes)
    cls = jnp.where(valid, cls, 0)

    D = jnp.int32(n_dense)
    state = jnp.zeros((H,), jnp.int32)
    flagged = jnp.zeros((H,), jnp.bool_)
    for j in range(W):
        c = cls[:, j]
        sp = jnp.maximum(state - D, 0)
        m = jnp.take(meta, sp)
        tgt = jnp.take(exc_target, sp)
        key = m % EXC_PACK - 1
        skip = m // EXC_PACK
        row = jnp.where(state < D, state, skip)
        fb = jnp.take(dense_flat, row * n_classes + c)
        state = jnp.where((state >= D) & (c == key), tgt, fb).astype(
            jnp.int32
        )
        fin = (state >= final_start) | (
            (state < D) & (state >= dense_final_start)
        )
        flagged |= fin & valid[:, j]
    n_flagged = flagged.sum(dtype=jnp.int32)
    (slot,) = jnp.nonzero(flagged, size=capacity, fill_value=INT32_MAX)
    safe = jnp.minimum(slot, H - 1)
    win_cell = jnp.where(
        slot < INT32_MAX, jnp.take(grid_idx, safe), INT32_MAX
    )
    return win_cell, n_flagged


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_classes", "q", "offsets", "log2_bits", "salts", "shorts",
        "bloom_impl", "capacity",
    ),
)
def filter_candidates(
    bloom_words: jax.Array,  # [n_stages, bits/32] int32
    byte_class: jax.Array,
    used_bytes: jax.Array,
    chunks: jax.Array,  # [B, L] uint8
    lengths: jax.Array,  # [B] int32
    emit_from: jax.Array,  # [B] int32
    min_long_len: jax.Array,  # scalar int32 (0 disables the long path)
    n_classes: int,
    q: int,
    offsets: Tuple[int, ...],
    log2_bits: int,
    salts: Tuple[int, ...],
    shorts: Tuple[bytes, ...],
    bloom_impl: str,
    capacity: int,
) -> Tuple[jax.Array, jax.Array]:
    """Candidate-start compaction.  Returns ``(start_idx [capacity],
    n_candidates)`` where ``start_idx`` holds flattened ``b * L + p``
    ascending, INT32_MAX-padded.

    A position is a candidate iff it passes every bloom stage (potential
    long-pattern start) or exactly begins a short pattern, and a match
    starting there could own an emission in this row: its earliest
    possible end must fall before ``length`` and its latest possible end
    after ``emit_from`` (ownership itself is re-checked exactly during
    host verification)."""
    B, L = chunks.shape
    cls = _classes(chunks, byte_class, used_bytes)
    if bloom_impl == "pallas":
        from .filter_pallas import bloom_hit_pallas

        interpret = jax.default_backend() != "tpu"
        hit = functools.partial(bloom_hit_pallas, interpret=interpret)
    else:
        hit = bloom_hit_take

    p_idx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    if offsets:  # long-pattern bloom stages (absent in shorts-only plans)
        code = gram_codes(cls, q, n_classes)
        pad = jnp.zeros((B, max(offsets)), jnp.int32)
        code_ext = jnp.concatenate([code, pad], axis=1)
        cand = jnp.ones((B, L), jnp.bool_)
        for s, (off, salt) in enumerate(zip(offsets, salts)):
            code_o = jax.lax.dynamic_slice_in_dim(code_ext, off, L, 1)
            slots = bloom_slots(code_o, log2_bits, salt)
            cand &= hit(bloom_words[s], slots).astype(jnp.bool_)
        # long-pattern starts need min_long_len bytes left in the row
        cand &= p_idx + min_long_len <= lengths[:, None]
        cand &= min_long_len > 0
    else:
        cand = jnp.zeros((B, L), jnp.bool_)

    if shorts:
        cand |= short_pattern_mask(chunks, shorts)
    # any match from start p ends at >= p (length >= 1): drop starts whose
    # best-case end still precedes the emission window
    cand &= p_idx < lengths[:, None]
    idx, n = blocked_nonzero(cand.reshape(-1), capacity)
    return idx, n
