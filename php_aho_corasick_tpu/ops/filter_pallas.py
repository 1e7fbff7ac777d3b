"""Pallas bloom-membership kernels for the cascade engine.

Two kernel families, by Mosaic gather shape (docs/PERF_NOTES.md):

**Lane-partitioned VMEM bloom** (``bloom_word_vmem`` — the round-3
production filter).  Mosaic's ``take_along_axis(table, rows, axis=0)``
(``tpu.dynamic_gather``) gathers along the *sublane* axis: each of the
128 lanes independently picks one of the table's ``N`` rows.  Lay the
positional alignment bloom out as ``[N, 128]`` with every column holding
the same ``N``-word bloom, and one probe of 128·R grid cells is ONE
vector gather — no scalar-gather-unit involvement, no per-bank select
chain.  ``k`` salted probes AND together in-kernel; insertion sets each
entry's alignment bit under all ``k`` hashes (classic k-hash bloom over
word rows), so per-alignment false-positive = fill^k with
``fill = 1 - exp(-k·n/N)``.  This replaces the XLA ``jnp.take`` bloom
gather that was AT the measured ~132 M lookups/s wall (127 of the 205 ms
headline pass, round 2).

**Bank-select** (``bloom_hit_pallas`` — kept for per-*bit* membership
lookups on small blooms).  Decomposes a slot into ``(bank, lane, bit)``
and resolves the bank dimension with an unrolled gather+select over
``[8, 128]`` tiles: ~``n_banks`` vector ops per element, viable only for
2^15..2^17-bit blooms.

The XLA fallbacks (``take``/one-hot ``matmul``) live in filter_jax.py;
kernels are selected via ``ScanConfig.bloom_impl`` + the cascade planner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filter_jax import GRAM_BASE, KNUTH

#: rows of 128 lanes per grid step.  Per bank step the kernel pays a
#: dynamic-slice addressing cost once per block; at 256 rows that is
#: ~43% of the step (measured 33 -> 26.3 ms per 16.8M codes going
#: 256 -> 1024, benchmarks/probe_blockr.py).  1024 rows = 1 MiB in+out
#: per step, far under VMEM.
BLOCK_R = 1024
SUB = 8  # Mosaic gather tile height


#: row count up to which the bank probe uses the select-tree formulation
#: (below) instead of the fori_loop row scan.  8 = the production
#: headline shape; the tree keeps ~n_rows gathered [block_r, 128] values
#: live at once, so larger tables would trade its op saving for VMEM
#: pressure (the 48-row smoke config OOM'd scoped vmem at 16 rows).
_TREE_MAX_ROWS = 8


def _bank_probe(table_ref, c, salts, log2_rows, n_banks, pack):
    """Shared block-wide bank-select probe body: AND over ``salts`` of the
    hashed bloom word of every code in the ``[R, 128]`` block ``c``.

    Two formulations by per-salt physical row count:

    * ``n_rows <= _TREE_MAX_ROWS`` (= 8, the production headline shape:
      N=4096, pack 4 => 8 rows/salt): lane-gather every row once and
      resolve the per-cell row choice with a ``log2(n_rows)``-level
      binary SELECT TREE, extracting the packed subword once at the
      end — ~24 vector ops per salt.  The loop formulation pays
      broadcast + gather + subword + select per ROW (~6 ops x n_rows =
      48) because Mosaic's sublane gather cannot index across more than
      one [8, 128] tile (round-5; the bank loop was ~60% of the 12 ms
      fused kernel).
    * larger tables: the round-3 fori_loop row scan (the tree keeps
      ~n_rows gathered [R, 128] values live at once, which OOM'd
      scoped VMEM at 16 rows)."""
    shift = jnp.uint32(32 - log2_rows)
    R = c.shape[0]
    n_rows = n_banks // pack
    sw = 32 // pack
    submask = jnp.uint32((1 << sw) - 1) if pack > 1 else None
    acc_all = None
    for p, salt in enumerate(salts):
        h = (c.astype(jnp.uint32) ^ jnp.uint32(salt)) * jnp.uint32(KNUTH)
        slot = (h >> shift).astype(jnp.int32)
        lane = slot & 127
        bank = slot >> 7
        if pack > 1:
            prow = bank // pack
            sub_shift = ((bank % pack) * sw).astype(jnp.uint32)
        else:
            prow = bank
            sub_shift = None

        if n_rows <= _TREE_MAX_ROWS:
            # per-row lane gathers, then a binary select tree over the
            # GATHERED per-cell values (selection must use the target
            # cell's own prow, so it runs after the gather), and one
            # subword extraction at the end — vs the loop's per-row
            # select + per-row subword + fori_loop step overhead
            vals = [
                jnp.take_along_axis(
                    jnp.broadcast_to(
                        table_ref[pl.ds(p * n_rows + r, 1), :], (R, 128)
                    ),
                    lane,
                    axis=1,
                )
                for r in range(n_rows)
            ]
            bit = 1
            while len(vals) > 1:
                nxt = []
                for i in range(0, len(vals) - 1, 2):
                    nxt.append(
                        jnp.where((prow & bit) != 0, vals[i + 1], vals[i])
                    )
                if len(vals) % 2:
                    nxt.append(vals[-1])
                vals = nxt
                bit *= 2
            g = vals[0]
            if pack > 1:
                g = (
                    (g.astype(jnp.uint32) >> sub_shift) & submask
                ).astype(jnp.int32)
            acc = g
        else:
            def bank_body(b, acc, lane=lane, prow=prow,
                          sub_shift=sub_shift, p=p):
                row = jnp.broadcast_to(
                    table_ref[pl.ds(p * n_rows + b, 1), :], (R, 128)
                )
                g = jnp.take_along_axis(row, lane, axis=1)
                if pack > 1:
                    g = (
                        (g.astype(jnp.uint32) >> sub_shift) & submask
                    ).astype(jnp.int32)
                return jnp.where(prow == b, g, acc)

            acc = jax.lax.fori_loop(
                0, n_rows, bank_body, jnp.zeros((R, 128), jnp.int32)
            )
        acc_all = acc if acc_all is None else (acc_all & acc)
    return acc_all


def _vmem_kernel(
    salts, log2_rows, n_banks, pack, table_ref, codes_ref, out_ref
):
    """Block-wide bank-select probe: hash the WHOLE [BLOCK_R, 128] block
    of codes per salt, then fori_loop over bank rows — one dynamic-slice
    row broadcast + lane take_along_axis + select per bank over the full
    block.  The per-bank scalar work (dynamic slice addressing) amortizes
    over BLOCK_R/8 tiles; a per-[8,128]-tile bank loop measured ~85
    cycles/bank-step on v5e (probe3, docs/PERF_NOTES.md round 3) with the
    slice overhead dominating.

    ``pack`` banks share each physical row as 32/pack-bit subwords (a
    positional word only carries ``stride`` alignment bits), dividing the
    loop's step count — its entire cost — by ``pack`` for two extra
    vector ops per step (subword shift+mask)."""
    out_ref[...] = _bank_probe(
        table_ref, codes_ref[...], salts, log2_rows, n_banks, pack
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "salts", "log2_rows", "pack", "interpret", "force_pallas",
        "block_r",
    ),
)
def bloom_word_vmem(
    table: jax.Array,  # [len(salts) * n_banks / pack, 128] int32 rows
    codes: jax.Array,  # [...] int32 gram codes
    salts: tuple,  # k probe salts (one bank table each)
    log2_rows: int,  # log2 of words per probe table (n_banks * 128)
    pack: int = 1,  # banks per physical row (32/pack-bit subwords)
    interpret: bool = False,
    force_pallas: bool = False,  # tests: run the kernel body interpreted
    block_r: int = BLOCK_R,  # grid-step height (rows of 128 codes)
) -> jax.Array:
    """AND over ``salts`` of ``table_p[hash_salt_p(code)]`` per code.

    Each salt owns an independent ``2**log2_rows``-word positional bloom
    (rows ``[p*n_banks, (p+1)*n_banks)`` of ``table``); a probe fetches
    its hashed word via the bank-select chain and the salts' words AND.
    Returns the combined positional word for every code (same shape as
    ``codes``); a zero word means "no alignment of any long pattern can
    produce this gram" — the caller's grid-cell hit test."""
    shape = codes.shape
    flat = codes.reshape(-1)
    n = flat.shape[0]
    n_banks = (1 << log2_rows) // 128
    assert n_banks % pack == 0
    assert table.shape == (len(salts) * n_banks // pack, 128)
    if interpret and not force_pallas:
        # pure-XLA equivalent for CPU/test runs: jax's pallas interpreter
        # cannot run this kernel under shard_map (its per-primitive vma
        # checks reject kernel constants), and off-TPU the XLA gather is
        # the faster path anyway.  The kernel body itself is covered by
        # the force_pallas interpret-mode tests.
        return _bank_probe_xla(
            table, flat, salts, log2_rows, pack
        ).reshape(shape)
    cols = 128
    rows = -(-n // cols)
    rows_pad = -(-rows // block_r) * block_r
    padded = jnp.zeros((rows_pad * cols,), jnp.int32).at[:n].set(flat)
    grid_codes = padded.reshape(rows_pad, cols)

    # inside shard_map the output's varying-mesh-axes set must be declared
    # explicitly on the ShapeDtypeStruct (the word follows its code's vma)
    try:
        vma = jax.typeof(grid_codes).vma
    except AttributeError:  # pragma: no cover - older jax
        vma = None
    out_sds = (
        jax.ShapeDtypeStruct((rows_pad, cols), jnp.int32, vma=vma)
        if vma
        else jax.ShapeDtypeStruct((rows_pad, cols), jnp.int32)
    )
    out = pl.pallas_call(
        functools.partial(_vmem_kernel, salts, log2_rows, n_banks, pack),
        grid=(rows_pad // block_r,),
        in_specs=[
            pl.BlockSpec(
                (len(salts) * n_banks // pack, 128), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_r, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_sds,
        # the select-tree probe (round 5) keeps ~n_rows gathered
        # [block_r, 128] values live per salt; headroom over the 16M
        # default accommodates that working set (cf. the fused kernel's
        # identical bump)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(table, grid_codes)
    return out.reshape(-1)[:n].reshape(shape)


def _roll(x, shift, axis, interpret):
    """Circular shift; pltpu.roll on hardware, jnp.roll in interpreter
    mode (the Mosaic interpreter lacks a pltpu.roll rule)."""
    if interpret:
        return jnp.roll(x, shift, axis=axis)
    if shift < 0:  # pltpu.roll requires a non-negative shift
        shift += x.shape[axis]
    return pltpu.roll(x, shift=shift, axis=axis)


def _flat_shift(X, next_row0, d, block_r, interpret):
    """``out[r, l] = flat[r*128 + l + d]`` over the row-major flattening
    of the ``[block_r, 128]`` block ``X`` (d < 128), reading the
    overflow elements from the next block's first row ``next_row0``
    ([1, 128]).  Two lane rolls + one sublane roll + selects — no
    cross-lane gathers."""
    row_i = jax.lax.broadcasted_iota(jnp.int32, X.shape, 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
    A = _roll(X, -d, 1, interpret)
    Xdn = _roll(X, -1, 0, interpret)
    Xdn = jnp.where(
        row_i == block_r - 1, jnp.broadcast_to(next_row0, X.shape), Xdn
    )
    B = _roll(Xdn, -d, 1, interpret)
    return jnp.where(lane_i < 128 - d, A, B)


def _flat_shift_neg(X, prev_rows, d, is_first, interpret):
    """``out[r, l] = flat[r*128 + l - d]`` (d > 0): the backward shift of
    :func:`_flat_shift`, reading underflow elements from the previous
    block's last row (``prev_rows[7]``).  On the first grid block the
    underflowing lanes are forced to zero (there is no previous data;
    the XLA mirror prepends zeros)."""
    row_i = jax.lax.broadcasted_iota(jnp.int32, X.shape, 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
    A = _roll(X, d, 1, interpret)
    Xup = _roll(X, 1, 0, interpret)
    Xup = jnp.where(
        row_i == 0, jnp.broadcast_to(prev_rows[7:8, :], X.shape), Xup
    )
    B = _roll(Xup, d, 1, interpret)
    out = jnp.where(lane_i >= d, A, B)
    return jnp.where(is_first & (row_i == 0) & (lane_i < d), 0, out)


def _window_offsets(spc: int, l16: int):
    """First word offset (relative to a cell's first word) covering the
    candidate windows ``[p - (s-1), p + l16)`` of the cell at byte ``p``
    (negative: windows of non-zero alignment start before the cell).
    The upper word bound is implicit in the byte offsets
    :func:`_prefix_hash_select` actually requests."""
    s = 4 * spc
    return -((s - 1 + 3) // 4)


def _align_bit_i32(j: int) -> int:
    """Two's-complement int32 value of alignment bit ``1 << j`` — what
    ``low = w & -w`` evaluates to in int32 when bit ``j`` is the lowest
    set bit.  For ``j == 31`` (stride 32) the Python literal ``1 << 31``
    overflows int32 at trace time and, even promoted, would never equal
    the INT32_MIN the lowest-set-bit trick produces — both bugs the
    round-4 advisor flagged (ADVICE.md high)."""
    v = 1 << j
    return v - (1 << 32) if v >= (1 << 31) else v


def _prefix_hash_select(get_plane, w, s, l16, c_min):
    """Rolling prefix-hash of every cell's single-alignment candidate.

    For each cell at byte ``p`` with coarse word ``w``, the candidate
    window of alignment ``j`` is ``[p - j, p - j + l16)``.  Computes all
    ``s`` window hashes by one base hash + ``s-1`` O(1) rolling steps
    (leading byte removed via the static ``K^(l16-1)`` weight, trailing
    byte appended), then selects the hash of the alignment named by the
    LOWEST set bit of ``w`` — exactly the single-candidate case the
    caller refines; multi-bit cells are passed through unrefined.

    ``get_plane(c)`` returns the corpus word at offset ``c`` from the
    cell's first word; bytes are extracted lazily and memoized."""
    K = jnp.uint32(GRAM_BASE)
    KL = jnp.uint32(pow(GRAM_BASE, l16 - 1, 1 << 32))
    plane_memo = {}
    byte_memo = {}

    def b(x):
        if x not in byte_memo:
            c, k = c_min + x // 4, x % 4
            if c not in plane_memo:
                plane_memo[c] = get_plane(c)
            byte_memo[x] = (
                plane_memo[c].astype(jnp.uint32) >> jnp.uint32(8 * k)
            ) & jnp.uint32(0xFF)
        return byte_memo[x]

    smask = (1 << s) - 1 if s < 32 else -1
    w8 = w & smask
    low = w8 & (0 - w8)  # lowest set bit (0 when no bits)
    off = -4 * c_min - (s - 1)  # window start byte of alignment s-1
    H = jnp.zeros(w.shape, jnp.uint32)
    for i in range(l16):
        H = H + b(off + i) * jnp.uint32(pow(GRAM_BASE, l16 - 1 - i, 1 << 32))
    h = jnp.where(low == _align_bit_i32(s - 1), H.astype(jnp.int32), 0)
    for j in range(s - 2, -1, -1):
        H = (H - b(off) * KL) * K + b(off + l16)
        off += 1
        h = jnp.where(low == _align_bit_i32(j), H.astype(jnp.int32), h)
    return h


def _prefix_slot_probe(pb_ref, h, prefix_salts, prefix_log2, pb_rows):
    """Block-wide prefix-bit-bloom probe of the extracted slot hashes:
    AND over ``prefix_salts`` of bit ``slot & 31`` of word ``slot >> 5``
    fetched by the bank-select chain over the ``[pb_rows, 128]`` VMEM
    table.  ``h`` is any ``[R, 128]`` block (the slot tile)."""
    R = h.shape[0]
    ok = None
    for salt in prefix_salts:
        hh = (h.astype(jnp.uint32) ^ jnp.uint32(salt)) * jnp.uint32(KNUTH)
        slot = (hh >> jnp.uint32(32 - prefix_log2)).astype(jnp.int32)
        word_i = slot >> 5
        lane = word_i & 127
        brow = word_i >> 7

        def bank_body(b, acc, lane=lane, brow=brow):
            row = jnp.broadcast_to(pb_ref[pl.ds(b, 1), :], (R, 128))
            g = jnp.take_along_axis(row, lane, axis=1)
            return jnp.where(brow == b, g, acc)

        word = jax.lax.fori_loop(
            0, pb_rows, bank_body, jnp.zeros((R, 128), jnp.int32)
        )
        bit = (word >> (slot & 31)) & 1
        ok = bit if ok is None else (ok & bit)
    return ok


def prefix_refine_words(w, hval, ok, stride):
    """Shared single-alignment refinement rule: zero the long word of a
    slot whose single coarse alignment bit failed the prefix probe;
    multi-bit slots pass unrefined (exactness never rests on a bloom).
    Pure elementwise — used both in-kernel and by the XLA mirrors."""
    smask = (1 << stride) - 1 if stride < 32 else -1
    v = w & smask
    single = (v != 0) & ((v & (v - 1)) == 0)
    keep = (jnp.logical_not(single)) | (ok == 1)
    return jnp.where(keep, w, 0)


def _fused_kernel(
    salts, log2_rows, n_banks, pack, q, spc, mpr, block_r, n_grid, l16,
    prefix_on, gram_weights, has_shorts, interpret, prefix_salts,
    prefix_log2, pb_rows, *refs
):
    """One grid step of the fused sampled filter (the whole round-4
    headline chain, docs/PERF_NOTES.md):

    1. assemble the q-gram code of every grid cell from the ``spc``
       corpus word *phases* (plane at word offset ``c`` = phase ``c %
       spc`` flat-shifted ``c // spc`` cells — pure rolls, no gathers),
       replacing the separate XLA codes pass AND the [B, M] code
       materialization;
    2. probe the k salted VMEM bank blooms (``_bank_probe``);
    3. with ``prefix_on``, compute every cell's rolling full-prefix
       window hash and select the one named by the cell's single
       alignment bit (``_prefix_hash_select``) — stage 2 then refines
       each slot with ONE bloom probe of ``l16`` corpus bytes, killing
       the true-q-gram-collision stray floor the old fine re-probe
       could not see (a 6-letter q=9 corpus matches real pattern grams
       at ~1.6e-3/cell — 25k false windows per 128 MiB that previously
       went to window verification);
    4. rank-extract survivors per *block column* (groups of ``block_r``
       cells): a sublane cumsum ranks each column's hits and slot ``k``
       captures the (k+1)-th hit's row / word / hash by masked sublane
       sums — lane-major ``[mpr, 128]`` outputs, replacing the XLA
       cumsum/extract passes over the full w grid.

    Cross-row gram semantics: a cell whose gram overruns its document
    row reads the NEXT row's bytes (flat corpus), not zeros — such a
    cell can never be a true long-pattern hit (a true hit's gram lies
    inside the occurrence), so this only perturbs stray cells, which
    refinement + window verify discard.  Cells past ``n_grid`` (grid
    padding) are masked out of ``hit`` entirely."""
    n_words = (q - 1) // 4 + 1
    table_ref = refs[0]
    phases = refs[1 : 1 + spc]
    nexts = refs[1 + spc : 1 + 2 * spc]
    pos = 1 + 2 * spc
    prevs = refs[pos : pos + spc] if prefix_on else ()
    pos += spc if prefix_on else 0
    sw_ref = refs[pos] if has_shorts else None
    pos += 1 if has_shorts else 0
    pb_ref = refs[pos] if pb_rows else None
    pos += 1 if pb_rows else 0
    mll_ref = refs[pos]
    r_ref, w_ref, swo_ref, h_ref, cnt_ref = refs[pos + 1 : pos + 6]

    i = pl.program_id(0)
    plane_memo = {}

    def get_plane(c):
        if c not in plane_memo:
            ph, d = c % spc, c // spc
            X = phases[ph][...]
            if d == 0:
                plane_memo[c] = X
            elif d > 0:
                plane_memo[c] = _flat_shift(
                    X, nexts[ph][0:1, :], d, block_r, interpret
                )
            else:
                plane_memo[c] = _flat_shift_neg(
                    X, prevs[ph], -d, i == 0, interpret
                )
        return plane_memo[c]

    code = jnp.zeros((block_r, 128), jnp.uint32)
    for j in range(q):
        j4, k = divmod(j, 4)
        byte = (
            get_plane(j4).astype(jnp.uint32) >> jnp.uint32(8 * k)
        ) & jnp.uint32(0xFF)
        code = code + byte * jnp.uint32(gram_weights[j])
    code = code.astype(jnp.int32)

    w = _bank_probe(table_ref, code, salts, log2_rows, n_banks, pack)
    w = jnp.where(mll_ref[0, 0] > 0, w, 0)
    sw = sw_ref[...] if has_shorts else jnp.zeros_like(w)

    if prefix_on:
        c_min = _window_offsets(spc, l16)
        hval = _prefix_hash_select(get_plane, w, 4 * spc, l16, c_min)
    else:
        hval = code  # callers fall back to the q-gram fine re-probe

    row_i = jax.lax.broadcasted_iota(jnp.int32, (block_r, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (block_r, 128), 1)
    cell = (i * block_r + row_i) * 128 + lane_i
    hit = ((w | sw) != 0) & (cell < n_grid)
    hi = hit.astype(jnp.int32)
    # cnt block is (8, 128) — the TPU block minimum — holding the count
    # broadcast down its sublanes; the wrapper reads row 0 of each block
    cnt_ref[...] = jnp.broadcast_to(
        jnp.sum(hi, axis=0, keepdims=True), (8, 128)
    )
    # sublane cumsum by log2(block_r) shifted adds
    ranks = hi
    d = 1
    while d < block_r:
        sh = _roll(ranks, d, 0, interpret)
        ranks = ranks + jnp.where(row_i >= d, sh, 0)
        d *= 2
    r_rows, w_rows, h_rows, sw_rows = [], [], [], []
    for k in range(mpr):
        sel = hit & (ranks == k + 1)  # <= one row per column
        r_rows.append(
            jnp.sum(jnp.where(sel, row_i + 1, 0), axis=0, keepdims=True)
            - 1
        )
        w_rows.append(
            jnp.sum(jnp.where(sel, w, 0), axis=0, keepdims=True)
        )
        h_rows.append(
            jnp.sum(jnp.where(sel, hval, 0), axis=0, keepdims=True)
        )
        if has_shorts:
            sw_rows.append(
                jnp.sum(jnp.where(sel, sw, 0), axis=0, keepdims=True)
            )
    w_slab = jnp.concatenate(w_rows, axis=0)  # [mpr, 128]
    h_slab = jnp.concatenate(h_rows, axis=0)
    if pb_rows and prefix_on:
        # stage-2a absorbed: the extracted slot tile probes the small
        # VMEM prefix bloom right here (the slots are already in
        # registers; the XLA re-read cost ~1-3 ms of the round-5
        # headline pass, benchmarks/probe_stage_budget.py)
        ok = _prefix_slot_probe(
            pb_ref, h_slab, prefix_salts, prefix_log2, pb_rows
        )
        w_slab = prefix_refine_words(w_slab, h_slab, ok, 4 * spc)
    r_ref[...] = jnp.concatenate(r_rows, axis=0)
    w_ref[...] = w_slab
    h_ref[...] = h_slab
    if has_shorts:
        swo_ref[...] = jnp.concatenate(sw_rows, axis=0)
    else:
        swo_ref[...] = jnp.zeros((mpr, 128), jnp.int32)


def _bank_probe_xla(table, code, salts, log2_rows, pack):
    """Pure-XLA mirror of ``_bank_probe`` (flat bloom take); shared by
    the bloom_word_vmem and fused-kernel interpret paths."""
    N = (1 << log2_rows) // pack  # physical words per probe table
    sw = 32 // pack
    words_flat = table.reshape(-1)
    acc = None
    for p, salt in enumerate(salts):
        h = (code.astype(jnp.uint32) ^ jnp.uint32(salt)) * jnp.uint32(
            KNUTH
        )
        rows = (h >> jnp.uint32(32 - log2_rows)).astype(jnp.int32)
        if pack > 1:
            lane = rows & 127
            bank = rows >> 7
            phys = (bank // pack) * 128 + lane
            got = jnp.take(words_flat, p * N + phys)
            got = (
                (got.astype(jnp.uint32) >> ((bank % pack) * sw))
                & jnp.uint32((1 << sw) - 1)
            ).astype(jnp.int32)
        else:
            got = jnp.take(words_flat, p * N + rows)
        acc = got if acc is None else (acc & got)
    return acc


def _fused_extract_xla(
    table, phase_g, sw_g, mll, salts, log2_rows, pack, q, spc, mpr,
    block_r, n_blocks, n_grid, l16, prefix_on, gram_weights,
    prefix_table=None, prefix_salts=(), prefix_log2=0,
):
    """Exact XLA mirror of the fused kernel (same plane/grouping/slot/
    hash semantics) for CPU runs and shard_map interpret mode."""
    R_pad = n_blocks * block_r
    tot = R_pad * 128

    def get_plane(c):
        ph, d = c % spc, c // spc
        pf = phase_g[ph].reshape(-1)
        if d >= 0:
            return jax.lax.dynamic_slice_in_dim(pf, d, tot, 0)
        # kernel semantics: the corpus has no bytes before offset 0
        return jnp.concatenate(
            [jnp.zeros((-d,), pf.dtype), pf[: tot + d]]
        )

    code = jnp.zeros((tot,), jnp.uint32)
    for j in range(q):
        j4, k = divmod(j, 4)
        byte = (
            get_plane(j4).astype(jnp.uint32) >> jnp.uint32(8 * k)
        ) & jnp.uint32(0xFF)
        code = code + byte * jnp.uint32(gram_weights[j])
    code = code.astype(jnp.int32)
    w = _bank_probe_xla(table, code, salts, log2_rows, pack)
    w = jnp.where(mll[0, 0] > 0, w, 0)
    sw = sw_g.reshape(-1) if sw_g is not None else jnp.zeros_like(w)
    if prefix_on:
        c_min = _window_offsets(spc, l16)
        hval = _prefix_hash_select(get_plane, w, 4 * spc, l16, c_min)
    else:
        hval = code
    r_s, w_s, swo_s, h_s, cnt = group_rank_extract(
        w, sw, hval, block_r, mpr, n_blocks, n_grid
    )
    if prefix_table is not None and prefix_on:
        # mirror of the in-kernel slot refinement (same probed word)
        words_flat = prefix_table.reshape(-1)
        ok = None
        for salt in prefix_salts:
            hh = (h_s.astype(jnp.uint32) ^ jnp.uint32(salt)) * jnp.uint32(
                KNUTH
            )
            slot = (hh >> jnp.uint32(32 - prefix_log2)).astype(jnp.int32)
            word = jnp.take(words_flat, slot >> 5)
            bit = (word >> (slot & 31)) & 1
            ok = bit if ok is None else (ok & bit)
        w_s = prefix_refine_words(w_s, h_s, ok, 4 * spc)
    return r_s, w_s, swo_s, h_s, cnt


def group_rank_extract(w, sw, hval, block_r, mpr, n_blocks, n_grid):
    """Pure-XLA survivor rank extraction per block column — the exact
    mirror of the fused kernel's stage 4, shared by the interpret path
    and the grouped take-path filter (which replaces its former
    17 ns/element flat nonzero compaction with this, VERDICT r3 #4a).
    Inputs are flat ``[n_blocks * block_r * 128]`` arrays; returns
    ``(r_s, w_s, swo_s, h_s, cnt)`` in the fused kernel's slot layout."""
    tot = n_blocks * block_r * 128
    cell = jnp.arange(tot, dtype=jnp.int32)
    hit = ((w | sw) != 0) & (cell < n_grid)

    def g3(x):
        return x.reshape(n_blocks, block_r, 128)

    w3, sw3, c3, h3 = g3(w), g3(sw), g3(hval), g3(hit)
    hi = h3.astype(jnp.int32)
    cnt = jnp.sum(hi, axis=1)  # [n_blocks, 128]
    ranks = jnp.cumsum(hi, axis=1)
    row_i = jax.lax.broadcasted_iota(
        jnp.int32, (n_blocks, block_r, 128), 1
    )
    r_s, w_s, swo_s, c_s = [], [], [], []
    for k in range(mpr):
        sel = h3 & (ranks == k + 1)
        r_s.append(jnp.sum(jnp.where(sel, row_i + 1, 0), axis=1) - 1)
        w_s.append(jnp.sum(jnp.where(sel, w3, 0), axis=1))
        swo_s.append(jnp.sum(jnp.where(sel, sw3, 0), axis=1))
        c_s.append(jnp.sum(jnp.where(sel, c3, 0), axis=1))

    def st(parts):  # [n_blocks, mpr, 128] -> [n_blocks * mpr, 128]
        return jnp.stack(parts, axis=1).reshape(n_blocks * mpr, 128)

    return st(r_s), st(w_s), st(swo_s), st(c_s), cnt


@functools.partial(
    jax.jit,
    static_argnames=(
        "salts", "log2_rows", "pack", "q", "spc", "mpr", "block_r",
        "n_grid", "l16", "prefix_on", "prefix_salts", "prefix_log2",
        "interpret", "force_pallas",
    ),
)
def fused_sampled_extract(
    table: jax.Array,  # [k * n_banks / pack, 128] int32 packed bank rows
    phase_g: tuple,  # spc arrays [R_pad + 8, 128] int32 corpus word phases
    sw_g,  # [R_pad, 128] int32 short-start words, or None
    mll: jax.Array,  # [1, 1] int32 min_long_len
    salts: tuple,
    log2_rows: int,
    pack: int,
    q: int,
    spc: int,  # corpus words per grid cell (stride // 4)
    mpr: int,  # slots per block column (multiple of 8)
    block_r: int,
    n_grid: int,  # valid cells (B * M); the rest is padding
    l16: int = 0,  # prefix-hash window bytes (min(min_long, 16))
    prefix_on: bool = False,
    prefix_table=None,  # [pb_rows, 128] int32 small prefix bit bloom
    prefix_salts: tuple = (),
    prefix_log2: int = 0,
    interpret: bool = False,
    force_pallas: bool = False,
):
    """Fused codes+probe+rank-extract dispatch.  Returns ``(r_s, w_s,
    swo_s, h_s, cnt)`` with slot arrays ``[n_blocks * mpr, 128]`` (block
    ``i``'s slots at rows ``[i*mpr, (i+1)*mpr)``; ``r_s`` = row within
    block, -1 when empty) and ``cnt [n_blocks, 128]`` the per-column true
    survivor counts (overflow signal: ``max(cnt) > mpr`` means slots were
    dropped and the launch must retry with a bigger ``cap_coarse``).
    ``h_s`` is the slot's selected full-prefix window hash when
    ``prefix_on`` (see ``_prefix_hash_select``), else its q-gram code."""
    assert mpr % 8 == 0, "slot rows must tile the sublane dim"
    R_pad = phase_g[0].shape[0] - 8
    n_blocks = R_pad // block_r
    n_banks = (1 << log2_rows) // 128
    has_shorts = sw_g is not None
    gram_weights = tuple(
        int(pow(GRAM_BASE, q - 1 - j, 1 << 32)) for j in range(q)
    )
    pb_rows = prefix_table.shape[0] if prefix_table is not None else 0
    if interpret and not force_pallas:
        return _fused_extract_xla(
            table, phase_g, sw_g, mll, salts, log2_rows, pack, q, spc,
            mpr, block_r, n_blocks, n_grid, l16, prefix_on, gram_weights,
            prefix_table=prefix_table, prefix_salts=prefix_salts,
            prefix_log2=prefix_log2,
        )
    try:
        vma = jax.typeof(phase_g[0]).vma
    except AttributeError:  # pragma: no cover - older jax
        vma = None

    def sds(shape):
        if vma:
            return jax.ShapeDtypeStruct(shape, jnp.int32, vma=vma)
        return jax.ShapeDtypeStruct(shape, jnp.int32)

    nb8 = block_r // 8
    in_specs = [
        pl.BlockSpec(
            (len(salts) * n_banks // pack, 128), lambda i: (0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    in_specs += [
        pl.BlockSpec((block_r, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(spc)
    ]
    in_specs += [
        pl.BlockSpec((8, 128), lambda i, nb8=nb8: ((i + 1) * nb8, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(spc)
    ]
    args = [table, *phase_g, *phase_g]
    if prefix_on:
        # previous block's last rows per phase (block 0 clamps to its
        # own first rows; the kernel zero-masks that case)
        in_specs += [
            pl.BlockSpec(
                (8, 128),
                lambda i, nb8=nb8: (jnp.maximum(i * nb8 - 1, 0), 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(spc)
        ]
        args += list(phase_g)
    if has_shorts:
        in_specs.append(
            pl.BlockSpec((block_r, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(sw_g)
    if pb_rows:
        in_specs.append(
            pl.BlockSpec((pb_rows, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(prefix_table)
    in_specs.append(
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    )
    args.append(mll)
    slot_spec = pl.BlockSpec((mpr, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _fused_kernel, salts, log2_rows, n_banks, pack, q, spc, mpr,
            block_r, n_grid, l16, prefix_on, gram_weights, has_shorts,
            interpret, prefix_salts, prefix_log2, pb_rows,
        ),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[
            slot_spec, slot_spec, slot_spec, slot_spec,
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            sds((n_blocks * mpr, 128)),
            sds((n_blocks * mpr, 128)),
            sds((n_blocks * mpr, 128)),
            sds((n_blocks * mpr, 128)),
            sds((n_blocks * 8, 128)),
        ],
        # the block-1024 working set (double-buffered phases + planes +
        # per-salt hash intermediates, round-5: + the select tree's
        # per-row gathered values and the slot-refinement table) sits
        # right at the default 16M scoped-vmem cap; headroom to 32M
        # keeps block_r=1024, whose per-bank addressing amortization is
        # worth ~2.5x vs 256-row blocks (probe_blockr.py; a 24M cap
        # still OOM'd at the match-dense mpr=24 slot shapes)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    r_s, w_s, swo_s, c_s, cnt8 = out
    cnt = cnt8.reshape(n_blocks, 8, 128)[:, 0, :]
    return r_s, w_s, swo_s, c_s, cnt


def _kernel(n_banks: int, bloom_ref, slots_ref, out_ref):
    def body(r, _):
        sub = slots_ref[pl.ds(r * SUB, SUB), :]  # [8, 128] slot indices
        word = sub >> 5
        lane = word & 127
        bank = word >> 7
        bit = sub & 31
        acc = jnp.zeros((SUB, 128), jnp.int32)
        for b in range(n_banks):
            tab8 = jnp.broadcast_to(bloom_ref[b][None, :], (SUB, 128))
            g = jnp.take_along_axis(tab8, lane, axis=1)
            acc = jnp.where(bank == b, g, acc)
        out_ref[pl.ds(r * SUB, SUB), :] = (acc >> bit) & 1
        return 0

    jax.lax.fori_loop(0, BLOCK_R // SUB, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bloom_hit_pallas(
    words: jax.Array,  # [W] int32 bloom words, W % 128 == 0
    slots: jax.Array,  # [...] int32 slot indices into W*32 bits
    interpret: bool = False,
) -> jax.Array:
    """Per-slot bloom bit (same contract as filter_jax.bloom_hit_take)."""
    shape = slots.shape
    flat = slots.reshape(-1)
    n = flat.shape[0]
    cols = 128
    rows = -(-n // cols)
    rows_pad = -(-rows // BLOCK_R) * BLOCK_R
    padded = jnp.zeros((rows_pad * cols,), jnp.int32).at[:n].set(flat)
    grid_slots = padded.reshape(rows_pad, cols)
    n_banks = words.shape[0] // 128
    banks = words.reshape(n_banks, 128)

    out = pl.pallas_call(
        functools.partial(_kernel, n_banks),
        grid=(rows_pad // BLOCK_R,),
        in_specs=[
            pl.BlockSpec((n_banks, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_R, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, cols), jnp.int32),
        interpret=interpret,
    )(banks, grid_slots)
    return out.reshape(-1)[:n].reshape(shape)
