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

from .filter_jax import KNUTH

#: rows of 128 lanes per grid step.  Per bank step the kernel pays a
#: dynamic-slice addressing cost once per block; at 256 rows that is
#: ~43% of the step (measured 33 -> 26.3 ms per 16.8M codes going
#: 256 -> 1024, benchmarks/probe_blockr.py).  1024 rows = 1 MiB in+out
#: per step, far under VMEM.
BLOCK_R = 1024
SUB = 8  # Mosaic gather tile height


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
    shift = jnp.uint32(32 - log2_rows)
    R = codes_ref.shape[0]
    c = codes_ref[...]
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

        def bank_body(b, acc, lane=lane, prow=prow, sub_shift=sub_shift,
                      p=p):
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
    out_ref[...] = acc_all


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
        N = (1 << log2_rows) // pack  # physical words per probe table
        sw = 32 // pack
        words_flat = table.reshape(-1)
        acc = None
        for p, salt in enumerate(salts):
            h = (flat.astype(jnp.uint32) ^ jnp.uint32(salt)) * jnp.uint32(
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
        return acc.reshape(shape)
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
        interpret=interpret,
    )(table, grid_codes)
    return out.reshape(-1)[:n].reshape(shape)


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
