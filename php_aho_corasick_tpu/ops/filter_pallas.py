"""Pallas bloom-membership kernel for the cascade engine.

TPU v5e's only fast gather is the Mosaic lane-local ``take_along_axis`` on
same-shape [8, 128] tiles.  A bloom word table of ``W`` int32 words is laid
out as ``[W/128, 128]`` banks; each slot lookup decomposes into
``(bank, lane, bit)`` and the kernel resolves the bank dimension with an
unrolled gather+select over banks — pure VPU work, no scalar-gather unit.

Cost per element is ~``n_banks`` vector ops, so this pays off when the
bloom is small (2^15..2^17 bits -> 8..32 banks) — exactly the cascade's
regime.  The XLA fallbacks (``take``/one-hot ``matmul``) live in
filter_jax.py; this kernel is selected via ``ScanConfig.bloom_impl``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 256  # rows of 128 lanes per grid step
SUB = 8  # Mosaic gather tile height


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
