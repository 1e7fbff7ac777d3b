"""Round-start Pallas/Mosaic probe on the real TPU chip.

Round 1 finding (docs/PERF_NOTES.md): the axon remote-compile service hung on
Mosaic compilation for ANY pallas_call, even trivial ones.  This script
re-probes at round start, escalating from trivial to the kernels we actually
want (VMEM bloom probe, tile DFA step).  Each stage prints a line BEFORE it
attempts the compile, so a hang is attributable from the log.

Self-bounded: nothing here loops; a Mosaic hang is the only unbounded risk
(and must never be externally killed, per ops notes).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def stage(name):
    print(f"[probe] {name} ...", flush=True)
    return time.perf_counter()


def done(t0, out):
    # axon: block_until_ready does not block; force a host fetch.
    v = np.asarray(out)
    print(f"[probe]   ok in {time.perf_counter() - t0:.2f}s  sum={v.sum()}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)

    # Stage 1: trivial elementwise add, lane-aligned shapes.
    def add_kernel(x_ref, y_ref, o_ref):
        o_ref[...] = x_ref[...] + y_ref[...]

    t0 = stage("stage1: trivial add [8,128] f32")
    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        add_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x, x)
    done(t0, out)

    # Stage 2: int32 add with a grid.
    def add1_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1

    t0 = stage("stage2: gridded int32 add [64,512] grid=(8,)")
    x = jnp.arange(64 * 512, dtype=jnp.int32).reshape(64, 512)
    out = pl.pallas_call(
        add1_kernel,
        grid=(8,),
        in_specs=[pl.BlockSpec((8, 512), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, 512), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((64, 512), jnp.int32),
    )(x)
    done(t0, out)

    # Stage 3: VMEM table gather via one-hot contraction substitute is what we
    # benchmark elsewhere; here probe an actual dynamic gather in-kernel.
    def gather_kernel(tbl_ref, idx_ref, o_ref):
        idx = idx_ref[...]
        o_ref[...] = jnp.take(tbl_ref[...].reshape(-1), idx, axis=0)

    t0 = stage("stage3: in-kernel jnp.take from VMEM table [8,128] idx [8,128]")
    tbl = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    idx = jnp.zeros((8, 128), jnp.int32)
    out = pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(tbl, idx)
    done(t0, out)

    # Stage 4: the real shape of interest — bloom word fetch. 1 MiB VMEM
    # table of int32 words, 128k indices, blocked.
    def bloom_kernel(tbl_ref, idx_ref, o_ref):
        words = tbl_ref[...].reshape(-1)
        idx = idx_ref[...]
        o_ref[...] = jnp.take(words, idx, axis=0)

    t0 = stage("stage4: bloom fetch — 1 MiB VMEM table, [1024,128] int32 idx")
    tbl = jnp.ones((2048, 128), jnp.int32)
    idx = jnp.zeros((1024, 128), jnp.int32)
    out = pl.pallas_call(
        bloom_kernel,
        out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.int32),
    )(tbl, idx)
    done(t0, out)

    print("[probe] ALL STAGES PASSED — Pallas is live on this stack", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
