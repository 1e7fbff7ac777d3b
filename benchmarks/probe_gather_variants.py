"""Probe 3: XLA gather formulations on the real chip.

The sampled-cascade filter spends ~58 ms / 32 MiB on 4.2M bloom-word
gathers (the ~72 M lookups/s wall, docs/PERF_NOTES.md).  Round-1 data
shows the SAME gather primitive reaching 122 M/s inside a lax.scan, so
the wall is formulation-dependent.  This probe measures candidate
formulations for the identical logical job:

  out[i] = table[idx[i]]   (4.2M lookups, 1M-word int32 table)

variants: flat take; scan-of-slabs; fori_loop-of-slabs; per-lane-column
take_along_axis (lane-batched gather); one-hot bf16 matmul (exactness
check included); int16 table.
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

W_LOG2 = 20
W = 1 << W_LOG2  # 4 MiB int32 table
N = 1 << 22  # 4.2M lookups


def timeit(name, f, *args, reps=5):
    """Times f with a device-side checksum reduction — fetching the full
    result would be relay-bound (~33 MB/s tunnel), not compute-bound."""
    import functools

    @jax.jit
    def g(*a):
        return jnp.sum(f(*a), dtype=jnp.int64) if f(*a).dtype != jnp.float32 \
            else jnp.sum(f(*a))

    ref = np.asarray(f(*args))  # correctness copy (not timed)
    float(np.asarray(g(*args)).sum())  # compile + sync
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = g(*args)
        np.asarray(r)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(
        f"[probe3] {name:34s} {dt*1e3:8.2f} ms  {N/dt/1e6:7.0f} M lookups/s",
        flush=True,
    )
    return ref, dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    table_np = rng.integers(-(2**31), 2**31, size=W, dtype=np.int32)
    idx_np = rng.integers(0, W, size=N, dtype=np.int32)
    want = table_np[idx_np]

    table = jnp.asarray(table_np)
    idx = jnp.asarray(idx_np)

    @jax.jit
    def flat_take(t, i):
        return jnp.take(t, i)

    r, _ = timeit("flat take [4.2M]", flat_take, table, idx)
    assert (r == want).all()

    # scan over slabs (the round-1 122 M/s shape)
    for slab_log2 in (14, 16, 18):
        S = 1 << slab_log2
        steps = N // S

        @jax.jit
        def scan_take(t, i, S=S, steps=steps):
            def step(_, ii):
                return None, jnp.take(t, ii)

            _, out = jax.lax.scan(step, None, i.reshape(steps, S))
            return out

        r, _ = timeit(f"scan take slab=2^{slab_log2}", scan_take, table, idx)
        assert (np.asarray(r).reshape(-1) == want).all()

    # 2D lane-batched gather: table column-replicated [Wr, 128],
    # idx [N/128, 128] gathered along axis 0 with per-lane batching.
    Wr = W // 128  # rows if we SPLIT the table across lanes instead
    tbl2d = jnp.asarray(table_np.reshape(Wr, 128))  # entry w = [w//128, w%128]

    @jax.jit
    def lane_split_gather(t2, i):
        i2 = i.reshape(-1, 128)
        rows = i2 // 128
        cols = i2 % 128
        # take_along_axis over axis 0 with matching lane dim: out[b, j] =
        # t2[rows[b, j], cols[b, j]] needs a two-step: first gather the row
        # (vector of 128), then pick the lane -> use one_hot dot? cheaper:
        # flatten again (this is a control)
        return t2.reshape(-1)[i2]

    r, _ = timeit("reshaped flat control", lane_split_gather, tbl2d, idx)
    assert (np.asarray(r).reshape(-1) == want).all()

    # per-lane INDEPENDENT tables: out[b, j] = t2[i2[b, j], j] — a different
    # problem (each lane only sees its own 1/128 of the table), but if XLA
    # vectorizes it per lane it tells us batched gather is the fast shape.
    @jax.jit
    def lane_batched(t2, i):
        i2 = (i % Wr).reshape(-1, 128)
        return jnp.take_along_axis(t2, i2, axis=0)

    want_lb = np.take_along_axis(
        table_np.reshape(Wr, 128), (idx_np % Wr).reshape(-1, 128), axis=0
    )
    r, _ = timeit("lane-batched take_along_axis", lane_batched, tbl2d, idx)
    assert (np.asarray(r) == want_lb).all()

    # int16 table
    t16_np = table_np.astype(np.int16)
    t16 = jnp.asarray(t16_np)

    @jax.jit
    def flat_take16(t, i):
        return jnp.take(t, i)

    r, _ = timeit("flat take int16", flat_take16, t16, idx)
    assert (np.asarray(r) == t16_np[idx_np]).all()

    # one-hot bf16 matmul lookup on a small BIT table (exactness matters
    # more than speed here: 0/1 bits, single nonzero per row => exact in
    # bf16 if the MXU is sane). W_bits = 4096 so the MAC cost is bounded.
    Wb = 4096
    bits_np = rng.integers(0, 2, size=(Wb, 128)).astype(np.float32)
    bidx_np = rng.integers(0, Wb, size=N // 128, dtype=np.int32)
    bits = jnp.asarray(bits_np, dtype=jnp.bfloat16)
    bidx = jnp.asarray(bidx_np)

    @jax.jit
    def onehot_rows(bm, ii):
        oh = (ii[:, None] == jnp.arange(Wb)[None, :]).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            oh, bm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    r, dt = timeit("one-hot bf16 row-select W=4096", onehot_rows, bits, bidx)
    want_rows = bits_np[bidx_np]
    exact = (np.asarray(r) == want_rows).all()
    print(f"[probe3] one-hot bf16 EXACT: {exact}  "
          f"({(N//128)/dt/1e6:.1f} M row-selects/s)", flush=True)

    # int8 variant
    bits8 = jnp.asarray(bits_np, dtype=jnp.int8)

    @jax.jit
    def onehot_rows8(bm, ii):
        oh = (ii[:, None] == jnp.arange(Wb)[None, :]).astype(jnp.int8)
        return jax.lax.dot_general(
            oh, bm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    try:
        r, dt = timeit("one-hot int8 row-select W=4096", onehot_rows8, bits8, bidx)
        exact8 = (np.asarray(r) == want_rows.astype(np.int32)).all()
        print(f"[probe3] one-hot int8 EXACT: {exact8}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[probe3] int8 matmul FAILED: {str(e)[:200]}", flush=True)

    print("[probe3] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
