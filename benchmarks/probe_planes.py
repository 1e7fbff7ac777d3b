"""Round-3 probe: cell-aligned word-plane gram codes.

The measured 36.6 ms of the 128 MiB headline pass spent in
``sampled_gram_codes`` (probe_vmem_breakdown) is the [B, M, stride]
reshape: a minor dim of 8 gets (8,128)-tiled -> 16x physical padding on
every materialized intermediate.  With stride % 4 == 0, the q gram bytes
of cell m live in words ``(stride/4)*m + j4`` for j4 in 0..(q-1)//4 —
each a *cell-aligned plane*: P_j4[cell] laid out exactly like the grid.
Codes become pure elementwise shifts/multiplies over [Ro, 128] planes.

Measures, on the real chip (128 MiB corpus, q=9 stride=8):
  A  sampled_gram_codes (status quo)
  B  device word-pack: chunks[:, k::4] strided-lane combine -> [B, L/4]
  C  device planes from words: words[:, j4%spc::spc] + cell shift
  D  XLA elementwise codes from planes
  E  host numpy plane build time
  +  exact equality of D vs A on the real grid cells

Self-bounded; persistent compile cache.
"""
from __future__ import annotations

import os as _os
import sys
import time

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import numpy as np

Q, STRIDE = 9, 8
GRAM_BASE = 0x01000193  # matches ops/filter_jax.GRAM_BASE? (checked below)


def host_planes(chunks: np.ndarray, stride: int, q: int):
    """[B, L] u8 -> list of [B, M] int32 cell-aligned word planes."""
    B, L = chunks.shape
    assert stride % 4 == 0 and L % stride == 0
    spc = stride // 4
    M = L // stride
    words = np.ascontiguousarray(chunks).view(np.uint32).reshape(B, M, spc)
    P = (q - 1) // 4 + 1
    planes = []
    for j4 in range(P):
        shift, idx = divmod(j4, spc)
        pl = words[:, :, idx]
        if shift:
            pl = np.concatenate(
                [pl[:, shift:], np.zeros((B, shift), np.uint32)], axis=1
            )
        planes.append(np.ascontiguousarray(pl).view(np.int32))
    return planes


def main():
    import jax
    import jax.numpy as jnp

    from php_aho_corasick_tpu.ops import filter_jax as fj

    print("devices:", jax.devices(), flush=True)
    base = fj.GRAM_BASE
    print("GRAM_BASE:", hex(base), flush=True)

    rng = np.random.default_rng(42)
    B, L = 32768, 4096  # 128 MiB
    chunks = rng.integers(0, 256, (B, L), dtype=np.uint8)
    ch = jnp.asarray(chunks)
    total = B * L

    def timed(name, fn, reps=3):
        fn()
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        dt = min(times)
        print(f"{name:28s} {dt*1e3:8.2f} ms ({total/dt/1e9:7.3f} GB/s)",
              flush=True)
        return dt

    # A: status quo
    def run_a():
        c = fj.sampled_gram_codes(ch, Q, STRIDE)
        return float(jnp.sum(c[0, :1]))

    timed("A sampled_gram_codes", run_a)

    # B: device word-pack via strided lane slices
    @jax.jit
    def word_pack(x):
        w = None
        for k in range(4):
            part = x[:, k::4].astype(jnp.uint32) << jnp.uint32(8 * k)
            w = part if w is None else (w | part)
        return w.astype(jnp.int32)

    def run_b():
        w = word_pack(ch)
        return float(jnp.sum(w[0, :1]))

    timed("B device word-pack", run_b)

    # C: device planes from device words
    spc = STRIDE // 4
    M = L // STRIDE
    P = (Q - 1) // 4 + 1
    words_d = word_pack(ch)
    words_d.block_until_ready()

    @jax.jit
    def planes_from_words(w):
        outs = []
        for j4 in range(P):
            shift, idx = divmod(j4, spc)
            pl = w[:, idx::spc]
            if shift:
                pl = jnp.concatenate(
                    [pl[:, shift:], jnp.zeros((B, shift), pl.dtype)], axis=1
                )
            outs.append(pl)
        return jnp.stack(outs)

    def run_c():
        p = planes_from_words(words_d)
        return float(jnp.sum(p[0, 0, :1]))

    timed("C device planes from words", run_c)

    # D: XLA elementwise codes from (pre-built) planes
    t0 = time.time()
    planes_np = host_planes(chunks, STRIDE, Q)
    host_dt = time.time() - t0
    print(f"E host numpy plane build      {host_dt*1e3:8.2f} ms", flush=True)
    planes_d = jnp.asarray(np.stack(planes_np))
    planes_d.block_until_ready()

    weights = [
        np.uint32(pow(base, Q - 1 - j, 1 << 32)) for j in range(Q)
    ]

    @jax.jit
    def codes_from_planes(p):
        code = jnp.zeros(p.shape[1:], jnp.uint32)
        for j in range(Q):
            j4, k = divmod(j, 4)
            byte = (p[j4].astype(jnp.uint32) >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
            code = code + byte * weights[j]
        return code.astype(jnp.int32)

    def run_d():
        c = codes_from_planes(planes_d)
        return float(jnp.sum(c[0, :1]))

    timed("D codes from planes (XLA)", run_d)

    # D2: fused B+C+D from raw chunks, one jit (what one-shot scans would run)
    @jax.jit
    def codes_from_chunks(x):
        return codes_from_planes(planes_from_words(word_pack(x)))

    def run_d2():
        c = codes_from_chunks(ch)
        return float(jnp.sum(c[0, :1]))

    timed("D2 chunks->planes->codes jit", run_d2)

    # correctness: D vs A
    ref = np.asarray(fj.sampled_gram_codes(ch, Q, STRIDE))
    got = np.asarray(codes_from_planes(planes_d))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    eq = (got == ref).all()
    print("D == A exact:", bool(eq), flush=True)
    if not eq:
        bad = np.argwhere(got != ref)[:5]
        print("first diffs:", bad, ref[tuple(bad[0])], got[tuple(bad[0])])
    # C vs host planes
    got_c = np.asarray(planes_from_words(words_d))
    ref_c = np.stack(planes_np)
    print("C == E exact:", bool((got_c == ref_c).all()), flush=True)
    return 0 if eq else 1


if __name__ == "__main__":
    sys.exit(main())
