"""Probe 5: decompose filter_hits_sampled at headline shape (128 MiB).

probe_mxu_lookup.py measured a dispatch-amortized flat jnp.take at
~139 M lookups/s — nearly 2x the 72 M/s the round-1 filter breakdown
attributed to the bloom gather.  This probe times the full sampled filter
and each constituent at the exact headline shape (B=32768, L=4096,
stride 8, q=9, 2^24-word table) to find where the 2x went.

Each variant is a jitted fn returning a small result; timing dispatches
``reps`` calls back-to-back and fetches once (axon: block_until_ready is
a no-op; a host fetch is the only sync).  Self-bounded; never kill
externally (a mid-work kill wedges the grant).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)), ".."))

from php_aho_corasick_tpu.ops.filter_jax import (  # noqa: E402
    KNUTH,
    filter_hits_sampled,
    sampled_gram_codes,
)
from php_aho_corasick_tpu.ops.scan_jax import blocked_nonzero  # noqa: E402

B, L = 32768, 4096  # 128 MiB
Q, S = 9, 8
M = L // S  # 512
SALT = 0x85EBCA6B


def timed(name, fn, args, reps=4):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[-1])  # compile+sync
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    _ = [np.asarray(jax.tree_util.tree_leaves(o)[-1]) for o in outs]
    dt = (time.perf_counter() - t0) / reps
    print(f"[probe5] {name:34s} {dt * 1e3:8.2f} ms/pass", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(7)
    chunks = jnp.asarray(
        rng.integers(97, 103, size=(B, L), dtype=np.uint8)
    )
    lengths = jnp.full((B,), L, jnp.int32)
    for log2w, tag in ((24, "24/64MiB"), (19, "19/2MiB")):
        words = jnp.asarray(
            rng.integers(0, 3, size=(1 << log2w), dtype=np.int32) == 0,
            dtype=jnp.int32,
        ) * 0  # all-zero: headline zero-match regime (gather cost identical)
        if log2w == 24:
            words24 = words

        @jax.jit
        def full(w, ch, ln):
            return filter_hits_sampled(
                w, ch, ln, jnp.int32(16), q=Q, stride=S,
                log2_words=log2w, salts=(SALT,), shorts=(), capacity=4096,
            )[3]

        timed(f"full filter (log2w={tag})", full, (words, chunks, lengths))

    widx = jnp.asarray(
        rng.integers(0, 1 << 24, size=(B, M), dtype=np.int32)
    )

    @jax.jit
    def codes_only(ch):
        return jnp.sum(sampled_gram_codes(ch, Q, S))

    timed("codes only", codes_only, (chunks,))

    @jax.jit
    def codes_hash_gather(w, ch):
        code = sampled_gram_codes(ch, Q, S)
        h = (code.astype(jnp.uint32) ^ jnp.uint32(SALT)) * jnp.uint32(KNUTH)
        wi = (h >> jnp.uint32(32 - 24)).astype(jnp.int32)
        return jnp.sum(jnp.take(w, wi))

    timed("codes+hash+gather24", codes_hash_gather, (words24, chunks))

    @jax.jit
    def gather_2d(w, wi):
        return jnp.sum(jnp.take(w, wi))

    timed("gather24 pre-idx [B,M]", gather_2d, (words24, widx))

    @jax.jit
    def gather_1d(w, wi):
        return jnp.sum(jnp.take(w, wi.reshape(-1)))

    timed("gather24 pre-idx flat 1D", gather_1d, (words24, widx))

    @jax.jit
    def gather_scan8(w, wi):
        wr = wi.reshape(8, (B // 8) * M)

        def step(acc, ii):
            return acc + jnp.sum(jnp.take(w, ii)), None

        acc, _ = jax.lax.scan(step, jnp.int32(0), wr)
        return acc

    timed("gather24 lax.scan 8 slabs", gather_scan8, (words24, widx))

    words19 = jnp.zeros((1 << 19,), jnp.int32)
    widx19 = jnp.asarray(
        rng.integers(0, 1 << 19, size=(B, M), dtype=np.int32)
    )

    @jax.jit
    def gather19(w, wi):
        return jnp.sum(jnp.take(w, wi))

    timed("gather19 pre-idx [B,M]", gather19, (words19, widx19))

    mask = jnp.zeros((B * M,), jnp.bool_)

    @jax.jit
    def compact(mk):
        return blocked_nonzero(mk, 4096)[1]

    timed("blocked_nonzero [B*M]", compact, (mask,))

    print("[probe5] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
