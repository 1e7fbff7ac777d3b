"""Round-5 probe: stage budget of the signature-scale grouped take path
(VERDICT r4 #4: byte-alphabet 1M needles runs 0.43 GB/s — 14x under
headline).  Synthetic arrays at the exact production shapes (64 MiB,
stride 12, q 5, 2^28-word bloom, mpr from the planner's seeding rule) so
the probe skips the ~35 s build.  Also times candidate replacements for
the rank extraction (top_k).  Self-bounded; never kill externally.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from php_aho_corasick_tpu.ops.filter_jax import (  # noqa: E402
    GRAM_BASE, KNUTH, blocked_nonzero,
)
from php_aho_corasick_tpu.ops.filter_pallas import (  # noqa: E402
    group_rank_extract,
)

REPS = 6


def fetch(x):
    return np.asarray(x)


def timed(label, fn, *args):
    f = jax.jit(fn)
    f(*args)  # warm
    times = []
    for _ in range(3):
        t0 = time.time()
        accs = [f(*args) for _ in range(REPS)]
        fetch(jnp.stack([jnp.ravel(a)[0] for a in accs]))
        times.append((time.time() - t0) / REPS)
    times.sort()
    print(f"{label:>28}: {times[1]*1e3:8.2f} ms")
    return times[1]


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    rng = np.random.default_rng(3)
    # production shapes: 64 MiB corpus, stride 12 -> 5.6M cells
    B, L = 16384, 4104
    stride, q = 12, 5
    M = L // stride
    n_grid = B * M
    log2_w = 28
    print(f"cells={n_grid/1e6:.2f}M  bloom={4 << log2_w >> 30} GiB")
    chunks = jnp.asarray(rng.integers(0, 256, (B, L), dtype=np.uint8))
    words = jnp.asarray(
        rng.integers(0, 2**31, (1 << log2_w,), dtype=np.int64).astype(
            np.int32
        )
    )

    # --- corpus word pack + planes (per launch today)
    spc = stride // 4

    def pack(ch):
        wc = None
        for k in range(4):
            part = ch[:, k::4].astype(jnp.uint32) << jnp.uint32(8 * k)
            wc = part if wc is None else (wc | part)
        return jax.lax.bitcast_convert_type(wc, jnp.int32)

    timed("word pack", pack, chunks)
    wc = pack(chunks)

    def poly(wc):
        planes = []
        for j4 in range((q - 1) // 4 + 1):
            shift, pidx = divmod(j4, spc)
            pl_ = wc[:, pidx::spc]
            if shift:
                pl_ = jnp.concatenate(
                    [pl_[:, shift:], jnp.zeros((B, shift), pl_.dtype)], 1
                )
            planes.append(pl_)
        c = jnp.zeros((B, M), jnp.uint32)
        for j in range(q):
            j4, k = divmod(j, 4)
            byte = (planes[j4] >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
            c = c + byte * np.uint32(pow(GRAM_BASE, q - 1 - j, 1 << 32))
        return c.astype(jnp.int32)

    timed("poly code (1 family)", poly, wc)
    code = poly(wc)

    # --- stage A: single-salt full-grid gather (slab scan)
    def probe_a(words, code):
        NSLAB = 8
        cf = code.reshape(-1)
        slab = -(-n_grid // NSLAB)
        cf = jnp.concatenate(
            [cf, jnp.zeros((slab * NSLAB - n_grid,), jnp.int32)]
        ).reshape(NSLAB, slab)

        def body(acc, c):
            h = (c.astype(jnp.uint32) ^ jnp.uint32(0x85EBCA6B)) * jnp.uint32(
                KNUTH
            )
            widx = (h >> jnp.uint32(32 - log2_w)).astype(jnp.int32)
            return acc, jnp.take(words, widx)

        _, w = jax.lax.scan(body, jnp.int32(0), cf)
        return w.reshape(-1)[:n_grid]

    timed("stage A bloom gather", probe_a, words, code)
    w = probe_a(words, code)
    frac = float(jnp.mean((w != 0).astype(jnp.float32)))
    print(f"  (stray cell fraction {frac:.4f})")

    # --- rank extraction at production group size / mpr
    for block_r, mpr in ((128, 24), (128, 16), (64, 16)):
        n_blocks = max(1, -(-(-(-n_grid // 128)) // block_r))
        tot = n_blocks * block_r * 128

        def extract(w, hv, block_r=block_r, mpr=mpr, n_blocks=n_blocks,
                    tot=tot):
            pad = jnp.zeros((tot - n_grid,), jnp.int32)
            wp = jnp.concatenate([w, pad])
            hp = jnp.concatenate([hv, pad])
            return group_rank_extract(
                wp, jnp.zeros_like(wp), hp, block_r, mpr, n_blocks, n_grid
            )[0]

        timed(f"rank extract br={block_r} mpr={mpr}", extract, w,
              code.reshape(-1))

    # --- top_k alternative: smallest mpr survivor rows per (group, lane)
    for mpr in (16, 24):
        def topk(w, mpr=mpr):
            R = -(-n_grid // 128)
            wp = jnp.concatenate(
                [w, jnp.zeros((R * 128 - n_grid,), jnp.int32)]
            ).reshape(R, 128)
            g = wp.reshape(-1, 128, 128)  # [groups, 128 rows, 128 lanes]
            key = jnp.where(
                g != 0,
                -jax.lax.broadcasted_iota(jnp.int32, g.shape, 1),
                -(1 << 30),
            )
            kt = jnp.transpose(key, (0, 2, 1))  # [groups, lanes, rows]
            vals, idxs = jax.lax.top_k(kt, mpr)
            return idxs

        timed(f"top_k k={mpr} alternative", topk, w)

    # --- blocked_nonzero over the slot array size
    nslots = (n_grid // 128 // 128) * 24 * 128
    alive = jnp.asarray(rng.random(nslots) < 0.05)
    timed("blocked_nonzero (slots)", lambda a: blocked_nonzero(a, 81920)[0],
          alive)
    return 0


if __name__ == "__main__":
    sys.exit(main())
