"""Round-4 probe: the fused sampled-filter kernel on the real TPU.

1. Bit-parity of the compiled Mosaic kernel vs the XLA mirror on real
   hardware (validates pltpu.roll conventions the interpreter can't).
2. Pipelined stage timing of the fused chain vs the round-3 unfused
   chain on the headline workload shapes.

Self-bounded; never kill externally (axon grant wedges).
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

from php_aho_corasick_tpu.ops.filter_jax import FUSED_BLOCK_R  # noqa: E402
from php_aho_corasick_tpu.ops.filter_pallas import (  # noqa: E402
    fused_sampled_extract,
)


def fetch(x):
    return np.asarray(x)  # axon: block_until_ready does not block


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)

    q, stride = 9, 8
    spc = stride // 4
    log2_rows = 12  # headline plan: N=4096 k=8 pack=4
    N = 1 << log2_rows
    salts = tuple(
        (0x9E3779B9 * (2 * i + 1)) & 0xFFFFFFFF for i in range(8)
    )
    k = len(salts)
    pack = 4
    table = jnp.asarray(
        rng.integers(0, 2**31, (k * (N // 128) // pack, 128)).astype(
            np.int32
        )
    )

    # ---- 1. small parity run (2 blocks) on hardware
    n_blocks = 2
    R_pad = n_blocks * FUSED_BLOCK_R
    n_grid = R_pad * 128 - 999
    phase_g = tuple(
        jnp.asarray(
            rng.integers(-(2**31), 2**31, (R_pad + 8, 128), dtype=np.int64)
            .astype(np.int32)
        )
        for _ in range(spc)
    )
    mll = jnp.ones((1, 1), jnp.int32)
    kw = dict(
        salts=salts, log2_rows=log2_rows, pack=pack, q=q, spc=spc,
        mpr=16, block_r=FUSED_BLOCK_R, n_grid=n_grid,
    )
    # two parity configs: plain, and the full production shape (prefix
    # hash + in-kernel slot refinement against a small VMEM bit bloom)
    pb_rows = 8  # 2^15-bit prefix bloom
    pb = jnp.asarray(
        rng.integers(-(2**31), 2**31, (pb_rows, 128), dtype=np.int64)
        .astype(np.int32)
    )
    for label, extra in (
        ("plain", {}),
        ("prefix+refine", dict(
            l16=16, prefix_on=True, prefix_table=pb,
            prefix_salts=(0x7F4A7C15, 0x94D049BB), prefix_log2=15,
        )),
    ):
        t0 = time.time()
        got_hw = fused_sampled_extract(
            table, phase_g, None, mll, interpret=not on_tpu,
            force_pallas=not on_tpu, **kw, **extra
        )
        got_hw = [fetch(x) for x in got_hw]
        print(f"[{label}] kernel compile+run: {time.time() - t0:.1f}s")
        got_x = fused_sampled_extract(
            table, phase_g, None, mll, interpret=True, **kw, **extra
        )
        got_x = [fetch(x) for x in got_x]
        names = ["r_s", "w_s", "swo_s", "c_s", "cnt"]
        for name, a, b in zip(names, got_hw, got_x):
            if not np.array_equal(a, b):
                bad = np.argwhere(a != b)
                print(f"PARITY FAIL [{label}] {name}: {bad.shape[0]} "
                      f"mismatches; first {bad[:5].tolist()}")
                print("hw:", a[tuple(bad[0])], "xla:", b[tuple(bad[0])])
                return 1
        print(f"PARITY OK [{label}] on {jax.default_backend()} "
              f"(survivors={int(got_hw[4].sum())})")

    # ---- 2. headline-shape timing, pipelined (8 launches, 1 fetch)
    # 128 MiB corpus at stride 8 => 16.8M cells => 128 blocks
    n_blocks = 128
    R_pad = n_blocks * FUSED_BLOCK_R
    n_grid = R_pad * 128
    phase_g = tuple(
        jnp.asarray(
            rng.integers(-(2**31), 2**31, (R_pad + 8, 128), dtype=np.int64)
            .astype(np.int32)
        )
        for _ in range(spc)
    )
    for mpr in (8, 16):
        kw = dict(
            salts=salts, log2_rows=log2_rows, pack=pack, q=q, spc=spc,
            mpr=mpr, block_r=FUSED_BLOCK_R, n_grid=n_grid,
            interpret=not on_tpu, force_pallas=not on_tpu,
        )
        t0 = time.time()
        out = fused_sampled_extract(table, phase_g, None, mll, **kw)
        s0 = fetch(out[4]).sum()
        print(f"mpr={mpr}: warm compile+run {time.time() - t0:.1f}s "
              f"(survivors {int(s0)})")
        reps = 8
        t0 = time.time()
        acc = []
        for _ in range(reps):
            out = fused_sampled_extract(table, phase_g, None, mll, **kw)
            acc.append(out[4][0, 0])
        fetch(jnp.stack(acc))
        dt = (time.time() - t0) / reps
        print(f"mpr={mpr}: fused kernel {dt * 1e3:.2f} ms / 16.8M cells "
              f"(128 MiB corpus equivalent)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
