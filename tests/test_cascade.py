"""Gram-filter cascade engine: planning, soundness, and exact parity."""

import random

import numpy as np
import pytest

from php_aho_corasick_tpu import Matcher, ScanConfig
from php_aho_corasick_tpu.models.cascade import plan_cascade


def brute_force(patterns, text):
    out = []
    for pid, p in enumerate(patterns):
        start = text.find(p)
        while start != -1:
            out.append((start + len(p), -len(p), pid))
            start = text.find(p, start + 1)
    out.sort()
    return [(pos, pid) for pos, _, pid in out]


def run_cascade(patterns, text, **cfg_kw):
    cfg = ScanConfig(backend="device", engine="cascade", auto_shard=False,
                     **cfg_kw)
    c = Matcher([{"id": i, "value": p} for i, p in enumerate(patterns)], cfg)
    return [(r["pos"], r["keyIdx"]) for r in c.match(text)]


# ------------------------------------------------------------- planning

def test_plan_basic():
    pats = [b"abcdefgh" * 2, b"longpattern!", b"tiny"]
    m = Matcher([{"value": p} for p in pats])
    plan = plan_cascade([p.value for p in m._patterns], m.automaton,
                        ScanConfig())
    assert plan.eligible
    assert plan.q == 4  # min long pattern length 4 ('tiny')
    assert 0 in plan.offsets
    assert plan.bloom_words.shape[0] == len(plan.offsets)


def test_plan_too_many_shorts():
    pats = [bytes([65 + i]) for i in range(20)]  # 20 single-byte patterns
    m = Matcher([{"value": p} for p in pats])
    plan = plan_cascade([p.value for p in m._patterns], m.automaton,
                        ScanConfig())
    assert not plan.eligible


def test_plan_saturated_bloom():
    m = Matcher(["abcdefgh"])
    plan = plan_cascade([b"abcdefgh"], m.automaton,
                        ScanConfig(cascade_log2_bloom_bits=4,
                                   cascade_max_fill=0.01))
    assert not plan.eligible


def test_plan_shorts_only():
    m = Matcher(["ab", "cd"])
    plan = plan_cascade([b"ab", b"cd"], m.automaton, ScanConfig())
    assert plan.eligible and plan.min_long_len == 0 and plan.shorts


# ------------------------------------------------------------- parity

@pytest.mark.parametrize("seed", range(8))
def test_cascade_parity_fuzz(seed):
    rng = random.Random(seed)
    alphabet = b"abcdef"
    n_long = rng.randint(1, 40)
    patterns = list({
        bytes(rng.choice(alphabet) for _ in range(rng.randint(5, 12)))
        for _ in range(n_long)
    })
    if rng.random() < 0.5:  # sometimes add short patterns
        patterns += list({
            bytes(rng.choice(alphabet) for _ in range(rng.randint(1, 3)))
            for _ in range(rng.randint(1, 5))
        })
    patterns = list(dict.fromkeys(patterns))
    text = bytearray(rng.choice(alphabet) for _ in range(6000))
    # plant some patterns to guarantee matches
    for _ in range(20):
        p = rng.choice(patterns)
        pos = rng.randrange(0, len(text) - len(p))
        text[pos : pos + len(p)] = p
    text = bytes(text)
    got = run_cascade(patterns, text, chunk_len=512, match_capacity=64)
    assert got == brute_force(patterns, text)


def test_cascade_equals_dfa_engine():
    rng = random.Random(42)
    patterns = [b"gamma", b"ammag", b"mm", b"aaaa"]
    text = bytes(rng.choice(b"agm") for _ in range(20000))
    pats = [{"id": i, "value": p} for i, p in enumerate(patterns)]
    cas = Matcher(pats, ScanConfig(backend="device", engine="cascade",
                                   auto_shard=False)).match(text)
    dfa = Matcher(pats, ScanConfig(backend="device", engine="dfa",
                                   auto_shard=False)).match(text)
    assert cas == dfa


def test_cascade_suffix_factors_and_order():
    # overlap + suffix-factor emission order: alfa then lfa at same end
    pats = ["alfa", "lfa", "beta"]
    got = run_cascade([p.encode() for p in pats], b"xxalfa beta!")
    assert got == [(6, 0), (6, 1), (11, 2)]


def test_cascade_chunk_halo():
    pat = b"wxyzwxyz"
    text = (b"." * 97 + pat) * 50
    got = run_cascade([pat], text, chunk_len=64, match_capacity=8)
    assert len(got) == 50
    assert got == brute_force([pat], text)


def test_cascade_capacity_retry_dense():
    # adversarial: every position passes (pattern 'aaaa' on 'aaaa...')
    text = b"a" * 3000
    got = run_cascade([b"aaaa"], text, match_capacity=4)
    assert len(got) == 3000 - 4 + 1


def test_cascade_shorts_exact():
    got = run_cascade([b"ab", b"b", b"longerpat"], b"abba longerpat!")
    assert got == brute_force([b"ab", b"b", b"longerpat"], b"abba longerpat!")


def test_cascade_matmul_bloom_impl():
    rng = random.Random(3)
    patterns = [b"pattern!", b"needle12"]
    text = bytearray(rng.choice(b"patern!ledi12") for _ in range(3000))
    text[100:108] = b"pattern!"
    text[2000:2008] = b"needle12"
    text = bytes(text)
    got = run_cascade(patterns, text, bloom_impl="matmul")
    assert got == brute_force(patterns, text)


def test_auto_prefers_cascade_for_large_scans():
    cfg = ScanConfig(backend="device", cascade_min_bytes=1000)
    m = Matcher(["abcdefgh"], cfg)
    m.finalize()
    assert m._pick_engine(5000) == "cascade"
    assert m._pick_engine(100) == "dfa"


def test_forced_cascade_on_ineligible_raises():
    cfg = ScanConfig(backend="device", engine="cascade")
    m = Matcher([bytes([65 + i]) for i in range(20)], cfg)
    with pytest.raises(ValueError):
        m.match(b"AAAA" * 1000)


def test_pallas_bloom_matches_take():
    import jax.numpy as jnp
    from php_aho_corasick_tpu.ops.filter_jax import bloom_hit_take
    from php_aho_corasick_tpu.ops.filter_pallas import bloom_hit_pallas

    rng = np.random.default_rng(0)
    W = 4096  # 2^17 bits
    words = jnp.asarray(rng.integers(0, 2**31, W, dtype=np.int64).astype(np.int32))
    slots = jnp.asarray(rng.integers(0, W * 32, (1000,), dtype=np.int64).astype(np.int32))
    a = np.asarray(bloom_hit_take(words, slots))
    b = np.asarray(bloom_hit_pallas(words, slots, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_cascade_pallas_bloom_impl_end_to_end():
    rng = random.Random(11)
    patterns = [b"abcdefg", b"defgabc"]
    text = bytearray(rng.choice(b"abcdefg") for _ in range(2000))
    text[50:57] = b"abcdefg"
    text = bytes(text)
    got = run_cascade(patterns, text, bloom_impl="pallas")
    assert got == brute_force(patterns, text)


def test_cascade_sharded_parity():
    rng = random.Random(21)
    patterns = [b"gammagam", b"magma", b"aggregate"]
    docs = []
    for _ in range(6):
        d = bytearray(rng.choice(b"agmert") for _ in range(5000))
        for _ in range(5):
            p = rng.choice(patterns)
            pos = rng.randrange(0, len(d) - len(p))
            d[pos : pos + len(p)] = p
        docs.append(bytes(d))
    pats = [{"id": i, "value": p} for i, p in enumerate(patterns)]
    cfg = ScanConfig(backend="device", engine="cascade", auto_shard=True,
                     chunk_len=512, match_capacity=32)
    res = Matcher(pats, cfg).match_many(docs)
    for doc, recs in zip(docs, res):
        assert [(r["pos"], r["keyIdx"]) for r in recs] == brute_force(patterns, doc)


def test_cascade_shorts_only_plan_end_to_end():
    # no long patterns at all: blooms disabled, compare-select only
    got = run_cascade([b"ab", b"c"], b"zabcz ab c")
    assert got == brute_force([b"ab", b"c"], b"zabcz ab c")
