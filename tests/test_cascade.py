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
                                   cascade_max_fill=0.01,
                                   cascade_mode="anchored"))
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


def test_cascade_take_bloom_impl_forced():
    rng = random.Random(3)
    patterns = [b"pattern!", b"needle12"]
    text = bytearray(rng.choice(b"patern!ledi12") for _ in range(3000))
    text[100:108] = b"pattern!"
    text[2000:2008] = b"needle12"
    text = bytes(text)
    got = run_cascade(patterns, text, bloom_impl="take")
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


# ------------------------------------------------- sampled (strided) mode

def test_expand_hits_matches_bruteforce():
    """Host expansion of grid-hit bitmask words must equal the definition:
    long bit j at grid point p = m*stride => start p - j (length-gated);
    short bit i => start p + i."""
    rng = random.Random(0)
    pats = [bytes(rng.choice(b"abcdef") for _ in range(16))
            for _ in range(32)]
    m = Matcher([{"value": p} for p in pats],
                ScanConfig(backend="device", engine="cascade"))
    cm = m.cascade_model
    s = cm.plan.stride
    min_long = cm.plan.min_long_len
    nprng = np.random.default_rng(5)
    B, L = 3, 103
    M = -(-L // s)
    lengths = np.asarray([L, 57, 0], np.int32)
    n_hits = 17
    grid = np.sort(
        nprng.choice(B * M, size=n_hits, replace=False)
    ).astype(np.int32)
    lw = nprng.integers(0, 1 << s, n_hits, dtype=np.int64)
    sw = nprng.integers(0, 1 << s, n_hits, dtype=np.int64)
    lw32 = (lw & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    sw32 = (sw & 0xFFFFFFFF).astype(np.uint32).view(np.int32)

    want = set()
    for g, w_l, w_s in zip(grid, lw, sw):
        b, mm = divmod(int(g), M)
        p = mm * s
        for j in range(s):
            if (int(w_l) >> j) & 1:
                t = p - j
                if t >= 0 and t + min_long <= lengths[b]:
                    want.add(b * L + t)
            if (int(w_s) >> j) & 1:
                want.add(b * L + p + j)
    got, n = cm.expand_hits(grid, lw32, sw32, n_hits, L, lengths)
    assert n == len(want)
    assert sorted(want) == got.tolist()


def test_sampled_gram_codes_match_host():
    import jax.numpy as jnp
    from php_aho_corasick_tpu.ops.filter_jax import (
        GRAM_BASE, sampled_gram_codes,
    )

    rng = np.random.default_rng(9)
    B, L, q, stride = 2, 77, 8, 5
    chunks = rng.integers(0, 256, (B, L), dtype=np.int64).astype(np.uint8)
    got = np.asarray(
        sampled_gram_codes(jnp.asarray(chunks), q, stride)
    ).astype(np.uint32)
    ext = np.concatenate([chunks, np.zeros((B, q), np.uint8)], axis=1)
    for b in range(B):
        for m in range(got.shape[1]):
            p = m * stride
            want = 0
            for t in range(q):
                want = (want * GRAM_BASE + int(ext[b, p + t])) & 0xFFFFFFFF
            assert got[b, m] == want, (b, m)


def test_sampled_gram_codes_planes_exact():
    """The cell-aligned word-plane formulation must produce bit-identical
    codes to the general reshape path wherever its alignment gate holds
    (stride % 4 == 0 and stride | L)."""
    import jax.numpy as jnp
    from php_aho_corasick_tpu.ops.filter_jax import (
        sampled_codes_best,
        sampled_gram_codes,
        sampled_gram_codes_planes,
    )

    rng = np.random.default_rng(31)
    for q, stride, B, L in [
        (9, 8, 3, 256),    # headline plan shape
        (8, 8, 2, 512),
        (8, 4, 2, 128),
        (5, 4, 4, 64),
        (13, 12, 2, 384),
        (9, 8, 1, 4096),   # full chunk row
    ]:
        chunks = rng.integers(0, 256, (B, L), dtype=np.int64).astype(np.uint8)
        ref = np.asarray(sampled_gram_codes(jnp.asarray(chunks), q, stride))
        got = np.asarray(
            sampled_gram_codes_planes(jnp.asarray(chunks), q, stride)
        )
        np.testing.assert_array_equal(got, ref, err_msg=f"q={q} s={stride}")
        best = np.asarray(sampled_codes_best(jnp.asarray(chunks), q, stride))
        np.testing.assert_array_equal(best, ref)
    # off-gate shapes must silently fall back
    chunks = rng.integers(0, 256, (2, 100), dtype=np.int64).astype(np.uint8)
    ref = np.asarray(sampled_gram_codes(jnp.asarray(chunks), 8, 9))
    best = np.asarray(sampled_codes_best(jnp.asarray(chunks), 8, 9))
    np.testing.assert_array_equal(best, ref)


def test_plan_picks_sampled_for_long_patterns():
    rng = random.Random(0)
    pats = [bytes(rng.choice(b"abcdef") for _ in range(16))
            for _ in range(64)]
    m = Matcher([{"value": p} for p in pats])
    plan = plan_cascade([p.value for p in m._patterns], m.automaton,
                        ScanConfig())
    assert plan.eligible and plan.mode == "sampled"
    assert plan.stride >= 2 and plan.q + plan.stride - 1 <= 16
    assert plan.sampled_words is not None


def test_forced_sampled_on_short_min_long_is_ineligible():
    # min_long == 4 => stride would be 1: no sampled configuration
    plan_m = Matcher(["tiny"])
    plan = plan_cascade([b"tiny"], plan_m.automaton,
                        ScanConfig(cascade_mode="sampled"))
    assert not plan.eligible


@pytest.mark.parametrize("seed", range(8))
def test_sampled_cascade_parity_fuzz(seed):
    rng = random.Random(1000 + seed)
    alphabet = b"abcdef"
    patterns = list({
        bytes(rng.choice(alphabet) for _ in range(rng.randint(9, 24)))
        for _ in range(rng.randint(1, 60))
    })
    if rng.random() < 0.5:  # mixed-in shorts stay exact via compare-select
        patterns += list({
            bytes(rng.choice(alphabet) for _ in range(rng.randint(1, 3)))
            for _ in range(rng.randint(1, 4))
        })
    patterns = list(dict.fromkeys(patterns))
    text = bytearray(rng.choice(alphabet) for _ in range(6000))
    for _ in range(25):
        p = rng.choice(patterns)
        pos = rng.randrange(0, len(text) - len(p))
        text[pos : pos + len(p)] = p
    text = bytes(text)
    got = run_cascade(patterns, text, chunk_len=512, match_capacity=64,
                      cascade_mode="sampled")
    assert got == brute_force(patterns, text)


def test_sampled_cascade_chunk_halo():
    pat = b"wxyzwxyzwxyz"
    text = (b"." * 93 + pat) * 40
    got = run_cascade([pat], text, chunk_len=64, match_capacity=8,
                      cascade_mode="sampled")
    assert len(got) == 40
    assert got == brute_force([pat], text)


def test_sampled_cascade_capacity_retry():
    # dense matches: an occurrence every 2 bytes forces repeated doubling
    pat = b"ab" * 6
    text = b"ab" * 1250
    got = run_cascade([pat], text, match_capacity=4,
                      cascade_mode="sampled")
    assert got == brute_force([pat], text)


def test_sampled_launch_device_pipelined():
    """bench.py's steady-state path: several filter->verify chains in
    flight with no intermediate fetch, occupancy scalars pulled once at
    the end; every chain must agree and emission must stay exact."""
    import jax.numpy as jnp

    from php_aho_corasick_tpu.ops.matches import pack_documents

    rng = random.Random(7)
    alphabet = b"abcdef"
    patterns = list(dict.fromkeys(
        bytes(rng.choice(alphabet) for _ in range(16)) for _ in range(32)
    ))
    text = bytearray(rng.choice(alphabet) for _ in range(8000))
    for _ in range(10):
        p = rng.choice(patterns)
        pos = rng.randrange(0, len(text) - len(p))
        text[pos : pos + len(p)] = p
    text = bytes(text)

    cfg = ScanConfig(backend="device", engine="cascade", auto_shard=False,
                     cascade_mode="sampled", chunk_len=512)
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(patterns)],
                cfg)
    m.finalize()
    cm = m.cascade_model
    assert cm is not None and cm.device_verify_ok

    packed = pack_documents([text], cfg.chunk_len, m.automaton.max_len - 1)
    chunks = jnp.asarray(packed.chunks)
    lengths = jnp.asarray(packed.lengths)

    cap_a, cap_b = 4096, 1024
    outs = [cm.launch_device(chunks, lengths, cap_a, cap_b)
            for _ in range(3)]
    flat = np.asarray(jnp.stack(
        [s for _c, n, nf, nc in outs for s in (n, nf)]
    ))  # single sync fetch for all three chains
    ns, nfs = flat[0::2], flat[1::2]
    assert (ns == ns[0]).all() and (nfs == nfs[0]).all()
    assert 0 < ns[0] <= cap_a and 0 < nfs[0] <= cap_b

    got = [
        (end, int(pids[0]))
        for _doc, end, pids in cm.emit_windows(
            packed, np.asarray(outs[-1][0]), int(nfs[0])
        )
    ]
    assert got == brute_force(patterns, text)


def test_sampled_cascade_overlapping_and_suffix_order():
    pats = [b"abcdabcdabcd", b"cdabcdabcd", b"dabcdabcd"]
    text = b"..abcdabcdabcdabcd.."
    got = run_cascade(pats, text, cascade_mode="sampled")
    assert got == brute_force(pats, text)


def test_sampled_ineligible_degenerate_alphabet():
    # single-letter pattern: every gram is a member; the planner must
    # refuse the sampled filter (candidate density ~1)
    plan_m = Matcher([b"a" * 12])
    plan = plan_cascade([b"a" * 12], plan_m.automaton,
                        ScanConfig(cascade_mode="sampled"))
    assert not plan.eligible


def test_sampled_cascade_sharded_parity():
    rng = random.Random(77)
    patterns = [b"gammagammagam", b"aggregateagg!", b"magmamagmamag"]
    docs = []
    for _ in range(6):
        d = bytearray(rng.choice(b"agmert!") for _ in range(5000))
        for _ in range(5):
            p = rng.choice(patterns)
            pos = rng.randrange(0, len(d) - len(p))
            d[pos : pos + len(p)] = p
        docs.append(bytes(d))
    pats = [{"id": i, "value": p} for i, p in enumerate(patterns)]
    cfg = ScanConfig(backend="device", engine="cascade", auto_shard=True,
                     chunk_len=512, match_capacity=32,
                     cascade_mode="sampled")
    res = Matcher(pats, cfg).match_many(docs)
    for doc, recs in zip(docs, res):
        assert [(r["pos"], r["keyIdx"]) for r in recs] == brute_force(
            patterns, doc
        )


def test_force_take_escape_at_pathological_density():
    """> 128 survivors per extraction group exceed the fused path's
    structural slot ceiling: the model must permanently fall back to the
    flat take filter and stay exact (a match every 16 bytes over 1 MiB
    puts ~512 hits in every 1024-cell column group)."""
    p = b"abcdefabcdefabcd"
    text = p * 70000
    cfg = ScanConfig(backend="device", engine="cascade", auto_shard=False,
                     cascade_mode="sampled", bloom_impl="pallas_vmem",
                     chunk_len=4096)
    m = Matcher([{"id": 0, "value": p}], cfg)
    m.finalize()
    recs = m.match(text)
    assert m.cascade_model._force_take
    assert len(recs) == 70000
    assert recs[0]["pos"] == 16 and recs[-1]["pos"] == len(text)


def test_grouped_take_words2_parity(monkeypatch):
    """Second-code-family bloom (signature-scale code-collision killer)
    forced on a small set: the dual-code grouped take path must stay
    exact."""
    from php_aho_corasick_tpu.models import cascade as cascmod

    monkeypatch.setattr(cascmod, "WORDS2_MIN_ENTRIES", 1)
    rng = random.Random(17)
    patterns = list({
        bytes(rng.choice(b"abcdef") for _ in range(16)) for _ in range(64)
    })
    text = bytearray(rng.choice(b"abcdef") for _ in range(40000))
    for _ in range(25):
        p = rng.choice(patterns)
        pos = rng.randrange(0, len(text) - len(p))
        text[pos : pos + len(p)] = p
    text = bytes(text)
    cfg = ScanConfig(backend="device", engine="cascade", auto_shard=False,
                     cascade_mode="sampled", bloom_impl="take")
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(patterns)],
                cfg)
    m.finalize()
    assert m.cascade_model.plan.sampled_words2 is not None
    got = [(r["pos"], r["keyIdx"]) for r in m.match(text)]
    assert got == brute_force(patterns, text)


def test_records_overflow_sentinel_rewalk():
    """> VERIFY_KR final positions in one verified window must overflow
    to the sentinel record and be re-walked exactly on the host
    (emit_records_arrays), with no duplicate or lost emissions."""
    base = b"abcdefghijklm"
    patterns = [base[i : i + 9] for i in range(5)]  # ends 5 consecutive
    text = b"zzz..." + base + b"...zzz" + base + b"!!"
    got = run_cascade(patterns, text, cascade_mode="sampled")
    assert got == brute_force(patterns, text)


def test_records_path_emit_parity_dense():
    """Dense planted corpus through the records emission path equals
    brute force (device record decode + ownership on host)."""
    rng = random.Random(99)
    patterns = [b"gammagammagamma!", b"deltadeltadelta!"]
    text = bytearray(rng.choice(b"gadelmt!") for _ in range(30000))
    for k in range(400):
        p = patterns[k % 2]
        pos = rng.randrange(0, len(text) - len(p))
        text[pos : pos + len(p)] = p
    text = bytes(text)
    got = run_cascade(patterns, text, cascade_mode="sampled")
    assert got == brute_force(patterns, text)


def test_sampled_sharded_take_path_dense_hits_terminates():
    """Regression (ADVICE r3 high): the sharded take path reported its
    hit gstats as the coarse gstats; with > 128 hits in a shard the
    128-clamped ``_cap_coarse`` could never satisfy ``nc <= cap`` and
    ``_run_sharded_cascade`` retried forever.  The take path must report
    zeroed coarse stats, terminate, and stay exact."""
    rng = random.Random(31337)
    patterns = [b"needleneedlenee", b"haystackhaystac"]
    docs = []
    for _ in range(8):
        d = bytearray(rng.choice(b"xyzuvw") for _ in range(6000))
        for k in range(200):  # >> 128 flagged cells per shard
            pos = rng.randrange(0, len(d) - 16)
            d[pos : pos + 15] = patterns[k % 2]
        docs.append(bytes(d))
    cfg = ScanConfig(backend="device", engine="cascade", auto_shard=True,
                     chunk_len=512, cascade_mode="sampled",
                     bloom_impl="take")
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(patterns)], cfg)
    assert m.cascade_model is not None
    assert m.cascade_model.bloom_impl() == "take"
    res = m.match_many(docs)
    for doc, recs in zip(docs, res):
        assert [(r["pos"], r["keyIdx"]) for r in recs] == brute_force(
            patterns, doc
        )


def test_sampled_two_probe_parity():
    # a tiny bloom cap saturates the 1-probe filter; the planner must
    # escalate to 2 AND-combined probes and stay exact
    rng = random.Random(99)
    patterns = list({
        bytes(rng.choice(b"abcdef") for _ in range(16)) for _ in range(300)
    })
    text = bytearray(rng.choice(b"abcdef") for _ in range(20000))
    for _ in range(10):
        p = rng.choice(patterns)
        pos = rng.randrange(0, len(text) - len(p))
        text[pos : pos + len(p)] = p
    text = bytes(text)
    cfg = ScanConfig(backend="device", engine="cascade", auto_shard=False,
                     cascade_mode="sampled", cascade_log2_words_max=14)
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(patterns)], cfg)
    m.finalize()
    plan = m.cascade_model.plan
    assert len(plan.sampled_salts) == 2, plan.reason
    got = [(r["pos"], r["keyIdx"]) for r in m.match(text)]
    assert got == brute_force(patterns, text)


def test_sampled_matches_anchored_engine():
    rng = random.Random(13)
    patterns = [bytes(rng.choice(b"abcd") for _ in range(12))
                for _ in range(20)]
    patterns = list(dict.fromkeys(patterns))
    text = bytearray(rng.choice(b"abcd") for _ in range(30000))
    for _ in range(30):
        p = rng.choice(patterns)
        pos = rng.randrange(0, len(text) - len(p))
        text[pos : pos + len(p)] = p
    text = bytes(text)
    sam = run_cascade(patterns, text, cascade_mode="sampled")
    anc = run_cascade(patterns, text, cascade_mode="anchored")
    assert sam == anc == brute_force(patterns, text)


# ------------------------------------------------- VMEM pallas bloom (r3)

def test_vmem_bloom_word_matches_host():
    """Kernel-level parity: bloom_word_vmem (interpret) vs host hashing."""
    import jax.numpy as jnp
    from php_aho_corasick_tpu.ops.filter_jax import KNUTH
    from php_aho_corasick_tpu.ops.filter_pallas import bloom_word_vmem

    rng = np.random.default_rng(3)
    log2_rows = 10
    N = 1 << log2_rows
    salts = tuple((0x9E3779B9 * (2 * i + 1)) & 0xFFFFFFFF for i in range(4))
    k = len(salts)
    words = rng.integers(-(2**31), 2**31, k * N, dtype=np.int64).astype(
        np.int32
    )
    codes = rng.integers(-(2**31), 2**31, 3000, dtype=np.int64).astype(
        np.int32
    )
    table = jnp.asarray(words.reshape(k * N // 128, 128))
    got = np.asarray(
        bloom_word_vmem(table, jnp.asarray(codes), salts, log2_rows,
                        interpret=True, force_pallas=True)
    )
    # the XLA-equivalent interpret path must agree bit-for-bit too
    got_xla = np.asarray(
        bloom_word_vmem(table, jnp.asarray(codes), salts, log2_rows,
                        interpret=True)
    )
    np.testing.assert_array_equal(got, got_xla)
    acc = None
    for p, salt in enumerate(salts):
        h = (codes.astype(np.uint64) ^ salt) * KNUTH & 0xFFFFFFFF
        w = words[p * N + (h >> (32 - log2_rows)).astype(np.int64)]
        acc = w if acc is None else acc & w
    np.testing.assert_array_equal(got, acc)

    # packed-bank layout (pack=4, 8-bit subwords): same probes must
    # come back as the low-8-bit subword values
    words8 = (words.view(np.uint32) & 0xFF).astype(np.uint32)
    per = words8.reshape(k, N // 128 // 4, 4, 128)
    packed = np.zeros((k, N // 128 // 4, 128), np.uint32)
    for i in range(4):
        packed |= per[:, :, i, :] << np.uint32(i * 8)
    table4 = jnp.asarray(
        packed.reshape(k * N // 128 // 4, 128).view(np.int32)
    )
    acc8 = None
    for p, salt in enumerate(salts):
        h = (codes.astype(np.uint64) ^ salt) * KNUTH & 0xFFFFFFFF
        w = words8[p * N + (h >> (32 - log2_rows)).astype(np.int64)]
        acc8 = w if acc8 is None else acc8 & w
    for force in (True, False):
        got4 = np.asarray(
            bloom_word_vmem(table4, jnp.asarray(codes), salts, log2_rows,
                            pack=4, interpret=True, force_pallas=force)
        )
        np.testing.assert_array_equal(got4, acc8.astype(np.int32))


@pytest.mark.parametrize(
    "pack,has_shorts,prefix_on",
    [(1, False, False), (4, True, False), (4, False, True)],
)
def test_fused_sampled_extract_kernel_parity(pack, has_shorts, prefix_on):
    """Round-4 fused kernel vs its XLA mirror, bit-for-bit: in-kernel
    plane shifts (cross-block rolls, incl. the backward shifts of the
    prefix-hash window), gram-code assembly, bank probe, rolling
    prefix-hash select, per-column rank extraction, and the per-column
    counts must agree between the Mosaic kernel body (pallas
    interpreter) and _fused_extract_xla over a 2-block grid."""
    import jax.numpy as jnp
    from php_aho_corasick_tpu.ops.filter_jax import FUSED_BLOCK_R
    from php_aho_corasick_tpu.ops.filter_pallas import (
        fused_sampled_extract,
    )

    rng = np.random.default_rng(11 + pack)
    q, stride = 9, 8
    spc = stride // 4
    log2_rows = 10
    N = 1 << log2_rows
    salts = tuple((0x9E3779B9 * (2 * i + 1)) & 0xFFFFFFFF for i in range(3))
    k = len(salts)
    table = jnp.asarray(
        rng.integers(0, 2**31, (k * (N // 128) // pack, 128))
        .astype(np.int32)
    )
    n_blocks = 2
    R_pad = n_blocks * FUSED_BLOCK_R
    n_grid = R_pad * 128 - 555  # a padded tail exercises the cell gate
    phase_g = tuple(
        jnp.asarray(
            rng.integers(-(2**31), 2**31, (R_pad + 8, 128), dtype=np.int64)
            .astype(np.int32)
        )
        for _ in range(spc)
    )
    sw_np = (
        rng.integers(0, 2, (R_pad, 128)).astype(np.int32)
        * (rng.random((R_pad, 128)) < 0.01)
        if has_shorts
        else None
    )
    sw_g = jnp.asarray(sw_np.astype(np.int32)) if has_shorts else None
    mll = jnp.ones((1, 1), jnp.int32)
    kw = dict(
        salts=salts, log2_rows=log2_rows, pack=pack, q=q, spc=spc,
        mpr=16, block_r=FUSED_BLOCK_R, n_grid=n_grid, interpret=True,
        l16=16 if prefix_on else 0, prefix_on=prefix_on,
    )
    got_k = fused_sampled_extract(
        table, phase_g, sw_g, mll, force_pallas=True, **kw
    )
    got_x = fused_sampled_extract(table, phase_g, sw_g, mll, **kw)
    for a, b in zip(got_k, got_x):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # sanity: some survivors were extracted and the counts match them
    r_s, w_s, swo_s, c_s, cnt = (np.asarray(x) for x in got_k)
    assert int(cnt.sum()) > 0
    assert int((r_s >= 0).sum()) == int(np.minimum(cnt, 16).sum())


@pytest.mark.parametrize("seed", range(4))
def test_sampled_vmem_parity_fuzz(seed):
    """Full-pipeline parity with the lane-partitioned VMEM bloom forced
    (interpret mode off-TPU); mixed shorts + planted long occurrences."""
    rng = random.Random(4200 + seed)
    alphabet = b"abcdef"
    patterns = list({
        bytes(rng.choice(alphabet) for _ in range(rng.randint(9, 20)))
        for _ in range(rng.randint(2, 50))
    })
    if seed % 2:
        patterns += [b"xy", b"q"]
    patterns = list(dict.fromkeys(patterns))
    text = bytearray(rng.choice(alphabet) for _ in range(5000))
    for _ in range(15):
        p = rng.choice(patterns)
        pos = rng.randrange(0, len(text) - len(p))
        text[pos : pos + len(p)] = p
    text = bytes(text)
    got = run_cascade(
        patterns, text, chunk_len=512, match_capacity=64,
        cascade_mode="sampled", bloom_impl="pallas_vmem",
        cascade_vmem_bloom_bytes=1 << 21,  # N=4096 keeps interpret fast
    )
    assert got == brute_force(patterns, text)


@pytest.mark.parametrize("seed", [0, 1])
def test_sampled_vmem_parity_fuzz_full_byte_alphabet(seed):
    """Full-256-byte alphabet drives n_classes past the packed-class
    window verifier's 255-class gate (verify_windows falls back to byte
    gathers) and the word-plane codes path over raw byte data."""
    rng = random.Random(8600 + seed)
    patterns = list({
        bytes(rng.randrange(256) for _ in range(rng.randint(9, 18)))
        for _ in range(rng.randint(8, 40))
    })
    # cover all 256 byte values so n_classes = 257 > 255 (the fallback
    # branch) while max_len stays verifier-compatible
    patterns += [bytes(range(16 * i, 16 * i + 16)) for i in range(16)]
    patterns = list(dict.fromkeys(patterns))
    text = bytearray(rng.randrange(256) for _ in range(4000))
    for _ in range(12):
        p = rng.choice(patterns)
        pos = rng.randrange(0, len(text) - len(p))
        text[pos : pos + len(p)] = p
    text = bytes(text)
    got = run_cascade(
        patterns, text, chunk_len=512, match_capacity=64,
        cascade_mode="sampled", bloom_impl="pallas_vmem",
        cascade_vmem_bloom_bytes=1 << 21,
    )
    assert got == brute_force(patterns, text)


def test_vmem_plan_attached_and_selective():
    rng = random.Random(5)
    patterns = list({
        bytes(rng.choice(b"abcdef") for _ in range(16)) for _ in range(64)
    })
    cfg = ScanConfig(cascade_mode="sampled",
                     cascade_vmem_bloom_bytes=1 << 21)
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(patterns)], cfg)
    m.finalize()
    plan = plan_cascade([p.value for p in m._patterns], m.automaton, cfg)
    assert plan.vmem_words is not None
    k = len(plan.vmem_salts)
    N = 1 << plan.vmem_log2_rows
    pack = plan.vmem_pack
    # subword width must cover every alignment bit of the plan's stride
    assert pack == (4 if plan.stride <= 8 else 2 if plan.stride <= 16 else 1)
    assert plan.vmem_words.shape == (k * N // 128 // pack, 128)
    assert 2 <= k <= 8
    assert k * N * 4 // pack <= cfg.cascade_vmem_bloom_bytes
    assert plan.vmem_est_stray <= 0.01
    # every pattern's every alignment gram must probe positive (soundness)
    from php_aho_corasick_tpu.models.cascade import _alignment_gram_codes
    from php_aho_corasick_tpu.ops.filter_jax import KNUTH

    longs = [p.value for p in m._patterns]
    codes, aligns = _alignment_gram_codes(longs, plan.q, plan.stride)
    acc = None
    words = plan.vmem_words.view(np.uint32).reshape(-1)
    sw = 32 // pack
    for p_i, salt in enumerate(plan.vmem_salts):
        h = (codes ^ np.uint32(salt)) * np.uint32(KNUTH)
        rows = (h >> np.uint32(32 - plan.vmem_log2_rows)).astype(np.int64)
        lane = rows & 127
        bank = rows >> 7
        phys = (bank // pack) * 128 + lane
        w = words[p_i * (N // pack) + phys]
        w = (w >> ((bank % pack) * sw).astype(np.uint32)) & np.uint32(
            (1 << sw) - 1
        )
        acc = w if acc is None else acc & w
    assert ((acc >> aligns.astype(np.uint32)) & 1).all()


def test_vmem_plan_rejected_when_saturated():
    """A pattern set that would saturate the VMEM-sized bloom must not
    attach one (falls back to the HBM take path)."""
    from php_aho_corasick_tpu.models.cascade import _plan_vmem_bloom

    rng = np.random.default_rng(0)
    n_longs = 1 << 14
    codes = rng.integers(0, 2**32, n_longs * 9, dtype=np.uint64).astype(
        np.uint32
    )
    aligns = np.tile(np.arange(9, dtype=np.int32), n_longs)
    cfg = ScanConfig(cascade_vmem_bloom_bytes=1 << 21)  # N=4096 << n_longs
    assert _plan_vmem_bloom(codes, aligns, n_longs, 9, cfg) is None


def test_bloom_impl_vmem_falls_back_without_plan():
    rng = random.Random(6)
    patterns = [bytes(rng.choice(b"abcdef") for _ in range(16))
                for _ in range(8)]
    cfg = ScanConfig(backend="device", engine="cascade", auto_shard=False,
                     cascade_mode="sampled", bloom_impl="pallas_vmem")
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(patterns)], cfg)
    m.finalize()
    cm = m.cascade_model
    # force a plan with no vmem table
    object.__setattr__(cm.plan, "vmem_words", None)
    assert cm.bloom_impl() == "take"


def test_sampled_vmem_launch_device_pipelined():
    """The speculative filter->verify chain (bench steady state) through
    the VMEM kernel: several launches in flight, one trailing fetch."""
    import jax.numpy as jnp
    from php_aho_corasick_tpu.ops.matches import pack_documents

    rng = random.Random(77)
    patterns = list({
        bytes(rng.choice(b"abcdef") for _ in range(16)) for _ in range(32)
    })
    docs = []
    for _ in range(4):
        d = bytearray(rng.choice(b"abcdef") for _ in range(4000))
        p = rng.choice(patterns)
        pos = rng.randrange(0, len(d) - len(p))
        d[pos : pos + len(p)] = p
        docs.append(bytes(d))
    cfg = ScanConfig(backend="device", engine="cascade", auto_shard=False,
                     cascade_mode="sampled", bloom_impl="pallas_vmem",
                     cascade_vmem_bloom_bytes=1 << 21, chunk_len=512)
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(patterns)], cfg)
    m.finalize()
    cm = m.cascade_model
    assert cm.bloom_impl() == "pallas_vmem"
    halo = m.automaton.max_len - 1
    packed = pack_documents(docs, cfg.chunk_len, halo)
    chunks = jnp.asarray(packed.chunks)
    lengths = jnp.asarray(packed.lengths)
    cap_a, cap_b = 256, 256
    scalars = []
    cells = []
    for _ in range(3):
        c, n_d, nf_d, nc_d = cm.launch_device(chunks, lengths, cap_a, cap_b)
        scalars.extend((n_d, nf_d, nc_d))
        cells.append(c)
    flat = np.asarray(jnp.stack(scalars))
    assert (flat[0::3] <= cap_a).all() and (flat[1::3] <= cap_b).all()
    assert (flat[2::3] <= cm._cap_coarse).all()
    docs_a, ends_a, pids_a = cm.emit_windows_arrays(
        packed, np.asarray(cells[-1]), int(flat[1::3][-1])
    )
    want = []
    for di, d in enumerate(docs):
        for pos, pid in brute_force(patterns, d):
            want.append((di, pos, pid))
    got = list(zip(docs_a.tolist(), ends_a.tolist(), pids_a.tolist()))
    assert got == want


def test_sampled_vmem_sharded_parity():
    """The two-stage VMEM filter inside the chained shard pass (per-chip
    Mosaic kernel + fine probe + window verify) over the 8-device mesh."""
    rng = random.Random(88)
    patterns = list({
        bytes(rng.choice(b"abcdef") for _ in range(16)) for _ in range(48)
    })
    docs = []
    for _ in range(6):
        d = bytearray(rng.choice(b"abcdef") for _ in range(5000))
        for _ in range(4):
            p = rng.choice(patterns)
            pos = rng.randrange(0, len(d) - len(p))
            d[pos : pos + len(p)] = p
        docs.append(bytes(d))
    pats = [{"id": i, "value": p} for i, p in enumerate(patterns)]
    cfg = ScanConfig(backend="device", engine="cascade", auto_shard=True,
                     chunk_len=512, match_capacity=32,
                     cascade_mode="sampled", bloom_impl="pallas_vmem",
                     cascade_vmem_bloom_bytes=1 << 21)
    m = Matcher(pats, cfg)
    assert m.cascade_model.bloom_impl() == "pallas_vmem"
    res = m.match_many(docs)
    for doc, recs in zip(docs, res):
        assert [(r["pos"], r["keyIdx"]) for r in recs] == brute_force(
            patterns, doc
        )


# --------------------------------------------- stride-32 prefix refinement

def test_stride32_long_patterns_prefix_refinement():
    """Pattern sets with min length >= 47 drive the planner to stride 32
    (q=16), whose alignment-31 bit is INT32_MIN under the lowest-set-bit
    trick — the round-4 advisor's int32-overflow repro (ADVICE.md high:
    ``1 << 31`` overflowed at trace time on the grouped take path, and a
    promoted compare would have dropped alignment-31 candidates).  Plants
    occurrences at EVERY in-row offset so all 32 alignments, including
    bit 31, are exercised end to end."""
    rng = random.Random(7)
    alphabet = b"abcdef"
    patterns = [
        bytes(rng.choice(alphabet) for _ in range(rng.randint(47, 64)))
        for _ in range(12)
    ]
    patterns = list(dict.fromkeys(patterns))
    text = bytearray(rng.choice(alphabet) for _ in range(8192))
    for off in range(64):  # all alignments j = p - t in [0, 32)
        p = patterns[off % len(patterns)]
        pos = off * 120 + off
        text[pos : pos + len(p)] = p
    text = bytes(text)
    cfg = ScanConfig(backend="device", engine="cascade", auto_shard=False,
                     cascade_mode="sampled", chunk_len=1024)
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(patterns)],
                cfg)
    cm = m.cascade_model
    assert cm is not None and cm.plan.stride == 32, cm.plan.reason
    got = [(r["pos"], r["keyIdx"]) for r in m.match(text)]
    assert got == brute_force(patterns, text)


def test_records2_superstep_parity():
    """The 2-class super-step record verifier (verify_windows_records2,
    round-5 density lever) must equal the 1-step records path and brute
    force exactly — including windows with finals at BOTH half-steps and
    the overflow sentinel (dense plants force > VERIFY_KR finals)."""
    rng = random.Random(55)
    patterns = list({
        bytes(rng.choice(b"ab") for _ in range(16)) for _ in range(40)
    })
    # binary alphabet + heavy planting => overlapping matches, adjacent
    # final positions, record-slot overflow
    text = bytearray(rng.choice(b"ab") for _ in range(20000))
    for i in range(300):
        p = patterns[i % len(patterns)]
        pos = rng.randrange(0, len(text) - len(p))
        text[pos : pos + len(p)] = p
    text = bytes(text)
    cfg = ScanConfig(backend="device", engine="cascade", auto_shard=False,
                     cascade_mode="sampled", chunk_len=1024,
                     bloom_impl="pallas_vmem")
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(patterns)],
                cfg)
    cm = m.cascade_model
    assert cm is not None and cm.plan.mode == "sampled", cm.plan.reason
    if not cm.records2_ok:
        pytest.skip("records2 gate not met for this plan")
    got = [(r["pos"], r["keyIdx"]) for r in m.match(text)]
    assert got == brute_force(patterns, text)
