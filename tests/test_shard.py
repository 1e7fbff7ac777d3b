"""Multi-device sharded scan on the simulated 8-device CPU mesh."""

import random

import jax
import numpy as np
import pytest

from php_aho_corasick_tpu import Matcher, ScanConfig


def brute_force(patterns, text):
    out = []
    for pid, p in enumerate(patterns):
        start = text.find(p)
        while start != -1:
            out.append((start + len(p), -len(p), pid))
            start = text.find(p, start + 1)
    out.sort()
    return [(pos, pid) for pos, _, pid in out]


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("seed", range(4))
def test_sharded_equals_brute_force(seed):
    rng = random.Random(seed)
    alphabet = b"abc"
    patterns = list({
        bytes(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        for _ in range(20)
    })
    docs = [
        bytes(rng.choice(alphabet) for _ in range(rng.randint(0, 4000)))
        for _ in range(12)
    ]
    cfg = ScanConfig(backend="device", auto_shard=True, chunk_len=512,
                     match_capacity=64)
    c = Matcher([{"id": i, "value": p} for i, p in enumerate(patterns)], cfg)
    res = c.match_many(docs)
    for doc, recs in zip(docs, res):
        assert [(r["pos"], r["keyIdx"]) for r in recs] == brute_force(patterns, doc)


def test_sharded_equals_unsharded():
    rng = random.Random(99)
    patterns = [b"abcab", b"bca", b"aa"]
    docs = [bytes(rng.choice(b"abc") for _ in range(8000)) for _ in range(5)]
    pats = [{"id": i, "value": p} for i, p in enumerate(patterns)]
    on = Matcher(pats, ScanConfig(backend="device", auto_shard=True)).match_many(docs)
    off = Matcher(pats, ScanConfig(backend="device", auto_shard=False)).match_many(docs)
    assert on == off


def test_sharded_capacity_retry():
    # tiny per-shard capacity; every byte matches
    cfg = ScanConfig(backend="device", auto_shard=True, match_capacity=2,
                     chunk_len=256)
    c = Matcher(["a"], cfg)
    res = c.match(b"a" * 5000)
    assert len(res) == 5000
    assert res[-1]["pos"] == 5000


def test_per_shard_capacity_rule():
    """Round-3 scaling finding encoded as a rule: per-shard capacity
    shrinks with shard count (verify work is capacity-proportional, so
    global-sized per-shard caps made throughput FALL with devices),
    keeps a Poisson imbalance margin, and floors at the fixed term of
    the efficiency model."""
    from php_aho_corasick_tpu.parallel.shard_scan import per_shard_capacity

    est = 100_000
    shards = (1, 2, 4, 8, 16)
    caps = [per_shard_capacity(est, n) for n in shards]
    assert caps == sorted(caps, reverse=True)
    for n, c in zip(shards, caps):
        assert c >= 256
        assert c * n >= est  # margin: shards jointly cover the estimate
    assert per_shard_capacity(0, 8) == 256  # floor


def test_seed_caps_shard_scaled():
    rng = random.Random(5)
    patterns = [
        bytes(rng.choice(b"abcdef") for _ in range(16)) for _ in range(64)
    ]
    m = Matcher(
        [{"id": i, "value": p} for i, p in enumerate(set(patterns))],
        ScanConfig(backend="device", engine="cascade", auto_shard=False),
    )
    m.finalize()
    cm = m.cascade_model
    base_hits = cm._cap_hits
    cm.seed_caps(100_000, 100_000, n_shards=8)
    sharded_cap = cm._cap_hits
    cm2 = Matcher(
        [{"id": i, "value": p} for i, p in enumerate(set(patterns))],
        ScanConfig(backend="device", engine="cascade", auto_shard=False),
    )
    cm2.finalize()
    cm2 = cm2.cascade_model
    cm2.seed_caps(100_000, 100_000)
    assert sharded_cap < cm2._cap_hits
    assert sharded_cap >= base_hits  # never shrinks below prior learning


# --------------------------------------------- sharded records fast path

def _records_workload(seed=17):
    rng = random.Random(seed)
    patterns = list({
        bytes(rng.choice(b"abcdef") for _ in range(16)) for _ in range(300)
    })
    docs = []
    for _ in range(10):
        d = bytearray(rng.choice(b"abcdef") for _ in range(4000))
        for _ in range(5):
            p = rng.choice(patterns)
            pos = rng.randrange(0, len(d) - len(p))
            d[pos : pos + len(p)] = p
        docs.append(bytes(d))
    return patterns, docs


def test_sharded_records_parity():
    """The multi-chip records chain (parallel/shard_scan.
    sharded_sampled_records, VERDICT r4 #2) must equal the single-device
    records path exactly, through the public upload-per-call API."""
    patterns, docs = _records_workload()
    pats = [{"id": i, "value": p} for i, p in enumerate(patterns)]
    cfg_on = ScanConfig(backend="device", engine="cascade",
                        auto_shard=True, chunk_len=512)
    cfg_off = ScanConfig(backend="device", engine="cascade",
                         auto_shard=False, chunk_len=512)
    m_on = Matcher(pats, cfg_on)
    m_off = Matcher(pats, cfg_off)
    cm = m_on.cascade_model
    assert cm is not None and cm.records_ok, cm.plan.reason
    got = m_on.match_arrays(docs)
    expect = m_off.match_arrays(docs)
    for k in ("doc", "pos", "start_postion", "pattern"):
        np.testing.assert_array_equal(got[k], expect[k])


def test_sharded_device_corpus_records_batch():
    """Mesh-sharded DeviceCorpus handles through match_arrays_many: the
    pipelined per-shard record chains must equal the unsharded scan,
    including the overflow-retry path (tiny speculative caps)."""
    patterns, docs = _records_workload(seed=23)
    pats = [{"id": i, "value": p} for i, p in enumerate(patterns)]
    m = Matcher(pats, ScanConfig(backend="device", engine="cascade",
                                 auto_shard=True, chunk_len=512))
    expect = Matcher(
        pats, ScanConfig(backend="device", engine="cascade",
                         auto_shard=False, chunk_len=512)
    ).match_arrays(docs)
    h = m.device_corpus(docs)
    assert h.mesh is not None, "auto_shard handle should be mesh-sharded"
    got = m.match_arrays(h)
    for k in ("doc", "pos", "start_postion", "pattern"):
        np.testing.assert_array_equal(got[k], expect[k])
    # pipelined batch, with caps forced tiny so the retry path runs
    cm = m.cascade_model
    cm._cap_hits = 256
    cm._cap_flagged = 256
    got2 = m.match_arrays_many([h, h])
    for g in got2:
        for k in ("doc", "pos", "start_postion", "pattern"):
            np.testing.assert_array_equal(g[k], expect[k])


def test_sharded_records_compressed():
    """Compressed-table sharded records (signature-style sets whose
    dense table would exceed HBM) stay exact on the mesh."""
    patterns, docs = _records_workload(seed=29)
    pats = [{"id": i, "value": p} for i, p in enumerate(patterns)]
    cfg_on = ScanConfig(backend="device", engine="cascade",
                        auto_shard=True, chunk_len=512,
                        table_format="compressed")
    m_on = Matcher(pats, cfg_on)
    cm = m_on.cascade_model
    assert cm is not None and cm._compressed and cm.records_ok
    got = m_on.match_arrays(docs)
    expect = Matcher(
        pats, ScanConfig(backend="device", engine="cascade",
                         auto_shard=False, chunk_len=512)
    ).match_arrays(docs)
    for k in ("doc", "pos", "start_postion", "pattern"):
        np.testing.assert_array_equal(got[k], expect[k])
