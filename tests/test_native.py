"""Native (C++) builder/oracle vs Python builder: bit-identical tables and
identical scan results."""

import random

import numpy as np
import pytest

from php_aho_corasick_tpu import AddStatus
from php_aho_corasick_tpu.core import TrieBuilder, compile_trie
from php_aho_corasick_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def py_build(patterns, max_len=1024):
    t = TrieBuilder(max_len)
    lens, statuses = [], []
    for p in patterns:
        st = t.add(p)
        statuses.append(st)
        if st == AddStatus.SUCCESS:
            lens.append(len(p))
    return compile_trie(t, lens), statuses


@pytest.mark.parametrize("seed", range(10))
def test_native_matches_python_builder(seed):
    rng = random.Random(1000 + seed)
    alphabet = bytes(rng.sample(range(256), rng.randint(2, 30)))
    patterns = [
        bytes(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(rng.randint(1, 200))
    ]
    py_auto, py_st = py_build(patterns)
    nat_auto, nat_st = native.build_native(patterns)
    assert py_st == nat_st
    assert py_auto.final_start == nat_auto.final_start
    assert py_auto.max_len == nat_auto.max_len
    assert py_auto.n_classes == nat_auto.n_classes
    np.testing.assert_array_equal(py_auto.byte_class, nat_auto.byte_class)
    np.testing.assert_array_equal(py_auto.table, nat_auto.table)
    np.testing.assert_array_equal(py_auto.emit_start, nat_auto.emit_start)
    np.testing.assert_array_equal(py_auto.emit_pats, nat_auto.emit_pats)
    np.testing.assert_array_equal(py_auto.pat_lens, nat_auto.pat_lens)
    nat_auto.validate()


def test_native_statuses():
    _, st = native.build_native([b"ab", b"ab", b"", b"x" * 2000], max_pattern_length=1024)
    assert st == [
        AddStatus.SUCCESS,
        AddStatus.DUPLICATE_PATTERN,
        AddStatus.ZERO_PATTERN,
        AddStatus.LONG_PATTERN,
    ]


@pytest.mark.parametrize("seed", range(5))
def test_oracle_scan_matches_host_scan(seed):
    from php_aho_corasick_tpu.config import ScanConfig
    from php_aho_corasick_tpu.models.dense_dfa import DenseDfaModel

    rng = random.Random(2000 + seed)
    alphabet = b"abcde"
    patterns = list({
        bytes(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(30)
    })
    auto, _ = native.build_native(patterns)
    text = bytes(rng.choice(alphabet) for _ in range(5000))
    pos_o, st_o, carry_o = native.oracle_scan(auto, text)

    model = DenseDfaModel(auto, ScanConfig())
    pos_h, st_h, carry_h = model.scan_host(np.frombuffer(text, dtype=np.uint8))
    np.testing.assert_array_equal(pos_o, pos_h)
    np.testing.assert_array_equal(st_o, st_h)
    assert carry_o == carry_h


def test_oracle_overflow_retry():
    auto, _ = native.build_native([b"a"])
    text = b"a" * 100_000
    pos, st, _ = native.oracle_scan(auto, text)
    assert pos.shape[0] == 100_000
    assert (st >= auto.final_start).all()


def test_matcher_native_vs_python_builder_goldens():
    from php_aho_corasick_tpu import Matcher, ScanConfig

    pats = [
        {"key": "ab", "value": "alfa"},
        {"key": "ad", "value": "gamma", "aux": [1]},
        {"id": 0, "value": "zeta"},
        {"value": "lfa"},
    ]
    hay = "alFABETA gamma zetaomegaalfa!"
    a = Matcher(pats, ScanConfig(prefer_native_builder=True)).match(hay)
    b = Matcher(pats, ScanConfig(prefer_native_builder=False)).match(hay)
    assert a == b and len(a) == 4


def test_native_kgram_build_matches_numpy():
    from php_aho_corasick_tpu.models.kgram_dfa import build_kgram_table

    auto, _ = native.build_native([b"he", b"she", b"his", b"hers"])
    for k in (2, 4):
        nat = native.kgram_build(auto, k)
        ref = build_kgram_table(auto, k)
        np.testing.assert_array_equal(nat, ref)
