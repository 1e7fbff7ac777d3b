"""Unit tests for trie building, validation rules, and table compilation."""

import numpy as np
import pytest

from php_aho_corasick_tpu import (
    AddStatus,
    AhoError,
    AhoWarning,
    Matcher,
    PatternFormatError,
    ScanConfig,
    StateError,
    ahocorasick_add_patterns,
    ahocorasick_finalize,
    ahocorasick_init,
)
from php_aho_corasick_tpu.core import TrieBuilder, compile_trie


# ------------------------------------------------------- validation rules

def test_unknown_field_warns_and_fails():
    with pytest.warns(AhoWarning):
        assert ahocorasick_init([{"value": "x", "bogus": 1}]) is False


def test_missing_value_warns_and_fails():
    with pytest.warns(AhoWarning):
        assert ahocorasick_init([{"key": "k"}]) is False


def test_key_and_id_exclusive():
    with pytest.warns(AhoWarning):
        assert ahocorasick_init([{"key": "k", "id": 1, "value": "v"}]) is False


def test_bad_id_type_raises():
    # reference throws AhoException (php_ahocorasick.c:253-262)
    with pytest.raises(AhoError):
        ahocorasick_init([{"id": "not-int", "value": "v"}])
    with pytest.raises(AhoError):
        ahocorasick_init([{"id": True, "value": "v"}])


def test_bad_key_value_type_raises():
    with pytest.raises(AhoError):
        ahocorasick_init([{"key": 5, "value": "v"}])
    with pytest.raises(AhoError):
        ahocorasick_init([{"value": 5}])


def test_ignorecase_deprecated_warns_but_succeeds():
    with pytest.warns(AhoWarning):
        c = ahocorasick_init([{"value": "ab", "ignoreCase": True}])
    assert c is not False
    assert c.match("xAbab")[0]["pos"] == 5  # still case-sensitive


def test_field_names_case_insensitive():
    c = ahocorasick_init([{"Key": "k", "VALUE": "ab", "AUX": 7}])
    assert c is not False
    assert c.match("ab") == [
        {"pos": 2, "key": "k", "aux": 7, "start_postion": 0, "value": "ab"}
    ]


def test_bare_string_spec_counts_as_value():
    c = Matcher(["ab", b"cd"])
    recs = c.match(b"abcd")
    assert [r["value"] for r in recs] == ["ab", b"cd"]


def test_batch_failure_is_atomic():
    c = Matcher()
    with pytest.warns(AhoWarning):
        with pytest.raises(PatternFormatError):
            c.add_patterns([{"value": "ok"}, {"nope": 1}])
    assert c.n_patterns == 0  # nothing from the failed batch was inserted


# ------------------------------------------------------- add statuses

def test_add_statuses_surface_silent_drops():
    c = Matcher()
    st = c.add_patterns(["ab", "ab", "", "x" * 2000, "cd"])
    assert st == [
        AddStatus.SUCCESS,
        AddStatus.DUPLICATE_PATTERN,
        AddStatus.ZERO_PATTERN,
        AddStatus.LONG_PATTERN,
        AddStatus.SUCCESS,
    ]
    # parity: rejected patterns simply never match
    assert [r["value"] for r in c.match("abcd")] == ["ab", "cd"]


def test_add_after_finalize_guard():
    c = Matcher(["ab"])
    c.finalize()
    with pytest.warns(AhoWarning):
        assert ahocorasick_add_patterns(c, ["cd"]) is False
    with pytest.warns(AhoWarning):
        with pytest.raises(StateError):
            c.add_patterns(["cd"])


def test_finalize_true_only_on_transition():
    c = Matcher(["ab"])
    assert ahocorasick_finalize(c) is True
    assert ahocorasick_finalize(c) is False


def test_empty_init_matches_nothing():
    c = Matcher([])
    assert c.match("anything at all") == []


# ------------------------------------------------------- table compilation

def build(patterns, **kw):
    t = TrieBuilder(**kw)
    lens = []
    for p in patterns:
        assert t.add(p) == AddStatus.SUCCESS
        lens.append(len(p))
    return compile_trie(t, lens)


def test_hand_computed_automaton():
    # classic textbook set: he / she / his / hers
    auto = build([b"he", b"she", b"his", b"hers"])
    auto.validate()
    assert auto.n_states == 10  # root + 9 trie nodes
    assert auto.max_len == 4
    # used bytes: e,h,i,r,s -> 5 classes + default
    assert auto.n_classes == 6

    # walk "ushers": states must flag matches at she(4), he(4), hers(6)
    bc = auto.byte_class
    s = 0
    hits = []
    for i, b in enumerate(b"ushers"):
        s = int(auto.table[s, bc[b]])
        if s >= auto.final_start:
            lo, hi = auto.emit_start[s], auto.emit_start[s + 1]
            hits.append((i + 1, sorted(auto.emit_pats[lo:hi].tolist())))
    # pattern ids: he=0 she=1 his=2 hers=3
    assert hits == [(4, [0, 1]), (6, [3])]


def test_emit_order_longest_first():
    # own pattern precedes failure-chain factors (node_collect_matches
    # order, node.c:424-441) -> decreasing length in CSR rows
    auto = build([b"a", b"ba", b"cba"])
    auto.validate()
    for s in range(auto.final_start, auto.n_states):
        lo, hi = auto.emit_start[s], auto.emit_start[s + 1]
        lens = auto.pat_lens[auto.emit_pats[lo:hi]]
        assert (np.diff(lens) < 0).all() or lens.size == 1


def test_unused_bytes_share_default_class():
    auto = build([b"ab"])
    assert auto.n_classes == 3
    assert auto.byte_class[ord("z")] == 0
    assert auto.byte_class[0xFF] == 0
    # default class always returns to root
    assert (auto.table[:, 0] == 0).all()


def test_int16_selection():
    small = build([b"abc"])
    assert small.table.dtype == np.int16
    t = TrieBuilder()
    t.add(b"x")
    assert compile_trie(t, [1], allow_int16=False).table.dtype == np.int32


def test_save_load_roundtrip(tmp_path):
    auto = build([b"he", b"she", b"his", b"hers"])
    p = tmp_path / "auto.npz"
    auto.save(p)
    from php_aho_corasick_tpu.core.tables import CompiledAutomaton

    back = CompiledAutomaton.load(p)
    back.validate()
    assert (back.table == auto.table).all()
    assert (back.emit_pats == auto.emit_pats).all()
    assert back.final_start == auto.final_start
    assert back.max_len == auto.max_len
