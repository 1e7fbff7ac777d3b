"""Golden parity corpus — ports of the reference's 6 conformance tests.

Each expectation block below is transcribed from the corresponding
``--EXPECT--`` section of ``/root/reference/tests/test{1..6}.phpt`` (PHP
``var_dump`` output rewritten as Python literals, byte-for-byte equal in
content: same record count, same field set, same key order, same values).
"""

import pytest

from php_aho_corasick_tpu import (
    AhoError,
    Matcher,
    ScanConfig,
    ahocorasick_add_patterns,
    ahocorasick_deinit,
    ahocorasick_init,
    ahocorasick_isValid,
    ahocorasick_match,
)


def cfg(backend):
    return ScanConfig(backend=backend)


def assert_records(actual, expected):
    assert actual == expected
    # key order is API surface too (PHP array key order in var_dump)
    for a, e in zip(actual, expected):
        assert list(a.keys()) == list(e.keys())


# ---------------------------------------------------------------- test1

TEST1_PATTERNS = [
    {"key": "ab", "value": "alfa"},
    {"key": "ac", "value": "beta"},
    {"key": "ad", "value": "gamma", "aux": [1]},
    {"key": "ae", "value": "delta"},
    {"id": 0, "value": "zeta"},
    {"key": "ag", "value": "omega"},
    {"value": "lfa"},
]

TEST1_EXPECT = [
    {"pos": 14, "key": "ad", "aux": [1], "start_postion": 9, "value": "gamma"},
    {"pos": 19, "keyIdx": 0, "start_postion": 15, "value": "zeta"},
    {"pos": 24, "key": "ag", "start_postion": 19, "value": "omega"},
    {"pos": 28, "key": "ab", "start_postion": 24, "value": "alfa"},
    {"pos": 28, "start_postion": 25, "value": "lfa"},
]


def test1_core_matching(backend):
    c = Matcher(TEST1_PATTERNS, cfg(backend))
    d1 = c.match("alFABETA gamma zetaomegaalfa!")
    assert c.close()
    assert_records(d1, TEST1_EXPECT)
    assert len(d1) == 5
    assert d1[4] == {"pos": 28, "start_postion": 25, "value": "lfa"}


def test1_utf8_byte_positions(backend):
    # positions are BYTE offsets (tests/test1.phpt:120-157)
    c = Matcher(
        [{"value": "你好"}, {"value": "hi"}, {"value": "谢谢"}, {"value": "thanks"}],
        cfg(backend),
    )
    res = c.match("你好，hi，谢谢，thanks")
    assert_records(
        res,
        [
            {"pos": 6, "start_postion": 0, "value": "你好"},
            {"pos": 11, "start_postion": 9, "value": "hi"},
            {"pos": 20, "start_postion": 14, "value": "谢谢"},
            {"pos": 29, "start_postion": 23, "value": "thanks"},
        ],
    )
    assert c.close()


# ---------------------------------------------------------------- test2

AUX1 = [["helloAuxObject", 41]]
AUX2 = 0x42
AUX3 = "simple-aux"

TEST2_PATTERNS = [
    {"key": "ab", "value": "alfa"},
    {"key": "ac", "value": "beta"},
    {"key": "ad", "value": "gamma", "aux": AUX2},
    {"key": "ae", "value": "delta", "aux": AUX3},
    {"key": "af", "value": "zeta"},
    {"key": "ag", "value": "omega"},
    {"key": "ah", "value": "lfa"},
    {"id": 42, "value": "pie"},
    {"value": "simple"},
    {"value": "aux", "aux": AUX1},
    {"value": "aux2", "aux": AUX2},
    {"value": "aux3", "aux": AUX1},
    {"value": "ščř+éé"},
    {"value": "éé"},
]

TEST2_STR = (
    "alFABETA gammadelta delta delta simple pie! aux "
    "ssščř+ééžž ččř é é-é éeéee éé aux2 aux3 aux2"
)

TEST2_EXPECT = [
    {"pos": 14, "key": "ad", "aux": 66, "start_postion": 9, "value": "gamma"},
    {"pos": 19, "key": "ae", "aux": "simple-aux", "start_postion": 14, "value": "delta"},
    {"pos": 25, "key": "ae", "aux": "simple-aux", "start_postion": 20, "value": "delta"},
    {"pos": 31, "key": "ae", "aux": "simple-aux", "start_postion": 26, "value": "delta"},
    {"pos": 38, "start_postion": 32, "value": "simple"},
    {"pos": 42, "keyIdx": 42, "start_postion": 39, "value": "pie"},
    {"pos": 47, "aux": AUX1, "start_postion": 44, "value": "aux"},
    {"pos": 61, "start_postion": 50, "value": "ščř+éé"},
    {"pos": 61, "start_postion": 57, "value": "éé"},
    {"pos": 94, "start_postion": 90, "value": "éé"},
    {"pos": 98, "aux": AUX1, "start_postion": 95, "value": "aux"},
    {"pos": 99, "aux": 66, "start_postion": 95, "value": "aux2"},
    {"pos": 103, "aux": AUX1, "start_postion": 100, "value": "aux"},
    {"pos": 104, "aux": AUX1, "start_postion": 100, "value": "aux3"},
    {"pos": 108, "aux": AUX1, "start_postion": 105, "value": "aux"},
    {"pos": 109, "aux": 66, "start_postion": 105, "value": "aux2"},
]


def test2_aux_and_lifecycle(backend):
    c = ahocorasick_init(TEST2_PATTERNS)
    assert c is not False
    c.config = cfg(backend)

    d = ahocorasick_match(TEST2_STR, c)
    assert_records(d, TEST2_EXPECT)
    assert len(d) == 16
    # aux objects are shared by reference, not copied
    assert d[6]["aux"] is AUX1

    assert ahocorasick_match("alFABETAABECEDAAAA!", c) == []
    assert ahocorasick_match("alFABETAABECEDAAAA!", c, False) == []
    assert ahocorasick_match("alFABETAABECEDAAAA!", c, True) == []

    assert ahocorasick_isValid(c) is True
    assert ahocorasick_deinit(c) is True
    assert ahocorasick_isValid(c) is False
    assert ahocorasick_deinit(c) is False


# ---------------------------------------------------------------- test3

def test3_incremental_build(backend):
    # init(empty) + 5 add_patterns batches == one-shot init (test3.phpt:12-24)
    c = ahocorasick_init([])
    assert c is not False
    c.config = cfg(backend)
    assert ahocorasick_add_patterns(c, [{"key": "ab", "value": "alfa"}])
    assert ahocorasick_add_patterns(c, [{"key": "ac", "value": "beta"}])
    assert ahocorasick_add_patterns(c, [{"key": "ad", "value": "gamma", "aux": [1]}])
    assert ahocorasick_add_patterns(c, [{"key": "ae", "value": "delta"}])
    assert ahocorasick_add_patterns(
        c,
        [
            {"id": 0, "value": "zeta"},
            {"key": "ag", "value": "omega"},
            {"value": "lfa"},
        ],
    )
    d1 = ahocorasick_match("alFABETA gamma zetaomegaalfa!", c)
    assert ahocorasick_deinit(c)
    assert_records(d1, TEST1_EXPECT)


# ---------------------------------------------------------------- test4

def test4_stress_repeated_lifecycle(backend):
    # 20 x (init + N matches + deinit), 4 matches each (test4.phpt:15-27).
    # The reference's memory-corruption regression; here it also hammers
    # jit-cache reuse across fresh Matcher instances.
    s = "aoeu a5 a5 a5 a5 aoeu"
    n_inner = 1000 if backend == "host" else 25
    for _ in range(20):
        c = Matcher([{"value": "a5"}], cfg(backend))
        for _ in range(n_inner):
            d = c.match(s)
            assert len(d) == 4
        assert c.close()


# ---------------------------------------------------------------- test5

def test5_multibyte_no_state_pollution(backend):
    data = [
        {"key": "熊本県熊本市北区四方寄町", "value": "北区四方寄町"},
        {"key": "熊本県熊本市北区立福寺町", "value": "北区立福寺町"},
    ]
    haystacks = [
        "東京都東京都", "兵庫県兵庫県", "奈良県奈良県", "兵庫県兵庫県",
        "兵庫県兵庫県", "兵庫県兵庫県", "兵庫県兵庫県", "埼玉県埼玉県",
        "兵庫県兵庫県", "兵庫県兵庫県", "兵庫県兵庫県", "東京都東京都",
        "愛知県、大阪府愛知県", "墨田区錦糸町駅前東京都墨田区錦糸町駅",
        "東京都渋谷区東京都渋谷区",
    ]
    c = Matcher(data, cfg(backend))
    for h in haystacks:
        assert c.match(h) == []
    # and a positive control
    assert c.match("熊本県熊本市北区四方寄町")[0]["value"] == "北区四方寄町"


# ---------------------------------------------------------------- test6

def test6_no_state_bleed_between_calls(backend):
    # Issue #21 (package.xml:38-40): consecutive match() calls must NOT
    # join haystacks (test6.phpt).
    data = [
        {"key": "a", "value": "abcd"},
        {"key": "b", "value": "ghij"},
        {"key": "c", "value": "defg"},
        {"key": "d", "value": "defghijkl"},
    ]
    c = Matcher(data, cfg(backend))
    first = c.match("abcde")
    second = c.match("fghij")
    third = c.match("klmno")
    assert c.close()
    assert_records(
        first, [{"pos": 4, "key": "a", "start_postion": 0, "value": "abcd"}]
    )
    assert_records(
        second, [{"pos": 5, "key": "b", "start_postion": 1, "value": "ghij"}]
    )
    assert third == []
