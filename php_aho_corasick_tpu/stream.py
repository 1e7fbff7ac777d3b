"""Streaming (chunk-continuation) scanning — the ``keep=1`` capability.

The reference's C layer supports feeding one logical input as successive
chunks: ``ac_trie_search(..., keep=1)`` preserves ``last_node`` and
``base_position`` so matches spanning a chunk edge are found
(``src/multifast/ahocorasick.c:191-194, 236-238``; the PHP layer always
resets, ``php_ahocorasick.c:745``).

TPU-native equivalent: the scanner carries the exact DFA state (the
``last_node`` analog) across feeds.  The carried state is, by the AC
closure property, the longest suffix of the consumed stream that is a
trie node; its depth ``d = state_depth[state]`` is exactly the number of
trailing bytes that could still be part of a future match (the quantity
the reference's replace backlog cut is built on, ``replace.c:529``).  A
feed therefore prepends only those ``d`` bytes — NOT a fixed
``max_len - 1`` tail — before handing the buffer to the normal batched
engine pipeline, and suppresses emissions inside them.  Any match
crossing the boundary with ``l`` bytes before it implies those ``l``
bytes form a pattern prefix (a trie node), hence ``l <= d``: the ``d``
prefix bytes are sufficient for exactness.

Per-feed cost is O(len(data) + d) engine work plus an O(min(stream,
max_len)) host table walk to refresh the carried state — independent of
``max_len`` on the engine side, and the walk is at most 1024 scalar
steps (``AC_PATTRN_MAX_LENGTH``, ``actypes.h:148``).
"""

from __future__ import annotations

from typing import List, Union

import numpy as np


class StreamScanner:
    """Incremental scanner over one logical byte stream.

    Usage::

        with matcher.stream() as st:
            for chunk in chunks:
                records.extend(st.feed(chunk))

    Each record has the standard schema; positions are *global* stream
    offsets.  A pattern split across two feeds IS reported (unlike
    consecutive :meth:`Matcher.match` calls — Issue #21 semantics).
    """

    def __init__(self, matcher) -> None:
        self._m = matcher
        self._m.finalize() if not matcher.finalized else None
        self.base_position = 0  # bytes consumed so far
        self.state = 0  # carried DFA state (the ``last_node`` analog)
        self._tail = b""  # last <= max_len stream bytes (state refresh)
        self._closed = False

    @property
    def state_depth(self) -> int:
        """Trie depth of the carried state = number of trailing stream
        bytes that may still extend to a match (``replace.c:529``)."""
        return int(self._m.automaton.state_depth[self.state])

    def feed(self, data: Union[str, bytes, bytearray]) -> List[dict]:
        """Scan the next chunk; returns matches ending inside it (including
        matches that started in earlier feeds)."""
        if self._closed:
            raise ValueError("stream is closed")
        if isinstance(data, str):
            data = data.encode("utf-8")
        data = bytes(data)
        if not data:
            return []
        d = self.state_depth
        prefix = self._tail[len(self._tail) - d:] if d else b""
        text = prefix + data
        recs = self._m.match(text)
        offset = self.base_position - d
        out = []
        for r in recs:
            if r["pos"] <= d:
                continue  # ends at/inside the carried prefix: already reported
            r = dict(r)
            r["pos"] += offset
            r["start_postion"] += offset
            out.append(r)
        self._advance(data)
        return out

    def _advance(self, data: bytes) -> None:
        """Refresh (state, tail, base_position) after consuming ``data``.

        The carried state is recomputed by walking the last
        ``min(stream_len, max_len)`` bytes from the root: the true state
        has depth <= max_len, and a root walk over H >= depth trailing
        bytes lands exactly on the longest-suffix node."""
        auto = self._m.automaton
        H = auto.max_len
        self._tail = (self._tail + data)[-H:] if H else b""
        cls = auto.byte_class[np.frombuffer(self._tail, dtype=np.uint8)]
        s = np.zeros(1, dtype=np.int64)
        for c in cls:  # table-format-agnostic walk (dense or compressed)
            s = auto.lookup(s, c.reshape(1))
        self.state = int(s[0])
        self.base_position += len(data)

    def reset(self) -> None:
        """Forget all carried state (the ``keep=0`` reset,
        ``ahocorasick.c:191-192``)."""
        self._tail = b""
        self.state = 0
        self.base_position = 0

    def close(self) -> None:
        self._closed = True

    def __enter__(self) -> "StreamScanner":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
