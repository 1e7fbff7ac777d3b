"""Streaming (chunk-continuation) scanning — the ``keep=1`` capability.

The reference's C layer supports feeding one logical input as successive
chunks: ``ac_trie_search(..., keep=1)`` preserves ``last_node`` and
``base_position`` so matches spanning a chunk edge are found
(``src/multifast/ahocorasick.c:191-194, 236-238``; the PHP layer always
resets, ``php_ahocorasick.c:745``).

TPU-native equivalent: instead of carrying a DFA node pointer, the stream
keeps the last ``max_len - 1`` *bytes* as a tail.  The DFA state at any
position depends on at most that many preceding bytes, so prepending the
tail to the next chunk and suppressing emissions inside it reproduces the
exact single-pass match stream — while each ``feed`` can still use the
batched, halo-chunked device scan internally (the tail IS the halo carried
across calls; SURVEY §2.4 "chunk-halo / sequence continuation").
"""

from __future__ import annotations

from typing import List, Optional, Union


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
        self._tail = b""
        self._closed = False

    def feed(self, data: Union[str, bytes, bytearray]) -> List[dict]:
        """Scan the next chunk; returns matches ending inside it (including
        matches that started in earlier chunks)."""
        if self._closed:
            raise ValueError("stream is closed")
        if isinstance(data, str):
            data = data.encode("utf-8")
        data = bytes(data)
        if not data:
            return []
        text = self._tail + data
        tail_len = len(self._tail)
        offset = self.base_position - tail_len
        recs = self._m.match(text)
        out = []
        for r in recs:
            if r["pos"] <= tail_len:
                continue  # already reported by an earlier feed
            r = dict(r)
            r["pos"] += offset
            r["start_postion"] += offset
            out.append(r)
        halo = max(self._m.automaton.max_len - 1, 0)
        self._tail = text[len(text) - min(halo, len(text)) :] if halo else b""
        self.base_position += len(data)
        return out

    def reset(self) -> None:
        """Forget all carried state (the ``keep=0`` reset,
        ``ahocorasick.c:191-192``)."""
        self._tail = b""
        self.base_position = 0

    def close(self) -> None:
        self._closed = True

    def __enter__(self) -> "StreamScanner":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
