"""Runtime tag-string <-> keytable-id translator with fake negative ids.

The reference's ``TagTranslator`` (oshdb-util/.../tagtranslator/
TagTranslator.java:36-111) resolves user-supplied tag strings against
the live keytable and gives strings ABSENT from it a deterministic
"fake" NEGATIVE id (``getFakeId``, :319-321 — ``-(hash & 0x7fffffff)``),
so filters on novel strings still compile into int comparisons and
simply match nothing. The repo's ingest-time mapping packs unknowns as
-1; this class is the missing RUNTIME half: a query layer can translate
any string without re-reading the corpus.

Id space contract:
    0 .. len(keytable)-1   real keytable ids
    -1                     'key absent' (the ingest sentinel)
    <= -2                  fake ids for unknown strings (stable:
                           derived from a fixed-key 64-bit hash, so
                           identical across workers, runs and
                           parallelism levels — Java's String.hashCode
                           is deterministic too)

The reference's raw formula can collide with 0 or -1; the clamp below
keeps fakes strictly <= -2 (documented deviation, same observable:
fake ids never match a stored id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _fake_id(s: str) -> int:
    h = int(
        pd.util.hash_array(np.asarray([s], dtype=object), categorize=False)[0]
    )
    fake = -(h & 0x7FFFFFFF)
    return fake if fake <= -2 else -2  # never 0 / -1 (real / absent)


class TagTranslator:
    def __init__(self, keytable: list[str]):
        self._fwd = {s: i for i, s in enumerate(keytable)}
        self._rev = list(keytable)
        self._fakes: dict[int, str] = {}  # fake id -> string (learned)

    def id_of(self, sig: str) -> int:
        """String -> id; unknown strings get a stable fake negative id
        (and are remembered for the reverse direction)."""
        i = self._fwd.get(sig)
        if i is not None:
            return i
        fake = _fake_id(sig)
        self._fakes[fake] = sig
        return fake

    def ids_of(self, sigs) -> np.ndarray:
        """Vectorized translation (one dict pass, no per-row Python in
        callers' hot loops)."""
        return np.asarray([self.id_of(s) for s in sigs], dtype=np.int64)

    def sig_of(self, tid: int) -> str | None:
        """Id -> string; -1 -> None (absent); fake ids resolve only if
        this translator minted them (the reference caches the same way,
        TagTranslator.java keyToString)."""
        if 0 <= tid < len(self._rev):
            return self._rev[tid]
        if tid == -1:
            return None
        return self._fakes.get(tid)

    def is_known(self, sig: str) -> bool:
        return sig in self._fwd
