"""Independent per-document Python oracle for the temporal semantics.

A literal, loop-based transcription of the reference's logic, kept
deliberately separate from the vectorized implementation in
``rayhist.temporal`` so the two can cross-check each other:

- snapshots:      CellIterator.iterateByTimestamps (CellIterator.java:181-347)
                  + OSHEntities.getByTimestamps (OSHEntities.java:41-60)
- contributions:  CellIterator.iterateByContribution (CellIterator.java:437-712)
                  + OSHEntities.getModificationTimestamps (OSHEntities.java:241-302)
"""

from __future__ import annotations

import pyarrow as pa


def _docs(tbl: pa.Table):
    rows = tbl.to_pylist()
    docs: dict[str, list[dict]] = {}
    for r in rows:
        docs.setdefault(r["doc_id"], []).append(r)
    for doc_id in docs:
        docs[doc_id].sort(key=lambda r: (r["ts"], r["v"]))
    return docs


def _matches(r: dict, tag_filter) -> bool:
    if tag_filter is None:
        return True
    key, value = tag_filter
    tags = dict(t.split("=", 1) for t in r["tag_sig"].split("|") if t)
    if value is None:
        return key in tags
    return tags.get(key) == value


def snapshots_oracle(tbl: pa.Table, timestamps, tag_filter=None):
    """-> set of (doc_id, ts_q, v) of emitted snapshots."""
    out = set()
    for doc_id, versions in _docs(tbl).items():
        for t_q in timestamps:
            state = None
            for r in versions:  # oldest->newest; ties -> highest v wins
                if r["ts"] <= t_q:
                    state = r
            if state is None:
                continue
            if state["visible"] and _matches(state, tag_filter):
                out.add((doc_id, int(t_q), state["v"]))
    return out


def contributions_oracle(tbl: pa.Table, t_from, t_to, tag_filter=None):
    """-> list of (doc_id, ts, frozenset(activity)) sorted by (doc, ts)."""
    results = []
    for doc_id, versions in _docs(tbl).items():
        # modification timestamps under filter (getModificationTimestamps)
        match = [r["visible"] and _matches(r, tag_filter) for r in versions]
        kept = []
        for i, r in enumerate(versions):
            if match[i]:
                kept.append(i)
            elif i > 0 and match[i - 1]:
                kept.append(i)  # first non-match after a match
        # changeset collapse: keep last of consecutive same-changeset run
        collapsed = []
        for j, i in enumerate(kept):
            if j + 1 < len(kept) and versions[kept[j + 1]]["cs"] == versions[i]["cs"]:
                continue
            collapsed.append(i)
        # walk with prev, classify
        prev = None  # (row, was_present)
        for i in collapsed:
            r = versions[i]
            present = match[i]
            acts = set()
            if not present:
                if prev is not None and prev[1]:
                    acts = {"DELETION"}
                else:
                    prev = prev  # no emission, prev unchanged
                    continue
            elif prev is None or not prev[1]:
                acts = {"CREATION"}
            else:
                p = prev[0]
                if p["tag_sig"] != r["tag_sig"]:
                    acts.add("TAG_CHANGE")
                if (p["lon_e7"], p["lat_e7"]) != (r["lon_e7"], r["lat_e7"]):
                    acts.add("GEOMETRY_CHANGE")
            if t_from <= r["ts"] < t_to:
                results.append((doc_id, r["ts"], frozenset(acts)))
            prev = (r, present)
    results.sort(key=lambda x: (x[0], x[1]))
    return results
