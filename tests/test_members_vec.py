"""A/B equivalence of the vectorized compound-document engine
(rayhist.members_vec) against the per-document reference path
(rayhist.members) — on the real cached corpora AND on adversarial
synthetic documents hitting the edge semantics the vec engine mirrors
(duplicate members, equal-ts versions, tag keep-last dedup, missing
children, empty member lists)."""

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayhist import members
from rayhist.fixtures import make_compound_doc
from rayhist.members_vec import (
    contribution_stats_batch_vec,
    snapshot_geoms_batch_vec,
)

SF = "/root/testdata/sf0.001"
TS = [
    int(np.datetime64(f"2024-01-{d:02d}", "us").astype(np.int64))
    for d in (1, 8, 15, 22, 29)
] + [int(np.datetime64("2024-02-02", "us").astype(np.int64))]


def _batch_of(span_docs: list[list[dict]], ids=None) -> pa.Table:
    """Wrap span lists into the compound-document batch layout."""
    flat = [s for doc in span_docs for s in doc]
    spans_flat = pa.StructArray.from_arrays(
        [
            pa.array([s["kind"] for s in flat], type=pa.string()),
            pa.array([s["text"] for s in flat], type=pa.string()),
            pa.array([s.get("media_ref", "") for s in flat], type=pa.string()),
            pa.array([s["offset"] for s in flat], type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    offs = np.r_[0, np.cumsum([len(d) for d in span_docs])].astype(np.int32)
    return pa.table(
        {
            "osm_id": pa.array(
                ids if ids is not None else list(range(len(span_docs))),
                type=pa.int64(),
            ),
            "spans": pa.ListArray.from_arrays(pa.array(offs), spans_flat),
        }
    )


def _load(path: str) -> pa.Table:
    return pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(path + "/*.parquet"))]
    ).combine_chunks()


def _assert_contrib_ab(tbl, match_py, match_kv):
    old = members.contribution_stats_batch(tbl, 0, 1 << 61, match=match_py)
    new = contribution_stats_batch_vec(tbl, 0, 1 << 61, match_kv=match_kv)
    assert old.to_pydict() == new.to_pydict()


def _assert_snap_ab(tbl, id_name="way_id"):
    old = (
        members.snapshot_geoms_batch(tbl, TS, match=lambda v: True, id_name=id_name)
        .to_pandas()
        .sort_values([id_name, "ts_q"])
        .reset_index(drop=True)
    )
    new = (
        snapshot_geoms_batch_vec(tbl, TS, id_name=id_name)
        .to_pandas()
        .sort_values([id_name, "ts_q"])
        .reset_index(drop=True)
    )
    assert old.equals(new)


@pytest.fixture(scope="module")
def way_tbl():
    from rayhist.ingest import ensure_way_documents

    return _load(ensure_way_documents(SF))


@pytest.fixture(scope="module")
def rel_tbl():
    from rayhist.ingest import ensure_relation_documents

    return _load(ensure_relation_documents(SF))


def test_way_corpus_contrib_ab(way_tbl):
    _assert_contrib_ab(way_tbl, lambda v: True, None)


def test_way_corpus_contrib_filtered_ab(way_tbl):
    _assert_contrib_ab(way_tbl, lambda v: v.tags.get("k") == "3", ("k", "3"))


def test_way_corpus_snapshots_ab(way_tbl):
    _assert_snap_ab(way_tbl)


def test_relation_corpus_contrib_ab(rel_tbl):
    _assert_contrib_ab(rel_tbl, lambda v: True, None)


def test_relation_corpus_contrib_filtered_ab(rel_tbl):
    _assert_contrib_ab(rel_tbl, lambda v: v.tags.get("k") == "3", ("k", "3"))


def test_relation_corpus_snapshots_ab(rel_tbl):
    _assert_snap_ab(rel_tbl, id_name="rel_id")


def _adversarial_docs() -> pa.Table:
    """Edge-semantics documents: duplicate member entries, equal-ts
    parent versions (last (ts,v) wins for state AND changeset map),
    duplicate tag keys (keep-last), members referencing missing
    children, a version with NO members (snapshot skip rule), and a
    child whose visible flag toggles (coords drop mid-history)."""
    d1 = make_compound_doc(
        "way/1",
        [
            {"v": 1, "ts": 100, "cs": 11, "uid": 1, "visible": True,
             "tags": {"a": "1"}, "members": [("node/10", ""), ("node/10", ""), ("node/11", "")]},
            # equal-ts second version: state + cs-map must take v=2
            {"v": 2, "ts": 100, "cs": 12, "uid": 2, "visible": True,
             "tags": {"a": "2"}, "members": [("node/10", ""), ("node/11", "")]},
            # no members at all: snapshot skip rule; missing child ref
            {"v": 3, "ts": 300, "cs": 13, "uid": 3, "visible": True,
             "tags": {"a": "2"}, "members": []},
            {"v": 4, "ts": 400, "cs": 14, "uid": 4, "visible": True,
             "tags": {"a": "2"}, "members": [("node/10", ""), ("node/99", "")]},
        ],
        {
            "node/10": [
                {"v": 1, "ts": 100, "cs": 50, "uid": 7, "visible": True, "lon": 5, "lat": 6},
                {"v": 2, "ts": 150, "cs": 51, "uid": 8, "visible": False, "lon": 0, "lat": 0},
                {"v": 3, "ts": 350, "cs": 52, "uid": 9, "visible": True, "lon": 7, "lat": 8},
            ],
            "node/11": [
                {"v": 1, "ts": 100, "cs": 60, "uid": 5, "visible": True, "lon": 1, "lat": 2},
                {"v": 2, "ts": 250, "cs": 61, "uid": 6, "visible": True, "lon": 3, "lat": 4},
            ],
        },
    )
    # duplicate tag key in the span stream: dict keeps the LAST value
    d2 = make_compound_doc(
        "way/2",
        [
            {"v": 1, "ts": 100, "cs": 21, "uid": 1, "visible": True,
             "tags": {}, "members": [("node/20", "")]},
            {"v": 2, "ts": 200, "cs": 22, "uid": 2, "visible": False,
             "tags": {}, "members": [("node/20", "")]},
            {"v": 3, "ts": 300, "cs": 23, "uid": 3, "visible": True,
             "tags": {"k": "3"}, "members": [("node/20", "")]},
        ],
        {
            "node/20": [
                {"v": 1, "ts": 100, "cs": 70, "uid": 4, "visible": True, "lon": 9, "lat": 9},
                {"v": 2, "ts": 250, "cs": 71, "uid": 5, "visible": True, "lon": 9, "lat": 10},
            ]
        },
    )
    dup = {"kind": "tag", "text": "k=OVERRIDDEN", "media_ref": "", "offset": -1}
    # splice a duplicate "k=..." before the real one for version 3 of d2
    idx = next(i for i, s in enumerate(d2) if s["text"] == "k=3")
    d2.insert(idx, dup)
    for i, s in enumerate(d2):
        s["offset"] = i
    return _batch_of([d1, d2], ids=[1, 2])


def test_adversarial_contrib_ab():
    tbl = _adversarial_docs()
    _assert_contrib_ab(tbl, lambda v: True, None)
    _assert_contrib_ab(tbl, lambda v: v.tags.get("k") == "3", ("k", "3"))
    _assert_contrib_ab(tbl, lambda v: v.tags.get("a") == "2", ("a", "2"))


def test_adversarial_snapshots_ab():
    tbl = _adversarial_docs()
    for ts in ([50], [100], [150, 250, 350], [125, 500]):
        old = (
            members.snapshot_geoms_batch(tbl, ts, match=lambda v: True)
            .to_pandas()
            .sort_values(["way_id", "ts_q"])
            .reset_index(drop=True)
        )
        new = (
            snapshot_geoms_batch_vec(tbl, ts)
            .to_pandas()
            .sort_values(["way_id", "ts_q"])
            .reset_index(drop=True)
        )
        assert old.equals(new), f"mismatch at ts={ts}"


def test_vec_handles_empty_batch():
    tbl = _batch_of([])
    out = contribution_stats_batch_vec(tbl, 0, 1 << 61)
    assert out["n_part"].to_pylist() == [0]
    snaps = snapshot_geoms_batch_vec(tbl, TS)
    assert snaps.num_rows == 0


def test_separator_adversarial_tag_values_and_roles_ab():
    """Tag VALUES containing ';'/'=' must not collide distinct tag
    dicts in the vectorized signature (a ';' join read {'a':'1;b=2'}
    and {'a':'1','b':'2'} as equal -> missed TAG_CHANGE), and a role
    containing '@role=' must split on the FIRST marker like the
    per-document parser."""
    from rayhist.fixtures import make_compound_doc

    d = make_compound_doc(
        "way/9",
        [
            {"v": 1, "ts": 100, "cs": 1, "uid": 1, "visible": True,
             "tags": {"a": "1;b=2"},
             "members": [("node/90", "x@role=y")]},
            # same ';'-joined signature, DIFFERENT tag dict: TAG_CHANGE
            {"v": 2, "ts": 200, "cs": 2, "uid": 2, "visible": True,
             "tags": {"a": "1", "b": "2"},
             "members": [("node/90", "x@role=y")]},
        ],
        {
            "node/90": [
                {"v": 1, "ts": 100, "cs": 5, "uid": 3, "visible": True, "lon": 1, "lat": 2},
            ]
        },
    )
    tbl = _batch_of([d], ids=[9])
    _assert_contrib_ab(tbl, None, None)
    new = contribution_stats_batch_vec(tbl, 0, 1 << 61, match_kv=None)
    assert new.to_pydict()["tag_part"][0] == 1  # the change IS detected


# ---------------------------------------------------- old-style A/B


@pytest.fixture(scope="module")
def oldstyle_tbl():
    from rayhist.ingest import ensure_oldstyle_documents

    return _load(ensure_oldstyle_documents(SF))


def _oldstyle_ref_rows(tbl, match_py):
    """Per-(doc, ts) old-style metrics via the per-document reference
    path, in the vec output's column shape."""
    rows = []
    for spans in tbl["spans"].to_pylist():
        doc = members.parse_doc(spans)
        for t, _st, holes in members.snapshots_old_style(doc, TS, match=match_py):
            rows.append(
                (
                    int(t),
                    len(holes),
                    int(sum(int(r[:, 0].sum()) for r in holes)),
                    int(sum(int(r[:, 1].sum()) for r in holes)),
                )
            )
    return sorted(rows)


def _assert_oldstyle_ab(tbl, match_py, match_kv):
    from rayhist.members_vec import snapshots_old_style_batch_vec

    new = snapshots_old_style_batch_vec(tbl, TS, match_kv=match_kv)
    got = sorted(
        zip(
            new["ts_q"].to_pylist(),
            new["n_holes"].to_pylist(),
            new["sum_lon"].to_pylist(),
            new["sum_lat"].to_pylist(),
        )
    )
    assert got == _oldstyle_ref_rows(tbl, match_py)


def test_oldstyle_corpus_ab(oldstyle_tbl):
    _assert_oldstyle_ab(oldstyle_tbl, None, None)


def test_oldstyle_corpus_filtered_ab(oldstyle_tbl):
    _assert_oldstyle_ab(
        oldstyle_tbl, lambda v: v.tags.get("k") == "3", ("k", "3")
    )


def test_oldstyle_adversarial_ab():
    """Edge shapes: multiple outers (disqualify), interesting relation
    tag (disqualify), missing outer child, node as inner member (no
    points), invisible inner way, and a plain qualifying relation."""
    T1, T2 = TS[1], TS[3]

    def ver(off, **kw):
        d = dict(v=1, ts=T1 - 1, cs=1, uid=1, vis=1)
        d.update(kw)
        return {
            "kind": "version",
            "text": (
                f"child={d['child']};" if "child" in d else ""
            )
            + f"v={d['v']};ts={d['ts']};cs={d['cs']};uid={d['uid']};vis={d['vis']}",
            "offset": off,
        }

    def tag(off, k, v):
        return {"kind": "tag", "text": f"{k}={v}", "offset": off}

    def mem(off, ent, role):
        return {"kind": "member", "text": f"{ent}@role={role}", "offset": off}

    def geom(off, lon, lat):
        return {
            "kind": "geom",
            "text": "",
            "media_ref": f"geom:v=1;lon={lon};lat={lat}",
            "offset": off,
        }

    def node(cid, off, lon, lat, vis=1):
        return [ver(off, child=cid, vis=vis), geom(off + 1, lon, lat)]

    def way(cid, off, nodes, vis=1):
        spans = [ver(off, child=cid, vis=vis)]
        spans += [mem(off + 1 + i, n, "node") for i, n in enumerate(nodes)]
        return spans

    def rel(off, tags, membs):
        spans = [ver(off)]
        spans += [tag(off + 1 + i, k, v) for i, (k, v) in enumerate(tags)]
        spans += [
            mem(off + 10 + i, e, r) for i, (e, r) in enumerate(membs)
        ]
        return spans

    docs = []
    # qualifying: one outer way (k=3), one inner way with 2 nodes
    docs.append(
        rel(0, [("type", "multipolygon")], [("w1", "outer"), ("w2", "inner")])
        + way("w1", 20, ["n1"])
        + [tag(22, "k", "3")]  # hmm: tag attaches to most recent version (w1)
        + way("w2", 30, ["n2", "n3"])
        + node("n1", 40, 1, 2)
        + node("n2", 50, 10, 20)
        + node("n3", 60, 30, 40)
    )
    # multiple outers: disqualified
    docs.append(
        rel(0, [("type", "multipolygon")], [("w1", "outer"), ("w2", "outer")])
        + way("w1", 20, ["n1"])
        + way("w2", 30, ["n2"])
        + node("n1", 40, 1, 2)
        + node("n2", 50, 3, 4)
    )
    # interesting relation tag: disqualified
    docs.append(
        rel(0, [("type", "multipolygon"), ("building", "yes")], [("w1", "outer")])
        + way("w1", 20, ["n1"])
        + node("n1", 40, 1, 2)
    )
    # outer child missing from doc: skipped
    docs.append(
        rel(0, [("type", "multipolygon")], [("ghost", "outer"), ("w2", "inner")])
        + way("w2", 30, ["n2"])
        + node("n2", 50, 3, 4)
    )
    # node as inner member: ring resolves one level down -> no points
    docs.append(
        rel(0, [("type", "boundary")], [("w1", "outer"), ("n9", "inner")])
        + way("w1", 20, ["n1"])
        + node("n1", 40, 1, 2)
        + node("n9", 50, 7, 8)
    )
    # invisible inner way at T2: ring dropped from T2 on
    docs.append(
        rel(0, [("type", "multipolygon")], [("w1", "outer"), ("w2", "inner")])
        + way("w1", 20, ["n1"])
        + way("w2", 30, ["n2"])
        + [ver(33, child="w2", v=2, ts=T2, vis=0)]
        + node("n1", 40, 1, 2)
        + node("n2", 50, 5, 6)
    )
    tbl = _batch_of(docs)
    _assert_oldstyle_ab(tbl, None, None)
    _assert_oldstyle_ab(tbl, lambda v: v.tags.get("k") == "3", ("k", "3"))
