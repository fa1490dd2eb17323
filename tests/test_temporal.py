"""Cross-check the vectorized temporal core against the loop oracle."""

import numpy as np
import pyarrow as pa
import pytest

from rayhist.fixtures import YEAR_US, make_versions, scenario_corpus, versions_to_documents
from rayhist.model import decode_spans
from rayhist.temporal import TagFilter, contributions, snapshots

from .oracle_temporal import contributions_oracle, snapshots_oracle

YEARLY = np.array([YEAR_US[y] for y in range(2007, 2018)], dtype=np.int64)


def _snap_set(tbl: pa.Table):
    return set(zip(tbl["doc_id"].to_pylist(), tbl["ts_q"].to_pylist(), tbl["v"].to_pylist()))


def _contrib_list(tbl: pa.Table):
    acts = []
    for r in tbl.to_pylist():
        a = set()
        if r["is_creation"]:
            a.add("CREATION")
        if r["is_deletion"]:
            a.add("DELETION")
        if r["is_tag_change"]:
            a.add("TAG_CHANGE")
        if r["is_geom_change"]:
            a.add("GEOMETRY_CHANGE")
        acts.append((r["doc_id"], r["ts"], frozenset(a)))
    acts.sort(key=lambda x: (x[0], x[1]))
    return acts


@pytest.mark.parametrize("tag_filter", [None, ("etype", "click"), ("etype", None)])
def test_snapshots_scenarios(tag_filter):
    tbl = scenario_corpus()
    tf = TagFilter(*tag_filter) if tag_filter else None
    got = _snap_set(snapshots(tbl, YEARLY, tf.mask(tbl) if tf else None))
    want = snapshots_oracle(tbl, YEARLY, tag_filter)
    assert got == want


@pytest.mark.parametrize("tag_filter", [None, ("etype", "click"), ("etype", None)])
def test_contributions_scenarios(tag_filter):
    tbl = scenario_corpus()
    t0, t1 = YEAR_US[2008], YEAR_US[2016]
    tf = TagFilter(*tag_filter) if tag_filter else None
    got = _contrib_list(contributions(tbl, t0, t1, tf.mask(tbl) if tf else None))
    want = contributions_oracle(tbl, t0, t1, tag_filter)
    assert got == want


def test_contribution_known_sequences():
    """Golden assertions in the style of IterateByContributionNodesTest."""
    tbl = scenario_corpus()
    got = _contrib_list(contributions(tbl, YEAR_US[2006], YEAR_US[2018]))
    by_doc = {}
    for doc, ts, acts in got:
        by_doc.setdefault(doc, []).append(acts)
    # N3 visibility cycle: create/del/recreate/del/recreate
    assert by_doc["node/3"] == [
        frozenset({"CREATION"}),
        frozenset({"DELETION"}),
        frozenset({"CREATION"}),
        frozenset({"DELETION"}),
        frozenset({"CREATION"}),
    ]
    # C1 changeset collapse: v2..v4 in cs 777 collapse to one contribution
    assert by_doc["node/6"] == [
        frozenset({"CREATION"}),
        frozenset({"GEOMETRY_CHANGE"}),
        frozenset({"GEOMETRY_CHANGE"}),
    ]
    # D1 leading tombstone: only the recreation emits
    assert by_doc["node/8"] == [frozenset({"CREATION"})]
    # E1: collapse lands on a state identical to prev -> empty type set
    assert by_doc["node/9"] == [frozenset({"CREATION"}), frozenset()]
    # N5 pre-interval only doc emits its create
    assert by_doc["node/5"][0] == frozenset({"CREATION"})


def test_filter_relative_deletion():
    """F1: filter 'etype=click' -> losing the tag is a DELETION
    (CellIterator.java:578-595), regaining it a CREATION."""
    tbl = scenario_corpus()
    tf = TagFilter("etype", "click")
    got = _contrib_list(contributions(tbl, YEAR_US[2006], YEAR_US[2018], tf.mask(tbl)))
    seq = [a for d, _, a in got if d == "node/7"]
    assert seq == [
        frozenset({"CREATION"}),
        frozenset({"DELETION"}),
        frozenset({"CREATION"}),
    ]


def test_snapshot_pre_interval_state():
    """N5: all edits before the query timestamps -> snapshots return
    the last state at every timestamp."""
    tbl = scenario_corpus()
    got = _snap_set(snapshots(tbl, YEARLY))
    n5 = {(d, t, v) for d, t, v in got if d == "node/5"}
    assert n5 == {("node/5", int(t), 2) for t in YEARLY}


def test_randomized_against_oracle():
    """Seeded randomized histories, both views, with and without filter."""
    rng = np.random.default_rng(42)
    rows = []
    for doc in range(60):
        n = int(rng.integers(1, 12))
        ts = np.sort(rng.choice(np.arange(YEAR_US[2007], YEAR_US[2017], 10**9), n, replace=False))
        for v in range(1, n + 1):
            rows.append(
                dict(
                    doc_id=f"node/{doc}",
                    v=v,
                    ts=int(ts[v - 1]),
                    cs=doc * 1000 + (v - 1) // int(rng.integers(1, 4)),
                    uid=int(rng.integers(0, 5)),
                    visible=bool(rng.random() > 0.25),
                    lon_e7=int(rng.integers(0, 4)),
                    lat_e7=int(rng.integers(0, 4)),
                    tags={"etype": str(rng.choice(["click", "view"])), "k": str(int(rng.integers(0, 3)))},
                )
            )
    tbl = make_versions(rows)
    for tf_spec in [None, ("etype", "click")]:
        tf = TagFilter(*tf_spec) if tf_spec else None
        mask = tf.mask(tbl) if tf else None
        got = _snap_set(snapshots(tbl, YEARLY, mask))
        assert got == snapshots_oracle(tbl, YEARLY, tf_spec)
        t0, t1 = YEAR_US[2009], YEAR_US[2015]
        gotc = _contrib_list(contributions(tbl, t0, t1, mask))
        assert gotc == contributions_oracle(tbl, t0, t1, tf_spec)


def test_span_roundtrip_and_decode():
    """Span-sequence invariant: versions -> spans -> decode == versions."""
    tbl = scenario_corpus()
    docs = versions_to_documents(tbl)
    decoded = decode_spans(docs)
    want = tbl.to_pandas().sort_values(["doc_id", "v"]).reset_index(drop=True)
    got = decoded.to_pandas().sort_values(["doc_id", "v"]).reset_index(drop=True)
    got = got[want.columns.tolist()]
    import pandas.testing as pdt

    pdt.assert_frame_equal(got, want)


def test_decode_then_views_match_direct():
    """Going through the span encoding must not change view results."""
    tbl = scenario_corpus()
    docs = versions_to_documents(tbl)
    decoded = decode_spans(docs)
    assert _snap_set(snapshots(decoded, YEARLY)) == _snap_set(snapshots(tbl, YEARLY))
    t0, t1 = YEAR_US[2008], YEAR_US[2016]
    assert _contrib_list(contributions(decoded, t0, t1)) == _contrib_list(
        contributions(tbl, t0, t1)
    )


def test_aoi_contributions_s1():
    """S1: moving out of the AOI emits a DELETION, re-entry a CREATION
    (CellIterator.java:625-642 clipped-empty semantics)."""
    rows = [
        dict(doc_id="node/50", v=1, ts=YEAR_US[2008], cs=1, lon_e7=10, lat_e7=10),
        dict(doc_id="node/50", v=2, ts=YEAR_US[2010], cs=2, lon_e7=900, lat_e7=900),  # leaves AOI
        dict(doc_id="node/50", v=3, ts=YEAR_US[2012], cs=3, lon_e7=20, lat_e7=20),  # re-enters
        dict(doc_id="node/50", v=4, ts=YEAR_US[2014], cs=4, lon_e7=30, lat_e7=20),  # moves inside
    ]
    tbl = make_versions(rows)
    lon = tbl["lon_e7"].to_numpy()
    lat = tbl["lat_e7"].to_numpy()
    aoi = (lon >= 0) & (lon <= 100) & (lat >= 0) & (lat <= 100)
    got = _contrib_list(contributions(tbl, YEAR_US[2006], YEAR_US[2018], None, aoi))
    assert [a for _, _, a in got] == [
        frozenset({"CREATION"}),
        frozenset({"DELETION"}),
        frozenset({"CREATION"}),
        frozenset({"GEOMETRY_CHANGE"}),
    ]


def test_match_mask_realigned_after_sort():
    """Masks computed on unsorted input must be realigned by the
    internal sort (latent-bug regression test)."""
    rows = [
        dict(doc_id="node/60", v=2, ts=YEAR_US[2010], cs=2, lon_e7=1, lat_e7=1, tags={"etype": "click"}),
        dict(doc_id="node/60", v=1, ts=YEAR_US[2008], cs=1, lon_e7=1, lat_e7=1, tags={"etype": "view"}),
    ]
    tbl = make_versions(rows)  # deliberately out of order
    tf = TagFilter("etype", "click")
    got = _snap_set(snapshots(tbl, YEARLY, tf.mask(tbl)))
    # click only exists from 2010 on
    assert got == {("node/60", int(t), 2) for t in YEARLY if t >= YEAR_US[2010]}


def test_reverse_version_runs_invariant_end_to_end():
    """Dirty-history fixture (model.reverse_version_runs): decoding a
    document whose version runs were reversed must yield IDENTICAL
    snapshots — including geometry and the int-keytable tag_id path —
    after the interpolators' per-doc realignment (the reference's
    HEADER_TIMESTAMPS_NOT_IN_ORDER tolerance, OSHNodeImpl.java:30)."""
    import pandas as pd

    from rayhist.ingest import read_documents
    from rayhist.model import reverse_version_runs
    from rayhist.temporal import snapshots as snap_fn

    batch = read_documents("/root/testdata/sf0.001").take_batch(
        10_000, batch_format="pyarrow"
    )
    dirty = reverse_version_runs(batch)
    # the span multiset per doc is preserved, the order is not
    assert batch["spans"].to_pylist() != dirty["spans"].to_pylist()
    tsq = np.array(
        [int(np.datetime64("2024-01-15", "us").astype(np.int64))], dtype=np.int64
    )

    def snap_frame(b):
        d = decode_spans(b, tags="ids", geom=True)
        s = snap_fn(d, tsq)
        return (
            s.select(["osm_id", "ts_q", "lon_e7", "lat_e7"])
            .to_pandas()
            .sort_values(["osm_id", "ts_q"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(snap_frame(batch), snap_frame(dirty))
    # tag_id alignment: the decoded (osm_id, v) -> tag_id map must match
    key = ["osm_id", "v"]
    a = decode_spans(batch, tags="ids", geom=False).to_pandas()
    b = decode_spans(dirty, tags="ids", geom=False).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_property_random_histories_match_oracle():
    """Property test (hypothesis): arbitrary small histories — the
    vectorized core matches the loop oracle for both views under
    every filter variant."""
    from hypothesis import given, settings, strategies as st

    version_st = st.fixed_dictionaries(
        {
            "ts_i": st.integers(0, 9),
            "visible": st.booleans(),
            "cs": st.integers(0, 3),
            "lon": st.integers(0, 2),
            "etype": st.sampled_from(["click", "view"]),
        }
    )
    doc_st = st.lists(version_st, min_size=1, max_size=7)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(doc_st, min_size=1, max_size=5), st.integers(0, 8), st.integers(1, 9))
    def run(docs, a, span):
        rows = []
        for d_i, versions in enumerate(docs):
            seen = set()
            v_n = 0
            for vr in sorted(versions, key=lambda r: r["ts_i"]):
                if vr["ts_i"] in seen:
                    continue  # unique timestamps per doc
                seen.add(vr["ts_i"])
                v_n += 1
                rows.append(
                    dict(
                        doc_id=f"node/{d_i}",
                        v=v_n,
                        ts=YEAR_US[2007 + vr["ts_i"]],
                        cs=vr["cs"],
                        uid=1,
                        visible=vr["visible"],
                        lon_e7=vr["lon"],
                        lat_e7=0,
                        tags={"etype": vr["etype"]},
                    )
                )
        tbl = make_versions(rows)
        t0 = YEAR_US[2007 + a]
        t1 = YEAR_US[min(2007 + a + span, 2019)]
        for tf_spec in [None, ("etype", "click")]:
            tf = TagFilter(*tf_spec) if tf_spec else None
            mask = tf.mask(tbl) if tf else None
            assert _snap_set(snapshots(tbl, YEARLY, mask)) == snapshots_oracle(
                tbl, YEARLY, tf_spec
            )
            assert _contrib_list(contributions(tbl, t0, t1, mask)) == contributions_oracle(
                tbl, t0, t1, tf_spec
            )

    run()


def test_tagfilter_exclude_values():
    """hasTagKeyExcluding (OSMEntity.java:123-137): key present AND
    value not in the excluded set — NOT the same as key-absent."""
    import pyarrow as pa

    from rayhist.temporal import TagFilter

    tbl = pa.table({"tag_sig": ["a=1|k=2", "a=1", "k=5", "k=3", "kx=5"]})
    m = TagFilter("k", exclude_values=("5",)).mask(tbl)
    assert list(m) == [True, False, False, True, False]
    # contrast: key-absent excludes every row with the key
    m2 = TagFilter("k", exclude=True).mask(tbl)
    assert list(m2) == [False, True, False, False, True]


def test_timestamp_grid_month_end_clamp_from_origin():
    """MONTHLY/YEARLY grids anchored on day 29-31 clamp to each target
    month's end, computed start + i*period FROM THE ORIGIN
    (OSHDBTimestamps.java:185) — chained clamping would turn Jan 31
    into Mar 29."""
    from rayhist.functions.timeutil import format_iso, timestamps

    got = [format_iso(t)[:10] for t in timestamps("2024-01-31", "2024-04-30", "MONTHLY")]
    assert got == ["2024-01-31", "2024-02-29", "2024-03-31", "2024-04-30"]
    got = [format_iso(t)[:10] for t in timestamps("2016-02-29", "2019-01-01", "YEARLY")]
    assert got == ["2016-02-29", "2017-02-28", "2018-02-28"]
    import pytest

    with pytest.raises(ValueError):
        timestamps("2024-01-01", "2024-01-02", "P0D")


# ------------------------------------- review-fix regressions (round 5)


def test_tag_filter_regex_reference_semantics():
    """value_regex applies to the VALUE ALONE with a FULL match
    (valuePattern.matcher(value).matches(), MapReducer.java:559-585):
    metacharacters must not leak across the '|' tag separator, and
    user anchors must work."""
    import pyarrow as pa

    from rayhist.temporal import TagFilter

    sigs = pa.array(["a=x|b=y", "a=xzy", "etype=click", "a=x", ""])
    # '.*' must NOT consume the '|' separator: only a=xzy and a=x have
    # a-values fully matching x.*y / x
    assert TagFilter("a", value_regex="x.*y")._match_sigs(sigs).tolist() == [
        False, True, False, False, False,
    ]
    # anchors are the user's business and must behave like fullmatch
    assert TagFilter("etype", value_regex="^cli.*$")._match_sigs(sigs).tolist() == [
        False, False, True, False, False,
    ]
    # full match, not search: 'lic' is inside 'click' but not all of it
    assert TagFilter("etype", value_regex="lic")._match_sigs(sigs).tolist() == [
        False, False, False, False, False,
    ]


def test_any_tag_filter_empty_matches_nothing():
    import pyarrow as pa

    from rayhist.temporal import AnyTagFilter

    sigs = pa.array(["", "a=1"])
    assert AnyTagFilter(())._match_sigs(sigs).tolist() == [False, False]


def test_tag_filter_rejects_exclude_combinations():
    import pytest

    from rayhist.temporal import TagFilter

    with pytest.raises(ValueError, match="exclude"):
        TagFilter("k", exclude=True, exclude_values=("5",))
    with pytest.raises(ValueError, match="exclude"):
        TagFilter("k", value="x", exclude=True)
    TagFilter("k", exclude=True)  # plain key-absent still fine


def test_dwell_time_invariant_under_unsorted_runs():
    """Dwell-time integrals must survive out-of-order version runs:
    _dwell_stage realigns per doc (_sorted_versions), so a corpus with
    every document's version runs reversed yields IDENTICAL totals."""
    from rayhist.aggregate import combine_partials
    from rayhist.model import reverse_version_runs
    from rayhist.pipelines import _docs, _dwell_stage

    docs = _docs("/root/testdata/sf0.001")
    clean = combine_partials(
        docs.map_batches(_dwell_stage, batch_format="pyarrow"),
        ["etype"], {"dwell_p": "dwell_us"},
    ).sort_values("etype").reset_index(drop=True)
    dirty = combine_partials(
        docs.map_batches(reverse_version_runs, batch_format="pyarrow")
        .map_batches(_dwell_stage, batch_format="pyarrow"),
        ["etype"], {"dwell_p": "dwell_us"},
    ).sort_values("etype").reset_index(drop=True)
    assert clean.equals(dirty)
    assert (clean["dwell_us"] > 0).all() and len(clean) == 4


def test_tag_reverts_brute_force_and_unsorted_invariance():
    """Edit-war pipeline vs a pandas reference over the raw events
    derivation (tag state = (event_type, props.k) per version, user
    order = (ts, event_id)), plus the reversed-version-runs invariance
    (_revert_stage realigns per doc before the lag-2 compare)."""
    import json

    import pandas as pd

    from rayhist.aggregate import combine_partials
    from rayhist.model import reverse_version_runs
    from rayhist.pipelines import DAY_US, T0, _docs, _revert_stage, q_tag_reverts

    got = q_tag_reverts("/root/testdata/sf0.001")

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["kk"] = ev["props"].map(lambda s: int(json.loads(s)["k"]))
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["sig"] = ev["event_type"] + "|" + ev["kk"].astype(str)
    g = ev.groupby("user_id")
    rev = (ev["sig"] == g["sig"].shift(2)) & (ev["sig"] != g["sig"].shift(1))
    r = ev[rev].copy()
    r["day"] = (r["ts"].astype("int64") - T0) // DAY_US
    want = (
        r.groupby("day")
        .agg(n_reverts=("user_id", "size"), n_entities=("user_id", "nunique"))
        .reset_index()
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["n_reverts"].sum() > 0  # corpus exercises real reverts

    docs = _docs("/root/testdata/sf0.001")
    names = {"n_reverts_p": "n_reverts", "n_entities_p": "n_entities"}
    dirty = combine_partials(
        docs.map_batches(reverse_version_runs, batch_format="pyarrow")
        .map_batches(_revert_stage, batch_format="pyarrow"),
        ["day"], names,
    ).astype("int64").sort_values("day").reset_index(drop=True)
    pd.testing.assert_frame_equal(dirty, want)


def test_entity_lifespans_brute_force():
    """Entity-age histogram vs a pandas reference over raw events:
    lifespan = first event ts to last event ts when the last event is
    an error (tombstone), else to the window close."""
    import pandas as pd

    from rayhist.pipelines import DAY_US, DWELL_END, q_entity_lifespans

    got = q_entity_lifespans("/root/testdata/sf0.001")
    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).sort_values(["user_id", "ts", "event_id"])
    ev["t"] = ev["ts"].astype("int64")
    g = ev.groupby("user_id")
    first = g["t"].first()
    last_row = g.tail(1).set_index("user_id")
    deleted = (last_row["event_type"] == "error").astype("int64")
    end = last_row["t"].where(deleted == 1, DWELL_END)
    days = (end - first) // DAY_US
    want = (
        pd.DataFrame({"lifespan_days": days, "deleted": deleted})
        .groupby(["lifespan_days", "deleted"], as_index=False)
        .size()
        .rename(columns={"size": "n_entities"})
        .astype("int64")
        .sort_values(["lifespan_days", "deleted"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["n_entities"].sum() == ev["user_id"].nunique()
    assert (got["deleted"] == 1).any()  # corpus has tombstoned entities


def test_entity_tag_churn_conservation():
    """Grid cells sum to the entity count; version-weighted cells sum
    to the corpus size; n_sigs never exceeds n_versions."""
    import pandas as pd

    from rayhist.pipelines import q_entity_tag_churn

    got = q_entity_tag_churn("/root/testdata/sf0.001")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["user_id"])
    assert got["n_entities"].sum() == ev["user_id"].nunique()
    assert (got["n_versions"] * got["n_entities"]).sum() == len(ev)
    assert (got["n_sigs"] <= got["n_versions"]).all()
    assert (got["n_sigs"] < got["n_versions"]).any()  # real churn


def test_snapshot_incremental_merge_brute_force():
    """MERGE-apply vs a pandas-derived direct snapshot at T_DIFF_B,
    asserting the change stream really exercised all three actions
    (upsert of base rows, inserts, deletes)."""
    import json

    import pandas as pd

    from rayhist.pipelines import T_DIFF_B, T_MID, q_snapshot_incremental_merge

    got = q_snapshot_incremental_merge("/root/testdata/sf0.001")

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["kk"] = ev["props"].map(lambda s: int(json.loads(s)["k"]))
    ev["t"] = ev["ts"].astype("int64")
    ev = ev.sort_values(["user_id", "t", "event_id"])

    def snap_at(t):
        s = ev[ev["t"] <= t].groupby("user_id").tail(1)
        s = s[s["event_type"] != "error"]
        return s.set_index("user_id")

    want = snap_at(T_DIFF_B)
    assert got["osm_id"].tolist() == sorted(want.index)
    w = want.loc[got["osm_id"]]
    assert (got["etype"].to_numpy() == w["event_type"].to_numpy()).all()
    assert (got["kk"].to_numpy() == w["kk"].to_numpy()).all()

    base = snap_at(T_MID)
    changed = ev[(ev["t"] > T_MID) & (ev["t"] <= T_DIFF_B)]["user_id"].unique()
    assert len(set(base.index) - set(want.index)) > 0      # deletes applied
    assert len(set(want.index) - set(base.index)) > 0      # inserts applied
    assert len(set(changed) & set(base.index) & set(want.index)) > 0  # updates


def test_contributor_activity_brute_force():
    """Leaderboard vs raw-events reference (uid = round(value*100)%37)."""
    import pandas as pd

    from rayhist.pipelines import q_contributor_activity

    got = q_contributor_activity("/root/testdata/sf0.001")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["uid"] = (ev["value"].mul(100).round().astype("int64")) % 37
    ev["t"] = ev["ts"].astype("int64")
    g = ev.groupby("uid")
    want = pd.DataFrame(
        {
            "n_versions": g.size(),
            "n_entities": g["user_id"].nunique(),
            "first_ts": g["t"].min(),
            "last_ts": g["t"].max(),
        }
    ).reset_index().astype("int64")
    pd.testing.assert_frame_equal(got, want)
    assert (want["n_entities"] > 1).any()


def test_predominant_etype_dwell_invariants():
    """Winners partition the visible-dwell entity set: n_entities sums
    to the count of entities with any positive visible dwell, and the
    unsorted-runs invariance holds for the time-weighted mode too."""
    import pandas as pd

    from rayhist.aggregate import combine_partials
    from rayhist.model import reverse_version_runs
    from rayhist.pipelines import (
        _docs,
        _predominant_stage,
        q_etype_dwell_time,
        q_predominant_etype_dwell,
    )

    got = q_predominant_etype_dwell("/root/testdata/sf0.001")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["user_id", "event_type"])
    # every user has at least one non-error event in January -> dwell
    has_vis = ev[ev["event_type"] != "error"]["user_id"].nunique()
    assert got["n_entities"].sum() == has_vis
    # winners' dwell is a lower-bounded share of the total dwell
    total = q_etype_dwell_time("/root/testdata/sf0.001")["dwell_us"].sum()
    assert 0 < got["sum_dwell_us"].sum() <= total

    names = {"n_entities_p": "n_entities", "sum_dwell_p": "sum_dwell_us"}
    dirty = combine_partials(
        _docs("/root/testdata/sf0.001")
        .map_batches(reverse_version_runs, batch_format="pyarrow")
        .map_batches(_predominant_stage, batch_format="pyarrow"),
        ["etype"], names,
    ).astype({"n_entities": "int64", "sum_dwell_us": "int64"}).sort_values(
        "etype"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(dirty, got)


def test_twa_daily_invariant_under_unsorted_runs():
    """The daily TWA integral must survive out-of-order version runs
    (_twa_stage realigns per doc), and the per-day integrals must sum
    to the dwell-time total integral over the same window (the two
    derivations share the span model, so the identity is exact)."""
    from rayhist.aggregate import combine_partials
    from rayhist.model import reverse_version_runs
    from rayhist.pipelines import _docs, _dwell_stage, _twa_stage

    docs = _docs("/root/testdata/sf0.001")
    clean = combine_partials(
        docs.map_batches(_twa_stage, batch_format="pyarrow"),
        ["day"], {"vis_p": "visible_us"},
    ).sort_values("day").reset_index(drop=True)
    dirty = combine_partials(
        docs.map_batches(reverse_version_runs, batch_format="pyarrow")
        .map_batches(_twa_stage, batch_format="pyarrow"),
        ["day"], {"vis_p": "visible_us"},
    ).sort_values("day").reset_index(drop=True)
    assert clean.equals(dirty)
    dwell = combine_partials(
        docs.map_batches(_dwell_stage, batch_format="pyarrow"),
        ["etype"], {"dwell_p": "dwell_us"},
    )
    assert int(clean["visible_us"].sum()) == int(dwell["dwell_us"].sum())
