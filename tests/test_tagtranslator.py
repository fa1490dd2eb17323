"""Runtime TagTranslator: fake negative ids for unknown strings
(TagTranslator.java:36-111, getFakeId :319-321) and the facade timeout
terminal (MapReducerJdbc.java:43-49)."""

import numpy as np
import pytest


def test_translator_known_and_fake_ids():
    from rayhist.functions.tagtranslator import TagTranslator
    from rayhist.ingest import sig_keytable

    kt = sig_keytable("/root/testdata/sf0.001")
    tr = TagTranslator(kt)
    # known strings round-trip to their keytable index
    for i, s in enumerate(kt[:5]):
        assert tr.id_of(s) == i
        assert tr.sig_of(i) == s
        assert tr.is_known(s)
    # unknown strings: stable fake ids, strictly <= -2, reversible
    # through the minting translator, identical across instances
    novel = ["etype=banana|k=999", "totally=new"]
    ids = [tr.id_of(s) for s in novel]
    assert all(i <= -2 for i in ids)
    assert ids == [TagTranslator(kt).id_of(s) for s in novel]
    assert tr.sig_of(ids[0]) == novel[0]
    assert ids[0] != ids[1]
    assert tr.sig_of(-1) is None  # the 'key absent' sentinel
    # vectorized path agrees with the scalar path
    assert tr.ids_of(kt[:3] + novel).tolist() == [0, 1, 2, *ids]


def test_unknown_tag_filter_matches_nothing_but_runs():
    """A fluent filter on a tag NO entity carries must compile, run,
    and return the zerofilled zero-count grid (the fake-id observable:
    novel strings never match a stored id)."""
    from rayhist.api import OSMEntitySnapshotView

    v = (
        OSMEntitySnapshotView.on("/root/testdata/sf0.001")
        .timestamps("2024-01-10", "2024-01-12", "DAILY")
        .osmTag("etype", "no_such_event_type_anywhere")
    )
    assert v.count() == 0  # scalar terminal
    grid = v.aggregateByTimestamp().count()  # zerofilled grid terminal
    assert len(grid) == 3
    assert grid["count"].sum() == 0


def test_facade_timeout_trips_and_passes():
    import ray.exceptions

    from rayhist.api import OSMEntitySnapshotView
    from rayhist.functions.deadline import RayhistTimeoutError

    v = (
        OSMEntitySnapshotView.on("/root/testdata/sf0.001")
        .timestamps("2024-01-10", "2024-01-12", "DAILY")
    )
    ok = v.timeout(3600).count()
    assert ok > 0
    with pytest.raises((RayhistTimeoutError, ray.exceptions.RayTaskError)) as ei:
        v.timeout(-1).count()
    assert "deadline exceeded" in str(ei.value)
