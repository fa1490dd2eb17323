"""rollup_sums / pivot_counts vs in-memory pandas oracles."""

import numpy as np
import pandas as pd
import ray.data

from rayhist.aggregate import pivot_counts, rollup_sums


def _df(n=1_000):
    rng = np.random.default_rng(7)
    return pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], n),
            "b": rng.choice(["p", "q"], n),
            "v": rng.integers(0, 100, n).astype(np.int64),
        }
    )


def test_rollup_sums_matches_per_level_groupbys():
    df = _df()
    ds = ray.data.from_pandas(df).repartition(6)
    got = (
        rollup_sums(ds, ["a", "b"], {"v": "sv"}, count_as="n")
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    lvl2 = df.groupby(["a", "b"], as_index=False).agg(sv=("v", "sum"), n=("v", "size"))
    lvl1 = df.groupby(["a"], as_index=False).agg(sv=("v", "sum"), n=("v", "size"))
    lvl1["b"] = "ALL"
    lvl0 = pd.DataFrame({"a": ["ALL"], "b": ["ALL"], "sv": [df["v"].sum()], "n": [len(df)]})
    exp = (
        pd.concat([lvl2, lvl1, lvl0], ignore_index=True)[["a", "b", "sv", "n"]]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)


def test_rollup_total_row_consistency():
    df = _df(400)
    got = rollup_sums(
        ray.data.from_pandas(df).repartition(4), ["a", "b"], {"v": "sv"}, count_as="n"
    )
    total = got[(got["a"] == "ALL") & (got["b"] == "ALL")]
    assert int(total["sv"].iloc[0]) == int(df["v"].sum())
    assert int(total["n"].iloc[0]) == len(df)
    # level sums telescope: sum of finest level == total
    fine = got[(got["a"] != "ALL") & (got["b"] != "ALL")]
    assert int(fine["sv"].sum()) == int(df["v"].sum())


def test_pivot_counts_matches_crosstab_and_zerofills():
    df = _df(600)
    ds = ray.data.from_pandas(df).repartition(5)
    got = pivot_counts(ds, "a", "b", ["p", "q", "never_seen"])
    ct = pd.crosstab(df["a"], df["b"])
    for a in ct.index:
        row = got[got["a"] == a].iloc[0]
        assert row["n_p"] == ct.loc[a].get("p", 0)
        assert row["n_q"] == ct.loc[a].get("q", 0)
        assert row["n_never_seen"] == 0
    assert got[["n_p", "n_q", "n_never_seen"]].dtypes.eq("int64").all()


def test_cube_levels_and_grouping_sets():
    from rayhist.aggregate import cube_levels

    assert cube_levels(["a", "b"]) == [["a", "b"], ["a"], ["b"], []]
    df = _df(500)
    import ray.data as rd

    got = rollup_sums(
        rd.from_pandas(df).repartition(4),
        ["a", "b"],
        {"v": "sv"},
        count_as="n",
        levels=cube_levels(["a", "b"]),
    )
    # the b-only marginal (absent from plain rollup) matches pandas
    bonly = got[(got["a"] == "ALL") & (got["b"] != "ALL")].set_index("b")
    exp = df.groupby("b")["v"].sum()
    for b, row in bonly.iterrows():
        assert int(row["sv"]) == int(exp[b])


def test_rollup_rejects_bad_level():
    import pytest as _pt
    import ray.data as rd

    with _pt.raises(ValueError):
        rollup_sums(rd.from_pandas(_df(10)), ["a"], {"v": "sv"}, levels=[["zzz"]])


def test_rollup_rejects_duplicate_level():
    import pytest as _pt
    import ray.data as rd

    with _pt.raises(ValueError):
        rollup_sums(
            rd.from_pandas(_df(10)), ["a", "b"], {"v": "sv"},
            levels=[["a", "b"], ["b", "a"]],
        )


def test_rollup_rejects_marker_collision():
    import pytest as _pt
    import ray.data as rd

    df = _df(20)
    df.loc[0, "a"] = "ALL"  # genuine value equal to the marker
    with _pt.raises(Exception):
        rollup_sums(rd.from_pandas(df), ["a", "b"], {"v": "sv"})
