"""Checkpointed sharded execution: resume skips completed partitions,
outputs identical; salted aggregation equals unsalted."""

import json
import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from rayhist.state.checkpoint import run_sharded, salted_count_by


@pytest.fixture
def shard_inputs(tmp_path):
    ins = {}
    for i in range(4):
        p = tmp_path / f"in_{i}.parquet"
        pq.write_table(pa.table({"x": list(range(i * 10, i * 10 + 10))}), p)
        ins[f"part_{i}"] = [str(p)]
    return ins


def _process(paths):
    import ray.data

    ds = ray.data.read_parquet(paths)
    return ds.map_batches(
        lambda b: b.append_column("y", pc.multiply(b["x"], 2)), batch_format="pyarrow"
    )


def _read_all(out_dir):
    parts = sorted(Path(out_dir).glob("part_*/**/*.parquet"))
    return pa.concat_tables([pq.read_table(p) for p in parts]).sort_by("x")


def test_run_resume_and_identical_output(shard_inputs, tmp_path):
    out = tmp_path / "out"
    manifest1 = run_sharded(shard_inputs, _process, str(out))
    assert set(manifest1) == set(shard_inputs)
    full1 = _read_all(out)

    # simulate a failed run: delete two partitions' outputs and their
    # manifest lines are kept stale-free by the output-exists check
    shutil.rmtree(out / "part_1")
    shutil.rmtree(out / "part_3")
    manifest2 = run_sharded(shard_inputs, _process, str(out))
    full2 = _read_all(out)
    assert full1.equals(full2)
    # the redone partitions have fresh manifest lines; checksums match
    lines = [json.loads(ln) for ln in (out / "manifest.jsonl").read_text().splitlines()]
    by_part = {}
    for rec in lines:
        by_part.setdefault(rec["partition"], []).append(rec)
    assert len(by_part["part_1"]) == 2  # original + redo
    assert by_part["part_1"][0]["checksum"] == by_part["part_1"][1]["checksum"]
    assert len(by_part["part_0"]) == 1  # untouched partition not redone
    assert manifest2["part_0"]["wall_s"] == manifest1["part_0"]["wall_s"]


def test_manifest_lineage_and_metrics(shard_inputs, tmp_path):
    out = tmp_path / "out2"
    manifest = run_sharded(shard_inputs, _process, str(out))
    rec = manifest["part_0"]
    assert rec["rows_out"] == 10
    assert rec["engine"].startswith("rayhist")
    assert list(rec["lineage"]) == shard_inputs["part_0"]
    assert rec["wall_s"] >= 0


def test_salted_count_matches_unsalted():
    import numpy as np
    import ray.data

    rng = np.random.default_rng(2)
    # skewed key distribution: one mega-key
    keys = np.where(rng.random(20_000) < 0.6, 7, rng.integers(0, 50, 20_000))
    ds = ray.data.from_arrow(pa.table({"cell": keys.astype(np.int64), "osm_id": np.arange(20_000)}))
    salted = (
        salted_count_by(ds, ["cell"], salt_col="osm_id", n_salt=8)
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    plain = (
        ds.groupby("cell").count().to_pandas()
        .rename(columns={"count()": "n"})
        .sort_values("cell")
        .reset_index(drop=True)
    )
    assert salted.equals(plain)
