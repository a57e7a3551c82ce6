"""Versioned table semantics: append/overwrite/merge_insert/meta/resume."""

import pyarrow as pa
import pytest

from hydra_ray.sources.store import VersionedTable


def t(ids, vals):
    return pa.table({"k": pa.array(ids, type=pa.string()), "v": pa.array(vals, type=pa.int64())})


@pytest.mark.usefixtures("ray_session")
class TestVersionedTable:
    def test_append_versions(self, tmp_path):
        vt = VersionedTable(str(tmp_path / "t"))
        assert vt.is_empty() and vt.latest_version() == 0
        vt.append(t(["a"], [1]))
        vt.append(t(["b"], [2]))
        assert vt.latest_version() == 2
        assert vt.count() == 2
        # older version still readable (time travel)
        assert vt.count(version=1) == 1

    def test_overwrite(self, tmp_path):
        vt = VersionedTable(str(tmp_path / "t"))
        vt.append(t(["a"], [1]))
        vt.overwrite(t(["z"], [9]))
        got = vt.read_arrow()
        assert got["k"].to_pylist() == ["z"]

    def test_merge_insert_upsert(self, tmp_path):
        vt = VersionedTable(str(tmp_path / "t"))
        vt.overwrite(t(["a", "b"], [1, 2]))
        vt.merge_insert(t(["b", "c"], [20, 30]), key="k")
        got = vt.read_arrow().sort_by("k")
        assert got["k"].to_pylist() == ["a", "b", "c"]
        assert got["v"].to_pylist() == [1, 20, 30]

    def test_merge_insert_dedups_incoming_last_wins(self, tmp_path):
        vt = VersionedTable(str(tmp_path / "t"))
        vt.overwrite(t(["a"], [1]))
        vt.merge_insert(t(["b", "b"], [5, 6]), key="k")
        got = vt.read_arrow().sort_by("k")
        assert got["v"].to_pylist() == [1, 6]

    def test_meta_cursor(self, tmp_path):
        vt = VersionedTable(str(tmp_path / "t"))
        vt.append(t(["a"], [1]), meta={"iteration": 1})
        assert vt.meta()["iteration"] == 1
        vt.commit_meta({"iteration": 2})
        assert vt.meta()["iteration"] == 2
        assert vt.count() == 1  # files unchanged

    def test_read_as_dataset(self, tmp_path):
        vt = VersionedTable(str(tmp_path / "t"))
        vt.append(t(["a", "b"], [1, 2]))
        ds = vt.read()
        assert ds.count() == 2


def test_lineage_chain(tmp_path, ray_session):
    import json

    import pyarrow as pa

    from hydra_ray.sources.store import VersionedTable

    t = VersionedTable(str(tmp_path / "tbl"))
    t.overwrite(pa.table({"x": [1]}), meta={"iteration": 0})
    t.append(pa.table({"x": [2]}), meta={"iteration": 1})
    t.append(pa.table({"x": [3]}), meta={"iteration": 2})
    lin = t.lineage().to_pylist()
    assert [r["version"] for r in lin] == [1, 2, 3]
    assert [r["parent"] for r in lin] == [0, 1, 2]
    assert [json.loads(r["meta"])["iteration"] for r in lin] == [0, 1, 2]
    assert lin[-1]["n_files"] >= lin[0]["n_files"]
