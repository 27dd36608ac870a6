"""The lock-serialized fixture publish (cdc.fixtures.publish_fixture_dir):
losers must ADOPT the winner's directory, and a published directory must
never be deleted out from under readers — the TOCTOU the unlocked
rename-based protocol still had."""

from __future__ import annotations

import json
import os
import threading

from astro_data_pipeline_spark.cdc.fixtures import publish_fixture_dir


def _build(tmp_path, tag: str) -> str:
    d = tmp_path / f"build-{tag}"
    d.mkdir()
    (d / "data.parquet").write_bytes(b"x" * 64)
    (d / "meta.json").write_text(json.dumps({"fixture_version": 1, "by": tag}))
    return str(d)


def _reader(target: str):
    def read_valid():
        try:
            with open(os.path.join(target, "meta.json")) as f:
                meta = json.load(f)
            if meta.get("fixture_version") == 1 and os.path.exists(
                os.path.join(target, "data.parquet")
            ):
                return meta
        except (OSError, ValueError):
            pass
        return None

    return read_valid


def test_publish_and_adopt(tmp_path):
    target = str(tmp_path / "fixture")
    read_valid = _reader(target)
    m1 = publish_fixture_dir(_build(tmp_path, "a"), target, read_valid)
    assert m1["by"] == "a"
    # second publisher must adopt the existing valid fixture, not clobber
    m2 = publish_fixture_dir(_build(tmp_path, "b"), target, read_valid)
    assert m2["by"] == "a"
    assert not os.path.exists(str(tmp_path / "build-b"))  # tmp consumed/discarded


def test_invalid_occupant_is_replaced(tmp_path):
    target = tmp_path / "fixture"
    target.mkdir()
    (target / "meta.json").write_text(json.dumps({"fixture_version": 999}))
    m = publish_fixture_dir(_build(tmp_path, "a"), str(target), _reader(str(target)))
    assert m["by"] == "a"


def test_racing_publishers_one_winner_files_never_vanish(tmp_path):
    """16 threads race; every caller gets the SAME winner meta, and the
    published data file exists at every observation point after the
    first publish completes."""
    target = str(tmp_path / "fixture")
    read_valid = _reader(target)
    results: list = []
    errors: list = []
    barrier = threading.Barrier(16)

    def go(tag: str):
        tmp = _build(tmp_path, tag)
        barrier.wait()
        try:
            meta = publish_fixture_dir(tmp, target, read_valid)
            # after ANY publish returns, the fixture must be readable —
            # a racing loser must not have deleted the winner's files
            assert os.path.exists(os.path.join(target, "data.parquet"))
            results.append(meta["by"])
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    threads = [threading.Thread(target=go, args=(f"t{i}",)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(set(results)) == 1  # everyone adopted one winner
