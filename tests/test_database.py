"""Flow database round-trip and schema-compatibility tests."""

import sqlite3

import numpy as np

from polychase_tpu.io.database import Database, ImagePairFlow, INVALID_ID


def test_keypoints_roundtrip(tmp_path, rng):
    path = str(tmp_path / "flow.db")
    with Database(path) as db:
        kps = rng.uniform(0, 1000, size=(137, 2)).astype(np.float32)
        db.write_keypoints(5, kps)
        out = db.read_keypoints(5)
        np.testing.assert_array_equal(out, kps)
        assert db.keypoints_exist(5)
        assert not db.keypoints_exist(6)
        assert db.read_keypoints(99).shape == (0, 2)
        assert db.get_min_image_id_with_keypoints() == 5
        assert db.get_max_image_id_with_keypoints() == 5
        db.write_keypoints(2, kps)
        assert db.get_min_image_id_with_keypoints() == 2


def test_empty_db_min_max(tmp_path):
    with Database(str(tmp_path / "flow.db")) as db:
        assert db.get_min_image_id_with_keypoints() == INVALID_ID
        assert db.get_max_image_id_with_keypoints() == INVALID_ID


def test_pair_flow_roundtrip(tmp_path, rng):
    path = str(tmp_path / "flow.db")
    with Database(path) as db:
        kps = rng.uniform(0, 1000, size=(64, 2)).astype(np.float32)
        db.write_keypoints(1, kps)
        idx = rng.integers(0, 64, size=40).astype(np.uint32)
        tgt = rng.uniform(0, 1000, size=(40, 2)).astype(np.float32)
        err = rng.uniform(0, 5, size=40).astype(np.float32)
        db.write_image_pair_flow(1, 2, idx, tgt, err)

        flow = db.read_image_pair_flow(1, 2)
        np.testing.assert_array_equal(flow.src_kps_indices, idx)
        np.testing.assert_array_equal(flow.tgt_kps, tgt)
        np.testing.assert_array_equal(flow.flow_errors, err)
        assert db.image_pair_flow_exists(1, 2)
        assert not db.image_pair_flow_exists(2, 1)
        assert db.find_optical_flows_from_image(1) == [2]
        assert db.find_optical_flows_to_image(2) == [1]
        # object-style write
        flow.image_id_to = 3
        db.write_image_pair_flow(flow)
        assert sorted(db.find_optical_flows_from_image(1)) == [2, 3]


def test_on_disk_schema_matches_reference(tmp_path, rng):
    """The raw blobs/tables must be readable by plain sqlite3 exactly as the
    reference lays them out (cpp/database.cc:108-158)."""
    path = str(tmp_path / "flow.db")
    kps = rng.uniform(0, 100, size=(10, 2)).astype(np.float32)
    idx = np.arange(7, dtype=np.uint32)
    tgt = rng.uniform(0, 100, size=(7, 2)).astype(np.float32)
    err = rng.uniform(0, 1, size=7).astype(np.float32)
    with Database(path) as db:
        db.write_keypoints(4, kps)
        db.write_image_pair_flow(4, 5, idx, tgt, err)

    conn = sqlite3.connect(path)
    tables = {
        r[0]
        for r in conn.execute(
            "SELECT name FROM sqlite_master WHERE type='table'"
        )
    }
    assert {"keypoints", "optical_flow"} <= tables

    n, blob = conn.execute(
        "SELECT rows, keypoints FROM keypoints WHERE image_id=4"
    ).fetchone()
    assert n == 10
    assert blob == kps.tobytes()  # raw float32 memcpy layout

    n, ib, tb, eb = conn.execute(
        "SELECT rows, src_keypoints_indices, tgt_keypoints, flow_errors"
        " FROM optical_flow WHERE image_id_from=4 AND image_id_to=5"
    ).fetchone()
    assert n == 7
    assert ib == idx.tobytes()
    assert tb == tgt.tobytes()
    assert eb == err.tobytes()
    # composite primary key present
    info = conn.execute("PRAGMA table_info(optical_flow)").fetchall()
    pk_cols = [r[1] for r in info if r[5] > 0]
    assert pk_cols == ["image_id_from", "image_id_to"]
    conn.close()


def test_foreign_key_cascade(tmp_path, rng):
    """Deleting keypoints cascades to flows (cpp/database.cc:130)."""
    path = str(tmp_path / "flow.db")
    with Database(path) as db:
        db.write_keypoints(1, rng.uniform(0, 10, (5, 2)).astype(np.float32))
        db.write_image_pair_flow(
            1, 2, np.arange(3, dtype=np.uint32),
            np.zeros((3, 2), np.float32), np.zeros(3, np.float32),
        )
        db._conn.execute("DELETE FROM keypoints WHERE image_id=1")
        db._conn.commit()
        assert not db.image_pair_flow_exists(1, 2)


def test_deferred_commits_batch_into_one_transaction(tmp_path, rng):
    """Inside deferred_commits() writes stay invisible to OTHER
    connections; the outermost exit publishes everything at once.
    (The analyze loop batches each frame's 8 pair writes this way.)"""
    path = str(tmp_path / "flow.db")
    db = Database(path)
    reader = sqlite3.connect(path)

    def visible_rows():
        return reader.execute(
            "SELECT COUNT(*) FROM optical_flow"
        ).fetchone()[0]

    db.write_keypoints(0, rng.uniform(0, 10, (4, 2)).astype(np.float32))
    with db.deferred_commits():
        with db.deferred_commits():  # reentrant: inner exit must not commit
            db.write_image_pair_flow(
                0, 1, np.arange(2, dtype=np.uint32),
                np.zeros((2, 2), np.float32), np.zeros(2, np.float32),
            )
        db.write_image_pair_flow(
            0, 2, np.arange(2, dtype=np.uint32),
            np.zeros((2, 2), np.float32), np.zeros(2, np.float32),
        )
        assert visible_rows() == 0
    assert visible_rows() == 2
    # Normal per-write commits resume after the block.
    db.write_image_pair_flow(
        0, 3, np.arange(2, dtype=np.uint32),
        np.zeros((2, 2), np.float32), np.zeros(2, np.float32),
    )
    assert visible_rows() == 3
    reader.close()
    db.close()


def test_range_readers_match_point_reads(tmp_path):
    """read_flows_to_image_range / read_keypoints_range (the tracking
    scan chain's one-query batch reads) must agree exactly with the
    reference-shaped per-pair point reads."""
    import numpy as np

    from polychase_tpu.io.database import Database

    rng = np.random.default_rng(11)
    db = Database(str(tmp_path / "range.db"))
    kps = {}
    for i in range(6):
        kps[i] = rng.uniform(0, 640, (rng.integers(3, 9), 2)).astype(
            np.float32
        )
        db.write_keypoints(i, kps[i])
    pairs = [(0, 2), (1, 2), (3, 2), (1, 4), (5, 4), (0, 5)]
    for f, t in pairs:
        n = kps[f].shape[0]
        db.write_image_pair_flow(
            f, t, np.arange(n, dtype=np.uint32),
            rng.uniform(0, 640, (n, 2)).astype(np.float32),
            rng.uniform(0, 1, n).astype(np.float32),
        )

    flows = db.read_flows_to_image_range(2, 4)
    assert sorted(flows.keys()) == [2, 4]
    assert [fl.image_id_from for fl in flows[2]] == [0, 1, 3]
    for t, lst in flows.items():
        for fl in lst:
            ref = db.read_image_pair_flow(fl.image_id_from, t)
            np.testing.assert_array_equal(
                fl.src_kps_indices, ref.src_kps_indices
            )
            np.testing.assert_array_equal(fl.tgt_kps, ref.tgt_kps)
            np.testing.assert_array_equal(fl.flow_errors, ref.flow_errors)

    got_kps = db.read_keypoints_range(1, 4)
    assert sorted(got_kps.keys()) == [1, 2, 3, 4]
    for i, arr in got_kps.items():
        np.testing.assert_array_equal(arr, kps[i])
    assert db.read_flows_to_image_range(6, 9) == {}
    db.close()
