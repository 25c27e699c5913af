"""Concurrency stress: shared Database from multiple threads, and the
frame-provide handshake under provider jitter (SURVEY §5.2)."""

import threading
import time

import numpy as np
import pytest

import polychase_tpu.polychase_core as pc


def test_database_concurrent_readers_writers(tmp_path, rng):
    """One Database instance hammered by 4 threads — the internal lock
    must serialize sqlite access (the reference's GuardedDatabase,
    cpp/opticalflow.cc:39-69)."""
    db = pc.Database(str(tmp_path / "flow.db"))
    errors = []
    n_per_thread = 40

    def worker(tid):
        try:
            r = np.random.default_rng(tid)
            for i in range(n_per_thread):
                fid = tid * n_per_thread + i
                kps = r.uniform(0, 100, (17, 2)).astype(np.float32)
                db.write_keypoints(fid, kps)
                back = db.read_keypoints(fid)
                assert back.shape == (17, 2)
                if i > 0:
                    idx = np.arange(5, dtype=np.uint32)
                    db.write_image_pair_flow(
                        fid - 1, fid, idx,
                        r.uniform(0, 100, (5, 2)).astype(np.float32),
                        np.zeros(5, np.float32),
                    )
                    assert db.image_pair_flow_exists(fid - 1, fid)
                # cross-thread reads of whatever exists
                db.get_max_image_id_with_keypoints()
                db.find_optical_flows_to_image(fid)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    for tid in range(4):
        for i in range(n_per_thread):
            assert db.read_keypoints(tid * n_per_thread + i).shape[0] == 17
    db.close()


def test_opticalflow_thread_jittery_provider(tmp_path, rng):
    """Frames provided from a separate thread with random delays: the
    handshake (request -> provide, 10 s timeout) must not deadlock or
    drop frames (cpp/opticalflow_thread.h:139-164)."""
    import cv2

    base = rng.integers(0, 255, (160, 220)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), 1.5)
    base = (255 * (base - base.min()) / np.ptp(base)).astype(np.uint8)
    frames = [
        np.ascontiguousarray(base[2 * t : 2 * t + 120, 3 * t : 3 * t + 160])
        for t in range(6)
    ]

    info = pc.VideoInfo(width=160, height=120, first_frame=0, num_frames=6)
    db_path = str(tmp_path / "flow.db")
    thread = pc.OpticalFlowThread(info, db_path)

    pending = []
    pending_lock = threading.Lock()
    stop = threading.Event()

    def provider():
        r = np.random.default_rng(7)
        while not stop.is_set():
            with pending_lock:
                fid = pending.pop(0) if pending else None
            if fid is None:
                time.sleep(0.002)
                continue
            time.sleep(float(r.uniform(0, 0.05)))
            thread.provide_frame(fid, frames[fid])

    prov = threading.Thread(target=provider)
    prov.start()
    done = False
    err = None
    deadline = time.time() + 300
    try:
        while not done and time.time() < deadline:
            msg = thread.try_pop()
            if msg is None:
                time.sleep(0.005)
                continue
            if isinstance(msg, bool):
                done = True
            elif isinstance(msg, Exception):
                err = msg
                break
            elif isinstance(msg, pc.OpticalFlowRequest):
                with pending_lock:
                    pending.append(msg.frame_id)
    finally:
        stop.set()
        prov.join()
        thread.join()
    assert err is None, err
    assert done

    db = pc.Database(db_path)
    assert db.get_max_image_id_with_keypoints() == 5
    db.close()
