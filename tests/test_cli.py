"""Headless CLI parity (SURVEY §2.1 C21): generate_database + visualize_flow
run end-to-end in-process on a tiny synthetic clip, like the reference's
example programs (cpp/examples/generate_database.cc, visualize_flow.cc)."""

import numpy as np
import pytest

from polychase_tpu.cli import generate_database as gen_cli
from polychase_tpu.cli import visualize_flow as viz_cli
from polychase_tpu.io.database import Database

from test_opticalflow import make_clip


@pytest.fixture
def frames_dir(tmp_path, rng):
    from PIL import Image

    d = tmp_path / "frames"
    d.mkdir()
    for i, f in enumerate(make_clip(rng, n=6)):
        Image.fromarray(f).save(d / f"frame_{i:04d}.png")
    return d


def test_generate_database_cli(frames_dir, tmp_path, capsys):
    db_path = tmp_path / "flow.db"
    rc = gen_cli.main([
        "--images-dir", str(frames_dir),
        "--database-path", str(db_path),
        "--min-distance", "7",
    ])
    assert rc == 0
    assert "Done" in capsys.readouterr().out

    db = Database(str(db_path))
    for fid in range(6):
        assert db.read_keypoints(fid).shape[0] > 10
    flow = db.read_image_pair_flow(2, 3)
    assert flow.src_kps_indices.size > 10
    db.close()


def test_visualize_flow_cli(frames_dir, tmp_path):
    db_path = tmp_path / "flow.db"
    assert gen_cli.main([
        "--images-dir", str(frames_dir),
        "--database-path", str(db_path),
        "--min-distance", "7",
    ]) == 0

    out_dir = tmp_path / "viz"
    rc = viz_cli.main([
        "--images-dir", str(frames_dir),
        "--database-path", str(db_path),
        "--output-dir", str(out_dir),
    ])
    assert rc == 0
    pngs = sorted(out_dir.glob("flow_*.png"))
    assert len(pngs) == 6
    from PIL import Image

    overlay = np.asarray(Image.open(pngs[0]))
    orig = np.asarray(Image.open(sorted(frames_dir.glob("*.png"))[0]))
    assert overlay.shape[:2] == orig.shape[:2]
    assert not np.array_equal(overlay, orig)  # crosses/flow lines were drawn


def test_generate_database_cli_empty_dir(tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    rc = gen_cli.main([
        "--images-dir", str(empty),
        "--database-path", str(tmp_path / "x.db"),
    ])
    assert rc == 1
