"""cvsteer-run CLI: list input, gain vs normalize, g2/g4 paths, bad files.

Parity surface of example/steer.cpp (C21-C23 in SURVEY.md/PARITY.md).
"""

import os
import pathlib

import numpy as np
import pytest

from cvsteer_tpu import cli

ASSETS = pathlib.Path(__file__).parent / "assets"


def _read(path):
    import cv2

    img = cv2.imread(str(path), 0)
    assert img is not None, path
    return img


def test_single_image_outputs(tmp_path):
    rc = cli.main(
        ["--input", str(ASSETS / "fish.jpg"), "--output", str(tmp_path)]
    )
    assert rc == 0
    for suffix in ("edges", "lines_dark", "lines_bright"):
        out = _read(tmp_path / f"fish_{suffix}.png")
        assert out.shape == (185, 256)
        assert out.max() > 100  # min-max normalized to full range


def test_list_file_input_skips_unreadable(tmp_path, capsys):
    lst = tmp_path / "inputs.txt"
    lst.write_text(f"{ASSETS / 'fish.jpg'}\n{tmp_path / 'missing.jpg'}\n")
    rc = cli.main(["--input", str(lst), "--output", str(tmp_path), "--verbose"])
    assert rc == 0
    assert (tmp_path / "fish_edges.png").exists()
    err = capsys.readouterr().err
    assert "missing.jpg" in err  # skipped with a note, not a crash


def test_gain_vs_normalize(tmp_path):
    out_a = tmp_path / "a"
    out_b = tmp_path / "b"
    cli.main(["--input", str(ASSETS / "fish.jpg"), "--output", str(out_a)])
    cli.main(
        ["--input", str(ASSETS / "fish.jpg"), "--output", str(out_b), "--gain", "0.05"]
    )
    norm = _read(out_a / "fish_edges.png")
    gain = _read(out_b / "fish_edges.png")
    assert norm.max() == 255  # normalized fills the range
    assert gain.max() < 255  # small fixed gain does not saturate
    assert not np.array_equal(norm, gain)


def test_g4_filter_path(tmp_path):
    rc = cli.main(
        [
            "--input", str(ASSETS / "fish.jpg"),
            "--output", str(tmp_path),
            "--filters", "g4",
        ]
    )
    assert rc == 0
    out = _read(tmp_path / "fish_edges.png")
    assert out.shape == (185, 256) and out.max() > 100


def test_mesh_option(tmp_path, rng, capsys):
    """--mesh shards the batch; divisible shapes use it, odd ones fall back
    with an accurate reason; sharded output == unsharded output."""
    from cvsteer_tpu.io.imageio import imwrite_u8

    # 64x128 synthetic images: divisible by space=2 and batch 4 by data=4
    lst = tmp_path / "in.txt"
    names = []
    for i in range(4):
        p = tmp_path / f"im{i}.png"
        imwrite_u8(str(p), rng.integers(0, 255, (64, 128), dtype=np.uint8))
        names.append(str(p))
    lst.write_text("\n".join(names) + "\n")

    out = tmp_path / "out"
    rc = cli.main(
        ["--input", str(lst), "--output", str(out), "--mesh", "data=4,space=2"]
    )
    assert rc == 0
    assert "mesh skipped" not in capsys.readouterr().err  # sharding was used

    out_ref = tmp_path / "out_ref"
    assert cli.main(["--input", str(lst), "--output", str(out_ref)]) == 0
    for i in range(4):
        a = _read(out / f"im{i}_edges.png")
        b = _read(out_ref / f"im{i}_edges.png")
        np.testing.assert_array_equal(a, b)  # sharded path == single-device

    # the fish (185 rows, batch 1) cannot shard -> falls back with a reason
    rc = cli.main(
        [
            "--input", str(ASSETS / "fish.jpg"),
            "--output", str(out),
            "--mesh", "data=4,space=2",
        ]
    )
    assert rc == 0
    err = capsys.readouterr().err
    assert "mesh skipped" in err and "not divisible" in err
    assert (out / "fish_edges.png").exists()


def test_mesh_option_rejects_bad_values(tmp_path):
    import pytest

    for bad in ("data", "data=x", "rows=8"):
        with pytest.raises(SystemExit):
            cli.main(
                ["--input", str(ASSETS / "fish.jpg"), "--mesh", bad]
            )


def test_mesh_option_g4(tmp_path, rng, capsys):
    """--mesh now also shards the G4 pipeline (round-2: parity of entry
    points between filter orders); sharded == unsharded output."""
    from cvsteer_tpu.io.imageio import imwrite_u8

    lst = tmp_path / "in.txt"
    names = []
    for i in range(4):
        p = tmp_path / f"g4im{i}.png"
        imwrite_u8(str(p), rng.integers(0, 255, (64, 128), dtype=np.uint8))
        names.append(str(p))
    lst.write_text("\n".join(names) + "\n")

    out = tmp_path / "out_g4"
    rc = cli.main(
        ["--input", str(lst), "--output", str(out), "--filters", "g4",
         "--mesh", "data=4,space=2"]
    )
    assert rc == 0
    assert "mesh skipped" not in capsys.readouterr().err

    out_ref = tmp_path / "out_g4_ref"
    assert cli.main(
        ["--input", str(lst), "--output", str(out_ref), "--filters", "g4"]
    ) == 0
    for i in range(4):
        a = _read(out / f"g4im{i}_edges.png").astype(int)
        b = _read(out_ref / f"g4im{i}_edges.png").astype(int)
        assert np.abs(a - b).max() <= 1  # 8-bit quantization slack
