"""Shared demo utilities (softmac_tpu/utils.py) — the GIF writers that
mirror reference softmac/utils.py:11-27."""
import numpy as np

from softmac_tpu import utils


def test_make_gif_from_files(tmp_path):
    import imageio.v2 as imageio
    pics = tmp_path / "pics"
    pics.mkdir()
    for i in range(3):
        frame = np.full((8, 8, 3), i * 40, np.uint8)
        imageio.imwrite(pics / f"frame_{i:03d}.png", frame)
    (pics / "notes.txt").write_text("ignored")   # non-image files skipped

    utils.make_gif_from_files(pics, tmp_path, name="movie_r5")
    frames = imageio.mimread(tmp_path / "movie_r5.gif")
    assert len(frames) == 3
    # sorted filename order preserved
    assert frames[0][0, 0, 0] == 0 and frames[2][0, 0, 0] >= 75


def test_make_gif_from_numpy(tmp_path):
    import imageio.v2 as imageio
    imgs = [np.zeros((8, 8, 3), np.uint8), np.ones((8, 8, 3), np.uint8) * 255]
    utils.make_gif_from_numpy(imgs, tmp_path)
    assert len(imageio.mimread(tmp_path / "movie.gif")) == 2
