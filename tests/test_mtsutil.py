"""tpuutil (mtsutil analog, src/utils/{addimages,joinrgb}.cpp): the
utility subcommands round-trip through the from-scratch EXR codec."""
import numpy as np

from gradientdomain_mitsuba_tpu.utils import exr
from gradientdomain_mitsuba_tpu.utils.mtsutil import main


def test_addimages(tmp_path):
    a = np.random.default_rng(0).random((8, 6, 3)).astype(np.float32)
    b = np.random.default_rng(1).random((8, 6, 3)).astype(np.float32)
    pa, pb = str(tmp_path / "a.exr"), str(tmp_path / "b.exr")
    po = str(tmp_path / "o.exr")
    exr.write(pa, a)
    exr.write(pb, b)
    assert main(["addimages", "-m", "0.25", "-M", "0.75", pa, pb, po]) == 0
    out = exr.read_rgb(po)
    np.testing.assert_allclose(out, 0.25 * a + 0.75 * b, atol=1e-3)


def test_joinrgb(tmp_path):
    imgs = [np.random.default_rng(i).random((5, 4, 3)).astype(np.float32)
            for i in range(3)]
    paths = [str(tmp_path / f"{c}.exr") for c in "rgb"]
    for p, im in zip(paths, imgs):
        exr.write(p, im)
    po = str(tmp_path / "join.exr")
    assert main(["joinrgb", *paths, po]) == 0
    out = exr.read_rgb(po)
    want = np.stack([imgs[0][..., 0], imgs[1][..., 1], imgs[2][..., 2]], -1)
    np.testing.assert_allclose(out, want, atol=1e-3)


def test_diff_gate(tmp_path):
    a = np.full((4, 4, 3), 0.5, np.float32)
    pa = str(tmp_path / "a.exr")
    pb = str(tmp_path / "b.exr")
    exr.write(pa, a)
    exr.write(pb, a * 1.5)
    assert main(["diff", pa, pa]) == 0
    assert main(["diff", pa, pb, "--fail-above", "1e-6"]) == 1
