"""Dataset-layout adapter tests (tmpdir fixtures emulating the reference's
Middlebury/DAVIS/UCF101/Vimeo directory contracts, TestModule.py:10-117)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from fmvfi_tpu.eval.datasets import (
    load_test_set,
    middlebury_eval,
    middlebury_other,
    ucf101,
    vimeo_interp_test,
)


def _write(path, img):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))


def _img(seed, h=32, w=48):
    return np.random.default_rng(seed).uniform(0, 1, (h, w, 3)).astype(np.float32)


def test_middlebury_layout(tmp_path):
    inp, gt = str(tmp_path / "other"), str(tmp_path / "other-gt")
    for scene in ("Beanbags", "Urban2"):
        _write(f"{inp}/{scene}/frame10.png", _img(1))
        _write(f"{inp}/{scene}/frame11.png", _img(2))
        _write(f"{gt}/{scene}/frame10i11.png", _img(3))
    sets = middlebury_other(inp, gt)
    assert sorted(sets) == ["Beanbags", "Urban2"]
    f1, g, f2 = sets["Beanbags"]
    assert f1.shape == (32, 48, 3) and g is not None
    # spec-string path
    via_spec = load_test_set(f"middlebury:{inp}:{gt}")
    assert sorted(via_spec) == ["Beanbags", "Urban2"]


def test_middlebury_eval_layout(tmp_path):
    base = str(tmp_path / "eval")
    for scene in ("Backyard",):
        _write(f"{base}/input/{scene}/frame10.png", _img(1))
        _write(f"{base}/input/{scene}/frame11.png", _img(2))
    sets = middlebury_eval(base)
    f1, g, f2 = sets["Backyard"]
    assert g is None


def test_ucf_layout(tmp_path):
    base = str(tmp_path / "ucf")
    for scene in ("1", "2"):
        for i in range(3):
            _write(f"{base}/{scene}/frame{i}.png", _img(i))
    sets = ucf101(base)
    assert sorted(sets) == ["1", "2"]


def test_vimeo_layout(tmp_path):
    root = str(tmp_path / "vimeo_interp_test")
    os.makedirs(root)
    with open(f"{root}/tri_testlist.txt", "w") as f:
        f.write("00001/0389\n00001/0402\n")
    for t in ("00001/0389", "00001/0402"):
        for i in (1, 2, 3):
            _write(f"{root}/target/{t}/im{i}.png", _img(i))
    sets = vimeo_interp_test(root, max_num=1)
    assert list(sets) == ["00001_0389"]


def test_evaluate_triplets_and_probe(tmp_path):
    import jax
    import jax.numpy as jnp

    from fmvfi_tpu.eval.evaluate import evaluate_triplets
    from fmvfi_tpu.models.adacof import AdaCoFNet
    from fmvfi_tpu.pipeline.interpolate import FusionWeights
    from fmvfi_tpu.train.loop import PsnrProbe

    inp, gt = str(tmp_path / "other"), str(tmp_path / "other-gt")
    for scene in ("A", "B"):
        _write(f"{inp}/{scene}/frame10.png", _img(1))
        _write(f"{inp}/{scene}/frame11.png", _img(2))
        _write(f"{gt}/{scene}/frame10i11.png", _img(3))

    key = jax.random.key(0)
    z = jnp.zeros((1, 32, 48, 3))
    av = AdaCoFNet(kernel_size=5, dilation=1).init(key, z, z)
    weights = FusionWeights(phase_net=None, adacof=av, fusion_net=None)

    from fmvfi_tpu.eval.datasets import middlebury_other

    triplets = middlebury_other(inp, gt)
    res = evaluate_triplets(
        triplets, weights, "adacof", output_dir=str(tmp_path / "out")
    )
    assert "average" in res and "A" in res and "psnr" in res["A"]
    assert os.path.exists(tmp_path / "out" / "A" / "output.png")

    probe = PsnrProbe.from_middlebury(
        inp, gt,
        lambda state, a, b: AdaCoFNet(kernel_size=5, dilation=1).apply(av, a, b).blended,
    )
    p = probe(None)
    assert np.isfinite(p)


def test_photo_set_optin():
    """The real-photograph motion set (exact GT, natural image statistics)
    is opt-in: default synthetic_sets excludes it so the historical 8-set
    dominance criterion keeps its meaning."""
    from fmvfi_tpu.eval.evaluate import synthetic_sets
    from fmvfi_tpu.eval.synth import photo_video

    base = synthetic_sets(64, n_frames=3)
    assert "photo" not in base
    with_photo = synthetic_sets(64, n_frames=3, include_photo=True)
    assert "photo" in with_photo
    v = with_photo["photo"]
    assert v.shape[1:] == (64, 64, 3) and v.dtype == np.float32
    # motion is real: consecutive frames differ, sequence is not constant
    assert float(np.abs(v[1] - v[0]).mean()) > 1e-3

    # the generator is deterministic for a given seed (eval cache contract)
    a = photo_video(3, 64, 64, step=2.0, seed=3)
    b = photo_video(3, 64, 64, step=2.0, seed=3)
    np.testing.assert_array_equal(a, b)
