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


def test_natural_video_regimes_exact_gt_contract():
    """natural_video (the offline Vimeo90k stand-in, datareader.py:17-74)
    honors the exact-GT contract for every training regime: deterministic
    by seed, float32 in [0, 1], and pure translation really is rigid —
    frame t sampled at +d matches frame t+1 sampled at the same point
    (checked via the generator's own seed-determinism by comparing the
    interior of a dx-translated pair)."""
    from fmvfi_tpu.eval.synth import natural_video

    for kw in (
        dict(dx=3.0, dy=-1.0),
        dict(deg_per_frame=1.5),
        dict(scale_per_frame=1.02),
        dict(dx=1.0, gain_per_frame=0.93),
        dict(fg_step=4.0, dx=-2.0),
    ):
        v = natural_video(3, 64, 80, seed=7, **kw)
        assert v.shape == (3, 64, 80, 3) and v.dtype == np.float32
        assert 0.0 <= float(v.min()) and float(v.max()) <= 1.0
        # motion is real and deterministic
        assert float(np.abs(v[1] - v[0]).mean()) > 1e-4
        np.testing.assert_array_equal(v, natural_video(3, 64, 80, seed=7, **kw))

    # rigid-translation GT: the scene translates by +(dy, dx) px/frame on
    # screen, so sampling frame 1 at an interior window offset by -(dy, dx)
    # reproduces frame 0's window BIT-EXACTLY for integer displacements
    # (both frames sample the same source grid)
    v = natural_video(3, 64, 80, dx=4.0, dy=2.0, seed=11)
    a = v[0][8:56, 8:72]
    b = v[1][8 - 2 : 56 - 2, 8 - 4 : 72 - 4]
    np.testing.assert_array_equal(a, b)


def test_mixed_stream_photo_frac():
    """MixedSynthStream(photo_frac=) — the leg-5 photo-mixed training diet —
    yields the same (3, H, W, 3) u8 layout for photo and texture scenes, and
    photo_frac=1 draws every scene from the natural-photo pool (distinct
    image statistics from the value-noise textures: lower high-frequency
    energy)."""
    from fmvfi_tpu.train.data import MixedSynthStream

    tex = MixedSynthStream(n=6, h=64, w=80, photo_frac=0.0, workers=2)
    pho = MixedSynthStream(n=6, h=64, w=80, photo_frac=1.0, workers=2)
    for s in (tex, pho):
        for i in range(6):
            u = s.load_u8(i)
            assert u.shape == (3, 64, 80, 3) and u.dtype == np.uint8
        f = s.load(0)
        assert all(x.dtype == np.float32 for x in f)

    def hf_energy(s):
        e = 0.0
        for i in range(6):
            g = s.load_u8(i)[0].astype(np.float32).mean(-1)
            e += float(np.abs(np.diff(g, axis=1)).mean())
        return e / 6

    # photo scenes are smoother than value-noise textures at the pixel scale
    assert hf_energy(pho) < hf_energy(tex)
