"""Streaming evaluate_frames: decode-as-you-score parity + laziness.

VERDICT r3 weak #5: the scorer held whole sets in host memory (float32), so
a real 1080p clip sweep could not fit a small host.  evaluate_frames now
accepts a frame ITERATOR (u8 or float) with a 3-frame rolling window; these
pin that the streamed path scores identically and actually stops consuming
the source at max_num (laziness is the memory guarantee)."""

import numpy as np

import jax
import jax.numpy as jnp

from fmvfi_tpu.eval.evaluate import evaluate_frames
from fmvfi_tpu.eval.synth import translation_video
from fmvfi_tpu.models.adacof import AdaCoFNet
from fmvfi_tpu.pipeline.interpolate import FusionWeights


def _weights(hw=64):
    z = jnp.zeros((1, hw, hw, 3))
    ada = AdaCoFNet(kernel_size=5, dilation=1).init(jax.random.key(0), z, z)
    return FusionWeights(phase_net=None, adacof=ada, fusion_net=None)


def test_stream_iterator_matches_array():
    frames = translation_video(6, 64, 64, step=2.0)
    w = _weights()
    a = evaluate_frames(frames, w, method="adacof", dim=64)
    b = evaluate_frames(iter(list(frames)), w, method="adacof", dim=64)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_stream_u8_normalizes_on_device():
    frames = translation_video(5, 64, 64, step=2.0)
    u8 = np.clip(frames * 255.0 + 0.5, 0, 255).astype(np.uint8)
    w = _weights()
    a = evaluate_frames(u8, w, method="adacof", dim=64)
    b = evaluate_frames(u8.astype(np.float32) / 255.0, w, method="adacof", dim=64)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-5)


def test_stream_stops_at_max_num():
    frames = translation_video(10, 64, 64, step=2.0)
    consumed = []

    def gen():
        for f in frames:
            consumed.append(1)
            yield f

    w = _weights()
    out = evaluate_frames(gen(), w, method="adacof", dim=64, max_num=2)
    assert out["psnr"].shape == (2,)
    # 2 triplets need exactly 4 frames; the other 6 were never decoded
    assert len(consumed) == 4


def test_interp_fn_reuses_one_jitted_core():
    """_interp_fn must return closures over ONE process-wide jitted callable
    per (method, config): a fresh jax.jit(lambda) per call never hits the
    executable cache, and the r4 widened eval (27 sets x 3 methods) spent
    its entire 2.5 h runtime recompiling the same three 512^2 graphs."""
    from fmvfi_tpu.pipeline.video import _device_filters, _jit_core

    assert _jit_core("adacof", 0, 3, 0) is _jit_core("adacof", 0, 3, 0)
    assert _jit_core("fusion", 0, 3, 0) is _jit_core("fusion", 0, 3, 0)
    # distinct configs stay distinct (different traced graphs)
    assert _jit_core("fusion", 2, 3, 0) is not _jit_core("fusion", 0, 3, 0)
    assert _device_filters(64, 64) is _device_filters(64, 64)


def test_cache_key_is_per_method_weights():
    """The suite cache key for adacof/phase must depend only on that
    method's own weights: a campaign re-evaluating each new FusionNet
    against the same frozen components must hit the cached component
    results instead of recomputing 2/3 of the sweep."""
    import numpy as np

    from fmvfi_tpu.eval.evaluate import _method_cache_key
    from fmvfi_tpu.pipeline.interpolate import FusionWeights

    ada = {"w": np.arange(8.0)}
    pn = {"w": np.arange(4.0) + 1}
    wa = FusionWeights(phase_net=pn, adacof=ada, fusion_net={"w": np.ones(3)})
    wb = FusionWeights(phase_net=pn, adacof=ada, fusion_net={"w": np.zeros(3)})

    for m in ("adacof", "phase", "baseline"):
        assert _method_cache_key(wa, m, 0, 3, 64, 2) == \
            _method_cache_key(wb, m, 0, 3, 64, 2), m
    # the fusion key must still see the fusion head
    assert _method_cache_key(wa, "fusion", 0, 3, 64, 2) != \
        _method_cache_key(wb, "fusion", 0, 3, 64, 2)
    # and a changed component invalidates its own method
    wc = FusionWeights(phase_net=pn, adacof={"w": np.arange(8.0) * 2},
                       fusion_net={"w": np.ones(3)})
    assert _method_cache_key(wa, "adacof", 0, 3, 64, 2) != \
        _method_cache_key(wc, "adacof", 0, 3, 64, 2)
