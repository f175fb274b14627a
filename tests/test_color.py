import jax.numpy as jnp
import numpy as np

from fmvfi_tpu.ops import color


def test_rgb_lab_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, size=(4, 16, 16, 3)).astype(np.float32)
    lab = color.rgb_to_lab(jnp.asarray(rgb))
    back = color.lab_to_rgb(lab)
    np.testing.assert_allclose(np.asarray(back), rgb, atol=2e-3)


def test_lab_matches_known_values():
    # Reference values from the CIE definition (D65, 2deg) for pure colors,
    # matching skimage.color.rgb2lab output.
    rgb = jnp.asarray(
        [
            [1.0, 1.0, 1.0],  # white -> L=100, a~0, b~0
            [0.0, 0.0, 0.0],  # black -> L=0
            [1.0, 0.0, 0.0],  # red   -> approx (53.24, 80.09, 67.20)
            [0.0, 1.0, 0.0],  # green -> approx (87.74, -86.18, 83.18)
            [0.0, 0.0, 1.0],  # blue  -> approx (32.30, 79.19, -107.86)
        ]
    )
    lab = color.rgb_to_lab(rgb, normalized=False)
    expected = np.array(
        [
            [100.0, 0.0, 0.0],
            [0.0, 0.0, 0.0],
            [53.2408, 80.0925, 67.2032],
            [87.7347, -86.1827, 83.1793],
            [32.2970, 79.1875, -107.8602],
        ]
    )
    np.testing.assert_allclose(np.asarray(lab), expected, atol=0.05)


def test_normalization_convention():
    # reference transform.py: L/100, (ab+128)/255 -> all channels in ~[0,1]
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 1, size=(128, 3)).astype(np.float32)
    lab = np.asarray(color.rgb_to_lab(jnp.asarray(rgb)))
    assert lab.min() >= 0.0 and lab.max() <= 1.0
