"""Device-side PNG encode filtering: bit-exact vs the native AVX2
filter (every strategy, incl. the adaptive first-min tie-break), and
the batched device-filtered encode byte-identical to encodePngSync."""
import numpy as np
import pytest

import picha_tpu as picha
from picha_tpu.native import lib as native
from picha_tpu.ops.png_filter_tpu import filter_batch
from picha_tpu.pipeline.png_batch import encode_filtered


@pytest.mark.parametrize("h,w,ch", [(17, 23, 3), (8, 5, 1), (33, 9, 4),
                                    (1, 16, 3), (12, 6, 8)])
@pytest.mark.parametrize("strategy", [-1, 0, 2, 4])
def test_filter_batch_matches_native(h, w, ch, strategy):
    rng = np.random.default_rng(h * 100 + w + ch)
    rb = w * ch
    batch = rng.integers(0, 256, (3, h, rb), np.uint8)
    batch[1] = (np.arange(rb)[None, :] % 16).astype(np.uint8)  # ties
    batch[2] = 0                                               # all-tie
    got = np.asarray(filter_batch(batch, ch, strategy))
    for n in range(3):
        ref = native.png_filter(batch[n].reshape(-1), h, rb, ch, strategy)
        assert np.array_equal(got[n].reshape(-1), ref)


def test_filter_batch_validates():
    with pytest.raises(ValueError):
        filter_batch(np.zeros((2, 3, 4), np.uint8), 1, 7)
    with pytest.raises(ValueError):
        filter_batch(np.zeros((3, 4), np.uint8), 1, -1)


def test_encode_filtered_byte_identical_to_sync():
    # large enough for the probe path (h>=16, stream >= 64 KiB)
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:80, 0:320].astype(np.float32)
    base = 127 + 60 * np.sin(xx / 9) + 40 * np.cos(yy / 5)
    batch = np.clip(np.stack([base, 255 - base, base * 0.6 + 40], -1)
                    + rng.normal(0, 6, (80, 320, 3)),
                    0, 255).astype(np.uint8)[None].repeat(2, 0)
    batch[1] = batch[1][:, ::-1]
    outs = encode_filtered(batch, level=4)
    for i in range(2):
        ref = picha.encodePngSync(
            picha.Image.from_array(batch[i], "rgb"),
            {"compressionLevel": 4})
        assert bytes(outs[i]) == bytes(ref)
        back = picha.decodePngSync(outs[i])
        assert np.array_equal(back.to_array(), batch[i])


def test_encode_filtered_small_image_fixed_strategy():
    rng = np.random.default_rng(7)
    batch = rng.integers(0, 256, (3, 10, 12, 4), np.uint8)
    outs = encode_filtered(batch, level=6, strategy=-1)
    for i in range(3):
        ref = picha.encodePngSync(
            picha.Image.from_array(batch[i], "rgba"),
            {"compressionLevel": 6, "filterStrategy": -1})
        assert bytes(outs[i]) == bytes(ref)
