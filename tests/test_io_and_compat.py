"""IO geometry and checkpoint-compat edge cases."""

import numpy as np
import pytest

from openglue_tpu.compat.torch_weights import (
    rename_thirdparty_superpoint_keys,
    superpoint_params_from_torch,
)
from openglue_tpu.data.io import aspect_preserving_resize, resize_and_crop


class TestResizeCropGeometry:
    def test_intrinsics_update_consistency(self):
        """A world point projected with the updated K must land on the same
        image feature after resize+crop (reference megadepth_dataset.py:133-176
        K surgery)."""
        h, w = 360, 480
        K = np.array([[400.0, 0, 240], [0, 400.0, 180], [0, 0, 1]], np.float32)
        # a bright dot at a known pixel
        import cv2

        img = np.zeros((h, w), np.uint8)
        px, py = 300, 200
        cv2.circle(img, (px, py), 3, 255, -1)

        # world point that projects exactly to (px, py) at depth 5
        ray = np.linalg.inv(K) @ [px, py, 1.0]
        P = ray * 5.0

        out, _, K_new = resize_and_crop(img, None, K, (200, 160), random_crop=False)
        uv = K_new @ P
        uv = uv[:2] / uv[2]
        # the dot must be at the reprojected position in the cropped image
        assert 0 <= uv[0] < 200 and 0 <= uv[1] < 160
        yy, xx = np.unravel_index(np.argmax(out), out.shape)
        assert abs(xx - uv[0]) < 2.5 and abs(yy - uv[1]) < 2.5

    def test_aspect_preserving_resize_constraining_side(self):
        img = np.zeros((360, 480), np.uint8)
        out = aspect_preserving_resize(img, (240, 240))
        # width/height ratio kept; constraining side hits target
        assert out.shape[0] == 240 and out.shape[1] == 320


class TestThirdPartyKeyRemap:
    def test_rename_blocks(self):
        sd = {
            "inc.conv.conv.0.weight": 1,
            "inc.conv.conv.1.running_mean": 2,
            "down1.mpconv.1.conv.3.weight": 3,
            "down3.mpconv.1.conv.4.bias": 4,
            "convPa.weight": 5,
        }
        out = rename_thirdparty_superpoint_keys(sd)
        assert out["conv1a.weight"] == 1
        assert out["bn1a.running_mean"] == 2
        assert out["conv2b.weight"] == 3
        assert out["bn4b.bias"] == 4
        assert out["convPa.weight"] == 5

    def test_converter_rejects_malformed(self):
        with pytest.raises(KeyError):
            superpoint_params_from_torch({"conv1a.weight": np.zeros((64, 1, 3, 3))})
