"""Web viewer (the browser "window"): frame serving + input round-trip."""

import json
import urllib.request

import numpy as np

from render_engine_tpu.logic.types import KEY_SPACE, KEY_W
from render_engine_tpu.runtime.web_viewer import WebViewer
from render_engine_tpu.render.textures import _load_png


class TestWebViewer:
    def _get(self, url):
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.status, r.read()

    def test_frame_and_input_roundtrip(self):
        viewer = WebViewer()
        try:
            base = viewer.url
            status, page = self._get(base)
            assert status == 200 and b"render_engine_tpu" in page

            # publish a frame, fetch it back, decode, compare
            rgb = np.zeros((8, 16, 3), np.uint8)
            rgb[:, :8] = [255, 0, 0]
            viewer.publish(rgb)
            status, png = self._get(base + "frame.png")
            assert status == 200
            np.testing.assert_array_equal(_load_png(png), rgb)

            # browser posts held keys + pointer-lock mouse deltas
            body = json.dumps({"keys": ["KeyW", "Space", "KeyQ"],
                               "dx": 10.0, "dy": -4.0}).encode()
            req = urllib.request.Request(base + "input", data=body,
                                         method="POST")
            with urllib.request.urlopen(req, timeout=10) as r:
                assert r.status == 200
            keys, mouse = viewer.poll_input()
            assert keys[KEY_W] and keys[KEY_SPACE]
            assert keys.sum() == 2  # unknown KeyQ ignored
            np.testing.assert_allclose(
                mouse, [10.0 * viewer.mouse_sensitivity,
                        4.0 * viewer.mouse_sensitivity], atol=1e-7)
            # deltas drain, held keys persist
            keys2, mouse2 = viewer.poll_input()
            assert keys2[KEY_W]
            assert (mouse2 == 0).all()
        finally:
            viewer.close()
