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

    def test_multipart_stream_delivers_published_frames(self):
        """/stream is a multipart/x-mixed-replace PNG stream: each publish
        becomes one part; two sequential publishes arrive as two decodable
        parts (the push half of the GLFW-window analogue)."""
        import socket
        import threading

        viewer = WebViewer()
        try:
            host, port = viewer._server.server_address[:2]
            frames = [np.full((4, 8, 3), v, np.uint8) for v in (10, 200)]
            viewer.publish(frames[0])

            sock = socket.create_connection((host, port), timeout=10)
            sock.sendall(b"GET /stream HTTP/1.1\r\nHost: x\r\n\r\n")
            sock.settimeout(10)

            def read_until(buf, marker):
                while marker not in buf:
                    chunk = sock.recv(65536)
                    assert chunk, "stream closed early"
                    buf += chunk
                return buf

            buf = read_until(b"", b"multipart/x-mixed-replace")

            def read_part(buf):
                # part = --frame\r\n <headers> \r\n\r\n <png bytes> \r\n
                buf = read_until(buf, b"--frame\r\n")
                buf = buf[buf.index(b"--frame\r\n") + len(b"--frame\r\n"):]
                buf = read_until(buf, b"\r\n\r\n")
                head_end = buf.index(b"\r\n\r\n")
                head = buf[:head_end]
                n = int(head.split(b"Content-Length: ")[1].split(b"\r\n")[0])
                buf = buf[head_end + 4:]
                while len(buf) < n:
                    chunk = sock.recv(65536)
                    assert chunk, "stream closed mid-part"
                    buf += chunk
                return buf[:n], buf[n:]

            png1, rest = read_part(buf)
            np.testing.assert_array_equal(_load_png(png1), frames[0])

            # publish the second frame AFTER the stream is attached;
            # publish from another thread like the engine loop does
            threading.Timer(0.1, viewer.publish, (frames[1],)).start()
            png2, _ = read_part(rest)
            np.testing.assert_array_equal(_load_png(png2), frames[1])
            sock.close()
        finally:
            viewer.close()

    def test_drives_live_engine_end_to_end(self, engine_factory):
        """The full window loop against a REAL engine (the CI half of the
        reference's interactive window, gl_window.rs:299-417): browser
        POSTs held W + pointer-lock look, the host loop folds poll_input()
        into InputState, the engine renders, publish() serves the frame
        back — ship moves, camera turns, served PNG == engine output."""
        import json as _json

        from render_engine_tpu.logic.types import InputState, NUM_KEYS
        from render_engine_tpu.render.frame import to_srgb_u8

        eng = engine_factory(width=128, height=32, capacity=64,
                             num_asteroids=4, max_tris=2048)
        eng.config.record_history = False
        viewer = WebViewer()
        try:
            base = viewer.url
            body = _json.dumps({"keys": ["KeyW"], "dx": 30.0,
                                "dy": 0.0}).encode()
            req = urllib.request.Request(base + "input", data=body,
                                         method="POST")
            with urllib.request.urlopen(req, timeout=10) as r:
                assert r.status == 200

            pos0 = np.asarray(eng.camera.position)
            yaw0 = float(np.asarray(eng.camera.yaw))
            prev = np.zeros(NUM_KEYS, bool)
            for frame in range(3):
                keys, mouse = viewer.poll_input()
                inp = InputState(keys=keys, mouse_delta=mouse,
                                 rng_seed=np.uint32(frame), prev_keys=prev)
                img = eng.frame(inp, dt=1 / 60)
                viewer.publish(np.asarray(to_srgb_u8(img)))
                prev = keys
            # thrust moved the ship/camera; mouse delta turned the yaw
            assert not np.allclose(np.asarray(eng.camera.position), pos0)
            assert float(np.asarray(eng.camera.yaw)) != yaw0
            # the served frame is the engine's last rendered image
            status, png = self._get(base + "frame.png")
            assert status == 200
            np.testing.assert_array_equal(
                _load_png(png), np.asarray(to_srgb_u8(img)))
        finally:
            viewer.close()
