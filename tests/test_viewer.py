"""Progressive HTTP viewer: serves the page and the latest frame."""
import urllib.request

import numpy as np


def test_viewer_serves_frames():
    from path_tracer_tpu.viewer import ProgressiveViewer

    viewer = ProgressiveViewer(resolution=None, port=0)
    assert viewer.url is not None
    try:
        img = np.zeros((8, 8, 3), np.uint8)
        img[:, :, 0] = 200
        viewer.update(img)

        page = urllib.request.urlopen(viewer.url, timeout=5).read()
        assert b"frame.png" in page

        frame = urllib.request.urlopen(viewer.url + "frame.png", timeout=5).read()
        assert frame[:8] == b"\x89PNG\r\n\x1a\n"
        from io import BytesIO

        from PIL import Image

        decoded = np.asarray(Image.open(BytesIO(frame)))
        np.testing.assert_array_equal(decoded, img)
    finally:
        viewer.close()


def test_viewer_status_and_stop():
    """Interactivity analog of the reference's window events
    (viewer.rs:61-101): /status reports progress, /stop requests an early
    end, wait_for_close returns once stop is set."""
    import json

    from path_tracer_tpu.viewer import ProgressiveViewer

    viewer = ProgressiveViewer(resolution=None, port=0)
    try:
        img = np.zeros((4, 4, 3), np.uint8)
        viewer.update(img, samples_done=3, samples_total=8, rays_done=1000)
        status = json.loads(
            urllib.request.urlopen(viewer.url + "status", timeout=5).read())
        assert status["samples_done"] == 3
        assert status["samples_total"] == 8
        assert status["mrays_per_s"] >= 0.0
        assert not status["done"]

        assert not viewer.stop_requested
        urllib.request.urlopen(viewer.url + "stop", timeout=5).read()
        assert viewer.stop_requested
        viewer.wait_for_close()  # returns immediately: stop already set
    finally:
        viewer.close()


def test_render_stops_early_on_viewer_stop():
    """render() ends after the current sample batch when the viewer
    requests a stop, and finalizes over the samples actually accumulated
    (mean stays unbiased)."""
    from path_tracer_tpu.config import Profile, Resolution
    from path_tracer_tpu.models.renderer import render
    from path_tracer_tpu.scene.procedural import cornell_device_scene

    class StopAfterFirstPass:
        def __init__(self):
            self.updates = []
            self.stop_requested = False

        def update(self, image, samples_done=0, samples_total=0,
                   rays_done=0):
            self.updates.append(samples_done)
            self.stop_requested = True  # ask to stop after the first batch

    scene = cornell_device_scene()
    profile = Profile(resolution=Resolution(16, 12), bounces=1, samples=8,
                      samples_per_launch=2, alpha_walk_steps=2,
                      shadow_walk_steps=2)
    viewer = StopAfterFirstPass()
    img = render(scene, profile, viewer=viewer)
    assert viewer.updates == [2]  # exactly one batch ran
    # The early-stopped image equals a straight 2-spp render (same mean).
    want = render(cornell_device_scene(),
                  Profile(resolution=Resolution(16, 12), bounces=1,
                          samples=2, samples_per_launch=2,
                          alpha_walk_steps=2, shadow_walk_steps=2))
    np.testing.assert_array_equal(img, want)
