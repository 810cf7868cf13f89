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
