"""Demo plumbing: GrabCut refinement, AsyncPredictor, video frame pipeline."""

import numpy as np
import pytest


def test_grabcut_refine_keeps_object():
    from demo.predictor_lazy import grabcut_refine

    img = np.zeros((64, 64, 3), np.uint8)
    img[16:48, 16:48] = [200, 30, 30]  # red square on black
    mask = np.zeros((64, 64), np.float32)
    mask[14:50, 14:50] = 1.0  # rough mask
    refined = grabcut_refine(img, mask)
    assert refined.shape == mask.shape
    assert refined[32, 32] == 1.0  # object interior kept
    assert refined[2, 2] == 0.0  # far background dropped


class _FakeDemo:
    def run_on_image(self, image, **kwargs):
        return {"instances": {}}, image // 2


def test_async_predictor_order_and_results():
    from demo.predictor_lazy import AsyncPredictor

    ap = AsyncPredictor(_FakeDemo())
    imgs = [np.full((4, 4, 3), i, np.uint8) for i in range(5)]
    for i, im in enumerate(imgs):
        ap.put(i, im)
    got = {}
    for _ in range(5):
        idx, (pred, vis) = ap.get()
        got[idx] = vis
    ap.shutdown()
    assert sorted(got) == list(range(5))
    np.testing.assert_array_equal(got[3], imgs[3] // 2)


def test_run_on_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from demo.predictor_lazy import run_on_video

    path = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
    for i in range(6):
        w.write(np.full((32, 32, 3), i * 20, np.uint8))
    w.release()

    frames = list(run_on_video(_FakeDemo(), path, max_frames=4))
    assert len(frames) == 4
    idxs = sorted(i for i, _ in frames)
    assert idxs == [0, 1, 2, 3]
