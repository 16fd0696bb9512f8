"""Face-alignment divergence tests: MTCNN wiring + crop-IoU quantification.

The environment has no facenet_pytorch and a minimal cv2 (no cascade XMLs),
so the reference's MTCNN face alignment (/root/reference/config/transforms.py:
14-81) cannot run verbatim. These tests (VERDICT.md r1, next-round #7):

1. exercise the ``detector='mtcnn'`` wiring with a stubbed facenet_pytorch so
   the code path is tested, not dead;
2. quantify the crop divergence between MTCNN-style boxes (the stub returns
   the known true face box — what a working detector reports) and the
   no-detector center-square fallback, as window IoU on synthetic geometry.
   The measured numbers live in PARITY.md ("Face alignment" section).
"""

import sys
import types

import numpy as np
import pytest

from ewvit_tpu.data.transforms import FaceAligner


class _StubMTCNN:
    """facenet_pytorch.MTCNN lookalike returning canned boxes."""

    def __init__(self, boxes=None, **kwargs):
        self.kwargs = kwargs
        self.boxes = boxes

    def detect(self, image):
        if self.boxes is None:
            return None, None
        b = np.asarray(self.boxes, np.float32)
        return b, np.ones(len(b), np.float32)


@pytest.fixture
def stub_facenet(monkeypatch):
    """Install a fake facenet_pytorch module; yields a box-setter."""
    mod = types.ModuleType("facenet_pytorch")
    state = {"boxes": None}
    mod.MTCNN = lambda **kw: _StubMTCNN(state["boxes"], **kw)
    monkeypatch.setitem(sys.modules, "facenet_pytorch", mod)
    return state


def _coord_image(h, w):
    """uint8 image whose pixels encode their own (row, col) — lets tests
    recover the exact crop window an aligner selected."""
    assert h <= 256 and w <= 256
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = np.arange(h, dtype=np.uint8)[:, None]
    img[..., 1] = np.arange(w, dtype=np.uint8)[None, :]
    return img


def _window_of(crop):
    """(top, left, bottom, right) the crop was taken from."""
    return (int(crop[0, 0, 0]), int(crop[0, 0, 1]),
            int(crop[-1, -1, 0]) + 1, int(crop[-1, -1, 1]) + 1)


def _iou(a, b):
    top = max(a[0], b[0]); left = max(a[1], b[1])
    bot = min(a[2], b[2]); right = min(a[3], b[3])
    inter = max(0, bot - top) * max(0, right - left)
    area = lambda r: (r[2] - r[0]) * (r[3] - r[1])
    return inter / float(area(a) + area(b) - inter)


def test_mtcnn_wiring_constructor_and_largest_box(stub_facenet):
    stub_facenet["boxes"] = [[10, 10, 40, 40], [50, 50, 150, 170]]
    fa = FaceAligner(margin=20, detector="mtcnn", min_face_size=40)
    assert fa.detector == "mtcnn" and fa._mtcnn is not None
    # ctor kwargs forwarded as the reference builds MTCNN (transforms.py:20-26)
    assert fa._mtcnn.kwargs["min_face_size"] == 40
    assert fa._mtcnn.kwargs["keep_all"] is False
    # largest-area box wins (transforms.py:51)
    box = fa._detect(np.zeros((256, 256, 3), np.uint8))
    np.testing.assert_array_equal(box, [50, 50, 150, 170])


def test_mtcnn_crop_geometry_matches_reference_formula(stub_facenet):
    # face box 60..140 x 80..160: center (110, 110)T/(120, 100)? — compute:
    # x1=60 y1=80 x2=140 y2=160 -> cx=100, cy=120, face=max(80,80)=80,
    # crop side = 80 + 2*20 = 120 -> window rows 60..180, cols 40..160
    stub_facenet["boxes"] = [[60, 80, 140, 160]]
    fa = FaceAligner(margin=20, detector="mtcnn")
    crop = fa(_coord_image(240, 200))
    assert _window_of(crop) == (60, 40, 180, 160)


def test_mtcnn_detection_failure_falls_back_to_center(stub_facenet):
    stub_facenet["boxes"] = None
    fa = FaceAligner(detector="mtcnn")
    crop = fa(_coord_image(200, 240))
    # center square: side 200, cols 20..220
    assert _window_of(crop) == (0, 20, 200, 220)


def test_crop_iou_mtcnn_vs_fallback():
    """Quantified divergence: MTCNN-box crops vs the no-detector fallback.

    The stub returns the TRUE face box (ideal MTCNN); the fallback is what
    this environment actually does (detector='none'). Scenario IoUs are
    asserted as recorded in PARITY.md so the numbers stay honest.
    """
    h, w = 240, 256
    scenarios = {
        # name: face box [x1, y1, x2, y2] in a 240x256 frame
        "centered_large": [88, 60, 168, 180],   # 80x120 face mid-frame
        "centered_small": [108, 96, 148, 136],  # 40x40 face mid-frame
        "offset_corner": [8, 8, 88, 98],        # face in the top-left
    }
    expected = {"centered_large": 0.44, "centered_small": 0.11,
                "offset_corner": 0.21}
    fallback = FaceAligner(detector="none")
    ious = {}
    for name, box in scenarios.items():
        mod = types.ModuleType("facenet_pytorch")
        mod.MTCNN = lambda box=box, **kw: _StubMTCNN([box], **kw)
        sys.modules["facenet_pytorch"] = mod
        try:
            mt = FaceAligner(margin=20, detector="mtcnn")
            img = _coord_image(h, w)
            ious[name] = round(_iou(_window_of(mt(img)),
                                    _window_of(fallback(img))), 2)
        finally:
            del sys.modules["facenet_pytorch"]
    assert ious == expected, f"PARITY.md face-crop IoU table is stale: {ious}"
