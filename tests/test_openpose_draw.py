"""Drawing utility smoke tests."""

import numpy as np

from bodyfitting_tpu.models import openpose_infer as opi
from tests.test_openpose import _skeleton, _synthetic_fields


def test_draw_bodypose():
    p = _skeleton(64, 64)
    heat, paf = _synthetic_fields([p])
    peaks = opi.find_peaks(heat, thre1=0.3)
    candidate, subset = opi.assemble_people(peaks, paf, img_h=128)
    canvas = np.zeros((128, 128, 3), np.uint8)
    out = opi.draw_bodypose(canvas, candidate, subset)
    assert out.shape == canvas.shape
    assert out.sum() > 0            # something was drawn
    assert canvas.sum() == 0        # input untouched


def test_draw_handpose():
    rng = np.random.default_rng(0)
    peaks = rng.integers(5, 60, size=(21, 2))
    canvas = np.zeros((64, 64, 3), np.uint8)
    out = opi.draw_handpose(canvas, peaks, show_number=True)
    assert out.sum() > 0
    # all-zero peaks are skipped
    out2 = opi.draw_handpose(canvas, np.zeros((21, 2)))
    assert out2.sum() == 0
