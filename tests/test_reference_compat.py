"""Drop-in compatibility: code written against the reference's import
paths and session patterns runs verbatim from this repo root."""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IMG = "/root/reference/test_imgs/mortar_pestle.jpg"


def test_reference_notebook_code_runs_verbatim():
    """The local-hints notebook's code pattern, byte-for-byte imports
    (ref DemoInteractiveColorization.ipynb cells 1-7, minus the
    unavailable caffemodel weights)."""
    if not os.path.exists(IMG):
        pytest.skip("test image unavailable")
    sys.path.insert(0, REPO)

    from data import colorize_image as CI

    colorModel = CI.ColorizeImageCaffe(Xd=64)
    colorModel.prep_net(
        0, './models/reference_model/deploy_nodist.prototxt', '')
    colorModel.load_image(IMG)

    mask = np.zeros((1, 64, 64))
    input_ab = np.zeros((2, 64, 64))
    img_out = colorModel.net_forward(input_ab, mask)
    assert img_out.shape == (64, 64, 3)

    img_gray_fullres = colorModel.get_img_gray_fullres()
    img_out_fullres = colorModel.get_img_fullres()
    assert img_out_fullres.shape == img_gray_fullres.shape

    def put_point(input_ab, mask, loc, p, val):
        # verbatim from the notebook (cell 7)
        input_ab[:, loc[0] - p:loc[0] + p + 1, loc[1] - p:loc[1] + p + 1] \
            = np.array(val)[:, np.newaxis, np.newaxis]
        mask[:, loc[0] - p:loc[0] + p + 1, loc[1] - p:loc[1] + p + 1] = 1
        return (input_ab, mask)

    (input_ab, mask) = put_point(input_ab, mask, [33, 40], 3, [23, -69])
    img_out = colorModel.net_forward(input_ab, mask)
    mask_fullres = colorModel.get_img_mask_fullres()
    img_in_fullres = colorModel.get_input_img_fullres()
    img_out_fullres2 = colorModel.get_img_fullres()
    assert not np.array_equal(img_out_fullres, img_out_fullres2)
    assert mask_fullres.shape == img_in_fullres.shape


def test_reference_gamut_imports():
    sys.path.insert(0, REPO)
    from data import lab_gamut
    snapped = lab_gamut.snap_ab(50.0, np.array([255, 0, 0], np.uint8))
    assert snapped.dtype == np.uint8
    grid = lab_gamut.abGrid(gamut_size=110, D=1)
    rgb, m = grid.update_gamut(50.0)
    assert m.shape == (221, 221)
