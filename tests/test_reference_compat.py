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


def test_global_histogram_notebook_code_runs_verbatim():
    """DemoGlobalHistogramTransfer's code pattern, reference imports
    included (`import caffe`, blob stuffing, get_global_histogram)."""
    ref_dir = "/root/reference/test_imgs/global_ref_bird"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference images unavailable")
    sys.path.insert(0, REPO)

    import caffe
    from data import colorize_image as CI

    Xd = 64
    cid = CI.ColorizeImageCaffeGlobDist(Xd)
    cid.prep_net(0, prototxt_path='./models/global_model/'
                 'deploy_nodist.prototxt', caffemodel_path='')
    gt_glob_net = caffe.Net('./models/global_model/global_stats.prototxt',
                            './models/global_model/dummy.caffemodel',
                            caffe.TEST)
    cid.load_image(IMG)
    input_ab = np.zeros((2, Xd, Xd))
    input_mask = np.zeros((1, Xd, Xd))
    img_pred_auto = cid.net_forward(input_ab, input_mask)

    # notebook cell 9, verbatim shape flow
    ref_path = os.path.join(ref_dir, sorted(os.listdir(ref_dir))[0])
    ref_img_fullres = caffe.io.load_image(ref_path)
    img_glob_dist = (255 * caffe.io.resize_image(
        ref_img_fullres, (256, 256))).astype('uint8')
    gt_glob_net.blobs['img_bgr'].data[...] = \
        img_glob_dist[:, :, ::-1].transpose((2, 0, 1))
    gt_glob_net.forward()
    glob_dist_in = gt_glob_net.blobs['gt_glob_ab_313_drop'] \
        .data[0, :-1, 0, 0].copy()

    assert abs(glob_dist_in.sum() - 1) < 1e-4
    img_pred = cid.net_forward(input_ab, input_mask, glob_dist_in)
    assert img_pred.shape == (Xd, Xd, 3)
    assert not np.array_equal(img_pred_auto, img_pred)
