"""CLI entry point: the interactive colorization app on the TPU backend.

Mirrors the reference launcher's flags and backend selection
(ref: ideepcolor.py:13-85), with the engines swapped for jitted XLA
programs. Run: ``python -m ideepcolor_tpu.apps.ideepcolor [--backend ...]``.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description='TPU-native interactive deep colorization')
    parser.add_argument('--win_size', dest='win_size', type=int, default=512,
                        help='the size of the GUI drawing pad')
    parser.add_argument('--image_file', dest='image_file', type=str,
                        default='./test_imgs/mortar_pestle.jpg',
                        help='input image')
    parser.add_argument('--gpu', dest='gpu', type=int, default=0,
                        help='accepted for reference-CLI parity; device '
                             'selection is managed by JAX')
    parser.add_argument('--cpu_mode', dest='cpu_mode', action='store_true',
                        help='force the CPU backend instead of TPU')
    parser.add_argument('--backend', dest='backend', type=str,
                        default='siggraph',
                        choices=['siggraph', 'caffe', 'pytorch'],
                        help='model family: siggraph (alias pytorch) or '
                             'the caffe graph variants')
    parser.add_argument('--color_model', dest='color_model', type=str,
                        default='', help='checkpoint (.pth/.npz) for the '
                                         'colorization model')
    # reference-CLI parity flags for the caffe graph paths
    # (ref ideepcolor.py:17-31); prototxt paths are accepted and ignored
    # (graph structure is built in, weights come from the converted
    # caffemodel)
    parser.add_argument('--color_prototxt', type=str, default='',
                        help='accepted for parity; unused')
    parser.add_argument('--color_caffemodel', type=str, default='',
                        help='converted caffe weights (.npz) for the '
                             'color model')
    parser.add_argument('--dist_prototxt', type=str, default='',
                        help='accepted for parity; unused')
    parser.add_argument('--dist_caffemodel', type=str, default='',
                        help='converted caffe weights (.npz) for the '
                             'dist model')
    parser.add_argument('--dist_model', dest='dist_model', type=str,
                        default='', help='checkpoint for the distribution '
                                         'model')
    parser.add_argument('--no_dist', dest='no_dist', action='store_true',
                        help='disable the color-suggestion model')
    parser.add_argument('--load_size', dest='load_size', type=int,
                        default=256, help='network input resolution')
    parser.add_argument('--pytorch_maskcent', dest='pytorch_maskcent',
                        action='store_true',
                        help='subtract 0.5 from the hint mask (retrained '
                             'checkpoints)')
    parser.add_argument('--dtype', type=str, default='bfloat16',
                        help='model precision: bfloat16 (default, the '
                             'fast MXU mode, ~56 dB PSNR vs f32 frames — '
                             'same default as apps.serve) or float32 '
                             'for bit-parity output')
    return parser.parse_args(argv)


def build_models(args):
    from .. import api
    if args.cpu_mode:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    if args.backend in ('siggraph', 'pytorch'):
        from ..config import bundled_weights
        weights = args.color_model or bundled_weights("teacher")
        if weights and not args.color_model:
            print(f"using bundled demo weights: {weights}")
        color_model = api.ColorizeImageJax(
            Xd=args.load_size, maskcent=args.pytorch_maskcent)
        color_model.prep_net(path=weights, dtype=args.dtype)
        dist_model = None
        if not args.no_dist:
            dist_model = api.ColorizeImageJaxDist(
                Xd=args.load_size, maskcent=args.pytorch_maskcent)
            dist_model.prep_net(path=args.dist_model or weights,
                                dtype=args.dtype)
    else:
        color_model = api.ColorizeImageJaxCaffe(Xd=args.load_size)
        color_model.prep_net(
            args.gpu, prototxt_path=args.color_prototxt,
            caffemodel_path=args.color_caffemodel or args.color_model,
            dtype=args.dtype)
        dist_model = None
        if not args.no_dist:
            dist_model = api.ColorizeImageJaxCaffeDist(Xd=args.load_size)
            dist_model.prep_net(
                args.gpu, prototxt_path=args.dist_prototxt,
                caffemodel_path=args.dist_caffemodel or args.dist_model,
                S=0.2, dtype=args.dtype)
    return color_model, dist_model


def main(argv=None):
    from ..config import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    args = parse_args(argv)
    for k, v in sorted(vars(args).items()):
        print(f'{k}: {v}')
    color_model, dist_model = build_models(args)

    try:
        from PyQt5.QtWidgets import QApplication
        from ..ui.qt_gui import GUIDesign
    except ImportError:
        print('PyQt5 is not installed; the GUI is unavailable.\n'
              'Use the headless API instead (ideepcolor_tpu.api) or the '
              'notebook-style demos in ideepcolor_tpu/apps/demos.py.')
        return 1

    app = QApplication(sys.argv)
    window = GUIDesign(color_model, dist_model=dist_model,
                       img_file=args.image_file, load_size=args.load_size,
                       win_size=args.win_size)
    window.show()
    return app.exec_()


if __name__ == '__main__':
    raise SystemExit(main())
