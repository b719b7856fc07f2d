"""Unified CLI: ``python -m ideepcolor_tpu <command> [args]``.

One front door to every app surface (each also runs standalone as
``python -m ideepcolor_tpu.apps.<name>``):

    gui     Qt interactive colorization app (ref ideepcolor.py flags)
    serve   HTTP server: /colorize, sessions, batching, browser UI
    train   train / fine-tune / distill SIGGRAPH checkpoints
    eval    PSNR-vs-hint-count sweep (+--save-grid contact sheet)
    video   colorize a frame stream (uint8 pipeline)
    demos   headless notebook walkthroughs (local hints, global hist)
    fidelity  checkpoint/numerics acceptance gauntlet in one command
"""
from __future__ import annotations

import sys

_COMMANDS = {
    "gui": ("ideepcolor_tpu.apps.ideepcolor", "Qt interactive app"),
    "serve": ("ideepcolor_tpu.apps.serve", "HTTP serving"),
    "train": ("ideepcolor_tpu.apps.train", "training / distillation"),
    "eval": ("ideepcolor_tpu.apps.eval", "quality evaluation"),
    "video": ("ideepcolor_tpu.apps.video", "video colorization"),
    "demos": ("ideepcolor_tpu.apps.demos", "headless demos"),
    "fidelity": ("ideepcolor_tpu.apps.fidelity",
                 "checkpoint/numerics acceptance (one PASS/FAIL per "
                 "artifact; honors IDEEPCOLOR_REAL_*)"),
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] in ("--version", "-V"):
        from ideepcolor_tpu import __version__
        print(f"ideepcolor-tpu {__version__}")
        return 0
    if not argv or argv[0] in ("-h", "--help", "help"):
        from ideepcolor_tpu import __version__
        lines = "\n".join(f"  {name:<7} {desc}"
                          for name, (_, desc) in _COMMANDS.items())
        print(f"ideepcolor-tpu {__version__} — TPU-native interactive "
              f"colorization\n\nusage: python -m ideepcolor_tpu "
              f"COMMAND [args]\n\ncommands:\n{lines}\n\n"
              "COMMAND --help shows its own flags.")
        return 0
    cmd = argv[0]
    if cmd not in _COMMANDS:
        print(f"unknown command {cmd!r}; try: "
              + " ".join(_COMMANDS), file=sys.stderr)
        return 2
    import importlib
    mod = importlib.import_module(_COMMANDS[cmd][0])
    return mod.main(argv[1:]) or 0


if __name__ == "__main__":
    raise SystemExit(main())
