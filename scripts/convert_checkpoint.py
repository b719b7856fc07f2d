#!/usr/bin/env python
"""One-shot weight converter: reference checkpoints -> framework params.

Supports:
  * torch ``.pth`` state dicts of SIGGRAPHGenerator (the published
    pytorch.pth / caffemodel.pth, ref data/colorize_image.py:216-233)
      -> siggraph params (.npz or orbax dir)
  * Caffe ``.caffemodel`` NetParameter protobufs (model.caffemodel /
    global_model.caffemodel, parsed natively — no caffe install)
      -> caffe_net params for --variant main|dist|global
  * the EXPORT direction: framework siggraph params (.npz / orbax dir /
    train-state dir) -> a torch ``.pth`` state dict loadable by the
    reference's own SIGGRAPHGenerator with strict=True (OUT ends in
    .pth/.pt), so checkpoints trained here run under the reference stack.

Usage:
  python scripts/convert_checkpoint.py IN OUT [--variant main] [--orbax]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--variant", default="main",
                    choices=["main", "dist", "global"],
                    help="caffe graph variant (for .caffemodel inputs)")
    ap.add_argument("--orbax", action="store_true",
                    help="write an orbax checkpoint dir instead of .npz")
    args = ap.parse_args(argv)

    from ideepcolor_tpu.utils.session import (save_params_npz,
                                              save_params_orbax)

    if args.dst.endswith((".pth", ".pt")):
        # EXPORT: framework checkpoint -> reference torch state dict
        if args.orbax:
            raise SystemExit("--orbax conflicts with a .pth/.pt OUT "
                             "(export always writes a torch state dict)")
        import numpy as np
        import torch
        from ideepcolor_tpu.models import siggraph
        try:
            params = siggraph.load_params(args.src)
        except (ValueError, KeyError, OSError) as e:
            raise SystemExit(f"cannot export {args.src}: {e}")
        sd = {k: torch.from_numpy(np.asarray(v).copy())
              for k, v in siggraph.to_torch_state_dict(params).items()}
        torch.save(sd, args.dst)
        print(f"exported {len(sd)} tensors -> {args.dst}")
        return 0

    if args.src.endswith((".pth", ".pt")):
        import torch
        from ideepcolor_tpu.models import siggraph
        sd = torch.load(args.src, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.numpy() for k, v in sd.items()
              if "num_batches_tracked" not in k}
        params = siggraph.from_torch_state_dict(sd)
    elif args.src.endswith(".caffemodel"):
        from ideepcolor_tpu.models.caffemodel_io import load_caffemodel
        params = load_caffemodel(args.src, variant=args.variant)
    else:
        raise SystemExit(f"unsupported input: {args.src}")

    if args.orbax:
        save_params_orbax(args.dst, params)
    else:
        save_params_npz(args.dst, params)
    print(f"wrote {len(params)} tensors -> {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
