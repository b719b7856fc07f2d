"""Training CLI: user-guided colorization on an image folder.

The reference points at an external repo for training (ref README.md:
129-131); this makes training first-class:
  data pipeline (train/data.py) -> simulated hints -> DP train step over
  the device mesh -> orbax checkpoints -> converted params usable by the
  interactive API.

Run: python -m ideepcolor_tpu.apps.train DATA_DIR [--steps N] [--batch N]
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("data_dir")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=176,
                    help="training crop size (must be divisible by 8)")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--lr-schedule", type=str, default="constant",
                    choices=("constant", "cosine"),
                    help="cosine: linear warmup then cosine decay to "
                         "lr/100 over --steps")
    ap.add_argument("--warmup-steps", type=int, default=0)
    ap.add_argument("--ckpt", type=str, default="./train_ckpt")
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--resume", type=str, default="")
    ap.add_argument("--init-from", type=str, default="",
                    help="params-only checkpoint (.npz/.pth/orbax) to "
                         "initialize from with FRESH optimizer state — "
                         "fine-tuning (e.g. the bundled teacher, or "
                         "converted published weights, at a new --size); "
                         "--resume instead continues a full train state")
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--export", type=str, default="",
                    help="also save final params-only weights (orbax dir "
                         "or .npz) directly loadable by api prep_net")
    ap.add_argument("--distill-from", type=str, default="",
                    help="teacher checkpoint (.npz/.pth/orbax): train a "
                         "width-multiplied student against it instead of "
                         "ground truth (train/distill.py); 'random' uses "
                         "a random-init teacher (smoke runs)")
    ap.add_argument("--width", type=float, default=0.5,
                    help="student channel multiplier for --distill-from")
    ap.add_argument("--teacher-dtype", type=str, default="bfloat16",
                    help="teacher forward precision during distillation")
    ap.add_argument("--color-jitter", type=str, default="on",
                    choices=("on", "off", "strong"),
                    help="device-mode hue-rotation/compositing "
                         "augmentation (host mode has no jitter; pass "
                         "'off' to make device and host modes train on "
                         "identical data distributions; 'strong' = up to "
                         "4 independently-rotated regions + wider chroma "
                         "scale, the tiny-corpus hint-reliance tier)")
    ap.add_argument("--data-mode", type=str, default="auto",
                    choices=("auto", "host", "device"),
                    help="device: upload the corpus once and augment "
                         "on-device (train/device_data.py — removes the "
                         "per-step batch upload, which caps tunnel-"
                         "attached training at ~2 steps/s); auto picks "
                         "device when the corpus fits in HBM")
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.resume and args.init_from:
        raise SystemExit("--resume and --init-from are mutually "
                         "exclusive: resume continues a full train state "
                         "(optimizer included); init-from starts a fresh "
                         "run from params only")
    from ideepcolor_tpu.config import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax
    import jax.numpy as jnp

    from ideepcolor_tpu.parallel import mesh as pmesh
    from ideepcolor_tpu.train import step as tstep
    from ideepcolor_tpu.train.data import ImageFolderLoader
    from ideepcolor_tpu.utils.profiling import StageTimer

    # tunnel-attached chips: the first dispatch of a fresh process can
    # wedge in the device-claim queue for 10+ minutes (every retrain leg
    # hit this in r5); complete it here under the nudge watchdog so the
    # run never needs a human babysitter. No-op cost on healthy backends.
    from ideepcolor_tpu.utils.unwedge import warm_first_dispatch
    warm_first_dispatch()

    cfg = tstep.TrainConfig(lr=args.lr, schedule=args.lr_schedule,
                            warmup_steps=args.warmup_steps,
                            total_steps=args.steps)
    # fit the data axis to the batch size (batch must shard evenly)
    mp = args.model_parallel
    n_data = max(1, len(jax.devices()) // mp)
    while args.batch % n_data:
        n_data -= 1
    mesh = pmesh.make_mesh(n_data * mp, model_parallel=mp)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    distilling = bool(args.distill_from)
    if distilling:
        from ideepcolor_tpu.api.colorize import _load_checkpoint
        from ideepcolor_tpu.models import siggraph
        from ideepcolor_tpu.train import distill
        dcfg = distill.DistillConfig(width=args.width, lr=args.lr,
                                     schedule=args.lr_schedule,
                                     warmup_steps=args.warmup_steps,
                                     total_steps=args.steps)
        sd = (None if args.distill_from == "random"
              else _load_checkpoint(args.distill_from))
        teacher = (siggraph.init_params(jax.random.key(0)) if sd is None
                   else siggraph.params_from_state_dict(sd))
        teacher = {k: v.astype(jnp.dtype(args.teacher_dtype))
                   for k, v in teacher.items()}
        print(f"distilling width={args.width} student from "
              f"{args.distill_from} ({args.teacher_dtype} teacher)")
        if args.resume:
            state = distill.load_student_state(args.resume, dcfg)
            print(f"resumed at step {int(state['step'])}")
        else:
            init_p = (siggraph.load_params(args.init_from)
                      if args.init_from else None)
            state = distill.init_student(jax.random.key(0), dcfg,
                                         params=init_p)
            if args.init_from:
                print(f"student params initialized from {args.init_from}")
        jitted0, shard_state, shard_batch, put_teacher = \
            distill.make_sharded_distill_step(dcfg, mesh)
        teacher = put_teacher(teacher)
        jitted = lambda st, b, k: jitted0(st, teacher, b, k)  # noqa: E731
        log_keys = ("reg", "kl")
    elif args.resume:
        state = tstep.load_train_state(args.resume, cfg)
        print(f"resumed at step {int(state['step'])}")
    else:
        from ideepcolor_tpu.models import siggraph
        state = tstep.init_state(
            jax.random.key(0), cfg,
            params=(siggraph.load_params(args.init_from)
                    if args.init_from else None))
        if args.init_from:
            print(f"params initialized from {args.init_from} "
                  f"(fresh optimizer)")

    if not distilling:
        jitted, shard_state, shard_batch = tstep.make_sharded_train_step(
            cfg, mesh)
        log_keys = ("reg", "cls")
    from ideepcolor_tpu.train.device_data import (DeviceDataset,
                                                  corpus_fits_on_device)
    use_device_data = (args.data_mode == "device"
                       or (args.data_mode == "auto"
                           and corpus_fits_on_device(args.data_dir)))
    if use_device_data:
        loader = DeviceDataset(
            args.data_dir, batch_size=args.batch, size=args.size,
            color_jitter=("strong" if args.color_jitter == "strong"
                          else args.color_jitter == "on"))
        print(f"device-resident dataset: {loader.n_images} images, "
              f"{loader.bytes_on_device / 1e6:.1f} MB on device "
              f"(on-device augmentation, color_jitter="
              f"{args.color_jitter}; steps consume only rng keys)")
    else:
        loader = ImageFolderLoader(args.data_dir, batch_size=args.batch,
                                   size=args.size)
    timer = StageTimer()

    # --steps is the TOTAL step target: on --resume, run only the
    # remainder so the lr schedule (indexed by the restored optimizer
    # count, built with total_steps=args.steps) stays aligned with the
    # loop instead of running args.steps MORE steps past the decay end.
    start_step = int(state["step"])
    remaining = max(args.steps - start_step, 0)
    if args.resume:
        print(f"{remaining} steps remaining to --steps {args.steps}")
    # fold start_step into the data-rng seed so a resumed run draws new
    # augmentation keys instead of replaying the sequence from step 0
    key = jax.random.key(1 + start_step)
    with mesh:
        state = shard_state(state)
        for i, batch in enumerate(loader):
            if i >= remaining:
                break
            key, sub = jax.random.split(key)
            with timer.stage("step"):
                state, aux = jitted(
                    state,
                    shard_batch({k: jnp.asarray(v)
                                 for k, v in batch.items()}), sub)
            if (i + 1) % args.log_every == 0:
                recent = list(timer.samples["step"])[-args.log_every:]
                ips = args.batch * len(recent) / max(sum(recent), 1e-9)
                parts = " ".join(f"{k}={float(aux[k]):.4f}"
                                 for k in log_keys)
                print(f"step {int(state['step'])}: "
                      f"loss={float(aux['loss']):.4f} {parts} "
                      f"({ips:.1f} imgs/s)", flush=True)
            if (i + 1) % args.ckpt_every == 0 or i + 1 == remaining:
                path = f"{args.ckpt}_{int(state['step'])}"
                tstep.save_train_state(path, jax.device_get(state))
                print(f"checkpoint -> {path}")
    loader.close()
    if args.export:
        import numpy as np
        params = {k: np.asarray(v) for k, v in
                  jax.device_get(state)["params"].items()}
        if args.export.endswith(".npz"):
            np.savez(args.export, **params)
        else:
            from ideepcolor_tpu.utils.session import save_params_orbax
            save_params_orbax(args.export, params)
        print(f"exported params -> {args.export}")
    print(timer.report())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
