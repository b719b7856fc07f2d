#!/usr/bin/env python
"""Assemble the offline training corpus for the demo colorizer.

No network is available in this environment, so the corpus is every color
image reachable offline: the reference's demo/test images (ref test_imgs/,
imgs/), the ImageNet val refs it ships for histogram transfer, and the
sample photos bundled with scikit-learn / scipy / matplotlib. A fixed
holdout split keeps evaluation honest (held-out images never train).

This is a *capability demonstration* corpus (~15 photos + heavy
augmentation in train/data.py), not an ImageNet substitute: the resulting
checkpoint proves the training/eval/distillation machinery end-to-end
(monotone PSNR-vs-hints curve, student quality deltas), not paper-level
generalization.

Usage: python scripts/build_offline_corpus.py [OUT_DIR]   (default /tmp/corpus)
"""
import os
import shutil
import sys

REF = "/root/reference"

# held out of training, used for the eval curve. Six images spanning
# every source family (three ImageNet val frames, sklearn's china +
# flower, matplotlib's grace_hopper portrait): widened from 3 in round 5
# so AUC claims carry a variance bound (VERDICT r4 task 6) — the train
# split shrinks to ~10 images, accepted.
HOLDOUT_NAMES = {"ILSVRC2012_val_00002202.JPEG",
                 "ILSVRC2012_val_00049978.JPEG",
                 "ILSVRC2012_val_00048203.JPEG",
                 "flower.jpg", "china.jpg", "grace_hopper.jpg"}

# single-channel sources are useless as color ground truth
SKIP_NAMES = {"balls_gray.JPEG", "bird_gray.jpg", "demo.gif"}

# minimum mean chroma (uint8 channel spread) for an image to count as
# COLOR ground truth: several reference demo inputs (parrot.jpg,
# park.jpg) are grayscale photos saved as 3-channel JPEGs — training on
# them teaches gray outputs, and holding them out inflates PSNR
MIN_CHROMA = 4.0


def _is_color(im) -> bool:
    import numpy as np
    a = np.asarray(im, np.float32)
    return float(np.abs(a - a.mean(axis=-1, keepdims=True)).mean()) \
        >= MIN_CHROMA


def gather(out_dir: str) -> tuple[list, list]:
    from PIL import Image
    os.makedirs(f"{out_dir}/train", exist_ok=True)
    os.makedirs(f"{out_dir}/holdout", exist_ok=True)

    sources = []
    for root in (f"{REF}/test_imgs", f"{REF}/imgs"):
        if os.path.isdir(root):
            for dirpath, _dirs, files in os.walk(root):
                for f in files:
                    if f.lower().endswith((".jpg", ".jpeg", ".png")):
                        sources.append(os.path.join(dirpath, f))
    try:
        import sklearn.datasets
        imgdir = os.path.join(os.path.dirname(sklearn.datasets.__file__),
                              "images")
        for f in os.listdir(imgdir):
            if f.lower().endswith((".jpg", ".jpeg", ".png")):
                sources.append(os.path.join(imgdir, f))
    except ImportError:
        pass

    train, holdout = [], []
    for src in sorted(sources):
        name = os.path.basename(src)
        if name in SKIP_NAMES:
            continue
        try:
            im = Image.open(src).convert("RGB")
        except Exception as e:
            print(f"skip {name}: {e}", file=sys.stderr)
            continue
        if im.size[0] < 64 or im.size[1] < 64:
            continue
        if not _is_color(im):
            print(f"skip {name}: grayscale source", file=sys.stderr)
            continue
        split = "holdout" if name in HOLDOUT_NAMES else "train"
        dst = f"{out_dir}/{split}/{name.replace('.JPEG', '.jpg')}"
        if src.lower().endswith((".jpg", ".jpeg")):
            shutil.copy(src, dst)
        else:
            im.save(dst, quality=97)
        (holdout if split == "holdout" else train).append(dst)

    # scipy's raccoon face (1024x768 photo)
    try:
        import numpy as np
        import scipy.datasets
        face = scipy.datasets.face()
        Image.fromarray(np.asarray(face)).save(
            f"{out_dir}/train/scipy_face.jpg", quality=97)
        train.append(f"{out_dir}/train/scipy_face.jpg")
    except Exception as e:
        print(f"skip scipy face: {e}", file=sys.stderr)
    # matplotlib's grace_hopper portrait (holdout-eligible like the rest)
    try:
        import matplotlib
        mpl_img = os.path.join(os.path.dirname(matplotlib.__file__),
                               "mpl-data", "sample_data",
                               "grace_hopper.jpg")
        if os.path.exists(mpl_img):
            split = ("holdout" if "grace_hopper.jpg" in HOLDOUT_NAMES
                     else "train")
            dst = f"{out_dir}/{split}/grace_hopper.jpg"
            shutil.copy(mpl_img, dst)
            (holdout if split == "holdout" else train).append(dst)
    except ImportError:
        pass
    # pygame's webcam sample (320x240 indoor photo) — the last real
    # photograph shipped by any package in this image (exhaustive
    # find over /opt/venv; everything else is logos/charts/textures)
    try:
        import pygame
        cam = os.path.join(os.path.dirname(pygame.__file__), "docs",
                           "generated", "_images", "camera_rgb.jpg")
        if os.path.exists(cam):
            im = Image.open(cam).convert("RGB")
            if _is_color(im) and im.size[0] >= 64 and im.size[1] >= 64:
                shutil.copy(cam, f"{out_dir}/train/pygame_camera.jpg")
                train.append(f"{out_dir}/train/pygame_camera.jpg")
    except ImportError:
        pass
    return train, holdout


def script_version() -> str:
    """Content hash of this script — the corpus manifest records it so
    consumers rebuild when the gathering rules change."""
    import hashlib
    with open(os.path.abspath(__file__), "rb") as f:
        return hashlib.sha1(f.read()).hexdigest()[:12]


def write_manifest(out_dir: str, train: list, holdout: list) -> None:
    """Written LAST (and atomically): its presence certifies a complete
    build. A crashed or older-version build leaves no/stale manifest, so
    consumers (bench.py) know to rebuild instead of silently reusing a
    partial corpus."""
    import json
    m = {"version": script_version(), "train": len(train),
         "holdout": sorted(os.path.basename(p) for p in holdout)}
    tmp = f"{out_dir}/manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1)
    os.replace(tmp, f"{out_dir}/manifest.json")


def manifest_is_current(out_dir: str) -> bool:
    """True when out_dir holds a complete corpus built by THIS version of
    the script and the listed holdout files all exist."""
    import json
    try:
        with open(f"{out_dir}/manifest.json") as f:
            m = json.load(f)
    except (OSError, ValueError):
        return False
    return (m.get("version") == script_version()
            and m.get("train", 0) > 0
            and bool(m.get("holdout"))
            and all(os.path.exists(f"{out_dir}/holdout/{n}")
                    for n in m["holdout"]))


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corpus"
    train, holdout = gather(out_dir)
    if train and holdout:
        write_manifest(out_dir, train, holdout)
    print(f"{out_dir}: {len(train)} train / {len(holdout)} holdout")
    for p in holdout:
        print(f"  holdout: {os.path.basename(p)}")
    return 0 if train and holdout else 1


if __name__ == "__main__":
    raise SystemExit(main())
