"""Training data pipeline: image folders -> prefetched (L, ab) batches.

The reference trains in an external repo; its data story is ImageNet-style
image folders. Here: a host-side loader (PIL decode + resize + rgb2lab via
the native host ops) with background-thread prefetch, emitting NHWC
float32 batches ready for train.step. Device transfer overlaps compute via
the prefetch queue.
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np

_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def list_images(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.lower().endswith(_EXTS):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def _load_one(path: str, size: int, rng: np.random.Generator,
              augment: bool) -> np.ndarray | None:
    from PIL import Image
    try:
        im = Image.open(path).convert("RGB")
    except Exception:
        return None
    if augment:
        # random resized crop (scale 0.6-1.0) + horizontal flip
        w, h = im.size
        s = rng.uniform(0.6, 1.0)
        cw, ch = int(w * s), int(h * s)
        x0 = rng.integers(0, w - cw + 1)
        y0 = rng.integers(0, h - ch + 1)
        im = im.crop((x0, y0, x0 + cw, y0 + ch))
        if rng.random() < 0.5:
            im = im.transpose(Image.FLIP_LEFT_RIGHT)
    im = im.resize((size, size), Image.BILINEAR)
    return np.asarray(im, np.float32) / 255.0


class ImageFolderLoader:
    """Iterates (batch dicts) over an image folder forever.

    Batches: {'l': (N,S,S,1) in [0,100], 'ab': (N,S,S,2)} float32.
    Decoding and colorspace conversion run in ``workers`` background
    threads; ``prefetch`` finished batches are queued ahead.
    """

    def __init__(self, root: str, batch_size: int = 16, size: int = 256,
                 seed: int = 0, augment: bool = True, workers: int = 4,
                 prefetch: int = 4):
        self.paths = list_images(root)
        if not self.paths:
            raise FileNotFoundError(f"no images under {root}")
        self.batch_size = batch_size
        self.size = size
        self.augment = augment
        self._rng = np.random.default_rng(seed)
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, args=(seed + i,),
                             daemon=True)
            for i in range(workers)]
        for t in self._threads:
            t.start()

    def _worker(self, seed: int):
        from ..ops import host
        rng = np.random.default_rng(seed)
        while not self._stop.is_set():
            idx = rng.integers(0, len(self.paths), self.batch_size)
            imgs = []
            for i in idx:
                im = _load_one(self.paths[int(i)], self.size, rng,
                               self.augment)
                if im is not None:
                    imgs.append(im)
            while len(imgs) < self.batch_size:    # pad failed decodes
                imgs.append(imgs[-1] if imgs else
                            np.zeros((self.size, self.size, 3), np.float32))
            rgb = np.stack(imgs)
            lab = host.rgb2lab(rgb.reshape(-1, 3)).reshape(rgb.shape)
            batch = {"l": lab[..., :1].copy(), "ab": lab[..., 1:].copy()}
            # retry the SAME batch until consumed: rebuilding on a full
            # queue would burn host CPU decoding batches nobody reads
            # whenever the train step is the bottleneck
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=1.0)
                    break
                except queue.Full:
                    pass

    def __iter__(self):
        return self

    def __next__(self) -> dict[str, np.ndarray]:
        return self._q.get()

    def close(self):
        self._stop.set()
