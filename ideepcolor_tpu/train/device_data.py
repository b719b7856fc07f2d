"""Device-resident dataset + on-device augmentation.

The host loader (train/data.py) assembles f32 Lab batches on the CPU and
uploads ~6 MB per batch-16 step; over the axon tunnel (~7-14 MB/s upload)
that caps training at ~2 steps/s regardless of device speed (measured:
52 imgs/s, VERDICT r2 training run). For corpora that fit in HBM — the
offline demo corpus is 14 photos, ~3 MB as uint8 — the TPU-native design
uploads the dataset ONCE and runs the whole augmentation chain (random
resized crop, horizontal flip, uint8 dequant, rgb->lab) as one jitted
program: a train step then consumes only an rng key, and the input
pipeline disappears from the step time entirely.

Augmentation semantics mirror train/data._load_one (scale 0.6-1.0 random
resized crop + 50% horizontal flip + bilinear resize), recast with static
shapes: crops of traced size are realized as dynamic-coordinate bilinear
gathers (align-corners sampling of the [y0, y0+c-1] x [x0, x0+c-1] box
onto the fixed output grid), which XLA lowers to two small vectorized
gathers per image.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import colorspace as cs


def _bilinear_crop(img: jax.Array, ys: jax.Array, xs: jax.Array
                   ) -> jax.Array:
    """Sample (H,W,C) at the outer product of fractional coords ys/xs
    (align-corners bilinear), separably: rows then columns."""
    H, W = img.shape[0], img.shape[1]
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wy = (ys - y0.astype(ys.dtype))[:, None, None]
    rows = img[y0] * (1.0 - wy) + img[y1] * wy          # (out, W, C)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wx = (xs - x0.astype(xs.dtype))[None, :, None]
    return rows[:, x0] * (1.0 - wx) + rows[:, x1] * wx  # (out, out, C)


@partial(jax.jit, static_argnames=("batch", "size", "color_jitter",
                                   "strong"))
def sample_batch(images_u8: jax.Array, key: jax.Array, batch: int,
                 size: int, color_jitter: bool = False,
                 strong: bool = False) -> dict[str, jax.Array]:
    """(N,S,S,3) uint8 device dataset + key -> {'l','ab'} f32 batch.

    Per sample: uniform image pick, random-resized-crop (scale 0.6-1.0
    of the stored frame), 50% horizontal flip, dequant, rgb->lab — all
    inside one XLA program; nothing crosses the host boundary.

    color_jitter rotates the ab plane by a random hue angle, scales
    chroma (0.7-1.3), and composites TWO independently-jittered crops
    along a random split per sample. On tiny corpora this is load-bearing
    for HINT-conditioned training:
      * without any jitter the net memorizes each image's L->ab mapping
        and ignores the hint channel (measured: flat 20.5 dB across
        0-25 hints on holdout);
      * with ONE global rotation per sample a single hint explains the
        whole frame, so the net over-propagates hint colors across
        regions and held-out PSNR FALLS with hint count (measured:
        30.1 dB at 0 hints -> 22.7 at 25);
      * compositing two rotations per sample puts a chroma discontinuity
        inside every frame, forcing hint influence to stay local.

    strong=True (the r4 "--color-jitter strong" tier) pushes the same
    mechanism harder — BOTH a vertical and a horizontal split can apply
    (up to 4 independently-rotated regions per frame) and the chroma
    scale widens to 0.5-1.5 — so a colorization is less predictable from
    L alone and the holdout PSNR-vs-hints slope steepens (VERDICT r3
    task 4: the corpus is maxed at 12 offline photos; augmentation
    diversity is the remaining quality lever).
    """
    S = images_u8.shape[1]
    k_crop_a, k_crop_b, k_rot, k_split = jax.random.split(key, 4)
    grid = jnp.arange(size, dtype=jnp.float32) / (size - 1)

    def crops(k):
        k_idx, k_scale, k_y, k_x, k_flip = jax.random.split(k, 5)
        idx = jax.random.randint(k_idx, (batch,), 0, images_u8.shape[0])
        scale = jax.random.uniform(k_scale, (batch,), minval=0.6,
                                   maxval=1.0)
        c = scale * S                                     # crop side (px)
        y0 = jax.random.uniform(k_y, (batch,)) * (S - c)
        x0 = jax.random.uniform(k_x, (batch,)) * (S - c)
        flip = jax.random.bernoulli(k_flip, 0.5, (batch,))

        def one(i, s_y0, s_x0, s_c, s_flip):
            img = images_u8[i].astype(jnp.float32) / 255.0
            ys = s_y0 + grid * (s_c - 1.0)
            xs = s_x0 + grid * (s_c - 1.0)
            out = _bilinear_crop(img, ys, xs)
            return jnp.where(s_flip, out[:, ::-1, :], out)

        return jax.vmap(one)(idx, y0, x0, c, flip)

    lab = cs.rgb_to_lab(crops(k_crop_a))
    l, ab = lab[..., :1], lab[..., 1:]
    if not color_jitter:
        return {"l": l, "ab": ab}

    sat_lo, sat_hi = (0.5, 1.5) if strong else (0.7, 1.3)

    def jittered_ab(ab_in, k):
        k_th, k_sat = jax.random.split(k)
        theta = jax.random.uniform(k_th, (batch,), maxval=2.0 * jnp.pi)
        sat = jax.random.uniform(k_sat, (batch,), minval=sat_lo,
                                 maxval=sat_hi)
        cth, sth = jnp.cos(theta), jnp.sin(theta)
        rot = jnp.stack([jnp.stack([cth, -sth], -1),
                         jnp.stack([sth, cth], -1)], -2)  # (batch, 2, 2)
        return jnp.einsum("nij,nhwj->nhwi", rot,
                          ab_in) * sat[:, None, None, None]

    lab_b = cs.rgb_to_lab(crops(k_crop_b))
    ys = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1)

    if strong:
        # up to FOUR independently-rotated regions: a vertical AND a
        # horizontal split, each active with p=0.85, laid out as an a/b
        # crop checkerboard (XOR) so neighbouring regions always change
        # rotation — every frame carries 1-4 chroma discontinuities and
        # a single hint can never explain more than one region
        k_ra1, k_ra2, k_rb1, k_rb2 = jax.random.split(k_rot, 4)
        ab_a1 = jittered_ab(ab, k_ra1)
        ab_a2 = jittered_ab(ab, k_ra2)
        ab_b1 = jittered_ab(lab_b[..., 1:], k_rb1)
        ab_b2 = jittered_ab(lab_b[..., 1:], k_rb2)
        k_py, k_px, k_uv, k_uh = jax.random.split(k_split, 4)
        pos_y = jax.random.uniform(k_py, (batch,), minval=0.3,
                                   maxval=0.7) * size
        pos_x = jax.random.uniform(k_px, (batch,), minval=0.3,
                                   maxval=0.7) * size
        use_v = jax.random.bernoulli(k_uv, 0.85, (batch,))
        use_h = jax.random.bernoulli(k_uh, 0.85, (batch,))
        in_v = (xs[None] >= pos_x[:, None, None]) & use_v[:, None, None]
        in_h = (ys[None] >= pos_y[:, None, None]) & use_h[:, None, None]
        in_b = in_v ^ in_h                       # crop checkerboard
        sub = in_h[..., None]                    # rotation selector
        ab_a = jnp.where(sub, ab_a2, ab_a1)
        ab_b = jnp.where(sub, ab_b2, ab_b1)
        l = jnp.where(in_b[..., None], lab_b[..., :1], l)
        ab = jnp.where(in_b[..., None], ab_b, ab_a)
        return {"l": l, "ab": ab}

    k_rot_a, k_rot_b = jax.random.split(k_rot)
    ab_a = jittered_ab(ab, k_rot_a)
    ab_b = jittered_ab(lab_b[..., 1:], k_rot_b)

    # composite along a random vertical/horizontal split (30-70%);
    # a quarter of samples stay single-region (plain global rotation)
    k_pos, k_axis, k_use = jax.random.split(k_split, 3)
    pos = jax.random.uniform(k_pos, (batch,), minval=0.3,
                             maxval=0.7) * size
    horiz = jax.random.bernoulli(k_axis, 0.5, (batch,))
    use_b = jax.random.bernoulli(k_use, 0.75, (batch,))
    coord = jnp.where(horiz[:, None, None], ys[None], xs[None])
    in_b = (coord >= pos[:, None, None]) & use_b[:, None, None]
    l = jnp.where(in_b[..., None], lab_b[..., :1], l)
    ab = jnp.where(in_b[..., None], ab_b, ab_a)
    return {"l": l, "ab": ab}


class DeviceDataset:
    """Drop-in for ImageFolderLoader when the corpus fits on device.

    Decodes every image once at ``store``^2 (uint8), uploads the stack a
    single time, and yields device-resident {'l','ab'} batches sampled by
    :func:`sample_batch`. ``bytes_on_device`` reports the HBM footprint
    so callers can gate the auto choice.
    """

    def __init__(self, root: str, batch_size: int = 16, size: int = 176,
                 store: int = 288, seed: int = 0,
                 color_jitter: bool | str = True):
        from PIL import Image

        from .data import list_images
        paths = list_images(root) if isinstance(root, str) else list(root)
        if not paths:
            raise FileNotFoundError(f"no images under {root}")
        frames = []
        for p in paths:
            try:
                im = Image.open(p).convert("RGB").resize(
                    (store, store), Image.BILINEAR)
            except Exception:
                continue
            frames.append(np.asarray(im, np.uint8))
        if not frames:
            raise FileNotFoundError(f"no decodable images under {root}")
        self.n_images = len(frames)
        self.batch_size = batch_size
        self.size = size
        self._dev = jnp.asarray(np.stack(frames))
        self._key = jax.random.key(seed)
        # color_jitter: False | True | "strong" (the r4 4-region tier)
        self.color_jitter = bool(color_jitter)
        self.strong = color_jitter == "strong"

    @property
    def bytes_on_device(self) -> int:
        return int(self._dev.size)

    def __iter__(self):
        return self

    def __next__(self) -> dict[str, jax.Array]:
        self._key, sub = jax.random.split(self._key)
        return sample_batch(self._dev, sub, self.batch_size, self.size,
                            color_jitter=self.color_jitter,
                            strong=self.strong)

    def close(self):
        pass


def corpus_fits_on_device(root, store: int = 288,
                          budget_bytes: int = 1 << 29) -> bool:
    """True when the decoded uint8 stack stays under ``budget_bytes``
    (default 512 MB — comfortably inside one v5e chip's HBM next to the
    model + optimizer state)."""
    from .data import list_images
    n = len(list_images(root) if isinstance(root, str) else list(root))
    return 0 < n * store * store * 3 <= budget_bytes
