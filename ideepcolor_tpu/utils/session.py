"""Session checkpointing: dump/replay interactive colorization sessions,
plus model-weight save/load (npz and orbax).

The reference's only session persistence is ``save_result``'s timestamped
npy+png dump (ref ui/gui_draw.py:222-244). We keep that exact format (so
dumps interchange with reference tooling) and add ``load_session`` /
``replay_session`` — enough to reproduce a session headlessly — and weight
checkpointing helpers the reference lacks (its weights were read-only
downloads, ref models/fetch_models.sh).
"""

from __future__ import annotations

import datetime
import os

import numpy as np


def create_temp_directory(path_template: str, N: int = int(1e8)) -> str:
    """Create a fresh randomly-numbered directory from a %d template
    (ref data/colorize_image.py:10-17)."""
    cur_path = path_template % np.random.randint(0, N)
    while os.path.exists(cur_path):
        cur_path = path_template % np.random.randint(0, N)
    os.makedirs(cur_path)
    return cur_path


def save_session(save_dir: str, model, im_ab0: np.ndarray,
                 im_mask0: np.ndarray, result_rgb: np.ndarray | None = None,
                 timestamp: bool = True) -> str:
    """Dump a session in the reference's format: im_l/im_ab/im_mask npys +
    input/result PNGs. Returns the directory written."""
    import cv2
    if timestamp:
        suffix = datetime.datetime.now().strftime("%y%m%d_%H%M%S")
        save_dir = f"{save_dir}_{suffix}"
    os.makedirs(save_dir, exist_ok=True)
    np.save(os.path.join(save_dir, "im_l.npy"), model.img_l)
    np.save(os.path.join(save_dir, "im_ab.npy"), im_ab0)
    np.save(os.path.join(save_dir, "im_mask.npy"), im_mask0)
    cv2.imwrite(os.path.join(save_dir, "input_mask.png"),
                (np.transpose(im_mask0, (1, 2, 0)) * 255).astype(np.uint8))
    if result_rgb is not None:
        cv2.imwrite(os.path.join(save_dir, "ours.png"),
                    result_rgb[:, :, ::-1])
    cv2.imwrite(os.path.join(save_dir, "ours_fullres.png"),
                model.get_img_fullres()[:, :, ::-1])
    cv2.imwrite(os.path.join(save_dir, "input_fullres.png"),
                model.get_input_img_fullres()[:, :, ::-1])
    cv2.imwrite(os.path.join(save_dir, "input.png"),
                model.get_input_img()[:, :, ::-1])
    cv2.imwrite(os.path.join(save_dir, "input_ab.png"),
                model.get_sup_img()[:, :, ::-1])
    return save_dir


def load_session(save_dir: str) -> dict[str, np.ndarray]:
    """Read a session dump back: {'im_l', 'im_ab', 'im_mask'}."""
    return {name: np.load(os.path.join(save_dir, f"{name}.npy"))
            for name in ("im_l", "im_ab", "im_mask")}


def replay_session(save_dir: str, model) -> np.ndarray:
    """Re-run a dumped session's hints through a prepared model (the model
    must already have the image loaded). Returns the re-colorized frame."""
    s = load_session(save_dir)
    return model.net_forward(s["im_ab"], s["im_mask"])


# ----- model weights -----

def save_params_npz(path: str, params: dict) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params_npz(path: str) -> dict:
    import jax.numpy as jnp
    return {k: jnp.asarray(v) for k, v in np.load(path).items()}


def save_params_orbax(path: str, params: dict) -> None:
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path),
                   {k: np.asarray(v) for k, v in params.items()},
                   force=True)       # overwrite: re-exports must not die


def load_params_orbax(path: str) -> dict:
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path))
    return {k: jnp.asarray(v) for k, v in restored.items()}
