"""Execute the rebuilt notebooks end-to-end as notebooks (nbclient).

The reference has no automated tests; its two notebooks are its
executable smoke surface (SURVEY §4). Ours must therefore actually run
cell-by-cell under a Jupyter kernel — matching the reference user's
workflow — not just have their logic mirrored in apps/demos.

Runs with random weights at the notebooks' own Xd (the cells accept an
empty checkpoint path by design), on the CPU backend.
"""
import os

import nbformat
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NBDIR = os.path.join(REPO, "notebooks")
REF = "/root/reference"


@pytest.mark.parametrize("name", ["DemoInteractiveColorization.ipynb",
                                  "DemoGlobalHistogramTransfer.ipynb"])
def test_notebook_executes(name):
    if not os.path.isdir(os.path.join(REF, "test_imgs")):
        pytest.skip("reference test images unavailable")
    nbclient = pytest.importorskip("nbclient")
    nb = nbformat.read(os.path.join(NBDIR, name), as_version=4)
    # Test scaffolding cell: pin the CPU backend INSIDE the kernel (the
    # axon plugin ignores the JAX_PLATFORMS env var, and the suite must
    # not touch the real chip), make the repo importable, and use a
    # headless matplotlib backend.
    pre = nbformat.v4.new_code_cell(
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import matplotlib; matplotlib.use('Agg')")
    nb.cells.insert(0, pre)
    client = nbclient.NotebookClient(
        nb, timeout=900, kernel_name="python3",
        # cwd = the reference root so the notebooks' relative
        # './test_imgs/...' paths resolve (read-only; nothing is written)
        resources={"metadata": {"path": REF}})
    client.execute()
    # every code cell ran (nbclient raises on errors; belt-and-braces:
    # no cell carries an error output)
    for c in nb.cells:
        if c.cell_type == "code":
            assert not any(o.get("output_type") == "error"
                           for o in c.get("outputs", [])), c.source[:80]
