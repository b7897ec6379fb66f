"""Execute the example notebooks in-place, storing their outputs.

Run from the repository root:

    env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/run_notebooks.py

Used both locally (committed outputs prove the notebooks run end-to-end,
reference parity target ``/root/reference/examples/*.ipynb`` which ship with
executed cells) and by CI.  ``mujoco_example.ipynb`` runs everywhere: with
``mujoco-mjx`` installed it steps through ``mjx.step``; otherwise
``MujucoWrapper``'s plain-``mujoco`` host-callback backend steps the C engine.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import nbformat
from nbclient import NotebookClient

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def main(selected=None):
    failures = []
    for fname in sorted(os.listdir(HERE)):
        if not fname.endswith(".ipynb"):
            continue
        if selected and fname not in selected:
            continue
        path = os.path.join(HERE, fname)
        nb = nbformat.read(path, as_version=4)
        nbformat.validate(nb, relax_add_props=True)
        for cell in nb.cells:  # normalize missing ids once
            cell.setdefault("id", None)
        nb = nbformat.v4.upgrade(nb) or nb
        print(f"RUN  {fname} ...", flush=True)
        client = NotebookClient(
            nb,
            timeout=1200,
            kernel_name="python3",
            resources={"metadata": {"path": ROOT}},
        )
        try:
            client.execute()
        except Exception as e:  # keep going; report at the end
            failures.append((fname, repr(e)[:500]))
            print(f"FAIL {fname}: {e}", flush=True)
            continue
        nbformat.write(nb, path)
        n_out = sum(1 for c in nb.cells if c.cell_type == "code" and c.get("outputs"))
        print(f"OK   {fname} ({n_out} cells with outputs)", flush=True)
    if failures:
        for fname, err in failures:
            print(f"FAILED: {fname}: {err}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main(set(sys.argv[1:]) or None)
