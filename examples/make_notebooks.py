"""Generate .ipynb counterparts of the example scripts (the reference
ships notebooks — BriefIntro.ipynb etc.; our asserting scripts are the
primary artifact, these notebooks are their interactive form).

Each notebook = a markdown header + a CPU-config cell + the script body
as one code cell calling ``main()``.  Regenerate with
``python examples/make_notebooks.py`` after editing a script.
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))

#: script → (notebook name, title) — named after the reference notebooks
#: they mirror (/root/reference/examples/*.ipynb).
PAIRS = {
    "regression.py": ("regression.ipynb",
                      "PCA vs EDR on 2-D synthetic data"),
    "brief_intro.py": ("BriefIntro.ipynb",
                       "Brief introduction — full API tour"),
    "sparse_recovery.py": ("sPCAvsPCA.ipynb",
                           "Sparse projector recovery via refit(SparsePCA)"),
    "chain_pca_edr.py": ("chain_PCA-EDRGP.ipynb",
                         "PCA preprocessor chained before EDR"),
}

CONFIG_CELL = """\
# Environment: force the local CPU backend (float64 parity numerics).
# On a TPU host, drop these lines to run in float32 on the chip.
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
"""


def code_cell(src):
    return {"cell_type": "code", "execution_count": None, "metadata": {},
            "outputs": [], "source": src.splitlines(keepends=True)}


def md_cell(src):
    return {"cell_type": "markdown", "metadata": {},
            "source": src.splitlines(keepends=True)}


def main():
    for script, (nb_name, title) in PAIRS.items():
        with open(os.path.join(HERE, script)) as f:
            body = f.read()
        # strip the module docstring (it becomes the markdown header)
        doc = ""
        if body.startswith('"""'):
            end = body.index('"""', 3)
            doc = body[3:end].strip()
            body = body[end + 3:].lstrip("\n")
        body = body.replace('if __name__ == "__main__":\n    main()',
                            "main()").rstrip() + "\n"
        nb = {
            "cells": [
                md_cell(f"# {title}\n\n{doc}\n\n*(generated from "
                        f"`examples/{script}` — the asserting script is "
                        "the canonical version)*"),
                code_cell(CONFIG_CELL),
                code_cell(body),
            ],
            "metadata": {
                "kernelspec": {"display_name": "Python 3",
                               "language": "python", "name": "python3"},
                "language_info": {"name": "python"},
            },
            "nbformat": 4, "nbformat_minor": 5,
        }
        out = os.path.join(HERE, nb_name)
        with open(out, "w") as f:
            json.dump(nb, f, indent=1)
        print("wrote", os.path.relpath(out, HERE))


if __name__ == "__main__":
    main()
