# Sphinx configuration for pygho_tpu.
# Build:  sphinx-build -b html docs/source docs/build
# (sphinx + myst_parser are not bundled in the dev container; the rst
# tree builds on any machine with `pip install sphinx myst-parser`.)
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "pygho_tpu"
author = "pygho_tpu developers"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
    "myst_parser",
]

# heavyweight / environment-specific imports mocked so autodoc runs
# anywhere
autodoc_mock_imports = ["jax", "flax", "optax", "orbax", "chex",
                        "einops", "scipy"]

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"
html_theme = "alabaster"
