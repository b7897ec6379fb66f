# Sphinx configuration for exciting-environments-tpu
# (build: sphinx-build -b html docs docs/_build)

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "exciting-environments-tpu"
copyright = "2026, exciting-environments-tpu developers"
author = "exciting-environments-tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
    "myst_parser",
]

autodoc_mock_imports = ["mujoco", "mujoco.mjx"]

templates_path = ["_templates"]
exclude_patterns = ["_build"]

html_theme = "sphinx_rtd_theme"
