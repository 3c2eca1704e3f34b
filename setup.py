"""Thin setuptools shim — ALL metadata lives in pyproject.toml.

Exists so environments whose setuptools predates the vendored
bdist_wheel (and that cannot fetch the `wheel` package, e.g. offline
CI) can still install with the legacy `python setup.py develop` /
`pip install --no-use-pep517` paths.  Reference validr ships setup.py
as its only packaging surface (/root/reference/setup.py:1-134); here
pyproject.toml is canonical and this file is only the fallback.
"""
from setuptools import setup

setup()
