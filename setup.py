"""Compatibility shim: environments without the ``wheel`` package (and
without network to fetch it) cannot run the PEP 660 editable build, so
``pip install -e . --no-use-pep517`` falls back to this legacy path.
All metadata lives in pyproject.toml."""

from setuptools import setup

setup()
