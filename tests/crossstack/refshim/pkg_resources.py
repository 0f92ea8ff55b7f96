"""Minimal `pkg_resources` stand-in (setuptools' copy is unavailable)."""
import importlib
import os


def resource_filename(package, resource):
    mod = importlib.import_module(package)
    return os.path.join(os.path.dirname(mod.__file__), resource)
