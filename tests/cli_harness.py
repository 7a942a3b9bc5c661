"""Shared helper to drive a CLI module's ``main()`` in-process (tests dir is
on sys.path, same convention as ``reference_shims``/``mh_common``)."""

import importlib
import sys


def run_cli(module_name, argv):
    sys.argv = argv
    module = importlib.import_module(module_name)
    importlib.reload(module)
    return module.main()
