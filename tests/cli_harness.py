"""Shared helper to drive a CLI module's ``main()`` in-process (tests dir is
on sys.path, same convention as ``reference_shims``/``mh_common``)."""

import importlib
import logging
import sys


def _reset_gm3d_loggers():
    # get_logger configures a named logger ONCE per process (matching the
    # reference's named-logger behaviour, utils/logging.py:28-29). In-process
    # CLI tests share one process, so without a reset the FIRST test to
    # configure e.g. "gm3d.finetune" pins its FileHandler and every later
    # test's log-file assertions read an empty file. Reset to fresh-process
    # semantics before each run.
    for name in list(logging.Logger.manager.loggerDict):
        if name == "gm3d" or name.startswith("gm3d."):
            logger = logging.getLogger(name)
            for h in list(logger.handlers):
                logger.removeHandler(h)
                h.close()
            if hasattr(logger, "_gm3d_configured"):
                del logger._gm3d_configured


def run_cli(module_name, argv):
    _reset_gm3d_loggers()
    sys.argv = argv
    module = importlib.import_module(module_name)
    importlib.reload(module)
    return module.main()
