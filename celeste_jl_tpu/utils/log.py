"""Process-rank-aware logging (Log.jl:9-71 equivalent).

The reference hand-rolls thread-safe raw `write(2)` because Julia 0.6 I/O was
not thread-safe; Python's logging module already serializes, so this is a
thin veneer adding the `[rank]` prefix (jax.process_index) and the same
level names.
"""

import logging
import os
import sys

_LEVELS = {"ERROR": logging.ERROR, "WARN": logging.WARNING,
           "INFO": logging.INFO, "DEBUG": logging.DEBUG}


def _rank():
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


_logger = logging.getLogger("celeste_jl_tpu")
if not _logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("%(levelname)s %(message)s"))
    _logger.addHandler(_h)
    _logger.setLevel(_LEVELS.get(os.environ.get("CELESTE_LOG_LEVEL", "INFO"),
                                 logging.INFO))
    _logger.propagate = False


def _fmt(msg):
    return f"[{_rank()}] {msg}"


def error(msg):
    _logger.error(_fmt(msg))


def warn(msg):
    _logger.warning(_fmt(msg))


def info(msg):
    _logger.info(_fmt(msg))


def debug(msg):
    _logger.debug(_fmt(msg))


def exception(exc):
    _logger.error(_fmt(f"exception: {exc!r}"), exc_info=exc)
