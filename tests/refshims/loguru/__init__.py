"""loguru shim: a std-logging backed `logger` singleton."""

import logging

_Logger = logging.Logger

logger = logging.getLogger("refshim.loguru")
logger.addHandler(logging.NullHandler())


def _noop(*args, **kwargs):
    return None


# loguru-specific methods the reference may call
logger.remove = _noop
logger.add = _noop
logger.bind = lambda *a, **k: logger
logger.opt = lambda *a, **k: logger
logger.success = logger.info
