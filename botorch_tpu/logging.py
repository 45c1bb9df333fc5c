r"""Module logger (counterpart of `botorch/logging.py:11-44`)."""

import logging

LOG_LEVEL_DEFAULT = logging.CRITICAL


def _get_logger(name: str = "botorch_tpu", level: int = LOG_LEVEL_DEFAULT):
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter(
                "[%(levelname)s %(asctime)s] %(name)s: %(message)s",
                datefmt="%m-%d %H:%M:%S",
            )
        )
        logger.addHandler(handler)
    logger.setLevel(level)
    return logger


logger = _get_logger()


def set_log_level(level: int) -> None:
    logger.setLevel(level)
