"""Rotating-file logging — the reference's log-sink shape (K4).

Mirrors /root/reference/logging.config:16-39: an application log rotated at
5 MB × 10 backups and an access log at 1 MB × 3 (the reference's third
file, wsgi.log, collapses into the access log here — one WSGI process).
"""

from __future__ import annotations

import logging
import os
from logging.handlers import RotatingFileHandler

FORMAT = "%(asctime)s %(levelname)s %(name)s %(message)s"


def configure_logging(log_dir: str) -> logging.Logger:
    """Install rotating handlers; returns the service logger ("es")."""
    os.makedirs(log_dir, exist_ok=True)
    formatter = logging.Formatter(FORMAT)

    es = logging.getLogger("es")
    es.setLevel(logging.INFO)
    h = RotatingFileHandler(
        os.path.join(log_dir, "es.log"), maxBytes=5 * 1024 * 1024, backupCount=10
    )
    h.setFormatter(formatter)
    es.addHandler(h)

    access = logging.getLogger("werkzeug")  # Flask's access logger
    access.setLevel(logging.INFO)
    ah = RotatingFileHandler(
        os.path.join(log_dir, "access.log"), maxBytes=1 * 1024 * 1024, backupCount=3
    )
    ah.setFormatter(formatter)
    access.addHandler(ah)
    return es
