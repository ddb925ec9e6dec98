"""Scratch-path helper shared by the sources_io* plan modules.

Lives in its own module (no ``register`` side effects) so that
importing one io plan module never transitively registers another's
queries — registration order is the driver's correctness window
(see registry._load_all_plan_modules).
"""

from __future__ import annotations

import os

_IO_ROOT = "/tmp/sms_io"


def _scratch(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"{_IO_ROOT}/{tag}/{name}"
