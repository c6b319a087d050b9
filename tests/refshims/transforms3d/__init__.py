"""transforms3d shim (quaternions submodule only) — see refshims/__init__.py."""

from . import quaternions  # noqa: F401
